ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dnslogtransformerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Variant parse_json decodes through the JVM default charset; pin it
  // so non-UTF-8 environments can't mangle multi-byte payloads.
  "-Dfile.encoding=UTF-8",
  // local[32] shares one heap across 32 task threads; 8g (≈250MB/thread)
  // intermittently GC-stormed the string-heavy dedup queries (one bench
  // rep 4.5s -> 24.6s). 16g keeps unified memory comfortably above the
  // shingle/decode cache working set at sf0.1.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Throughput collector for the batch-shaped bench/verify workload:
  // under G1 (the JDK 17 default) the string-heavy dedup queries showed
  // catastrophic tail reps (same query 3.4s..21s across 7 reps);
  // ParallelGC bounds the tail (max 8.5s) at comparable medians.
  "-XX:+UseParallelGC",
)
