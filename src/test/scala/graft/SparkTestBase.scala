package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (forked JVM, UTC — see
  * build.sbt). Tests exercise correctness; scale posture is verified by
  * plan inspection + Bench, not by test-data volume. */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
