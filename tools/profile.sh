#!/bin/bash
# Stage-level profiler for one or more registered queries: runs each query
# once warm (Bench methodology), then a profiled rep with a SparkListener
# that attributes per-stage task time / shuffle bytes, printed largest-first.
# Dev tooling only.
#
# Usage: tools/profile.sh <q1,q2,...> [cores] [sfDir]
set -e
NAMES="$1"; CORES="${2:-32}"; SFDIR="${3:-/root/testdata/sf0.1}"
cat > /tmp/_profile.scala <<EOF
import org.apache.spark.scheduler._
import scala.collection.mutable
val stageAgg = mutable.Map[Int, (String, Long, Long, Long, Long)]()
val listener = new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val m = si.taskMetrics
    stageAgg(si.stageId) = (si.name.split("\n")(0).take(90),
      m.executorRunTime,
      m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
      si.numTasks.toLong)
  }
}
val names = "$NAMES".split(",").toSeq
val qs = graft.SparkEntry.queries
names.foreach { n =>
  val fn = qs(n)
  try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
  spark.catalog.clearCache()
  // warm rep
  fn(spark, "$SFDIR").count(); spark.catalog.clearCache(); System.gc()
  stageAgg.clear()
  spark.sparkContext.addSparkListener(listener)
  val t0 = System.nanoTime()
  fn(spark, "$SFDIR").count()
  val dt = (System.nanoTime() - t0) / 1e9
  Thread.sleep(800)  // drain listener bus
  spark.sparkContext.removeSparkListener(listener)
  spark.catalog.clearCache(); System.gc()
  println(f"PROFILE \$n wall=\$dt%.3f s, \${stageAgg.size} stages, taskTimeSum=\${stageAgg.values.map(_._2).sum / 1e3}%.2f s")
  stageAgg.toSeq.sortBy(-_._2._2).take(18).foreach { case (id, (nm, rt, sr, sw, nt)) =>
    println(f"STAGE  \$id%5d run=\${rt / 1e3}%8.2fs tasks=\$nt%4d shufR=\${sr / 1e6}%8.1fMB shufW=\${sw / 1e6}%8.1fMB  \$nm")
  }
}
EOF
(cat /tmp/_profile.scala; echo :quit) | /opt/spark/bin/spark-shell \
  --master "local[$CORES]" \
  --driver-class-path /root/repo/target/scala-2.13/classes \
  --driver-memory 32g \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false 2>/dev/null | tr "\\r" "\\n" | grep -E "PROFILE|STAGE"
