package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming anomaly monitor: replaying the fixture's hourly series
  * through the stateful operator — one micro-batch or split across
  * many — must emit exactly the batch window query's rows, and the
  * 24-bucket FIFO must carry across micro-batch boundaries. */
class StreamingAnomalySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingAnomaly.{AnomalyFlag, HourCount}

  private val sf = "/root/testdata/sf0.001"

  private lazy val batchRows: Set[AnomalyFlag] =
    EventQueries.qEventsAnomaly.run(spark, sf)
      .selectExpr("event_type", "unix_micros(bucket)", "n", "mean_micro",
        "is_anomaly")
      .collect().map(r => AnomalyFlag(r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet

  private lazy val hourly: Seq[HourCount] =
    Tables(spark, sf, "events")
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .selectExpr("event_type", "unix_micros(w.start)", "n")
      .collect().map(r => HourCount(r.getString(0), r.getLong(1),
        r.getLong(2)))
      .sortBy(h => (h.bucket_us, h.event_type))

  private def runStream(batches: Seq[Seq[HourCount]]): Set[AnomalyFlag] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[HourCount]
    val out = mutable.ArrayBuffer[AnomalyFlag]()
    val q = StreamingAnomaly.monitor(in.toDS())
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[AnomalyFlag], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    out.synchronized(out.toSet)
  }

  test("one-shot replay of the hourly series ≡ the batch frame query") {
    assert(batchRows.nonEmpty)
    assert(runStream(Seq(hourly)) === batchRows)
  }

  test("split replay ≡ batch: the 24-bucket FIFO survives micro-batches") {
    // split mid-series in time order — every type's trailing frame
    // straddles the boundary, so equality proves the ring carries
    val (b1, b2) = hourly.splitAt(hourly.length / 2)
    assert(runStream(Seq(b1, b2)) === batchRows)
  }

  test("warmup: nothing emits before 24 observed buckets") {
    val rows = (0 until 30).map(h =>
      HourCount("click", h * 3600000000L, 4L))
    val got = runStream(Seq(rows)).toSeq.sortBy(_.bucket_us)
    // buckets 0..23 are warmup; 24..29 emit (6 rows), all calm with
    // the exact mean 4.0 in micro units
    assert(got.length === 6)
    assert(got.forall(f => !f.is_anomaly && f.mean_micro === 4000000L))
  }
}
