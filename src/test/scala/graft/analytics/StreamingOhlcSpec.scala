package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import scala.collection.mutable

/** Streaming OHLC bars: the watermarked windowed aggregation must emit
  * exactly the batch query's bars — one micro-batch or split — and a
  * late-but-within-watermark event must amend its (still-open) bar
  * before emission. */
class StreamingOhlcSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, event_type: String,
      value: Double)

  private val sf = "/root/testdata/sf0.001"

  private case class Bar(event_type: String, h: Long, open: Double,
      high: Double, low: Double, close: Double, n_events: Long)

  private lazy val batchBars: Set[Bar] =
    TsQueries.qTsOhlc.run(spark, sf)
      .selectExpr("event_type", "unix_micros(h)", "open", "high", "low",
        "close", "n_events")
      .collect().map(r => Bar(r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet

  private lazy val fixture: Seq[Ev] =
    Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .collect().map(r => Ev(r.getLong(0), r.getTimestamp(1),
        r.getString(2), r.getDouble(3)))
      .sortBy(_.ts.getTime)

  /** An event far past everything: advances the watermark so every
    * real bar closes; its own bar never emits (nothing follows it). */
  private def sentinel: Ev =
    Ev(-1L, new Timestamp(fixture.last.ts.getTime + 30L * 24 * 3600 * 1000),
      "zz_sentinel", 0.0)

  private def runStream(batches: Seq[Seq[Ev]]): Set[Bar] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = mutable.ArrayBuffer[Bar]()
    val q = StreamingOhlc.bars(in.toDF())
      .selectExpr("event_type", "unix_micros(h)", "open", "high", "low",
        "close", "n_events")
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          val rows = df.collect().map(r => Bar(r.getString(0), r.getLong(1),
            r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getLong(6)))
          out.synchronized { out ++= rows }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    out.synchronized(out.toSet)
  }

  test("one-shot replay emits exactly the batch bars") {
    assert(batchBars.nonEmpty)
    assert(runStream(Seq(fixture, Seq(sentinel))) === batchBars)
  }

  test("split replay ≡ batch: window state carries across micro-batches") {
    val (b1, b2) = fixture.splitAt(fixture.length / 2)
    assert(runStream(Seq(b1, b2, Seq(sentinel))) === batchBars)
  }

  test("late within-watermark event amends its bar before emission") {
    def ts(s: String) = Timestamp.valueOf(s)
    val b1 = Seq(
      Ev(1L, ts("2024-01-01 10:05:00"), "click", 5.0),
      Ev(2L, ts("2024-01-01 11:05:00"), "click", 7.0))
    // arrives AFTER the 11:05 event but event-time 10:30 — watermark
    // is 09:05 (2h delay), so it must still land in the 10:00 bar
    val late = Seq(Ev(3L, ts("2024-01-01 10:30:00"), "click", 9.0))
    val flush = Seq(Ev(4L, ts("2024-01-02 00:00:00"), "click", 1.0))
    val got = runStream(Seq(b1, late, flush))
    val bar10 = got.find(_.h == ts("2024-01-01 10:00:00").getTime * 1000)
    assert(bar10.isDefined, s"10:00 bar missing: $got")
    assert(bar10.get === Bar("click", ts("2024-01-01 10:00:00").getTime * 1000,
      5.0, 9.0, 5.0, 9.0, 2L),
      s"late event not absorbed: ${bar10.get}")
  }
}
