package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming attribution: replaying an event log through the stateful
  * operator — in one micro-batch or split across many — must emit
  * exactly the batch window query's rows, and the per-user touch
  * state must carry across micro-batch boundaries. */
class StreamingAttributionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingAttribution.{Attribution, EventIn}

  private val sf = "/root/testdata/sf0.001"

  /** The batch query's rows on the sf0.001 events, normalized to the
    * streaming operator's shape (epoch micros, Options for NULLs). */
  private lazy val batchRows: Set[Attribution] =
    EventQueries.qEventsAttribution.run(spark, sf)
      // timestamps convert in-engine: java.sql.Timestamp.getTime is
      // millis and would truncate the micros the stream carries
      .selectExpr("conv_id", "user_id", "unix_micros(conv_ts)",
        "n_touches", "first_touch", "unix_micros(first_ts)",
        "last_touch", "unix_micros(last_ts)")
      .collect().map { r =>
        Attribution(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getString(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getString(6)),
          if (r.isNullAt(7)) None else Some(r.getLong(7)))
      }.toSet

  private lazy val eventLog: Seq[EventIn] =
    Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts)")
      .collect()
      .map(r => EventIn(r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
      .sortBy(e => (e.ts_us, e.event_id))

  private def runStream(batches: Seq[Seq[EventIn]]): Set[Attribution] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[EventIn]
    val out = mutable.ArrayBuffer[Attribution]()
    val q = StreamingAttribution.attribute(in.toDS())
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[Attribution], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    out.synchronized(out.toSet)
  }

  test("one-shot replay of the fixture log ≡ the batch window query") {
    assert(batchRows.nonEmpty)
    assert(runStream(Seq(eventLog)) === batchRows)
  }

  test("split replay ≡ batch: per-user touch state survives micro-batches") {
    // split mid-log in event-time order — users' histories straddle
    // the boundary, so equality proves state genuinely carries
    val (b1, b2) = eventLog.splitAt(eventLog.length / 2)
    assert(runStream(Seq(b1, b2)) === batchRows)
  }

  test("touchless purchase emits the null row; purchases are not touches") {
    val rows = Seq(
      EventIn(9L, 1L, "purchase", 1000L),
      EventIn(9L, 2L, "click", 2000L),
      EventIn(9L, 3L, "purchase", 3000L),
      EventIn(9L, 4L, "purchase", 4000L))
    val got = runStream(Seq(rows)).toSeq.sortBy(_.conv_id)
    assert(got.map(_.n_touches) === Seq(0L, 1L, 1L))
    assert(got.head.first_touch.isEmpty)
    // the two post-click purchases attribute to the SAME click — the
    // intervening purchase did not update touch state
    assert(got(1).last_ts_us === Some(2000L))
    assert(got(2).last_ts_us === Some(2000L))
  }
}
