package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming throttle: replaying the fixture's events through the
  * stateful rate limiter — one micro-batch or split across many —
  * must emit exactly the batch query's kept rows; a kept decision
  * depends on the previous KEPT event, so equality proves the chain
  * state (last kept micros + rank) carries across boundaries. */
class StreamingThrottleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import EventQueries.{ThrottleIn, ThrottleKept}

  private val sf = "/root/testdata/sf0.001"

  private lazy val batchRows: Set[ThrottleKept] =
    EventQueries.qEventsThrottle.run(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts)", "kept_rank",
        "gap_s")
      .collect().map(r => ThrottleKept(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet

  private lazy val events: Seq[ThrottleIn] =
    Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
      .as[ThrottleIn].collect().toSeq
      .sortBy(e => (e.tsu, e.event_id))

  private def runStream(batches: Seq[Seq[ThrottleIn]]): Set[ThrottleKept] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[ThrottleIn]
    val out = mutable.ArrayBuffer[ThrottleKept]()
    val q = StreamingThrottle.monitor(in.toDS())
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[ThrottleKept], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    out.synchronized(out.toSet)
  }

  test("one-shot replay ≡ the batch throttle's kept set") {
    assert(batchRows.nonEmpty)
    assert(runStream(Seq(events)) === batchRows)
  }

  test("split replay ≡ batch: the kept chain survives micro-batches") {
    val third = events.length / 3
    val parts = Seq(events.take(third),
      events.slice(third, 2 * third), events.drop(2 * third))
    assert(runStream(parts) === batchRows)
  }

  test("a suppressed event across a boundary stays suppressed") {
    // second event 1 h after the first (suppressed), third 25 h after
    // the FIRST (kept, gap measured from the first kept, not the
    // suppressed one)
    val h = 3600000000L
    val b1 = Seq(ThrottleIn(9L, 1L, 0L))
    val b2 = Seq(ThrottleIn(9L, 2L, h), ThrottleIn(9L, 3L, 25L * h))
    val got = runStream(Seq(b1, b2))
    assert(got === Set(
      ThrottleKept(9L, 1L, 0L, 1L, None),
      ThrottleKept(9L, 3L, 25L * h, 2L, Some(25L * 3600L))))
  }
}
