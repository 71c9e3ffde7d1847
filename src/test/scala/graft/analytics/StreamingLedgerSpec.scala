package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming ledger: replaying the fixture's delta rows through the
  * stateful operator — one micro-batch or split across many — must
  * converge to exactly the batch query's per-user summaries, and the
  * six-long state must carry across micro-batch boundaries (clamp
  * counts included, which only match if every intermediate balance
  * does). */
class StreamingLedgerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import EventQueries.{LedgerIn, LedgerOut}

  private val sf = "/root/testdata/sf0.001"

  private lazy val batchRows: Set[LedgerOut] =
    EventQueries.qEventsLedger.run(spark, sf)
      .collect().map(r => LedgerOut(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  /** The batch query's delta rows, in global time order. */
  private lazy val deltas: Seq[LedgerIn] =
    Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsu"),
        (when(col("event_type").isin("purchase", "signup"), lit(1L))
          .otherwise(lit(-1L)) *
          round(col("value") * 100).cast("long")).as("d"))
      .as[LedgerIn].collect().toSeq
      .sortBy(e => (e.tsu, e.event_id))

  private def runStream(batches: Seq[Seq[LedgerIn]]): Set[LedgerOut] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[LedgerIn]
    // last emitted row per user wins (the stream emits one running
    // summary per touched user per micro-batch)
    val last = mutable.LinkedHashMap[Long, LedgerOut]()
    val q = StreamingLedger.monitor(in.toDS())
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[LedgerOut], _: Long) =>
          last.synchronized { df.collect().foreach(o => last(o.user_id) = o) }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    last.synchronized(last.values.toSet)
  }

  test("one-shot replay of all deltas ≡ the batch ledger") {
    assert(batchRows.nonEmpty)
    assert(runStream(Seq(deltas)) === batchRows)
  }

  test("split replay ≡ batch: the six-long state survives micro-batches") {
    // a time-ordered three-way split — most users' chains straddle
    // both boundaries, so equality proves balance AND clamp counters
    // carry exactly
    val third = deltas.length / 3
    val b1 = deltas.take(third)
    val b2 = deltas.slice(third, 2 * third)
    val b3 = deltas.drop(2 * third)
    assert(runStream(Seq(b1, b2, b3)) === batchRows)
  }

  test("clamps across a micro-batch boundary count exactly once") {
    // user 1: +9000 (cap-clamps to 5000 absorbing 6500) in batch 1,
    // then -6000 (floor-clamps to 0 absorbing 1000) in batch 2
    val b1 = Seq(LedgerIn(1L, 1L, 1000L, 9000L))
    val b2 = Seq(LedgerIn(1L, 2L, 2000L, -6000L))
    val got = runStream(Seq(b1, b2))
    assert(got === Set(LedgerOut(1L, 2L, 0L, 1L, 1L, 7500L)))
  }
}
