package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming growth accounting: rolling the emitted transitions up by
  * (week, kind) must reproduce the batch lifecycle ledger — exactly
  * for new/retained/resurrected (they depend only on the past), and
  * for churn restricted to users who later return (the only churn a
  * stream can observe); replayed one-shot or split across
  * micro-batches. */
class StreamingLifecycleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingLifecycle.{EventIn, Transition}

  private val sf = "/root/testdata/sf0.001"

  // batch ledger: week_us -> (new, retained, resurrected)
  private lazy val batchLedger: Map[Long, (Long, Long, Long)] =
    EventQueries.qEventsLifecycle.run(spark, sf).collect()
      .map(r => r.getTimestamp(0).toInstant.toEpochMilli * 1000L ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  // batch churn restricted to users with a later active week: per
  // user, for each consecutive active-week pair with a gap > 7 days,
  // one churn at prev + 7d. Derived independently of the batch query.
  private lazy val observableChurn: Map[Long, Long] = {
    val uw = Tables(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(date_trunc('week', ts)) AS w")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val weekUs = 7L * 86400L * 1000000L
    uw.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.map(_._2).toList.sorted.sliding(2).collect {
        case List(a, b) if b > a + weekUs => a + weekUs
      }
    }.groupBy(x => x).view.mapValues(_.length.toLong).toMap
  }

  private lazy val eventLog: Seq[EventIn] =
    Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts)")
      .collect()
      .map(r => EventIn(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e.ts_us, e.event_id))

  private def runStream(batches: Seq[Seq[EventIn]]): Seq[Transition] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[EventIn]
    val out = mutable.ArrayBuffer[Transition]()
    val q = StreamingLifecycle.classify(in.toDS())
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[Transition], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    out.synchronized(out.toSeq)
  }

  private def rollup(xs: Seq[Transition],
      kind: String): Map[Long, Long] =
    xs.filter(_.kind == kind).groupBy(_.week_us)
      .view.mapValues(_.length.toLong).toMap

  private def checkAgainstBatch(got: Seq[Transition]): Unit = {
    val n = rollup(got, "new")
    val r = rollup(got, "retained")
    val z = rollup(got, "resurrected")
    batchLedger.foreach { case (w, (bn, br, bz)) =>
      assert(n.getOrElse(w, 0L) === bn, s"new mismatch at week $w")
      assert(r.getOrElse(w, 0L) === br, s"retained mismatch at week $w")
      assert(z.getOrElse(w, 0L) === bz,
        s"resurrected mismatch at week $w")
    }
    assert((n.keySet ++ r.keySet ++ z.keySet) === batchLedger.keySet)
    assert(rollup(got, "churned") === observableChurn,
      "streaming churn must equal batch churn over returning users")
  }

  test("one-shot replay: transition rollup ≡ the batch ledger") {
    val got = runStream(Seq(eventLog))
    checkAgainstBatch(got)
    // a (user, week) classifies exactly once
    val keyed = got.filterNot(_.kind == "churned")
      .map(t => (t.user_id, t.week_us))
    assert(keyed.distinct.length === keyed.length)
  }

  test("split replay ≡ batch: last-active-week state survives batches") {
    checkAgainstBatch(runStream(
      Seq(eventLog.take(eventLog.length / 3),
        eventLog.slice(eventLog.length / 3, 2 * eventLog.length / 3),
        eventLog.drop(2 * eventLog.length / 3))))
  }

  test("week truncation matches the engines' Monday date_trunc") {
    val probe = Tables(spark, sf, "events")
      .selectExpr("unix_micros(ts) AS us",
        "unix_micros(date_trunc('week', ts)) AS w")
      .limit(500).collect()
    probe.foreach { r =>
      assert(StreamingLifecycle.weekStartUs(r.getLong(0)) === r.getLong(1))
    }
  }

  test("gap classification: churn backfills at exactly prev + 7d") {
    val day = 86400L * 1000000L
    // Mondays: 2024-01-01 is a Monday (epoch day 19723)
    val w0 = 19723L * day
    val rows = Seq(
      EventIn(9L, 1L, w0 + day),            // week 0 -> new
      EventIn(9L, 2L, w0 + 8 * day),        // week 1 -> retained
      EventIn(9L, 3L, w0 + 30 * day))       // week 4 -> resurrected
    val got = runStream(Seq(rows)).sortBy(_.week_us)
    assert(got.map(_.kind) ===
      Seq("new", "retained", "churned", "resurrected"))
    assert(got(2).week_us === w0 + 14 * day,
      "churn lands the week after the last active week")
  }
}
