package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming funnel: rolling the emitted stage crossings up by stage
  * must reproduce the batch funnel's per-stage user counts, replayed
  * one-shot or split across micro-batches; per-stage crossings are
  * final (never revised, never duplicated). */
class StreamingFunnelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingFunnel.{EventIn, StageCrossed}

  private val sf = "/root/testdata/sf0.001"

  private lazy val batchCounts: Map[Long, Long] =
    EventQueries.qEventsFunnel.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap

  private lazy val eventLog: Seq[EventIn] =
    Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts)")
      .collect()
      .map(r => EventIn(r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
      .sortBy(e => (e.ts_us, e.event_id))

  private def runStream(batches: Seq[Seq[EventIn]]): Seq[StageCrossed] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[EventIn]
    val out = mutable.ArrayBuffer[StageCrossed]()
    val q = StreamingFunnel.progress(in.toDS())
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[StageCrossed], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    out.synchronized(out.toSeq)
  }

  private def stageCounts(xs: Seq[StageCrossed]): Map[Long, Long] =
    xs.groupBy(_.stage.toLong).view.mapValues(_.length.toLong).toMap

  test("one-shot replay: stage rollup ≡ the batch funnel counts") {
    val got = runStream(Seq(eventLog))
    assert(stageCounts(got) === batchCounts)
    // crossings are unique per (user, stage) — final, never duplicated
    assert(got.map(x => (x.user_id, x.stage)).distinct.length === got.length)
  }

  test("split replay ≡ batch: stage state survives micro-batches") {
    val (b1, b2) = eventLog.splitAt(eventLog.length / 2)
    assert(stageCounts(runStream(Seq(b1, b2))) === batchCounts)
  }

  test("strict ordering: a click before the first view never crosses") {
    val rows = Seq(
      EventIn(7L, 1L, "click", 1000L),
      EventIn(7L, 2L, "view", 2000L),
      EventIn(7L, 3L, "purchase", 3000L), // no click after view yet
      EventIn(7L, 4L, "click", 4000L),
      EventIn(7L, 5L, "purchase", 5000L))
    val got = runStream(Seq(rows)).sortBy(_.stage)
    assert(got.map(_.stage) === Seq(1, 2, 3))
    assert(got.map(_.ts_us) === Seq(2000L, 4000L, 5000L),
      "pre-view click and pre-click purchase must not cross stages")
  }
}
