package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming SPRT: replaying the fixture's Bernoulli streams through
  * the live monitor must end at exactly the batch query's verdicts —
  * stop index, frozen LLR, and decision — whether the stream arrives
  * in one micro-batch or many, and the frozen stop point must not
  * move once a boundary is crossed. */
class StreamingSprtSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingSprt.{SprtObs, SprtStatus}

  private val sf = "/root/testdata/sf0.001"

  private lazy val batchRows: Set[SprtStatus] =
    StatsQueries.qStatsSprt.run(spark, sf)
      .collect().map(r => SprtStatus(r.getString(0), r.getLong(1),
        r.getBoolean(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toSet

  private lazy val obs: Seq[SprtObs] =
    Tables(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("tsu"),
        col("event_id"),
        when(round(col("value") * 100).cast("long") % 5 === 0, lit(1L))
          .otherwise(lit(0L)).as("succ"))
      .as[SprtObs].collect().toSeq
      .sortBy(o => (o.tsu, o.event_id))

  private def runStream(batches: Seq[Seq[SprtObs]]): Set[SprtStatus] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[SprtObs]
    val last = mutable.LinkedHashMap[String, SprtStatus]()
    val q = StreamingSprt.monitor(in.toDS())
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[SprtStatus], _: Long) =>
          last.synchronized {
            df.collect().foreach(s => last(s.event_type) = s) }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    last.synchronized(last.values.toSet)
  }

  test("one-shot replay ≡ the batch SPRT verdicts") {
    assert(batchRows.nonEmpty)
    assert(runStream(Seq(obs)) === batchRows)
  }

  test("split replay ≡ batch: the frozen stop point survives batches") {
    val third = obs.length / 3
    val parts = Seq(obs.take(third), obs.slice(third, 2 * third),
      obs.drop(2 * third))
    assert(runStream(parts) === batchRows)
  }

  test("the verdict freezes at the crossing even as counting continues") {
    // 15 straight successes cross the upper boundary at n = 15
    // (15·200671 = 3010065 ≥ 2944439); later failures keep counting
    // into n_total but never move stop_n, the LLR, or the decision
    val wins = (1 to 15).map(i => SprtObs("t", i.toLong, i.toLong, 1L))
    val losses = (16 to 40).map(i => SprtObs("t", i.toLong, i.toLong, 0L))
    val got = runStream(Seq(wins, losses))
    assert(got === Set(SprtStatus("t", 40L, true, 15L,
      15L * StreamingSprt.WIN, "H1")))
  }
}
