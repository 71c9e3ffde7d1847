package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming seasonal anomaly monitor: replaying the fixture's
  * SPARSE hourly counts against the batch-trained hod profile must
  * emit exactly the batch query's flagged rows — one micro-batch or
  * many — including flags on ZERO hours the gap cursor materializes. */
class StreamingSeasonalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingSeasonal.{HourCount, SeasonalFlag, SeasonalProfile}

  private val sf = "/root/testdata/sf0.001"

  private lazy val batchFlags: Set[SeasonalFlag] =
    TsQueries.qTsAnomalySeasonal.run(spark, sf)
      .selectExpr("event_type", "unix_micros(h)", "x", "resid_milli")
      .collect().map(r => SeasonalFlag(r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet

  /** The trained profile, derived with the batch query's own exact
    * integer aggregations over the shared zero-filled series. */
  private lazy val profiles: Map[String, SeasonalProfile] = {
    val series = TsQueries.hourlySeriesByType(spark, sf)
      .select(col("event_type"), hour(col("h")).cast("long").as("hod"),
        col("x"))
    val hodMean = series.groupBy(col("event_type"), col("hod"))
      .agg(expr("CAST(CAST(SUM(x) AS BIGINT) * 1000 DIV COUNT(*) " +
        "AS BIGINT)").as("mean_milli"))
    val means = hodMean.collect()
      .groupBy(_.getString(0))
      .map { case (et, rows) =>
        et -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    val disp = series.join(hodMean, Seq("event_type", "hod"))
      .select(col("event_type"),
        (col("x") * lit(1000L) - col("mean_milli")).as("r"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("r") * col("r")).as("ssr"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    disp.map { case (et, (n, ssr)) =>
      et -> SeasonalProfile(means(et), n, ssr) }
  }

  private lazy val hourly: Seq[HourCount] =
    Tables(spark, sf, "events")
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("x"))
      .selectExpr("event_type", "unix_micros(w.start)", "x")
      .collect().map(r => HourCount(r.getString(0), r.getLong(1),
        r.getLong(2)))
      .sortBy(h => (h.bucket_us, h.event_type))

  private def runStream(batches: Seq[Seq[HourCount]]): Set[SeasonalFlag] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[HourCount]
    val out = mutable.ArrayBuffer[SeasonalFlag]()
    val q = StreamingSeasonal.monitor(in.toDS(), profiles)
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[SeasonalFlag], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    out.synchronized(out.toSet)
  }

  test("one-shot replay ≡ the batch seasonal flags") {
    assert(batchFlags.nonEmpty)
    assert(runStream(Seq(hourly)) === batchFlags)
  }

  test("split replay ≡ batch: the gap cursor survives micro-batches") {
    val third = hourly.length / 3
    assert(runStream(Seq(hourly.take(third),
      hourly.slice(third, 2 * third), hourly.drop(2 * third)))
      === batchFlags)
  }

  test("a zero hour against a hot hod profile flags from the gap cursor") {
    // profile: hod 0 expects mean 10.000 (milli 10000), tight
    // dispersion (n=100, ssr small) → a MISSING hour at hod 0 must
    // flag with resid −10000 even though no row ever arrives for it;
    // hours 0 and 48h later arrive, the 24h-later hod-0 hour is the
    // gap-filled zero
    val p = Map("t" -> SeasonalProfile(
      Map(0L -> 10000L), n = 100L, ssr = 1000L))
    implicit val sc = spark.sqlContext
    val in = MemoryStream[HourCount]
    val out = mutable.ArrayBuffer[SeasonalFlag]()
    val q = StreamingSeasonal.monitor(in.toDS(), p)
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[SeasonalFlag], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    val day = 24L * 3600000000L
    in.addData(Seq(HourCount("t", 0L, 10L), HourCount("t", 2 * day, 10L)))
    q.processAllAvailable(); q.stop()
    val got = out.synchronized(out.toSeq).sortBy(_.bucket_us)
    // arrived hours: resid 0 → calm; gap hod-0 hour at +24h: x=0,
    // resid −10000 → 10000²·100 > 9·1000 → flagged
    assert(got === Seq(SeasonalFlag("t", day, 0L, -10000L)))
  }

  test("a stale bucket across micro-batches is dropped, never re-emits") {
    // Contract-violating input: batch 2 delivers an hour AT and an
    // hour BEFORE the cursor. A cursor rewind would re-zero-fill and
    // re-flag the +24h gap hour (duplicate output); the monotonic
    // cursor must drop both stale buckets — same behavior as
    // StreamingCusum, whose cursor only advances inside the fill loop.
    val p = Map("t" -> SeasonalProfile(
      Map(0L -> 10000L), n = 100L, ssr = 1000L))
    implicit val sc = spark.sqlContext
    val in = MemoryStream[HourCount]
    val out = mutable.ArrayBuffer[SeasonalFlag]()
    val q = StreamingSeasonal.monitor(in.toDS(), p)
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[SeasonalFlag], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    val day = 24L * 3600000000L
    in.addData(Seq(HourCount("t", 0L, 10L), HourCount("t", 2 * day, 10L)))
    q.processAllAvailable()
    in.addData(Seq(HourCount("t", 2 * day, 10L), HourCount("t", day, 5L)))
    q.processAllAvailable()
    in.addData(Seq(HourCount("t", 4 * day, 10L)))
    q.processAllAvailable(); q.stop()
    val got = out.synchronized(out.toSeq).sortBy(_.bucket_us)
    // exactly TWO flags: the +24h gap zero (batch 1) and the +72h gap
    // zero the batch-3 fill materializes — no duplicate of the +24h
    // flag, no flag from the stale x=5 rewrite
    assert(got === Seq(SeasonalFlag("t", day, 0L, -10000L),
      SeasonalFlag("t", 3 * day, 0L, -10000L)))
  }
}
