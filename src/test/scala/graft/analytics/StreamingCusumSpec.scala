package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming CUSUM monitor: replaying the fixture's SPARSE hourly
  * counts against the batch-calibrated reference mean must leave the
  * running peak exactly at the batch query's (peak_h, cusum_peak)
  * row — one micro-batch or many — the gap cursor must zero-fill
  * interior hours, and the cursor/peak state must survive a
  * checkpoint restart. */
class StreamingCusumSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingCusum.{CusumPoint, CusumRef, HourCount}

  private val sf = "/root/testdata/sf0.001"

  // (event_type -> (n_hours, total_events, peak_us, cusum_peak))
  private lazy val batch: Map[String, (Long, Long, Long, Long)] =
    TsQueries.qTsCusum.run(spark, sf)
      .selectExpr("event_type", "n_hours", "total_events",
        "unix_micros(peak_h)", "cusum_peak")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  private lazy val refs: Map[String, CusumRef] =
    batch.map { case (et, (n, tot, _, _)) => et -> CusumRef(n, tot) }

  private lazy val hourly: Seq[HourCount] =
    Tables(spark, sf, "events")
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("x"))
      .selectExpr("event_type", "unix_micros(w.start)", "x")
      .collect().map(r => HourCount(r.getString(0), r.getLong(1),
        r.getLong(2)))
      .sortBy(h => (h.bucket_us, h.event_type))

  private def runStream(batches: Seq[Seq[HourCount]])
      : Map[String, CusumPoint] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[HourCount]
    val last = mutable.LinkedHashMap[String, CusumPoint]()
    val q = StreamingCusum.monitor(in.toDS(), refs)
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[CusumPoint], _: Long) =>
          last.synchronized {
            df.collect().sortBy(_.bucket_us)
              .foreach(p => last(p.event_type) = p) }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    last.synchronized(last.toMap)
  }

  private def assertParity(got: Map[String, CusumPoint]): Unit = {
    assert(got.keySet === batch.keySet)
    got.foreach { case (et, p) =>
      val (_, _, peakUs, peakCum) = batch(et)
      assert(p.peak_us === peakUs, s"$et peak hour")
      assert(p.cusum_peak === peakCum, s"$et peak value")
      // whole-series invariant: Σ (n·x − S) over the full span is 0
      assert(p.cum === 0L, s"$et final cum must close at zero")
    }
  }

  test("one-shot replay ≡ the batch CUSUM peak (and cum closes at 0)") {
    assert(batch.nonEmpty)
    assertParity(runStream(Seq(hourly)))
  }

  test("split replay ≡ batch: cursor and running peak survive micro-batches") {
    val third = hourly.length / 3
    assertParity(runStream(Seq(hourly.take(third),
      hourly.slice(third, 2 * third), hourly.drop(2 * third))))
  }

  test("interior gaps zero-fill; ties keep the earliest hour") {
    // reference mean 2 over 6 hours (total 12): series 4,_,_,4 with
    // hours 1,2 absent → zero-filled; cum walks 12−12=... per hour:
    // n=6, tot=12 → contribution 6x−12: +12, −12, −12, +12 →
    // cum 12, 0, −12, 0; |peak| ties at 12 (h0) and −12 (h2) → h0
    val rows = Seq(HourCount("t", 0L, 4L),
      HourCount("t", 3L * 3600000000L, 4L))
    val got = runStream2(Seq(rows),
      Map("t" -> CusumRef(6L, 12L)))
    val pts = got.toSeq.sortBy(_.bucket_us)
    assert(pts.map(_.cum) === Seq(12L, 0L, -12L, 0L))
    assert(pts.last.peak_us === 0L && pts.last.cusum_peak === 12L)
  }

  test("cursor and peak survive a checkpoint restart") {
    val inDir = java.nio.file.Files.createTempDirectory("cusum_in")
    val ckpt = java.nio.file.Files
      .createTempDirectory("cusumckpt").toString
    val out = mutable.ArrayBuffer[CusumPoint]()
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("event_type STRING, bucket_us BIGINT, x BIGINT")
        .json(inDir.toString).as[HourCount]
      val q = StreamingCusum.monitor(src, refs)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[CusumPoint], _: Long) =>
            out.synchronized { out ++= df.collect() }
            ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    val half = hourly.length / 2
    def writeFile(name: String, rows: Seq[HourCount]): Unit = {
      val lines = rows.map(h =>
        s"""{"event_type":"${h.event_type}","bucket_us":${h.bucket_us},"x":${h.x}}""")
      java.nio.file.Files.write(inDir.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))
      ()
    }
    writeFile("a.json", hourly.take(half)); runOnce()
    writeFile("b.json", hourly.drop(half)); runOnce()
    val last = mutable.LinkedHashMap[String, CusumPoint]()
    out.sortBy(_.bucket_us).foreach(p => last(p.event_type) = p)
    assertParity(last.toMap)
  }

  /** runStream with explicit refs (the synthetic test). */
  private def runStream2(batches: Seq[Seq[HourCount]],
      r: Map[String, CusumRef]): Seq[CusumPoint] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[HourCount]
    val out = mutable.ArrayBuffer[CusumPoint]()
    val q = StreamingCusum.monitor(in.toDS(), r)
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[CusumPoint], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    out.synchronized(out.toSeq)
  }
}
