package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming join-view maintenance: replaying the fixture's base +
  * delta CDC rows and folding the emitted signed deltas per customer
  * must reproduce the batch q_agg_join_ivm view exactly — one
  * micro-batch or many, lines before or after their orders. */
class StreamingJoinIvmSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingJoinIvm.{JoinCdc, ViewDelta}

  private val sf = "/root/testdata/sf0.001"

  /** The batch view: (custkey -> (n, rev_cents)). */
  private lazy val batchView: Map[Long, (Long, Long)] =
    RelationalQueries.qAggJoinIvm.run(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** The same base + delta classes as the batch query, as CDC rows. */
  private lazy val (orderEvents, lineEvents): (Seq[JoinCdc], Seq[JoinCdc]) = {
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("o_orderkey % 10").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val l = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"),
        expr("l_orderkey % 10").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val os = o.flatMap { case (ok, ck, m) =>
      // base insert (m != 7 arrives up front; m == 7 is the late
      // insert class) plus the m == 1 cancel
      val base = if (m != 7) Seq(JoinCdc("O", ok, ck, 0L, 1L)) else Nil
      val ins = if (m == 7) Seq(JoinCdc("O", ok, ck, 0L, 1L)) else Nil
      val del = if (m == 1) Seq(JoinCdc("O", ok, ck, 0L, -1L)) else Nil
      base ++ ins ++ del
    }.toSeq
    val ls = l.flatMap { case (ok, ln, cents, m) =>
      val base = if (m != 7) Seq(JoinCdc("L", ok, 0L, cents, 1L)) else Nil
      val ins = if (m == 7) Seq(JoinCdc("L", ok, 0L, cents, 1L)) else Nil
      val del = if (m == 3 && ln == 1)
        Seq(JoinCdc("L", ok, 0L, cents, -1L)) else Nil
      base ++ ins ++ del
    }.toSeq
    (os, ls)
  }

  private def runStream(batches: Seq[Seq[JoinCdc]]): Map[Long, (Long, Long)] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[JoinCdc]
    val out = mutable.ArrayBuffer[ViewDelta]()
    val q = StreamingJoinIvm.monitor(in.toDS())
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[ViewDelta], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    out.synchronized(out.toSeq)
      .groupBy(_.custkey)
      .map { case (ck, ds) =>
        ck -> ((ds.map(_.dn).sum, ds.map(_.dcents).sum)) }
      .filter { case (_, (n, c)) => n != 0L || c != 0L }
  }

  test("one-shot replay folds to the batch join view") {
    assert(batchView.nonEmpty)
    assert(runStream(Seq(orderEvents ++ lineEvents)) === batchView)
  }

  test("orders-then-lines and lines-then-orders both fold to the view") {
    assert(runStream(Seq(orderEvents, lineEvents)) === batchView)
    // lines arrive BEFORE any order exists: every line lands in state
    // silently (o = 0), and each order's arrival emits the whole
    // accumulated product term
    assert(runStream(Seq(lineEvents, orderEvents)) === batchView)
  }

  test("many interleaved micro-batches fold to the view") {
    val all = new scala.util.Random(5).shuffle(orderEvents ++ lineEvents)
    val batches = all.grouped((all.size / 7).max(1)).toSeq
    assert(runStream(batches) === batchView)
  }

  test("cross-customer transfer in one micro-batch emits both sides") {
    // the round-11 advice case: order 1 (customer 10) holds lines in
    // state; ONE micro-batch deletes it and re-inserts the same
    // orderkey under customer 20. A single net-(dn, dc) emission per
    // key would read zero and strand the view's credit on customer 10;
    // per-custkey-touched accumulation must emit the transfer.
    val setup = Seq(
      JoinCdc("O", 1L, 10L, 0L, 1L),
      JoinCdc("L", 1L, 0L, 500L, 1L),
      JoinCdc("L", 1L, 0L, 700L, 1L))
    val transfer = Seq(
      JoinCdc("O", 1L, 10L, 0L, -1L),
      JoinCdc("O", 1L, 20L, 0L, 1L))
    val folded = runStream(Seq(setup, transfer))
    assert(folded === Map(20L -> ((2L, 1200L))),
      s"transfer must move the full credit to customer 20: $folded")
    // same events, transfer split ACROSS batches — identical fold
    assert(runStream(Seq(setup, transfer.take(1), transfer.drop(1))) ===
      Map(20L -> ((2L, 1200L))))
  }
}
