package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The write-once-shuffle-never layout story: co-bucketed tables join
  * and aggregate with NO Exchange in the plan, while the identical
  * un-bucketed join shuffles both sides. Plan-shape evidence for the
  * 100 TB posture — the data volume here is irrelevant, the Exchange
  * nodes are what's under test. */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val prepared: Unit = {
    Bucketing.writeBucketed(
      Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables(spark, sf, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "lineitem_b", "o_orderkey", 8)
  }

  private def withNoBroadcast[A](f: => A): A = {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("co-bucketed join plans with zero Exchange; un-bucketed shuffles") {
    prepared
    withNoBroadcast {
      val joined =
        Bucketing.colocatedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")

      // contrast: same join over the raw parquet shuffles both sides
      val raw = Tables(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .join(Tables(spark, sf, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
          "o_orderkey")
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"),
        "baseline should shuffle — bucketing is what removed it")

      // and the answers agree
      assert(joined.count() === raw.count())
    }
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Bucketing.writePartitioned(
      Tables(spark, sf, "documents").select("doc_id", "n_chars", "lang"),
      s"$dir/docs", "lang")
    val langs = Tables(spark, sf, "documents")
      .select("lang").distinct().collect().map(_.getString(0))
    assert(langs.length > 1, "fixture needs several languages to prune")
    val one = spark.read.parquet(s"$dir/docs")
      .filter(col("lang") === langs.head)
    val scan = one.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // the predicate lands as a partition filter, and the scan's file
    // selection shrinks to the one matching directory
    assert(scan.partitionFilters.nonEmpty,
      s"lang predicate should prune partitions: $scan")
    val relation = scan.relation.location
    assert(relation.inputFiles.count(_.contains(s"lang=${langs.head}")) > 0)
    val selected = scan.selectedPartitions.totalNumberOfFiles
    val total = relation.inputFiles.length.toLong
    assert(selected < total,
      s"pruned scan should read a strict subset: $selected of $total")
    // and the pruned read returns exactly the filtered rows
    val expected = Tables(spark, sf, "documents")
      .filter(col("lang") === langs.head).count()
    assert(one.count() === expected)
  }

  test("z-ordered layout keeps BOTH columns' per-file spans narrow") {
    // the min/max-stat selectivity parquet pruning exploits, measured
    // directly: under a single-column sort, every file spans the full
    // range of the OTHER column (a predicate on it skips nothing);
    // under the Morton interleave, each file covers a small rectangle,
    // so a point predicate on EITHER column hits only a few files
    val n = 1 << 14
    // a full 128×128 grid: x = low digits, y = high digits — truly
    // independent (a hash mod 2^k of id would secretly be a function
    // of x = id mod 2^k)
    val df = spark.range(n).select(
      (col("id") % 128).as("x"),
      ((col("id") / 128) % 128).cast("long").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/linear")
    Bucketing.writeZOrdered(df, s"$dir/z", "x", "y", 16)
    // rows survive the layout intact
    assert(spark.read.parquet(s"$dir/z").count() === n.toLong)
    def hits(path: String, c: String, v: Int): Int =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .filter(col("lo") <= v && col("hi") >= v)
        .count().toInt
    // linear-by-x: a y predicate overlaps EVERY file
    assert(hits(s"$dir/linear", "y", 5) === 16)
    // z-order: both columns' point predicates overlap only a minority
    // of the 16 files (each file is a rectangle in (x, y) space)
    assert(hits(s"$dir/z", "y", 5) <= 8, s"y=5 hits ${hits(s"$dir/z", "y", 5)}")
    assert(hits(s"$dir/z", "x", 5) <= 8, s"x=5 hits ${hits(s"$dir/z", "x", 5)}")
  }

  test("groupBy on the bucket key aggregates in place (no Exchange)") {
    prepared
    val agg = spark.table("lineitem_b")
      .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregate must not shuffle:\n$plan")
    // sanity: same result as the shuffled aggregate over raw parquet
    val raw = Tables(spark, sf, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum("l_quantity").as("qty"))
    assert(agg.orderBy("o_orderkey").collect()
      .sameElements(raw.orderBy("o_orderkey").collect()))
  }
}
