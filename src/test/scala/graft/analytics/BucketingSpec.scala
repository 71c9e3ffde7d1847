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
