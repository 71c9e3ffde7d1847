package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the custom operators without oracle queries: SpaceSaving
  * heavy hitters and bucketed co-located joins. */
class OperatorsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("space saving: exact when capacity covers the key space") {
    val data = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(20)("c") ++ Seq.fill(5)("d")).toDS()
    val top = HeavyHitters.topK(data.repartition(4), capacity = 10, k = 3)
    assert(top === Seq(("a", 50L), ("b", 30L), ("c", 20L)))
  }

  test("space saving: finds the dominant key under eviction pressure") {
    // 500 hits of the hot key among 200 distinct noise keys, capacity 8
    val noise = (0 until 400).map(i => s"noise${i % 200}")
    val data = scala.util.Random.shuffle(
      Seq.fill(500)("hot") ++ noise).toDS()
    val top = HeavyHitters.topK(data.repartition(4), capacity = 8, k = 1)
    assert(top.head._1 === "hot")
    // SpaceSaving overestimates, never underestimates
    assert(top.head._2 >= 500L)
  }

  test("bucketed tables join without a shuffle") {
    val sf = "/root/testdata/sf0.001" // warehouse dir set in SparkTestBase
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    // force the shuffle-join path so bucket co-location is observable
    // (tiny test tables would otherwise auto-broadcast)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"))
      // co-located: no exchange below the join — the only allowed
      // exchange is the final aggregation's
      val belowJoin = plan.linesIterator
        .dropWhile(l => !l.contains("Join")).toSeq
      assert(!belowJoin.exists(_.contains("Exchange")),
        s"bucketed join inputs must not re-shuffle:\n$plan")
      assert(joined.agg(sum("n")).head().getLong(0) ===
        spark.read.parquet(s"$sf/lineitem.parquet").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
