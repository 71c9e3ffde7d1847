package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the CdcQueries scaladoc's scale claim: with both snapshots
  * written BUCKETED on the table key, the full-outer snapshot diff
  * (and the apply's anti-join against it) plans with ZERO Exchange —
  * at 100 TB the daily diff then reads two bucketed tables and never
  * shuffles either — while the identical diff over raw parquet
  * shuffles both sides. Values must be identical either way (layout
  * can never change the changeset). */
class CdcBucketedSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withNoBroadcast[A](f: => A): A = {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("bucketed snapshot diff plans with zero Exchange and identical values") {
    val (v1, v2) = CdcQueries.snapshots(spark, sf)
    Bucketing.writeBucketed(v1, "cdc_v1_b", "k", 8)
    Bucketing.writeBucketed(v2, "cdc_v2_b", "k", 8)
    withNoBroadcast {
      val bucketed = CdcQueries.diff(
        spark.table("cdc_v1_b"), spark.table("cdc_v2_b"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed snapshot diff must not shuffle:\n$plan")
      // contrast: the same diff over the raw frames shuffles
      val raw = CdcQueries.diff(v1, v2)
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"),
        "baseline diff should shuffle — bucketing is what removed it")
      // layout must never change the changeset
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1))
      assert(bucketed.collect().sortBy(key).toSeq ===
        raw.collect().sortBy(key).toSeq)
    }
  }

  test("bucketed changeset apply keeps the anti-join shuffle-free on the snapshot side") {
    val (v1, v2) = CdcQueries.snapshots(spark, sf)
    Bucketing.writeBucketed(v1, "cdc_v1_b2", "k", 8)
    withNoBroadcast {
      val v1b = spark.table("cdc_v1_b2")
      val d = CdcQueries.diff(v1b, v2)
      val recon = CdcQueries.applyChangeset(v1b, d)
      // the reconstruction must still equal v2 row-for-row from the
      // bucketed layout (the AnalyticsSpec invariant, re-proven here
      // on the production layout)
      val mismatch = recon.withColumnRenamed("p1", "pr")
        .join(v2, Seq("k"), "full_outer")
        .filter(col("pr").isNull || col("p2").isNull ||
          col("pr") =!= col("p2"))
      assert(mismatch.isEmpty,
        s"bucketed reconstruction diverges: ${mismatch.take(5).toSeq}")
    }
  }
}
