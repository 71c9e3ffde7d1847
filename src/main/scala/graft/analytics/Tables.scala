package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver's parquet tables (TESTDATA.md). Schema comes
  * from parquet footers; filters/projections push down to the scan. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Some fixtures carry TIMESTAMP(NANOS) (e.g. events at sf0.001),
    // which the parquet reader rejects unless nanos surface as long.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Fixture timestamps are tz-naive micros (isAdjustedToUTC=false);
    // Spark 4 would infer TIMESTAMP_NTZ, which half the timestamp
    // function surface (unix_micros & co.) rejects. Read them as
    // session-UTC TIMESTAMP instead — value-identical under the
    // project-wide UTC session, and what DuckDB's naive reads of the
    // same files produce, so oracles line up.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // ns → µs by truncation — identical to DuckDB's
      // CAST(ts AS TIMESTAMP) on TIMESTAMP_NS, so oracles line up.
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Round-robin a scan across the cluster ONLY when the planned scan
    * yields fewer splits than cores — a single-file local fixture
    * otherwise runs every narrow stage (shingling, hashing, n-gram
    * explode, partial aggregation) on one task. At production scale a
    * 100 TB table is thousands of splits and this is a no-op; the
    * guard is plan-derived, so a multi-split input is NEVER re-
    * shuffled (asserted in PlanAuditSpec for both the DNS pipeline
    * and the documents family).
    *
    * Projections still prune through the added Repartition node
    * (ColumnPruning pushes the needed-column set below it), so scans
    * keep reading only the referenced columns. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Split count comes from the planned scan itself (FileScanRDD
    // partition packing) — NOT from df.rdd, which would run a second
    // full planning pass and build the whole RDD DAG per invocation.
    // AQE wraps the whole plan in AdaptiveSparkPlanExec (itself a leaf
    // node), so unwrap it first; DSv2 sources plan as BatchScanExec —
    // both arms matched so a source-strategy change can't silently
    // leave the single-split fixture on one core.
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val splits = plan.collectLeaves().map {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.inputRDDs().map(_.getNumPartitions).sum
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.size
      case _ => target // non-file source: assume production split count
    }.sum
    if (splits < target) df.repartition(target) else df
  }
}
