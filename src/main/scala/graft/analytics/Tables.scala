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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // ns → µs by truncation — identical to DuckDB's
      // CAST(ts AS TIMESTAMP) on TIMESTAMP_NS, so oracles line up.
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
