package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-stage aggregation: partial-aggregate on
  * (key, salt), then final-aggregate on key. For a key holding a large
  * fraction of all rows (the classic hot-key problem at 100 TB), the
  * first stage spreads that key's rows over `salts` reducers; the
  * second stage combines `salts` partial rows per key — bounded work
  * regardless of skew.
  *
  * The salt is a deterministic hash of caller-chosen columns (never
  * `rand()` — replay/retry stay idempotent). Results are exactly equal
  * to a direct groupBy for the algebraic aggregates exposed here,
  * which is what the DuckDB oracle of [[graft.analytics]] asserts.
  */
object SaltedAgg {

  /** Sum/count by key with salting. `saltFrom` columns seed the salt
    * hash (pick high-cardinality ones, e.g. the row's natural id). */
  def sumCountByKey(df: DataFrame, key: Column, value: Column,
      saltFrom: Seq[Column], salts: Int = 64): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(xxhash64(saltFrom: _*), lit(salts)))
      .withColumn("__key", key)
      .withColumn("__val", value)
    val partial = salted.groupBy(col("__key"), col("__salt"))
      .agg(sum(col("__val")).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(col("__key"))
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
  }
}
