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

  /** Skew-resistant inner equi-join: the JOIN twin of
    * [[sumCountByKey]]'s hot-key treatment, for when the big side's
    * join key is skewed and the other side is too large to broadcast.
    * The big side salts each row deterministically into `salts` lanes;
    * the small side replicates each row across ALL lanes; the join key
    * becomes (key, salt), so a hot key's rows spread over `salts`
    * reducers instead of one straggler task. Lossless by construction
    * — every big-side row still meets every matching small-side row
    * exactly once — which is what the registered query's oracle (a
    * plain join) proves by hash-match.
    *
    * The trade: the small side shuffles `salts`× its size — worth it
    * exactly when skew leaves reducers idle while one drowns. (AQE's
    * runtime skew-join split is the first tool to reach for; explicit
    * salting is for the planned-ahead case — a known-hot key in a
    * recurring production join — and for sort-merge joins whose skew
    * AQE declines to split.) `salts` stays deliberately small
    * (default 16): replication cost is linear in it, and a hot key
    * only needs enough lanes to fill the executor cores. */
  def innerJoinSalted(big: DataFrame, small: DataFrame, key: String,
      saltFrom: Seq[Column], salts: Int = 16): DataFrame = {
    // withColumn would silently overwrite (and the final drop remove)
    // a caller's own __salt column — refuse instead of losing data
    require(!big.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "innerJoinSalted reserves the __salt column name; rename it on " +
        "the input frames first")
    val bs = big.withColumn("__salt",
      pmod(xxhash64(saltFrom: _*), lit(salts.toLong)))
    val ss = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
      .withColumn("__salt", col("__salt").cast("long"))
    bs.join(ss, Seq(key, "__salt")).drop("__salt")
  }

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
