package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: pre-shuffle a table ONCE at write time so
  * every later join/aggregate on the bucket key is shuffle-free.
  *
  * This is the "reuse a partitioning across stages" lever at 100 TB:
  * a fact table that is joined on the same key by many downstream
  * queries (orders ⋈ lineitem on the order key, token tables on
  * doc_id, pair graphs on cluster id) pays the exchange once, at
  * ingest, instead of per query. Both sides bucketed by the same key
  * into the same bucket count let Catalyst plan a SortMergeJoin whose
  * children are already hash-distributed — no Exchange on either side
  * (asserted in BucketingSpec) — and a groupBy on the bucket key
  * aggregates in place the same way.
  *
  * Sizing rule for real clusters: buckets ≈ total table bytes /
  * target partition size (128–512 MB), rounded to a multiple of the
  * executor-core count; both join sides MUST agree on (key, count) or
  * Spark re-shuffles the mismatched side.
  */
object Bucketing {

  /** Align `df` to the write-side bucket layout: hash-repartition by
    * the bucket key into exactly `buckets` partitions. DataFrame hash
    * partitioning and `bucketBy` use the same murmur3-pmod bucketing
    * function, so each write task then holds exactly ONE bucket and a
    * bucketed write emits one file per bucket — instead of up to
    * (write tasks × buckets) files when the incoming partitioning is
    * arbitrary (guide §6: the small-files problem, paid twice — file
    * creation/commit at write time and per-file open at every later
    * probe; r13 measured ~50–100 ms of fixed cost per created file on
    * the store lifecycle queries). The exchange this adds carries
    * exactly the bytes the write was going to cluster anyway, and the
    * bucket-count sizing rule below already keeps per-bucket volumes
    * in the 128–512 MB band at scale. */
  def alignToBuckets(df: DataFrame, key: String, buckets: Int): DataFrame =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in the
    * session catalog. Sorting by the key lets SortMergeJoin skip the
    * per-task sort as well (the scan yields sorted runs). The frame is
    * [[alignToBuckets]]-aligned first so the table lands as one file
    * per bucket. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    alignToBuckets(df, key, buckets).write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two co-bucketed catalog tables on their shared bucket key.
    * With both sides bucketed by `key` into the same count, the plan
    * carries no Exchange (verified by plan audit, BucketingSpec). */
  def colocatedJoin(s: SparkSession, left: String, right: String,
      key: String): DataFrame =
    s.table(left).join(s.table(right), key)

  /** Hive-style partitioned layout — the FILTER-key complement to the
    * bucketed JOIN-key layout. Writing a corpus partitioned by its
    * hot predicate columns (language, source, date) turns every
    * `WHERE lang = 'en'` into directory pruning: non-matching
    * partitions are never listed, opened, or scanned
    * (`PartitionFilters` in the scan node, asserted in BucketingSpec).
    * At 100 TB this is the difference between reading one language's
    * share and reading everything.
    *
    * Keep partition columns low-cardinality (≤ a few thousand
    * directories); high-cardinality keys belong in bucketing or
    * file-level min/max stats instead. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: String*): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Morton (Z-order) bit-interleave of two 16-bit-ranged columns —
    * the magic-number spread (each value's bits move to even/odd
    * positions), pure codegen-friendly shift/mask arithmetic. */
  private[analytics] def morton(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    def spread(c0: org.apache.spark.sql.Column) = {
      var v = c0.cast("long")
      v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
      v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
      v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
      v
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-ordered write — the MULTI-column complement to [[writeBucketed]]
    * (one join key) and [[writePartitioned]] (low-cardinality filter
    * keys): range-partition and sort by the Morton interleave of two
    * high-cardinality filter columns, so every written file covers a
    * small RECTANGLE of the (a, b) space instead of a thin full-height
    * stripe. Parquet min/max stats on BOTH columns then become
    * selective in every file — a predicate on EITHER column skips most
    * files/row-groups, which a single-column sort can only offer for
    * its own column. This is the standard lakehouse answer (Delta/
    * Iceberg `ZORDER BY`) for two hot high-cardinality predicates that
    * partitioning cannot hold (BucketingSpec measures the per-file
    * span shrinkage directly). Columns must fit 16 bits (0..65535) —
    * hash or quantize wider domains down first; `files` sizes the
    * layout exactly like a bucket count. */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", morton(col(a), col(b)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
