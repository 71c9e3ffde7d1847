package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Change-data-capture over table snapshots: diff two versions of a
  * keyed table into an insert/update/delete changeset, and apply a
  * changeset back onto the old snapshot (the MERGE half of the
  * contract) — the refresh primitive of every periodically re-crawled
  * training corpus ("what changed since the last snapshot, and does
  * replaying those changes reproduce the new one?"). The reference has
  * no table versioning (its pipeline is stateless per request,
  * app/app.py:60-102); this family is part of the SURVEY §2.6
  * warehouse-modeling mandate, sibling to the SCD2 builder
  * ([[RelationalQueries.qScd2Orders]]) which consumes exactly these
  * changesets to extend version chains.
  *
  * Scale shape: the diff is ONE full-outer sort-merge join keyed on
  * the table key — both snapshots shuffle once on that key (zero
  * shuffles when the snapshots are bucketed on it, the layout
  * [[Bucketing]] writes), and the change classification is a narrow
  * projection over the joined row. The apply side is an anti-join
  * (drop deleted/updated keys) plus a union of the upsert rows — the
  * same single key exchange. Nothing is ever driver-side; the
  * changeset streams exactly like any other relation, which is what
  * makes the same plan the body of a `foreachBatch` incremental
  * refresh at 100 TB.
  *
  * The two snapshots are derived deterministically from the immutable
  * `orders` fixture (the driver's tables are read-only): v1 drops
  * `o_orderkey % 17 = 3` (rows that will later be INSERTed), v2 drops
  * `o_orderkey % 19 = 7` (rows that were DELETEd) and bumps the price
  * by 1.0 on `o_orderkey % 5 = 0` (rows UPDATEd; +1.0 on a double is
  * exact, so cross-engine equality compares are bit-safe). */
object CdcQueries {
  import RelationalQueries.Q

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** The two synthetic snapshots (k, p1) / (k, p2). Exposed for the
    * spec, which must pin the SAME fixtures the registered queries
    * run. */
  private[analytics] def snapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
    val v1 = o.filter(col("k") % 17 =!= 3).select(col("k"), col("p").as("p1"))
    val v2 = o.filter(col("k") % 19 =!= 7).select(col("k"),
      when(col("k") % 5 === 0, col("p") + lit(1.0)).otherwise(col("p"))
        .as("p2"))
    (v1, v2)
  }

  /** The changeset v1 → v2: (op ∈ I|U|D, o_orderkey, old_price,
    * new_price); unchanged rows are dropped inside the same
    * projection. Exposed for [[qCdcApply]] and the spec. */
  private[analytics] def diff(v1: DataFrame, v2: DataFrame): DataFrame =
    v1.join(v2, Seq("k"), "full_outer")
      .withColumn("op",
        when(col("p1").isNull, lit("I"))
          .when(col("p2").isNull, lit("D"))
          .when(col("p1") =!= col("p2"), lit("U")))
      .filter(col("op").isNotNull)
      .select(col("op"), col("k").as("o_orderkey"),
        col("p1").as("old_price"), col("p2").as("new_price"))

  /** Snapshot diff: the full changeset, keyed-ordered. */
  val qCdcDiff = Q(
    "q_cdc_diff",
    (s, dir) => {
      val (v1, v2) = snapshots(s, dir)
      diff(v1, v2).orderBy(col("o_orderkey"))
    },
    Some("""
      WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
      v1 AS (SELECT k, p AS p1 FROM o WHERE k % 17 <> 3),
      v2 AS (SELECT k, CASE WHEN k % 5 = 0 THEN p + 1.0 ELSE p END AS p2
             FROM o WHERE k % 19 <> 7),
      d AS (
        SELECT COALESCE(v1.k, v2.k) AS o_orderkey, p1, p2,
               CASE WHEN p1 IS NULL THEN 'I'
                    WHEN p2 IS NULL THEN 'D'
                    WHEN p1 <> p2 THEN 'U' END AS op
        FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
      SELECT op, o_orderkey, p1 AS old_price, p2 AS new_price
      FROM d WHERE op IS NOT NULL ORDER BY o_orderkey"""))

  /** Replay a changeset onto the old snapshot: drop deleted/updated
    * keys, union the upsert rows — the MERGE body [[qCdcApply]] gates
    * and the spec pins row-for-row. */
  private[analytics] def applyChangeset(v1: DataFrame, d: DataFrame): DataFrame = {
    val gone = d.filter(col("op").isin("D", "U"))
      .select(col("o_orderkey").as("k"))
    val upserts = d.filter(col("op").isin("I", "U"))
      .select(col("o_orderkey").as("k"), col("new_price").as("p1"))
    v1.join(gone, Seq("k"), "left_anti").unionByName(upserts)
  }

  /** Changeset apply (MERGE): v1 + diff(v1,v2) must reconstruct v2.
    * The gate aggregates the reconstruction into 10 key-bucket rows
    * (count + exact DECIMAL-accumulated price sum) while the ORACLE
    * computes the same aggregate from v2 DIRECTLY — the hash-match
    * holds only if the merge replayed every insert, update, and
    * delete exactly (CdcSpec additionally pins full-frame equality
    * row-for-row at sf0.001). */
  val qCdcApply = Q(
    "q_cdc_apply",
    (s, dir) => {
      val (v1, v2) = snapshots(s, dir)
      applyChangeset(v1, diff(v1, v2)).groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("p1").cast(DecimalType(25, 4))).cast("double")
            .as("sum_price"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
      v2 AS (SELECT k, CASE WHEN k % 5 = 0 THEN p + 1.0 ELSE p END AS p2
             FROM o WHERE k % 19 <> 7)
      SELECT k % 10 AS bucket, COUNT(*) AS n_rows,
             CAST(SUM(CAST(p2 AS DECIMAL(25,4))) AS DOUBLE) AS sum_price
      FROM v2 GROUP BY bucket ORDER BY bucket"""))

  val all: Seq[Q] = Seq(qCdcDiff, qCdcApply)
}
