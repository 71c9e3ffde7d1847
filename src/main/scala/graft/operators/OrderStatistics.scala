package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed order statistics — the pair-free core behind the
  * engine's big×big interval join (`q_join_interval`) and the exact
  * Gini rank statistic (`q_stats_gini`), factored out (round-9
  * generalization) so arbitrary validity-interval workloads — the SCD2
  * family's natural consumer — can reuse it with a tuned bucket count.
  *
  * Scale shape: points and queries range-bucket on broadcast extrema,
  * ONE hash exchange on the bucket id, a per-partition sorted linear
  * scan produces within-bucket prefix counts (mapPartitions — genuine
  * per-partition imperative logic), and the `nBuckets`-row bucket-total
  * table joins global prefixes back via a bounded broadcast theta join.
  * O(N log N) end to end, no candidate-pair blowup at any overlap
  * density — including the all-spans-overlap-one-hot-point worst case
  * where any bucketed pair join is quadratic. `nBuckets` trades scan
  * parallelism against the theta-join width: more buckets → shorter
  * per-partition scans (keep partitions in memory at scale), the
  * broadcast side stays tiny either way. */
object OrderStatistics {

  /** For each query value `q` (keyed by BIGINT `user_id`,
    * `session_idx`), how many point values `v` are ≤ q (`inclusive`)
    * or < q (strict). Input frames: `points` with a single BIGINT
    * column `v`; `queries` with BIGINT columns `user_id`,
    * `session_idx`, `q`. Output: (user_id, session_idx, cnt).
    * Ties: `inclusive` sorts points before equal-valued queries. */
  def countByRank(points: DataFrame, queries: DataFrame,
      inclusive: Boolean, nBuckets: Int = 256): DataFrame =
    prefixSumByRank(points.select(col("v"), lit(1L).as("w")), queries,
      inclusive, nBuckets)
      .withColumnRenamed("wsum", "cnt")

  /** Weighted generalization of [[countByRank]] — the distributed
    * PREFIX SUM: for each query value `q`, Σ of point WEIGHTS `w`
    * over points with v ≤ q (`inclusive`) or v < q (strict).
    * `points` carries BIGINT columns `v` and `w`; output
    * (user_id, session_idx, wsum). With w ≡ 1 this IS countByRank
    * (which delegates here); with real weights it answers "how much
    * mass sits at or below this rank" — cumulative-share / Lorenz /
    * Pareto cuts — in the same O(N log N), no-global-sort shape. */
  def prefixSumByRank(points: DataFrame, queries: DataFrame,
      inclusive: Boolean, nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val sp = points.sparkSession
    import sp.implicits._
    val nB = nBuckets
    val ext = points.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    // bucket arithmetic in DOUBLE: (v - mn) * nB overflows Long for
    // wide value domains (microsecond epochs × thousands of buckets —
    // ANSI mode crashes, legacy mode wraps buckets non-monotonic and
    // SILENTLY corrupts counts). Doubles never overflow here, and
    // IEEE rounding is monotone non-decreasing at every step
    // (subtract, multiply, divide by a positive constant), so floor
    // stays monotone in v — the ONLY property bucket assignment
    // needs; boundaries are internal, no oracle replicates them.
    def bucketOf(c: Column): Column =
      least(lit(nB - 1), greatest(lit(0),
        ((c.cast("double") - col("mn").cast("double")) * nB /
          (col("mx").cast("double") - col("mn").cast("double") + 1.0))
          .cast("int")))
    val pTag = if (inclusive) 0 else 1
    val pts = points.crossJoin(broadcast(ext))
      .select(bucketOf(col("v")).as("bucket"), col("v").as("value"),
        lit(pTag).as("tag"), lit(-1L).as("uid"), lit(-1L).as("idx"),
        col("w").as("wt"))
    val qs = queries.crossJoin(broadcast(ext))
      .select(bucketOf(col("q")).as("bucket"), col("q").as("value"),
        lit(1 - pTag).as("tag"), col("user_id").as("uid"),
        col("session_idx").as("idx"), lit(0L).as("wt"))
    val local = pts.unionByName(qs)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("value"), col("tag"))
      .toDF("_1", "_2", "_3", "_4", "_5", "_6")
      .as[(Int, Long, Int, Long, Long, Long)]
      .mapPartitions { it =>
        var curBucket = Int.MinValue
        var acc = 0L
        it.flatMap { case (b, _, _, uid, idx, wt) =>
          if (b != curBucket) { curBucket = b; acc = 0L }
          if (uid == -1L) { acc += wt; Iterator.empty }
          else Iterator.single((uid, idx, b, acc))
        }
      }.toDF("uid", "idx", "qbucket", "local")
    val totals = pts.groupBy(col("bucket")).agg(sum(col("wt")).as("c"))
    local.join(broadcast(totals), col("bucket") < col("qbucket"), "left")
      .groupBy(col("uid"), col("idx"), col("local"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("base"))
      .select(col("uid").as("user_id"), col("idx").as("session_idx"),
        (col("base") + col("local")).as("wsum"))
  }

  /** Interval-overlap degree, pair-free: for each interval
    * [st, en] in `intervals` (BIGINT endpoint columns named by
    * `stCol`/`enCol`, identified by BIGINT columns `idCol1`/`idCol2`),
    * the number of OTHER intervals it overlaps, via the identity
    *   degree(a) = #{st_b ≤ en_a} − #{en_b < st_a} − selfOverlaps(a)
    * (everything not strictly before and not strictly after overlaps).
    * `selfCount = 1` subtracts the interval's own trivially-counted
    * self term; pass a different correction if same-id intervals can
    * overlap and must be excluded (the q_join_interval caller proves
    * its padded same-user sessions stay strictly disjoint, so 1 is
    * exact there). Output: (id columns, st, degree). */
  def intervalDegree(intervals: DataFrame, idCol1: String, idCol2: String,
      stCol: String, enCol: String, nBuckets: Int = 256,
      selfCount: Long = 1L): DataFrame = {
    val sess = intervals.select(
      col(idCol1).as("user_id"), col(idCol2).as("session_idx"),
      col(stCol).cast("long").as("st"), col(enCol).cast("long").as("en"))
    val cle = countByRank(sess.select(col("st").as("v")),
      sess.select(col("user_id"), col("session_idx"), col("en").as("q")),
      inclusive = true, nBuckets).withColumnRenamed("cnt", "n_le")
    val clt = countByRank(sess.select(col("en").as("v")),
      sess.select(col("user_id"), col("session_idx"), col("st").as("q")),
      inclusive = false, nBuckets).withColumnRenamed("cnt", "n_lt")
    sess.join(cle, Seq("user_id", "session_idx"))
      .join(clt, Seq("user_id", "session_idx"))
      .select(col("user_id").as(idCol1), col("session_idx").as(idCol2),
        col("st").as(stCol),
        (col("n_le") - col("n_lt") - lit(selfCount)).as("degree"))
  }
}
