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
    // global prefix per bucket id: a nBuckets×nBuckets bounded theta
    // join over the bucket-total table (NOT totals joined straight
    // into the N-row local frame — that shape fans every query row
    // out to ~nBuckets/2 matches and re-aggregates them, an N×nB
    // nested-loop the round-10 bench caught at 2–3× the whole query's
    // cost). The per-bucket prefix table covers every id in [0, nB)
    // (a query bucket may hold no points), broadcasts, and joins the
    // local frame by EQUALITY — one codegen'd hash probe per row.
    val totals = pts.groupBy(col("bucket")).agg(sum(col("wt")).as("c"))
    val cumBefore = sp.range(0, nB.toLong).toDF("qb")
      .join(broadcast(totals), col("bucket") < col("qb"), "left")
      .groupBy(col("qb"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("base"))
    local.join(broadcast(cumBefore), col("qbucket") === col("qb"))
      .select(col("uid").as("user_id"), col("idx").as("session_idx"),
        (col("base") + col("local")).as("wsum"))
  }

  /** Exact per-group LOWER MEDIAN without a per-group sort — the
    * two-pass radix-histogram core (factored out of
    * `q_agg_radix_median` in round 10 so the MAD / lead-time / any
    * per-group order-statistic query rides it instead of a ranked
    * window over raw rows): pass 1 counts `bucketWidth`-wide value
    * buckets per group and locates the bucket where the cumulative
    * count crosses rank ⌈n/2⌉; pass 2 re-scans ONLY that bucket's
    * rows and walks exact value counts to the remaining rank. Both
    * cumulative walks are windows over BOUNDED frames (≤ groups ×
    * buckets rows, then ≤ bucketWidth distinct values), never a
    * partition-wide sort of the data — the plan a 1000-executor
    * cluster wants when the group key has 3–5 values and a ranked
    * window would funnel 100 TB into ≤5 reducers.
    *
    * Input: columns `g` (any group type) and `c` (BIGINT value).
    * Output: (g, n, med) — `med` is the value AT rank ⌈n/2⌉ (lower
    * median: exact, integer, no even-count interpolation seam).
    * Bucket ids use double division + truncation, monotone
    * non-decreasing in `c` for any sign — the only property the
    * two-level walk needs. */
  def radixLowerMedian(rows: DataFrame,
      bucketWidth: Long = 65536L): DataFrame =
    radixWeightedLowerMedian(rows.select(col("g"), col("c"),
      lit(1L).as("w")), bucketWidth)
      .withColumnRenamed("totw", "n")

  /** Weighted generalization of [[radixLowerMedian]] — the exact
    * WEIGHTED lower median (smallest value whose cumulative weight
    * reaches ⌈(W+1)/2⌉, equivalently 2·cumw ≥ W) with the same
    * two-pass radix plan: bucket WEIGHT sums per group locate the
    * crossing bucket, an exact value walk inside that one bucket
    * finds the crossing value. With w ≡ 1 this IS the plain lower
    * median (which delegates here); with real weights it answers
    * "the value of the median UNIT" — quantity-weighted pricing,
    * importance-weighted corpus statistics — with no per-group sort
    * of raw rows anywhere. Input: columns `g` (any group type), `c`
    * (BIGINT value), `w` (BIGINT weight > 0). Output:
    * (g, totw, med). */
  def radixWeightedLowerMedian(rows: DataFrame,
      bucketWidth: Long = 65536L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wB = Window.partitionBy(col("g")).orderBy(col("b1"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pass 1: bucket weight histogram + crossing bucket per group
    // (the windows below run over the AGGREGATED histogram — bounded)
    val h1 = rows
      .groupBy(col("g"), (col("c") / bucketWidth).cast("long").as("b1"))
      .agg(sum(col("w")).as("bn"))
    val tgt = h1
      .withColumn("cum", sum(col("bn")).over(wB))
      .withColumn("totw",
        sum(col("bn")).over(Window.partitionBy(col("g"))))
      .withColumn("k", expr("(totw + 1) DIV 2"))
      .filter(col("cum") >= col("k") &&
        col("cum") - col("bn") < col("k"))
      .select(col("g").as("tg"), col("b1").as("tb"), col("totw"),
        (col("k") - (col("cum") - col("bn"))).as("k2"))
    // pass 2: exact value walk inside the one crossing bucket per
    // group (tgt is one row per group — broadcast)
    val wC = Window.partitionBy(col("g")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.join(broadcast(tgt), col("g") === col("tg") &&
        (col("c") / bucketWidth).cast("long") === col("tb"))
      .select(col("g"), col("c"), col("w"), col("totw"), col("k2"))
      .groupBy(col("g"), col("c"))
      .agg(sum(col("w")).as("cn"), max(col("totw")).as("totw"),
        max(col("k2")).as("k2"))
      .withColumn("cum2", sum(col("cn")).over(wC))
      .filter(col("cum2") >= col("k2") &&
        col("cum2") - col("cn") < col("k2"))
      .select(col("g"), col("totw"), col("c").as("med"))
  }

  /** Exact per-group MULTI-QUANTILE without a per-group sort — the
    * [[radixLowerMedian]] two-pass radix plan generalized to a SET of
    * percentile targets walked simultaneously: pass 1 builds ONE
    * bucket histogram per group and locates, for every percentile p,
    * the bucket where the cumulative count crosses rank
    * ⌈n·p/100⌉ = (n·p + 99) DIV 100; pass 2 re-scans only the UNION
    * of crossing buckets (≤ |groups|·|pcts| buckets — broadcast
    * target table) and walks exact value counts per (group, pct) to
    * the remaining rank. The per-(group, pct) cumulative windows run
    * over AGGREGATED frames — bounded — so a full five-point latency/
    * price profile of 100 TB costs two narrow scans, same as one
    * median. Input: columns `g` (any group type), `c` (BIGINT value);
    * `pcts` in (0, 100]. Output: (g, pct, n, value) — `value` is the
    * exact order statistic AT the ceil rank (p = 50 ⇒ the lower
    * median, matching [[radixLowerMedian]]). */
  def radixRanks(rows: DataFrame, pcts: Seq[Int],
      bucketWidth: Long = 65536L): DataFrame =
    radixWeightedRanks(rows.select(col("g"), col("c"),
      lit(1L).as("w")), pcts, bucketWidth)
      .withColumnRenamed("totw", "n")

  /** Weighted generalization of [[radixRanks]] — the value whose
    * CUMULATIVE WEIGHT first reaches ⌈W·p/100⌉ for every percentile
    * p, in the same one-histogram-pass + union-of-crossing-buckets
    * plan (with w ≡ 1 this IS [[radixRanks]], which delegates; with
    * real weights it answers "the value of the p-th percentile
    * UNIT" — quantity-weighted price tails, token-weighted length
    * tails). p = 50 reproduces [[radixWeightedLowerMedian]] exactly
    * (⌈W/2⌉ = (W+1) DIV 2). Input: columns `g`, `c` (BIGINT value),
    * `w` (BIGINT weight > 0). Output: (g, pct, totw, value). */
  def radixWeightedRanks(rows: DataFrame, pcts: Seq[Int],
      bucketWidth: Long = 65536L): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100),
      s"pcts must be in (0, 100], got $pcts")
    import org.apache.spark.sql.expressions.Window
    val wB = Window.partitionBy(col("g")).orderBy(col("b1"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h1 = rows
      .groupBy(col("g"), (col("c") / bucketWidth).cast("long").as("b1"))
      .agg(sum(col("w")).as("bn"))
    val pctArr = array(pcts.map(p => lit(p.toLong)): _*)
    val tgt = h1
      .withColumn("cum", sum(col("bn")).over(wB))
      .withColumn("totw",
        sum(col("bn")).over(Window.partitionBy(col("g"))))
      .select(col("g"), col("b1"), col("bn"), col("cum"), col("totw"),
        explode(pctArr).as("pct"))
      .withColumn("k", expr("(totw * pct + 99) DIV 100"))
      .filter(col("cum") >= col("k") &&
        col("cum") - col("bn") < col("k"))
      .select(col("g").as("tg"), col("b1").as("tb"), col("pct"),
        col("totw"), (col("k") - (col("cum") - col("bn"))).as("k2"))
    val wC = Window.partitionBy(col("g"), col("pct")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.join(broadcast(tgt), col("g") === col("tg") &&
        (col("c") / bucketWidth).cast("long") === col("tb"))
      .select(col("g"), col("pct"), col("c"), col("w"), col("totw"),
        col("k2"))
      .groupBy(col("g"), col("pct"), col("c"))
      .agg(sum(col("w")).as("cn"), max(col("totw")).as("totw"),
        max(col("k2")).as("k2"))
      .withColumn("cum2", sum(col("cn")).over(wC))
      .filter(col("cum2") >= col("k2") &&
        col("cum2") - col("cn") < col("k2"))
      .select(col("g"), col("pct"), col("totw"), col("c").as("value"))
  }

  /** Per-ROW distributed rank within string groups — `rank()`
    * (`minRank = true`: ties share the min-rank) or `row_number()`
    * (`minRank = false`: ties break by the payload column `p`,
    * which must make (g, v, p) unique) — with NO per-group sort and
    * no low-cardinality-keyed window: a `Window.partitionBy(g)` rank
    * funnels the whole input into |g| reducers, while this is the
    * textbook DISTRIBUTED rank (the TeraSort shape): ONE
    * range-partitioned exchange — the sort spreads over ALL
    * partitions regardless of |g| — a per-partition streaming scan
    * with O(1) state (per-row predecessor count, plus each
    * partition's per-group run total flushed at the end), a
    * ≤(partitions·|g|)² bounded broadcast theta join turning run
    * totals into cross-partition offsets, and one broadcast
    * equi-join adding them back. In `minRank` mode the range keys
    * are (g, v) — RangePartitioner sends equal keys to ONE
    * partition, so a tie run never splits and its shared base is
    * exact; in row_number mode the keys are (g, v, p).
    *
    * Tie-run skew bound (minRank mode): because a (g, v) tie run
    * never splits, the partition owning the run holds AT LEAST the
    * run's fraction of the input — a column where one value carries
    * 90% of rows lands 90% of the data on one task (correctness
    * holds; the run's scan is O(run) time and O(1) state, so the
    * bound is wall-clock skew, not memory). Current consumers feed
    * near-uniform keys (prices/quantities); a consumer with a
    * heavy-tie column should either use row_number mode (unique
    * (g, v, p) keys split the run) or pre-aggregate to (g, v, count)
    * histograms and rank those, as the radix cores do. Pinned by
    * OperatorsSpec's planted-90%-tie spec.
    *
    * Input: columns `g` (STRING group), `v` (BIGINT value), `p`
    * (any orderable type: the tiebreaker in row_number mode — ties
    * break in p's NATIVE order, since the exchange and sort run
    * before the transport cast; an opaque carried column — e.g. the
    * OTHER dimension's value a rank correlation pairs with — in
    * minRank mode; carrying it through the sort is what makes the
    * rank per-ROW and kills the corpus-scale join-back a
    * distinct-value rank table would need). Output: (g, v, p, rk),
    * one row per input row, `p` transported as STRING. The marks
    * frame is persisted for its two consumers and released by
    * [[graft.analytics.QueryScopedCache]] after the caller's first
    * action. */
  def groupRowRanks(rows: DataFrame, minRank: Boolean): DataFrame = {
    val sp = rows.sparkSession
    import sp.implicits._
    val nPart = sp.sessionState.conf.numShufflePartitions
    val keyCols =
      if (minRank) Seq(col("g"), col("v"))
      else Seq(col("g"), col("v"), col("p"))
    val sorted = rows
      .repartitionByRange(nPart, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .select(spark_partition_id().as("pid"),
        col("g").cast("string").as("g"), col("v"),
        col("p").cast("string").as("p"))
      .as[(Int, String, Long, String)]
    // kind 0: one row per input row, `rk0` = its local predecessor
    // count (minRank: of the value run's first row); kind 1: the
    // g-run's total row count (one per (partition, g), flushed after
    // the main scan — Iterator.++'s right side evaluates only on
    // exhaustion)
    val marks = sorted.mapPartitions { it =>
      var pid = 0
      var curG: String = null
      var curV = 0L
      var cnt = 0L
      var vbase = 0L
      var open = false
      val runTotals =
        scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
      val main = it.map { case (pt, g, v, pay) =>
        pid = pt
        if (!open || g != curG) {
          if (open) runTotals += ((pid, curG, cnt))
          curG = g; curV = v; cnt = 0L; vbase = 0L; open = true
        } else if (v != curV) { curV = v; vbase = cnt }
        val rk0 = if (minRank) vbase else cnt
        cnt += 1L
        (pt, g, v, pay, rk0, 0)
      }
      main ++ {
        if (open) {
          runTotals += ((pid, curG, cnt))
          runTotals.iterator.map { case (pt, g, c) =>
            (pt, g, 0L, "", c, 1)
          }
        } else Iterator.empty
      }
    }.toDF("pid", "g", "v", "p", "rk0", "kind")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = marks.filter(col("kind") === 1)
      .select(col("pid"), col("g"), col("rk0").as("c"))
    val offsets = totals.as("ta")
      .join(broadcast(totals.as("tb")),
        col("ta.g") === col("tb.g") && col("tb.pid") < col("ta.pid"),
        "left")
      .groupBy(col("ta.pid"), col("ta.g"))
      .agg(coalesce(sum(col("tb.c")), lit(0L)).as("off"))
      .select(col("ta.pid").as("pid"), col("ta.g").as("g"), col("off"))
    val out = marks.filter(col("kind") === 0)
      .join(broadcast(offsets), Seq("pid", "g"))
      .select(col("g"), col("v"), col("p"),
        (col("off") + col("rk0") + lit(1L)).as("rk"))
    graft.analytics.QueryScopedCache.releaseAfter(out, Seq(marks))
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
