package graft.analytics

import graft.operators.AsOfJoin
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational capability surface (SURVEY.md §2.6): one named query
  * per operator family, each with a DuckDB-equivalent oracle.
  *
  * Oracle-parity rules used throughout (driver hash-compares values and
  * schemas against DuckDB running `oracle` on the same parquet):
  *  - every query ends in a total ORDER BY over a unique key;
  *  - double SUMs accumulate in DECIMAL then cast back to double —
  *    bit-identical regardless of either engine's summation order;
  *  - Spark ints widen to long where DuckDB naturally yields BIGINT
  *    (year/length/row_number/...), so schemas line up;
  *  - column aliases are identical character-for-character on both
  *    sides (the driver sorts columns by name before hashing).
  */
object RelationalQueries {

  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private[analytics] def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact double sum: accumulate as DECIMAL(25,scale), emit double. */
  private[analytics] def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(25, scale))).cast("double")

  // ---------------------------------------------------------------
  // Aggregation family
  // ---------------------------------------------------------------

  /** Hash aggregate with partial/final split (Catalyst), filters pushed
    * to the parquet scan — TPC-H Q1 shape. */
  val qAggPricing = Q(
    "q_agg_pricing",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** COUNT(DISTINCT) + plain counts in one aggregate. */
  val qDistinctAgg = Q(
    "q_distinct_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT l_partkey) AS n_part,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** ROLLUP hierarchy totals; group-key NULLs normalized to 'ALL' so
    * both engines order identically. */
  val qRollup = Q(
    "q_rollup_lineitem",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy(col("rf"), col("ls"))
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY rf, ls"""))

  /** GROUPING SETS — disjoint grouping shapes in one pass. */
  val qGroupingSets = Q(
    "q_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS st,
               COALESCE(o_orderpriority, 'ALL') AS pri,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY st, pri""")
    },
    Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS st,
             COALESCE(o_orderpriority, 'ALL') AS pri,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY st, pri"""))

  /** Statistical aggregates (stddev/var/corr/covar). Both engines use
    * numerically-stable streaming algorithms whose partition-merge
    * order can drift in the last few ulps — rounding absorbs it. */
  val qAggStats = Q(
    "q_agg_stats",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6)
            .as("qty_disc_cov"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
             ROUND(var_samp(l_quantity), 4) AS var_qty,
             ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
             ROUND(covar_samp(l_quantity, l_discount), 6) AS qty_disc_cov
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Subquery forms: scalar subquery in SELECT + IN subquery in WHERE
    * (same ANSI text runs on both engines). */
  val qSubqueries = Q(
    "q_subqueries",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      t(s, dir, "customer").createOrReplaceTempView("customer_sq")
      s.sql("""
        SELECT o_orderkey,
               o_totalprice / (SELECT MAX(o_totalprice) FROM orders_sq)
                 AS price_ratio
        FROM orders_sq
        WHERE o_custkey IN (SELECT c_custkey FROM customer_sq
                            WHERE c_acctbal > 9000)
        ORDER BY o_orderkey""")
    },
    Some("""
      SELECT o_orderkey,
             o_totalprice / (SELECT MAX(o_totalprice) FROM orders)
               AS price_ratio
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_acctbal > 9000)
      ORDER BY o_orderkey"""))

  /** Correlated scalar subquery — each order against ITS customer's
    * maximum — exercising Catalyst's decorrelation (the subquery
    * rewrites to an aggregate + join; a naive engine would re-run it
    * per row). Same ANSI text runs on both engines; the ratio divides
    * identical doubles once, rounded to 6. */
  val qSubqueryCorrelated = Q(
    "q_subquery_correlated",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sqc")
      s.sql("""
        SELECT o_orderkey, o_custkey,
               ROUND(o_totalprice /
                     (SELECT MAX(o2.o_totalprice) FROM orders_sqc o2
                      WHERE o2.o_custkey = o.o_custkey), 6) AS cust_ratio
        FROM orders_sqc o
        ORDER BY o_orderkey""")
    },
    Some("""
      SELECT o_orderkey, o_custkey,
             ROUND(o_totalprice /
                   (SELECT MAX(o2.o_totalprice) FROM orders o2
                    WHERE o2.o_custkey = o.o_custkey), 6) AS cust_ratio
      FROM orders o
      ORDER BY o_orderkey"""))

  /** Raw per-group HLL estimates — the PRODUCTION shape of
    * [[qHllDistinct]] (one pass, no exact aggregation). Kept as its
    * own method because the registered query below composes it with
    * an exact pass into an oracle-gateable bound check; a real
    * pipeline selects just this. */
  def hllEstimates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  /** HLL sketch (approx_count_distinct), shaped for the differential
    * gate: an estimate can never hash-match another engine, but the
    * CONTRACT can — Spark computes the estimate AND the exact distinct
    * in one aggregation and emits whether the estimate honors the
    * error bound next to the exact count; DuckDB emits the exact
    * count and a literal true. A wrong estimate, a wrong exact
    * count, or a broken bound all fail the hash-match. The gate
    * tolerance is 3× the default rsd (0.05): rsd is a standard
    * DEVIATION, not a guarantee, so a hard 1×-rsd gate would be
    * stable only for the pinned dataset — 3σ makes the gate hold for
    * any healthy sketch at any scale factor (observed error on the
    * test data is well inside 1×; AnalyticsSpec asserts that tighter
    * empirical bound against [[hllEstimates]], the one-pass
    * production shape). */
  val qHllDistinct = Q(
    "q_hll_distinct",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          count_distinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            greatest(lit(1L), (lit(0.15) * col("exact_parts")).cast("long")))
            .as("within_bound"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
             TRUE AS within_bound
      FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""))

  /** Raw per-group GK quantile estimates — the PRODUCTION shape of
    * [[qQuantileSketch]] (one pass, bounded memory, no exact rank
    * verification). */
  def quantileEstimates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D), 1000)")
          .as("approx_p"))
      .select(col("l_returnflag"),
        element_at(col("approx_p"), 1).as("p50"),
        element_at(col("approx_p"), 2).as("p95"),
        element_at(col("approx_p"), 3).as("p99"))
      .orderBy(col("l_returnflag"))

  /** GK quantile sketch (approx_percentile) — the third mergeable
    * sketch in the family next to HLL distinct and SpaceSaving heavy
    * hitters, and the one that answers "p50/p95/p99 latency" style
    * questions in one pass with bounded memory (the exact
    * [[qPercentile]] path sorts each group). Partial sketches merge
    * map-side like any aggregate; accuracy = 1/relative-rank-error.
    *
    * Shaped for the differential gate like [[qHllDistinct]]: the
    * sketch VALUES are partition-order-dependent and engine-specific,
    * but the GK contract — the reported value's RANK in its group is
    * within n/accuracy of the target rank — is checkable exactly.
    * Unlike HLL's probabilistic rsd, this bound is the algorithm's
    * DETERMINISTIC worst-case guarantee (+1 for duplicate-value rank
    * ties), so the gate is scale-factor-safe without widening.
    * Spark ranks each estimate with a second pass over the group
    * (count of values ≤ estimate) and emits the per-percentile
    * verdicts next to the group size; DuckDB emits the size and
    * literal trues. [[quantileEstimates]] is the one-pass production
    * shape; AnalyticsSpec asserts the same rank contract against it. */
  val qQuantileSketch = Q(
    "q_quantile_sketch",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val ap = li.groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D), 1000)")
            .as("ap"))
      def rankOf(i: Int) = sum(
        when(col("l_extendedprice") <= element_at(col("ap"), i), 1L)
          .otherwise(0L)).as(s"r$i")
      // tolerance mirrors the spec's proven contract check:
      // |rank - ceil(p*n)| <= max(1, n/1000) + 1
      def ok(p: Double, rc: String) =
        abs(col(rc) - ceil(lit(p) * col("n_rows")).cast("long")) <=
          greatest(lit(1L), floor(col("n_rows") / lit(1000)).cast("long")) +
            lit(1L)
      li.join(broadcast(ap), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), rankOf(1), rankOf(2), rankOf(3))
        .select(col("l_returnflag"), col("n_rows"),
          ok(0.5, "r1").as("p50_ok"), ok(0.95, "r2").as("p95_ok"),
          ok(0.99, "r3").as("p99_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n_rows, TRUE AS p50_ok,
             TRUE AS p95_ok, TRUE AS p99_ok
      FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------
  // Join family
  // ---------------------------------------------------------------

  /** Star join: fact orders → customer → broadcast dims nation/region.
    * nation/region are tiny — explicitly broadcast so 100 TB of fact
    * rows never shuffle for the dimensions. */
  val qJoinRegionRevenue = Q(
    "q_join_region_revenue",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      orders
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("r_name"))
    },
    Some("""
      SELECT r_name,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** Left-semi (EXISTS): customers holding at least one open order. */
  val qJoinSemi = Q(
    "q_join_semi",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
      cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      ORDER BY c_custkey"""))

  /** Left-anti (NOT EXISTS): customers with no open order. */
  val qJoinAnti = Q(
    "q_join_anti",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
      cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      ORDER BY c_custkey"""))

  /** Left-outer join with a join-side predicate: every nation keeps a
    * row; COUNT(col) skips the unmatched nulls → zero counts. */
  val qJoinLeftOuter = Q(
    "q_join_left_outer",
    (s, dir) => {
      val nation = t(s, dir, "nation")
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      nation.join(rich, nation("n_nationkey") === rich("c_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_rich"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name, COUNT(c_custkey) AS n_rich
      FROM nation LEFT JOIN customer
        ON c_nationkey = n_nationkey AND c_acctbal > 9000
      GROUP BY n_name ORDER BY n_name"""))

  /** Full-outer join of two aggregates with COALESCE reconciliation. */
  val qJoinFullOuter = Q(
    "q_join_full_outer",
    (s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val p = t(s, dir, "supplier")
        .filter(col("s_acctbal") > 5000)
        .groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, col("ck") === col("sk"), "full_outer")
        .select(
          coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },
    Some("""
      WITH c AS (SELECT c_nationkey AS ck, COUNT(*) AS n_cust
                 FROM customer GROUP BY 1),
           p AS (SELECT s_nationkey AS sk, COUNT(*) AS n_supp
                 FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
      SELECT COALESCE(ck, sk) AS nationkey,
             COALESCE(n_cust, 0) AS n_cust,
             COALESCE(n_supp, 0) AS n_supp
      FROM c FULL JOIN p ON ck = sk
      ORDER BY nationkey"""))

  /** Ordered string aggregation (sorted collect → join, matching
    * string_agg ... ORDER BY). */
  val qAggStringAgg = Q(
    "q_agg_stringagg",
    (s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      nation.join(broadcast(region),
          nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy(col("r_name"))
    },
    Some("""
      SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** Theta join (equi + inequality + |Δ| predicate): supplier pairs in
    * one nation with near-equal balances. */
  val qThetaJoin = Q(
    "q_theta_join",
    (s, dir) => {
      val s1 = t(s, dir, "supplier").alias("s1")
      val s2 = t(s, dir, "supplier").alias("s2")
      s1.join(s2,
          col("s1.s_nationkey") === col("s2.s_nationkey") &&
            col("s1.s_suppkey") < col("s2.s_suppkey") &&
            abs(col("s1.s_acctbal") - col("s2.s_acctbal")) < 500.0)
        .select(
          col("s1.s_suppkey").as("supp_a"),
          col("s2.s_suppkey").as("supp_b"),
          col("s1.s_nationkey").as("nationkey"))
        .orderBy(col("supp_a"), col("supp_b"))
    },
    Some("""
      SELECT s1.s_suppkey AS supp_a, s2.s_suppkey AS supp_b,
             s1.s_nationkey AS nationkey
      FROM supplier s1 JOIN supplier s2
        ON s1.s_nationkey = s2.s_nationkey
       AND s1.s_suppkey < s2.s_suppkey
       AND ABS(s1.s_acctbal - s2.s_acctbal) < 500.0
      ORDER BY supp_a, supp_b"""))

  /** Range join (equi key + time-band predicate): lineitems shipped
    * within 90 days of their order date. */
  val qRangeJoin = Q(
    "q_range_join",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li,
          li("l_orderkey") === o("o_orderkey") &&
            li("l_shipdate") >= o("o_orderdate") &&
            li("l_shipdate") < o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(o("o_orderkey").as("o_orderkey"))
        .agg(
          count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("ship_value"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS ship_value
      FROM orders JOIN lineitem
        ON l_orderkey = o_orderkey
       AND l_shipdate >= o_orderdate
       AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      GROUP BY o_orderkey ORDER BY o_orderkey"""))

  /** LATERAL correlated table subquery — top-2 orders per customer
    * via a per-row ORDER BY … LIMIT subquery, the SQL-standard
    * "for each row, run this query" shape (and the idiom engines
    * without window functions use for grouped top-k). Catalyst
    * decorrelates the correlated LIMIT into a ranked window under a
    * DomainJoin rather than re-running the subquery per customer —
    * the same single-shuffle plan [[qTopkPerCustomer]] writes by
    * hand, which is exactly the decorrelation claim this query
    * gates. Identical ANSI text runs on both engines; the unique
    * o_orderkey tie-break keeps the per-customer cut deterministic. */
  val qJoinLateral = Q(
    "q_join_lateral",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_lat")
      t(s, dir, "orders").createOrReplaceTempView("orders_lat")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lat c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    },
    Some("""
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey"""))

  /** As-of join ([[AsOfJoin]]): each click matched to the user's most
    * recent prior purchase — one shuffle, no range probe. */
  val qAsofJoin = Q(
    "q_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("value").as("last_purchase_value"))
      AsOfJoin.asof(clicks, purchases, "user_id",
          leftTs = "click_ts", rightTs = "ts",
          payload = Seq("last_purchase_value"))
        .select(col("click_id"), col("user_id"), col("click_ts"),
          col("last_purchase_value"))
        .orderBy(col("click_id"))
    },
    Some("""
      SELECT c.event_id AS click_id, c.user_id AS user_id,
             c.ts AS click_ts, p.value AS last_purchase_value
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'click') c
      ASOF JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                 FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.ts <= c.ts
      ORDER BY click_id"""))

  /** [[qAsofJoin]] with a STALENESS TOLERANCE (round-9 operator
    * extension): clicks whose most-recent purchase is older than two
    * days drop — the "no stale quotes" contract every financial as-of
    * carries. Same single-exchange plan (the tolerance is a pure
    * post-filter on the carried right timestamp, see
    * [[graft.operators.AsOfJoin]]); the oracle is DuckDB's native
    * ASOF JOIN with the age predicate applied after the match, which
    * is equivalent because the most-recent match within tolerance IS
    * the most-recent match overall whenever one qualifies. */
  val qAsofTolerance = Q(
    "q_asof_tolerance",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("value").as("last_purchase_value"))
      graft.operators.AsOfJoin.asof(clicks, purchases, "user_id",
          leftTs = "click_ts", rightTs = "ts",
          payload = Seq("last_purchase_value"),
          toleranceMicros = Some(2L * 86400L * 1000000L))
        .select(col("click_id"), col("user_id"), col("click_ts"),
          col("last_purchase_value"))
        .orderBy(col("click_id"))
    },
    Some("""
      SELECT c.event_id AS click_id, c.user_id AS user_id,
             c.ts AS click_ts, p.value AS last_purchase_value
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'click') c
      ASOF JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                 FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.ts <= c.ts
      WHERE epoch_us(c.ts) - epoch_us(p.ts) <= 172800000000
      ORDER BY click_id"""))

  // ---------------------------------------------------------------
  // Window / sort / set-op families
  // ---------------------------------------------------------------

  /** Ranking window: top-3 orders per customer (unique tie-break). */
  val qTopkPerCustomer = Q(
    "q_topk_per_customer",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** RANGE frame: how many orders fall within 1000.0 below each
    * order's price (value-based frame, not row-based).
    *
    * A literal `Window.orderBy(price).rangeBetween(-1000, 0)` has no
    * partition key — the whole table lands in ONE window partition and
    * one task sorts everything: correct at sf0.1, a scale-killer at
    * 100 TB. Instead this plans the banded two-pass: band rows by
    * `floor(price/1000)` (band width = frame width), then one
    * band-partitioned window over the union of
    *   - actual rows (weight 1), and
    *   - probe rows placed in the PREVIOUS band at `price - 1000`
    *     (weight 0)
    * computes both halves of the count:
    *   A (on actuals)  = Σweight over RANGE unboundedPreceding→current
    *                   = rows in my band with price ≤ p, and
    *   B (on probes)   = Σweight over ROWS current→unboundedFollowing
    *                   = rows in the previous band with price ≥ p−1000
    *     (probes sort BEFORE equal-priced actuals via the tag column,
    *     so the ≥ is inclusive, matching RANGE 1000.0 PRECEDING),
    * and a groupBy on the order key sums A + B. Every shuffle is keyed
    * (band, then order key); no unpartitioned window survives — the
    * PlanAuditSpec partition-less-window guard holds over ALL queries.
    * Skewed bands (many rows per price band) spread like any other
    * hot aggregation key; band width tracks the frame width by
    * construction.
    *
    * Exactness: band(s) uses the same fl(p/1000) for every row, so the
    * decomposition is exact unless a price sits within half an ulp of
    * the quotient (~1e-11 for 6-digit prices) BELOW a multiple of
    * 1000, where fl could round the quotient up across the band
    * boundary. Two-decimal financial data is 9 orders of magnitude
    * away from that; a corpus with adversarial sub-ulp prices would
    * pick an irrational band width. AnalyticsSpec property-tests the
    * decomposition against Spark's native global range frame on
    * boundary-adversarial fixtures (exact band multiples, ties, empty
    * previous bands). */
  private[analytics] def bandedRangeCount(rows: DataFrame, key: String,
      value: String, width: Double): DataFrame = {
    val base = rows.select(col(key), col(value),
      floor(col(value) / width).cast("long").as("band"))
    val actuals = base.select(col(key), col(value),
      col("band"), col(value).as("price"),
      lit(1).as("tag"), lit(1L).as("weight"))
    val probes = base.select(col(key), col(value),
      (col("band") - 1).as("band"),
      (col(value) - width).as("price"),
      lit(0).as("tag"), lit(0L).as("weight"))
    val byBand = Window.partitionBy(col("band"))
      .orderBy(col("price"), col("tag"))
    val upToPeers = byBand
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val fromHere = byBand
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    actuals.unionAll(probes)
      .select(col(key), col(value),
        when(col("tag") === 1, sum(col("weight")).over(upToPeers))
          .otherwise(sum(col("weight")).over(fromHere)).as("contrib"))
      .groupBy(col(key))
      .agg(max(col(value)).as(value),
        sum(col("contrib")).as("n_in_band"))
      .select(col(key), col(value), col("n_in_band"))
  }

  val qWindowRangeFrame = Q(
    "q_window_range_frame",
    (s, dir) =>
      bandedRangeCount(t(s, dir, "orders"), "o_orderkey", "o_totalprice",
        1000d)
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey, o_totalprice,
             COUNT(*) OVER (ORDER BY o_totalprice
                            RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
               AS n_in_band
      FROM orders ORDER BY o_orderkey"""))

  /** Global sort + limit (top-k by price, unique tie-break). */
  val qSortLimit = Q(
    "q_sort_limit",
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** Set operations: nation coverage by customers vs suppliers. */
  val qSetopsNations = Q(
    "q_setops_nations",
    (s, dir) => {
      val nation = t(s, dir, "nation")
      val cn = nation.join(t(s, dir, "customer"),
          nation("n_nationkey") === col("c_nationkey"), "left_semi")
        .select(col("n_name"))
      val sn = nation.join(t(s, dir, "supplier"),
          nation("n_nationkey") === col("s_nationkey"), "left_semi")
        .select(col("n_name"))
      val both = cn.intersect(sn).withColumn("tag", lit("both"))
      val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
      val suppOnly = sn.except(cn).withColumn("tag", lit("supp_only"))
      both.unionByName(custOnly).unionByName(suppOnly)
        .select(col("tag"), col("n_name"))
        .orderBy(col("tag"), col("n_name"))
    },
    Some("""
      WITH cn AS (SELECT DISTINCT n_name FROM nation
                  WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)),
           sn AS (SELECT DISTINCT n_name FROM nation
                  WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey))
      SELECT 'both' AS tag, n_name FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
      UNION ALL
      SELECT 'cust_only' AS tag, n_name FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn)
      UNION ALL
      SELECT 'supp_only' AS tag, n_name FROM (SELECT n_name FROM sn EXCEPT SELECT n_name FROM cn)
      ORDER BY tag, n_name"""))

  /** Bag-semantics set ops — INTERSECT ALL / EXCEPT ALL, the
    * multiplicity-bearing variants [[qSetOps]]'s DISTINCT forms hide
    * and an engine-switch hazard class of their own (bag semantics:
    * intersect keeps min(m₁, m₂) copies, except keeps max(0, m₁−m₂)
    * — engines that silently de-duplicate corrupt both). The
    * multisets are 1995's vs 1996's lineitem return flags; output
    * aggregates each result bag to (flag, multiplicity), which makes
    * the min/difference arithmetic directly visible to the gate. */
  val qSetOpsBag = Q(
    "q_setops_bag",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      def flags(y: Int) = li.filter(year(col("l_shipdate")) === y)
        .select(col("l_returnflag"))
      val a = flags(1995)
      val b = flags(1996)
      def agg(df: DataFrame, tag: String) = df
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .withColumn("tag", lit(tag))
      agg(a.intersectAll(b), "intersect_all")
        .unionByName(agg(a.exceptAll(b), "except_all_95"))
        .unionByName(agg(b.exceptAll(a), "except_all_96"))
        .select(col("tag"), col("l_returnflag"), col("n"))
        .orderBy(col("tag"), col("l_returnflag"))
    },
    Some("""
      WITH a AS (SELECT l_returnflag FROM lineitem
                 WHERE year(l_shipdate) = 1995),
           b AS (SELECT l_returnflag FROM lineitem
                 WHERE year(l_shipdate) = 1996)
      SELECT 'intersect_all' AS tag, l_returnflag, COUNT(*) AS n
      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2
      UNION ALL
      SELECT 'except_all_95' AS tag, l_returnflag, COUNT(*) AS n
      FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2
      UNION ALL
      SELECT 'except_all_96' AS tag, l_returnflag, COUNT(*) AS n
      FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a) GROUP BY 2
      ORDER BY tag, l_returnflag"""))

  /** JSON extraction from a string column (the reference's
    * parse-JSON-out-of-a-string shape, over events.props). */
  val qJsonEvents = Q(
    "q_json_events",
    (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .filter(col("k_val") % 2 === 0)
        .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
      ORDER BY event_id"""))

  /** The DNS pipeline shape, oracle-checkable: transport base64
    * round-trip → JSON parse → strftime formats → deterministic md5
    * client tag → one log line (mirrors ops 4,5,8,9,11). */
  val qDnsBind9Events = Q(
    "q_dns_bind9_events",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val payload = unbase64(base64(encode(col("props"), "UTF-8")))
        .cast("string")
      val k = get_json_object(payload, "$.k")
      val tag = concat(lit("@0x"),
        substring(md5(concat_ws("\u0001", col("event_id").cast("string"), k)),
          1, 12))
      ev.select(
          col("event_id"),
          concat(
            date_format(col("ts"), "MMM dd HH:mm:ss"),
            lit(" host-"), col("user_id").cast("string"),
            lit(" app: "),
            date_format(col("ts"), "dd-MMM-yyyy HH:mm:ss"),
            lit(".000 client "), tag, lit(" k="), k).as("line"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             strftime(ts, '%b %d %H:%M:%S') || ' host-' ||
             CAST(user_id AS VARCHAR) || ' app: ' ||
             strftime(ts, '%d-%b-%Y %H:%M:%S') || '.000 client @0x' ||
             SUBSTR(MD5(CAST(event_id AS VARCHAR) || CHR(1) ||
               json_extract_string(decode(from_base64(to_base64(encode(props)))), '$.k')),
               1, 12) ||
             ' k=' ||
             json_extract_string(decode(from_base64(to_base64(encode(props)))), '$.k')
               AS line
      FROM events ORDER BY event_id"""))

  /** CUBE — all grouping combinations in one pass. */
  val qCube = Q(
    "q_cube_lineitem",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"))
        .orderBy(col("rf"), col("ls"))
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             COUNT(*) AS n
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY rf, ls"""))

  /** Interpolated percentiles per group (both engines use the
    * (n-1)p linear-interpolation definition; rounded to 6 to absorb
    * interpolation-order float differences). */
  val qPercentile = Q(
    "q_percentile",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25D)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5D)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9D)"), 6).as("p90"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
             ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
             ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Skew-resistant salted aggregation ([[graft.operators.SaltedAgg]]):
    * two-stage (key, salt) → key plan whose result must equal the
    * direct GROUP BY the oracle runs. */
  val qSaltedAgg = Q(
    "q_salted_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.SaltedAgg
        .sumCountByKey(li, col("l_returnflag"),
          col("l_quantity").cast(DecimalType(25, 4)),
          saltFrom = Seq(col("l_orderkey"), col("l_linenumber")))
        .select(col("__key").as("l_returnflag"),
          col("sum_value").cast("double").as("sum_qty"), col("n_rows"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Skew-resistant salted JOIN ([[graft.operators.SaltedAgg
    * .innerJoinSalted]]): lineitem joins orders on (orderkey, salt)
    * with orders replicated across the salt lanes, so a hot orderkey
    * spreads over 16 reducers instead of one straggler. The oracle is
    * the PLAIN join — the hash-match proves salting lossless (every
    * row pair met exactly once), the same proof discipline as
    * [[qSaltedAgg]]. */
  val qJoinSalted = Q(
    "q_join_salted",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.SaltedAgg
        .innerJoinSalted(li, ord, "l_orderkey",
          saltFrom = Seq(col("l_orderkey"), col("l_linenumber")),
          salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE)
               AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Pivot: one column per event_type, counts per user (Spark
    * `.pivot()`; the oracle states the same contract as conditional
    * aggregation — the portable definition of a pivot). */
  val qPivot = Q(
    "q_pivot_events",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id")),
    Some("""
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             COUNT(*) FILTER (WHERE event_type = 'error') AS error,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
             COUNT(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Unpivot/melt: wide lineitem measures to long (Spark `unpivot`;
    * oracle as the equivalent stacked UNION ALL). */
  val qUnpivot = Q(
    "q_unpivot_lineitem",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount")),
          "measure", "value")
        // `value` completes the total order: (l_orderkey,
        // l_linenumber=1) is NOT unique in the fixture — duplicate
        // keys carry DIFFERENT measures, and a tie in the ORDER BY
        // leaves row order engine-dependent (latent at sf0.1, caught
        // by the round-11 sf1 gate)
        .orderBy(col("l_orderkey"), col("measure"), col("value")),
    Some("""
      SELECT l_orderkey, measure, value FROM (
        SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS value
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, 'l_extendedprice', l_extendedprice
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, 'l_discount', l_discount
        FROM lineitem WHERE l_linenumber = 1) u
      ORDER BY l_orderkey, measure, value"""))

  // ---------------------------------------------------------------
  // Warehouse modeling family: SCD2 intervals, column profiling,
  // time-series smoothing
  // ---------------------------------------------------------------

  /** Slowly-changing-dimension type-2 construction: collapse each
    * customer's order-status history into validity intervals
    * (gaps-and-islands), versioned per customer with `valid_to` /
    * `is_current` — the standard warehouse dimension-history build.
    *
    * Scale shape: one exchange on o_custkey carries BOTH windows (the
    * lag-based change flag and the running island sum share the same
    * partitioning and ordering, so Catalyst fuses them into one Window
    * operator after one sort), then the island group-by reuses the
    * same partitioning — no second shuffle. Per-customer state is one
    * row of lag, never the order list. The `o_custkey < 300` anchor
    * bound keeps the verified output stable across SFs; the plan is
    * identical without it. */
  /** Rollup REUSE — monthly aggregates derived from the daily
    * aggregate table, never the base facts, gated against the direct
    * monthly recompute: the distributive-aggregate property
    * (SUM-of-SUMs, SUM-of-COUNTs) every tiered warehouse rollup
    * chain relies on, proven exact by the hash-match. The DECIMAL
    * accumulation discipline is what MAKES re-aggregation safe —
    * double partial sums would make the two-level result depend on
    * grouping order.
    *
    * Scale shape: the daily tier is the expensive aggregate (one
    * exchange over facts); the monthly tier re-aggregates
    * |days|·|groups| rows — the reuse a 100 TB pipeline banks daily. */
  val qAggReaggregate = Q(
    "q_agg_reaggregate",
    (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          to_date(col("l_shipdate")).as("d"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(25, 4))).as("sq"))
      daily
        .groupBy(col("l_returnflag"), date_trunc("month", col("d"))
          .cast("date").as("month"))
        .agg(sum(col("n")).as("n"),
          sum(col("sq")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("month"))
    },
    // the oracle recomputes monthly DIRECTLY from facts: the gate
    // proves daily→monthly re-aggregation ≡ one-level aggregation
    Some("""
      SELECT l_returnflag,
             CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE)
               AS month,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE)
               AS sum_qty
      FROM lineitem
      GROUP BY l_returnflag, month
      ORDER BY l_returnflag, month"""))

  /** Incremental view maintenance for AGGREGATES — the materialized-
    * view counterpart of [[qScd2Incremental]]'s dimension IVM: a
    * per-(returnflag, linestatus) sum/count view maintained under an
    * INSERT delta and a DELETE delta without touching base history.
    * Sum and count are self-maintainable (⊕ insert partials, ⊖ delete
    * partials — the signed-union merge below); avg derives from the
    * merged sums. Min/max are deliberately absent: they are NOT
    * self-maintainable under deletes (a deleted extremum forces a
    * base rescan) — the boundary this query documents by construction.
    *
    * The gate is the strong IVM contract: the oracle RECOMPUTES the
    * view from the post-change base directly, so the hash-match
    * proves merged-partials ≡ from-scratch on every cell. Sums
    * accumulate in DECIMAL(25,4) (order-insensitive), avg is one
    * double division on both engines. Scale shape: each partial is a
    * map-side-combined hash aggregate over ITS slice only; the merge
    * re-aggregates a few-row frame — daily cost |delta|, never
    * |history|. */
  val qAggIvm = Q(
    "q_agg_ivm",
    (s, dir) => {
      val cutoff = lit("1997-01-01").cast("timestamp")
      val li = t(s, dir, "lineitem")
      def partial(df: DataFrame, sign: Int): DataFrame =
        df.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg((count(lit(1)) * sign).as("pn"),
            (sum(col("l_quantity").cast(DecimalType(25, 4))) * sign)
              .as("psq"))
      val base = li.filter(col("l_shipdate") < cutoff)
      val inserts = li.filter(col("l_shipdate") >= cutoff)
      val deletes = base.filter(col("l_orderkey") % 97 === 0)
      partial(base, 1)
        .unionByName(partial(inserts, 1))
        .unionByName(partial(deletes, -1))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("pn")).as("n"),
          sum(col("psq")).as("sq"))
        .filter(col("n") > 0)
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("sq").cast("double").as("sum_qty"),
          (col("sq").cast("double") / col("n").cast("double"))
            .as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE)
               AS sum_qty,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) /
               CAST(COUNT(*) AS DOUBLE) AS avg_qty
      FROM lineitem
      WHERE NOT (l_shipdate < TIMESTAMP '1997-01-01'
                 AND l_orderkey % 97 = 0)
      GROUP BY l_returnflag, l_linestatus
      HAVING COUNT(*) > 0
      ORDER BY l_returnflag, l_linestatus"""))

  /** Incremental view maintenance for a JOIN view — the two-sided
    * generalization of [[qAggIvm]]: a per-customer revenue view over
    * orders ⋈ lineitem maintained under deltas on BOTH base tables
    * via the bag-algebra delta rule
    * (O+ΔO) ⋈ (L+ΔL) = O⋈L + ΔO⋈L + O⋈ΔL + ΔO⋈ΔL,
    * every term signed (+1 insert, −1 delete, product of signs on
    * the cross term — the DBToaster/IVM textbook identity). Deltas
    * are deterministic key classes: orders ≡7 (mod 10) arrive with
    * their lineitems (insert×insert exercises the cross term),
    * orders ≡1 are cancelled while their lineitems REMAIN in the
    * fact table (the ΔO⋈L term must erase their revenue — the case
    * a one-sided IVM silently corrupts), and lineitems ≡3/line-1 are
    * partial deletes. COUNT/SUM are self-maintainable; the merged
    * group vanishes exactly when its signed count reaches 0 (branch
    * pinned by a planted-fixture spec — the registry fixture never
    * cancels a whole customer).
    *
    * The gate is the strong IVM contract, [[qAggIvm]]'s discipline:
    * the oracle RECOMPUTES the view from the post-change base
    * tables, so the hash-match proves signed-merge ≡ from-scratch on
    * every cell. Scale shape: the base term is the one expensive
    * orderkey-keyed join; each delta term's shuffle is sized by |Δ|
    * (the base side probes delta keys — at 100 TB the bucketed base
    * layout plus the runtime bloom prune make that probe
    * |Δ|-proportional too); the signed merge re-aggregates partials
    * on the view key. Daily cost |Δ|, never |history|. */
  val qAggJoinIvm = Q(
    "q_agg_join_ivm",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          expr("o_orderkey % 10").as("m"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"),
          expr("l_orderkey % 10").as("m"))
      val oB = o.filter(col("m") =!= 7)
        .select(col("o_orderkey"), col("o_custkey"))
      val lB = l.filter(col("m") =!= 7)
        .select(col("l_orderkey"), col("cents"))
      val dO = o.filter(col("m") === 7).withColumn("so", lit(1L))
        .unionByName(o.filter(col("m") === 1).withColumn("so", lit(-1L)))
        .select(col("o_orderkey"), col("o_custkey"), col("so"))
      val dL = l.filter(col("m") === 7).withColumn("sl", lit(1L))
        .unionByName(l.filter(col("m") === 3 && col("l_linenumber") === 1)
          .withColumn("sl", lit(-1L)))
        .select(col("l_orderkey"), col("cents"), col("sl"))
      def term(os: DataFrame, ls: DataFrame, sign: Column): DataFrame =
        os.join(ls, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), sign.as("s"), col("cents"))
      val merged = term(oB, lB, lit(1L))
        .unionByName(term(dO, lB, col("so")))
        .unionByName(term(oB, dL, col("sl")))
        .unionByName(term(dO, dL, col("so") * col("sl")))
        .groupBy(col("o_custkey"))
        .agg(sum(col("s")).as("n"),
          sum(col("s") * col("cents")).as("rev"))
        .filter(col("n") =!= 0L)
      merged.select(col("o_custkey"), col("n"),
          col("rev").as("rev_cents"))
        .orderBy(col("o_custkey"))
    },
    // the oracle recomputes the view DIRECTLY from the post-change
    // base: orders minus the cancelled ≡1 class, lineitems minus the
    // ≡3/line-1 partial deletes (the ≡1 orders' lineitems remain and
    // must be dropped by the join itself)
    Some("""
      SELECT o_custkey, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS rev_cents
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey % 10 <> 1
        AND NOT (l.l_orderkey % 10 = 3 AND l.l_linenumber = 1)
      GROUP BY o_custkey
      ORDER BY o_custkey"""))

  /** Equi-width histogram: 20 bins of the event value per event type,
    * with the bin index computed from the per-type min/max — the
    * distribution-shape profile a feature audit draws before choosing
    * transforms (the equal-FREQUENCY dual is q_prep_binning). The bin
    * expression runs the identical IEEE op tree on both engines
    * ((value − lo) · 20 / (hi − lo), floor, clamp to 19), so the bin
    * assignment is bit-deterministic; empty bins are absent on both
    * sides alike. The per-type range is a 5-row broadcast joined back
    * map-side — two scans, one exchange for the final count. */
  val qEventsHistogram = Q(
    "q_events_histogram",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
      val rng = ev.groupBy(col("event_type"))
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      ev.join(rng, "event_type")
        .select(col("event_type"),
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(lit(19L),
              floor((col("value") - col("lo")) * lit(20.0) /
                (col("hi") - col("lo")))))
            .as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("event_type"), col("bin"))
    },
    Some("""
      WITH rng AS (
        SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
        FROM events GROUP BY event_type)
      SELECT e.event_type,
             CASE WHEN r.hi = r.lo THEN 0
                  ELSE LEAST(19, CAST(FLOOR((e.value - r.lo) *
                         CAST(20 AS DOUBLE) / (r.hi - r.lo)) AS BIGINT))
             END AS bin,
             COUNT(*) AS n_events
      FROM events e JOIN rng r USING (event_type)
      GROUP BY e.event_type, bin
      ORDER BY e.event_type, bin"""))

  /** Big×big interval-overlap SELF join degree — the join variant
    * neither a broadcast theta join nor a range join covers: both
    * interval sets are corpus-sized (every user's sessions), and the
    * measure is each session's concurrency degree (how many OTHER
    * users' sessions overlap its [start, end + 30 min gap window]).
    * Materializing candidate pairs — even hour-bucketed — is
    * quadratic in the hot hour (measured 18 s at sf0.1); counting
    * degrees needs NO pairs at all. The identity: degree(a) =
    * #{st_b ≤ en_a} − #{en_b < st_a} − 1 — everything not strictly
    * before and not strictly after overlaps — turns the interval join
    * into two distributed ORDER STATISTICS over the session endpoint
    * sets ([[graft.operators.OrderStatistics.countByRank]]:
    * range-bucket + per-partition sorted scan + bounded prefix theta
    * join), O(N log N) with no blowup at any concurrency. Same-user
    * terms provably cannot leak in (session break ⇒ gap > pad ⇒
    * padded same-user sessions stay strictly disjoint), so the
    * oracle's u_a <> u_b theta-join semantics are matched exactly —
    * the hash-match against DuckDB's IEJoin plan proves the pair-free
    * rewrite IS the interval join. */
  val qJoinInterval = Q(
    "q_join_interval",
    (s, dir) => {
      val pad = 1800L * 1000000L
      val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val sess = e
        .withColumn("new_s",
          when(col("us") - lag(col("us"), 1).over(w) <= pad, 0L)
            .otherwise(1L))
        .withColumn("session_idx", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("us")).as("st"), (max(col("us")) + pad).as("en"))
      // degree(a) = #{b : st_b <= en_a} − #{b : en_b < st_a} − 1(self):
      // every session NOT strictly before and NOT strictly after a
      // overlaps it. Same-user terms cannot inflate the count: a
      // session break requires gap > pad, so st_next > en_prev + pad
      // − pad = en_prev(padded) STRICTLY — same-user padded sessions
      // never overlap, and the only self term is the −1. The oracle's
      // u_a <> u_b predicate is therefore matched exactly.
      graft.operators.OrderStatistics
        .intervalDegree(sess, "user_id", "session_idx", "st", "en")
        .select(col("user_id"), col("session_idx"),
          col("st").as("session_start_us"),
          col("degree").as("n_concurrent"))
        .filter(col("n_concurrent") > 0)
        .orderBy(col("n_concurrent").desc, col("user_id"),
          col("session_idx"))
        .limit(50)
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      f AS (
        SELECT *, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                               ORDER BY us, event_id)
                            <= 1800 * 1000000
                       THEN 0 ELSE 1 END AS new_s
        FROM e),
      s AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS session_idx
        FROM f),
      sess AS (
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               MIN(us) AS st, MAX(us) + 1800 * 1000000 AS en
        FROM s GROUP BY user_id, session_idx),
      pairs AS (
        SELECT a.user_id AS u_a, a.session_idx AS i_a, a.st AS st_a
        FROM sess a JOIN sess b
          ON a.user_id <> b.user_id
         AND a.st <= b.en AND b.st <= a.en)
      SELECT u_a AS user_id, i_a AS session_idx,
             st_a AS session_start_us, COUNT(*) AS n_concurrent
      FROM pairs GROUP BY u_a, i_a, st_a
      ORDER BY n_concurrent DESC, user_id, session_idx LIMIT 50"""))

  /** TPC-H Q21's shape — the double-correlated EXISTS / NOT-EXISTS
    * join ("suppliers who were the SOLE late shipper on a
    * multi-supplier order", lateness = shipped >60 days after the
    * order date): the one classic relational form the join family
    * didn't yet pin. Written as SQL on purpose — the gate certifies
    * that Catalyst DECORRELATES both subqueries into existence
    * hash-joins on the order key (the lateral/IN/semi queries pin the
    * other decorrelation paths; PlanAuditSpec rejects any BNLJ
    * fallback) rather than re-executing them per outer row.
    *
    * Scale shape: the `ll` late-lines build is one broadcast-or-SMJ
    * orders join; both EXISTS legs are equi-keyed on l_orderkey with
    * the supplier inequality as a join residual — three shuffles on
    * the same key end to end, then a supplier-keyed count. */
  val qJoinExistsMulti = Q(
    "q_join_exists_multi",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_exm")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_exm")
      s.sql("""
        WITH ll AS (
          SELECT l.l_orderkey, l.l_suppkey
          FROM lineitem_exm l JOIN orders_exm o
            ON o.o_orderkey = l.l_orderkey
          WHERE l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
        SELECT l1.l_suppkey AS suppkey, COUNT(*) AS numwait
        FROM ll l1
        WHERE EXISTS (SELECT 1 FROM lineitem_exm l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM ll l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY l1.l_suppkey
        ORDER BY numwait DESC, suppkey LIMIT 25""")
    },
    Some("""
      WITH ll AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      SELECT l1.l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM ll l1
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM ll l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey)
      GROUP BY l1.l_suppkey
      ORDER BY numwait DESC, suppkey LIMIT 25"""))

  /** TPC-H Q18's shape — large-volume orders: the IN-over-aggregated-
    * HAVING form (the semi-join key set is itself an aggregate,
    * unlike q_subqueries' plain IN). The HAVING threshold compares a
    * DECIMAL-accumulated sum so the keep/drop decision at the
    * boundary is bit-identical in both engines (a double sum's last
    * ulp could flip rows exactly at 150). */
  val qAggLargeOrders = Q(
    "q_agg_large_orders",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(25, 4))).as("q"))
        .filter(col("q") > 150)
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === big("l_orderkey"), "left_semi")
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o.o_orderkey, o.o_custkey,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,4))) AS DOUBLE)
               AS total_qty
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(25,4))) > 150)
      GROUP BY o.o_orderkey, o.o_custkey ORDER BY o.o_orderkey"""))

  /** Market-basket association rules over order line items — the
    * classic co-occurrence mining shape (support / confidence / lift
    * for part PAIRS bought in the same order) with the Apriori
    * anti-monotone prune applied where it matters at scale: items
    * below the item-support floor are semi-joined OUT of the basket
    * table BEFORE the pair self-join, so the quadratic per-order pair
    * expansion runs only over frequent items. The expansion itself is
    * bounded by basket size (≤ 13 distinct parts per order in this
    * fixture, ~7 in TPC-H generally), so the orderkey-keyed self-join
    * emits O(orders · basket²) pairs — linear in the corpus, never
    * item² — and the pair counts partial-aggregate map-side before
    * the (item_a, item_b)-keyed exchange. The frequent-item table
    * (#parts rows at most) broadcasts; the single order-count scalar
    * rides a one-row cross join into the lift projection. Lift and
    * confidence are exact-integer ratios divided once in double and
    * rounded at 6; ordering is on the rounded value with a full key
    * tie-break, so the top-50 cut is deterministic in both engines. */
  val qAggBasket = Q(
    "q_agg_basket",
    (s, dir) => {
      val b = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val isupp = b.groupBy(col("p")).agg(count(lit(1)).as("s"))
      val freq = isupp.filter(col("s") >= 20)
      val fb = b.join(broadcast(freq), Seq("p"))
      val nOrders = b.agg(countDistinct(col("o")).as("n_orders"))
      fb.select(col("o"), col("p").as("item_a"), col("s").as("sa"))
        .join(fb.select(col("o"), col("p").as("item_b"),
          col("s").as("sb")), Seq("o"))
        .filter(col("item_a") < col("item_b"))
        .groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("pair_supp"), max(col("sa")).as("sa"),
          max(col("sb")).as("sb"))
        .filter(col("pair_supp") >= 3)
        .crossJoin(broadcast(nOrders))
        .select(col("item_a"), col("item_b"), col("pair_supp"),
          col("sa").as("supp_a"), col("sb").as("supp_b"),
          round(col("pair_supp").cast("double") / col("sa").cast("double"),
            6).as("confidence"),
          round((col("pair_supp") * col("n_orders")).cast("double") /
            (col("sa") * col("sb")).cast("double"), 6).as("lift"))
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))
        .limit(50)
    },
    Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      isupp AS (SELECT p, COUNT(*) AS s FROM b GROUP BY p),
      freq AS (SELECT * FROM isupp WHERE s >= 20),
      fb AS (SELECT b.o, b.p, f.s FROM b JOIN freq f USING (p)),
      n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM b),
      pairs AS (
        SELECT a.p AS item_a, c.p AS item_b, COUNT(*) AS pair_supp,
               MAX(a.s) AS supp_a, MAX(c.s) AS supp_b
        FROM fb a JOIN fb c ON a.o = c.o AND a.p < c.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      SELECT item_a, item_b, pair_supp, supp_a, supp_b,
             ROUND(CAST(pair_supp AS DOUBLE) / CAST(supp_a AS DOUBLE), 6)
               AS confidence,
             ROUND(CAST(pair_supp * n_orders AS DOUBLE) /
                   CAST(supp_a * supp_b AS DOUBLE), 6) AS lift
      FROM pairs CROSS JOIN n
      ORDER BY lift DESC, item_a, item_b LIMIT 50"""))

  /** Bitmap-word exact distinct count — the compressed-shuffle
    * technique for dense integer keys: instead of shuffling one row
    * per (event_type, user_id) into a COUNT(DISTINCT), pack users
    * into 62-bit words (word = id div 62, bit = id mod 62 — 62 keeps
    * the sign bit and bit 62 out of the cross-engine shift),
    * BIT_OR-combine words map-side, and pop-count the result: the
    * exchange carries at most ⌈|id-space|/62⌉ rows per group instead
    * of |users| — a 62× shuffle compression with EXACT semantics
    * (this is the roaring-bitmap idea reduced to its fixed-width
    * core). The query emits both the bitmap count and the classic
    * COUNT(DISTINCT) so the gate proves the equivalence on every
    * group, not just asserts it. */
  val qAggBitmapDistinct = Q(
    "q_agg_bitmap_distinct",
    (s, dir) => {
      val words = t(s, dir, "events")
        .select(col("event_type"),
          expr("user_id div 62").as("w"),
          expr("shiftleft(1L, cast(user_id % 62 as int))").as("b"))
        .groupBy(col("event_type"), col("w"))
        .agg(expr("bit_or(b)").as("word"))
      val viaBitmap = words.groupBy(col("event_type"))
        .agg(sum(expr("bit_count(word)")).cast("long")
          .as("n_distinct_bitmap"))
      val exact = t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_distinct_exact"))
      viaBitmap.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_distinct_bitmap"),
          col("n_distinct_exact"),
          (col("n_distinct_bitmap") === col("n_distinct_exact"))
            .as("agree"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH words AS (
        SELECT event_type, user_id // 62 AS w,
               BIT_OR(CAST(1 AS BIGINT) << CAST(user_id % 62 AS INTEGER))
                 AS word
        FROM events GROUP BY event_type, user_id // 62),
      via_bitmap AS (
        SELECT event_type,
               CAST(SUM(bit_count(word)) AS BIGINT) AS n_distinct_bitmap
        FROM words GROUP BY event_type),
      exact AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_exact
        FROM events GROUP BY event_type)
      SELECT event_type, n_distinct_bitmap, n_distinct_exact,
             n_distinct_bitmap = n_distinct_exact AS agree
      FROM via_bitmap JOIN exact USING (event_type)
      ORDER BY event_type"""))

  /** NEAREST-in-time as-of join — the third member of the as-of
    * family after backward ([[qAsofJoin]]) and tolerance-bounded
    * ([[qAsofTolerance]]): each click matches the purchase CLOSEST in
    * time in EITHER direction (sensor alignment, "which transaction
    * does this log line belong to"), ties to the backward match. The
    * operator composes two single-exchange [[AsOfJoin]] passes — the
    * backward pass as-is, the forward pass by running the SAME
    * operator over negated epoch-micros (most-recent ≤ on the negated
    * axis IS earliest ≥ on the real axis — no new operator code) —
    * then a click-keyed full outer join picks the closer side with
    * integer micros arithmetic. DuckDB mirrors with two native ASOF
    * JOINs (≤ and ≥), so the gate certifies the negation trick
    * against the engine that has the operator built in.
    *
    * Scale: two key-exchanges + one click-keyed join — still no range
    * probe, no pair explosion; gap seconds are exact integers. */
  val qAsofNearest = Q(
    "q_asof_nearest",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("bval"),
          col("ts").as("bts"))
      val bwd = AsOfJoin.asof(clicks, purchases, "user_id",
          leftTs = "click_ts", rightTs = "ts", payload = Seq("bval", "bts"))
        .select(col("click_id"), col("user_id"), col("click_ts"),
          col("bval"), col("bts"))
      val clicksF = clicks
        .withColumn("cnts", -unix_micros(col("click_ts")))
      val purchasesF = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), (-unix_micros(col("ts"))).as("nts"),
          col("value").as("fval"), col("ts").as("fts"))
      val fwd = AsOfJoin.asof(clicksF, purchasesF, "user_id",
          leftTs = "cnts", rightTs = "nts", payload = Seq("fval", "fts"))
        .select(col("click_id").as("fcid"),
          col("user_id").as("fuid"), col("click_ts").as("fcts"),
          col("fval"), col("fts"))
      bwd.join(fwd, col("click_id") === col("fcid"), "full_outer")
        .select(
          coalesce(col("click_id"), col("fcid")).as("click_id"),
          coalesce(col("user_id"), col("fuid")).as("user_id"),
          coalesce(col("click_ts"), col("fcts")).as("cts"),
          col("bval"), col("bts"), col("fval"), col("fts"))
        .select(col("click_id"), col("user_id"),
          col("cts").as("click_ts"),
          when(col("fts").isNull || (col("bts").isNotNull &&
            unix_micros(col("cts")) - unix_micros(col("bts")) <=
              unix_micros(col("fts")) - unix_micros(col("cts"))),
            lit("backward")).otherwise(lit("forward")).as("direction"),
          when(col("fts").isNull || (col("bts").isNotNull &&
            unix_micros(col("cts")) - unix_micros(col("bts")) <=
              unix_micros(col("fts")) - unix_micros(col("cts"))),
            col("bval")).otherwise(col("fval")).as("nearest_value"),
          when(col("fts").isNull || (col("bts").isNotNull &&
            unix_micros(col("cts")) - unix_micros(col("bts")) <=
              unix_micros(col("fts")) - unix_micros(col("cts"))),
            expr("(unix_micros(cts) - unix_micros(bts)) div 1000000"))
            .otherwise(
              expr("(unix_micros(fts) - unix_micros(cts)) div 1000000"))
            .as("gap_s"))
        .orderBy(col("click_id"))
    },
    Some("""
      WITH c AS (SELECT event_id AS click_id, user_id,
                        CAST(ts AS TIMESTAMP) AS cts
                 FROM events WHERE event_type = 'click'),
      p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'),
      b AS (
        SELECT c.click_id, c.user_id, c.cts,
               p.value AS bval, p.ts AS bts
        FROM c ASOF JOIN p
          ON c.user_id = p.user_id AND p.ts <= c.cts),
      f AS (
        SELECT c.click_id AS fcid, c.user_id AS fuid, c.cts AS fcts,
               p.value AS fval, p.ts AS fts
        FROM c ASOF JOIN p
          ON c.user_id = p.user_id AND p.ts >= c.cts),
      j AS (
        SELECT COALESCE(b.click_id, f.fcid) AS click_id,
               COALESCE(b.user_id, f.fuid) AS user_id,
               COALESCE(b.cts, f.fcts) AS cts,
               b.bval, b.bts, f.fval, f.fts
        FROM b FULL OUTER JOIN f ON f.fcid = b.click_id)
      SELECT click_id, user_id, cts AS click_ts,
             CASE WHEN fts IS NULL OR (bts IS NOT NULL AND
                    epoch_us(cts) - epoch_us(bts) <=
                    epoch_us(fts) - epoch_us(cts))
                  THEN 'backward' ELSE 'forward' END AS direction,
             CASE WHEN fts IS NULL OR (bts IS NOT NULL AND
                    epoch_us(cts) - epoch_us(bts) <=
                    epoch_us(fts) - epoch_us(cts))
                  THEN bval ELSE fval END AS nearest_value,
             CASE WHEN fts IS NULL OR (bts IS NOT NULL AND
                    epoch_us(cts) - epoch_us(bts) <=
                    epoch_us(fts) - epoch_us(cts))
                  THEN (epoch_us(cts) - epoch_us(bts)) // 1000000
                  ELSE (epoch_us(fts) - epoch_us(cts)) // 1000000
             END AS gap_s
      FROM j ORDER BY click_id"""))

  /** Input/output rows for the skyline's typed per-partition scan. */
  private[analytics] case class SkyIn(
      l_suppkey: Long, l_extendedprice: Double, l_quantity: Double,
      l_orderkey: Long, l_linenumber: Int)

  /** Per-group skyline (Pareto frontier) — for each supplier, the
    * lineitems no other lineitem of the same supplier dominates
    * (dominates = price ≤ AND quantity ≥, strictly better in at least
    * one). The skyline is the classic multi-criteria shortlist
    * operator (cheapest-for-its-size supplier offers, best
    * price/quality catalog rows) and is NOT expressible as a
    * window aggregate in general; the 2-D case admits an exact
    * one-pass formulation the engine exploits: sort each group by
    * (price ASC, quantity DESC), then a row survives iff its quantity
    * strictly exceeds the running max quantity over all STRICTLY
    * cheaper rows, and is not beaten by a same-price row above it.
    * Duplicated (price, quantity) points are mutually non-dominating
    * and both survive — the scan's same-price test is a strict `>`,
    * so ties fall through to "keep", matching the NOT EXISTS
    * dominance oracle exactly.
    *
    * Engine side is the secondary-sort pattern ([[EventQueries
    * .qEventsThrottle]] discipline): one hash exchange on the group
    * key, sortWithinPartitions, then a single streaming
    * mapPartitions pass with O(1) state (group, running max, current
    * price band top) — no per-group materialization, so a hot
    * supplier spills nothing. The oracle states dominance
    * declaratively (NOT EXISTS a dominating row), certifying the
    * linear scan against the quadratic definition.
    *
    * Scale shape: one group-keyed exchange + ordered scan; output
    * order rides the same sort. Higher dimensions would swap the
    * scan for partition-local skyline + bounded global merge. */
  val qSkylineSuppliers = Q(
    "q_skyline_suppliers",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice"),
          col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
        .repartition(col("l_suppkey"))
        .sortWithinPartitions(col("l_suppkey"), col("l_extendedprice"),
          col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
        .as[SkyIn]
        .mapPartitions { it =>
          var curSupp = Long.MinValue
          var prevMax = Double.NegativeInfinity // max qty, strictly cheaper
          var curPrice = Double.NaN
          var curTop = Double.NegativeInfinity // max qty at curPrice
          var first = true
          it.filter { r =>
            if (first || r.l_suppkey != curSupp) {
              first = false; curSupp = r.l_suppkey
              prevMax = Double.NegativeInfinity
              curPrice = r.l_extendedprice; curTop = r.l_quantity
              true
            } else if (r.l_extendedprice == curPrice) {
              // same price band: beaten by the band top or a cheaper row
              prevMax < r.l_quantity && curTop <= r.l_quantity
            } else {
              prevMax = math.max(prevMax, curTop)
              curPrice = r.l_extendedprice; curTop = r.l_quantity
              prevMax < r.l_quantity
            }
          }
        }
        .toDF()
        .orderBy(col("l_suppkey"), col("l_extendedprice"),
          col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_suppkey, l_extendedprice, l_quantity, l_orderkey,
             l_linenumber
      FROM lineitem b
      WHERE NOT EXISTS (
        SELECT 1 FROM lineitem a
        WHERE a.l_suppkey = b.l_suppkey
          AND a.l_extendedprice <= b.l_extendedprice
          AND a.l_quantity >= b.l_quantity
          AND (a.l_extendedprice < b.l_extendedprice
               OR a.l_quantity > b.l_quantity))
      ORDER BY l_suppkey, l_extendedprice, l_quantity DESC,
               l_orderkey, l_linenumber"""))

  /** Run-length encoding advisor — for each candidate column, how many
    * VALUE RUNS survive when lineitem is laid out bucket-sorted by
    * (l_suppkey, l_shipdate, l_orderkey, l_linenumber): runs ≈ RLE/
    * dictionary pages after encoding, so rows/runs is the compression
    * leverage each column gets from this sort order — the estimate a
    * layout planner reads before choosing Z-order vs linear sort keys
    * (the write side lives in [[graft.analytics.Bucketing]]). One pass
    * computes all four columns' change flags from the SAME fused
    * lag window; a run starts where the value differs from its
    * predecessor (or at each bucket head — runs never span buckets,
    * exactly like parquet row groups).
    *
    * Scale shape: ONE suppkey exchange carries the single Window
    * operator (four lags, one sort) and the global rollup is a 4-value
    * stack over map-side-combined sums — output is 4 rows regardless
    * of input size. Exact integers plus one rounded double ratio. */
  val qAggRle = Q(
    "q_agg_rle",
    (s, dir) => {
      val wSeq = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      def runFlag(c: String) =
        when(lag(col(c), 1).over(wSeq).isNull ||
          lag(col(c), 1).over(wSeq) =!= col(c), lit(1L)).otherwise(lit(0L))
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_partkey"))
        .withColumn("r_returnflag", runFlag("l_returnflag"))
        .withColumn("r_linestatus", runFlag("l_linestatus"))
        .withColumn("r_quantity", runFlag("l_quantity"))
        .withColumn("r_partkey", runFlag("l_partkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("r_returnflag")).as("s1"), sum(col("r_linestatus")).as("s2"),
          sum(col("r_quantity")).as("s3"), sum(col("r_partkey")).as("s4"))
        .select(expr(
          "stack(4, 'l_returnflag', s1, 'l_linestatus', s2, " +
            "'l_quantity', s3, 'l_partkey', s4) AS (column_name, n_runs)"),
          col("n").as("n_rows"))
        .select(col("column_name"), col("n_rows"), col("n_runs"),
          round(col("n_rows").cast("double") / col("n_runs").cast("double"),
            6).as("rows_per_run"))
        .orderBy(col("column_name"))
    },
    Some("""
      WITH flagged AS (
        SELECT
          CASE WHEN LAG(l_returnflag) OVER w IS NULL
                 OR LAG(l_returnflag) OVER w <> l_returnflag
               THEN 1 ELSE 0 END AS r1,
          CASE WHEN LAG(l_linestatus) OVER w IS NULL
                 OR LAG(l_linestatus) OVER w <> l_linestatus
               THEN 1 ELSE 0 END AS r2,
          CASE WHEN LAG(l_quantity) OVER w IS NULL
                 OR LAG(l_quantity) OVER w <> l_quantity
               THEN 1 ELSE 0 END AS r3,
          CASE WHEN LAG(l_partkey) OVER w IS NULL
                 OR LAG(l_partkey) OVER w <> l_partkey
               THEN 1 ELSE 0 END AS r4
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber)),
      sums AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(r1) AS BIGINT) AS s1, CAST(SUM(r2) AS BIGINT) AS s2,
               CAST(SUM(r3) AS BIGINT) AS s3, CAST(SUM(r4) AS BIGINT) AS s4
        FROM flagged),
      stacked AS (
        SELECT 'l_returnflag' AS column_name, n AS n_rows, s1 AS n_runs
          FROM sums
        UNION ALL SELECT 'l_linestatus', n, s2 FROM sums
        UNION ALL SELECT 'l_quantity', n, s3 FROM sums
        UNION ALL SELECT 'l_partkey', n, s4 FROM sums)
      SELECT column_name, n_rows, n_runs,
             ROUND(CAST(n_rows AS DOUBLE) / CAST(n_runs AS DOUBLE), 6)
               AS rows_per_run
      FROM stacked ORDER BY column_name"""))

  /** Exact distributed median WITHOUT a global sort — the two-pass
    * radix-histogram plan, now the shared
    * [[graft.operators.OrderStatistics.radixLowerMedian]] core
    * (factored out in round 10 so [[qStatsMad]] and friends ride the
    * same plan): pass 1 counts 65536-wide cent buckets per group and
    * locates the bucket where the cumulative count crosses the median
    * rank ⌈n/2⌉; pass 2 re-scans ONLY that bucket's rows and walks
    * exact cent counts to the remaining rank. This is how a
    * 1000-executor cluster takes an exact per-group median of 100 TB:
    * two narrow scans plus two BOUNDED-frame cumulative walks (≤ 840
    * bucket rows, then ≤ 65536 cent rows), never a per-group sort of
    * the data and never percentile_approx's error. The oracle is the
    * rank definition itself (value at ROW_NUMBER ⌈n/2⌉), so the gate
    * certifies the radix plan against the naive sort.
    *
    * Lower-median convention (value AT rank ⌈n/2⌉) keeps every cell
    * BIGINT — no even-count averaging seam. */
  val qAggRadixMedian = Q(
    "q_agg_radix_median",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("g"),
          round(col("o_totalprice") * 100).cast("long").as("c"))
      graft.operators.OrderStatistics.radixLowerMedian(o)
        .select(col("g").as("o_orderpriority"), col("n"),
          col("med").as("median_c"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderpriority AS g,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders),
      n AS (SELECT g, COUNT(*) AS n FROM o GROUP BY g),
      r AS (
        SELECT g, c, CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY c)
                 AS BIGINT) AS rn
        FROM o)
      SELECT r.g AS o_orderpriority, n.n, r.c AS median_c
      FROM r JOIN n ON n.g = r.g
      WHERE r.rn = (n.n + 1) // 2
      ORDER BY o_orderpriority"""))

  /** Join-order advisor — the System-R cardinality-estimation step a
    * cost-based optimizer runs before picking a join order, exposed
    * as a query: from per-table exact statistics (row counts +
    * distinct key counts, one aggregate per table), estimate every
    * intermediate size of the three ways to join lineitem ⋈ orders ⋈
    * customer (|R ⋈ S| = |R|·|S| DIV max(ndv_R(k), ndv_S(k)); a
    * keyless pairing costs |R|·|S|) and rank the orders by total
    * intermediate rows. On foreign-key data the formula is EXACT for
    * the key joins — the probe checks estimates against actual join
    * sizes — so the advisor provably ranks the FK-chain order first
    * and the cartesian start last. All BIGINT; the stats pass is
    * three map-side-combined aggregates, the planning itself is a
    * 3-row literal frame.
    *
    * Scale shape: this is the ADVISOR a 100 TB pipeline runs on
    * metadata-scale statistics instead of trusting defaults — three
    * narrow scans (count + exact ndv each), then bounded-frame
    * arithmetic; the one-row stats scalars ride broadcast cross
    * joins. */
  val qJoinOrderAdvisor = Q(
    "q_join_order_advisor",
    (s, dir) => {
      val lStats = t(s, dir, "lineitem").agg(
        count(lit(1)).as("nl"),
        countDistinct(col("l_orderkey")).as("ndv_l_ok"))
      val oStats = t(s, dir, "orders").agg(
        count(lit(1)).as("no"),
        countDistinct(col("o_orderkey")).as("ndv_o_ok"),
        countDistinct(col("o_custkey")).as("ndv_o_ck"))
      val cStats = t(s, dir, "customer").agg(
        count(lit(1)).as("nc"),
        countDistinct(col("c_custkey")).as("ndv_c_ck"))
      val stats = lStats.crossJoin(broadcast(oStats))
        .crossJoin(broadcast(cStats))
      stats
        .select(explode(array(
          struct(lit("lineitem_orders_first").as("join_order"),
            expr("nl * no DIV greatest(ndv_l_ok, ndv_o_ok)")
              .as("est_first"),
            expr("nl * no DIV greatest(ndv_l_ok, ndv_o_ok) + " +
              "(nl * no DIV greatest(ndv_l_ok, ndv_o_ok)) * nc " +
              "DIV greatest(ndv_o_ck, ndv_c_ck)").as("est_total")),
          struct(lit("orders_customer_first").as("join_order"),
            expr("no * nc DIV greatest(ndv_o_ck, ndv_c_ck)")
              .as("est_first"),
            expr("no * nc DIV greatest(ndv_o_ck, ndv_c_ck) + " +
              "(no * nc DIV greatest(ndv_o_ck, ndv_c_ck)) * nl " +
              "DIV greatest(ndv_o_ok, ndv_l_ok)").as("est_total")),
          struct(lit("lineitem_customer_first").as("join_order"),
            expr("nl * nc").as("est_first"),
            expr("nl * nc + nl * nc * no " +
              "DIV greatest(ndv_o_ok, ndv_l_ok) " +
              "DIV greatest(ndv_o_ck, ndv_c_ck)").as("est_total"))))
          .as("o"))
        .select(col("o.join_order"), col("o.est_first"),
          col("o.est_total"))
        .orderBy(col("est_total"), col("join_order"))
    },
    Some("""
      WITH ls AS (
        SELECT COUNT(*) AS nl,
               COUNT(DISTINCT l_orderkey) AS ndv_l_ok
        FROM lineitem),
      os AS (
        SELECT COUNT(*) AS no,
               COUNT(DISTINCT o_orderkey) AS ndv_o_ok,
               COUNT(DISTINCT o_custkey) AS ndv_o_ck
        FROM orders),
      cs AS (
        SELECT COUNT(*) AS nc,
               COUNT(DISTINCT c_custkey) AS ndv_c_ck
        FROM customer),
      stats AS (SELECT * FROM ls CROSS JOIN os CROSS JOIN cs),
      plans AS (
        SELECT 'lineitem_orders_first' AS join_order,
               nl * no // GREATEST(ndv_l_ok, ndv_o_ok) AS est_first,
               nl * no // GREATEST(ndv_l_ok, ndv_o_ok)
                 + (nl * no // GREATEST(ndv_l_ok, ndv_o_ok)) * nc
                   // GREATEST(ndv_o_ck, ndv_c_ck) AS est_total
        FROM stats
        UNION ALL
        SELECT 'orders_customer_first',
               no * nc // GREATEST(ndv_o_ck, ndv_c_ck),
               no * nc // GREATEST(ndv_o_ck, ndv_c_ck)
                 + (no * nc // GREATEST(ndv_o_ck, ndv_c_ck)) * nl
                   // GREATEST(ndv_o_ok, ndv_l_ok)
        FROM stats
        UNION ALL
        SELECT 'lineitem_customer_first', nl * nc,
               nl * nc + nl * nc * no
                 // GREATEST(ndv_o_ok, ndv_l_ok)
                 // GREATEST(ndv_o_ck, ndv_c_ck)
        FROM stats)
      SELECT join_order, est_first, est_total
      FROM plans
      ORDER BY est_total, join_order"""))

  /** Deterministic-HLL set algebra — the sketch operation
    * [[qHllDistinct]] (engine-internal registers, bound-gated) cannot
    * expose: build OWN HyperLogLog registers from md5 (register =
    * first hex byte, m = 256; ρ = leading-zero count of the next 48
    * bits + 1, derived by exact hex-string arithmetic), so BOTH
    * engines compute bit-identical registers, the UNION sketch is a
    * per-register MAX — the algebra that makes HLL mergeable across
    * shards/sets — and the emitted `intersection` row is
    * inclusion-exclusion over the three estimates (|A∩B| ≈ est(A) +
    * est(B) − est(A∪B): exact integer arithmetic over the three
    * BIGINT estimates, with the well-known caveat that I-E error
    * compounds — its within_20pct flag reports honestly). Sets:
    * urgent orders vs high-value orders (partial overlap). The
    * harmonic sum is EXACT
    * (Σ 2^(50−M) in BIGINT, M ≤ 49); the final α·m²·2⁵⁰/S division
    * is one identical double chain, rounded. Raw HLL estimator only
    * (all sets here sit above the 2.5m small-range region — the
    * ln-based correction would need a transcendental).
    *
    * Scale shape: one scan per set builds ≤ m register rows
    * (map-side max-combine); everything downstream is 256-row frame
    * work. This is the cardinality algebra a 100 TB catalog uses to
    * answer overlap questions WITHOUT re-scanning either side. */
  val qHllSetops = Q(
    "q_hll_setops",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def keys(pred: Column) = o.filter(pred).select(col("o_orderkey"))
      // rho from exact hex-string arithmetic — no log anywhere (a
      // log2-based leading-zero count can differ by 1 ulp between
      // engines near powers of two and flip a register)
      def rho(df: DataFrame, name: String): DataFrame =
        df.select(
            conv(substring(md5(col("o_orderkey").cast("string")), 1, 2),
              16, 10).cast("long").as("reg"),
            expr("""regexp_replace(
              substr(md5(CAST(o_orderkey AS STRING)), 3, 12),
              '^0+', '')""").as("stripped"))
          .withColumn("rho", when(col("stripped") === "", lit(49L))
            .otherwise((lit(12L) - length(col("stripped"))) * 4 +
              expr("""CASE
                WHEN instr('89abcdef', substr(stripped, 1, 1)) > 0
                  THEN 0L
                WHEN instr('4567', substr(stripped, 1, 1)) > 0 THEN 1L
                WHEN instr('23', substr(stripped, 1, 1)) > 0 THEN 2L
                ELSE 3L END""") + 1L))
          .groupBy(col("reg")).agg(max(col("rho")).as("m"))
          .withColumn("set_name", lit(name))
      val aPred = col("o_orderpriority") === "1-URGENT"
      val bPred = col("o_totalprice") > 150000.0
      val ra = rho(keys(aPred), "a_urgent")
      val rb = rho(keys(bPred), "b_highvalue")
      val ru = ra.select(col("reg"), col("m"))
        .unionByName(rb.select(col("reg"), col("m")))
        .groupBy(col("reg")).agg(max(col("m")).as("m"))
        .withColumn("set_name", lit("union"))
      val est = ra.unionByName(rb).unionByName(ru)
        .groupBy(col("set_name"))
        .agg(sum(expr("shiftleft(1L, CAST(50 - m AS INT))")).as("spart"),
          count(lit(1)).as("nregs"))
        .select(col("set_name"),
          (col("spart") +
            (lit(256L) - col("nregs")) * expr("shiftleft(1L, 50)"))
            .as("harm"))
        .select(col("set_name"),
          round(lit(718273.0) * 256.0 * 256.0 *
            expr("cast(shiftleft(1L, 50) as double)") /
            col("harm").cast("double") / 1000000.0).cast("long")
            .as("hll_est"))
      // inclusion-exclusion over the 3-row estimate frame (bounded)
      val interEst = est.agg(
          sum(when(col("set_name") === "a_urgent", col("hll_est")))
            .as("ea"),
          sum(when(col("set_name") === "b_highvalue", col("hll_est")))
            .as("eb"),
          sum(when(col("set_name") === "union", col("hll_est")))
            .as("eu"))
        .select(lit("intersection").as("set_name"),
          (col("ea") + col("eb") - col("eu")).as("hll_est"))
      val est4 = est.unionByName(interEst)
      val exact = keys(aPred).agg(countDistinct(col("o_orderkey")))
        .collect()(0).getLong(0)
      val exactB = keys(bPred).agg(countDistinct(col("o_orderkey")))
        .collect()(0).getLong(0)
      val exactU = keys(aPred).unionByName(keys(bPred)).distinct()
        .count()
      val exactI = keys(aPred)
        .join(keys(bPred), Seq("o_orderkey"), "left_semi")
        .distinct().count()
      val exacts = Map("a_urgent" -> exact, "b_highvalue" -> exactB,
        "union" -> exactU, "intersection" -> exactI)
      import s.implicits._
      val ex = exacts.toSeq.toDF("set_name", "exact_n")
      est4.join(broadcast(ex), Seq("set_name"))
        .select(col("set_name"), col("exact_n"), col("hll_est"),
          (abs(col("hll_est") - col("exact_n")).cast("double") <=
            lit(0.2) * col("exact_n").cast("double")).as("within_20pct"))
        .orderBy(col("set_name"))
    },
    Some("""
      WITH a AS (SELECT o_orderkey FROM orders
                 WHERE o_orderpriority = '1-URGENT'),
      b AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000),
      ra AS (
        SELECT 'a_urgent' AS set_name,
               CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                 1, 2)) AS BIGINT) AS reg,
               MAX(CASE WHEN regexp_replace(
                     substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 12),
                     '^0+', '') = '' THEN 49
                   ELSE (12 - length(regexp_replace(
                       substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 12),
                       '^0+', ''))) * 4
                     + CASE WHEN instr('89abcdef', substr(
                           regexp_replace(substr(md5(CAST(o_orderkey
                             AS VARCHAR)), 3, 12), '^0+', ''), 1, 1))
                           > 0 THEN 0
                         WHEN instr('4567', substr(regexp_replace(
                           substr(md5(CAST(o_orderkey AS VARCHAR)),
                             3, 12), '^0+', ''), 1, 1)) > 0 THEN 1
                         WHEN instr('23', substr(regexp_replace(
                           substr(md5(CAST(o_orderkey AS VARCHAR)),
                             3, 12), '^0+', ''), 1, 1)) > 0 THEN 2
                         ELSE 3 END + 1 END) AS m
        FROM a GROUP BY 1, 2),
      rb AS (
        SELECT 'b_highvalue' AS set_name,
               CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                 1, 2)) AS BIGINT) AS reg,
               MAX(CASE WHEN regexp_replace(
                     substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 12),
                     '^0+', '') = '' THEN 49
                   ELSE (12 - length(regexp_replace(
                       substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 12),
                       '^0+', ''))) * 4
                     + CASE WHEN instr('89abcdef', substr(
                           regexp_replace(substr(md5(CAST(o_orderkey
                             AS VARCHAR)), 3, 12), '^0+', ''), 1, 1))
                           > 0 THEN 0
                         WHEN instr('4567', substr(regexp_replace(
                           substr(md5(CAST(o_orderkey AS VARCHAR)),
                             3, 12), '^0+', ''), 1, 1)) > 0 THEN 1
                         WHEN instr('23', substr(regexp_replace(
                           substr(md5(CAST(o_orderkey AS VARCHAR)),
                             3, 12), '^0+', ''), 1, 1)) > 0 THEN 2
                         ELSE 3 END + 1 END) AS m
        FROM b GROUP BY 1, 2),
      ru AS (
        SELECT 'union' AS set_name, reg, MAX(m) AS m
        FROM (SELECT reg, m FROM ra UNION ALL SELECT reg, m FROM rb)
        GROUP BY 1, 2),
      regs AS (
        SELECT * FROM ra UNION ALL SELECT * FROM rb
        UNION ALL SELECT * FROM ru),
      harm AS (
        SELECT set_name,
               CAST(SUM(CAST(1 AS BIGINT) << CAST(50 - m AS INTEGER))
                 AS BIGINT)
                 + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 50) AS h
        FROM regs GROUP BY set_name),
      est AS (
        SELECT set_name,
               CAST(ROUND(718273.0 * 256.0 * 256.0 *
                 CAST(CAST(1 AS BIGINT) << 50 AS DOUBLE)
                 / CAST(h AS DOUBLE) / 1000000.0) AS BIGINT) AS hll_est
        FROM harm),
      inter AS (
        SELECT 'intersection' AS set_name,
               (SELECT hll_est FROM est WHERE set_name = 'a_urgent')
             + (SELECT hll_est FROM est WHERE set_name = 'b_highvalue')
             - (SELECT hll_est FROM est WHERE set_name = 'union')
               AS hll_est),
      est4 AS (SELECT * FROM est UNION ALL SELECT * FROM inter),
      exacts AS (
        SELECT 'a_urgent' AS set_name, COUNT(DISTINCT o_orderkey)
          AS exact_n FROM a
        UNION ALL
        SELECT 'b_highvalue', COUNT(DISTINCT o_orderkey) FROM b
        UNION ALL
        SELECT 'union', COUNT(DISTINCT o_orderkey)
        FROM (SELECT o_orderkey FROM a UNION ALL
              SELECT o_orderkey FROM b)
        UNION ALL
        SELECT 'intersection', COUNT(DISTINCT o_orderkey)
        FROM a WHERE o_orderkey IN (SELECT o_orderkey FROM b))
      SELECT e.set_name, x.exact_n, e.hll_est,
             CAST(ABS(e.hll_est - x.exact_n) AS DOUBLE)
               <= 0.2 * CAST(x.exact_n AS DOUBLE) AS within_20pct
      FROM est4 e JOIN exacts x USING (set_name)
      ORDER BY set_name"""))

  /** Partition-key advisor — the third layout planner next to
    * [[qAggRle]] (sort keys) and [[qJoinOrderAdvisor]] (join order):
    * for each candidate partition column of lineitem, report its
    * cardinality (= partition count), the EXPECTED SCAN FRACTION of
    * an equality-predicate query under value-weighted load
    * (Σ nᵥ² / N² — the probability mass a random row's key shares),
    * and the largest partition's share (skew). The advisor rule —
    * the lowest expected scan fraction among candidates with a
    * manageable partition count (ndv ≤ 4096) — is applied in-query
    * and emitted as a flag. Everything is exact integer arithmetic:
    * the sn2·10⁶ and nn² products evaluate in DECIMAL(38,0) with the
    * integral division on the decimals (safe to ~10¹³ rows — the
    * round-11 sf1 gate tripped the previous BIGINT headroom guard at
    * 6M rows, the same cliff [[graft.analytics.GraphQueries]]'
    * assortativity hit; headroom guards only move the cliff, exact
    * wide decimals remove it).
    *
    * Scale shape: one (column, value) rollup per candidate (four
    * narrow scans, map-side combined), then bounded per-candidate
    * algebra; the one-row choice scalar rides a broadcast cross
    * join. At 100 TB this runs on value-histogram metadata — the
    * same decision, no full scans. */
  val qAggPartitionAdvisor = Q(
    "q_agg_partition_advisor",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      def cand(name: String, c: Column) =
        li.groupBy(c.as("v")).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("ndv"), sum(col("n")).as("nn"),
            // one factor cast BEFORE multiplying: n*n in BIGINT wraps
            // silently past 2^63 on a ~3e9-row partition
            sum(expr("cast(n as decimal(25,0)) * n")).as("sn2"),
            max(col("n")).as("mx"))
          .select(lit(name).as("column_name"), col("ndv"), col("nn"),
            col("sn2"), col("mx"))
      val stats = cand("l_returnflag", col("l_returnflag"))
        .unionByName(cand("l_linestatus", col("l_linestatus")))
        .unionByName(cand("l_ship_month",
          date_trunc("month", col("l_shipdate"))))
        .unionByName(cand("l_suppkey_bucket", col("l_suppkey") % 64))
        .select(col("column_name"), col("ndv"),
          expr("(cast(sn2 as decimal(32,0)) * 1000000) DIV " +
            "(cast(nn as decimal(19,0)) * nn)").as("scan_frac_micro"),
          expr("(cast(mx as decimal(38,0)) * 1000000) DIV nn")
            .as("max_share_micro"))
      val best = stats.filter(col("ndv") <= 4096)
        .agg(min(col("scan_frac_micro")).as("best_frac"))
      stats.crossJoin(broadcast(best))
        .select(col("column_name"), col("ndv"),
          col("scan_frac_micro"), col("max_share_micro"),
          (col("ndv") <= 4096 &&
            col("scan_frac_micro") === col("best_frac"))
            .as("recommended"))
        .orderBy(col("column_name"))
    },
    Some("""
      WITH c1 AS (
        SELECT 'l_returnflag' AS column_name, COUNT(*) AS ndv,
               CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(CAST(n AS DECIMAL(25,0)) * n) AS DECIMAL(38,0))
                 AS sn2,
               CAST(MAX(n) AS BIGINT) AS mx
        FROM (SELECT l_returnflag AS v, COUNT(*) AS n
              FROM lineitem GROUP BY 1)),
      c2 AS (
        SELECT 'l_linestatus', COUNT(*),
               CAST(SUM(n) AS BIGINT),
               CAST(SUM(CAST(n AS DECIMAL(25,0)) * n) AS DECIMAL(38,0)),
               CAST(MAX(n) AS BIGINT)
        FROM (SELECT l_linestatus AS v, COUNT(*) AS n
              FROM lineitem GROUP BY 1)),
      c3 AS (
        SELECT 'l_ship_month', COUNT(*),
               CAST(SUM(n) AS BIGINT),
               CAST(SUM(CAST(n AS DECIMAL(25,0)) * n) AS DECIMAL(38,0)),
               CAST(MAX(n) AS BIGINT)
        FROM (SELECT date_trunc('month', l_shipdate) AS v, COUNT(*)
                AS n
              FROM lineitem GROUP BY 1)),
      c4 AS (
        SELECT 'l_suppkey_bucket', COUNT(*),
               CAST(SUM(n) AS BIGINT),
               CAST(SUM(CAST(n AS DECIMAL(25,0)) * n) AS DECIMAL(38,0)),
               CAST(MAX(n) AS BIGINT)
        FROM (SELECT l_suppkey % 64 AS v, COUNT(*) AS n
              FROM lineitem GROUP BY 1)),
      stats AS (
        -- HUGEINT, not DECIMAL: DuckDB's // on DECIMAL operands goes
        -- through decimal division and ROUNDS, while Spark's DIV on
        -- decimals floors — HUGEINT // is true integer floor division
        -- and mirrors the Spark decimal DIV exactly
        SELECT column_name, ndv,
               CAST((CAST(sn2 AS HUGEINT) * 1000000)
                 // (CAST(nn AS HUGEINT) * nn) AS BIGINT)
                 AS scan_frac_micro,
               CAST((CAST(mx AS HUGEINT) * 1000000) // nn
                 AS BIGINT) AS max_share_micro
        FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
              UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4)),
      best AS (
        SELECT MIN(scan_frac_micro) AS best_frac
        FROM stats WHERE ndv <= 4096)
      SELECT s.column_name, s.ndv, s.scan_frac_micro,
             s.max_share_micro,
             s.ndv <= 4096 AND s.scan_frac_micro = b.best_frac
               AS recommended
      FROM stats s CROSS JOIN best b
      ORDER BY s.column_name"""))

  /** Runtime-bloom semi-join reduction, oracle-gated — puts
    * [[graft.operators.BloomPrune]] (previously spec-only) under the
    * differential gate: lineitem is PRUNED by a bloom filter built
    * over the urgent orders' keys BEFORE the join, then joined and
    * aggregated into monthly revenue. The oracle is the PLAIN join —
    * the hash-match proves the prune LOSSLESS (a bloom has false
    * positives, never false negatives, and the inner equi-join on
    * the same keys absorbs the false positives), which is the entire
    * correctness contract of runtime filter pushdown. The filter
    * blob is engine-internal, so only the post-join result is gated;
    * the pruning RATE is measured by the probe.
    *
    * Scale shape: one distributed pass builds the fixed-size filter
    * (64 KB here, independent of build cardinality), the probe-side
    * scan evaluates might_contain inside codegen, and the join that
    * follows shuffles only surviving rows — the manual lever for
    * build sides above Catalyst's auto-injection threshold. */
  val qJoinBloomPrune = Q(
    "q_join_bloom_prune",
    (s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val pruned = graft.operators.BloomPrune.pruneByBloom(
        li, urgent, expectedItems = 70000L, numBits = 524288L,
        buildKeys = Seq(col("o_orderkey")),
        probeKeys = Seq(col("l_orderkey")))
      pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("month"))
    },
    Some("""
      SELECT date_trunc('month', o_orderdate) AS month,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4)))
               AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1 ORDER BY month"""))

  /** Exact multi-quantile profile per group — the five-point
    * (p25/p50/p75/p90/p99) price distribution table per return flag,
    * every cell an EXACT order statistic (value at rank
    * ⌈n·p/100⌉, all BIGINT — no interpolation, no sketch error):
    * the distribution card a data audit publishes next to
    * [[qQuantileSketch]]'s approximate path (GK, for when 1e-3
    * relative rank error is acceptable) and [[qAggRadixMedian]]'s
    * single median. The oracle is the rank definition itself
    * (ROW_NUMBER joined to the percentile grid), so the gate
    * certifies the radix plan against the naive sort.
    *
    * Scale shape: ONE [[graft.operators.OrderStatistics.radixRanks]]
    * pass — one bucket histogram per group locates ALL five crossing
    * buckets, one re-scan of their union walks the exact values; the
    * per-(group, pct) cumulative windows ride aggregated bounded
    * frames. A full five-point profile of 100 TB costs the same two
    * narrow scans as one median — never five sorts, never a ranked
    * window over raw rows. */
  val qAggExactQuantiles = Q(
    "q_agg_exact_quantiles",
    (s, dir) => {
      val x = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))
      graft.operators.OrderStatistics
        .radixRanks(x, Seq(25, 50, 75, 90, 99))
        .select(col("g").as("l_returnflag"), col("pct"), col("n"),
          col("value").as("value_c"))
        .orderBy(col("l_returnflag"), col("pct"))
    },
    Some("""
      WITH x AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
        FROM lineitem),
      r AS (
        SELECT g, c,
               CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY c)
                 AS BIGINT) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM x),
      p AS (SELECT CAST(UNNEST([25, 50, 75, 90, 99]) AS BIGINT) AS pct)
      SELECT r.g AS l_returnflag, p.pct, r.n, r.c AS value_c
      FROM r JOIN p ON r.rn = (r.n * p.pct + 99) // 100
      ORDER BY l_returnflag, pct"""))

  /** Weighted multi-quantile profile per group — "the price of the
    * p25/p50/p75/p90/p99 UNIT shipped" per return flag: each line
    * counts with its quantity weight, so the tails describe the
    * shipped VOLUME, not the line count ([[qStatsWmedian]]'s
    * estimator extended to the full five-point card). Every cell is
    * the exact value whose cumulative weight first reaches
    * ⌈W·p/100⌉ — all BIGINT, no interpolation. The oracle is the
    * definition itself (running-weight window + crossing rule).
    *
    * Scale shape: ONE
    * [[graft.operators.OrderStatistics.radixWeightedRanks]] pass —
    * one bucket WEIGHT histogram per group locates all five crossing
    * buckets, one re-scan of their union walks exact values; bounded
    * cumulative frames throughout, never a ranked window over raw
    * rows. */
  val qAggWeightedQuantiles = Q(
    "q_agg_weighted_quantiles",
    (s, dir) => {
      val m = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c"),
        expr("cast(round(l_quantity * 100) as bigint)").as("w"))
      graft.operators.OrderStatistics
        .radixWeightedRanks(m, Seq(25, 50, 75, 90, 99))
        .select(col("g").as("l_returnflag"), col("pct"),
          col("totw").as("total_weight"), col("value").as("value_c"))
        .orderBy(col("l_returnflag"), col("pct"))
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS w
        FROM lineitem),
      tot AS (SELECT g, CAST(SUM(w) AS BIGINT) AS tw FROM m GROUP BY g),
      r AS (
        SELECT g, v,
               CAST(SUM(w) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumw
        FROM m),
      p AS (SELECT CAST(UNNEST([25, 50, 75, 90, 99]) AS BIGINT) AS pct)
      SELECT r.g AS l_returnflag, p.pct, t.tw AS total_weight,
             MIN(r.v) AS value_c
      FROM r JOIN tot t USING (g) CROSS JOIN p
      WHERE r.cumw >= (t.tw * p.pct + 99) // 100
      GROUP BY r.g, p.pct, t.tw
      ORDER BY l_returnflag, pct"""))

  /** Sketch-vs-exact quantile evaluation — the accuracy-closure query
    * for the approximate path ([[qSimRecallEval]]'s "measure, don't
    * guess" pattern pointed at quantiles): the GK sketch's
    * p50/p90/p99 estimates are rank-checked against the SAME targets
    * [[qAggExactQuantiles]] computes exactly, in one gated table —
    * per (group, percentile): the exact order statistic
    * (hash-matched cell) and whether the sketch estimate's measured
    * rank sits inside its n/accuracy contract (|rank(est) −
    * ⌈n·p/100⌉| ≤ max(1, n/1000) + 1 — the [[qQuantileSketch]]
    * proven bound, emitted as a verdict the oracle mirrors with
    * literal trues). This is the table that justifies swapping
    * [[graft.operators.OrderStatistics.radixRanks]]'s two exact scans
    * for one sketch pass when 1e-3 rank error is acceptable — with
    * the error MEASURED on this corpus, not assumed.
    *
    * Scale shape: the exact side is one radixRanks pass (two narrow
    * scans); the sketch side is one aggregate plus one broadcast
    * rank-check scan; everything after is a ≤|groups|·3-row frame. */
  val qAggQuantileEval = Q(
    "q_agg_quantile_eval",
    (s, dir) => {
      val x = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))
      val exact = graft.operators.OrderStatistics
        .radixRanks(x, Seq(50, 90, 99))
        .select(col("g"), col("pct"), col("n"),
          col("value").as("exact_c"))
      val ap = x.groupBy(col("g")).agg(expr(
        "approx_percentile(c, array(0.5D, 0.9D, 0.99D), 1000)").as("ap"))
      val ranks = x.join(broadcast(ap), Seq("g"))
        .groupBy(col("g"))
        .agg(
          sum(when(col("c") <= element_at(col("ap"), 1), 1L)
            .otherwise(0L)).as("r50"),
          sum(when(col("c") <= element_at(col("ap"), 2), 1L)
            .otherwise(0L)).as("r90"),
          sum(when(col("c") <= element_at(col("ap"), 3), 1L)
            .otherwise(0L)).as("r99"))
        .select(col("g"), expr(
          "stack(3, 50L, r50, 90L, r90, 99L, r99) as (pct, apr)"))
      exact.join(ranks, Seq("g", "pct"))
        .select(col("g").as("l_returnflag"), col("pct"), col("n"),
          col("exact_c"),
          (abs(col("apr") - expr("(n * pct + 99) DIV 100")) <=
            greatest(lit(1L), expr("n DIV 1000")) + lit(1L))
            .as("approx_rank_ok"))
        .orderBy(col("l_returnflag"), col("pct"))
    },
    Some("""
      WITH x AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
        FROM lineitem),
      r AS (
        SELECT g, c,
               CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY c)
                 AS BIGINT) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM x),
      p AS (SELECT CAST(UNNEST([50, 90, 99]) AS BIGINT) AS pct)
      SELECT r.g AS l_returnflag, p.pct, r.n, r.c AS exact_c,
             TRUE AS approx_rank_ok
      FROM r JOIN p ON r.rn = (r.n * p.pct + 99) // 100
      ORDER BY l_returnflag, pct"""))

  /** Statistical MODE per group — the one classical aggregate the
    * family still lacked (exact percentile, median, MAD, and moments
    * all exist): the most frequent quantity per return flag, ties
    * broken toward the smallest value so the answer is total. Two
    * hash aggregates + one group-partitioned ranking window — the
    * exact-mode plan that scales (the naive approach collects value
    * lists). Also reports the runner-up and the mode's share, which
    * is what makes mode useful as a data-quality signal (a dominant
    * mode ⇒ a default-valued column). */
  val qAggMode = Q(
    "q_agg_mode",
    (s, dir) => {
      val counts = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          round(col("l_quantity")).cast("long").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("v"))
      val wAll = Window.partitionBy(col("l_returnflag"))
      counts
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .filter(col("rk") <= 2)
        .groupBy(col("l_returnflag"))
        .agg(max(when(col("rk") === 1, col("v"))).as("mode_v"),
          max(when(col("rk") === 1, col("cnt"))).as("mode_n"),
          max(when(col("rk") === 2, col("v"))).as("runner_up_v"),
          max(col("n")).as("n_rows"))
        .select(col("l_returnflag"), col("mode_v"), col("mode_n"),
          col("runner_up_v"), col("n_rows"),
          round(col("mode_n").cast("double") /
            col("n_rows").cast("double"), 6).as("mode_share"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH counts AS (
        SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS v,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2),
      ranked AS (
        SELECT l_returnflag, v, cnt,
               CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                 ORDER BY cnt DESC, v) AS BIGINT) AS rk,
               CAST(SUM(cnt) OVER (PARTITION BY l_returnflag)
                 AS BIGINT) AS n
        FROM counts)
      SELECT l_returnflag,
             MAX(CASE WHEN rk = 1 THEN v END) AS mode_v,
             MAX(CASE WHEN rk = 1 THEN cnt END) AS mode_n,
             MAX(CASE WHEN rk = 2 THEN v END) AS runner_up_v,
             MAX(n) AS n_rows,
             ROUND(CAST(MAX(CASE WHEN rk = 1 THEN cnt END) AS DOUBLE)
               / CAST(MAX(n) AS DOUBLE), 6) AS mode_share
      FROM ranked WHERE rk <= 2
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Order→ship lead time — the logistics latency readout: days from
    * order placement to each line's ship date, per priority class:
    * count, exact mean (micro), exact LOWER-MEDIAN order statistic,
    * and the p95 rank statistic — the SLA table that tells whether
    * priority classes actually ship faster. One fact-to-dimension
    * join (orders broadcast-ready), day arithmetic in exact integers.
    *
    * Scale shape: one join keyed on orderkey (Catalyst picks SMJ or
    * broadcast by size), then ONE (priority, days) rollup — lead
    * times are a SMALL-DOMAIN integer (TPC-H ships within ~4 months),
    * so the exact median and p95 both fall out of a cumulative walk
    * over the ≤ 5×~125-row histogram: map-side-combined counts, a
    * bounded-frame window, never a rank over raw join output (the
    * pre-round-10 plan ranked the full fact join in one 5-value
    * priority window — a ≤5-reducer funnel at 100× scale, the
    * round-9 plan-audit finding). The oracle keeps the naive
    * ROW_NUMBER definition, so the gate certifies histogram ≡ rank.
    * For wide/unbounded value domains the same swap is
    * [[graft.operators.OrderStatistics.radixLowerMedian]]'s two-pass
    * radix walk. */
  val qJoinLeadTime = Q(
    "q_join_lead_time",
    (s, dir) => {
      val lead = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("g"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("days"))
      val hist = lead.groupBy(col("g"), col("days"))
        .agg(count(lit(1)).as("cnt"))
      val wC = Window.partitionBy(col("g")).orderBy(col("days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("g"))
      hist
        .withColumn("cum", sum(col("cnt")).over(wC))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .withColumn("sd", sum(col("days") * col("cnt")).over(wAll))
        .withColumn("kmed", expr("(n + 1) DIV 2"))
        .withColumn("kp95", expr("(n * 19 + 19) DIV 20"))
        .withColumn("is_med", col("cum") >= col("kmed") &&
          col("cum") - col("cnt") < col("kmed"))
        .withColumn("is_p95", col("cum") >= col("kp95") &&
          col("cum") - col("cnt") < col("kp95"))
        .filter(col("is_med") || col("is_p95"))
        .groupBy(col("g"))
        .agg(max(col("n")).as("n_lines"),
          max(col("sd")).as("sd"),
          max(when(col("is_med"), col("days"))).as("median_days"),
          max(when(col("is_p95"), col("days"))).as("p95_days"))
        .select(col("g").as("o_orderpriority"), col("n_lines"),
          round(col("sd").cast("double") / col("n_lines").cast("double"),
            6).as("mean_days"),
          col("median_days"), col("p95_days"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      WITH lead AS (
        SELECT o_orderpriority AS g,
               DATE_DIFF('day', o_orderdate, l_shipdate) AS days,
               l_orderkey, l_shipdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      ranked AS (
        SELECT g, days,
               CAST(ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY days, l_orderkey, l_shipdate) AS BIGINT)
                 AS rk,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n,
               CAST(SUM(days) OVER (PARTITION BY g) AS BIGINT) AS sd
        FROM lead)
      SELECT g AS o_orderpriority, MAX(n) AS n_lines,
             ROUND(CAST(MAX(sd) AS DOUBLE) / CAST(MAX(n) AS DOUBLE),
               6) AS mean_days,
             MAX(CASE WHEN rk = (n + 1) // 2 THEN days END)
               AS median_days,
             MAX(CASE WHEN rk = (n * 19 + 19) // 20 THEN days END)
               AS p95_days
      FROM ranked
      WHERE rk = (n + 1) // 2 OR rk = (n * 19 + 19) // 20
      GROUP BY g
      ORDER BY o_orderpriority"""))

  /** Registry consumed by SparkEntry: this object's own families plus
    * the round-10 sibling family objects (split along the --families
    * seams; same queries, same count pin). */
  val all: Seq[Q] = Seq(qAggPricing,
    qDistinctAgg,
    qRollup,
    qGroupingSets,
    qAggStats,
    qSubqueries,
    qSubqueryCorrelated,
    qHllDistinct,
    qQuantileSketch,
    qJoinRegionRevenue,
    qJoinSemi,
    qJoinAnti,
    qJoinLeftOuter,
    qJoinFullOuter,
    qAggStringAgg,
    qThetaJoin,
    qRangeJoin,
    qJoinLateral,
    qAsofJoin,
    qAsofTolerance,
    qTopkPerCustomer,
    qWindowRangeFrame,
    qSortLimit,
    qSetopsNations,
    qSetOpsBag,
    qJsonEvents,
    qDnsBind9Events,
    qCube,
    qPercentile,
    qSaltedAgg,
    qJoinSalted,
    qPivot,
    qUnpivot,
    qAggReaggregate,
    qAggIvm, qAggJoinIvm,
    qEventsHistogram,
    qJoinInterval,
    qJoinExistsMulti,
    qAggLargeOrders,
    qAggBasket,
    qAggBitmapDistinct,
    qAsofNearest,
    qSkylineSuppliers,
    qAggRle,
    qAggRadixMedian,
    qJoinOrderAdvisor,
    qHllSetops,
    qAggPartitionAdvisor,
    qJoinBloomPrune,
    qAggMode,
    qJoinLeadTime,
    qAggExactQuantiles,
    qAggWeightedQuantiles,
    qAggQuantileEval) ++
    StatsQueries.all ++ TsQueries.all ++ WindowQueries.all ++
    Scd2Queries.all ++ ScalarQueries.all
}
