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

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact double sum: accumulate as DECIMAL(25,scale), emit double. */
  private def dsum(c: Column, scale: Int = 4): Column =
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

  /** Analytic window: per-user running sum (exact decimal) + lag. */
  val qWindowRunning = Q(
    "q_window_running",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(
          col("user_id"), col("event_id"), col("ts"), col("value"),
          sum(col("value").cast(DecimalType(25, 6))).over(frame)
            .cast("double").as("running_value"),
          lag(col("value"), 1).over(w).as("prev_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id, ts, value,
             CAST(SUM(CAST(value AS DECIMAL(25,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_value,
             LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_value
      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events) e
      ORDER BY user_id, ts, event_id"""))

  /** The full ranking-function family in one pass (unique tie-break →
    * deterministic; percent_rank/cume_dist are exact rationals). */
  val qWindowRanks = Q(
    "q_window_ranks",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_mktsegment,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             PERCENT_RANK() OVER w AS prnk,
             CUME_DIST() OVER w AS cdist,
             NTILE(4) OVER w AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_custkey"""))

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

  /** Tumbling event-time window (Spark `window()`; DuckDB date_trunc
    * is the equivalent hour bucketing). */
  val qWindowHourly = Q(
    "q_window_hourly",
    (s, dir) => {
      val ev = t(s, dir, "events")
      ev.groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
        .select(col("w.start").as("bucket"), col("n"), col("sum_value"))
        .orderBy(col("bucket"))
    },
    Some("""
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1 ORDER BY bucket"""))

  /** HOPPING (sliding) time windows — Spark's native
    * `window(ts, "1 hour", "15 minutes")`: every event lands in the 4
    * overlapping hour-wide windows that cover it, the smoothing
    * tumbling buckets can't give (a burst straddling a tumbling
    * boundary splits; a hop sees it whole). Gated against the manual
    * replay: each event explodes into its 4 covering window starts
    * (bucket arithmetic on epoch micros — exact integers), so the
    * hash-match proves the native operator's window assignment
    * bit-for-bit. Same decimal-exact value sums as [[qWindowHourly]].
    *
    * Scale shape: the native operator plans the 4× explode inside the
    * aggregate's partial side — one exchange on (window, nothing
    * else), fan-out bounded by window/slide = 4. */
  val qWindowSliding = Q(
    "q_window_sliding",
    (s, dir) => {
      val ev = t(s, dir, "events")
      ev.groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
        .select(col("w.start").as("bucket"), col("n"), col("sum_value"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH e AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        FROM events),
      hops AS (
        SELECT make_timestamp((us // 900000000) * 900000000
                              - k * 900000000) AS bucket,
               value
        FROM e CROSS JOIN generate_series(0, 3) t(k))
      SELECT bucket, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
               AS sum_value
      FROM hops GROUP BY bucket ORDER BY bucket"""))

  /** Navigation window functions — lead, first/last value, nth value —
    * over per-user event streams, with explicit ROWS frames (the
    * default RANGE frame makes last_value the current row, a classic
    * correctness trap both engines share; stating the frame makes the
    * intent portable). Unique (ts, event_id) tie-break keeps every
    * navigation deterministic. One user-keyed window partition — the
    * same single-exchange shape as the sibling window queries. */
  val qWindowNavigation = Q(
    "q_window_navigation",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val upToHere = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fromHere = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev.select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          first(col("event_type")).over(upToHere).as("first_type"),
          last(col("event_type")).over(fromHere).as("last_type"),
          nth_value(col("event_type"), 2).over(upToHere).as("second_type"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id, ts, event_type,
             LEAD(event_type, 1) OVER w AS next_type,
             FIRST_VALUE(event_type) OVER (w ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS first_type,
             LAST_VALUE(event_type) OVER (w ROWS BETWEEN CURRENT ROW
               AND UNBOUNDED FOLLOWING) AS last_type,
             NTH_VALUE(event_type, 2) OVER (w ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS second_type
      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   event_type
            FROM events) e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, ts, event_id"""))

  /** Distribution window functions — ntile / percent_rank / cume_dist
    * — the statistical third of the window family next to ranking and
    * navigation: quartile bucketing and within-group percentile
    * position over order values per priority class (what "price
    * percentile within its priority tier" reports). ntile assigns by
    * ROW POSITION, so a non-unique ordering would be engine-dependent
    * — the (o_totalprice, o_orderkey) composite makes every position
    * (and thus every bucket edge) deterministic in both engines.
    * percent_rank and cume_dist are exact integer ratios divided once
    * in double; rounded to 6dp per the parity rule. Five coarse
    * partitions at 100 TB would skew one task each — the partition
    * key's cardinality is the scale lever, and the plan still carries
    * exactly one exchange (the sibling-window shape PlanAuditSpec
    * pins). */
  val qWindowDistribution = Q(
    "q_window_distribution",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cum_dist"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             NTILE(4) OVER w AS quartile,
             ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
             ROUND(CUME_DIST() OVER w, 6) AS cum_dist
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey"""))

  /** Batch sessionization: gap-based sessions (30-minute inactivity
    * timeout) via the classic two-window pattern — a lag() flags
    * session starts, a running sum numbers them, a groupBy rolls each
    * session up. The batch twin of the streaming sessionizers
    * (`dns/Sessions.scala`), and the one that CAN hash-match an
    * oracle (streaming state ops cannot).
    *
    * Scale shape: ONE shuffle. Both windows and the final aggregate
    * key on user_id (the aggregate on (user_id, session_idx), whose
    * clustering the user_id hash partitioning already satisfies), so
    * Catalyst plans a single hash exchange for the whole chain —
    * PlanAuditSpec pins that. Gap compares use exact integer
    * microseconds (`unix_micros`/`epoch_us`) — the events timestamps
    * carry sub-second precision, and float epoch seconds would
    * disagree across engines at session boundaries; the value rollup
    * accumulates in DECIMAL (parity rule: decimal sums). */
  val qSessionizeBatch = Q(
    "q_sessionize_batch",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev
        .withColumn("new_s",
          when(col("us") - lag(col("us"), 1).over(w) <= 1800L * 1000000L,
            lit(0L)).otherwise(lit(1L)))
        .withColumn("session_idx", sum(col("new_s")).over(frame))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(col("value").cast(DecimalType(25, 6))).cast("double")
            .as("session_value"))
        .orderBy(col("user_id"), col("session_idx"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
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
        FROM f)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             COUNT(*) AS n_events,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
               AS session_value
      FROM s GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""))

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

  /** Time-series gap fill — densify each event type's hourly series
    * over its own observed span: missing hours materialize with a
    * zero count and the last observed hourly average carried forward
    * (the dashboard/feature-store densification step; ~6% of hours
    * are genuinely absent in the fixture). The grid is a per-group
    * sequence-explode between that group's min and max hour — never a
    * global calendar — and the fill is one partitioned running
    * last-ignore-nulls window, so the whole query shuffles only on
    * event_type. Ratio parity discipline: the hourly average divides
    * exact integer micro-units once in double and rounds at 6. */
  val qTsGapfill = Q(
    "q_ts_gapfill",
    (s, dir) => {
      val hourly = t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(value * 1000000) as bigint)")).as("vm"))
      val grid = hourly.groupBy(col("event_type"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("event_type"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          round(last(expr("vm / (n * 1e6)"), ignoreNulls = true)
            .over(w), 6).as("avg_value_filled"),
          col("n").isNull.as("is_gap"))
        .orderBy(col("event_type"), col("h"))
    },
    Some("""
      WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n,
               SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS vm
        FROM events GROUP BY 1, 2),
      spans AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
                FROM hourly GROUP BY 1),
      grid AS (
        SELECT event_type,
               unnest([x for x in
                       generate_series(h0, h1, INTERVAL 1 HOUR)]) AS h
        FROM spans),
      j AS (SELECT g.event_type, g.h, hr.n, hr.vm
            FROM grid g LEFT JOIN hourly hr USING (event_type, h))
      SELECT event_type, h,
             COALESCE(n, 0) AS n_events,
             ROUND(LAST_VALUE(vm / (n * 1000000.0) IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS avg_value_filled,
             n IS NULL AS is_gap
      FROM j ORDER BY event_type, h"""))

  // ---------------------------------------------------------------
  // Scalar function families
  // ---------------------------------------------------------------

  /** String family: upper/lower/length/substr/replace/concat. */
  val qScalarString = Q(
    "q_scalar_string",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          concat(col("p_brand"), lit("#"), col("p_size").cast("string"))
            .as("brand_size"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             UPPER(p_name) AS uname,
             LOWER(p_brand) AS lbrand,
             LENGTH(p_name) AS name_len,
             SUBSTR(p_type, 1, 5) AS type5,
             REPLACE(p_name, ' ', '_') AS snake,
             p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size
      FROM part ORDER BY p_partkey"""))

  /** Date family: extract/trunc/diff, long-typed both sides. */
  val qScalarDate = Q(
    "q_scalar_date",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
            .cast("long").as("days_since_95"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             YEAR(o_orderdate) AS yr,
             MONTH(o_orderdate) AS mo,
             DAY(o_orderdate) AS dom,
             date_trunc('month', o_orderdate) AS month_start,
             date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_95
      FROM orders ORDER BY o_orderkey"""))

  /** Calendar-interval family — the engine-switch hazards
    * [[qScalarDate]]'s extraction functions don't touch: month
    * arithmetic with end-of-month CLAMPING (add_months — both engines
    * clamp Jan 31 + 1 month to Feb 29/28, pinned here), last_day,
    * quarter truncation/extraction, ISO week-of-year, and day-of-week
    * NUMBERING — Spark's dayofweek is 1-based Sunday-first while
    * DuckDB's dayofweek is 0-based, so the query ships Spark's value
    * minus 1 and the oracle states DuckDB's directly: the off-by-one
    * every cross-engine port hits, made a gated contract. */
  val qScalarInterval = Q(
    "q_scalar_interval",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          add_months(col("o_orderdate"), 3).as("plus_3mo"),
          last_day(col("o_orderdate")).as("month_end"),
          date_trunc("quarter", col("o_orderdate")).as("quarter_start"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
             last_day(CAST(o_orderdate AS DATE)) AS month_end,
             date_trunc('quarter', o_orderdate) AS quarter_start,
             CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
             CAST(dayofweek(o_orderdate) AS BIGINT) AS dow
      FROM orders ORDER BY o_orderkey"""))

  /** Math family (IEEE-exact ops only — no libm divergence). */
  val qScalarMath = Q(
    "q_scalar_math",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"),
          sqrt(col("l_quantity")).as("sq"),
          abs(col("l_discount") - lit(0.05)).as("disc_gap"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          (col("l_orderkey") % 7).as("key_mod"))
        .orderBy(col("l_orderkey")),
    Some("""
      SELECT l_orderkey,
             SQRT(l_quantity) AS sq,
             ABS(l_discount - 0.05) AS disc_gap,
             CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
             l_orderkey % 7 AS key_mod
      FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey"""))

  /** Bitwise scalar family — AND/OR/XOR, shifts, popcount, and the
    * pack-two-ints-into-one-key trick ([[qStatsGini]]'s composite
    * encoding as a gated scalar): the integer-bit toolbox behind
    * bitmap indexes ([[qAggBitmapDistinct]]), SimHash/pHash Hamming
    * distances, and bucket-id packing. Spark's `^`/`&`/`|`/`shiftleft`
    * and DuckDB's `xor()`/`&`/`|`/`<<` must agree bit-for-bit on
    * BIGINT for every one of those operators to gate — this query
    * pins that contract directly. */
  val qScalarBitwise = Q(
    "q_scalar_bitwise",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"),
          (col("l_orderkey").bitwiseAND(col("l_partkey"))).as("k_and"),
          (col("l_orderkey").bitwiseOR(col("l_partkey"))).as("k_or"),
          (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("k_xor"),
          expr("shiftleft(l_suppkey, 20)").as("k_shl"),
          expr("shiftright(l_partkey, 3)").as("k_shr"),
          expr("cast(bit_count(l_orderkey ^ l_partkey) as bigint)")
            .as("hamming"),
          expr("l_partkey * 1048576 + l_suppkey").as("packed"))
        .orderBy(col("l_orderkey")),
    Some("""
      SELECT l_orderkey,
             l_orderkey & l_partkey AS k_and,
             l_orderkey | l_partkey AS k_or,
             xor(l_orderkey, l_partkey) AS k_xor,
             l_suppkey << 20 AS k_shl,
             l_partkey >> 3 AS k_shr,
             CAST(bit_count(xor(l_orderkey, l_partkey)) AS BIGINT)
               AS hamming,
             l_partkey * 1048576 + l_suppkey AS packed
      FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey"""))

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

  /** Regex family (patterns kept in the Java∩RE2 common subset so both
    * engines agree). */
  val qScalarRegex = Q(
    "q_scalar_regex",
    (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").rlike("a[a-z]*e"))
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+) ", 1).as("first_word"),
          size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0)))
            .cast("long").as("n_vowels"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("masked_type"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             regexp_extract(p_name, '([a-z]+) ', 1) AS first_word,
             len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
             regexp_replace(p_type, '[AEIOU]', '_', 'g') AS masked_type
      FROM part
      WHERE regexp_matches(p_name, 'a[a-z]*e')
      ORDER BY p_partkey"""))

  /** Conditional family: CASE, NULLIF, COALESCE, LEAST/GREATEST. */
  val qScalarConditional = Q(
    "q_scalar_conditional",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000, lit("large"))
            .when(col("o_totalprice") > 100000, lit("medium"))
            .otherwise(lit("small")).as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_label"),
          least(col("o_totalprice"), lit(150000.0)).as("capped"),
          greatest(col("o_totalprice") - 150000.0, lit(0.0)).as("excess"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 200000 THEN 'large'
                  WHEN o_totalprice > 100000 THEN 'medium'
                  ELSE 'small' END AS bucket,
             COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
             LEAST(o_totalprice, 150000.0) AS capped,
             GREATEST(o_totalprice - 150000.0, 0.0) AS excess
      FROM orders ORDER BY o_orderkey"""))

  /** NULL semantics — the #1 cross-engine hazard a user switching
    * engines hits: COUNT(*) vs COUNT(col) vs COUNT(DISTINCT col) over
    * nulls, SUM/MIN over an all-NULL group returning NULL (never 0),
    * NULL group keys collapsing into one group, null-safe equality
    * (Spark `<=>` = SQL IS NOT DISTINCT FROM), and NULL SORT ORDER —
    * Spark defaults to NULLS FIRST ascending while DuckDB defaults to
    * NULLS LAST, so the oracle pins NULLS FIRST explicitly; leaving
    * either default implicit is exactly the silent-divergence this
    * query exists to catch. Nulls are synthesized deterministically
    * (o_orderkey mod patterns) since TPC-H data carries none. Money
    * sums ride integer cents (micro-unit parity rule). */
  val qScalarNullSemantics = Q(
    "q_scalar_null_semantics",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(
          when(col("o_orderkey") % 5 === 0, lit(null))
            .otherwise(col("o_orderpriority")).as("nk"),
          // round BEFORE the long cast: Spark's double→long cast
          // truncates while DuckDB's rounds, and 123.45·100 lands a
          // hair under the integer — scale-0 round is parity-safe
          when(col("o_orderkey") % 7 === 0, lit(null))
            .otherwise(round(col("o_totalprice") * 100).cast("long"))
            .as("cents"),
          when(col("o_orderkey") % 3 === 0, lit(null))
            .otherwise(col("o_orderstatus")).as("ns"))
      o.groupBy(col("nk"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("cents")).as("n_priced"),
          count_distinct(col("ns")).as("n_status"),
          sum(when(col("ns").isNull && col("nk").isNull, col("cents")))
            .as("allnull_sum"),
          sum(col("cents")).as("sum_cents"),
          min(col("ns")).as("min_status"),
          sum((col("ns") <=> col("nk")).cast("long")).as("n_nullsafe_eq"))
        .orderBy(asc_nulls_first("nk"))
    },
    Some("""
      SELECT nk,
             COUNT(*) AS n_rows,
             COUNT(cents) AS n_priced,
             COUNT(DISTINCT ns) AS n_status,
             CAST(SUM(CASE WHEN ns IS NULL AND nk IS NULL THEN cents END)
               AS BIGINT) AS allnull_sum,
             CAST(SUM(cents) AS BIGINT) AS sum_cents,
             MIN(ns) AS min_status,
             CAST(SUM(CASE WHEN ns IS NOT DISTINCT FROM nk
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq
      FROM (
        SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_orderpriority END AS nk,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT)
               END AS cents,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE o_orderstatus END AS ns
        FROM orders)
      GROUP BY nk
      ORDER BY nk NULLS FIRST"""))

  /** Array family over split words (slice / element access / contains /
    * negative indexing — DuckDB list ops mirror Spark array ops). */
  val qScalarArray = Q(
    "q_scalar_array",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(
          col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          element_at(col("ws"), 1).as("first_word"),
          element_at(col("ws"), -1).as("last_word"),
          array_join(slice(col("ws"), 1, 3), " ").as("first3"),
          array_contains(col("ws"), "spark").as("has_spark"),
          array_position(col("ws"), "the").cast("long").as("the_pos"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             len(ws) AS n_words,
             ws[1] AS first_word,
             ws[-1] AS last_word,
             array_to_string(list_slice(ws, 1, 3), ' ') AS first3,
             list_contains(ws, 'spark') AS has_spark,
             COALESCE(list_position(ws, 'the'), 0) AS the_pos
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d
      ORDER BY doc_id"""))

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
        .orderBy(col("l_orderkey"), col("measure")),
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
      ORDER BY l_orderkey, measure"""))

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
  /** The SCD2 island pass shared by the from-scratch build and the
    * incremental merge: collapse an order set into per-customer runs
    * (version 1..n dense, status, valid_from, n_orders). One
    * customer-keyed exchange carries both windows and the island
    * group-by. */
  private[analytics] def scd2Runs(o: DataFrame): DataFrame = {
    val wSeq = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_orderstatus"))
      .withColumn("chg",
        when(lag(col("o_orderstatus"), 1).over(wSeq).isNull ||
          lag(col("o_orderstatus"), 1).over(wSeq) =!= col("o_orderstatus"),
          lit(1L)).otherwise(lit(0L)))
      .withColumn("version", sum(col("chg")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("o_custkey"), col("version"))
      .agg(max(col("o_orderstatus")).as("status"),
        min(col("o_orderdate")).as("valid_from"),
        count(lit(1)).as("n_orders"))
  }

  /** Close intervals and mark the current row — the final projection
    * both SCD2 queries share. */
  private def scd2Close(islands: DataFrame): DataFrame = {
    val wVer = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("o_custkey"), col("version"), col("status"),
        col("valid_from"), col("valid_to"), col("is_current"),
        col("n_orders"))
      .orderBy(col("o_custkey"), col("version"))
  }

  val qScd2Orders = Q(
    "q_scd2_orders",
    (s, dir) =>
      scd2Close(scd2Runs(t(s, dir, "orders").filter(col("o_custkey") < 300))),
    Some("""
      WITH flagged AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
               CASE WHEN LAG(o_orderstatus, 1) OVER w IS NULL
                      OR LAG(o_orderstatus, 1) OVER w <> o_orderstatus
                    THEN 1 ELSE 0 END AS chg
        FROM orders WHERE o_custkey < 300
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)),
      versioned AS (
        SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS version
        FROM flagged),
      islands AS (
        SELECT o_custkey, version, MAX(o_orderstatus) AS status,
               MIN(o_orderdate) AS valid_from, COUNT(*) AS n_orders
        FROM versioned GROUP BY o_custkey, version)
      SELECT o_custkey, version, status, valid_from,
             LEAD(valid_from, 1) OVER (PARTITION BY o_custkey
               ORDER BY version) AS valid_to,
             LEAD(valid_from, 1) OVER (PARTITION BY o_custkey
               ORDER BY version) IS NULL AS is_current,
             n_orders
      FROM islands ORDER BY o_custkey, version"""))

  /** Incremental SCD2 maintenance (incremental view maintenance for
    * the dimension build): merge a DELTA batch of orders (arriving
    * strictly after the cutoff) into the already-built dimension
    * WITHOUT re-deriving closed history from the base fact table.
    * The merge re-reads only (a) the existing interval table — small,
    * it's the dimension — and (b) the delta: the open interval either
    * absorbs the delta's first run (same status → n_orders adds,
    * valid_from keeps) or closes against it, and later delta runs
    * append with shifted versions; untouched customers pass through.
    *
    * The gate is the strongest one available: the oracle is the FULL
    * RECOMPUTE over base+delta (q_scd2_orders' SQL verbatim), so the
    * hash-match proves incremental ≡ from-scratch on every row. The
    * delta-after-base date split means the (o_orderdate, o_orderkey)
    * total order never interleaves across the boundary — the property
    * that makes run-merge arithmetic exact.
    *
    * Scale shape: the base fact scan happens once to stand up the
    * dimension (self-contained like the stored-index queries); the
    * merge itself joins interval-table-sized frames on o_custkey and
    * shuffles the DELTA only — at 100 TB the daily cost is
    * |delta| + |dimension|, never |history|. */
  val qScd2Incremental = Q(
    "q_scd2_incremental",
    (s, dir) => {
      val cutoff = lit("2000-01-01").cast("timestamp")
      val o = t(s, dir, "orders").filter(col("o_custkey") < 300)
      val runsB = scd2Runs(o.filter(col("o_orderdate") < cutoff))
      val runsD = scd2Runs(o.filter(col("o_orderdate") >= cutoff))
        .withColumnRenamed("version", "dver")
      val wMax = Window.partitionBy(col("o_custkey"))
      val basePlus = runsB.withColumn("maxv", max(col("version")).over(wMax))
      val closed = basePlus.filter(col("version") < col("maxv"))
        .select(col("o_custkey"), col("version"), col("status"),
          col("valid_from"), col("n_orders"))
      val open = basePlus.filter(col("version") === col("maxv"))
        .select(col("o_custkey"), col("version"), col("status"),
          col("valid_from"), col("n_orders"))
      val dfirst = runsD.filter(col("dver") === 1)
        .select(col("o_custkey"), col("status").as("d1status"),
          col("n_orders").as("d1n"))
      // per-customer merge flag: does the delta's first run continue
      // the open interval's status?
      val flags = dfirst.join(open.select(col("o_custkey"),
          col("version").as("bver"), col("status").as("bstatus")),
          Seq("o_custkey"), "left")
        .select(col("o_custkey"), col("bver"),
          coalesce(col("d1status") === col("bstatus"), lit(false))
            .as("fm"), col("d1n"))
      val openAdj = open.join(flags.select(col("o_custkey"), col("fm"),
          col("d1n")), Seq("o_custkey"), "left")
        .select(col("o_custkey"), col("version"), col("status"),
          col("valid_from"),
          when(coalesce(col("fm"), lit(false)),
            col("n_orders") + col("d1n")).otherwise(col("n_orders"))
            .as("n_orders"))
      val appended = runsD.join(flags.select(col("o_custkey"), col("bver"),
          col("fm")), Seq("o_custkey"))
        .filter(!(col("dver") === 1 && col("fm")))
        .select(col("o_custkey"),
          (coalesce(col("bver"), lit(0L)) + col("dver") -
            when(col("fm"), 1L).otherwise(0L)).as("version"),
          col("status"), col("valid_from"), col("n_orders"))
      scd2Close(closed.unionByName(openAdj).unionByName(appended))
    },
    // the full-recompute oracle: incremental must equal from-scratch
    qScd2Orders.oracle)

  /** Column profiling / data-quality audit over `orders`: per-column
    * null count, approximate-free exact distinct count, and min/max
    * rendered to text — the long-format profile a warehouse emits
    * before accepting a feed.
    *
    * Scale shape: the multi-distinct aggregate computes all counts
    * plus every PRIMITIVE-buffered min/max in a single scan (Spark's
    * expand-based multi-distinct, 7× row expand, one parquet pass),
    * and the long format is a driver-free `stack` over the one-row
    * result. The four STRING min/max aggregates (status/priority)
    * deliberately live in a second tiny aggregate cross-joined back:
    * a string buffer anywhere in the multi-distinct aggregate forces
    * the whole 7×-expanded stream through interpreted SortAggregate
    * (no UnsafeRow mutable field for strings) — measured 15× slower
    * at sf0.1 (4.4 s → 0.28 s warm). Two scans of the footer-pruned
    * parquet beat one interpreted megapass at every scale. Min/max of
    * doubles/timestamps render through explicit DECIMAL/formatted
    * casts so both engines print identical text. */
  val qStatsProfile = Q(
    "q_stats_profile",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def nNull(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
      val agg1 = o.agg(
        count(lit(1)).as("n_rows"),
        nNull("o_orderkey").as("nn_orderkey"),
        countDistinct(col("o_orderkey")).as("nd_orderkey"),
        min(col("o_orderkey")).cast("string").as("mn_orderkey"),
        max(col("o_orderkey")).cast("string").as("mx_orderkey"),
        nNull("o_custkey").as("nn_custkey"),
        countDistinct(col("o_custkey")).as("nd_custkey"),
        min(col("o_custkey")).cast("string").as("mn_custkey"),
        max(col("o_custkey")).cast("string").as("mx_custkey"),
        nNull("o_orderstatus").as("nn_status"),
        countDistinct(col("o_orderstatus")).as("nd_status"),
        nNull("o_totalprice").as("nn_price"),
        countDistinct(col("o_totalprice")).as("nd_price"),
        min(col("o_totalprice")).cast(DecimalType(18, 2)).cast("string")
          .as("mn_price"),
        max(col("o_totalprice")).cast(DecimalType(18, 2)).cast("string")
          .as("mx_price"),
        nNull("o_orderdate").as("nn_date"),
        countDistinct(col("o_orderdate")).as("nd_date"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("mn_date"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("mx_date"),
        nNull("o_orderpriority").as("nn_prio"),
        countDistinct(col("o_orderpriority")).as("nd_prio"))
      val agg2 = o.agg(
        min(col("o_orderstatus")).as("mn_status"),
        max(col("o_orderstatus")).as("mx_status"),
        min(col("o_orderpriority")).as("mn_prio"),
        max(col("o_orderpriority")).as("mx_prio"))
      val agg = agg1.crossJoin(agg2)
      agg.select(col("n_rows"), expr(
        """stack(6,
           'o_custkey', nn_custkey, nd_custkey, mn_custkey, mx_custkey,
           'o_orderdate', nn_date, nd_date, mn_date, mx_date,
           'o_orderkey', nn_orderkey, nd_orderkey, mn_orderkey, mx_orderkey,
           'o_orderpriority', nn_prio, nd_prio, mn_prio, mx_prio,
           'o_orderstatus', nn_status, nd_status, mn_status, mx_status,
           'o_totalprice', nn_price, nd_price, mn_price, mx_price)
           AS (col_name, n_null, n_distinct, min_val, max_val)"""))
        .select(col("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
        .orderBy(col("col_name"))
    },
    Some("""
      WITH a AS (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_orderkey,
               COUNT(DISTINCT o_orderkey) AS nd_orderkey,
               CAST(MIN(o_orderkey) AS VARCHAR) AS mn_orderkey,
               CAST(MAX(o_orderkey) AS VARCHAR) AS mx_orderkey,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_custkey,
               COUNT(DISTINCT o_custkey) AS nd_custkey,
               CAST(MIN(o_custkey) AS VARCHAR) AS mn_custkey,
               CAST(MAX(o_custkey) AS VARCHAR) AS mx_custkey,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_status,
               COUNT(DISTINCT o_orderstatus) AS nd_status,
               MIN(o_orderstatus) AS mn_status,
               MAX(o_orderstatus) AS mx_status,
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_price,
               COUNT(DISTINCT o_totalprice) AS nd_price,
               CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn_price,
               CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx_price,
               CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_date,
               COUNT(DISTINCT o_orderdate) AS nd_date,
               strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn_date,
               strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx_date,
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_prio,
               COUNT(DISTINCT o_orderpriority) AS nd_prio,
               MIN(o_orderpriority) AS mn_prio,
               MAX(o_orderpriority) AS mx_prio
        FROM orders)
      SELECT col_name, n_rows, n_null, n_distinct, min_val, max_val FROM (
        SELECT 'o_custkey' AS col_name, n_rows, nn_custkey AS n_null,
               nd_custkey AS n_distinct, mn_custkey AS min_val,
               mx_custkey AS max_val FROM a
        UNION ALL
        SELECT 'o_orderdate', n_rows, nn_date, nd_date, mn_date, mx_date FROM a
        UNION ALL
        SELECT 'o_orderkey', n_rows, nn_orderkey, nd_orderkey, mn_orderkey,
               mx_orderkey FROM a
        UNION ALL
        SELECT 'o_orderpriority', n_rows, nn_prio, nd_prio, mn_prio,
               mx_prio FROM a
        UNION ALL
        SELECT 'o_orderstatus', n_rows, nn_status, nd_status, mn_status,
               mx_status FROM a
        UNION ALL
        SELECT 'o_totalprice', n_rows, nn_price, nd_price, mn_price,
               mx_price FROM a) u
      ORDER BY col_name"""))

  /** Truncated exponentially-weighted moving average over the dense
    * hourly event spine: weight 2^(15-Δ) for lag Δ ∈ [0,15], i.e.
    * α = 1/2 cut at 16 terms, normalized by the weights actually
    * present — integer-exact in both engines (power-of-two weights,
    * BIGINT sums, one final double division rounded to 6).
    *
    * Scale shape: instead of a 16-hour range self-join, each spine row
    * EXPLODES its bounded 16-target contribution list (constant 16×
    * fan-out, a narrow op) and a single hash aggregate on
    * (event_type, target_hour) re-collects — map-side partial combine
    * eats most of the fan-out before the one exchange; no range-join
    * BNLJ risk at any scale. The dense grid join is the same
    * min/max + sequence spine as q_ts_gapfill. */
  val qTsEwma = Q(
    "q_ts_ewma",
    (s, dir) => {
      val hourly = t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val grid = hourly.groupBy(col("event_type"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("event_type"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val dense = grid.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("n"))
      val contrib = dense
        .select(col("event_type"), col("h"), col("n"),
          explode(expr("sequence(0, 15)")).as("d"))
        .select(col("event_type"),
          expr("h + make_interval(0, 0, 0, 0, d, 0, 0)").as("th"),
          expr("n * shiftleft(1L, 15 - d)").as("wn"),
          expr("shiftleft(1L, 15 - d)").as("w"))
      contrib.join(dense.select(col("event_type"), col("h").as("th"),
          col("n").as("n_events")), Seq("event_type", "th"))
        .groupBy(col("event_type"), col("th").as("h"),
          col("n_events"))
        .agg(sum(col("wn")).as("swn"), sum(col("w")).as("sw"))
        .select(col("event_type"), col("h"), col("n_events"),
          round(col("swn").cast("double") / col("sw").cast("double"), 6)
            .as("ewma"))
        .orderBy(col("event_type"), col("h"))
    },
    Some("""
      WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      spans AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
                FROM hourly GROUP BY 1),
      grid AS (
        SELECT event_type,
               unnest([x for x in
                       generate_series(h0, h1, INTERVAL 1 HOUR)]) AS h
        FROM spans),
      dense AS (
        SELECT g.event_type, g.h, COALESCE(hr.n, 0) AS n
        FROM grid g LEFT JOIN hourly hr USING (event_type, h)),
      contrib AS (
        SELECT event_type, h + TO_HOURS(CAST(d AS BIGINT)) AS th,
               n * (1 << (15 - d)) AS wn,
               CAST(1 << (15 - d) AS BIGINT) AS w
        FROM dense, range(0, 16) AS t(d))
      SELECT c.event_type, c.th AS h, d2.n AS n_events,
             ROUND(CAST(SUM(c.wn) AS DOUBLE) /
                   CAST(SUM(c.w) AS DOUBLE), 6) AS ewma
      FROM contrib c
      JOIN dense d2 ON d2.event_type = c.event_type AND d2.h = c.th
      GROUP BY c.event_type, c.th, d2.n
      ORDER BY c.event_type, c.th"""))

  /** Spearman rank correlation per return flag — the robust dual of
    * [[qStatsCorr]]: Pearson's r computed on the RANKS of quantity
    * and extended price, so monotone-but-nonlinear association still
    * registers and outliers can't dominate. Ties take the min-rank
    * (`rank()` — identical semantics both engines; the average-rank
    * variant would need fractional ranks and a float surface). The
    * rank frames are BIGINT, so the sufficient statistics reuse the
    * Pearson discipline verbatim: exact BIGINT/DECIMAL sums, ONE
    * double combination with an identical op tree, round 6.
    *
    * Scale shape: no `l_returnflag`-partitioned rank window over raw
    * lineitem rows (the round-9 plan-audit finding: a 3-reducer
    * funnel at 100× scale). Quantity's domain is bounded by the
    * generator (~50 distinct values), so its min-ranks fall out of
    * the tiny (g, x)-count frame via a bounded broadcast theta join —
    * no sort anywhere. Price min-ranks ride
    * [[graft.operators.OrderStatistics.groupRowRanks]] — the
    * range-partitioned distributed rank (TeraSort shape, spreads
    * over ALL partitions) — CARRYING x as the payload, so pairing
    * (rx, ry) per row needs only a broadcast of the tiny x-rank
    * table, never a corpus-scale join-back. One map-side-combined
    * aggregate finishes. */
  val qStatsSpearman = Q(
    "q_stats_spearman",
    (s, dir) => {
      val m = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        expr("cast(round(l_quantity * 100) as bigint)").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y"))
      val gx = m.groupBy(col("g"), col("x")).agg(count(lit(1)).as("c"))
      val rxT = gx.as("a")
        .join(broadcast(gx.as("b")),
          col("a.g") === col("b.g") && col("b.x") < col("a.x"), "left")
        .groupBy(col("a.g"), col("a.x"))
        .agg((coalesce(sum(col("b.c")), lit(0L)) + lit(1L)).as("rx"))
        .select(col("a.g").as("g"), col("a.x").as("x"), col("rx"))
      val ranked = graft.operators.OrderStatistics
        .groupRowRanks(m.select(col("g"), col("y").as("v"),
          col("x").as("p")), minRank = true)
        .select(col("g"), col("p").as("x"), col("rk").as("ry"))
        .join(broadcast(rxT), Seq("g", "x"))
        .select(col("g"), col("rx"), col("ry"))
      val sums = ranked.groupBy(col("g")).agg(
        count(lit(1)).as("n"),
        sum(expr("cast(rx as decimal(25,0))")).as("sx"),
        sum(expr("cast(ry as decimal(25,0))")).as("sy"),
        sum(expr("cast(rx * rx as decimal(25,0))")).as("sxx"),
        sum(expr("cast(ry * ry as decimal(25,0))")).as("syy"),
        sum(expr("cast(rx * ry as decimal(25,0))")).as("sxy"))
      sums.select(col("g").as("l_returnflag"), col("n"),
          round((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            sqrt((col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              (col("n").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6)
            .as("spearman_qty_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem),
      ranked AS (
        SELECT g,
               CAST(RANK() OVER (PARTITION BY g ORDER BY x) AS BIGINT)
                 AS rx,
               CAST(RANK() OVER (PARTITION BY g ORDER BY y) AS BIGINT)
                 AS ry
        FROM m),
      sums AS (
        SELECT g, COUNT(*) AS n,
               CAST(SUM(CAST(rx AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS sx,
               CAST(SUM(CAST(ry AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS sy,
               CAST(SUM(CAST(rx * rx AS DECIMAL(25,0))) AS DECIMAL(25,0))
                 AS sxx,
               CAST(SUM(CAST(ry * ry AS DECIMAL(25,0))) AS DECIMAL(25,0))
                 AS syy,
               CAST(SUM(CAST(rx * ry AS DECIMAL(25,0))) AS DECIMAL(25,0))
                 AS sxy
        FROM ranked GROUP BY g)
      SELECT g AS l_returnflag, n,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                   6) AS spearman_qty_price
      FROM sums ORDER BY l_returnflag"""))

  /** Weighted median per group — the order statistic where each row
    * counts with its weight (here: price median weighted by quantity,
    * i.e. "the price of the median UNIT shipped", not the median
    * line): sort by value within the group, accumulate weight, take
    * the first value whose running weight reaches half the total
    * (weighted lower median — `2·cumw ≥ totw`, all BIGINT). The
    * estimator quantity-weighted pricing and importance-weighted
    * corpus statistics both need; reduces to the plain median when
    * every weight is 1.
    *
    * Scale shape: one partitioned window sort + a group total
    * broadcast back — the [[qStatsMad]] cost class. */
  val qStatsWmedian = Q(
    "q_stats_wmedian",
    (s, dir) => {
      val m = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("v"),
        expr("cast(round(l_quantity * 100) as bigint)").as("w"))
      val win = Window.partitionBy(col("g"))
        .orderBy(col("v"), col("w"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = m.groupBy(col("g")).agg(sum(col("w")).as("totw"),
        count(lit(1)).as("n"))
      m.withColumn("cumw", sum(col("w")).over(win))
        .join(tot, "g")
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy(col("g"))
        .agg(min(col("v")).as("wmedian_cents"),
          max(col("totw")).as("total_weight"), max(col("n")).as("n"))
        .select(col("g").as("l_returnflag"), col("n"),
          col("total_weight"), col("wmedian_cents"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS w
        FROM lineitem),
      tot AS (
        SELECT g, CAST(SUM(w) AS BIGINT) AS totw, COUNT(*) AS n
        FROM m GROUP BY g),
      c AS (
        SELECT g, v, w,
               CAST(SUM(w) OVER (PARTITION BY g ORDER BY v, w
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumw
        FROM m)
      SELECT c.g AS l_returnflag, MAX(t.n) AS n,
             CAST(MAX(t.totw) AS BIGINT) AS total_weight,
             CAST(MIN(c.v) AS BIGINT) AS wmedian_cents
      FROM c JOIN tot t USING (g)
      WHERE c.cumw * 2 >= t.totw
      GROUP BY c.g ORDER BY c.g"""))

  /** Benford first-digit screen — the forensic test for fabricated
    * numeric data: the leading significant digit of naturally-grown
    * quantities follows P(d) = log₁₀(1 + 1/d), and ledgers that
    * don't are flagged for audit. Per digit 1–9: observed count,
    * Benford-expected count in exact micro-units (N · p_micro with
    * the nine log constants precomputed as integer literals — no
    * runtime log, no float), and the signed deviation — ALL BIGINT,
    * so the screen is hash-stable by construction. The χ² rollup is
    * deliberately left to the consumer: a cross-digit double sum
    * would reintroduce accumulation-order sensitivity for zero
    * analytic gain.
    *
    * Scale shape: the digit is one string op on the scan, the
    * screen one 9-group aggregate + a one-row total broadcast. */
  val qStatsBenford = Q(
    "q_stats_benford",
    (s, dir) => {
      val digits = t(s, dir, "lineitem")
        .select(expr(
          "cast(substring(cast(cast(round(l_extendedprice * 100) as bigint) as string), 1, 1) as bigint)")
          .as("digit"))
      val obs = digits.groupBy(col("digit"))
        .agg(count(lit(1)).as("n_obs"))
      val tot = obs.agg(sum(col("n_obs")).as("nn"))
      val bb = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
        4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
        8 -> 51153L, 9 -> 45757L)
      val benford = {
        import s.implicits._
        bb.toDF("digit", "p_micro").select(col("digit").cast("long")
          .as("digit"), col("p_micro"))
      }
      obs.join(broadcast(benford), "digit")
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n_obs"),
          (col("nn") * col("p_micro")).as("expected_micro"),
          (col("n_obs") * lit(1000000L) - col("nn") * col("p_micro"))
            .as("deviation_micro"))
        .orderBy(col("digit"))
    },
    Some("""
      WITH digits AS (
        SELECT CAST(substr(CAST(CAST(ROUND(l_extendedprice * 100)
                 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM lineitem),
      obs AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM digits GROUP BY digit),
      tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS nn FROM obs),
      benford(digit, p_micro) AS (VALUES
        (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
        (6, 66947), (7, 57992), (8, 51153), (9, 45757))
      SELECT o.digit, o.n_obs,
             t.nn * b.p_micro AS expected_micro,
             o.n_obs * 1000000 - t.nn * b.p_micro AS deviation_micro
      FROM obs o
      JOIN benford b ON b.digit = o.digit
      CROSS JOIN tot t
      ORDER BY o.digit"""))

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

  /** A/B experiment report — Welch's unequal-variance t statistic
    * comparing mean event value between two treatment arms (the
    * `click` and `view` event streams standing in for variant A/B):
    * per-arm n, mean, and sample variance from exact integer
    * micro-unit sums, combined into the t statistic in ONE double op
    * tree (identical both engines, round 6). The decision table an
    * experimentation pipeline emits; |t| ≳ 2 → the arms differ.
    *
    * Scale shape: one map-side-combined aggregate over the two arms
    * (a 2-row frame after partial aggregation), then a 2-row pivot —
    * no shuffle carries more than the sufficient statistics. */
  val qStatsAbtest = Q(
    "q_stats_abtest",
    (s, dir) => {
      val m = t(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"),
          expr("cast(round(value * 1000000) as bigint)").as("x"))
      val sums = m.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(expr("cast(x as decimal(25,0))")).as("sx"),
        sum(expr("cast(x * x as decimal(38,0))")).as("sxx"))
      val wide = sums.agg(
        max(when(col("event_type") === "click", col("n"))).as("na"),
        max(when(col("event_type") === "click", col("sx"))).as("sxa"),
        max(when(col("event_type") === "click", col("sxx"))).as("sxxa"),
        max(when(col("event_type") === "view", col("n"))).as("nb"),
        max(when(col("event_type") === "view", col("sx"))).as("sxb"),
        max(when(col("event_type") === "view", col("sxx"))).as("sxxb"))
      def meanD(sx: Column, n: Column): Column =
        sx.cast("double") / n.cast("double") / lit(1000000.0)
      def varD(sxx: Column, sx: Column, n: Column): Column =
        (n.cast("double") * sxx.cast("double") -
          sx.cast("double") * sx.cast("double")) /
          (n.cast("double") * (n.cast("double") - lit(1.0))) /
          lit(1000000.0) / lit(1000000.0)
      wide.select(
          col("na"), round(meanD(col("sxa"), col("na")), 6).as("mean_a"),
          col("nb"), round(meanD(col("sxb"), col("nb")), 6).as("mean_b"),
          round((meanD(col("sxa"), col("na")) -
            meanD(col("sxb"), col("nb"))) /
            sqrt(varD(col("sxxa"), col("sxa"), col("na")) /
              col("na").cast("double") +
              varD(col("sxxb"), col("sxb"), col("nb")) /
                col("nb").cast("double")), 6).as("welch_t"))
    },
    Some("""
      WITH m AS (
        SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS x
        FROM events WHERE event_type IN ('click', 'view')),
      sums AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS sx,
               CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0))
                 AS sxx
        FROM m GROUP BY event_type),
      wide AS (
        SELECT
          MAX(CASE WHEN event_type = 'click' THEN n END) AS na,
          MAX(CASE WHEN event_type = 'click' THEN sx END) AS sxa,
          MAX(CASE WHEN event_type = 'click' THEN sxx END) AS sxxa,
          MAX(CASE WHEN event_type = 'view' THEN n END) AS nb,
          MAX(CASE WHEN event_type = 'view' THEN sx END) AS sxb,
          MAX(CASE WHEN event_type = 'view' THEN sxx END) AS sxxb
        FROM sums)
      SELECT na,
             ROUND(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 1000000.0,
                   6) AS mean_a,
             nb,
             ROUND(CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0,
                   6) AS mean_b,
             ROUND((CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 1000000.0
                    - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE)
                      / 1000000.0)
                   / SQRT(((CAST(na AS DOUBLE) * CAST(sxxa AS DOUBLE)
                            - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE))
                           / (CAST(na AS DOUBLE)
                              * (CAST(na AS DOUBLE) - 1.0))
                           / 1000000.0 / 1000000.0)
                          / CAST(na AS DOUBLE)
                          + ((CAST(nb AS DOUBLE) * CAST(sxxb AS DOUBLE)
                              - CAST(sxb AS DOUBLE)
                                * CAST(sxb AS DOUBLE))
                             / (CAST(nb AS DOUBLE)
                                * (CAST(nb AS DOUBLE) - 1.0))
                             / 1000000.0 / 1000000.0)
                          / CAST(nb AS DOUBLE)), 6) AS welch_t
      FROM wide"""))

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

  /** OHLC bar downsampling: per event type and hour, the open (first
    * value by event time), high, low, close (last value), and count —
    * the classic market-data resample, and the general "reduce a
    * high-frequency stream to per-window endpoint statistics" shape.
    *
    * Spark-first shape: ONE hash aggregate — `min_by`/`max_by` keyed
    * on the (ts, event_id) struct pick the endpoint values inside the
    * same partial/final aggregation as high/low/count, so the plan is
    * a single exchange on the grouping key with NO window sort. The
    * oracle replays the endpoints via ROW_NUMBER because DuckDB's
    * arg_min is single-key; formulations agree because event_id makes
    * the per-bar ordering total. Open/close/high/low pass the raw
    * DOUBLE through untouched (no arithmetic → no accumulation-order
    * or rounding hazard in the hash compare). */
  val qTsOhlc = Q(
    "q_ts_ohlc",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id")))
            .as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id")))
            .as("close"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"), col("h"))
    },
    Some("""
      WITH ranked AS (
        SELECT event_type, date_trunc('hour', ts) AS h, value,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                                               date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                                               date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events)
      SELECT event_type, h,
             MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
             MAX(value) AS high,
             MIN(value) AS low,
             MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
             COUNT(*) AS n_events
      FROM ranked GROUP BY event_type, h
      ORDER BY event_type, h"""))

  /** Robust location/scale statistics: per return flag, the exact
    * lower-median and MAD (median absolute deviation) of the
    * cent-scaled extended price, plus the count of 3-MAD outliers —
    * the robust outlier screen that survives the heavy tails that
    * wreck mean/stddev fences. All arithmetic is BIGINT order
    * statistics (rank (n+1)÷2 under integer division = the lower
    * median — exact, no interpolation, no float), so every cell is
    * hash-stable by construction.
    *
    * Scale shape: both EXACT medians ride
    * [[graft.operators.OrderStatistics.radixLowerMedian]] — the
    * two-pass radix-histogram core (bucket counts per group, then an
    * exact walk inside the one crossing bucket), so no ranked window
    * ever sees a raw fact row: a `l_returnflag`-partitioned rank
    * would funnel the whole table into 3 reducers at 100× scale
    * (the round-9 plan-audit finding; the pre-fix window plan is the
    * small-data convenience, not a necessity). The 3-row median/MAD
    * tables broadcast back; the approximate path for when 1e-2
    * relative error is acceptable is [[qQuantileSketch]]'s GK
    * sketch. */
  val qStatsMad = Q(
    "q_stats_mad",
    (s, dir) => {
      val x = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("x"))
      val med = graft.operators.OrderStatistics
        .radixLowerMedian(x.select(col("g"), col("x").as("c")))
        .select(col("g"), col("med"))
      // dev is consumed twice (the MAD radix passes AND the outlier
      // aggregate) but deliberately NOT persisted: it is one
      // narrow projection over the scan + a 3-row broadcast join —
      // recomputing it is cheaper than materializing N rows.
      val dev = x.join(broadcast(med), "g")
        .select(col("g"), col("x"), col("med"),
          abs(col("x") - col("med")).as("adev"))
      val mad = graft.operators.OrderStatistics
        .radixLowerMedian(dev.select(col("g"), col("adev").as("c")))
        .select(col("g"), col("med").as("mad"))
      dev.join(broadcast(mad), "g")
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          max(col("med")).as("median_cents"),
          max(col("mad")).as("mad_cents"),
          sum(when(col("adev") > lit(3L) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .select(col("g").as("l_returnflag"), col("n"),
          col("median_cents"), col("mad_cents"), col("n_outliers"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH x AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x
        FROM lineitem),
      medr AS (
        SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS cnt
        FROM x),
      med AS (SELECT g, x AS med FROM medr WHERE rn = (cnt + 1) // 2),
      dev AS (
        SELECT x.g, x.x, med.med, ABS(x.x - med.med) AS adev
        FROM x JOIN med USING (g)),
      madr AS (
        SELECT g, adev,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY adev) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS cnt
        FROM dev),
      mad AS (SELECT g, adev AS mad FROM madr WHERE rn = (cnt + 1) // 2)
      SELECT dev.g AS l_returnflag, COUNT(*) AS n,
             CAST(MAX(dev.med) AS BIGINT) AS median_cents,
             CAST(MAX(mad.mad) AS BIGINT) AS mad_cents,
             CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers
      FROM dev JOIN mad USING (g)
      GROUP BY dev.g ORDER BY dev.g"""))

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

  /** Per-group simple linear regression (value trend over time) from
    * the five sufficient statistics: slope, intercept, and r² for
    * each event type's value-vs-hour trend, computed entirely from
    * exact integer sums (x = hours since 2024-01-01, y = value in
    * integer micro-units) combined in bounded-width DECIMALs — only
    * the final divisions happen in DOUBLE, with an identical
    * operation tree on both engines.
    *
    * Scale shape: ONE map-side-combinable aggregate per group —
    * the sufficient-statistic formulation is why regression
    * distributes (no centering pass, no second scan); the r²
    * numerator squares in DOUBLE because its exact width (~52
    * digits) exceeds any decimal, and both engines square the SAME
    * correctly-rounded double. */
  val qStatsRegression = Q(
    "q_stats_regression",
    (s, dir) => {
      val sums = t(s, dir, "events")
        .select(col("event_type"),
          expr("(unix_micros(ts) - 1704067200000000L) div 3600000000L")
            .as("x"),
          expr("cast(round(value * 1000000) as bigint)").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          // ALL moment sums accumulate in DECIMAL(25,0) (ADVICE r8): a
          // plain BIGINT sum of x·y / x·x wraps SILENTLY at large scale
          // under non-ANSI Spark while DuckDB's HUGEINT doesn't — the
          // decimal buffer makes overflow an error, not a wrong slope.
          // decimal→double and bigint→double casts are both correctly
          // rounded from the same exact integer, so parity is untouched.
          sum(expr("cast(x as decimal(25,0))")).as("sx"),
          sum(expr("cast(y as decimal(25,0))")).as("sy"),
          sum(expr("cast(x * y as decimal(25,0))")).as("sxy"),
          sum(expr("cast(x * x as decimal(25,0))")).as("sxx"),
          sum(expr("cast(y * y as decimal(25,0))")).as("syy"))
      // the DECIMAL sums are exact; every factor below is
      // either exactly double-representable (< 2^53) or a correctly-
      // rounded decimal→double cast, and the combination runs in
      // DOUBLE with the same op tree as the oracle — deterministic
      // cross-engine without decimal-width gymnastics
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double")
      val syD = col("sy").cast("double")
      val sxyD = col("sxy").cast("double")
      val sxxD = col("sxx").cast("double")
      val syyD = col("syy").cast("double")
      val num = nD * sxyD - sxD * syD
      val den = nD * sxxD - sxD * sxD
      val syDen = nD * syyD - syD * syD
      sums.select(col("event_type"), col("n"),
        round(num / den / 1000000.0, 6).as("slope"),
        round((syD * sxxD - sxD * sxyD) / den / 1000000.0, 6)
          .as("intercept"),
        round(num * num / (den * syDen), 6).as("r2"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH pts AS (
        SELECT event_type,
               (epoch_us(ts) - 1704067200000000) // 3600000000 AS x,
               CAST(ROUND(value * 1000000) AS BIGINT) AS y
        FROM events),
      sums AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS syy
        FROM pts GROUP BY event_type)
      SELECT event_type, n,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   / 1000000.0, 6) AS slope,
             ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   / 1000000.0, 6) AS intercept,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
      FROM sums ORDER BY event_type"""))

  /** The built-in `session_window` operator in BATCH mode, gated by
    * the SAME oracle as the hand-rolled lag/cumsum sessionizer
    * (q_sessionize_batch): the hash-match is a three-way equivalence
    * proof — Spark's native session operator ≡ the gaps-and-islands
    * window formulation ≡ DuckDB's SQL replay. The session_window
    * struct serves only as the grouping key; start/end/value
    * re-aggregate as min/max/decimal-sum inside each session, and
    * session_idx re-ranks windows per user by start time (per-user
    * sessions are time-disjoint, so the rank IS the islands ordinal).
    * Boundary tie measured and pinned (AnalyticsSpec "session_window
    * exact-gap boundary"): an event EXACTLY gap-distant from its
    * predecessor MERGES in both formulations — session_window's end
    * is inclusive (next.start <= current.end merges), same as the lag
    * rule's <=. The equivalence is semantic, not fixture-luck.
    *
    * Scale shape: session_window plans ONE exchange on user_id with
    * the session merge inside the aggregate (no second window pass) —
    * the same single-shuffle shape the hand-rolled variant is pinned
    * to. */
  val qSessionizeNative = Q(
    "q_sessionize_native",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("value"))
      val sess = ev
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(col("value").cast(DecimalType(25, 6))).cast("double")
            .as("session_value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("session_start"))
      sess
        .withColumn("session_idx", row_number().over(w).cast("long"))
        .select(col("user_id"), col("session_idx"), col("n_events"),
          col("session_start"), col("session_end"), col("session_value"))
        .orderBy(col("user_id"), col("session_idx"))
    },
    // the q_sessionize_batch oracle verbatim — same semantics, so the
    // native operator must reproduce the islands formulation exactly
    qSessionizeBatch.oracle)

  /** Per-group Pearson correlation matrix over the lineitem measures
    * (quantity, extendedprice, discount — all exact in cent units):
    * the three pairwise r values per return flag from the same
    * sufficient-statistic discipline as [[qStatsRegression]] — ONE
    * map-side-combinable aggregate collects exact BIGINT/DECIMAL
    * sums, and r = (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²))
    * combines them in DOUBLE with an identical op tree on both
    * engines (IEEE sqrt is correctly rounded — deterministic).
    * The warehouse "are these measures redundant" diagnostic and the
    * feature-decorrelation check before a model consumes them. */
  val qStatsCorr = Q(
    "q_stats_corr",
    (s, dir) => {
      val m = t(s, dir, "lineitem").select(col("l_returnflag"),
        expr("cast(round(l_quantity * 100) as bigint)").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y"),
        expr("cast(round(l_discount * 100) as bigint)").as("z"))
      val sums = m.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        // first-moment sums widened to DECIMAL(25,0) like the second
        // moments below (ADVICE r8): BIGINT wraps silently at scale
        sum(expr("cast(x as decimal(25,0))")).as("sx"),
        sum(expr("cast(y as decimal(25,0))")).as("sy"),
        sum(expr("cast(z as decimal(25,0))")).as("sz"),
        sum(expr("cast(x * x as decimal(25,0))")).as("sxx"),
        sum(expr("cast(y * y as decimal(25,0))")).as("syy"),
        sum(expr("cast(z * z as decimal(25,0))")).as("szz"),
        sum(expr("cast(x * y as decimal(25,0))")).as("sxy"),
        sum(expr("cast(x * z as decimal(25,0))")).as("sxz"),
        sum(expr("cast(y * z as decimal(25,0))")).as("syz"))
      def corr(sa: String, sb: String, sab: String, saa: String,
          sbb: String): Column = {
        val nD = col("n").cast("double")
        val num = nD * col(sab).cast("double") -
          col(sa).cast("double") * col(sb).cast("double")
        val da = nD * col(saa).cast("double") -
          col(sa).cast("double") * col(sa).cast("double")
        val db = nD * col(sbb).cast("double") -
          col(sb).cast("double") * col(sb).cast("double")
        round(num / sqrt(da * db), 6)
      }
      sums.select(col("l_returnflag"), col("n"),
          corr("sx", "sy", "sxy", "sxx", "syy").as("corr_qty_price"),
          corr("sx", "sz", "sxz", "sxx", "szz").as("corr_qty_disc"),
          corr("sy", "sz", "syz", "syy", "szz").as("corr_price_disc"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS z
        FROM lineitem),
      sums AS (
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(z) AS BIGINT) AS sz,
               CAST(SUM(CAST(x * x AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS syy,
               CAST(SUM(CAST(z * z AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS szz,
               CAST(SUM(CAST(x * y AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS sxy,
               CAST(SUM(CAST(x * z AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS sxz,
               CAST(SUM(CAST(y * z AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS syz
        FROM m GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS corr_qty_price,
             ROUND((CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
                   / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                             - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6)
               AS corr_qty_disc,
             ROUND((CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
                   / SQRT((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                             - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6)
               AS corr_price_disc
      FROM sums ORDER BY l_returnflag"""))

  /** Join-key skew diagnostic over l_partkey — the report that decides
    * whether a key needs the q_join_salted treatment before a big
    * join: key cardinality, max/median/p99 per-key counts, the
    * max-to-median skew ratio, and the share of rows owned by the ten
    * heaviest keys. All statistics derive from the per-key COUNT
    * table (one exchange on the key, map-side combined), never from a
    * second corpus pass; the top-10 is a TakeOrdered and the exact
    * percentiles run over |keys| rows, not |rows|. */
  val qStatsSkew = Q(
    "q_stats_skew",
    (s, dir) => {
      val counts = t(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("c"))
      val top10 = counts.orderBy(col("c").desc, col("l_partkey")).limit(10)
        .agg(sum(col("c")).as("top10_rows"))
      counts.agg(
          count(lit(1)).as("n_keys"),
          sum(col("c")).as("n_rows"),
          max(col("c")).as("max_cnt"),
          expr("percentile(c, 0.5D)").as("p50d"),
          expr("percentile(c, 0.99D)").as("p99d"))
        .crossJoin(broadcast(top10))
        .select(col("n_keys"), col("n_rows"), col("max_cnt"),
          round(col("p50d"), 6).as("p50_cnt"),
          round(col("p99d"), 6).as("p99_cnt"),
          round(col("max_cnt").cast("double") / col("p50d"), 6)
            .as("skew_ratio"),
          round(col("top10_rows").cast("double") /
            col("n_rows").cast("double"), 6).as("top10_share"))
    },
    Some("""
      WITH counts AS (
        SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY l_partkey),
      top10 AS (
        SELECT CAST(SUM(c) AS BIGINT) AS top10_rows FROM (
          SELECT c FROM counts ORDER BY c DESC, l_partkey LIMIT 10) x),
      agg AS (
        SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
               MAX(c) AS max_cnt,
               quantile_cont(c, 0.5) AS p50d,
               quantile_cont(c, 0.99) AS p99d
        FROM counts)
      SELECT n_keys, n_rows, max_cnt,
             ROUND(p50d, 6) AS p50_cnt, ROUND(p99d, 6) AS p99_cnt,
             ROUND(CAST(max_cnt AS DOUBLE) / p50d, 6) AS skew_ratio,
             ROUND(CAST(top10_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
               AS top10_share
      FROM agg CROSS JOIN top10"""))

  /** Exact Gini coefficient of the join-key row distribution — the
    * single-number inequality companion to [[qStatsSkew]]'s report
    * (0 = uniform keys, →1 = one key owns everything). Needs every
    * key's RANK under the (count, key) total order; instead of a
    * partition-less global sort window, the rank comes from
    * [[countByRank]] over the composite value count·2⁴² + key (order-
    * isomorphic to the pair while keys < 2⁴² — true at every fixture
    * SF and any realistic key space) — the same distributed order
    * statistic the interval join uses, reused verbatim. Ties in count
    * commute in Σ rank·cᵢ, so the key tie-break changes nothing in
    * the statistic. All sums stay exact BIGINTs below 2⁵³; the one
    * division is DOUBLE with an identical op tree cross-engine. */
  val qStatsGini = Q(
    "q_stats_gini",
    (s, dir) => {
      val counts = t(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("c"))
      // Bound guard (ADVICE r8): the composite encoding is order-
      // isomorphic only while c < 2^13 and key < 2^42 — beyond that
      // the rank mis-sorts or the bucket arithmetic wraps, silently.
      // Fail LOUDLY in-plan (no extra pass): assert_true evaluates per
      // KEY row inside codegen and contributes exactly 0 in bounds.
      val guard = coalesce(expr(
        "assert_true(c < 8192 and l_partkey < 4398046511104, " +
          "'q_stats_gini: composite-encoding bounds exceeded " +
          "(need per-key count < 2^13 and key < 2^42)')").cast("long"),
        lit(0L))
      val enc = col("c") * lit(4398046511104L) + col("l_partkey") + guard
      val ranked = countByRank(
        counts.select(enc.as("v")),
        counts.select(col("l_partkey").as("user_id"),
          col("c").as("session_idx"), enc.as("q")),
        inclusive = false)
        .select(col("session_idx").as("c"), (col("cnt") + 1L).as("r"))
      ranked.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
          sum(col("r") * col("c")).as("src"))
        .select(col("n").as("n_keys"),
          round((lit(2L) * col("src") - (col("n") + 1L) * col("sc"))
            .cast("double") /
            (col("n") * col("sc")).cast("double"), 6).as("gini"))
    },
    Some("""
      WITH counts AS (
        SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY l_partkey),
      ranked AS (
        SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c, l_partkey) AS BIGINT)
                 AS r
        FROM counts),
      agg AS (
        SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sc,
               CAST(SUM(r * c) AS BIGINT) AS src
        FROM ranked)
      SELECT n AS n_keys,
             ROUND(CAST(2 * src - (n + 1) * sc AS DOUBLE)
                   / CAST(n * sc AS DOUBLE), 6) AS gini
      FROM agg"""))

  /** Distributed order statistic — forwarder to the factored-out
    * [[graft.operators.OrderStatistics.countByRank]] (round-9: the
    * core is shared with arbitrary-bucket-width interval joins; this
    * file's two callers keep the 256-bucket default). */
  private def countByRank(points: DataFrame, queries: DataFrame,
      inclusive: Boolean): DataFrame =
    graft.operators.OrderStatistics.countByRank(points, queries, inclusive)

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

  /** Point-in-time (temporal) dimension lookup — the query every SCD2
    * dimension exists to serve: each fact row joins the dimension
    * VERSION that was valid at the fact's own timestamp (here: which
    * status-era the customer was in when each line item shipped —
    * ship dates trail order dates by days to months, so facts land in
    * later versions than the orders that created them). The engine
    * implements it with the [[AsOfJoin]] operator against the
    * dimension's valid_from — latest version at-or-before the fact
    * timestamp — which on a CONTIGUOUS interval table is exactly the
    * BETWEEN semantics the oracle states; zero-width versions (two
    * status flips on one date) are filtered first, since no
    * point-in-time probe can land inside them (the oracle's
    * `sd < valid_to` excludes them identically, and dropping them
    * makes the surviving valid_froms strictly increasing per customer
    * — the tie-free ordering the as-of window needs). One union +
    * one customer-keyed window — a single shuffle, no interval
    * pair-join anywhere. */
  val qScd2Lookup = Q(
    "q_scd2_lookup",
    (s, dir) => {
      val dim = scd2Close(scd2Runs(
          t(s, dir, "orders").filter(col("o_custkey") < 300)))
        .filter(col("valid_to").isNull ||
          col("valid_from") < col("valid_to"))
        .select(col("o_custkey"), col("version"), col("valid_from"))
      val facts = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_custkey") < 300),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_shipdate"),
          col("l_extendedprice"))
      AsOfJoin.asof(facts, dim, "o_custkey", "l_shipdate", "valid_from",
          Seq("version"))
        .groupBy(col("o_custkey"), col("version"))
        .agg(count(lit(1)).as("n_facts"),
          dsum(col("l_extendedprice")).as("rev"))
        .orderBy(col("o_custkey"), col("version"))
    },
    Some("""
      WITH flagged AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
               CASE WHEN LAG(o_orderstatus, 1) OVER w IS NULL
                      OR LAG(o_orderstatus, 1) OVER w <> o_orderstatus
                    THEN 1 ELSE 0 END AS chg
        FROM orders WHERE o_custkey < 300
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)),
      versioned AS (
        SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS version
        FROM flagged),
      islands AS (
        SELECT o_custkey, version, MIN(o_orderdate) AS valid_from
        FROM versioned GROUP BY o_custkey, version),
      dim AS (
        SELECT o_custkey, version, valid_from,
               LEAD(valid_from, 1) OVER (PARTITION BY o_custkey
                 ORDER BY version) AS valid_to
        FROM islands),
      facts AS (
        SELECT o.o_custkey, l.l_shipdate AS sd,
               l.l_extendedprice AS px
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_custkey < 300),
      hit AS (
        SELECT f.o_custkey, d.version, f.px
        FROM facts f JOIN dim d ON d.o_custkey = f.o_custkey
          AND f.sd >= d.valid_from
          AND (d.valid_to IS NULL OR f.sd < d.valid_to))
      SELECT o_custkey, version, COUNT(*) AS n_facts,
             CAST(SUM(CAST(px AS DECIMAL(25,4))) AS DOUBLE) AS rev
      FROM hit GROUP BY o_custkey, version
      ORDER BY o_custkey, version"""))

  /** Inter-rater agreement (Cohen's kappa) between two independent
    * document-quality raters — here the char-length gate (≥300) and
    * the token-count gate (≥55), per language: the calibration step
    * before trusting any single heuristic filter, and the same
    * machinery that scores human labeler agreement on eval sets. All
    * four contingency cells, the observed agreement, and the
    * chance-corrected kappa reduce to exact integer arithmetic: with
    * agree = n11+n00 and pe_num = (n11+n10)(n11+n01)+(n01+n00)(n10+n00),
    * kappa = (n·agree − pe_num) / (n² − pe_num) — the query emits
    * po/pe in exact micro-units plus kappa's integer numerator and
    * denominator, so the gate is bit-exact with no cross-engine
    * float-division ambiguity (kappa_num may be negative; DIV-vs-floor
    * divergence on negatives is why it ships as a fraction). Products
    * stay < 2⁶³ while per-stratum n < ~3·10⁶; beyond that the sums
    * widen to DECIMAL exactly like q_stats_regression's moments.
    *
    * Scale shape: one narrow corpus pass → per-language partial
    * counts → a |languages|-row final aggregate; the kappa algebra is
    * a projection over that tiny frame. */
  val qStatsKappa = Q(
    "q_stats_kappa",
    (s, dir) => {
      val a = (col("n_chars") >= 300).cast("long")
      val b = (size(split(col("text"), " ")) >= 55).cast("long")
      Tables.spread(t(s, dir, "documents"))
        .select(col("lang"), a.as("ra"), b.as("rb"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("ra") * col("rb")).as("n11"),
          sum(col("ra") * (lit(1L) - col("rb"))).as("n10"),
          sum((lit(1L) - col("ra")) * col("rb")).as("n01"),
          sum((lit(1L) - col("ra")) * (lit(1L) - col("rb"))).as("n00"))
        .select(col("lang"), col("n"),
          expr("CAST((n11 + n00) * 1000000 DIV n AS BIGINT)")
            .as("po_micro"),
          expr("""CAST(((n11 + n10) * (n11 + n01)
                        + (n01 + n00) * (n10 + n00)) * 1000000
                       DIV (n * n) AS BIGINT)""").as("pe_micro"),
          expr("""CAST(n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
                        + (n01 + n00) * (n10 + n00)) AS BIGINT)""")
            .as("kappa_num"),
          expr("""CAST(n * n - ((n11 + n10) * (n11 + n01)
                        + (n01 + n00) * (n10 + n00)) AS BIGINT)""")
            .as("kappa_den"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH d AS (
        SELECT lang,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
               CASE WHEN len(string_split(text, ' ')) >= 55
                    THEN 1 ELSE 0 END AS rb
        FROM documents),
      c AS (
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(ra * rb) AS BIGINT) AS n11,
               CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
               CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
               CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00
        FROM d GROUP BY lang)
      SELECT lang, n,
             CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_micro,
             CAST(((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)) * 1000000
                  // (n * n) AS BIGINT) AS pe_micro,
             CAST(n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)) AS BIGINT) AS kappa_num,
             CAST(n * n - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)) AS BIGINT) AS kappa_den
      FROM c ORDER BY lang"""))

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

  /** Exact two-sample Kolmogorov–Smirnov statistic between the 'view'
    * and 'click' purchase-value distributions — the distribution-drift
    * test a feature store runs between cohorts. D = max over pooled
    * sample points of |F₁(x) − F₂(x)|; the textbook computation is a
    * GLOBAL sort + running ECDFs (a partition-less window — the exact
    * shape PlanAudit rejects). Here both cumulative counts come from
    * [[graft.operators.OrderStatistics.countByRank]] — range-bucket,
    * one bucket-keyed exchange, per-partition sorted scan, bounded
    * bucket-prefix theta join — evaluated at every pooled distinct
    * value, so the ECDFs distribute O(N log N) with no global sort.
    * The statistic stays in exact integers to the end
    * (|cum₁·n₂ − cum₂·n₁| over the common denominator n₁·n₂), divides
    * once in double, rounds at 6; the argmax location is tie-broken
    * to the smallest value attaining the max. */
  val qStatsKs = Q(
    "q_stats_ks",
    (s, dir) => {
      val v = t(s, dir, "events")
        .filter(col("event_type").isin("view", "click"))
        .select(col("event_type"),
          expr("cast(round(value * 1000000) as bigint)").as("x"))
      val q = v.select(col("x")).distinct()
        .select(col("x").as("user_id"), lit(0L).as("session_idx"),
          col("x").as("q"))
      val cum1 = countByRank(
        v.filter(col("event_type") === "view").select(col("x").as("v")),
        q, inclusive = true)
        .select(col("user_id").as("x"), col("cnt").as("cum1"))
      val cum2 = countByRank(
        v.filter(col("event_type") === "click").select(col("x").as("v")),
        q, inclusive = true)
        .select(col("user_id").as("x"), col("cnt").as("cum2"))
      val ns = v.agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n2"))
      // persisted: d feeds both the max and the argmax — unpersisted,
      // BOTH countByRank pipelines run twice (review finding)
      val d = cum1.join(cum2, Seq("x")).crossJoin(broadcast(ns))
        .select(col("x"),
          abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("diff"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = d.agg(max(col("diff")).as("md"))
      val arg = d.crossJoin(broadcast(m))
        .filter(col("diff") === col("md"))
        .agg(min(col("x")).as("at_micros"))
      QueryScopedCache.releaseAfter(
        ns.crossJoin(m).crossJoin(arg)
          .select(col("n1"), col("n2"),
            round(col("md").cast("double") /
              (col("n1") * col("n2")).cast("double"), 6).as("ks_d"),
            col("at_micros")),
        Seq(d))
    },
    Some("""
      WITH v AS (
        SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS x
        FROM events WHERE event_type IN ('view', 'click')),
      d AS (
        SELECT x,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 AS BIGINT) AS c2
        FROM v GROUP BY x),
      c AS (
        SELECT x, CAST(SUM(c1) OVER (ORDER BY x) AS BIGINT) AS cum1,
               CAST(SUM(c2) OVER (ORDER BY x) AS BIGINT) AS cum2
        FROM d),
      n AS (SELECT
              CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n1,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n2
            FROM v),
      dd AS (SELECT x, ABS(cum1 * n2 - cum2 * n1) AS diff
             FROM c CROSS JOIN n),
      m AS (SELECT MAX(diff) AS md FROM dd),
      arg AS (SELECT MIN(x) AS at_micros FROM dd CROSS JOIN m
              WHERE diff = md)
      SELECT n1, n2,
             ROUND(CAST(md AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6) AS ks_d,
             at_micros
      FROM n CROSS JOIN m CROSS JOIN arg"""))

  /** Autocorrelation function of the gap-free hourly event-count
    * series at lags 1..24 — the seasonality screen run before fitting
    * any forecast model. The corpus-scale work is the hourly count
    * aggregation (one exchange on the truncated hour); the series
    * itself is bounded (span-hours rows), so the zero-fill (the
    * [[qTsGapfill]] sequence-explode, with absence meaning a REAL
    * count of zero, not an imputation), the 24-way lag join on the
    * integer hour index, and the per-lag reduction all run on a
    * data-independent frame. The sample ACF normalizes by the
    * full-series mean/variance; multiplying through by n² keeps every
    * term an exact BIGINT (bounded while n·S·2·S < 2⁶³ — hour counts
    * into the tens of thousands over multi-year spans, far beyond any
    * fixture), with one double division rounded at 6. */
  val qTsAcf = Q(
    "q_ts_acf",
    (s, dir) => {
      val hourly = t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("x"))
      val span = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val grid = span
        .select(col("h0"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val series = grid.join(hourly, Seq("h"), "left")
        .select(
          expr("(unix_micros(h) - unix_micros(h0)) div 3600000000")
            .as("tix"),
          coalesce(col("x"), lit(0L)).as("x"))
      val tot = series.agg(count(lit(1)).as("n"), sum(col("x")).as("ss"),
        sum(col("x") * col("x")).as("sxx"))
      val lags = s.range(1, 25).toDF("k")
      series.crossJoin(lags)
        .select(col("k"), (col("tix") + col("k")).as("tj"),
          col("x").as("xa"))
        .join(series.select(col("tix").as("tj"), col("x").as("xb")),
          Seq("tj"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("xa") * col("xb")).as("sxy"),
          sum(col("xa")).as("hh"), sum(col("xb")).as("tt"))
        .crossJoin(broadcast(tot))
        .select(col("k").as("lag"), col("n_pairs"),
          round(
            (col("n") * col("n") * col("sxy") -
              col("n") * col("ss") * (col("hh") + col("tt")) +
              col("n_pairs") * col("ss") * col("ss")).cast("double") /
            (col("n") * col("n") * col("sxx") -
              col("n") * col("ss") * col("ss")).cast("double"), 6).as("r"))
        .orderBy(col("lag"))
    },
    Some("""
      WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x
        FROM events GROUP BY 1),
      span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
      grid AS (
        SELECT h0, unnest([g for g in
                           generate_series(h0, h1, INTERVAL 1 HOUR)]) AS h
        FROM span),
      series AS (
        SELECT CAST((epoch_us(g.h) - epoch_us(g.h0)) // 3600000000
                 AS BIGINT) AS tix,
               COALESCE(hr.x, 0) AS x
        FROM grid g LEFT JOIN hourly hr USING (h)),
      tot AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS ss,
                     CAST(SUM(x * x) AS BIGINT) AS sxx
              FROM series),
      lags AS (SELECT unnest(range(1, 25)) AS k),
      j AS (
        SELECT l.k, COUNT(*) AS n_pairs,
               CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
               CAST(SUM(a.x) AS BIGINT) AS hh,
               CAST(SUM(b.x) AS BIGINT) AS tt
        FROM series a CROSS JOIN lags l
        JOIN series b ON b.tix = a.tix + l.k
        GROUP BY l.k)
      SELECT k AS lag, n_pairs,
             ROUND(CAST(n * n * sxy - n * ss * (hh + tt)
                        + n_pairs * ss * ss AS DOUBLE) /
                   CAST(n * n * sxx - n * ss * ss AS DOUBLE), 6) AS r
      FROM j CROSS JOIN tot ORDER BY lag"""))

  /** Zero-filled hourly count series per event type — absent hours
    * materialize as REAL zero counts (the [[qTsGapfill]]
    * sequence-explode, count-only form): the shared input of
    * [[qTsCusum]] and [[qTsSeasonality]], with its oracle-side mirror
    * below so the Spark/SQL pair can't drift. */
  private def hourlySeriesByType(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("x"), lit(0L)).as("x"))
  }

  /** [[hourlySeriesByType]]'s oracle CTE chain (yields `series`). */
  private val hourlySeriesByTypeSql: String =
    """hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      spans AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
                FROM hourly GROUP BY 1),
      grid AS (
        SELECT event_type,
               unnest([g for g in
                       generate_series(h0, h1, INTERVAL 1 HOUR)]) AS h
        FROM spans),
      series AS (
        SELECT g.event_type, g.h, COALESCE(hr.x, 0) AS x
        FROM grid g LEFT JOIN hourly hr USING (event_type, h))"""

  /** CUSUM changepoint screen per event type — the hour at which the
    * cumulative deviation of the hourly count from the series mean
    * peaks in magnitude (the classic level-shift detector: a sustained
    * rate change makes |CUSUM| grow linearly until the shift point).
    * The mean is kept rational — deviations are n·xₜ − S, the ×n
    * scaling of xₜ − S/n — so every value in the query is an exact
    * BIGINT and the gate pins the full statistic, not a rounding of
    * it. Scale shape: the corpus-scale work is the hourly count
    * exchange; the zero-filled series (absent hours are REAL zero
    * counts, the [[qTsGapfill]] sequence-explode) is bounded per type,
    * the running sum and max windows are PARTITIONED by event_type,
    * and the argmax resolves by earliest-hour join — no global sort,
    * no driver loop. */
  val qTsCusum = Q(
    "q_ts_cusum",
    (s, dir) => {
      val series = hourlySeriesByType(s, dir)
      val tots = series.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"), sum(col("x")).as("total_events"))
      val wRun = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      // persisted: cum feeds both the peak argmax and the final join —
      // unpersisted, the corpus-scale hourly exchange and both windows
      // run twice (review finding, this session)
      val cum = series.join(broadcast(tots), Seq("event_type"))
        .withColumn("cum",
          sum(col("n_hours") * col("x") - col("total_events")).over(wRun))
        .withColumn("mx", max(abs(col("cum"))).over(wAll))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val peaks = cum.filter(abs(col("cum")) === col("mx"))
        .groupBy(col("event_type")).agg(min(col("h")).as("peak_h"))
        .select(col("event_type").as("pt"), col("peak_h"))
      QueryScopedCache.releaseAfter(
        cum.join(peaks,
            col("event_type") === col("pt") && col("h") === col("peak_h"))
          .select(col("event_type"), col("n_hours"), col("total_events"),
            col("peak_h"), col("cum").as("cusum_peak"))
          .orderBy(col("event_type")),
        Seq(cum))
    },
    Some(s"""
      WITH ${hourlySeriesByTypeSql},
      tots AS (
        SELECT event_type, COUNT(*) AS n_hours,
               CAST(SUM(x) AS BIGINT) AS total_events
        FROM series GROUP BY event_type),
      cum AS (
        SELECT s.event_type, s.h, t.n_hours, t.total_events,
               CAST(SUM(t.n_hours * s.x - t.total_events) OVER (
                 PARTITION BY s.event_type ORDER BY s.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM series s JOIN tots t USING (event_type)),
      mx AS (
        SELECT event_type, MAX(ABS(cum)) AS m FROM cum GROUP BY 1),
      peaks AS (
        SELECT c.event_type, MIN(c.h) AS peak_h
        FROM cum c JOIN mx USING (event_type)
        WHERE ABS(c.cum) = mx.m GROUP BY c.event_type)
      SELECT c.event_type, c.n_hours, c.total_events, p.peak_h,
             c.cum AS cusum_peak
      FROM cum c JOIN peaks p
        ON c.event_type = p.event_type AND c.h = p.peak_h
      ORDER BY c.event_type"""))

  /** Poisson-bootstrap confidence interval for the mean purchase
    * value — the distributed bootstrap (Chamandy et al.'s Poisson
    * approximation): instead of multinomial resampling (which needs
    * global coordination), each row independently draws a
    * Poisson(1) weight per replicate, so the 100 replicate sums
    * partial-aggregate map-side and the shuffle carries 100 partials
    * per partition regardless of corpus size. The draws are
    * DETERMINISTIC — uniform micro-integers from the engine's md5
    * fingerprint of (event_id, replicate), inverted through the
    * Poisson(1) CDF as fixed integer thresholds — so DuckDB rebuilds
    * the IDENTICAL resample and the gate hash-matches the whole CI,
    * not a distributional property. Replicate means and the CI
    * endpoints (3rd / 98th order statistics of 100 means — the 2.5%
    * and 97.5% percentile bootstrap) stay in exact integer micro-units
    * under floor division; the final sort is a bounded 100-element
    * array, never a corpus sort. */
  val qStatsBootstrap = Q(
    "q_stats_bootstrap",
    (s, dir) => {
      val x = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          expr("cast(round(value * 1000000) as bigint)").as("x"))
      val reps = s.range(0, 100).toDF("b")
      val u = pmod(graft.functions.TextFunctions.md5Bits(
        concat(col("event_id").cast("string"), lit(":"),
          col("b").cast("string"))).getField("h"), lit(1000000L))
      val w = when(u < 367879L, 0L).when(u < 735759L, 1L)
        .when(u < 919699L, 2L).when(u < 980830L, 3L)
        .when(u < 996340L, 4L).when(u < 999406L, 5L).otherwise(6L)
      val means = x.crossJoin(reps)
        .select(col("b"), col("x"), w.as("w"))
        .groupBy(col("b"))
        .agg(sum(col("w")).as("sw"), sum(col("w") * col("x")).as("swx"))
        .select(expr("CAST(swx DIV sw AS BIGINT)").as("mean_micro"))
        // exactly |reps| rows by construction; the explicit limit puts
        // that bound IN-PLAN so the collect_list below is provably
        // bounded (the PlanAudit contract), order-irrelevant under
        // sort_array
        .limit(100)
      val ci = means.agg(sort_array(collect_list(col("mean_micro")))
          .as("ms"))
        .select(element_at(col("ms"), 3).as("ci_lo_micro"),
          element_at(col("ms"), 98).as("ci_hi_micro"))
      x.agg(count(lit(1)).as("n_obs"), sum(col("x")).as("sx"))
        .crossJoin(ci)
        .select(col("n_obs"),
          expr("CAST(sx DIV n_obs AS BIGINT)").as("mean_micro"),
          col("ci_lo_micro"), col("ci_hi_micro"),
          lit(100L).as("n_replicates"))
    },
    Some("""
      WITH x AS (
        SELECT event_id, CAST(ROUND(value * 1000000) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'),
      reps AS (SELECT unnest(range(0, 100)) AS b),
      draws AS (
        SELECT b, x,
               CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                 || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS u
        FROM x CROSS JOIN reps),
      weighted AS (
        SELECT b, x,
               CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                    WHEN u < 919699 THEN 2 WHEN u < 980830 THEN 3
                    WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
                    ELSE 6 END AS w
        FROM draws),
      r AS (SELECT b, CAST(SUM(w) AS BIGINT) AS sw,
                   CAST(SUM(w * x) AS BIGINT) AS swx
            FROM weighted GROUP BY b),
      means AS (SELECT swx // sw AS mean_micro FROM r),
      ms AS (SELECT list_sort(list(mean_micro)) AS l FROM means),
      base AS (SELECT COUNT(*) AS n_obs, CAST(SUM(x) AS BIGINT) AS sx
               FROM x)
      SELECT n_obs, sx // n_obs AS mean_micro,
             l[3] AS ci_lo_micro, l[98] AS ci_hi_micro,
             CAST(100 AS BIGINT) AS n_replicates
      FROM base CROSS JOIN ms"""))

  /** Hour-of-day seasonality strength per event type — the variance
    * decomposition (between-hour-of-day sum of squares over total sum
    * of squares, the η² a forecaster checks before choosing a seasonal
    * model) plus the peak hour-of-day. Over the ZERO-FILLED hourly
    * series (absent hours are real zero counts), so the decomposition
    * sees the true daily profile. Exactness discipline: both sums of
    * squares are defined WITH explicit ×10⁶ floor divisions
    * (SSB = Σ_g ⌊S_g²·10⁶/n_g⌋ − ⌊S²·10⁶/n⌋, SST = Sxx·10⁶ − ⌊S²·10⁶/n⌋)
    * so every intermediate is an exact BIGINT the oracle replicates
    * term-for-term — no order-dependent double summation; the one
    * double division rounds at 6. Peak-hour means compare as floor
    * micro-means with a min-hod tie-break. Scale shape: corpus work is
    * the hourly exchange; the 24×|types| profile and per-type scalars
    * are bounded. */
  val qTsSeasonality = Q(
    "q_ts_seasonality",
    (s, dir) => {
      val series = hourlySeriesByType(s, dir)
        .select(col("event_type"), hour(col("h")).cast("long").as("hod"),
          col("x"))
      val byHod = series.groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"))
      val tot = series.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("ss"),
          sum(col("x") * col("x")).as("sxx"))
      val ssb = byHod.groupBy(col("event_type"))
        .agg(sum(expr("CAST(sg * sg * 1000000 DIV ng AS BIGINT)"))
          .as("ssb_raw"))
      val meanHod = byHod
        .select(col("event_type"), col("hod"),
          expr("CAST(sg * 1000000 DIV ng AS BIGINT)").as("mean_micro"))
      val mxMean = meanHod.groupBy(col("event_type"))
        .agg(max(col("mean_micro")).as("mm"))
      val peak = meanHod.join(mxMean, Seq("event_type"))
        .filter(col("mean_micro") === col("mm"))
        .groupBy(col("event_type"))
        .agg(min(col("hod")).as("peak_hod"), max(col("mm"))
          .as("peak_mean_micro"))
      tot.join(ssb, Seq("event_type")).join(peak, Seq("event_type"))
        .select(col("event_type"), col("n").as("n_hours"),
          col("peak_hod"), col("peak_mean_micro"),
          round(
            (col("ssb_raw") - expr("CAST(ss * ss * 1000000 DIV n AS BIGINT)"))
              .cast("double") /
            (col("sxx") * lit(1000000L) -
              expr("CAST(ss * ss * 1000000 DIV n AS BIGINT)"))
              .cast("double"), 6).as("seasonality_strength"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH ${hourlySeriesByTypeSql},
      hseries AS (
        SELECT event_type, CAST(hour(h) AS BIGINT) AS hod, x
        FROM series),
      by_hod AS (
        SELECT event_type, hod, COUNT(*) AS ng,
               CAST(SUM(x) AS BIGINT) AS sg
        FROM hseries GROUP BY 1, 2),
      tot AS (
        SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS ss,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM hseries GROUP BY 1),
      ssb AS (
        SELECT event_type,
               CAST(SUM(sg * sg * 1000000 // ng) AS BIGINT) AS ssb_raw
        FROM by_hod GROUP BY 1),
      mean_hod AS (
        SELECT event_type, hod,
               CAST(sg * 1000000 // ng AS BIGINT) AS mean_micro
        FROM by_hod),
      mx AS (SELECT event_type, MAX(mean_micro) AS mm
             FROM mean_hod GROUP BY 1),
      peak AS (
        SELECT m.event_type, MIN(m.hod) AS peak_hod,
               MAX(mx.mm) AS peak_mean_micro
        FROM mean_hod m JOIN mx USING (event_type)
        WHERE m.mean_micro = mx.mm GROUP BY m.event_type)
      SELECT t.event_type, t.n AS n_hours, p.peak_hod, p.peak_mean_micro,
             ROUND(CAST(s.ssb_raw - (t.ss * t.ss * 1000000 // t.n)
                     AS DOUBLE) /
                   CAST(t.sxx * 1000000 - (t.ss * t.ss * 1000000 // t.n)
                     AS DOUBLE), 6) AS seasonality_strength
      FROM tot t JOIN ssb s USING (event_type)
      JOIN peak p USING (event_type)
      ORDER BY t.event_type"""))

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

  /** Seasonally-adjusted anomaly screen — flag hours whose count is
    * more than 3σ away from their OWN hour-of-day mean (per event
    * type): the screen [[qTsSeasonality]]'s decomposition exists to
    * enable, catching anomalies a global z-score misses (a quiet-hour
    * burst hides under the daily cycle) and un-flagging ordinary
    * daily peaks a global screen false-alarms on. Exact integer
    * discipline throughout: residuals in milli-units against floor
    * hod-means, and the 3σ test as the cross-multiplication
    * resid²·n > 9·Σresid² — no variance division, no sqrt, every
    * comparison BIGINT. Scale shape: one corpus hourly exchange
    * (the shared zero-filled series), bounded hod/means tables,
    * flags computed in-row. */
  val qTsAnomalySeasonal = Q(
    "q_ts_anomaly_seasonal",
    (s, dir) => {
      val series = hourlySeriesByType(s, dir)
        .select(col("event_type"), col("h"),
          hour(col("h")).cast("long").as("hod"), col("x"))
      val hodMean = series.groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"))
        .select(col("event_type"), col("hod"),
          expr("CAST(sg * 1000 DIV ng AS BIGINT)").as("mean_milli"))
      val resid = series.join(hodMean, Seq("event_type", "hod"))
        .select(col("event_type"), col("h"), col("x"),
          (col("x") * lit(1000L) - col("mean_milli")).as("resid_milli"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val disp = resid.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("resid_milli") * col("resid_milli")).as("ssr"))
      QueryScopedCache.releaseAfter(
        resid.join(disp, Seq("event_type"))
          .filter(col("resid_milli") * col("resid_milli") * col("n") >
            col("ssr") * lit(9L))
          .select(col("event_type"), col("h"), col("x"),
            col("resid_milli"))
          .orderBy(col("event_type"), col("h")),
        Seq(resid))
    },
    Some(s"""
      WITH ${hourlySeriesByTypeSql},
      hseries AS (
        SELECT event_type, h, CAST(hour(h) AS BIGINT) AS hod, x
        FROM series),
      hod_mean AS (
        SELECT event_type, hod,
               CAST(CAST(SUM(x) AS BIGINT) * 1000 // COUNT(*) AS BIGINT)
                 AS mean_milli
        FROM hseries GROUP BY 1, 2),
      resid AS (
        SELECT s.event_type, s.h, s.x,
               s.x * 1000 - m.mean_milli AS resid_milli
        FROM hseries s JOIN hod_mean m USING (event_type, hod)),
      disp AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(resid_milli * resid_milli) AS BIGINT) AS ssr
        FROM resid GROUP BY 1)
      SELECT r.event_type, r.h, r.x, r.resid_milli
      FROM resid r JOIN disp d USING (event_type)
      WHERE r.resid_milli * r.resid_milli * d.n > d.ssr * 9
      ORDER BY r.event_type, r.h"""))

  /** Mann–Whitney U rank screen, one-vs-rest per event type over the
    * event `value` column: does this type's value distribution sit
    * systematically above or below everything else? The nonparametric
    * A/B cousin of [[qStatsAbtest]] (no normality assumption — pure
    * rank statistics), and the standard robust screen for "does
    * segment X behave differently" before any model sees the data.
    *
    * One-vs-rest means the pooled sample IS the whole column, so ONE
    * global midrank table serves every group — and the global ranking
    * needs no partition-less window: distinct values are counted once
    * (`2·midrank(v) = 2·#{<v} + #{=v} + 1`, an exact integer) with
    * `#{<v}` from [[graft.operators.OrderStatistics.countByRank]] —
    * the bucketed two-level prefix scan, one hash exchange, no global
    * sort. U stays integer (doubled: `U2 = Σ 2·midrank − n_g(n_g+1)`)
    * and is gated exactly; only the final tie-corrected z-score is a
    * rounded double (both engines evaluate the identical IEEE
    * expression over the same BIGINT inputs). Rank sums accumulate in
    * DECIMAL(25,0) — at corpus scale Σ2·midrank reaches 2N² long
    * before BIGINT wraps ([[qStatsSpearman]] discipline).
    *
    * Scale shape: one exchange to count value multiplicities, one
    * bucketed countByRank pass, a value-keyed join back (values are
    * near-unique — no skew), one group aggregation; the one-row
    * (N, tie-term) scalar rides a broadcast cross join. */
  val qStatsMannWhitney = Q(
    "q_stats_mannwhitney",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("v"))
      val vals = ev.groupBy(col("v")).agg(count(lit(1)).as("c"))
      val lt = graft.operators.OrderStatistics.countByRank(
          ev.select(col("v")),
          vals.select(col("v").as("user_id"), lit(0L).as("session_idx"),
            col("v").as("q")),
          inclusive = false)
        .select(col("user_id").as("v"), col("cnt").as("n_lt"))
      val mid = vals.join(lt, Seq("v"))
        .select(col("v"),
          (lit(2) * col("n_lt") + col("c") + lit(1)).as("mr2"))
      val tot = vals.agg(sum(col("c")).as("nn"),
        sum(expr("cast(c as decimal(25,0)) * c * c - c")).as("tie_t"))
      ev.join(mid, Seq("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_g"),
          sum(expr("cast(mr2 as decimal(25,0))")).as("r2"))
        .crossJoin(broadcast(tot))
        .withColumn("u2",
          col("r2").cast("long") - col("n_g") * (col("n_g") + 1))
        .withColumn("nb", col("nn") - col("n_g"))
        .select(col("event_type"), col("n_g"), col("u2"),
          round((col("u2") - col("n_g") * col("nb")).cast("double") /
            (lit(2.0) * sqrt(
              (col("n_g") * col("nb")).cast("double") / lit(12.0) *
              ((col("nn") + 1).cast("double") -
                col("tie_t").cast("double") /
                (col("nn") * (col("nn") - 1)).cast("double")))), 6)
            .as("z"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH ev AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events),
      vals AS (SELECT v, COUNT(*) AS c FROM ev GROUP BY v),
      cum AS (
        SELECT v, c,
               COALESCE(CAST(SUM(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS n_lt
        FROM vals),
      mid AS (SELECT v, 2 * n_lt + c + 1 AS mr2 FROM cum),
      tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS nn,
               SUM(CAST(c AS DECIMAL(25,0)) * c * c - c) AS tie_t
        FROM vals),
      grp AS (
        SELECT e.event_type, COUNT(*) AS n_g,
               SUM(CAST(m.mr2 AS DECIMAL(25,0))) AS r2
        FROM ev e JOIN mid m USING (v) GROUP BY 1),
      fin AS (
        SELECT g.event_type, g.n_g,
               CAST(g.r2 AS BIGINT) - g.n_g * (g.n_g + 1) AS u2,
               t.nn - g.n_g AS nb, t.nn AS nn, t.tie_t AS tie_t
        FROM grp g CROSS JOIN tot t)
      SELECT event_type, n_g, u2,
             ROUND(CAST(u2 - n_g * nb AS DOUBLE) /
                   (2.0 * SQRT(CAST(n_g * nb AS DOUBLE) / 12.0 *
                     (CAST(nn + 1 AS DOUBLE) -
                      CAST(tie_t AS DOUBLE) /
                      CAST(nn * (nn - 1) AS DOUBLE)))), 6) AS z
      FROM fin ORDER BY event_type"""))

  /** Lead-lag cross-correlation between two event streams — the
    * hourly click series against the hourly purchase series at lags
    * −12…+12: at which offset does one stream best predict the other
    * (positive lag k = clicks now vs purchases k hours LATER — the
    * conversion-delay detector)? [[qTsAcf]]'s machinery pointed at a
    * PAIR of series; unlike ACF's symmetric normalizer, each lag here
    * is a full Pearson over the overlapping window (per-lag sums on
    * both sides), so r ∈ [−1, 1] exactly.
    *
    * Both series zero-fill on one SHARED hour grid (absent hours are
    * real zero counts), so lags align by integer hour index. All six
    * per-lag sums are BIGINT; the only double is the final rounded
    * correlation, evaluated as the identical IEEE expression in both
    * engines. Scale shape: the corpus-scale work is one hourly
    * count exchange; the 25-row lag table cross-joins only the
    * bounded hourly series, and each lag's alignment is an integer
    * equi-join on the hour index — no windows at all. */
  val qTsXcorr = Q(
    "q_ts_xcorr",
    (s, dir) => {
      val hourly = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("x"))
      val span = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val tixed = span
        .select(col("h0"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        .select(
          expr("(unix_micros(h) - unix_micros(h0)) div 3600000000")
            .as("tix"),
          col("h"))
      val sa = tixed
        .join(hourly.filter(col("event_type") === "click")
          .select(col("h"), col("x")), Seq("h"), "left")
        .select(col("tix"), coalesce(col("x"), lit(0L)).as("xa"))
      val sb = tixed
        .join(hourly.filter(col("event_type") === "purchase")
          .select(col("h"), col("x")), Seq("h"), "left")
        .select(col("tix").as("tj"), coalesce(col("x"), lit(0L)).as("xb"))
      val lags = s.range(-12, 13).toDF("k")
      sa.crossJoin(lags)
        .select(col("k"), (col("tix") + col("k")).as("tj"), col("xa"))
        .join(sb, Seq("tj"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("xa") * col("xb")).as("sab"),
          sum(col("xa")).as("sa"), sum(col("xb")).as("sb"),
          sum(col("xa") * col("xa")).as("saa"),
          sum(col("xb") * col("xb")).as("sbb"))
        .select(col("k").as("lag"), col("n_pairs"),
          round(
            (col("n_pairs") * col("sab") - col("sa") * col("sb"))
              .cast("double") /
            sqrt(
              (col("n_pairs") * col("saa") - col("sa") * col("sa"))
                .cast("double") *
              (col("n_pairs") * col("sbb") - col("sb") * col("sb"))
                .cast("double")), 6).as("r"))
        .orderBy(col("lag"))
    },
    Some("""
      WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS x
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2),
      span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
      tixed AS (
        SELECT CAST((epoch_us(h) - epoch_us(h0)) // 3600000000
                 AS BIGINT) AS tix, h
        FROM (SELECT h0, unnest([g for g in
                generate_series(h0, h1, INTERVAL 1 HOUR)]) AS h
              FROM span)),
      sa AS (
        SELECT t.tix, COALESCE(a.x, 0) AS xa
        FROM tixed t LEFT JOIN (
          SELECT h, x FROM hourly WHERE event_type = 'click') a
          USING (h)),
      sb AS (
        SELECT t.tix AS tj, COALESCE(b.x, 0) AS xb
        FROM tixed t LEFT JOIN (
          SELECT h, x FROM hourly WHERE event_type = 'purchase') b
          USING (h)),
      lags AS (SELECT unnest(range(-12, 13)) AS k),
      j AS (
        SELECT l.k, COUNT(*) AS n_pairs,
               CAST(SUM(a.xa * b.xb) AS BIGINT) AS sab,
               CAST(SUM(a.xa) AS BIGINT) AS sa,
               CAST(SUM(b.xb) AS BIGINT) AS sb,
               CAST(SUM(a.xa * a.xa) AS BIGINT) AS saa,
               CAST(SUM(b.xb * b.xb) AS BIGINT) AS sbb
        FROM sa a CROSS JOIN lags l JOIN sb b ON b.tj = a.tix + l.k
        GROUP BY l.k)
      SELECT k AS lag, n_pairs,
             ROUND(CAST(n_pairs * sab - sa * sb AS DOUBLE) /
                   SQRT(CAST(n_pairs * saa - sa * sa AS DOUBLE) *
                        CAST(n_pairs * sbb - sb * sb AS DOUBLE)), 6)
               AS r
      FROM j ORDER BY lag"""))

  /** Kruskal–Wallis omnibus rank test across ALL event types over the
    * event `value` column — the k-group generalization of
    * [[qStatsMannWhitney]]: are the k per-type value distributions
    * drawn from one population, or does at least one sit apart? The
    * screen that decides whether any per-segment analysis is worth
    * running at all, before k·(k−1)/2 pairwise U tests.
    *
    * Reuses the Mann–Whitney midrank machinery verbatim: ONE global
    * midrank table (doubled midranks stay integer; `#{<v}` from
    * [[graft.operators.OrderStatistics.countByRank]] — no
    * partition-less window), per-group doubled rank sums R2_g
    * accumulate in DECIMAL(25,0) and gate exactly. With R_g = R2_g/2,
    *   H = 12/(N(N+1)) Σ R_g²/n_g − 3(N+1)
    *     = 3/(N(N+1)) Σ R2_g²/n_g − 3(N+1),
    * and the tie-corrected H' = H / (1 − Σ(c³−c)/(N³−N)). The
    * per-group term R2_g²/n_g is the one division — rounded to 3
    * decimals then DECIMAL-summed ([[qTextLogprob]] discipline), so
    * the cross-group reduction is order-independent in both engines;
    * H/H' are single rounded IEEE expressions over gated inputs.
    *
    * Scale shape: identical to Mann–Whitney — one value-multiplicity
    * exchange, one bucketed countByRank pass, a value-keyed join
    * back, one k-row group aggregate; the k-row statistic reduction
    * and the one-row (N, tie) scalar are broadcast-sized. */
  val qStatsKruskal = Q(
    "q_stats_kruskal",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("v"))
      val vals = ev.groupBy(col("v")).agg(count(lit(1)).as("c"))
      val lt = graft.operators.OrderStatistics.countByRank(
          ev.select(col("v")),
          vals.select(col("v").as("user_id"), lit(0L).as("session_idx"),
            col("v").as("q")),
          inclusive = false)
        .select(col("user_id").as("v"), col("cnt").as("n_lt"))
      val mid = vals.join(lt, Seq("v"))
        .select(col("v"),
          (lit(2) * col("n_lt") + col("c") + lit(1)).as("mr2"))
      val tot = vals.agg(sum(col("c")).as("nn"),
        sum(expr("cast(c as decimal(25,0)) * c * c - c")).as("tie_t"))
      // grp is consumed twice (the k-row scalar AND the output rows);
      // persist the k-row result so the corpus-scale midrank join
      // runs once, released by the first action on the result.
      val grp = ev.join(mid, Seq("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_g"),
          sum(expr("cast(mr2 as decimal(25,0))")).as("r2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sAgg = grp.agg(count(lit(1)).as("k"),
        sum(expr("""cast(round(cast(r2 as double) * cast(r2 as double)
                    / n_g, 3) as decimal(25,3))""")).as("s"))
      val out = grp.select(col("event_type"), col("n_g"),
          col("r2").cast("long").as("r2"))
        .crossJoin(broadcast(sAgg.crossJoin(tot)
          .select(col("k"),
            round(lit(3.0) * col("s").cast("double") /
              (col("nn") * (col("nn") + 1)).cast("double") -
              lit(3.0) * (col("nn") + 1).cast("double"), 6).as("h"),
            round((lit(3.0) * col("s").cast("double") /
              (col("nn") * (col("nn") + 1)).cast("double") -
              lit(3.0) * (col("nn") + 1).cast("double")) /
              (lit(1.0) - col("tie_t").cast("double") /
                (col("nn").cast("decimal(25,0)") * col("nn") * col("nn")
                  - col("nn")).cast("double")), 6).as("h_corr"))))
        .select(col("event_type"), col("n_g"), col("r2"), col("k"),
          col("h"), col("h_corr"))
        .orderBy(col("event_type"))
      QueryScopedCache.releaseAfter(out, Seq(grp))
    },
    Some("""
      WITH ev AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events),
      vals AS (SELECT v, COUNT(*) AS c FROM ev GROUP BY v),
      cum AS (
        SELECT v, c,
               COALESCE(CAST(SUM(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS n_lt
        FROM vals),
      mid AS (SELECT v, 2 * n_lt + c + 1 AS mr2 FROM cum),
      tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS nn,
               SUM(CAST(c AS DECIMAL(25,0)) * c * c - c) AS tie_t
        FROM vals),
      grp AS (
        SELECT e.event_type, COUNT(*) AS n_g,
               SUM(CAST(m.mr2 AS DECIMAL(25,0))) AS r2
        FROM ev e JOIN mid m USING (v) GROUP BY 1),
      sagg AS (
        SELECT COUNT(*) AS k,
               SUM(CAST(ROUND(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
                   / n_g, 3) AS DECIMAL(25,3))) AS s
        FROM grp),
      fin AS (
        SELECT a.k,
               ROUND(3.0 * CAST(a.s AS DOUBLE) /
                 CAST(t.nn * (t.nn + 1) AS DOUBLE) -
                 3.0 * CAST(t.nn + 1 AS DOUBLE), 6) AS h,
               ROUND((3.0 * CAST(a.s AS DOUBLE) /
                 CAST(t.nn * (t.nn + 1) AS DOUBLE) -
                 3.0 * CAST(t.nn + 1 AS DOUBLE)) /
                 (1.0 - CAST(t.tie_t AS DOUBLE) /
                   CAST(CAST(t.nn AS DECIMAL(25,0)) * t.nn * t.nn - t.nn
                     AS DOUBLE)), 6) AS h_corr
        FROM sagg a CROSS JOIN tot t)
      SELECT g.event_type, g.n_g, CAST(g.r2 AS BIGINT) AS r2,
             f.k, f.h, f.h_corr
      FROM grp g CROSS JOIN fin f
      ORDER BY g.event_type"""))

  /** Largest-Triangle-Three-Buckets downsampling of the hourly event
    * series to ~60 visually-representative points — the what-does-a-
    * year-of-telemetry-look-like operator behind every dashboard that
    * cannot ship 10⁶ points to a browser. Classic LTTB chains each
    * bucket's pick to the PREVIOUS pick (inherently sequential), so
    * the engine implements the parallel mean-anchor variant: each
    * interior bucket keeps the point maximizing the triangle area
    * against the MEAN of the previous bucket and the MEAN of the next
    * bucket; the global first/last points are kept verbatim (the LTTB
    * edge rule). Dropping the pick-chain is what makes the operator
    * one window pass instead of a driver loop — the standard
    * large-scale LTTB decomposition.
    *
    * Exactness: with P=(Σt,Σx,n_p) the prev anchor sums, Q likewise
    * next, and candidate B=(t,x), the doubled area scaled by n_p·n_q,
    *   |（Pt−t·n_p)(Qx−x·n_q) − (Px−x·n_p)(Qt−t·n_q)|,
    * is pure BIGINT — no float ever enters the ranking, so the
    * argmax (area DESC, t ASC) is total and both engines pick
    * identical points. Buckets assign by integer `tix*60 div span`.
    *
    * Scale shape: one hourly count exchange, one bucket aggregate
    * (60 rows) with lag/lead anchors on the bounded bucket table, a
    * bucket-keyed join back, and a per-bucket (never global) argmax
    * window. The raw series crosses the wire once. */
  val qTsLttb = Q(
    "q_ts_lttb",
    (s, dir) => {
      val hourly = t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("x"))
      val span = hourly.agg(min(col("h")).as("h0"),
        unix_micros(max(col("h"))).as("u1"))
      val pts = hourly.crossJoin(broadcast(span))
        .select(
          expr("(unix_micros(h) - unix_micros(h0)) div 3600000000")
            .as("tix"),
          expr("(u1 - unix_micros(h0)) div 3600000000 + 1").as("ntix"),
          col("h"), col("x"))
        .select(col("tix"), col("h"), col("x"),
          expr("tix * 60 div ntix").as("b"))
      // Neighbor anchors WITHOUT a partition-less window: the ≤60-row
      // bucket table (b ∈ [0,59] by construction; limit(61) states
      // the bound mechanically) collapses to ONE sorted array row,
      // prev/next context is array indexing inside codegen, and
      // explode rebuilds the bounded ctx table.
      val anchors = pts.groupBy(col("b"))
        .agg(sum(col("tix")).as("st"), sum(col("x")).as("sx"),
          count(lit(1)).as("n"))
        .limit(61)
        .agg(sort_array(collect_list(struct(
          col("b"), col("st"), col("sx"), col("n")))).as("a"))
      val ctx = anchors
        .select(col("a"), posexplode(col("a")).as(Seq("i", "c")))
        .select(col("c.b").as("b"),
          expr("try_element_at(a, nullif(i, 0))").as("p"),
          expr("try_element_at(a, i + 2)").as("q"))
        .select(col("b"), col("p.st").as("pt"), col("p.sx").as("px"),
          col("p.n").as("pn"), col("q.st").as("qt"),
          col("q.sx").as("qx"), col("q.n").as("qn"))
      val lim = pts.agg(min(col("b")).as("b_lo"), max(col("b")).as("b_hi"))
      val tagged = pts.crossJoin(broadcast(lim))
      val interior = tagged
        .filter(col("b") =!= col("b_lo") && col("b") =!= col("b_hi"))
        .join(broadcast(ctx), Seq("b"))
        .withColumn("area2", abs(
          (col("pt") - col("tix") * col("pn")) *
            (col("qx") - col("x") * col("qn")) -
          (col("px") - col("x") * col("pn")) *
            (col("qt") - col("tix") * col("qn"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("b")).orderBy(
            col("area2").desc, col("tix"))))
        .filter(col("rn") === 1)
        .select(col("b"), col("tix"), col("h"), col("x"), col("area2"))
      val edges = tagged
        .filter(col("b") === col("b_lo") || col("b") === col("b_hi"))
        .groupBy(col("b"))
        .agg(min_by(struct(col("tix"), col("h"), col("x")),
          when(col("b") === col("b_lo"), col("tix"))
            .otherwise(-col("tix"))).as("pick"))
        .select(col("b"), col("pick.tix").as("tix"),
          col("pick.h").as("h"), col("pick.x").as("x"),
          lit(null).cast("long").as("area2"))
      interior.unionByName(edges).orderBy(col("b"))
    },
    Some("""
      WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x
        FROM events GROUP BY 1),
      span AS (
        SELECT MIN(h) AS h0, epoch_us(MAX(h)) AS u1 FROM hourly),
      pts AS (
        SELECT (epoch_us(h) - epoch_us(h0)) // 3600000000 AS tix,
               h, x,
               ((epoch_us(h) - epoch_us(h0)) // 3600000000) * 60 //
                 ((u1 - epoch_us(h0)) // 3600000000 + 1) AS b
        FROM hourly CROSS JOIN span),
      anchors AS (
        SELECT b, CAST(SUM(tix) AS BIGINT) AS st,
               CAST(SUM(x) AS BIGINT) AS sx, COUNT(*) AS n
        FROM pts GROUP BY b),
      ctx AS (
        SELECT b,
               LAG(st, 1) OVER w AS pt, LAG(sx, 1) OVER w AS px,
               LAG(n, 1) OVER w AS pn,
               LEAD(st, 1) OVER w AS qt, LEAD(sx, 1) OVER w AS qx,
               LEAD(n, 1) OVER w AS qn
        FROM anchors WINDOW w AS (ORDER BY b)),
      lim AS (SELECT MIN(b) AS b_lo, MAX(b) AS b_hi FROM pts),
      scored AS (
        SELECT p.b, p.tix, p.h, p.x,
               CASE WHEN p.b = l.b_lo OR p.b = l.b_hi
                    THEN CAST(NULL AS BIGINT)
                    ELSE abs((c.pt - p.tix * c.pn) * (c.qx - p.x * c.qn)
                           - (c.px - p.x * c.pn) * (c.qt - p.tix * c.qn))
               END AS area2,
               l.b_lo, l.b_hi
        FROM pts p JOIN ctx c USING (b) CROSS JOIN lim l),
      ranked AS (
        SELECT b, tix, h, x, area2, b_lo, b_hi,
               ROW_NUMBER() OVER (PARTITION BY b
                 ORDER BY area2 DESC NULLS LAST, tix) AS rn,
               ROW_NUMBER() OVER (PARTITION BY b
                 ORDER BY CASE WHEN b = b_lo THEN tix ELSE -tix END)
                 AS edge_rank
        FROM scored)
      SELECT b, tix, h, x, area2 FROM ranked
      WHERE CASE WHEN b = b_lo OR b = b_hi THEN edge_rank = 1
                 ELSE rn = 1 END
      ORDER BY b"""))

  /** Kendall τ-b rank correlation between event value and hour of day
    * — the fully tie-corrected concordance statistic ("do higher
    * values land later in the day?"), the third rank-correlation
    * family member after [[qStatsSpearman]] (midranks) and
    * [[qStatsMannWhitney]] (two-sample U): τ-b is the one that stays
    * honest under massive ties, which a 24-valued hour column
    * guarantees.
    *
    * Pair-free decomposition: aggregate to (x, y, c) cells, then count
    * concordant/discordant PAIRS through per-y strict prefix counts
    * F_y(x−) = #{points: y'' = y, x'' < x} — each pair counted once at
    * its higher-x cell: C = Σ_cell c · Σ_{y'<y} F_{y'}(x−), D likewise
    * over y' > y. F comes from ONE weighted
    * [[graft.operators.OrderStatistics.prefixSumByRank]] pass over the
    * composite key y·2⁴² + x (the [[qStatsGini]] encoding; x < 2⁴²
    * asserted by the value domain, hour < 2⁶) minus the 24-row
    * cumulative-y marginal — O(N log N), no pair join, no window
    * anywhere on the Spark side. Products cast to DECIMAL(25,0)
    * BEFORE multiplying ([[qStatsRegression]] overflow discipline);
    * C, D, and both doubled tie terms gate as exact integers; τ-b is
    * one rounded IEEE expression over them.
    *
    * Scale shape: one cell exchange, one bucketed prefix pass, a
    * 24-way bounded fan-out join back on x, and three one-row/24-row
    * broadcast marginals. The event stream crosses the wire once. */
  val qStatsKendall = Q(
    "q_stats_kendall",
    (s, dir) => {
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val K = lit(1L << 42)
      val ev = t(s, dir, "events").select(
        expr("cast(round(value * 100) as bigint)").as("x"),
        hour(col("ts")).cast("long").as("y"))
      val cells = ev.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("c"))
        .persist(MEMORY_AND_DISK)
      val mx = cells.groupBy(col("x")).agg(sum(col("c")).as("cx"))
      val my = cells.groupBy(col("y")).agg(sum(col("c")).as("cy"))
      val cumy = my.as("a")
        .join(broadcast(my.as("b")), col("b.y") < col("a.y"), "left")
        .groupBy(col("a.y"))
        .agg(coalesce(sum(col("b.cy")), lit(0L)).as("cum"))
        .select(col("y").as("yp"), col("cum"))
      val yps = s.range(0, 24).toDF("yp")
      val probes = mx.select(col("x")).crossJoin(broadcast(yps))
      val f = graft.operators.OrderStatistics.prefixSumByRank(
          cells.select((col("y") * K + col("x")).as("v"),
            col("c").as("w")),
          probes.select(col("x").as("user_id"),
            col("yp").as("session_idx"),
            (col("yp") * K + col("x")).as("q")),
          inclusive = false)
        .select(col("user_id").as("x"), col("session_idx").as("yp"),
          col("wsum"))
        .join(broadcast(cumy), Seq("yp"))
        .select(col("x"), col("yp"), (col("wsum") - col("cum")).as("fl"))
      val cd = cells.join(f, Seq("x"))
        .agg(
          sum(when(col("yp") < col("y"),
            col("c").cast(DecimalType(25, 0)) * col("fl"))
            .otherwise(lit(0).cast(DecimalType(25, 0)))).as("conc"),
          sum(when(col("yp") > col("y"),
            col("c").cast(DecimalType(25, 0)) * col("fl"))
            .otherwise(lit(0).cast(DecimalType(25, 0)))).as("disc"))
      val margx = mx.agg(sum(col("cx")).as("n"),
        sum(col("cx").cast(DecimalType(25, 0)) * (col("cx") - 1))
          .as("n1_2"))
      val margy = my.agg(
        sum(col("cy").cast(DecimalType(25, 0)) * (col("cy") - 1))
          .as("n2_2"))
      val out = cd.crossJoin(broadcast(margx)).crossJoin(broadcast(margy))
        .select(col("n"),
          col("conc").cast("long").as("conc"),
          col("disc").cast("long").as("disc"),
          round((col("conc") - col("disc")).cast("double") /
            sqrt(
              (col("n").cast("double") * (col("n") - 1).cast("double") -
                col("n1_2").cast("double")) / lit(2.0) *
              ((col("n").cast("double") * (col("n") - 1).cast("double") -
                col("n2_2").cast("double")) / lit(2.0))), 6).as("tau_b"))
      QueryScopedCache.releaseAfter(out, Seq(cells))
    },
    Some("""
      WITH ev AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
               CAST(hour(ts) AS BIGINT) AS y
        FROM events),
      cells AS (SELECT x, y, COUNT(*) AS c FROM ev GROUP BY 1, 2),
      mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx
             FROM cells GROUP BY x),
      my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy
             FROM cells GROUP BY y),
      probes AS (
        SELECT t1.x, t2.yp FROM (SELECT DISTINCT x FROM cells) t1
        CROSS JOIN (SELECT unnest(range(0, 24)) AS yp) t2),
      u AS (
        SELECT y AS yy, x, c, 0 AS probe FROM cells
        UNION ALL
        SELECT yp AS yy, x, 0 AS c, 1 AS probe FROM probes),
      f0 AS (
        SELECT yy, x, probe,
               COALESCE(CAST(SUM(c) OVER (PARTITION BY yy
                 ORDER BY x ASC, probe DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT), 0) AS fl
        FROM u),
      f AS (SELECT yy AS yp, x, fl FROM f0 WHERE probe = 1),
      cd AS (
        SELECT SUM(CASE WHEN f.yp < cl.y
                 THEN CAST(cl.c AS DECIMAL(25,0)) * f.fl
                 ELSE CAST(0 AS DECIMAL(25,0)) END) AS conc,
               SUM(CASE WHEN f.yp > cl.y
                 THEN CAST(cl.c AS DECIMAL(25,0)) * f.fl
                 ELSE CAST(0 AS DECIMAL(25,0)) END) AS disc
        FROM cells cl JOIN f ON f.x = cl.x),
      margx AS (
        SELECT CAST(SUM(cx) AS BIGINT) AS n,
               SUM(CAST(cx AS DECIMAL(25,0)) * (cx - 1)) AS n1_2
        FROM mx),
      margy AS (
        SELECT SUM(CAST(cy AS DECIMAL(25,0)) * (cy - 1)) AS n2_2
        FROM my)
      SELECT x.n, CAST(c.conc AS BIGINT) AS conc,
             CAST(c.disc AS BIGINT) AS disc,
             ROUND(CAST(c.conc - c.disc AS DOUBLE) /
               SQRT((CAST(x.n AS DOUBLE) * CAST(x.n - 1 AS DOUBLE) -
                     CAST(x.n1_2 AS DOUBLE)) / 2.0 *
                    ((CAST(x.n AS DOUBLE) * CAST(x.n - 1 AS DOUBLE) -
                      CAST(y.n2_2 AS DOUBLE)) / 2.0)), 6) AS tau_b
      FROM cd c CROSS JOIN margx x CROSS JOIN margy y"""))

  /** Forecast-model backtest over the hourly event series — holds out
    * the final week and scores two deterministic forecasters on it:
    * NAIVE (tomorrow looks like the last observed hour, x(t−1)) vs
    * SEASONAL-NAIVE (tomorrow looks like the same hour last week,
    * x(t−168)) — the two baselines every forecasting deployment must
    * beat, and the model-selection readout ("is this series seasonal
    * enough that lag-168 beats lag-1?") that decides which one ships.
    * Per event type: holdout size, both SUM-of-absolute-error totals
    * (exact BIGINT — counts in, integers out), both MAEs as rounded
    * doubles, and the winner flag.
    *
    * Scale shape: the zero-filled per-type hourly spine
    * ([[hourlySeriesByType]]) indexes by integer hour; both forecast
    * alignments are (event_type, tix) equi-joins of the spine against
    * itself shifted +1 / +168 — no window, no explode; the spine
    * persists for its three consumers and everything lands on the
    * bounded event-type key. */
  val qTsForecast = Q(
    "q_ts_forecast",
    (s, dir) => {
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val series = hourlySeriesByType(s, dir)
      val base = series.groupBy(col("event_type"))
        .agg(unix_micros(min(col("h"))).as("u0"),
          unix_micros(max(col("h"))).as("u1"))
      val st = series.join(base, Seq("event_type"))
        .select(col("event_type"),
          expr("(unix_micros(h) - u0) div 3600000000").as("tix"),
          expr("(u1 - u0) div 3600000000").as("mxtix"), col("x"))
        .persist(MEMORY_AND_DISK)
      val test = st.filter(col("tix") > col("mxtix") - 168 &&
        col("tix") >= 168)
      val lag1 = st.select(col("event_type"),
        (col("tix") + 1).as("tix"), col("x").as("x1"))
      val lag168 = st.select(col("event_type"),
        (col("tix") + 168).as("tix"), col("x").as("x168"))
      val result = test
        .join(lag1, Seq("event_type", "tix"))
        .join(lag168, Seq("event_type", "tix"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_test"),
          sum(abs(col("x") - col("x1"))).as("sae_naive"),
          sum(abs(col("x") - col("x168"))).as("sae_snaive"))
        .select(col("event_type"), col("n_test"),
          col("sae_naive"), col("sae_snaive"),
          round(col("sae_naive").cast("double") /
            col("n_test").cast("double"), 6).as("mae_naive"),
          round(col("sae_snaive").cast("double") /
            col("n_test").cast("double"), 6).as("mae_snaive"),
          (col("sae_snaive") < col("sae_naive")).as("seasonal_wins"))
        .orderBy(col("event_type"))
      QueryScopedCache.releaseAfter(result, Seq(st))
    },
    Some(s"""
      WITH ${hourlySeriesByTypeSql},
      base AS (
        SELECT event_type, epoch_us(MIN(h)) AS u0, epoch_us(MAX(h)) AS u1
        FROM series GROUP BY 1),
      st AS (
        SELECT s.event_type,
               (epoch_us(s.h) - b.u0) // 3600000000 AS tix,
               (b.u1 - b.u0) // 3600000000 AS mxtix, s.x
        FROM series s JOIN base b USING (event_type)),
      test AS (
        SELECT * FROM st WHERE tix > mxtix - 168 AND tix >= 168),
      j AS (
        SELECT t.event_type, COUNT(*) AS n_test,
               CAST(SUM(abs(t.x - a.x)) AS BIGINT) AS sae_naive,
               CAST(SUM(abs(t.x - b.x)) AS BIGINT) AS sae_snaive
        FROM test t
        JOIN st a ON a.event_type = t.event_type AND a.tix = t.tix - 1
        JOIN st b ON b.event_type = t.event_type AND b.tix = t.tix - 168
        GROUP BY 1)
      SELECT event_type, n_test, sae_naive, sae_snaive,
             ROUND(CAST(sae_naive AS DOUBLE) /
                   CAST(n_test AS DOUBLE), 6) AS mae_naive,
             ROUND(CAST(sae_snaive AS DOUBLE) /
                   CAST(n_test AS DOUBLE), 6) AS mae_snaive,
             sae_snaive < sae_naive AS seasonal_wins
      FROM j ORDER BY event_type"""))

  /** Series-completeness audit — per event type: how many hours the
    * observed span covers, how many actually have data, the coverage
    * fraction, and the LONGEST consecutive outage in hours — the
    * monitoring-feed SLA readout ("is this source streaming, and how
    * bad was its worst gap") that decides whether downstream hourly
    * models ([[qTsForecast]], [[qTsAnomalySeasonal]]) can trust the
    * spine. The gaps-and-islands cousin of [[qTsGapfill]]: gap-fill
    * DENSIFIES the holes, this MEASURES them.
    *
    * All integers except the one rounded coverage division: hour
    * indexes come from the per-type extrema broadcast, the outage run
    * length is `tix − lag(tix) − 1` on the observed-hour table (one
    * type-partitioned window, never global), and the rollup rides the
    * same keying. One exchange of distinct (type, hour) rows total. */
  val qTsCompleteness = Q(
    "q_ts_completeness",
    (s, dir) => {
      val hx = t(s, dir, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .distinct()
      val base = hx.groupBy(col("event_type"))
        .agg(unix_micros(min(col("h"))).as("u0"),
          unix_micros(max(col("h"))).as("u1"))
      val tix = hx.join(base, Seq("event_type"))
        .select(col("event_type"),
          expr("(unix_micros(h) - u0) div 3600000000").as("tix"),
          expr("(u1 - u0) div 3600000000 + 1").as("span_hours"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("tix"))
      tix
        .withColumn("gap", col("tix") - lag(col("tix"), 1).over(w) - 1)
        .groupBy(col("event_type"))
        .agg(max(col("span_hours")).as("span_hours"),
          count(lit(1)).as("observed_hours"),
          coalesce(max(when(col("gap") > 0, col("gap"))), lit(0L))
            .as("longest_gap_h"))
        .select(col("event_type"), col("span_hours"),
          col("observed_hours"),
          round(col("observed_hours").cast("double") /
            col("span_hours").cast("double"), 6).as("coverage_frac"),
          col("longest_gap_h"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH hx AS (
        SELECT DISTINCT event_type, date_trunc('hour', ts) AS h
        FROM events),
      base AS (
        SELECT event_type, epoch_us(MIN(h)) AS u0, epoch_us(MAX(h)) AS u1
        FROM hx GROUP BY 1),
      tix AS (
        SELECT x.event_type,
               (epoch_us(x.h) - b.u0) // 3600000000 AS tix,
               (b.u1 - b.u0) // 3600000000 + 1 AS span_hours
        FROM hx x JOIN base b USING (event_type)),
      gaps AS (
        SELECT event_type, span_hours, tix,
               tix - LAG(tix, 1) OVER (PARTITION BY event_type
                 ORDER BY tix) - 1 AS gap
        FROM tix)
      SELECT event_type, CAST(MAX(span_hours) AS BIGINT) AS span_hours,
             COUNT(*) AS observed_hours,
             ROUND(CAST(COUNT(*) AS DOUBLE) /
                   CAST(MAX(span_hours) AS DOUBLE), 6) AS coverage_frac,
             CAST(COALESCE(MAX(CASE WHEN gap > 0 THEN gap END), 0)
               AS BIGINT) AS longest_gap_h
      FROM gaps GROUP BY event_type ORDER BY event_type"""))

  /** Brown–Forsythe variance-homogeneity screen (Levene's test on
    * deviations from the MEDIAN) across event types over the event
    * value column — the guard every pooled-variance analysis
    * ([[qStatsAbtest]]'s equal-variance t, ANOVA F) should run first:
    * are the per-group SPREADS even comparable? Median-centering is
    * what makes it robust to the skew these value distributions have.
    *
    * Exactness: values double to `2·round(value·100)` so each group's
    * interpolated median is an INTEGER ([[qPercentile]] parity:
    * percentile ≡ quantile_cont, and midpoints of even integers are
    * exact); absolute deviations d are then pure BIGINT, and each
    * group gates on (n_g, Σd, Σd²) exactly. The F statistic's
    * cross-group sums use the rounded-then-DECIMAL discipline
    * ([[qStatsKruskal]]): per-group numerator/denominator terms are
    * single IEEE expressions over gated integers rounded to 3
    * decimals, summed order-independently; F itself is one rounded
    * expression over those sums.
    *
    * Scale shape: one value exchange for the per-group median (exact
    * percentile — the GK sketch is the documented 100 TB swap), one
    * broadcast median join back, one group aggregate; the one-row
    * (N, S, k) scalar and the k-row term reduction ride broadcast
    * cross joins. */
  val qStatsLevene = Q(
    "q_stats_levene",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        expr("cast(round(value * 100) as bigint) * 2").as("x2"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("cast(percentile(x2, 0.5D) as bigint)").as("med2"))
      val g = ev.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), abs(col("x2") - col("med2")).as("d"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_g"),
          sum(col("d")).as("s_d"),
          sum(col("d") * col("d")).as("ss_d"))
      val tot = g.agg(sum(col("n_g")).as("nn"), sum(col("s_d")).as("ss"),
        count(lit(1)).as("k"))
      val terms = g.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n_g"), col("s_d"), col("ss_d"),
          col("nn"), col("ss"), col("k"),
          expr("""cast(round(
              (cast(s_d as double) * cast(nn as double) -
               cast(ss as double) * cast(n_g as double)) *
              (cast(s_d as double) * cast(nn as double) -
               cast(ss as double) * cast(n_g as double)) /
              (cast(n_g as double) * cast(nn as double) *
               cast(nn as double)), 3) as decimal(25,3))""").as("t_num"),
          expr("""cast(round(cast(ss_d as double) -
              cast(s_d as double) * cast(s_d as double) /
              cast(n_g as double), 3) as decimal(25,3))""").as("t_den"))
        // the k-row term table feeds the F reduction AND the output
        // rows; persist so the corpus median/deviation chain runs once
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val f = terms.agg(sum(col("t_num")).as("num"),
          sum(col("t_den")).as("den"),
          max(col("nn")).as("nn"), max(col("k")).as("k"))
        .select(round(
          (col("nn") - col("k")).cast("double") /
            (col("k") - 1).cast("double") *
            col("num").cast("double") / col("den").cast("double"), 6)
          .as("f_stat"))
      QueryScopedCache.releaseAfter(
        terms
          .select(col("event_type"), col("n_g"), col("s_d"), col("ss_d"))
          .crossJoin(broadcast(f))
          .orderBy(col("event_type")),
        Seq(terms))
    },
    Some("""
      WITH ev AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) * 2 AS x2
        FROM events),
      med AS (
        SELECT event_type,
               CAST(quantile_cont(x2, 0.5) AS BIGINT) AS med2
        FROM ev GROUP BY 1),
      g AS (
        SELECT e.event_type, COUNT(*) AS n_g,
               CAST(SUM(abs(e.x2 - m.med2)) AS BIGINT) AS s_d,
               CAST(SUM(abs(e.x2 - m.med2) * abs(e.x2 - m.med2))
                 AS BIGINT) AS ss_d
        FROM ev e JOIN med m USING (event_type)
        GROUP BY e.event_type),
      tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
               CAST(SUM(s_d) AS BIGINT) AS ss,
               COUNT(*) AS k
        FROM g),
      terms AS (
        SELECT g.event_type, g.n_g, g.s_d, g.ss_d, t.nn, t.ss, t.k,
               CAST(ROUND(
                 (CAST(g.s_d AS DOUBLE) * CAST(t.nn AS DOUBLE) -
                  CAST(t.ss AS DOUBLE) * CAST(g.n_g AS DOUBLE)) *
                 (CAST(g.s_d AS DOUBLE) * CAST(t.nn AS DOUBLE) -
                  CAST(t.ss AS DOUBLE) * CAST(g.n_g AS DOUBLE)) /
                 (CAST(g.n_g AS DOUBLE) * CAST(t.nn AS DOUBLE) *
                  CAST(t.nn AS DOUBLE)), 3) AS DECIMAL(25,3)) AS t_num,
               CAST(ROUND(CAST(g.ss_d AS DOUBLE) -
                 CAST(g.s_d AS DOUBLE) * CAST(g.s_d AS DOUBLE) /
                 CAST(g.n_g AS DOUBLE), 3) AS DECIMAL(25,3)) AS t_den
        FROM g CROSS JOIN tot t),
      f AS (
        SELECT ROUND(
                 CAST(MAX(nn) - MAX(k) AS DOUBLE) /
                 CAST(MAX(k) - 1 AS DOUBLE) *
                 CAST(SUM(t_num) AS DOUBLE) /
                 CAST(SUM(t_den) AS DOUBLE), 6) AS f_stat
        FROM terms)
      SELECT t.event_type, t.n_g, t.s_d, t.ss_d, f.f_stat
      FROM terms t CROSS JOIN f
      ORDER BY t.event_type"""))

  /** Referential-integrity audit across the whole star schema — for
    * each foreign-key edge (lineitem→orders, orders→customer,
    * lineitem→part, lineitem→supplier, embeddings→documents), the
    * row count, orphan count (child rows whose parent key is
    * missing), and orphan fraction: the first report a warehouse runs
    * on any delivered feed, and the join-safety precondition every
    * query in this registry silently assumes. Five anti-join counts,
    * one result row each.
    *
    * Scale shape: each check is one LEFT ANTI join on the FK — the
    * parent side is the smaller relation (broadcast where Catalyst
    * chooses) and ONLY the key columns are scanned (column pruning
    * reaches the parquet footer); the five one-row aggregates union
    * into a bounded result. No window, no explode. */
  val qStatsIntegrity = Q(
    "q_stats_integrity",
    (s, dir) => {
      def check(name: String, child: DataFrame, childKey: String,
          parent: DataFrame, parentKey: String): DataFrame = {
        val orphans = child
          .join(parent.select(col(parentKey).as(childKey)),
            Seq(childKey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        child.agg(count(lit(1)).as("n_rows"))
          .crossJoin(broadcast(orphans))
          .select(lit(name).as("fk_edge"), col("n_rows"),
            col("n_orphans"),
            round(col("n_orphans").cast("double") /
              col("n_rows").cast("double"), 6).as("orphan_frac"))
      }
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      check("embeddings->documents",
          Tables.spread(t(s, dir, "embeddings"))
            .select(col("vec_id").as("doc_id")), "doc_id",
          t(s, dir, "documents"), "doc_id")
        .unionByName(check("lineitem->orders",
          li.select(col("l_orderkey")), "l_orderkey",
          o, "o_orderkey"))
        .unionByName(check("lineitem->part",
          li.select(col("l_partkey")), "l_partkey",
          t(s, dir, "part"), "p_partkey"))
        .unionByName(check("lineitem->supplier",
          li.select(col("l_suppkey")), "l_suppkey",
          t(s, dir, "supplier"), "s_suppkey"))
        .unionByName(check("orders->customer",
          o.select(col("o_custkey")), "o_custkey",
          t(s, dir, "customer"), "c_custkey"))
        .orderBy(col("fk_edge"))
    },
    Some("""
      SELECT 'embeddings->documents' AS fk_edge,
             (SELECT COUNT(*) FROM embeddings) AS n_rows,
             (SELECT COUNT(*) FROM embeddings e
              WHERE NOT EXISTS (SELECT 1 FROM documents d
                                WHERE d.doc_id = e.vec_id)) AS n_orphans,
             ROUND(CAST((SELECT COUNT(*) FROM embeddings e
               WHERE NOT EXISTS (SELECT 1 FROM documents d
                                 WHERE d.doc_id = e.vec_id)) AS DOUBLE) /
               CAST((SELECT COUNT(*) FROM embeddings) AS DOUBLE), 6)
               AS orphan_frac
      UNION ALL
      SELECT 'lineitem->orders',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)),
             ROUND(CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
               AS DOUBLE) /
               CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE), 6)
      UNION ALL
      SELECT 'lineitem->part',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey)),
             ROUND(CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM part p
                                 WHERE p.p_partkey = l.l_partkey))
               AS DOUBLE) /
               CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE), 6)
      UNION ALL
      SELECT 'lineitem->supplier',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey)),
             ROUND(CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                 WHERE s.s_suppkey = l.l_suppkey))
               AS DOUBLE) /
               CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE), 6)
      UNION ALL
      SELECT 'orders->customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             ROUND(CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
               AS DOUBLE) /
               CAST((SELECT COUNT(*) FROM orders) AS DOUBLE), 6)
      ORDER BY fk_edge"""))

  /** Index-of-dispersion (variance-to-mean) screen over the hourly
    * event counts per type — the Poisson sanity check every count
    * model rests on: D ≈ 1 means arrivals are Poisson-compatible,
    * D ≫ 1 means bursty/overdispersed (use a negative-binomial or
    * expect clustered traffic), D ≪ 1 means regularized. Computed on
    * the zero-filled spine ([[hourlySeriesByType]] — absent hours are
    * real zero counts, and skipping them would bias D upward).
    *
    * (n, Σx, Σx²) gate as exact BIGINTs; D = (nQ − S²)/((n−1)·S) is
    * one rounded IEEE expression over them, and the overdispersion
    * verdict is the INTEGER cross-multiplication
    * 2·(nQ − S²) > 3·(n−1)·S (D > 1.5) — the
    * [[EventQueries.qEventsSloBurn]] no-float-decision rule. One
    * hourly exchange, one bounded per-type aggregate. */
  val qStatsDispersion = Q(
    "q_stats_dispersion",
    (s, dir) =>
      hourlySeriesByType(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(col("x") * col("x")).as("q"))
        .select(col("event_type"), col("n"), col("s"), col("q"),
          round((col("n") * col("q") - col("s") * col("s"))
            .cast("double") /
            ((col("n") - 1) * col("s")).cast("double"), 6)
            .as("dispersion"),
          (lit(2) * (col("n") * col("q") - col("s") * col("s")) >
            lit(3) * (col("n") - 1) * col("s")).as("overdispersed"))
        .orderBy(col("event_type")),
    Some(s"""
      WITH ${hourlySeriesByTypeSql}
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS q,
             ROUND(CAST(COUNT(*) * CAST(SUM(x * x) AS BIGINT) -
                     CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT)
                   AS DOUBLE) /
                   CAST((COUNT(*) - 1) * CAST(SUM(x) AS BIGINT)
                   AS DOUBLE), 6) AS dispersion,
             2 * (COUNT(*) * CAST(SUM(x * x) AS BIGINT) -
                  CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT)) >
             3 * (COUNT(*) - 1) * CAST(SUM(x) AS BIGINT)
               AS overdispersed
      FROM series GROUP BY event_type ORDER BY event_type"""))

  /** SCD2 dimension-invariant audit — the acceptance test a warehouse
    * runs on ANY delivered interval table (including the one this
    * engine builds): per customer-keyed dimension, count interval
    * rows, zero-width versions, GAPS (valid_to < next valid_from),
    * OVERLAPS (valid_to > next valid_from), open intervals, and
    * whether every key holds exactly one open interval. Run here on
    * [[qScd2Orders]]'s own output, the audit doubles as a machine-
    * checked proof of that builder's contract: 0 gaps, 0 overlaps,
    * one open interval per customer — but the OPERATOR is generic
    * over any (key, valid_from, valid_to) table.
    *
    * One key-partitioned lead() window re-derives adjacency, all
    * counters are exact integers, and the single-row summary is a
    * bounded aggregate. */
  val qScd2Audit = Q(
    "q_scd2_audit",
    (s, dir) => {
      val dim = scd2Close(scd2Runs(
        t(s, dir, "orders").filter(col("o_custkey") < 300)))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
      dim
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_intervals"),
          sum(when(col("valid_to").isNotNull &&
            col("valid_from") === col("valid_to"), 1L).otherwise(0L))
            .as("n_zero_width"),
          sum(when(col("next_from").isNotNull &&
            col("valid_to") < col("next_from"), 1L).otherwise(0L))
            .as("n_gaps"),
          sum(when(col("next_from").isNotNull &&
            col("valid_to") > col("next_from"), 1L).otherwise(0L))
            .as("n_overlaps"),
          sum(when(col("valid_to").isNull, 1L).otherwise(0L))
            .as("n_open"))
        .select(col("n_customers"), col("n_intervals"),
          col("n_zero_width"), col("n_gaps"), col("n_overlaps"),
          col("n_open"),
          (col("n_open") === col("n_customers")).as("one_open_per_key"))
    },
    Some("""
      WITH flagged AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
               CASE WHEN LAG(o_orderstatus, 1) OVER w IS NULL
                      OR LAG(o_orderstatus, 1) OVER w <> o_orderstatus
                    THEN 1 ELSE 0 END AS chg
        FROM orders WHERE o_custkey < 300
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)),
      versioned AS (
        SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS version
        FROM flagged),
      islands AS (
        SELECT o_custkey, version, MIN(o_orderdate) AS valid_from
        FROM versioned GROUP BY o_custkey, version),
      dim AS (
        SELECT o_custkey, version, valid_from,
               LEAD(valid_from, 1) OVER (PARTITION BY o_custkey
                 ORDER BY version) AS valid_to
        FROM islands),
      adj AS (
        SELECT o_custkey, valid_from, valid_to,
               LEAD(valid_from, 1) OVER (PARTITION BY o_custkey
                 ORDER BY version) AS next_from
        FROM dim)
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             COUNT(*) AS n_intervals,
             CAST(SUM(CASE WHEN valid_to IS NOT NULL
                 AND valid_from = valid_to THEN 1 ELSE 0 END)
               AS BIGINT) AS n_zero_width,
             CAST(SUM(CASE WHEN next_from IS NOT NULL
                 AND valid_to < next_from THEN 1 ELSE 0 END)
               AS BIGINT) AS n_gaps,
             CAST(SUM(CASE WHEN next_from IS NOT NULL
                 AND valid_to > next_from THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overlaps,
             CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_open,
             CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) = CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
               AS one_open_per_key
      FROM adj"""))

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

  /** One-way ANOVA F — the parametric mean-difference test completing
    * the group-comparison triptych: [[qStatsKruskal]] is its rank
    * (non-parametric) twin and [[qStatsLevene]] its variance-
    * homogeneity precondition check, and all three share one plan
    * shape. Per event type the gate carries the exact integer
    * (n_g, Σx, Σx²) over centi-unit values; SSB decomposes per group
    * as (s_g·N − S·n_g)²/(n_g·N²) and SSW as ss_g − s_g²/n_g — each a
    * single IEEE expression over gated integers rounded to 3 and
    * DECIMAL-summed (order-independent), F and η² one rounded
    * expression each over those sums. At 100 TB the Σx² BIGINT
    * accumulate swaps to DECIMAL(25,0) (the [[qStatsRegression]]
    * overflow discipline); at fixture value ranges it is exact.
    *
    * Scale shape: one map-side-combined group aggregate over a
    * two-column scan; the one-row (N, S, k) totals, the k-row term
    * reduction, and the one-row (F, η²) scalar all ride broadcast
    * cross joins — no window, no value exchange (unlike Levene,
    * which needs the median). */
  val qStatsAnova = Q(
    "q_stats_anova",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("x"))
      val g = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_g"),
          sum(col("x")).as("s_x"),
          sum(col("x") * col("x")).as("ss_x"))
      val tot = g.agg(sum(col("n_g")).as("nn"), sum(col("s_x")).as("ss"),
        count(lit(1)).as("k"))
      val terms = g.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n_g"), col("s_x"), col("ss_x"),
          col("nn"), col("ss"), col("k"),
          expr("""cast(round(
              (cast(s_x as double) * cast(nn as double) -
               cast(ss as double) * cast(n_g as double)) *
              (cast(s_x as double) * cast(nn as double) -
               cast(ss as double) * cast(n_g as double)) /
              (cast(n_g as double) * cast(nn as double) *
               cast(nn as double)), 3) as decimal(25,3))""").as("t_b"),
          expr("""cast(round(cast(ss_x as double) -
              cast(s_x as double) * cast(s_x as double) /
              cast(n_g as double), 3) as decimal(25,3))""").as("t_w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val f = terms.agg(sum(col("t_b")).as("ssb"),
          sum(col("t_w")).as("ssw"),
          max(col("nn")).as("nn"), max(col("k")).as("k"))
        .select(
          round((col("nn") - col("k")).cast("double") /
              (col("k") - 1).cast("double") *
              col("ssb").cast("double") / col("ssw").cast("double"), 6)
            .as("f_stat"),
          round(col("ssb").cast("double") /
              (col("ssb") + col("ssw")).cast("double"), 6)
            .as("eta_sq"))
      QueryScopedCache.releaseAfter(
        terms
          .select(col("event_type"), col("n_g"), col("s_x"), col("ss_x"))
          .crossJoin(broadcast(f))
          .orderBy(col("event_type")),
        Seq(terms))
    },
    Some("""
      WITH ev AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events),
      g AS (
        SELECT event_type, COUNT(*) AS n_g,
               CAST(SUM(x) AS BIGINT) AS s_x,
               CAST(SUM(x * x) AS BIGINT) AS ss_x
        FROM ev GROUP BY event_type),
      tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
               CAST(SUM(s_x) AS BIGINT) AS ss,
               COUNT(*) AS k
        FROM g),
      terms AS (
        SELECT g.event_type, g.n_g, g.s_x, g.ss_x, t.nn, t.ss, t.k,
               CAST(ROUND(
                 (CAST(g.s_x AS DOUBLE) * CAST(t.nn AS DOUBLE) -
                  CAST(t.ss AS DOUBLE) * CAST(g.n_g AS DOUBLE)) *
                 (CAST(g.s_x AS DOUBLE) * CAST(t.nn AS DOUBLE) -
                  CAST(t.ss AS DOUBLE) * CAST(g.n_g AS DOUBLE)) /
                 (CAST(g.n_g AS DOUBLE) * CAST(t.nn AS DOUBLE) *
                  CAST(t.nn AS DOUBLE)), 3) AS DECIMAL(25,3)) AS t_b,
               CAST(ROUND(CAST(g.ss_x AS DOUBLE) -
                 CAST(g.s_x AS DOUBLE) * CAST(g.s_x AS DOUBLE) /
                 CAST(g.n_g AS DOUBLE), 3) AS DECIMAL(25,3)) AS t_w
        FROM g CROSS JOIN tot t),
      f AS (
        SELECT ROUND(
                 CAST(MAX(nn) - MAX(k) AS DOUBLE) /
                 CAST(MAX(k) - 1 AS DOUBLE) *
                 CAST(SUM(t_b) AS DOUBLE) /
                 CAST(SUM(t_w) AS DOUBLE), 6) AS f_stat,
               ROUND(CAST(SUM(t_b) AS DOUBLE) /
                 CAST(SUM(t_b) + SUM(t_w) AS DOUBLE), 6) AS eta_sq
        FROM terms)
      SELECT t.event_type, t.n_g, t.s_x, t.ss_x, f.f_stat, f.eta_sq
      FROM terms t CROSS JOIN f
      ORDER BY t.event_type"""))

  /** Rolling 7-day MEDIAN of daily totals — the windowed ORDER
    * STATISTIC the window family lacked: running/sliding means
    * ([[qWindowRunning]], [[qWindowSliding]]) smear outliers into the
    * trend, while the rolling median is the robust centerline ops
    * dashboards actually want. Exactness: daily totals are centi-unit
    * BIGINTs DOUBLED (the [[qStatsLevene]] ×2 trick), so the
    * interpolated even-count median is an exact even integer in both
    * engines — `percentile(…, 0.5)` here, `quantile_cont` there —
    * gated as the integer `med2` with the readable double alongside.
    * The RANGE frame is calendar-aware: 6 PRECEDING on the epoch-day
    * key covers calendar gaps, not 6 physical rows ([[
    * qWindowRangeFrame]] discipline).
    *
    * Scale shape: the unbounded scan ends at the (type, day) rollup —
    * map-side combined, bounded by types × horizon — and the window
    * runs on that bounded spine, partitioned by type. */
  val qWindowRollingMedian = Q(
    "q_window_rolling_median",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          to_date(col("ts")).as("d"),
          expr("cast(round(value * 100) as bigint)").as("v"))
        .groupBy(col("event_type"), col("d"))
        .agg((sum(col("v")) * 2L).as("tot2"))
        .withColumn("day_idx",
          datediff(col("d"), lit("1970-01-01").cast("date")).cast("long"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("day_idx")).rangeBetween(-6, 0)
      daily
        .withColumn("n_in_win", count(lit(1)).over(w))
        .withColumn("med2",
          expr("percentile(tot2, 0.5D)").over(w).cast("long"))
        .select(col("event_type"), col("d"), col("tot2"),
          col("n_in_win"), col("med2"),
          round(col("med2").cast("double") / 200.0, 3).as("med_val"))
        .orderBy(col("event_type"), col("d"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 * 2 AS tot2,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS day_idx
        FROM events GROUP BY event_type, CAST(ts AS DATE))
      SELECT event_type, d, tot2,
             COUNT(*) OVER w AS n_in_win,
             CAST(quantile_cont(tot2, 0.5) OVER w AS BIGINT) AS med2,
             ROUND(CAST(CAST(quantile_cont(tot2, 0.5) OVER w AS BIGINT)
               AS DOUBLE) / 200.0, 3) AS med_val
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY event_type, d"""))

  /** Theil–Sen robust trend — the MEDIAN of all pairwise slopes of the
    * daily-total series per event type: a single anomalous day drags
    * an OLS slope ([[qStatsRegression]]) arbitrarily far, but moves
    * the pairwise-slope median not at all (29% breakdown point) — the
    * trend estimator monitoring pipelines want on spiky series.
    * Exactness: each pairwise slope rounds to micro-units then
    * DOUBLES ([[qStatsLevene]] ×2 trick), so the interpolated median
    * is an exact even integer cross-engine; the gate carries n_days,
    * n_pairs, and the integer median with the readable double
    * alongside.
    *
    * Scale shape: the unbounded scan ends at the bounded (type, day)
    * rollup; the pair space is an equi-join on type over that bounded
    * spine (days²/2 per type — at multi-year horizons the documented
    * swap is the sampled median-of-medians Theil–Sen), and the
    * per-type median is one exact percentile over the pair table. */
  val qStatsTheilsen = Q(
    "q_stats_theilsen",
    (s, dir) => {
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("x"),
          expr("cast(round(value * 100) as bigint)").as("v"))
        .groupBy(col("event_type"), col("x"))
        .agg(sum(col("v")).as("y"))
        .persist(MEMORY_AND_DISK)
      val pairs = daily.join(
          daily.select(col("event_type"), col("x").as("x2"),
            col("y").as("y2")),
          Seq("event_type"))
        .filter(col("x2") > col("x"))
        .select(col("event_type"),
          (expr("""cast(round(cast(y2 - y as double) * 1000000.0d /
                   cast(x2 - x as double)) as bigint)""") * 2L)
            .as("sl2"))
      val result = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"))
        .join(pairs.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("cast(percentile(sl2, 0.5D) as bigint)").as("med_sl2")),
          Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("n_pairs"),
          col("med_sl2"),
          round(col("med_sl2").cast("double") / 2000000.0, 6)
            .as("ts_slope"))
        .orderBy(col("event_type"))
      QueryScopedCache.releaseAfter(result, Seq(daily))
    },
    Some("""
      WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS x,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
      pairs AS (
        SELECT a.event_type,
               CAST(ROUND(CAST(b.y - a.y AS DOUBLE) * 1000000.0 /
                 CAST(b.x - a.x AS DOUBLE)) AS BIGINT) * 2 AS sl2
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.x > a.x),
      nd AS (
        SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1),
      med AS (
        SELECT event_type, COUNT(*) AS n_pairs,
               CAST(quantile_cont(sl2, 0.5) AS BIGINT) AS med_sl2
        FROM pairs GROUP BY event_type)
      SELECT n.event_type, n.n_days, m.n_pairs, m.med_sl2,
             ROUND(CAST(m.med_sl2 AS DOUBLE) / 2000000.0, 6) AS ts_slope
      FROM nd n JOIN med m USING (event_type)
      ORDER BY n.event_type"""))

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

  /** Interval UNION length (coverage) per customer — merge each
    * customer's overlapping order-fulfillment windows into maximal
    * disjoint islands and report how many islands, how many days the
    * union covers, and the longest island. The measure-of-union
    * primitive behind SLA coverage ("how many days was at least one
    * order in flight"), calendar billing (bill covered time once, not
    * per overlapping contract), and monitoring-window consolidation —
    * the third member of the interval family: [[qJoinInterval]] PAIRS
    * overlapping intervals, [[qTsCompleteness]] measures holes in a
    * POINT series, this measures the covered length of an INTERVAL
    * set. Fulfillment window = orderdate + 7 days per priority class
    * digit ('1-URGENT' ships in 7, '5-LOW' in 35) — both engines
    * derive it from the leading priority digit.
    *
    * The sweep is the running-max form of gaps-and-islands: with
    * intervals sorted by start within a customer, an interval starts a
    * NEW island iff its start exceeds the max end seen so far
    * (touching intervals merge — coverage has no zero-width gaps);
    * the island id is the running flag sum, and min(start)/max(end)
    * per island are the merged bounds. Everything is exact integer
    * epoch-day arithmetic — no rounding seam.
    *
    * Scale shape: ONE hash exchange on o_custkey carries both windows
    * (the lagged running max and the island-flag running sum share
    * partitioning and ordering, so Catalyst fuses them into one Window
    * operator after one sort) and BOTH group-bys ((custkey, island)
    * then custkey — each clustered by the o_custkey prefix, so neither
    * re-shuffles). Per-customer state is one running max, never the
    * interval list; a hot customer costs a sort, not memory. */
  val qWindowIntervalUnion = Q(
    "q_window_interval_union",
    (s, dir) => {
      val iv = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .cast("long").as("st"),
          (datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .cast("long") +
            substring(col("o_orderpriority"), 1, 1).cast("long") * 7)
            .as("en"))
      val wOrd = Window.partitionBy(col("o_custkey"))
        .orderBy(col("st"), col("en"), col("o_orderkey"))
      val prevMax = max(col("en"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
      iv
        .withColumn("isl0",
          when(prevMax.isNull || col("st") > prevMax, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("island", sum(col("isl0")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("o_custkey"), col("island"))
        .agg(min(col("st")).as("i_start"), max(col("en")).as("i_end"),
          count(lit(1)).as("n_orders"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("i_end") - col("i_start")).as("covered_days"),
          max(col("i_end") - col("i_start")).as("longest_days"),
          sum(col("n_orders")).as("n_orders"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      WITH iv AS (
        SELECT o_custkey, o_orderkey,
               DATE_DIFF('day', TIMESTAMP '1970-01-01', o_orderdate) AS st,
               DATE_DIFF('day', TIMESTAMP '1970-01-01', o_orderdate)
                 + CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) * 7 AS en
        FROM orders),
      flagged AS (
        SELECT o_custkey, o_orderkey, st, en,
               CASE WHEN MAX(en) OVER w IS NULL OR st > MAX(en) OVER w
                    THEN 1 ELSE 0 END AS isl0
        FROM iv
        WINDOW w AS (PARTITION BY o_custkey ORDER BY st, en, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      numbered AS (
        SELECT o_custkey, st, en,
               CAST(SUM(isl0) OVER (PARTITION BY o_custkey
                 ORDER BY st, en, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
        FROM flagged),
      merged AS (
        SELECT o_custkey, island, MIN(st) AS i_start, MAX(en) AS i_end,
               COUNT(*) AS n_orders
        FROM numbered GROUP BY o_custkey, island)
      SELECT o_custkey, COUNT(*) AS n_islands,
             CAST(SUM(i_end - i_start) AS BIGINT) AS covered_days,
             MAX(i_end - i_start) AS longest_days,
             CAST(SUM(n_orders) AS BIGINT) AS n_orders
      FROM merged GROUP BY o_custkey ORDER BY o_custkey"""))

  /** Sequential probability ratio test (Wald SPRT) — the
    * early-stopping monitor an experimentation platform runs INSTEAD
    * of a fixed-horizon test ([[qStatsAbtest]]): per stream, walk the
    * Bernoulli outcomes in time order accumulating the log-likelihood
    * ratio for H1: p = 0.22 against H0: p = 0.18, and STOP at the
    * first boundary crossing (upper ln((1−β)/α) → accept H1, lower
    * ln(β/(1−α)) → accept H0, α = β = 0.05); report where each stream
    * stopped, the verdict, and the LLR there. Because a Bernoulli
    * LLR takes only TWO increment values, the running sum is
    * n_succ·ln(p1/p0) + n_fail·ln(q1/q0) — so the engine holds the
    * increments as MICRO-scaled integer constants (200671 / −50010,
    * boundaries ±2944439) and the whole walk is exact BIGINT prefix
    * counting: no floating-point accumulation anywhere, the
    * [[RelationalQueries]] micro-unit parity rule. Streams are the
    * five event types; success = round(value·100) divisible by 5
    * (deterministic ≈ 0.2 Bernoulli both engines).
    *
    * Scale shape: ONE stream-keyed exchange carries all four windows
    * (two prefix counts, the row number, the first-crossing argmin
    * and per-stream total share partitioning and ordering) and the
    * final stop-row filter — per-stream state is four longs, never
    * the outcome list. */
  val qStatsSprt = Q(
    "q_stats_sprt",
    (s, dir) => {
      val wSeq = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val wAll = Window.partitionBy(col("event_type"))
      val run = wSeq.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      t(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          when(round(col("value") * 100).cast("long") % 5 === 0, lit(1L))
            .otherwise(lit(0L)).as("succ"))
        .withColumn("rn", row_number().over(wSeq).cast("long"))
        .withColumn("llr_micro",
          sum(col("succ")).over(run) * lit(200671L) +
            (col("rn") - sum(col("succ")).over(run)) * lit(-50010L))
        .withColumn("crossed",
          col("llr_micro") >= 2944439L || col("llr_micro") <= -2944439L)
        .withColumn("stop_rn",
          min(when(col("crossed"), col("rn"))).over(wAll))
        .withColumn("n_total", count(lit(1)).over(wAll))
        .filter(col("rn") === coalesce(col("stop_rn"), col("n_total")))
        .select(col("event_type"), col("n_total"),
          col("stop_rn").isNotNull.as("stopped"),
          col("rn").as("stop_n"), col("llr_micro"),
          when(col("llr_micro") >= 2944439L, lit("H1"))
            .when(col("llr_micro") <= -2944439L, lit("H0"))
            .otherwise(lit("continue")).as("decision"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH o AS (
        SELECT event_type, ts, event_id,
               CASE WHEN CAST(ROUND(value * 100) AS BIGINT) % 5 = 0
                    THEN 1 ELSE 0 END AS succ,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
      walked AS (
        SELECT event_type, rn,
               CAST(SUM(succ) OVER run AS BIGINT) * 200671
                 + (rn - CAST(SUM(succ) OVER run AS BIGINT)) * -50010
                 AS llr_micro
        FROM o
        WINDOW run AS (PARTITION BY event_type ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      marked AS (
        SELECT event_type, rn, llr_micro,
               MIN(CASE WHEN llr_micro >= 2944439
                          OR llr_micro <= -2944439
                        THEN rn END)
                 OVER (PARTITION BY event_type) AS stop_rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_total
        FROM walked)
      SELECT event_type, n_total, stop_rn IS NOT NULL AS stopped,
             rn AS stop_n, llr_micro,
             CASE WHEN llr_micro >= 2944439 THEN 'H1'
                  WHEN llr_micro <= -2944439 THEN 'H0'
                  ELSE 'continue' END AS decision
      FROM marked
      WHERE rn = COALESCE(stop_rn, n_total)
      ORDER BY event_type"""))

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

  /** Quantile normalization — map every stream's value distribution
    * onto a REFERENCE stream's empirical distribution by rank (the
    * batch-effect-removal standard from bioinformatics, used in
    * pipelines to make per-source score distributions comparable
    * before a global threshold): value at within-stream rank r of n
    * maps to the reference value at index ceil(r·N/n) of N. Rank →
    * index → value is ALL integer arithmetic plus one equi-join
    * against the ranked reference ('view' events), so both engines
    * map identically — no interpolation seam. Output: per (stream,
    * decile-of-rank) row counts and the mean/min/max of the
    * normalized cents, proving the whole mapped distribution (not
    * just a summary moment) agrees.
    *
    * Scale shape: within-stream row_number (ordered by cents with
    * the event_id tiebreak) rides
    * [[graft.operators.OrderStatistics.groupRowRanks]] — the
    * range-partitioned distributed rank (TeraSort shape: ONE
    * exchange spread over ALL partitions; a 5-value
    * `event_type`-partitioned row_number over raw events was the
    * round-9 plan-audit finding: a ≤5-reducer funnel at 100×
    * scale). Per-stream totals are a 5-row broadcast. The mapping
    * join is an equi-join on the reference rank index (reference
    * side 1/5 of events here; at 100 TB the reference would be a
    * GK-sketch quantile table — [[qQuantileSketch]] — making this
    * side tiny/broadcast); the decile rollup reuses stream keys. */
  val qStatsQnorm = Q(
    "q_stats_qnorm",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      val sn = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ranked = graft.operators.OrderStatistics
        .groupRowRanks(ev.select(col("event_type").as("g"),
          col("cents").as("v"), col("event_id").as("p")),
          minRank = false)
        .select(col("g").as("event_type"), col("v").as("cents"),
          col("rk").as("r"))
        .join(broadcast(sn), Seq("event_type"))
      val ref = ranked.filter(col("event_type") === "view")
        .select(col("r").as("ref_r"), col("cents").as("ref_cents"),
          col("n").as("ref_n"))
      ranked
        .join(broadcast(ref.select(max(col("ref_n")).as("nref"))))
        .select(col("event_type"), col("r"), col("n"),
          expr("(r * nref + n - 1) DIV n").as("tidx"))
        .join(ref.select(col("ref_r"), col("ref_cents")),
          col("tidx") === col("ref_r"))
        .select(col("event_type"),
          expr("((r - 1) * 10) DIV n").as("decile"),
          col("ref_cents"))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("ref_cents")).as("sum_c"),
          min(col("ref_cents")).as("min_c"),
          max(col("ref_cents")).as("max_c"))
        .select(col("event_type"), col("decile"), col("n_rows"),
          round(col("sum_c").cast("double") /
            col("n_rows").cast("double"), 6).as("mean_c"),
          col("min_c"), col("max_c"))
        .orderBy(col("event_type"), col("decile"))
    },
    Some("""
      WITH ev AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events),
      ranked AS (
        SELECT event_type, cents,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY cents, event_id) AS BIGINT) AS r,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM ev),
      ref AS (
        SELECT r AS ref_r, cents AS ref_cents, n AS ref_n
        FROM ranked WHERE event_type = 'view'),
      nref AS (SELECT MAX(ref_n) AS nref FROM ref),
      mapped AS (
        SELECT k.event_type,
               (k.r - 1) * 10 // k.n AS decile,
               f.ref_cents
        FROM ranked k
        CROSS JOIN nref
        JOIN ref f
          ON (k.r * nref.nref + k.n - 1) // k.n = f.ref_r)
      SELECT event_type, decile, COUNT(*) AS n_rows,
             ROUND(CAST(SUM(ref_cents) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS mean_c,
             MIN(ref_cents) AS min_c, MAX(ref_cents) AS max_c
      FROM mapped
      GROUP BY event_type, decile
      ORDER BY event_type, decile"""))

  /** Input/output rows for the isotonic fit's typed per-partition
    * scan. */
  private[analytics] case class IsoIn(
      g: String, bin: Long, n: Long, pos: Long)
  private[analytics] case class IsoOut(
      g: String, bin: Long, n: Long, pos: Long,
      fit_num: Long, fit_den: Long)

  /** Isotonic regression (PAVA — pool-adjacent-violators) — fit the
    * best NON-DECREASING rate curve to each group's binned
    * positive-rate profile (weighted least squares): the calibration
    * step that turns [[PrepQueries.qPrepCalibration]]-style
    * reliability tables into a usable monotone score→probability
    * map (reward-model and quality-classifier calibration both end
    * here). Bins are quantity buckets, the label is "discount ≥
    * 0.05", groups are return flags. The engine runs the O(bins)
    * PAVA STACK — merge a new bin into the previous block while the
    * block means violate monotonicity — over each group's bounded
    * pre-aggregated bin frame; block means stay EXACT RATIONALS
    * (pos-sum, n-sum) compared by BIGINT cross-multiplication, so no
    * float ever steers a pooling decision. The oracle states the
    * closed-form minimax characterization — fit(i) = max over j ≤ i
    * of min over k ≥ i of mean(bins j..k) — which equals the PAVA
    * solution, so the gate certifies the imperative stack against
    * the declarative minimax over every cell (both engines render
    * the same block rational num/den with one IEEE division).
    *
    * Scale shape: the corpus pass is ONE (group, bin) rollup —
    * everything after operates on the bounded bin frame (a
    * calibration curve has dozens of bins by construction): one
    * group exchange, an in-partition sort, a single O(bins)-state
    * scan. The oracle's O(bins³) minimax never runs on the engine. */
  val qStatsIsotonic = Q(
    "q_stats_isotonic",
    (s, dir) => {
      import s.implicits._
      val bins = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("g"),
          (round(col("l_quantity")).cast("long") / lit(5))
            .cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_discount") >= 0.05, lit(1L)).otherwise(lit(0L)))
            .as("pos"))
      val fitted = bins
        .repartition(col("g"))
        .sortWithinPartitions(col("g"), col("bin"))
        .as[IsoIn]
        .mapPartitions { it =>
          // blocks: (startIdx in buf, pos-sum, n-sum); buf holds the
          // group's bins (bounded: a calibration grid, ≤ dozens)
          val buf = scala.collection.mutable.ArrayBuffer.empty[IsoIn]
          val blocks =
            scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
          var cur: String = null
          def flush(): Iterator[IsoOut] = {
            val out = blocks.iterator.zipWithIndex.flatMap {
              case ((st, p, nn), bi) =>
                val end = if (bi + 1 < blocks.length) blocks(bi + 1)._1
                          else buf.length
                (st until end).iterator.map { k =>
                  val b = buf(k)
                  IsoOut(b.g, b.bin, b.n, b.pos, p, nn)
                }
            }.toVector
            buf.clear(); blocks.clear()
            out.iterator
          }
          def push(r: IsoIn): Unit = {
            buf += r
            blocks += ((buf.length - 1, r.pos, r.n))
            // pool while mean(prev) > mean(last): p1/n1 > p2/n2
            while (blocks.length >= 2 && {
              val (_, p1, n1) = blocks(blocks.length - 2)
              val (_, p2, n2) = blocks(blocks.length - 1)
              p1 * n2 > p2 * n1
            }) {
              val (s2, p2, n2) = blocks.remove(blocks.length - 1)
              val (s1, p1, n1) = blocks.remove(blocks.length - 1)
              blocks += ((s1, p1 + p2, n1 + n2))
              val _ = s2
            }
          }
          (it.map(Some(_)) ++ Iterator(None)).flatMap {
            case None => flush()
            case Some(r) =>
              val pre = if (cur != null && r.g != cur) flush()
                        else Iterator.empty
              cur = r.g
              val outPre = pre.toVector
              push(r)
              outPre.iterator
          }
        }
        .toDF()
      fitted.select(col("g").as("l_returnflag"), col("bin"), col("n"),
          col("pos"),
          round(col("pos").cast("double") / col("n").cast("double"), 6)
            .as("rate"),
          round(col("fit_num").cast("double") /
            col("fit_den").cast("double"), 6).as("fit"))
        .orderBy(col("l_returnflag"), col("bin"))
    },
    Some("""
      WITH b AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_quantity) AS BIGINT) // 5 AS bin,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
                 AS BIGINT) AS pos
        FROM lineitem GROUP BY 1, 2),
      pf AS (
        SELECT g, bin, n, pos,
               CAST(SUM(pos) OVER w AS BIGINT) AS cp,
               CAST(SUM(n) OVER w AS BIGINT) AS cn
        FROM b
        WINDOW w AS (PARTITION BY g ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      pairs AS (
        SELECT a.g, c.bin AS j, a.bin AS k,
               a.cp - c.cp + c.pos AS num, a.cn - c.cn + c.n AS den
        FROM pf a JOIN pf c ON c.g = a.g AND c.bin <= a.bin),
      inner_min AS (
        SELECT i.g, p.j, i.bin AS bin,
               MIN(CAST(p.num AS DOUBLE) / CAST(p.den AS DOUBLE)) AS mn
        FROM b i JOIN pairs p
          ON p.g = i.g AND p.j <= i.bin AND p.k >= i.bin
        GROUP BY i.g, p.j, i.bin),
      fit AS (
        SELECT g, bin, MAX(mn) AS fit FROM inner_min GROUP BY g, bin)
      SELECT b.g AS l_returnflag, b.bin AS bin, b.n, b.pos,
             ROUND(CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE), 6)
               AS rate,
             ROUND(f.fit, 6) AS fit
      FROM b JOIN fit f ON f.g = b.g AND f.bin = b.bin
      ORDER BY l_returnflag, b.bin"""))

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

  /** Input/output rows for the interval pack's typed scan. */
  private[analytics] case class PackIn(
      o_custkey: Long, o_orderkey: Long, st: Long, en: Long)
  private[analytics] case class PackKept(
      o_custkey: Long, pack_rank: Long, o_orderkey: Long,
      st: Long, en: Long)

  /** Greedy non-overlapping interval selection (activity selection /
    * interval packing) — per customer, the MAXIMUM set of mutually
    * disjoint fulfillment windows, built by the earliest-end greedy
    * rule (provably optimal for cardinality): keep the interval with
    * the smallest end, then the next whose start ≥ the kept end, and
    * so on. Where [[qWindowIntervalUnion]] MERGES overlaps to measure
    * coverage, this SELECTS a disjoint subset — slot scheduling,
    * non-overlapping-contract billing, audit sampling without
    * double-covered periods. The kept chain is a recurrence on the
    * operator's own output (kept(i+1) depends on kept(i)'s END, which
    * itself depended on the selection so far) — the
    * [[EventQueries.qEventsThrottle]] class, NOT a window: the engine
    * runs the secondary-sort pattern (custkey exchange → sort by
    * (cust, en, st, orderkey) → ONE streaming pass with O(1) state),
    * and the oracle is a recursive CTE with per-step LATERAL argmin,
    * so the gate certifies greedy scan ≡ declarative recurrence.
    * Interval convention [st, en): touching intervals (st = kept en)
    * are compatible. */
  val qWindowIntervalPack = Q(
    "q_window_interval_pack",
    (s, dir) => {
      import s.implicits._
      val kept = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .cast("long").as("st"),
          (datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .cast("long") +
            substring(col("o_orderpriority"), 1, 1).cast("long") * 7)
            .as("en"))
        .repartition(col("o_custkey"))
        .sortWithinPartitions(col("o_custkey"), col("en"), col("st"),
          col("o_orderkey"))
        .as[PackIn]
        .mapPartitions { it =>
          var cur = Long.MinValue
          var lastEnd = Long.MinValue
          var rank = 0L
          var has = false
          it.flatMap { r =>
            if (!has || r.o_custkey != cur) {
              has = true; cur = r.o_custkey; lastEnd = r.en; rank = 1L
              Iterator.single(PackKept(r.o_custkey, 1L, r.o_orderkey,
                r.st, r.en))
            } else if (r.st >= lastEnd) {
              lastEnd = r.en; rank += 1L
              Iterator.single(PackKept(r.o_custkey, rank, r.o_orderkey,
                r.st, r.en))
            } else Iterator.empty
          }
        }
        .toDF()
      kept.orderBy(col("o_custkey"), col("pack_rank"))
    },
    Some("""
      WITH RECURSIVE iv AS (
        SELECT o_custkey, o_orderkey,
               DATE_DIFF('day', TIMESTAMP '1970-01-01', o_orderdate) AS st,
               DATE_DIFF('day', TIMESTAMP '1970-01-01', o_orderdate)
                 + CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) * 7 AS en,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY en, st, o_orderkey) AS rn
        FROM orders),
      kept AS (
        SELECT o_custkey, 1 AS pack_rank, o_orderkey, st, en
        FROM iv WHERE rn = 1
        UNION ALL
        SELECT n.o_custkey, k.pack_rank + 1, n.o_orderkey, n.st, n.en
        FROM kept k, LATERAL (
          SELECT i.o_custkey, i.o_orderkey, i.st, i.en
          FROM iv i
          WHERE i.o_custkey = k.o_custkey AND i.st >= k.en
          ORDER BY i.en, i.st, i.o_orderkey LIMIT 1) n)
      SELECT o_custkey, CAST(pack_rank AS BIGINT) AS pack_rank,
             o_orderkey, st, en
      FROM kept
      ORDER BY o_custkey, pack_rank"""))

  /** Split-conformal calibration — the distribution-free coverage
    * machinery behind conformal prediction: split each language's
    * documents 50/50 by a deterministic md5 bucket (salt '#cf'),
    * take the ⌈(n_cal+1)·(1−α)⌉-th smallest calibration score
    * (α = 0.1; score = document length as the nonconformity proxy)
    * as the group's threshold, and measure what fraction of the
    * TEST half falls at or under it. Exchangeability guarantees
    * expected coverage ≥ 90% with NO distributional assumption —
    * the honest way to turn any scorer into a calibrated accept set.
    * Everything is exact: the rank is integer arithmetic
    * (⌈(n+1)·9/10⌉ = ((n+1)·9+9) DIV 10, capped at n_cal for tiny
    * groups), the threshold is an order statistic picked by a
    * group-partitioned ranking window, and coverage divides two
    * BIGINTs once.
    *
    * Scale shape: one lang-keyed exchange carries the calibration
    * ranking window; the test half joins the ≤|langs|-row threshold
    * table by broadcast — at 100 TB the calibration half would be a
    * sampled sketch, the test pass stays one narrow scan. */
  val qStatsConformal = Q(
    "q_stats_conformal",
    (s, dir) => {
      val scored = Tables.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars").as("score"),
          (conv(substring(md5(concat(col("doc_id").cast("string"),
            lit("#cf"))), 1, 2), 16, 10).cast("long") < 128)
            .as("is_cal"))
      val wRk = Window.partitionBy(col("lang"))
        .orderBy(col("score"), col("doc_id"))
      val cal = scored.filter(col("is_cal"))
        .withColumn("rk", row_number().over(wRk).cast("long"))
        .withColumn("n_cal",
          count(lit(1)).over(Window.partitionBy(col("lang"))))
      val thr = cal
        .filter(col("rk") ===
          least(expr("((n_cal + 1) * 9 + 9) DIV 10"), col("n_cal")))
        .select(col("lang"), col("n_cal"), col("rk").as("cal_rank"),
          col("score").as("threshold"))
      scored.filter(!col("is_cal"))
        .join(broadcast(thr), Seq("lang"))
        .groupBy(col("lang"))
        .agg(max(col("n_cal")).as("n_cal"),
          max(col("cal_rank")).as("cal_rank"),
          max(col("threshold")).as("threshold"),
          count(lit(1)).as("n_test"),
          sum(when(col("score") <= col("threshold"), lit(1L))
            .otherwise(lit(0L))).as("n_covered"))
        .select(col("lang"), col("n_cal"), col("cal_rank"),
          col("threshold"), col("n_test"), col("n_covered"),
          round(col("n_covered").cast("double") /
            col("n_test").cast("double"), 6).as("coverage"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, lang, n_chars AS score,
               CAST((instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || '#cf'),
                         1, 1)) - 1) * 16
                  + instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || '#cf'),
                         2, 1)) - 1 AS BIGINT) < 128 AS is_cal
        FROM documents),
      cal AS (
        SELECT lang, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY score, doc_id) AS BIGINT) AS rk,
               COUNT(*) OVER (PARTITION BY lang) AS n_cal
        FROM scored WHERE is_cal),
      thr AS (
        SELECT lang, n_cal, rk AS cal_rank, score AS threshold
        FROM cal
        WHERE rk = LEAST(((n_cal + 1) * 9 + 9) // 10, n_cal))
      SELECT s.lang, t.n_cal, t.cal_rank, t.threshold,
             COUNT(*) AS n_test,
             CAST(SUM(CASE WHEN s.score <= t.threshold THEN 1 ELSE 0
               END) AS BIGINT) AS n_covered,
             ROUND(CAST(SUM(CASE WHEN s.score <= t.threshold THEN 1
                 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS coverage
      FROM scored s JOIN thr t USING (lang)
      WHERE NOT s.is_cal
      GROUP BY s.lang, t.n_cal, t.cal_rank, t.threshold
      ORDER BY s.lang"""))

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

  /** Input row for the V-optimal DP's typed scan. */
  private[analytics] case class VoptIn(g: String, b: Long, n: Long)
  private[analytics] case class VoptOut(
      g: String, n_bins: Long, n_rows: Long, best_cost: Long)

  /** V-optimal histogram construction — the selectivity-estimation
    * histogram a cost-based optimizer keeps per column: partition the
    * per-group frequency vector (12 value buckets of order cents)
    * into K = 5 contiguous segments minimizing total within-segment
    * frequency variance (Jagadish et al., VLDB'98). The engine runs
    * the O(K·B²) dynamic program per group over the bounded bin
    * frame; the oracle ENUMERATES all C(B−1, K−1) cut tuples and
    * takes the minimum — DP ≡ exhaustive search, certified
    * cell-exactly. Costs are EXACT integers: segment SSE
    * Σ(nᵢ−mean)² = (len·S2 − S1²)/len is scaled by 27720/len
    * (27720 = lcm(1..12), so every denominator divides out) — no
    * float appears anywhere, the optimum is unique by value.
    *
    * Scale shape: one (group, bucket) rollup is the only data-sized
    * work; the DP runs on ≤ 12 rows per group in one bounded
    * mapPartitions (the [[qStatsIsotonic]] pattern). The oracle's
    * 330-combination enumeration never runs on the engine. */
  val qStatsVoptHist = Q(
    "q_stats_vopt_hist",
    (s, dir) => {
      import s.implicits._
      val bins = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("g"),
          expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 4194304")
            .as("b"))
        .agg(count(lit(1)).as("n"))
      bins.repartition(col("g"))
        .sortWithinPartitions(col("g"), col("b"))
        .as[VoptIn]
        .mapPartitions { it =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[VoptIn]
          var cur: String = null
          val K = 5
          def solve(): Iterator[VoptOut] = {
            if (buf.isEmpty) return Iterator.empty
            val ns = buf.map(_.n).toArray
            val B = ns.length
            val s1 = new Array[Long](B + 1)
            val s2 = new Array[Long](B + 1)
            for (i <- 0 until B) {
              s1(i + 1) = s1(i) + ns(i)
              s2(i + 1) = s2(i) + ns(i) * ns(i)
            }
            // exact integer segment cost, scaled by lcm(1..12)=27720
            def cost(i: Int, j: Int): Long = { // bins i..j-1 (0-based)
              val len = (j - i).toLong
              val a = s1(j) - s1(i); val q = s2(j) - s2(i)
              (len * q - a * a) * (27720L / len)
            }
            val kk = math.min(K, B)
            // dp(k)(j) = best cost of first j bins in k segments
            val INF = Long.MaxValue / 4
            var prev = Array.tabulate(B + 1)(j =>
              if (j == 0) 0L else INF)
            for (k <- 1 to kk) {
              val next = Array.fill(B + 1)(INF)
              for (j <- k to B; i <- (k - 1) until j)
                if (prev(i) < INF) {
                  val c = prev(i) + cost(i, j)
                  if (c < next(j)) next(j) = c
                }
              prev = next
            }
            val out = VoptOut(buf.head.g, B.toLong, s1(B), prev(B))
            buf.clear()
            Iterator.single(out)
          }
          (it.map(Some(_)) ++ Iterator(None)).flatMap {
            case None => solve()
            case Some(r) =>
              val pre = if (cur != null && r.g != cur) solve().toVector
                        else Vector.empty
              cur = r.g
              buf += r
              pre.iterator
          }
        }
        .toDF()
        .orderBy(col("g"))
    },
    Some("""
      WITH bins AS (
        SELECT o_orderpriority AS g,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) // 4194304
                 AS b,
               COUNT(*) AS n
        FROM orders GROUP BY 1, 2),
      idx AS (
        SELECT g, n,
               CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY b)
                 AS BIGINT) AS i,
               COUNT(*) OVER (PARTITION BY g) AS nb
        FROM bins),
      pf AS (
        SELECT g, i, nb,
               CAST(SUM(n) OVER w AS BIGINT) AS s1,
               CAST(SUM(n * n) OVER w AS BIGINT) AS s2
        FROM idx
        WINDOW w AS (PARTITION BY g ORDER BY i
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      pf0 AS (
        SELECT g, i, s1, s2, nb FROM pf
        UNION ALL
        SELECT DISTINCT g, 0, 0, 0, nb FROM pf),
      seg AS (
        SELECT a.g, lo.i AS i, a.i AS j,
               ((a.i - lo.i) * (a.s2 - lo.s2)
                 - (a.s1 - lo.s1) * (a.s1 - lo.s1))
                 * (27720 // (a.i - lo.i)) AS c
        FROM pf0 a JOIN pf0 lo
          ON lo.g = a.g AND lo.i < a.i),
      cuts AS (
        SELECT s1.g,
               s1.c + s2.c + s3.c + s4.c + s5.c AS total
        FROM seg s1
        JOIN seg s2 ON s2.g = s1.g AND s2.i = s1.j AND s1.i = 0
        JOIN seg s3 ON s3.g = s2.g AND s3.i = s2.j
        JOIN seg s4 ON s4.g = s3.g AND s4.i = s3.j
        JOIN seg s5 ON s5.g = s4.g AND s5.i = s4.j
        JOIN (SELECT g, MAX(i) AS nb FROM pf GROUP BY g) mx
          ON mx.g = s5.g AND s5.j = mx.nb),
      best AS (SELECT g, MIN(total) AS best_cost FROM cuts GROUP BY g),
      meta AS (
        SELECT g, MAX(nb) AS n_bins, MAX(s1) AS n_rows
        FROM pf GROUP BY g)
      SELECT m.g, m.n_bins, m.n_rows, b.best_cost
      FROM meta m JOIN best b USING (g)
      ORDER BY m.g"""))

  /** Maximum drawdown — the peak-to-trough risk statistic over each
    * priority class's DAILY revenue series: track the running peak of
    * daily cents in date order and report the deepest drop below it,
    * with the day it bottomed and the peak it fell from. The
    * monitoring primitive behind "how far below its best has this
    * feed fallen" alerts — a different question from [[qTsCusum]]
    * (persistent mean shift) or [[qTsAnomalySeasonal]] (point
    * outliers): drawdown is cumulative damage relative to the best
    * seen. All BIGINT cents; earliest-day tiebreak makes the argmin
    * row unique.
    *
    * Scale shape: one (priority, day) rollup, then ONE
    * priority-keyed exchange carries the running-max window, the
    * drawdown ranking, and the final pick — bounded per-group state. */
  val qTsDrawdown = Q(
    "q_ts_drawdown",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("g"),
          date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("rev_c"))
      val wSeq = Window.partitionBy(col("g")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPick = Window.partitionBy(col("g"))
        .orderBy(col("dd_c").desc, col("day"))
      daily
        .withColumn("peak_c", max(col("rev_c")).over(wSeq))
        .withColumn("dd_c", col("peak_c") - col("rev_c"))
        .withColumn("rk", row_number().over(wPick))
        .filter(col("rk") === 1)
        .select(col("g").as("o_orderpriority"), col("day").as("trough_day"),
          col("rev_c").as("trough_c"), col("peak_c"), col("dd_c")
            .as("max_drawdown_c"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      WITH daily AS (
        SELECT o_orderpriority AS g, date_trunc('day', o_orderdate)
                 AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS rev_c
        FROM orders GROUP BY 1, 2),
      walked AS (
        SELECT g, day, rev_c,
               MAX(rev_c) OVER (PARTITION BY g ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS peak_c
        FROM daily),
      ranked AS (
        SELECT g, day, rev_c, peak_c, peak_c - rev_c AS dd_c,
               ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY peak_c - rev_c DESC, day) AS rk
        FROM walked)
      SELECT g AS o_orderpriority, day AS trough_day,
             rev_c AS trough_c, peak_c, dd_c AS max_drawdown_c
      FROM ranked WHERE rk = 1
      ORDER BY o_orderpriority"""))

  /** Deterministic-HLL set algebra — the sketch operation
    * [[qHllDistinct]] (engine-internal registers, bound-gated) cannot
    * expose: build OWN HyperLogLog registers from md5 (register =
    * first hex byte, m = 256; ρ = leading-zero count of the next 48
    * bits + 1, derived by exact hex-string arithmetic), so BOTH
    * engines compute bit-identical registers, the UNION sketch is a
    * per-register MAX — the algebra that makes HLL mergeable across
    * shards/sets — and the intersection estimate is
    * inclusion-exclusion over three sketches. Sets: urgent orders vs
    * high-value orders (partial overlap). The harmonic sum is EXACT
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
      val exact = keys(aPred).agg(countDistinct(col("o_orderkey")))
        .collect()(0).getLong(0)
      val exactB = keys(bPred).agg(countDistinct(col("o_orderkey")))
        .collect()(0).getLong(0)
      val exactU = keys(aPred).unionByName(keys(bPred)).distinct()
        .count()
      val exacts = Map("a_urgent" -> exact, "b_highvalue" -> exactB,
        "union" -> exactU)
      import s.implicits._
      val ex = exacts.toSeq.toDF("set_name", "exact_n")
      est.join(broadcast(ex), Seq("set_name"))
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
      exacts AS (
        SELECT 'a_urgent' AS set_name, COUNT(DISTINCT o_orderkey)
          AS exact_n FROM a
        UNION ALL
        SELECT 'b_highvalue', COUNT(DISTINCT o_orderkey) FROM b
        UNION ALL
        SELECT 'union', COUNT(DISTINCT o_orderkey)
        FROM (SELECT o_orderkey FROM a UNION ALL
              SELECT o_orderkey FROM b))
      SELECT e.set_name, x.exact_n, e.hll_est,
             CAST(ABS(e.hll_est - x.exact_n) AS DOUBLE)
               <= 0.2 * CAST(x.exact_n AS DOUBLE) AS within_20pct
      FROM est e JOIN exacts x USING (set_name)
      ORDER BY set_name"""))

  /** Mantel–Haenszel stratified odds ratio — the Simpson's-paradox
    * guard an experimentation platform applies before trusting a
    * crude A/B readout: pool the per-stratum 2×2 tables (strata =
    * event types, arm = user-id parity, outcome = the
    * [[qStatsSprt]] Bernoulli) with the MH weights a·d/n and b·c/n,
    * and report the pooled odds ratio next to the crude one — when
    * they disagree, stratum mix was confounding the comparison.
    * Each MH term is floored to micro-units ((a·d·10⁶) DIV n — the
    * documented convention, exact in BIGINT), so the pooled ratio is
    * a single rounded double over two exact integer sums; per-stratum
    * ORs divide exact cell products once.
    *
    * Scale shape: ONE (stratum, arm, outcome) rollup (20 rows),
    * bounded-frame algebra after; the pooled one-row scalar rides a
    * broadcast cross join. */
  val qStatsMh = Q(
    "q_stats_mh",
    (s, dir) => {
      val cells = t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("user_id") % 2 === 0 &&
            round(col("value") * 100).cast("long") % 5 === 0, 1L)
            .otherwise(0L)).as("a"),
          sum(when(col("user_id") % 2 === 0 &&
            round(col("value") * 100).cast("long") % 5 =!= 0, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("user_id") % 2 =!= 0 &&
            round(col("value") * 100).cast("long") % 5 === 0, 1L)
            .otherwise(0L)).as("c"),
          sum(when(col("user_id") % 2 =!= 0 &&
            round(col("value") * 100).cast("long") % 5 =!= 0, 1L)
            .otherwise(0L)).as("d"))
        .withColumn("n", col("a") + col("b") + col("c") + col("d"))
        .withColumn("mh_num_micro", expr("(a * d * 1000000) DIV n"))
        .withColumn("mh_den_micro", expr("(b * c * 1000000) DIV n"))
      val pooled = cells.agg(
        sum(col("mh_num_micro")).as("sn"), sum(col("mh_den_micro"))
          .as("sd"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("c")).as("sc"), sum(col("d")).as("sdd"))
        .select(
          round(col("sn").cast("double") / col("sd").cast("double"), 6)
            .as("or_mh"),
          round((col("sa") * col("sdd")).cast("double") /
            (col("sb") * col("sc")).cast("double"), 6).as("or_crude"))
      cells.crossJoin(broadcast(pooled))
        .select(col("event_type"), col("a"), col("b"), col("c"),
          col("d"),
          round((col("a") * col("d")).cast("double") /
            (col("b") * col("c")).cast("double"), 6).as("or_stratum"),
          col("or_mh"), col("or_crude"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH cells AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND
                 CAST(ROUND(value * 100) AS BIGINT) % 5 = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND
                 CAST(ROUND(value * 100) AS BIGINT) % 5 <> 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(SUM(CASE WHEN user_id % 2 <> 0 AND
                 CAST(ROUND(value * 100) AS BIGINT) % 5 = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN user_id % 2 <> 0 AND
                 CAST(ROUND(value * 100) AS BIGINT) % 5 <> 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM events GROUP BY event_type),
      terms AS (
        SELECT *, a + b + c + d AS n,
               (a * d * 1000000) // (a + b + c + d) AS mh_num_micro,
               (b * c * 1000000) // (a + b + c + d) AS mh_den_micro
        FROM cells),
      pooled AS (
        SELECT
          ROUND(CAST(SUM(mh_num_micro) AS DOUBLE)
                / CAST(SUM(mh_den_micro) AS DOUBLE), 6) AS or_mh,
          ROUND(CAST(SUM(a) * SUM(d) AS DOUBLE)
                / CAST(SUM(b) * SUM(c) AS DOUBLE), 6) AS or_crude
        FROM terms)
      SELECT t.event_type, t.a, t.b, t.c, t.d,
             ROUND(CAST(t.a * t.d AS DOUBLE)
                   / CAST(t.b * t.c AS DOUBLE), 6) AS or_stratum,
             p.or_mh, p.or_crude
      FROM terms t CROSS JOIN pooled p
      ORDER BY t.event_type"""))

  /** Segmented regression (one-breakpoint piecewise OLS) — "WHEN did
    * the trend change": for each priority's monthly revenue series,
    * fit two least-squares lines split at every candidate month and
    * report the breakpoint minimizing total SSE, its two slopes, and
    * the variance explained vs the single unbroken fit — the
    * change-POINT analysis that complements [[qTsCusum]] (which
    * detects THAT a shift happened) with parameters (where, and what
    * the trend was on each side). No self-join: per-candidate left
    * stats are prefix sums (one group-partitioned window), right
    * stats are totals minus prefixes, so candidate evaluation is one
    * row per month. Moment sums are exact BIGINTs (integer month
    * index × integer monthly dollars); the SSE algebra runs in
    * doubles with an IDENTICAL op tree in both engines (the
    * [[qStatsRegression]] parity discipline — identical inputs +
    * identical IEEE ops = identical bits), candidates need ≥ 3
    * months per side, ties break on the earlier month.
    *
    * Scale shape: one (group, month) rollup, ONE group exchange
    * carrying prefix windows, per-group totals, and the argmin
    * ranking — bounded-frame work after the rollup. */
  val qStatsSegreg = Q(
    "q_stats_segreg",
    (s, dir) => {
      // bound guard (the qStatsGini discipline): y*y sums stay exact
      // BIGINT only while monthly KILOdollars < 2^24 — beyond, fail
      // loudly instead of wrapping silently (ADVICE r8 class)
      val yGuard = coalesce(expr(
        "assert_true(y >= 0 and y < 16777216, " +
          "'q_stats_segreg: monthly kilodollars exceed BIGINT-safe " +
          "moment bound (need y < 2^24)')").cast("long"), lit(0L))
      val monthly = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("g"),
          ((year(col("o_orderdate")) - 1992) * 12 +
            month(col("o_orderdate")) - 1).cast("long").as("x"))
        .agg(sum(round(col("o_totalprice") / 1000).cast("long")).as("y"))
        .select(col("g"), col("x"), (col("y") + yGuard).as("y"))
      val wPre = Window.partitionBy(col("g")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("g"))
      val cand = monthly
        .withColumn("pn", count(lit(1)).over(wPre))
        .withColumn("px", sum(col("x")).over(wPre))
        .withColumn("py", sum(col("y")).over(wPre))
        .withColumn("pxx", sum(col("x") * col("x")).over(wPre))
        .withColumn("pxy", sum(col("x") * col("y")).over(wPre))
        .withColumn("pyy", sum(col("y") * col("y")).over(wPre))
        .withColumn("tn", count(lit(1)).over(wAll))
        .withColumn("tx", sum(col("x")).over(wAll))
        .withColumn("ty", sum(col("y")).over(wAll))
        .withColumn("txx", sum(col("x") * col("x")).over(wAll))
        .withColumn("txy", sum(col("x") * col("y")).over(wAll))
        .withColumn("tyy", sum(col("y") * col("y")).over(wAll))
        .filter(col("pn") >= 3 && col("tn") - col("pn") >= 3)
      // identical double op tree both engines: sse(side) =
      // (syy - sy*sy/n) - (sxy - sx*sy/n)^2 / (sxx - sx*sx/n)
      def sse(n: String, sx: String, sy: String, sxx: String,
          sxy: String, syy: String) =
        s"""((CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) *
             CAST($sy AS DOUBLE) / CAST($n AS DOUBLE)) -
            (CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) *
             CAST($sy AS DOUBLE) / CAST($n AS DOUBLE)) *
            (CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) *
             CAST($sy AS DOUBLE) / CAST($n AS DOUBLE)) /
            (CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) *
             CAST($sx AS DOUBLE) / CAST($n AS DOUBLE)))"""
      def slope(n: String, sx: String, sy: String, sxx: String,
          sxy: String) =
        s"""((CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) *
             CAST($sy AS DOUBLE) / CAST($n AS DOUBLE)) /
            (CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) *
             CAST($sx AS DOUBLE) / CAST($n AS DOUBLE)))"""
      val rn = "(tn - pn)"
      val rx = "(tx - px)"; val ry = "(ty - py)"
      val rxx = "(txx - pxx)"; val rxy = "(txy - pxy)"
      val ryy = "(tyy - pyy)"
      val scored = cand
        .withColumn("sse_total", expr(
          sse("pn", "px", "py", "pxx", "pxy", "pyy") + " + " +
            sse(rn, rx, ry, rxx, rxy, ryy)))
        .withColumn("sse_single", expr(
          sse("tn", "tx", "ty", "txx", "txy", "tyy")))
        .withColumn("slope_l", expr(
          slope("pn", "px", "py", "pxx", "pxy")))
        .withColumn("slope_r", expr(slope(rn, rx, ry, rxx, rxy)))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("g"))
            .orderBy(col("sse_total"), col("x"))))
      scored.filter(col("rk") === 1)
        .select(col("g").as("o_orderpriority"),
          col("x").as("break_month"),
          round(col("slope_l"), 4).as("slope_left"),
          round(col("slope_r"), 4).as("slope_right"),
          round(col("sse_total") / col("sse_single"), 6)
            .as("sse_ratio"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      WITH monthly AS (
        SELECT o_orderpriority AS g,
               CAST((year(o_orderdate) - 1992) * 12
                 + month(o_orderdate) - 1 AS BIGINT) AS x,
               CAST(SUM(CAST(ROUND(o_totalprice / 1000) AS BIGINT))
                 AS BIGINT) AS y
        FROM orders GROUP BY 1, 2),
      pre AS (
        SELECT g, x,
               CAST(COUNT(*) OVER wp AS BIGINT) AS pn,
               CAST(SUM(x) OVER wp AS BIGINT) AS px,
               CAST(SUM(y) OVER wp AS BIGINT) AS py,
               CAST(SUM(x * x) OVER wp AS BIGINT) AS pxx,
               CAST(SUM(x * y) OVER wp AS BIGINT) AS pxy,
               CAST(SUM(y * y) OVER wp AS BIGINT) AS pyy,
               CAST(COUNT(*) OVER wa AS BIGINT) AS tn,
               CAST(SUM(x) OVER wa AS BIGINT) AS tx,
               CAST(SUM(y) OVER wa AS BIGINT) AS ty,
               CAST(SUM(x * x) OVER wa AS BIGINT) AS txx,
               CAST(SUM(x * y) OVER wa AS BIGINT) AS txy,
               CAST(SUM(y * y) OVER wa AS BIGINT) AS tyy
        FROM monthly
        WINDOW wp AS (PARTITION BY g ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wa AS (PARTITION BY g)),
      scored AS (
        SELECT g, x,
          ((CAST(pyy AS DOUBLE) - CAST(py AS DOUBLE) *
              CAST(py AS DOUBLE) / CAST(pn AS DOUBLE)) -
           (CAST(pxy AS DOUBLE) - CAST(px AS DOUBLE) *
              CAST(py AS DOUBLE) / CAST(pn AS DOUBLE)) *
           (CAST(pxy AS DOUBLE) - CAST(px AS DOUBLE) *
              CAST(py AS DOUBLE) / CAST(pn AS DOUBLE)) /
           (CAST(pxx AS DOUBLE) - CAST(px AS DOUBLE) *
              CAST(px AS DOUBLE) / CAST(pn AS DOUBLE)))
          +
          ((CAST(tyy - pyy AS DOUBLE) - CAST(ty - py AS DOUBLE) *
              CAST(ty - py AS DOUBLE) / CAST(tn - pn AS DOUBLE)) -
           (CAST(txy - pxy AS DOUBLE) - CAST(tx - px AS DOUBLE) *
              CAST(ty - py AS DOUBLE) / CAST(tn - pn AS DOUBLE)) *
           (CAST(txy - pxy AS DOUBLE) - CAST(tx - px AS DOUBLE) *
              CAST(ty - py AS DOUBLE) / CAST(tn - pn AS DOUBLE)) /
           (CAST(txx - pxx AS DOUBLE) - CAST(tx - px AS DOUBLE) *
              CAST(tx - px AS DOUBLE) / CAST(tn - pn AS DOUBLE)))
            AS sse_total,
          ((CAST(tyy AS DOUBLE) - CAST(ty AS DOUBLE) *
              CAST(ty AS DOUBLE) / CAST(tn AS DOUBLE)) -
           (CAST(txy AS DOUBLE) - CAST(tx AS DOUBLE) *
              CAST(ty AS DOUBLE) / CAST(tn AS DOUBLE)) *
           (CAST(txy AS DOUBLE) - CAST(tx AS DOUBLE) *
              CAST(ty AS DOUBLE) / CAST(tn AS DOUBLE)) /
           (CAST(txx AS DOUBLE) - CAST(tx AS DOUBLE) *
              CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)))
            AS sse_single,
          ((CAST(pxy AS DOUBLE) - CAST(px AS DOUBLE) *
              CAST(py AS DOUBLE) / CAST(pn AS DOUBLE)) /
           (CAST(pxx AS DOUBLE) - CAST(px AS DOUBLE) *
              CAST(px AS DOUBLE) / CAST(pn AS DOUBLE))) AS slope_l,
          ((CAST(txy - pxy AS DOUBLE) - CAST(tx - px AS DOUBLE) *
              CAST(ty - py AS DOUBLE) / CAST(tn - pn AS DOUBLE)) /
           (CAST(txx - pxx AS DOUBLE) - CAST(tx - px AS DOUBLE) *
              CAST(tx - px AS DOUBLE) / CAST(tn - pn AS DOUBLE)))
            AS slope_r
        FROM pre WHERE pn >= 3 AND tn - pn >= 3),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY sse_total, x) AS rk
        FROM scored)
      SELECT g AS o_orderpriority, x AS break_month,
             ROUND(slope_l, 4) AS slope_left,
             ROUND(slope_r, 4) AS slope_right,
             ROUND(sse_total / sse_single, 6) AS sse_ratio
      FROM ranked WHERE rk = 1
      ORDER BY o_orderpriority"""))

  /** Wald–Wolfowitz runs test — is each priority's monthly revenue
    * series RANDOM around its median, or does it trend/oscillate?
    * Too few sign runs ⇒ persistence (trend, level shifts); too many
    * ⇒ anti-correlation (alternating). The nonparametric randomness
    * check that complements [[qTsAcf]] (parametric autocorrelation)
    * and [[qStatsSegreg]]/[[qTsCusum]] (which assume a change exists).
    * Everything is exact: the median is the lower order statistic
    * (rank ⌈n/2⌉ via a ranked window), ties with the median are
    * excluded (the standard rule), runs are a lag-window flag sum,
    * and the 5% significance decision is the normal test CROSS-
    * MULTIPLIED to integers — 10⁴(n−1)(n(R−1)−2n₁n₂)² >
    * 38416·2n₁n₂(2n₁n₂−n) — so the boolean is BIGINT-exact with no
    * sqrt; the readable z-score uses one IEEE sqrt (correctly
    * rounded, identical cross-engine, unlike log).
    *
    * Scale shape: one (group, month) rollup, ONE group exchange
    * carrying the median pick, the sign lag, and the run count —
    * bounded per-group frames throughout. */
  val qStatsRuns = Q(
    "q_stats_runs",
    (s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("g"),
          ((year(col("o_orderdate")) - 1992) * 12 +
            month(col("o_orderdate")) - 1).cast("long").as("x"))
        .agg(sum(round(col("o_totalprice") / 1000).cast("long"))
          .as("y"))
      val wRk = Window.partitionBy(col("g"))
        .orderBy(col("y"), col("x"))
      val wAll = Window.partitionBy(col("g"))
      val med = monthly
        .withColumn("rk", row_number().over(wRk).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rk") === expr("(n + 1) DIV 2"))
        .select(col("g"), col("y").as("med"))
      val wSeq = Window.partitionBy(col("g")).orderBy(col("x"))
      val signs = monthly.join(broadcast(med), Seq("g"))
        .filter(col("y") =!= col("med"))
        .withColumn("sgn", when(col("y") > col("med"), lit(1L))
          .otherwise(lit(-1L)))
        .withColumn("brk",
          when(lag(col("sgn"), 1).over(wSeq).isNull ||
            lag(col("sgn"), 1).over(wSeq) =!= col("sgn"), 1L)
            .otherwise(0L))
      signs.groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n2"),
          sum(col("brk")).as("runs"))
        .select(col("g").as("o_orderpriority"), col("n"), col("n1"),
          col("n2"), col("runs"),
          round(lit(1.0) + (lit(2.0) * col("n1") * col("n2")).cast("double") /
            col("n").cast("double"), 4).as("expected_runs"),
          round((col("runs").cast("double") - (lit(1.0) +
            (lit(2.0) * col("n1") * col("n2")).cast("double") /
              col("n").cast("double"))) /
            sqrt((lit(2.0) * col("n1") * col("n2") *
              (lit(2L) * col("n1") * col("n2") - col("n"))).cast("double") /
              (col("n") * col("n") * (col("n") - 1)).cast("double")), 4)
            .as("z"),
          (expr("10000 * (n - 1) * (n * (runs - 1) - 2 * n1 * n2) * " +
            "(n * (runs - 1) - 2 * n1 * n2)") >
            expr("38416 * 2 * n1 * n2 * (2 * n1 * n2 - n)"))
            .as("significant"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      WITH monthly AS (
        SELECT o_orderpriority AS g,
               CAST((year(o_orderdate) - 1992) * 12
                 + month(o_orderdate) - 1 AS BIGINT) AS x,
               CAST(SUM(CAST(ROUND(o_totalprice / 1000) AS BIGINT))
                 AS BIGINT) AS y
        FROM orders GROUP BY 1, 2),
      med AS (
        SELECT g, y AS med FROM (
          SELECT g, y,
                 CAST(ROW_NUMBER() OVER (PARTITION BY g
                   ORDER BY y, x) AS BIGINT) AS rk,
                 COUNT(*) OVER (PARTITION BY g) AS n
          FROM monthly)
        WHERE rk = (n + 1) // 2),
      signs AS (
        SELECT m.g, m.x,
               CASE WHEN m.y > d.med THEN 1 ELSE -1 END AS sgn
        FROM monthly m JOIN med d USING (g)
        WHERE m.y <> d.med),
      flagged AS (
        SELECT g, sgn,
               CASE WHEN LAG(sgn) OVER w IS NULL
                      OR LAG(sgn) OVER w <> sgn THEN 1 ELSE 0 END
                 AS brk
        FROM signs WINDOW w AS (PARTITION BY g ORDER BY x)),
      agg AS (
        SELECT g, COUNT(*) AS n,
               CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n2,
               CAST(SUM(brk) AS BIGINT) AS runs
        FROM flagged GROUP BY g)
      SELECT g AS o_orderpriority, n, n1, n2, runs,
             ROUND(1.0 + CAST(2.0 * n1 * n2 AS DOUBLE)
               / CAST(n AS DOUBLE), 4) AS expected_runs,
             ROUND((CAST(runs AS DOUBLE) - (1.0 +
                 CAST(2.0 * n1 * n2 AS DOUBLE) / CAST(n AS DOUBLE)))
               / SQRT(CAST(2.0 * n1 * n2 * (2 * n1 * n2 - n)
                   AS DOUBLE)
                 / CAST(n * n * (n - 1) AS DOUBLE)), 4) AS z,
             10000 * (n - 1) * (n * (runs - 1) - 2 * n1 * n2)
               * (n * (runs - 1) - 2 * n1 * n2)
               > 38416 * 2 * n1 * n2 * (2 * n1 * n2 - n)
               AS significant
      FROM agg ORDER BY o_orderpriority"""))

  /** Partition-key advisor — the third layout planner next to
    * [[qAggRle]] (sort keys) and [[qJoinOrderAdvisor]] (join order):
    * for each candidate partition column of lineitem, report its
    * cardinality (= partition count), the EXPECTED SCAN FRACTION of
    * an equality-predicate query under value-weighted load
    * (Σ nᵥ² / N² — the probability mass a random row's key shares),
    * and the largest partition's share (skew). The advisor rule —
    * the lowest expected scan fraction among candidates with a
    * manageable partition count (ndv ≤ 4096) — is applied in-query
    * and emitted as a flag. Everything is exact BIGINT except the
    * two micro-rounded fractions.
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
            sum(col("n") * col("n")).as("sn2"), max(col("n")).as("mx"))
          .select(lit(name).as("column_name"), col("ndv"), col("nn"),
            col("sn2"), col("mx"))
      val stats = cand("l_returnflag", col("l_returnflag"))
        .unionByName(cand("l_linestatus", col("l_linestatus")))
        .unionByName(cand("l_ship_month",
          date_trunc("month", col("l_shipdate"))))
        .unionByName(cand("l_suppkey_bucket", col("l_suppkey") % 64))
        .select(col("column_name"), col("ndv"),
          expr("(sn2 * 1000000) DIV (nn * nn)").as("scan_frac_micro"),
          expr("(mx * 1000000) DIV nn").as("max_share_micro"))
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
               CAST(SUM(n * n) AS BIGINT) AS sn2,
               CAST(MAX(n) AS BIGINT) AS mx
        FROM (SELECT l_returnflag AS v, COUNT(*) AS n
              FROM lineitem GROUP BY 1)),
      c2 AS (
        SELECT 'l_linestatus', COUNT(*),
               CAST(SUM(n) AS BIGINT), CAST(SUM(n * n) AS BIGINT),
               CAST(MAX(n) AS BIGINT)
        FROM (SELECT l_linestatus AS v, COUNT(*) AS n
              FROM lineitem GROUP BY 1)),
      c3 AS (
        SELECT 'l_ship_month', COUNT(*),
               CAST(SUM(n) AS BIGINT), CAST(SUM(n * n) AS BIGINT),
               CAST(MAX(n) AS BIGINT)
        FROM (SELECT date_trunc('month', l_shipdate) AS v, COUNT(*)
                AS n
              FROM lineitem GROUP BY 1)),
      c4 AS (
        SELECT 'l_suppkey_bucket', COUNT(*),
               CAST(SUM(n) AS BIGINT), CAST(SUM(n * n) AS BIGINT),
               CAST(MAX(n) AS BIGINT)
        FROM (SELECT l_suppkey % 64 AS v, COUNT(*) AS n
              FROM lineitem GROUP BY 1)),
      stats AS (
        SELECT column_name, ndv,
               (sn2 * 1000000) // (nn * nn) AS scan_frac_micro,
               (mx * 1000000) // nn AS max_share_micro
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

  /** Inverse-propensity-weighted adjusted difference — the
    * continuous-outcome sibling of [[qStatsMh]] (which pools binary
    * odds): when arm assignment is imbalanced ACROSS strata, the
    * crude treatment−control mean difference confounds stratum mix
    * with the effect; IPW reweights each stratum's arms to the
    * stratum's size (the stratified estimator: Σₖ nₖ·(ȳₜₖ − ȳ꜀ₖ)/N)
    * and reports it next to the crude difference. Per-stratum means
    * are micro-floored exact integers ((Σy·10⁶) DIV n — the
    * documented convention), the stratum weighting is BIGINT, and
    * the two output differences each divide once. Strata = event
    * types, arm = user parity, outcome = cents.
    *
    * Scale shape: ONE (stratum, arm) rollup (10 rows), bounded-frame
    * algebra, the one-row total scalar on a broadcast cross join. */
  val qStatsIpw = Q(
    "q_stats_ipw",
    (s, dir) => {
      val cells = t(s, dir, "events")
        .groupBy(col("event_type"),
          (col("user_id") % 2 === 0).as("treated"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("sy"))
        .withColumn("mean_micro", expr("(sy * 1000000) DIV n"))
      val strata = cells.groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_stratum"),
          max(when(col("treated"), col("mean_micro"))).as("mt"),
          max(when(!col("treated"), col("mean_micro"))).as("mc"),
          max(when(col("treated"), col("n"))).as("nt"),
          max(when(!col("treated"), col("n"))).as("nc"))
      val tot = strata.agg(sum(col("n_stratum")).as("nn"),
        sum(col("n_stratum") * (col("mt") - col("mc"))).as("wdiff"),
        sum(col("nt") * col("mt")).as("syt"), sum(col("nt")).as("snt"),
        sum(col("nc") * col("mc")).as("syc"), sum(col("nc")).as("snc"))
      strata.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n_stratum"), col("nt"),
          col("nc"), col("mt"), col("mc"),
          round(col("wdiff").cast("double") / col("nn").cast("double")
            / 1000000.0, 6).as("ate_ipw"),
          round((col("syt").cast("double") / col("snt").cast("double")
            - col("syc").cast("double") / col("snc").cast("double"))
            / 1000000.0, 6).as("diff_crude"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH cells AS (
        SELECT event_type, user_id % 2 = 0 AS treated,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                 AS BIGINT) AS sy
        FROM events GROUP BY 1, 2),
      m AS (
        SELECT event_type, treated, n,
               (sy * 1000000) // n AS mean_micro
        FROM cells),
      strata AS (
        SELECT event_type,
               CAST(SUM(n) AS BIGINT) AS n_stratum,
               MAX(CASE WHEN treated THEN mean_micro END) AS mt,
               MAX(CASE WHEN NOT treated THEN mean_micro END) AS mc,
               MAX(CASE WHEN treated THEN n END) AS nt,
               MAX(CASE WHEN NOT treated THEN n END) AS nc
        FROM m GROUP BY event_type),
      tot AS (
        SELECT CAST(SUM(n_stratum) AS BIGINT) AS nn,
               CAST(SUM(n_stratum * (mt - mc)) AS BIGINT) AS wdiff,
               CAST(SUM(nt * mt) AS BIGINT) AS syt,
               CAST(SUM(nt) AS BIGINT) AS snt,
               CAST(SUM(nc * mc) AS BIGINT) AS syc,
               CAST(SUM(nc) AS BIGINT) AS snc
        FROM strata)
      SELECT s.event_type, s.n_stratum, s.nt, s.nc, s.mt, s.mc,
             ROUND(CAST(t.wdiff AS DOUBLE) / CAST(t.nn AS DOUBLE)
               / 1000000.0, 6) AS ate_ipw,
             ROUND((CAST(t.syt AS DOUBLE) / CAST(t.snt AS DOUBLE)
               - CAST(t.syc AS DOUBLE) / CAST(t.snc AS DOUBLE))
               / 1000000.0, 6) AS diff_crude
      FROM strata s CROSS JOIN tot t
      ORDER BY s.event_type"""))

  /** Input rows for the Holt smoother's typed scan. */
  private[analytics] case class HoltIn(g: String, x: Long, y: Long)
  private[analytics] case class HoltOut(
      g: String, n_months: Long, level_c: Long, trend_c: Long,
      f1_c: Long, f2_c: Long, f3_c: Long)

  /** Holt double exponential smoothing — [[qTsEwma]] tracks LEVEL
    * only and lags any trending series by construction; Holt carries
    * a second TREND state (α = β = ¼): lₜ = ⌊(yₜ + 3(lₜ₋₁+bₜ₋₁))/4⌋,
    * bₜ = ⌊((lₜ−lₜ₋₁) + 3bₜ₋₁)/4⌋, forecast h steps out = l + h·b —
    * the capacity-forecast workhorse between naive EWMA and the
    * seasonal backtest ([[qTsForecast]]). The recurrence feeds its
    * own output (two coupled states), so the engine runs the
    * secondary-sort pattern with TWO longs of state per series and
    * the oracle steps the identical recurrence in a recursive CTE —
    * with TRUNCATING division on both sides (Java `/` in the scan ≡
    * DuckDB's `//`, both toward zero — measured, not assumed: DuckDB
    * -7 // 4 = -1; a floorDiv on one side would diverge the moment a
    * trend goes negative). All BIGINT kilodollars.
    *
    * Scale shape: one (series, month) rollup, one series-keyed
    * exchange, one ordered O(1)-state pass; oracle recursion depth =
    * months per series (bounded at the gate SFs; the ENGINE never
    * depends on it). */
  val qTsHolt = Q(
    "q_ts_holt",
    (s, dir) => {
      import s.implicits._
      val monthly = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("g"),
          ((year(col("o_orderdate")) - 1992) * 12 +
            month(col("o_orderdate")) - 1).cast("long").as("x"))
        .agg(sum(round(col("o_totalprice") / 1000).cast("long"))
          .as("y"))
      monthly.repartition(col("g"))
        .sortWithinPartitions(col("g"), col("x"))
        .as[HoltIn]
        .mapPartitions { it =>
          var cur: String = null
          var l = 0L; var b = 0L; var n = 0L; var started = false
          def out = HoltOut(cur, n, l, b, l + b, l + 2 * b, l + 3 * b)
          (it.map(Some(_)) ++ Iterator(None)).flatMap {
            case None =>
              if (started) Iterator.single(out) else Iterator.empty
            case Some(r) =>
              val flush =
                if (started && r.g != cur) Iterator.single(out)
                else Iterator.empty
              if (!started || r.g != cur) {
                cur = r.g; l = r.y; b = 0L; n = 1L; started = true
              } else {
                val lp = l
                l = (r.y + 3L * (l + b)) / 4L
                b = ((l - lp) + 3L * b) / 4L
                n += 1L
              }
              flush
          }
        }
        .toDF()
        .orderBy(col("g"))
    },
    Some("""
      WITH RECURSIVE monthly AS (
        SELECT o_orderpriority AS g,
               CAST((year(o_orderdate) - 1992) * 12
                 + month(o_orderdate) - 1 AS BIGINT) AS x,
               CAST(SUM(CAST(ROUND(o_totalprice / 1000) AS BIGINT))
                 AS BIGINT) AS y,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                 ORDER BY CAST((year(o_orderdate) - 1992) * 12
                   + month(o_orderdate) - 1 AS BIGINT)) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS nm
        FROM orders GROUP BY 1, 2),
      walk AS (
        SELECT g, rn, nm, y AS l, CAST(0 AS BIGINT) AS b
        FROM monthly WHERE rn = 1
        UNION ALL
        SELECT m.g, m.rn, m.nm,
               (m.y + 3 * (w.l + w.b)) // 4,
               (((m.y + 3 * (w.l + w.b)) // 4) - w.l + 3 * w.b) // 4
        FROM walk w JOIN monthly m
          ON m.g = w.g AND m.rn = w.rn + 1)
      SELECT g, CAST(nm AS BIGINT) AS n_months, l AS level_c,
             b AS trend_c, l + b AS f1_c, l + 2 * b AS f2_c,
             l + 3 * b AS f3_c
      FROM walk WHERE rn = nm
      ORDER BY g"""))

  /** Peak concurrency of validity intervals — where
    * [[qWindowIntervalUnion]] measures TOTAL covered time, this
    * measures PEAK LOAD: sweep each priority's fulfillment windows as
    * +1/−1 events in time order and take the running sum's maximum —
    * "how many orders were in flight at the worst moment", the
    * capacity-planning primitive (max concurrent sessions, license
    * peaks, staffing). Classic sweep-line as ONE window: a +1 at
    * each start, a −1 at each end (day resolution, [st, en) so an
    * end and a start on the same day DON'T overlap — ends sort
    * first), running sum, max + earliest argmax day. All integers.
    *
    * Scale shape: one explode (2 rows per interval), ONE
    * priority-keyed exchange carrying the running sum and the argmax
    * ranking. */
  val qWindowConcurrencyPeak = Q(
    "q_window_concurrency_peak",
    (s, dir) => {
      val iv = t(s, dir, "orders")
        .select(col("o_orderpriority").as("g"),
          datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .cast("long").as("st"),
          (datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .cast("long") +
            substring(col("o_orderpriority"), 1, 1).cast("long") * 7)
            .as("en"))
      val ev = iv.select(col("g"), col("st").as("day"), lit(1L)
          .as("delta"))
        .unionByName(iv.select(col("g"), col("en").as("day"),
          lit(-1L).as("delta")))
        .groupBy(col("g"), col("day"))
        .agg(sum(col("delta")).as("d"))
      val wSeq = Window.partitionBy(col("g")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPick = Window.partitionBy(col("g"))
        .orderBy(col("conc").desc, col("day"))
      ev.withColumn("conc", sum(col("d")).over(wSeq))
        .withColumn("rk", row_number().over(wPick))
        .filter(col("rk") === 1)
        .select(col("g").as("o_orderpriority"),
          col("day").as("peak_day"), col("conc").as("peak_concurrent"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      WITH iv AS (
        SELECT o_orderpriority AS g,
               DATE_DIFF('day', TIMESTAMP '1970-01-01', o_orderdate)
                 AS st,
               DATE_DIFF('day', TIMESTAMP '1970-01-01', o_orderdate)
                 + CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) * 7
                 AS en
        FROM orders),
      ev AS (
        SELECT g, day, CAST(SUM(delta) AS BIGINT) AS d FROM (
          SELECT g, st AS day, 1 AS delta FROM iv
          UNION ALL
          SELECT g, en AS day, -1 AS delta FROM iv) u
        GROUP BY g, day),
      walked AS (
        SELECT g, day,
               CAST(SUM(d) OVER (PARTITION BY g ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS conc
        FROM ev),
      ranked AS (
        SELECT g, day, conc,
               ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY conc DESC, day) AS rk
        FROM walked)
      SELECT g AS o_orderpriority, day AS peak_day,
             conc AS peak_concurrent
      FROM ranked WHERE rk = 1
      ORDER BY o_orderpriority"""))

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

  /** Registry consumed by SparkEntry. */
  val all: Seq[Q] = Seq(
    qAggPricing, qDistinctAgg, qAggStats, qSubqueries, qSubqueryCorrelated, qRollup,
    qGroupingSets, qHllDistinct, qQuantileSketch,
    qJoinRegionRevenue, qJoinSalted, qJoinSemi, qJoinAnti, qJoinLeftOuter,
    qJoinFullOuter, qAggStringAgg, qThetaJoin, qRangeJoin, qJoinLateral,
    qAsofJoin, qJoinInterval, qTopkPerCustomer, qWindowRunning, qWindowRanks,
    qWindowRangeFrame, qWindowHourly, qWindowNavigation,
    qWindowDistribution, qSessionizeBatch, qSessionizeNative,
    qSortLimit, qSetopsNations, qSetOpsBag, qTsGapfill, qScalarString, qScalarDate, qScalarMath,
    qScalarRegex, qScalarConditional, qScalarNullSemantics,
    qScalarArray, qSaltedAgg,
    qCube, qPercentile, qPivot, qUnpivot, qJsonEvents, qDnsBind9Events,
    qScd2Orders, qScd2Incremental, qStatsProfile, qTsEwma, qStatsRegression, qStatsCorr, qStatsSkew, qStatsGini,
    qStatsKappa, qJoinExistsMulti, qAggLargeOrders, qScd2Lookup,
    qTsOhlc, qStatsMad, qEventsHistogram, qAggIvm,
    qStatsSpearman, qStatsAbtest, qWindowSliding, qStatsWmedian, qAggReaggregate, qStatsBenford,
    qAggBasket, qStatsKs, qTsAcf, qTsCusum, qStatsBootstrap,
    qTsSeasonality, qAggBitmapDistinct, qTsAnomalySeasonal, qAsofTolerance,
    qStatsMannWhitney, qTsXcorr, qStatsKruskal, qTsLttb, qStatsKendall,
    qTsForecast, qTsCompleteness, qStatsLevene, qStatsIntegrity,
    qScalarBitwise, qStatsDispersion, qScd2Audit, qScalarInterval,
    qAsofNearest, qStatsAnova, qWindowRollingMedian, qStatsTheilsen,
    qSkylineSuppliers, qWindowIntervalUnion, qStatsSprt, qAggRle,
    qStatsQnorm, qStatsIsotonic, qAggRadixMedian, qWindowIntervalPack,
    qStatsConformal, qJoinOrderAdvisor, qStatsVoptHist, qTsDrawdown,
    qHllSetops, qStatsMh, qStatsSegreg, qStatsRuns,
    qAggPartitionAdvisor, qJoinBloomPrune, qStatsIpw, qTsHolt,
    qWindowConcurrencyPeak, qAggMode, qJoinLeadTime)
}
