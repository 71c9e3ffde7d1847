package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the custom operators without oracle queries: SpaceSaving
  * heavy hitters and bucketed co-located joins. */
class OperatorsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("space saving: exact when capacity covers the key space") {
    val data = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(20)("c") ++ Seq.fill(5)("d")).toDS()
    val top = HeavyHitters.topK(data.repartition(4), capacity = 10, k = 3)
    assert(top === Seq(("a", 50L), ("b", 30L), ("c", 20L)))
  }

  test("space saving: finds the dominant key under eviction pressure") {
    // 500 hits of the hot key among 200 distinct noise keys, capacity 8
    val noise = (0 until 400).map(i => s"noise${i % 200}")
    val data = scala.util.Random.shuffle(
      Seq.fill(500)("hot") ++ noise).toDS()
    val top = HeavyHitters.topK(data.repartition(4), capacity = 8, k = 1)
    assert(top.head._1 === "hot")
    // SpaceSaving overestimates, never underestimates
    assert(top.head._2 >= 500L)
  }

  test("space saving merge: one-sided error bound under arbitrary merge trees") {
    // Property: for ANY split of the stream into partition buffers and
    // ANY merge tree over them, every reported estimate overestimates
    // (est >= true), the overestimate is bounded (est - true <= N/m),
    // and every key with true count > N/m is present — the SpaceSaving
    // guarantees the doc comment claims, now preserved across merge.
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 40) {
      val capacity = 4 + rnd.nextInt(8)
      val ss = new SpaceSaving(capacity)
      // zipf-ish stream: few hot keys + long noise tail
      val stream = new scala.util.Random(rnd.nextLong()).shuffle(
        (0 until 3).flatMap(h => Seq.fill(150 * (h + 1))(s"hot$h")) ++
          (0 until 500).map(i => s"noise${i % 250}"))
      val n = stream.size
      val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // random split into 1..8 buffers, reduce each
      val nParts = 1 + rnd.nextInt(8)
      var bufs = stream.groupBy(_ => rnd.nextInt(nParts)).values.toVector
        .map(part => part.foldLeft(ss.zero)(ss.reduce))
      // merge in random tree order
      while (bufs.size > 1) {
        val i = rnd.nextInt(bufs.size)
        val a = bufs(i); bufs = bufs.patch(i, Nil, 1)
        val j = rnd.nextInt(bufs.size)
        val b = bufs(j); bufs = bufs.patch(j, Nil, 1)
        bufs = bufs :+ ss.merge(a, b)
      }
      val est = bufs.head
      assert(est.size <= capacity)
      val bound = n.toDouble / capacity
      est.foreach { case (k, v) =>
        val tv = truth.getOrElse(k, 0L)
        assert(v >= tv, s"undercount: $k est $v < true $tv (cap $capacity)")
        assert(v - tv <= bound,
          s"overestimate too large: $k est $v true $tv bound $bound")
      }
      truth.filter(_._2 > bound).keys.foreach(k =>
        assert(est.contains(k), s"guaranteed hitter $k missing (cap $capacity)"))
    }
  }

  test("bucketed tables join without a shuffle") {
    val sf = "/root/testdata/sf0.001" // warehouse dir set in SparkTestBase
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    // force the shuffle-join path so bucket co-location is observable
    // (tiny test tables would otherwise auto-broadcast)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"))
      // co-located: no exchange below the join — the only allowed
      // exchange is the final aggregation's
      val belowJoin = plan.linesIterator
        .dropWhile(l => !l.contains("Join")).toSeq
      assert(!belowJoin.exists(_.contains("Exchange")),
        s"bucketed join inputs must not re-shuffle:\n$plan")
      assert(joined.agg(sum("n")).head().getLong(0) ===
        spark.read.parquet(s"$sf/lineitem.parquet").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("salted join: lossless, shuffles on (key, salt), spreads the hot key") {
    // the planned-ahead skew tool (SaltedAgg.innerJoinSalted) for a
    // KNOWN-hot key: must equal the plain join exactly (lossless — the
    // registered q_join_salted proves the same via its plain-join
    // oracle), must key the exchange on (key, __salt), and must
    // actually spread the hot key's rows across all lanes
    // salting targets the SHUFFLE join path (a broadcastable side
    // needs no salt), so pin the plan there like the AQE test does
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = spark.range(0, 20000).select(
        when(col("id") < 18000, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("rowid"))
      val small = spark.range(0, 500)
        .select(col("id").as("k"), (col("id") * 10).as("w"))
      val salted = graft.operators.SaltedAgg
        .innerJoinSalted(big, small, "k", Seq(col("rowid")), salts = 8)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(rows(salted) === rows(big.join(small, "k")),
        "salted join must be row-identical to the plain join")
      val exchanges = salted.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("hashpartitioning")).toSeq
      assert(exchanges.nonEmpty && exchanges.forall(_.contains("__salt")),
        s"join exchanges must carry the salt:\n${exchanges.mkString("\n")}")
      val lanes = big
        .withColumn("__salt", pmod(xxhash64(col("rowid")), lit(8L)))
        .filter(col("k") === 0L).select("__salt").distinct().count()
      assert(lanes === 8L, s"hot key used only $lanes of 8 lanes")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("AQE splits a skewed join partition at runtime (the 100 TB skew posture)") {
    // The engine's big-join answer to key skew is AQE's runtime
    // skew-join split; compile-time salting is the planned-ahead
    // complement (operators/SaltedAgg, previous test). Prove the claimed behavior
    // actually fires: a 90%-one-key join, thresholds scaled to test
    // data, must plan `skew=true` in the FINAL adaptive plan.
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.shuffle.partitions" -> "8")
    val prior = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 200000).select(
        when(col("id") < 180000, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("payload-"), col("id")).as("v"))
      val right = spark.range(0, 2000).select(
        col("id").as("k"), col("id").as("w"))
      val joined = left.join(right, "k")
      // collect(), not count(): count() builds its own QueryExecution,
      // leaving `joined`'s adaptive plan unexecuted (isFinalPlan=false)
      // k=0 matches once (180000 rows); ids >= 180000 have no match
      assert(joined.collect().length === 180000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed join split:\n$finalPlan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    // The third leg of the engine's big-join posture (salting = planned,
    // AQE skew split = reactive, runtime filters = semi-join reduction):
    // when the dimension side is small and filtered, Catalyst must
    // inject a bloom_filter_agg on it and a might_contain probe on the
    // fact side's scan, so fact rows that cannot join never shuffle.
    // Thresholds scale to test data; production defaults (10GB scan
    // gate) target exactly the 100 TB case.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.analytics.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      val p = graft.analytics.Tables(spark, "/root/testdata/sf0.001", "part")
        .filter(col("p_partkey") % 100 === 0)
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg"),
        s"no bloom filter built on the dimension side:\n${plan.take(2000)}")
      assert(plan.contains("might_contain"),
        s"no runtime probe on the fact side:\n${plan.take(2000)}")
      // and the filter is semantically inert: same row count either way
      val n = j.count()
      keys.foreach { case (k, _) => spark.conf.unset(k) }
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val li2 = graft.analytics.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      val p2 = graft.analytics.Tables(spark, "/root/testdata/sf0.001", "part")
        .filter(col("p_partkey") % 100 === 0)
      assert(li2.join(p2, col("l_partkey") === col("p_partkey")).count() === n)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("intervalDegree: brute-force parity on a skewed-span fixture, any bucket width") {
    // Worst case for any pair-materializing plan: one HOT point where
    // almost every span overlaps (a few long spans covering everything
    // + a pile of short spans clustered there), plus disjoint
    // stragglers and several EXACT shared endpoints to exercise the
    // inclusive/strict tie handling. Degrees must match the O(n²)
    // brute force at every bucket width, including nBuckets = 1
    // (everything in one sorted scan) and widths far above n.
    val spans: Seq[(Long, Long, Long, Long)] =
      // (id1, id2, st, en): three corpus-length spans
      Seq((1L, 1L, 0L, 1000L), (2L, 1L, 10L, 990L), (3L, 1L, 0L, 500L)) ++
        // twenty short spans piled on the hot region [400, 420]
        (0 until 20).map(i => (10L + i, 1L, 400L + i, 402L + i)) ++
        // exact-endpoint ties: b starts exactly where a ends
        Seq((40L, 1L, 100L, 200L), (41L, 1L, 200L, 300L)) ++
        // disjoint stragglers far right
        Seq((50L, 1L, 5000L, 5010L), (51L, 1L, 6000L, 6010L))
    val df = spans.toDF("u", "i", "st", "en")
    val brute = spans.map { case (u, _, st, en) =>
      u -> spans.count { case (v, _, st2, en2) =>
        v != u && st <= en2 && st2 <= en
      }.toLong
    }.toMap
    for (nB <- Seq(1, 3, 256, 4096)) {
      val got = OrderStatistics
        .intervalDegree(df, "u", "i", "st", "en", nBuckets = nB)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === brute, s"nBuckets=$nB: $got vs brute $brute")
    }
  }

  test("groupRowRanks minRank: correct under a planted 90% tie run; skew bound documented") {
    // Pathological tie distribution for the minRank-mode range keys:
    // one (g, v) run holds 90% of the group's rows. The (g, v) keying
    // is BY DESIGN — RangePartitioner sends equal keys to ONE
    // partition, so a tie run never splits and its shared min-rank
    // base is exact. The price is the documented skew bound: the
    // partition owning the run holds ≥ the run's fraction of the
    // input. This spec pins BOTH halves of that contract.
    val hot = (0 until 1800).map(i => ("A", 100L, s"h$i"))
    val cold = (0 until 100).map(i => ("A", 200L + i, s"c$i")) ++
      (0 until 100).map(i => ("B", 300L + i, s"b$i"))
    val rows = new scala.util.Random(11).shuffle(hot ++ cold)
    val df = rows.toDF("g", "v", "p")
    // 1) correctness holds regardless of skew: every row's rk is the
    //    brute-force min-rank (predecessor count + 1) of its (g, v)
    val got = OrderStatistics.groupRowRanks(df, minRank = true)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(got.size === rows.size)
    rows.foreach { case (g, v, p) =>
      val brute = rows.count { case (g2, v2, _) => g2 == g && v2 < v } + 1L
      assert(got((g, p)) === brute, s"($g,$v,$p)")
    }
    // 2) the skew bound is real, not hypothetical: the (g, v) range
    //    exchange lands the whole tie run in ONE partition, which then
    //    holds ≥ 90% of the rows (the run's fraction). A consumer with
    //    a heavy-tie column gets EXACT ranks but pays one straggler
    //    partition — mitigations are row_number mode (unique (g,v,p)
    //    keys split the run, asserted below) or pre-aggregating to
    //    (g, v, count) histograms as the radix cores do.
    val pids = df.repartitionByRange(4, col("g"), col("v"))
      .select(spark_partition_id().as("pid"), col("v"))
    val hotPids = pids.filter(col("v") === 100L)
      .select(col("pid")).distinct().collect().map(_.getInt(0))
    assert(hotPids.length === 1, s"tie run split across $hotPids")
    val maxFrac = pids.groupBy(col("pid")).count().collect()
      .map(_.getLong(1)).max.toDouble / rows.size
    assert(maxFrac >= 0.9, s"expected the documented skew, got $maxFrac")
    // 3) row_number mode on the same fixture: (g, v, p) is unique, the
    //    run splits across partitions, and ranks are a permutation of
    //    1..n within each group
    val rn = OrderStatistics.groupRowRanks(df, minRank = false)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    val byG = rn.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(byG("A") === (1L to 1900L), "row_number must be a permutation")
    assert(byG("B") === (1L to 100L))
    val rnPids = df.repartitionByRange(4, col("g"), col("v"), col("p"))
      .select(spark_partition_id().as("pid"), col("v"))
      .filter(col("v") === 100L)
      .select(col("pid")).distinct().count()
    assert(rnPids > 1, "unique keys must split the tie run")
  }

  test("prefixSumByRank: weighted brute-force parity, ties, any bucket width") {
    import spark.implicits._
    // value ties (three points at 50), zero and negative weights,
    // queries off the point grid and exactly on tie values
    val pts: Seq[(Long, Long)] =
      Seq((10L, 3L), (50L, 7L), (50L, 1L), (50L, 2L), (90L, 5L),
        (200L, 11L), (200L, 0L), (500L, -4L))
    val qs: Seq[(Long, Long)] =
      Seq((1L, 5L), (2L, 10L), (3L, 50L), (4L, 51L), (5L, 200L),
        (6L, 499L), (7L, 500L), (8L, 1000L))
    val p = pts.toDF("v", "w")
    val q = qs.map { case (id, x) => (id, 0L, x) }
      .toDF("user_id", "session_idx", "q")
    for (incl <- Seq(true, false); nB <- Seq(1, 2, 256)) {
      val brute = qs.map { case (id, x) =>
        id -> pts.filter { case (v, _) =>
          if (incl) v <= x else v < x
        }.map(_._2).sum
      }.toMap
      val got = OrderStatistics.prefixSumByRank(p, q, incl, nB)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === brute, s"inclusive=$incl nBuckets=$nB")
    }
    // countByRank delegation: w ≡ 1 reproduces plain rank counts
    val cnt = OrderStatistics.countByRank(
      p.select(col("v")), q, inclusive = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bruteCnt = qs.map { case (id, x) =>
      id -> pts.count(_._1 <= x).toLong
    }.toMap
    assert(cnt === bruteCnt)
  }

  test("bloom prune: no false negatives, bounded pass-through, join unchanged") {
    import spark.implicits._
    // build side: 1000 composite keys; probe: 10k rows of which only
    // 500 truly match — the wedge-closure shape in miniature
    val build = (0L until 1000L).map(i => (i, i * 7L)).toDF("x", "y")
    val probe = (0L until 10000L)
      .map(i => (i % 2000L, (i % 2000L) * 7L, i)).toDF("px", "py", "tag")
    val pruned = BloomPrune.pruneByBloom(probe, build,
      expectedItems = 2000L, numBits = 16384L,
      buildKeys = Seq(col("x"), col("y")),
      probeKeys = Seq(col("px"), col("py")))
    // every truly-matching probe row survives (no false negatives)...
    val trueMatches = probe.join(build,
      col("px") === col("x") && col("py") === col("y"))
    assert(pruned.join(build,
      col("px") === col("x") && col("py") === col("y")).count()
      === trueMatches.count(), "pruning changed the inner join")
    // ...and the pass-through rate is fp-bounded: 5000 true + at most
    // a few % of the 5000 non-matching rows
    val passed = pruned.count()
    assert(passed >= 5000L, s"false negatives: $passed < 5000")
    assert(passed <= 5000L + 500L,
      s"fp rate blown: ${passed - 5000L} of 5000 non-matching passed")
  }
}
