package graft.analytics

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Session-lifetime cache hygiene (round-3 verdict task 5): queries
  * that persist shared intermediates must release them once their
  * action completes — WITHOUT the harness-level `clearCache()` the
  * bench/verify mains run. A long-lived interactive session invoking
  * these queries repeatedly must not accumulate cache entries.
  *
  * The release rides a QueryExecutionListener ([[QueryScopedCache]]),
  * which Spark invokes asynchronously after the action returns — so
  * emptiness is polled, not asserted immediately.
  */
class CacheHygieneSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def awaitEmptyCache(context: String): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while (!spark.sharedState.cacheManager.isEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(spark.sharedState.cacheManager.isEmpty,
      s"$context left cache entries behind")
  }

  test("q_dedup_minhash twice, no clearCache: cache drains after each run") {
    // other suites share the session and may legitimately leave caches;
    // this spec owns the assertion window
    spark.catalog.clearCache()
    (1 to 2).foreach { i =>
      val n = SparkEntry.queries("q_dedup_minhash")(spark, sf).count()
      assert(n >= 0)
      awaitEmptyCache(s"q_dedup_minhash run $i")
    }
  }

  test("q_dedup_semantic twice, no clearCache: assignment cache drains") {
    spark.catalog.clearCache()
    (1 to 2).foreach { i =>
      val n = SparkEntry.queries("q_dedup_semantic")(spark, sf).count()
      assert(n > 0)
      awaitEmptyCache(s"q_dedup_semantic run $i")
    }
  }

  test("q_dedup_passage and q_dedup_incremental: caches drain after each run") {
    // passage persists its 8-gram instance table; incremental rides
    // screenBatch's shingle/minhash/candidate persists — both release
    // via QueryScopedCache like the minhash/semantic siblings
    spark.catalog.clearCache()
    // incremental_stored additionally covers SignatureStore: ingest's
    // persists release in its own try/finally, screen's via the handles
    Seq("q_dedup_passage", "q_dedup_incremental",
        "q_dedup_incremental_stored").foreach { q =>
      val n = SparkEntry.queries(q)(spark, sf).count()
      assert(n > 0)
      awaitEmptyCache(q)
    }
  }

  test("q_dns_pipeline_full runs cache-free (single-output, no materialization)") {
    spark.catalog.clearCache()
    val n = SparkEntry.queries("q_dns_pipeline_full")(spark, sf).count()
    assert(n > 0)
    awaitEmptyCache("q_dns_pipeline_full")
  }

  test("a multi-output Pipeline consumer can scope the decode cache to its action") {
    spark.catalog.clearCache()
    val env = spark.range(1).select(
      lit("r2").as("requestId"), lit(1L).as("timestamp"),
      array(struct(lit("e30=").as("data"))).as("records"))
    val out = graft.dns.Pipeline.process(env) // materialized decode
    assert(out.cacheHandles.nonEmpty, "multi-output default must persist")
    // the listener-path wiring a registered multi-output query would use
    val lines =
      QueryScopedCache.releaseAfter(out.lines, out.cacheHandles)
    lines.count()
    awaitEmptyCache("process + releaseAfter")
  }

  test("registry eviction: unexecuted builds beyond the cap release their handles") {
    spark.catalog.clearCache()
    // 300 registered-but-never-run "queries" with one tiny persisted
    // handle each: the registry caps at 256, so at least 44 oldest
    // handles must be unpersisted (cacheManager strictly below 300)
    val dfs = (1 to 300).map { i =>
      val h = spark.range(i).toDF("x")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      QueryScopedCache.releaseAfter(
        h.select(org.apache.spark.sql.functions.sum(org.apache.spark.sql
          .functions.col("x"))), Seq(h))
      h
    }
    val deadline = System.currentTimeMillis() + 20000
    def cachedCount =
      dfs.count(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    while (cachedCount > 256 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(cachedCount <= 256,
      s"eviction must unpersist overflow handles, still cached: $cachedCount")
    spark.catalog.clearCache()
  }

  test("Outputs.release drops the decode cache for direct Pipeline users") {
    spark.catalog.clearCache()
    val env = spark.range(1).select(
      lit("r").as("requestId"), lit(1L).as("timestamp"),
      array(struct(lit("e30=").as("data"))).as("records"))
    val out = graft.dns.Pipeline.process(env)
    out.lines.count()
    assert(out.cacheHandles.nonEmpty, "batch decode must persist")
    out.release()
    awaitEmptyCache("Outputs.release")
  }
}
