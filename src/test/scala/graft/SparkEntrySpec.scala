package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every operator the engine claims is a
  * registered query, and (almost) every query carries an oracle. A
  * refactor that silently drops a registry entry shrinks the round's
  * correctness coverage without failing any behavior test — this spec
  * makes that loud. The count is intentionally a literal: adding or
  * removing a query must touch this file too. */
class SparkEntrySpec extends AnyFunSuite {

  test("registry: full query count, sketches are the only oracle-less entries") {
    val qs = SparkEntry.queries.keySet
    assert(qs.size === 79, s"registered query count changed: ${qs.size}")
    // the two sketch queries cannot hash-match another engine and are
    // error-bound spec-tested instead (AnalyticsSpec); everything else
    // MUST carry a DuckDB oracle for the driver's differential gate
    val noOracle = qs -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set("q_hll_distinct", "q_quantile_sketch"),
      s"oracle-less queries changed: $noOracle")
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs),
      "oracle entries must reference registered queries")
    // name hygiene: stable snake-case slugs (the driver keys artifacts
    // and correctness cells by these names)
    assert(qs.forall(_.matches("q_[a-z0-9_]+")), s"bad names in: $qs")
  }
}
