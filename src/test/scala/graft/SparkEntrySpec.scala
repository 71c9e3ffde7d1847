package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every operator the engine claims is a
  * registered query, and (almost) every query carries an oracle. A
  * refactor that silently drops a registry entry shrinks the round's
  * correctness coverage without failing any behavior test — this spec
  * makes that loud. The count is intentionally a literal: adding or
  * removing a query must touch this file too. */
class SparkEntrySpec extends AnyFunSuite {

  test("registry: full query count, every query carries an oracle") {
    val qs = SparkEntry.queries.keySet
    assert(qs.size === 294, s"registered query count changed: ${qs.size}")
    // since the sketch queries were reshaped into in-engine bound
    // checks (round 6), EVERY registered query must carry a DuckDB
    // oracle for the driver's differential gate — a new oracle-less
    // entry is a gate regression, not a style choice
    val noOracle = qs -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"oracle-less queries: $noOracle")
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs),
      "oracle entries must reference registered queries")
    // name hygiene: stable snake-case slugs (the driver keys artifacts
    // and correctness cells by these names)
    assert(qs.forall(_.matches("q_[a-z0-9_]+")), s"bad names in: $qs")
  }
}
