package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions via the public
  * SparkSessionExtensions mechanism. Builds its own session (extensions
  * apply at session construction) and restores the shared one after. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("graft_dot and graft_shingles are callable from SQL") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dot = s.sql(
        "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
        .head().getDouble(0)
      assert(dot === 32.0)
      val sh = s.sql(
        "SELECT graft_shingles(array('a', 'b', 'c', 'b', 'c'), 2)")
        .head().getSeq[String](0)
      assert(sh === Seq("a b", "b c", "c b")) // deduped, order kept
      // strict validators: null = valid, else the reason string
      val vals = s.sql(
        """SELECT graft_dns_validity('{nope'),
                  graft_envelope_validity('{"requestId":7,"records":[{"data":"eA=="}]}'),
                  graft_envelope_validity('{"requestId":"r","records":[{"data":"eA=="}]}')""")
        .head()
      assert(vals.getString(0) === "json")
      assert(vals.getString(1) === "requestId_type")
      assert(vals.isNullAt(2))
      // NULL input is an INVALID document ("json"), never NULL=valid —
      // `WHERE graft_*_validity(x) IS NULL` must not bless null rows
      val nulls = s.sql(
        """SELECT graft_dns_validity(CAST(NULL AS STRING)),
                  graft_envelope_validity(CAST(NULL AS STRING))""").head()
      assert(nulls.getString(0) === "json")
      assert(nulls.getString(1) === "json")
      // json.loads parity on the byte path: a UTF-8 BOM is a parse
      // failure ("Unexpected UTF-8 BOM" in Python) even though
      // Jackson's byte bootstrapper would silently skip it
      val bomEnv = "\uFEFF" +
        "{\"requestId\":\"r\",\"records\":[{\"data\":\"eA==\"}]}"
      val bom = s.sql(
        "SELECT graft_dns_validity('\uFEFF{}'), " +
          s"graft_envelope_validity('$bomEnv')").head()
      assert(bom.getString(0) === "json", "BOM payload must fail as json")
      assert(bom.getString(1) === "json", "BOM envelope must fail as json")
      // DnsRecordParse lies `deterministic=false` to pin one evaluation
      // per row; outside Project/Filter/Aggregate/Window that flag
      // throws at analysis, so the expression must NEVER reach the SQL
      // registry (users would put it in GROUP BY/JOIN keys). Pin the
      // EXACT registered set: any new registration — under any name —
      // fails here and forces a conscious decision (and DnsRecordParse
      // must never be the function behind it).
      val graftFns = s.sessionState.functionRegistry.listFunction()
        .map(_.funcName).filter(_.startsWith("graft_")).sorted
      assert(graftFns === Seq("graft_cdc_chunks", "graft_dns_validity",
        "graft_dot", "graft_envelope_validity", "graft_shingles"),
        s"unexpected graft_* SQL registration: $graftFns")
      // the CDC kernel is SQL-callable and type-checks its input at
      // analysis time (BINARY payloads only)
      val cdc = s.sql(
        """SELECT graft_cdc_chunks(encode('abcdefgh', 'UTF-8'))""").head()
      assert(cdc.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1)).sum
        === 8L, "chunk lengths must cover the payload")
      val badType = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_cdc_chunks('not binary')").collect()
      }
      assert(badType.getMessage.toLowerCase.contains("binary"))
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
