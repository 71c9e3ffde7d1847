package graft.dns

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** End-to-end batch composition of the reference pipeline
  * (SURVEY.md §3 entry point 1): envelope documents in → BIND9 lines +
  * quarantined records + rejected envelopes out.
  *
  * Shape: every step is a narrow, codegen-friendly transform — the whole
  * envelope→lines path runs shuffle-free, so it scales linearly with
  * input splits (the 100 TB case is embarrassingly parallel here; cost
  * centers only appear in the analytics layer).
  */
object Pipeline {

  /** Result of one batch: the three disjoint outputs the reference
    * produces implicitly (emit / drop-record / reject-batch), plus the
    * persist handle backing the shared decode stage (empty when
    * `materializeDecode = false` — the registered single-output
    * queries run cache-free). Multi-output callers call [[Outputs
    * .release]] (or hand `cacheHandles` to
    * `QueryScopedCache.releaseAfter`) once the outputs are consumed —
    * `Streaming.start` does so per batch; a long-lived session that
    * never releases accumulates cache entries (round-3 verdict). */
  final case class Outputs(
      lines: DataFrame,      // requestId, record_idx, line_idx, line
      quarantine: DataFrame, // requestId, record_idx, data, reason
      rejectedEnvelopes: DataFrame, // requestId, reject_reason
      cacheHandles: Seq[DataFrame] = Nil) {
    /** Unpersist the decode cache (no-op on streaming batches). */
    def release(): Unit = cacheHandles.foreach(_.unpersist(blocking = false))
  }

  /** Parse raw envelope JSON documents (one per row) with the declared
    * schema — the `request.get_json()` step (app/app.py:78) — plus the
    * type-strict jsonschema verdict computed on the RAW text before
    * `from_json`'s coercions can mask a type violation (a numeric
    * `requestId` would be stringified, a string `timestamp` nulled —
    * both 400 the whole batch in the reference, app/app.py:35-58,88-93).
    * The carried `envelope_strict_reason` column is consumed (and
    * dropped) by [[envelopeRejectReason]]. */
  def parseEnvelopes(raw: Dataset[String]): DataFrame =
    raw.toDF("json").select(
      from_json(col("json"), Schemas.envelopeSchema).as("env"),
      graft.functions.DnsFunctions.envelopeValidityReason(col("json"))
        .as("envelope_strict_reason"))
      .select(col("env.*"), col("envelope_strict_reason"))

  /** Op 2 — envelope (batch-level) validation, reproducing the
    * jsonschema gate (app/app.py:35-58,79,88-93): a violation rejects
    * the WHOLE batch where later per-record errors drop only the record.
    * Returns null for a valid envelope, else the failed constraint. */
  def envelopeRejectReason(df: DataFrame): DataFrame = {
    val structural =
      when(col("requestId").isNull, lit("requestId_missing"))
        .when(col("records").isNull, lit("records_missing"))
        .when(size(col("records")) < Schemas.minRecordsPerBatch,
          lit("records_empty"))
        .when(size(col("records")) > Schemas.maxRecordsPerBatch,
          lit("records_over_max"))
        .when(!forall(col("records"),
          r => r.getField("data").isNotNull &&
            length(r.getField("data")) <= Schemas.maxDataLength),
          lit("data_invalid"))
        .otherwise(lit(null).cast("string"))
    // Raw-JSON ingest carries the type-strict verdict from
    // parseEnvelopes (strictly stronger than the structural checks);
    // envelopes built as structured DataFrames are correctly typed by
    // construction and keep the structural gate.
    val reason =
      if (df.columns.contains("envelope_strict_reason"))
        coalesce(col("envelope_strict_reason"), structural)
      else structural
    df.withColumn("reject_reason", reason)
      .drop("envelope_strict_reason")
  }

  /** Ops 3–8 over accepted envelopes: one row per record with validity
    * reason and (for clean rows) the one-pass-parsed fields + event
    * timestamp.
    *
    * Intra-plan parse duplication is solved at the expression level
    * (`DnsRecordParse.deterministic = false` stops CollapseProject
    * from cloning the parse into every field reference — it used to
    * make 42 copies). The optional persist (MEMORY_AND_DISK) exists
    * for MULTI-OUTPUT consumers only: `process()` exposes lines +
    * quarantine + rejects, and a caller draining more than one would
    * otherwise re-run the decode per output. Single-output consumers
    * pass `materialize = false` and pay zero cache build.
    *
    * This thin wrapper is therefore cache-FREE: it cannot return the
    * persist handle, and a dropped handle is a session-lifetime cache
    * leak (the round-3 bug class). Multi-output callers use
    * [[process]] (scoped release built in) or
    * [[decodedRecordsScoped]] and unpersist the handles themselves. */
  def decodedRecords(envelopes: DataFrame): DataFrame =
    decodedRecordsScoped(envelopes, materialize = false)._1

  /** [[decodedRecords]] plus the persist handle (empty for streaming
    * plans or `materialize = false`), so callers can unpersist once
    * their action completes instead of leaving the cache to
    * session-lifetime `clearCache`. */
  def decodedRecordsScoped(envelopes: DataFrame,
      materialize: Boolean = true): (DataFrame, Seq[DataFrame]) = {
    val parsed = Decode.parseRecords(Decode.explodeRecords(envelopes))
    // Streaming plans can't persist; their per-batch plans are consumed
    // once inside foreachBatch anyway (which runs this on the batch DF).
    if (parsed.isStreaming || !materialize) (Decode.decorate(parsed), Nil)
    else {
      val materialized =
        parsed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (Decode.decorate(materialized), Seq(materialized))
    }
  }

  /** Ops 7–12 over clean records: typed projection, deterministic client
    * tag, 1+|answers| BIND9 lines, exploded in emit order. */
  def bind9Lines(cleanRecords: DataFrame): DataFrame = {
    val dns = Decode.projectDnsFields(cleanRecords)
    val tag = Format.deterministicHexTag(
      col("requestId"), col("record_idx"), col("query_name"),
      col("query_timestamp"))
    dns
      .withColumn("lines", Format.bind9Lines(
        col("query_ts"), col("vpc_id"), tag, col("srcaddr"),
        col("srcport"), col("query_name"), col("answers")))
      .select(col("requestId"), col("record_idx"), posexplode(col("lines")))
      .withColumnsRenamed(Map("pos" -> "line_idx", "col" -> "line"))
  }

  /** The dead-code Microsoft formatter surface (op 13) — same pipeline,
    * one line per record, non-default exactly as in the reference. */
  def microsoftDnsLines(cleanRecords: DataFrame): DataFrame =
    Decode.projectDnsFields(cleanRecords)
      .withColumn("line", Format.microsoftDnsLine(
        col("query_ts"), col("transport"), col("srcaddr"), col("srcport"),
        col("rcode"), col("query_name"), col("answers")))
      .select(col("requestId"), col("record_idx"), col("line"))

  /** Full batch: envelope gate → record decode/validate → split into
    * lines / quarantine / rejected envelopes (op 17 semantics: a poison
    * record quarantines alone; its batch keeps flowing,
    * app/app.py:219-263). */
  def process(envelopes: DataFrame,
      materializeDecode: Boolean = true): Outputs = {
    val gated = envelopeRejectReason(envelopes)
    val accepted = gated.filter(col("reject_reason").isNull)
      .drop("reject_reason")
    val rejected = gated.filter(col("reject_reason").isNotNull)
      .select(col("requestId"), col("reject_reason"))
    // materializeDecode = false for callers consuming a SINGLE output:
    // each output re-parses independently, so sharing buys nothing and
    // the cache build is pure overhead.
    val (records, handles) = decodedRecordsScoped(accepted, materializeDecode)
    val clean = records.filter(col("reason").isNull)
    val dirty = records.filter(col("reason").isNotNull)
      .select(col("requestId"), col("record_idx"), col("data"), col("reason"))
    Outputs(bind9Lines(clean), dirty, rejected, handles)
  }

  /** Convenience: raw JSON documents straight to outputs. */
  def processJson(raw: Dataset[String]): Outputs =
    process(parseEnvelopes(raw))

  /** Op 16 — the Firehose HTTP-endpoint response documents: success
    * `{requestId, timestamp}` (app/app.py:99-102), failure
    * `{requestId: "unknown", timestamp, errorMessage}`
    * (app/app.py:88-93). `receivedAtMs` is injected rather than
    * wall-clock so replays are deterministic; a transport layer stamps
    * real receipt time. */
  def ackResponses(envelopes: DataFrame, receivedAtMs: Long): DataFrame =
    envelopeRejectReason(envelopes).select(
      when(col("reject_reason").isNull, col("requestId"))
        .otherwise(lit("unknown")).as("requestId"),
      lit(receivedAtMs).as("timestamp"),
      when(col("reject_reason").isNull, lit(null).cast("string"))
        .otherwise(concat(lit("Invalid data format: "),
          col("reject_reason"))).as("errorMessage"))

  /** Typed edge (op 7's DNSQuery class, app/app.py:107-124): clean
    * decoded records as a Dataset of the 14-field case class, for users
    * who want compile-time row types instead of DataFrames. */
  def toDnsQueries(cleanRecords: DataFrame): Dataset[DnsQuery] = {
    val spark = cleanRecords.sparkSession
    import spark.implicits._
    Decode.projectDnsFields(cleanRecords)
      .select(Schemas.dnsRecordSchema.fieldNames.map(col).toSeq: _*)
      .as[DnsQuery]
  }
}
