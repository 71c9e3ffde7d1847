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

  /** Python's `base64.b64decode` (validate=False) first discards
    * characters outside the base64 alphabet, then requires a multiple-
    * of-4 length with correct `=` padding, else raises binascii.Error
    * (app/app.py:222,255). Spark's `unbase64` never raises in this form,
    * so validity is an explicit regex over the discard-cleaned text. */
  def cleanedBase64(data: Column): Column =
    regexp_replace(data, "[^A-Za-z0-9+/=]", "")

  def isValidBase64(data: Column): Column =
    cleanedBase64(data)
      .rlike("^([A-Za-z0-9+/]{4})*([A-Za-z0-9+/]{4}|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{2}==)?$")

  /** Decoded bytes; null when the base64 text is invalid. */
  def decodedBytes(data: Column): Column =
    when(isValidBase64(data), unbase64(cleanedBase64(data))).otherwise(lit(null))

  /** Python's `.decode('utf-8')` raises on malformed bytes
    * (app/app.py:222,255); Spark's binary→string cast substitutes
    * U+FFFD. Exact detection: a valid UTF-8 byte string round-trips
    * decode∘encode byte-identically, a malformed one does not. */
  def isValidUtf8(bytes: Column): Column =
    encode(bytes.cast("string"), "UTF-8") === bytes

  /** Per-field JSON type introspection on the Variant value:
    * `schema_of_variant` yields "STRING"/"BIGINT"/"VOID"(json null)/
    * NULL(key absent), which gives exactly the reference's
    * presence + isinstance semantics (app/app.py:194-200). */
  private def variantTypeOf(v: Column, path: String): Column =
    schema_of_variant(try_variant_get(v, path, "variant"))

  /** Null-safe: a missing key makes `schema_of_variant` NULL, and SQL
    * three-valued logic would let NULL ride through `&&` chains — every
    * check here must collapse NULL to false. */
  private def isJsonString(v: Column, field: String): Column =
    variantTypeOf(v, s"$$.$field") <=> lit("STRING")

  private def keyPresent(v: Column, path: String): Column =
    try_variant_get(v, path, "variant").isNotNull

  /** `is_valid_dns_data` (app/app.py:175-217) as one Column predicate:
    *  - all 12 scalar fields present with JSON type string;
    *  - `answers` present, a JSON array, every element an object
    *    carrying both `Rdata` and `Type` keys (app/app.py:203-210);
    *  - `srcids` present, an object, carrying key `instance`
    *    (app/app.py:212-215). */
  def isStructurallyValid(v: Column): Column = {
    val scalarsOk = Schemas.stringFields
      .map(f => isJsonString(v, f))
      .reduce(_ && _)
    val answersIsArray =
      coalesce(variantTypeOf(v, "$.answers").startsWith("ARRAY"), lit(false))
    val answersElemsOk = coalesce(
      forall(
        try_variant_get(v, "$.answers", "array<variant>"),
        a =>
          schema_of_variant(a).startsWith("OBJECT") &&
            keyPresent(a, "$.Rdata") &&
            keyPresent(a, "$.Type")),
      lit(false))
    val srcidsOk =
      coalesce(variantTypeOf(v, "$.srcids").startsWith("OBJECT"), lit(false)) &&
        keyPresent(v, "$.srcids.instance")
    scalarsOk && answersIsArray && answersElemsOk && srcidsOk
  }

  /** Strict strptime("%Y-%m-%dT%H:%M:%SZ") (app/app.py:130,149):
    * fractional seconds or an offset raised ValueError → record dropped
    * via the generic handler (app/app.py:261-263). */
  def parsedTimestamp(v: Column): Column =
    try_to_timestamp(
      try_variant_get(v, "$.query_timestamp", "string"),
      lit(Schemas.timestampPattern))

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
    *  - `payload` (decoded JSON text, null if undecodable),
    *  - `v`       (VariantType parse of payload, null if malformed JSON),
    *  - `query_ts`(strictly parsed event-time timestamp),
    *  - `reason`  (null = clean; else base64|json|schema|timestamp,
    *               mirroring the reference's except-arm order,
    *               app/app.py:255-263). */
  def decodeAndValidate(records: DataFrame): DataFrame = {
    val data = col("data")
    val bytes = decodedBytes(data)
    val withPayload = records.withColumn(
      "payload",
      when(data.isNotNull && isValidBase64(data) && isValidUtf8(bytes),
        bytes.cast("string")).otherwise(lit(null)))
    val withVariant = withPayload
      .withColumn("v", try_parse_json(col("payload")))
      .withColumn("query_ts", parsedTimestamp(col("v")))
    withVariant.withColumn(
      "reason",
      when(col("payload").isNull, lit("base64"))
        .when(col("v").isNull, lit("json"))
        .when(!isStructurallyValid(col("v")), lit("schema"))
        .when(col("query_ts").isNull, lit("timestamp"))
        .otherwise(lit(null).cast("string")))
  }

  /** Record construction (op 7, app/app.py:234-249): project the 14
    * validated fields into typed columns.
    *
    * Values come from `from_json`, NOT from the Variant: Spark's variant
    * string extraction decodes the payload's bytes with the JVM default
    * charset, mangling multi-byte UTF-8 when that charset isn't UTF-8 —
    * whereas `from_json` is charset-correct. The Variant is used only
    * for JSON *type* introspection (ASCII type labels, unaffected).
    * `from_json`'s number→string coercion is harmless here: wrong-typed
    * records were already quarantined by [[isStructurallyValid]].
    * `srcids` is parsed in isolation so an exotic nested value can at
    * worst null that one (never-printed) column, not the record. */
  def projectDnsFields(clean: DataFrame): DataFrame = {
    val withDns = clean.withColumn(
      "dns", from_json(col("payload"), Schemas.dnsRecordSchemaSansSrcids))
    withDns.select(
      Seq(col("requestId"), col("record_idx"), col("query_ts")) ++
        Schemas.stringFields.map(f => col("dns").getField(f).as(f)) ++
        Seq(col("dns").getField("answers").as("answers"),
          from_json(get_json_object(col("payload"), "$.srcids"),
            MapType(StringType, StringType)).as("srcids")): _*)
  }
}
