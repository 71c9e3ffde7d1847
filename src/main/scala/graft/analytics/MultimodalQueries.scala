package graft.analytics

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Driver-facing queries for the multimodal column layer. The metadata
  * projection is oracle-checked; the feature extraction (stub kernel,
  * engine-specific binary batching) is rows-only + spec-tested. */
object MultimodalQueries {
  import RelationalQueries.Q

  /** Opaque-binary metadata: byte length + content hash + type tag. */
  val qMultimodalMeta = Q(
    "q_multimodal_meta",
    (s, dir) =>
      Multimodal.binarize(Tables.spread(Tables(s, dir, "documents")))
        .select(col("doc_id"), col("n_bytes"), col("content_hash"),
          col("media_type"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             MD5(text) AS content_hash,
             'text/plain' AS media_type
      FROM documents ORDER BY doc_id"""))

  /** Batched stub feature extraction over the binary column — validates
    * the full plumbing path end-to-end. Hash-matched: the stub kernel
    * is a byte histogram with SQL-reproducible numerics, so the oracle
    * recomputes bucket 0 from the hex expansion of the UTF-8 bytes
    * (byte % 8 == 0 ⇔ its low hex digit is '0' or '8') and replays the
    * exact double-divide → float → double chain. The same
    * differential-testing recipe applies to a real kernel via golden
    * outputs. */
  val qMultimodalFeatures = Q(
    "q_multimodal_features",
    (s, dir) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.binarize(Tables.spread(Tables(s, dir, "documents"))))
      feats.select(col("doc_id"),
          round(element_at(col("features"), 1).cast("double"), 6)
            .as("f0"),
          size(col("features")).cast("long").as("dim"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents),
      c AS (
        SELECT doc_id, n,
               len(list_filter([substr(hx, 2 * i, 1)
                                for i in generate_series(1, n)],
                               x -> x IN ('0', '8'))) AS c0
        FROM b)
      SELECT doc_id,
             ROUND(CAST(CAST(CAST(c0 AS DOUBLE) / GREATEST(1, n) AS REAL)
                        AS DOUBLE), 6) AS f0,
             CAST(8 AS BIGINT) AS dim
      FROM c ORDER BY doc_id"""))

  /** Frame sampling over the binary column: 4 evenly spread 64-byte
    * windows per document. Hash-matched at the byte level: Spark hexes
    * the sliced binary; the oracle slices the hex expansion of the
    * same UTF-8 bytes (2 hex chars per byte — DuckDB 1.0 has no BLOB
    * substring, hex-string slicing is byte-exact and multibyte-safe
    * where text substr would not be). One narrow generator stage,
    * fan-out 4, no shuffle but the mandated ORDER BY. */
  val qMultimodalFrames = Q(
    "q_multimodal_frames",
    (s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.binarize(Tables.spread(Tables(s, dir, "documents"))))
        .select(col("doc_id"), col("frame_idx"), col("frame_start"),
          hex(col("frame")).as("frame_hex"))
        .orderBy(col("doc_id"), col("frame_idx")),
    Some("""
      WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents),
      f AS (
        SELECT doc_id, k,
               CAST(1 + (k * greatest(n - 64, 0)) // 3 AS BIGINT)
                 AS frame_start,
               hx
        FROM b CROSS JOIN generate_series(0, 3) t(k))
      SELECT doc_id, CAST(k AS BIGINT) AS frame_idx, frame_start,
             substr(hx, 2 * (frame_start - 1) + 1, 128) AS frame_hex
      FROM f ORDER BY doc_id, frame_idx"""))

  val all: Seq[Q] = Seq(qMultimodalMeta, qMultimodalFeatures,
    qMultimodalFrames)
}
