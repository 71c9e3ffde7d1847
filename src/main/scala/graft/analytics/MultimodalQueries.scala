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
      Multimodal.binarize(Tables(s, dir, "documents"))
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
    * the full plumbing path end-to-end (rows-only driver check). */
  val qMultimodalFeatures = Q(
    "q_multimodal_features",
    (s, dir) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.binarize(Tables(s, dir, "documents")))
      feats.select(col("doc_id"),
          round(element_at(col("features"), 1).cast("double"), 6)
            .as("f0"),
          size(col("features")).cast("long").as("dim"))
        .orderBy(col("doc_id"))
    },
    None)

  val all: Seq[Q] = Seq(qMultimodalMeta, qMultimodalFeatures)
}
