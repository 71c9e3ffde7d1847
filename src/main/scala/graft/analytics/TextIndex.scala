package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the LEXICAL member of the store
  * trio ([[SignatureStore]] dedup / [[VectorIndex]] ANN / this): the
  * inline [[TextQueries.qTextBm25]] rebuilds postings, document
  * frequencies, and corpus statistics from the corpus on every run; a
  * production search pipeline builds them ONCE at ingest and serves
  * every query from the stored tables — the Lucene/ES segment
  * economics, expressed as catalog tables.
  *
  * Layout (generation-suffixed via [[StoreMeta]], atomic pointer swap,
  * keep-two retention — identical lifecycle guarantees to the other
  * two stores):
  *   - `{store}_post`  (w, doc_id, n, dl) — the postings, bucketed by
  *     term so a query's probe reads inverted lists in place; the doc
  *     length is DENORMALIZED into each posting (the impact-ordered-
  *     postings trick) so scoring never joins a per-doc side table
  *   - `{store}_dict`  (w, df, n_w) — the dictionary: per-term doc
  *     frequency (idf basis) and collection frequency (the query-set
  *     derivation basis), bucketed by term
  *   - `{store}_stats` one row (n_docs, n_total) — the BM25 corpus
  *     constants, FROZEN at ingest
  *
  * Drift contract — the trio's full spectrum, now explicit in code:
  * postings are LOSSLESS (unlike [[VectorIndex]]'s PQ codes), so
  * [[reingest]] refreshes dictionary and statistics entirely from the
  * stored postings with NO corpus re-read — the same stored-state
  * refresh [[SignatureStore.reingest]] performs, and stronger than the
  * vector store can ever offer (its refresh must re-read originals).
  * [[admit]] appends under FROZEN geometry: new postings surface
  * immediately, but idf/avgdl stay ingest-time values until a reingest
  * republishes them — which `q_text_bm25_reingested`'s shared oracle
  * proves restores EXACTLY the scores of a from-scratch ingest. */
object TextIndex {

  private[analytics] val parts = Seq("post", "dict", "stats")

  /** (doc_id, w, n, dl) term frequencies with the doc length attached,
    * plus the persisted tf handle the caller unpersists after its
    * write action — the tf aggregation feeds both the doc-length
    * reduction and the join probe, so the corpus tokenizes once.
    * `docs` is any (doc_id, text) frame. */
  private def postings(docs: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("n"))
      .persist(MEMORY_AND_DISK)
    val dl = tf.groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("dl"))
    (tf.join(dl, "doc_id"), tf)
  }

  /** Build and persist the index for a (doc_id, text) corpus frame:
    * one tokenize pass feeds the bucketed postings; dictionary and
    * statistics then derive from the WRITTEN postings table (read
    * back, so the three parts are consistent by construction).
    * `buckets` sizes the postings/dictionary tables (at scale: vocab
    * shards of a few hundred MB, multiple of executor cores). */
  def ingest(docs: DataFrame, store: String, buckets: Int = 8): Unit = {
    val s = docs.sparkSession
    val g = StoreMeta.begin(s, store)
    def gt(p: String) = StoreMeta.name(store, p, g)
    parts.foreach(p => SignatureStore.dropStale(s, gt(p)))
    val (post, tfHandle) = postings(docs)
    try Bucketing.alignToBuckets(
        post.select(col("w"), col("doc_id"), col("n"), col("dl")),
        "w", buckets)
      .write.bucketBy(buckets, "w").sortBy("w")
      .format("parquet").mode("overwrite").saveAsTable(gt("post"))
    finally tfHandle.unpersist()
    SignatureStore.markStoreTable(s, gt("post"))
    writeDerived(s, store, g, buckets)
  }

  /** Dictionary + statistics from generation `g`'s postings table,
    * then the atomic commit — shared by [[ingest]] (postings just
    * written) and [[reingest]] (postings copied forward). */
  private def writeDerived(s: SparkSession, store: String, g: Long,
      buckets: Int): Unit = {
    def gt(p: String) = StoreMeta.name(store, p, g)
    val post = s.table(gt("post"))
    Bucketing.alignToBuckets(
        post.groupBy(col("w"))
          .agg(count(lit(1)).as("df"), sum(col("n")).cast("long").as("n_w")),
        "w", buckets)
      .write.bucketBy(buckets, "w").sortBy("w")
      .format("parquet").mode("overwrite").saveAsTable(gt("dict"))
    SignatureStore.markStoreTable(s, gt("dict"))
    val dl = post.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
    dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).cast("long").as("n_total"))
      .write.format("parquet").mode("overwrite").saveAsTable(gt("stats"))
    SignatureStore.markStoreTable(s, gt("stats"))
    val ndocs = s.table(gt("stats")).select(col("n_docs")).head.getLong(0)
    StoreMeta.commit(s, store, g, parts, Some(ndocs))
  }

  /** Admit a batch of new documents under the store's FROZEN
    * dictionary and statistics — the daily-crawl append: one narrow
    * tokenize pass over the batch, postings appended with the
    * ingest-time bucket count (catalog-read so the append matches the
    * stored layout). New postings surface in the very next [[search]];
    * idf and avgdl deliberately DO NOT move (scores of already-indexed
    * docs never change under an append — the segment-freeze property),
    * and terms absent from the frozen dictionary contribute nothing
    * until a [[reingest]] republishes geometry. doc_ids must be new to
    * the store (append-only; dedup upstream — that is what
    * [[SignatureStore]] is for). */
  def admit(s: SparkSession, store: String, batch: DataFrame): Unit = {
    val gen = StoreMeta.genOrFail(s, store)
    val postT = StoreMeta.name(store, "post", gen)
    val buckets = SignatureStore.bucketCount(s, postT)
    val (post, tfHandle) = postings(batch)
    try Bucketing.alignToBuckets(
        post.select(col("w"), col("doc_id"), col("n"), col("dl")),
        "w", buckets)
      .write.format("parquet").mode("append")
      .bucketBy(buckets, "w").sortBy("w")
      .saveAsTable(postT)
    finally tfHandle.unpersist()
    StoreMeta.addDocs(s, store, batch.select(col("doc_id")).distinct.count)
    // invalidate the CALLER session's relation cache — inside
    // foreachBatch the write runs on the micro-batch session clone
    // (see SignatureStore.admit)
    s.catalog.refreshTable(postT)
  }

  /** Refresh dictionary and statistics from STORED STATE ONLY — no
    * corpus re-read, because postings are lossless (the deliberate
    * contrast with [[VectorIndex.reingest]]'s `originals` parameter):
    * generation N's postings copy forward into generation N+1 (the
    * keep-two retirement means every generation must carry complete
    * parts), the dictionary and statistics recompute from them, and
    * the atomic swap republishes — a search racing the refresh still
    * answers entirely from the old geometry. `q_text_bm25_reingested`
    * proves the refresh exact: ingest-minus-batch + admit + reingest
    * hash-matches the from-scratch full-corpus oracle. */
  def reingest(s: SparkSession, store: String): Unit = {
    val gen = StoreMeta.genOrFail(s, store)
    val buckets = SignatureStore.bucketCount(
      s, StoreMeta.name(store, "post", gen))
    val g = gen + 1
    def gt(p: String) = StoreMeta.name(store, p, g)
    parts.foreach(p => SignatureStore.dropStale(s, gt(p)))
    Bucketing.alignToBuckets(
        s.table(StoreMeta.name(store, "post", gen)), "w", buckets)
      .write.bucketBy(buckets, "w").sortBy("w")
      .format("parquet").mode("overwrite").saveAsTable(gt("post"))
    SignatureStore.markStoreTable(s, gt("post"))
    writeDerived(s, store, g, buckets)
  }

  /** Upgrade a pre-generation layout in place (see
    * [[StoreMeta.migrate]]); ndocs recovers from the legacy stats
    * row once validation has confirmed the layout. */
  def migrate(s: SparkSession, store: String): Unit =
    StoreMeta.migrate(s, store, parts,
      Some(s.table(s"${store}_stats").select(col("n_docs")).head.getLong(0)))

  /** The stored query set: top-24 dictionary terms by (collection
    * frequency desc, term), three per query — the same derivation as
    * the inline [[TextQueries.bm25PerDoc]], but from the FROZEN
    * dictionary, so the query set is stable under admits. Returns
    * (qid, w). */
  def derivedQueries(s: SparkSession, store: String): DataFrame = {
    val gen = StoreMeta.genOrFail(s, store)
    s.table(StoreMeta.name(store, "dict", gen))
      .orderBy(col("n_w").desc, col("w")).limit(24)
      .agg(sort_array(collect_list(
        struct((-col("n_w")).as("negn"), col("w")))).as("ts"))
      .select(posexplode(col("ts")))
      .select(expr("CAST(pos DIV 3 AS BIGINT)").as("qid"),
        col("col.w").as("w"))
  }

  /** BM25 top-k against the stored index for a (qid, w) query frame.
    * Nothing here re-reads the corpus: idf comes from the dictionary
    * probe (query side broadcast — a vocab-bounded narrow pass),
    * scores from the bucketed postings probe with the doc length
    * riding each posting, and the corpus constants from the one-row
    * stats broadcast. Arithmetic is byte-identical to
    * [[TextQueries.bm25PerDoc]] — which is how `q_text_bm25_stored`
    * shares the inline query's DuckDB oracle verbatim. */
  def search(s: SparkSession, store: String, queries: DataFrame,
      topk: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one generation resolve for the whole search (see StoreMeta)
    val gen = StoreMeta.genOrFail(s, store)
    def gt(p: String) = StoreMeta.name(store, p, gen)
    val stats = s.table(gt("stats"))
    val qt = s.table(gt("dict")).join(broadcast(queries), "w")
      .crossJoin(broadcast(stats))
      .select(col("w"), col("qid"),
        round(log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))), 6).as("idf"))
    val scored = s.table(gt("post")).join(broadcast(qt), "w")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        round(col("idf") * ((col("n") * lit(2.2)) /
          (col("n") + lit(0.3) + lit(0.9) *
            (col("dl") * col("n_docs") / col("n_total")))), 6)
          .cast("decimal(25,6)").as("ts"))
    val perDoc = scored.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("ts")).cast("double").as("score"))
    val rw = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= topk)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
      .orderBy(col("qid"), col("rank"))
  }
}
