package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-data preparation operators — the steps an LLM data
  * pipeline runs between raw corpus and training shards, beyond
  * dedup/quality (which live in [[DedupQueries]]/[[TextQueries]]):
  * deterministic split assignment, blocklist term scrubbing, and
  * benchmark decontamination.
  *
  * All three are pure narrow transforms or small-side-keyed joins —
  * at 100 TB nothing here shuffles the corpus except the
  * decontamination aggregation, which is keyed on the (tiny,
  * broadcast) benchmark shingle set's matches only.
  */
object PrepQueries {
  import RelationalQueries.Q

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables(s, dir, "documents"))

  /** The [[qPrepSplit]] hash-bucket expression (first two md5 hex
    * digits of the id as an integer in [0, 256)) — ONE definition
    * shared with the pipeline flagship so the composed chain cannot
    * drift from the registered operator's rule. */
  private[analytics] def splitBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("long")

  /** Per-doc DISTINCT word-3-gram shingle rows — the probe relation
    * shared by both decontamination queries and the pipeline
    * flagship (same drift rationale as [[splitBucket]]). */
  private def shingleRows(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("ws"), 3))
          .as("sh"))

  /** Deterministic train/val/test assignment: bucket = the first two
    * hex digits of md5(doc_id) as an integer in [0, 256) — train
    * below 204 (~80%), val below 230 (~10%), else test. Hash-based
    * (never random) so the split is stable under reruns, additions,
    * and engine changes — the property a reproducible training
    * pipeline needs. One narrow stage; the ORDER BY is oracle-mandated. */
  val qPrepSplit = Q(
    "q_prep_split",
    (s, dir) =>
      docs(s, dir)
        .withColumn("bucket", splitBucket(col("doc_id")))
        .select(col("doc_id"),
          when(col("bucket") < 204, lit("train"))
            .when(col("bucket") < 230, lit("val"))
            .otherwise(lit("test")).as("split"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CASE WHEN bucket < 204 THEN 'train'
                  WHEN bucket < 230 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id,
               (instr('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
                 AS bucket
        FROM documents)
      ORDER BY doc_id"""))

  /** Blocklist term scrub: word-boundary regex replacement of
    * blocklisted terms with a redaction token, plus the match count
    * (the audit trail a compliance pass needs). The same shape scrubs
    * PII patterns (emails, phone numbers, IPs) on a real corpus — the
    * word-boundary class is what this synthetic corpus can exercise
    * positively. Java regex and DuckDB's RE2 agree on \b, alternation
    * and the character classes used here; DuckDB needs the 'g' flag to
    * match regexp_replace's replace-all default. Pure narrow stage. */
  val qPrepRedact = Q(
    "q_prep_redact",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          regexp_replace(col("text"), "\\b(customer|value)\\b", "<TERM>")
            .as("clean_text"),
          regexp_count(col("text"), lit("\\b(customer|value)\\b"))
            .cast("long").as("n_redacted"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             regexp_replace(text, '\b(customer|value)\b', '<TERM>', 'g')
               AS clean_text,
             len(regexp_extract_all(text, '\b(customer|value)\b'))
               AS n_redacted
      FROM documents ORDER BY doc_id"""))

  /** Benchmark decontamination: flag corpus documents sharing ≥ 20
    * distinct word-3-gram shingles with a benchmark set (stand-in:
    * doc_id < 10) — the n-gram-overlap decontamination step every
    * published pretraining pipeline runs against eval suites.
    *
    * Scale shape: the benchmark side is small BY DEFINITION (eval
    * suites are thousands of documents, not billions), so its distinct
    * shingle set broadcasts and the corpus is probed in one narrow
    * pass + one aggregation keyed only on matching (doc, shingle)
    * pairs. No stop-shingle cut here — common shingles are exactly
    * what contamination consists of. */
  val qPrepDecontam = Q(
    "q_prep_decontam",
    (s, dir) => {
      val sh = shingleRows(docs(s, dir))
      val benchSh = sh.filter(col("doc_id") < 10)
        .select(col("sh")).distinct()
      sh.filter(col("doc_id") >= 10)
        .join(broadcast(benchSh), "sh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 20)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH sh AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id,
                 unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                         for i in generate_series(1, len(ws)-2)]) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS ws
                FROM documents))),
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 10)
      SELECT s.doc_id, COUNT(*) AS n_shared
      FROM sh s JOIN bench b ON s.sh = b.sh
      WHERE s.doc_id >= 10
      GROUP BY 1 HAVING COUNT(*) >= 20
      ORDER BY doc_id"""))

  /** Bloom-filter decontamination — [[qPrepDecontam]]'s shape at the
    * scale where the benchmark shingle SET no longer broadcasts: a
    * public test suite can carry billions of distinct shingles
    * (strings), but its Bloom filter is a fixed m-bit array. The
    * filter here is pure DataFrame algebra — each shingle's 60-bit
    * md5 fingerprint yields k=3 bit positions by double hashing
    * (h1 = fp mod m, h2 = odd stride from the next 15 fingerprint
    * bits; md5 bits are uniform, so no further mixing is needed and
    * every step stays far from Long overflow under ANSI) — and
    * therefore DETERMINISTIC: DuckDB rebuilds the identical filter
    * from the same arithmetic, so unlike the HLL/GK sketches this
    * sketch query is gated by full value hash-match, false positives
    * included.
    *
    * The probe is a broadcast join of corpus shingle positions
    * against the ≤ 2^16-row set-bit table, then two map-side-combined
    * aggregations: a shingle hits iff all 3 of its positions are set
    * (no false negatives by construction — the gate emits the exact
    * overlap next to the Bloom count so the superset invariant is
    * hash-checked), a doc is flagged at the same ≥ 20 threshold. At
    * 100 TB only the Bloom side runs (the exact column exists for the
    * differential gate, as in the sketch queries); flagged docs then
    * re-verify against the exact set, which is the standard two-tier
    * decontamination economics. */
  val qPrepDecontamBloom = Q(
    "q_prep_decontam_bloom",
    (s, dir) => {
      val posExpr =
        """transform(sequence(0, 2), i ->
             (fp % 65536 + i * (2 * ((fp div 1048576) % 32768) + 1))
               % 65536)"""
      val sh = shingleRows(docs(s, dir))
      val fp = sh.withColumn("fp", DedupQueries.fingerprint(col("sh")))
      val bloomPos = fp.filter(col("doc_id") < 10)
        .select(explode(expr(posExpr)).as("pos")).distinct()
      // a shingle hits iff ALL 3 probe positions are set — and the odd
      // h2 stride over the power-of-two m makes the 3 positions
      // provably distinct, so the surviving-row count is the test
      val bloomHits = fp.filter(col("doc_id") >= 10)
        .select(col("doc_id"), col("sh"), explode(expr(posExpr)).as("pos"))
        .join(broadcast(bloomPos), "pos")
        .groupBy(col("doc_id"), col("sh"))
        .agg(count(lit(1)).as("n_probe"))
        .filter(col("n_probe") === 3)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bloom"))
      val exact = fp.filter(col("doc_id") >= 10)
        .join(broadcast(
          fp.filter(col("doc_id") < 10).select(col("sh")).distinct()), "sh")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      bloomHits.filter(col("n_bloom") >= 20)
        .join(exact, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bloom"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (col("n_bloom") >= coalesce(col("n_shared"), lit(0L)))
            .as("no_false_negative"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH sh AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id,
                 unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                         for i in generate_series(1, len(ws)-2)]) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS ws
                FROM documents))),
      fp AS (
        SELECT doc_id, sh,
               CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS fp
        FROM sh),
      pos AS (
        SELECT doc_id, sh,
               (fp % 65536 + i * (2 * ((fp // 1048576) % 32768) + 1))
                 % 65536 AS pos
        FROM fp, generate_series(0, 2) AS g(i)),
      bloom AS (SELECT DISTINCT pos FROM pos WHERE doc_id < 10),
      hits AS (
        SELECT p.doc_id, p.sh
        FROM pos p JOIN bloom b ON p.pos = b.pos
        WHERE p.doc_id >= 10
        GROUP BY p.doc_id, p.sh HAVING COUNT(*) = 3),
      nb AS (SELECT doc_id, COUNT(*) AS n_bloom FROM hits
             GROUP BY doc_id HAVING COUNT(*) >= 20),
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 10),
      ex AS (SELECT s.doc_id, COUNT(*) AS n_shared
             FROM sh s JOIN bench b ON s.sh = b.sh
             WHERE s.doc_id >= 10 GROUP BY 1)
      SELECT nb.doc_id, nb.n_bloom,
             COALESCE(ex.n_shared, 0) AS n_shared,
             nb.n_bloom >= COALESCE(ex.n_shared, 0) AS no_false_negative
      FROM nb LEFT JOIN ex ON nb.doc_id = ex.doc_id
      ORDER BY nb.doc_id"""))

  /** Shared chunk frame (doc_id, ws, chunk_idx, start): 50-word
    * windows on a 40-word stride — ONE definition so [[qPrepChunk]]
    * and [[qPrepShard]] can never desynchronize on the chunk
    * geometry. */
  private def chunkFrame(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        posexplode(sequence(lit(1), greatest(size(col("ws")), lit(1)),
          lit(40))))
      .withColumnsRenamed(Map("pos" -> "chunk_idx", "col" -> "start"))

  /** Whitespace-token count of the chunk at `start` (shared). */
  private def chunkTokens: org.apache.spark.sql.Column =
    least(lit(50), size(col("ws")) - col("start") + 1).cast("long")

  /** Overlapping word-window chunking: each document splits into
    * 50-word chunks on a 40-word stride (10-word overlap) — the
    * context-window sharding step between cleaning and tokenization.
    * `posexplode(sequence(...))` keeps it one narrow generator stage:
    * no shuffle, chunk count rides with document length, and the
    * (doc_id, chunk_idx) identity is stable for downstream joins.
    * The final ORDER BY is oracle-mandated. */
  val qPrepChunk = Q(
    "q_prep_chunk",
    (s, dir) =>
      chunkFrame(docs(s, dir))
        .select(col("doc_id"), col("chunk_idx").cast("long"),
          concat_ws(" ", slice(col("ws"), col("start"), lit(50)))
            .as("chunk_text"),
          chunkTokens.as("n_words"))
        .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
      c AS (SELECT doc_id, ws,
                   unnest(generate_series(1, greatest(len(ws), 1), 40))
                     AS start
            FROM w)
      SELECT doc_id,
             CAST((start - 1) // 40 AS BIGINT) AS chunk_idx,
             array_to_string(list_slice(ws, start,
               least(start + 49, len(ws))), ' ') AS chunk_text,
             CAST(least(50, len(ws) - start + 1) AS BIGINT) AS n_words
      FROM c ORDER BY doc_id, chunk_idx"""))

  /** Token-budget sharding — the step between [[qPrepChunk]] and
    * training: pack chunks into shards of ~2000 whitespace tokens with
    * a deterministic shard id, so any engine (or rerun) produces the
    * identical shard layout.
    *
    * Two-level id: `bucket` (first hex nibble of md5(doc_id), 16
    * writer buckets) then `shard_id` = exclusive-prefix-sum of token
    * counts within the bucket, ordered by (doc_id, chunk_idx), integer-
    * divided by the budget. A chunk whose prefix crosses a boundary
    * starts the next shard's fill, so shards are budget-sized ±1 chunk.
    *
    * Scale shape: the only shuffle is the per-bucket window, whose
    * partition count is the bucket fan-out — 16 here so the DuckDB
    * oracle stays a literal mirror; a 100 TB run raises the nibble
    * count so buckets ≥ cluster parallelism and each window partition
    * stays executor-sized (the doc→bucket hash keeps assignment
    * deterministic at any fan-out). */
  val qPrepShard = Q(
    "q_prep_shard",
    (s, dir) => {
      val chunks = chunkFrame(docs(s, dir))
        .select(col("doc_id"), col("chunk_idx").cast("long"),
          chunkTokens.as("n_tokens"))
      val bucketed = chunks.withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
          .cast("long"))
      val w = Window.partitionBy(col("bucket"))
        .orderBy(col("doc_id"), col("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, -1)
      bucketed
        .withColumn("prefix_tokens",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        // DIV, not /: long division must stay exact in both engines
        .withColumn("shard_id", expr("prefix_tokens DIV 2000"))
        .select(col("doc_id"), col("chunk_idx"), col("bucket"),
          col("shard_id"), col("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
      c AS (SELECT doc_id, ws,
                   unnest(generate_series(1, greatest(len(ws), 1), 40))
                     AS start
            FROM w),
      ch AS (SELECT doc_id,
                    CAST((start - 1) // 40 AS BIGINT) AS chunk_idx,
                    CAST(least(50, len(ws) - start + 1) AS BIGINT)
                      AS n_tokens,
                    CAST(instr('0123456789abcdef',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                         AS BIGINT) AS bucket
             FROM c)
      SELECT doc_id, chunk_idx, bucket,
             -- CAST: DuckDB widens SUM(BIGINT) OVER to HUGEINT and //
             -- preserves it; uncast it reaches pandas as float64 and
             -- hash-mismatches Spark's BIGINT on identical values.
             CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY bucket ORDER BY doc_id, chunk_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // 2000 AS BIGINT) AS shard_id,
             n_tokens
      FROM ch ORDER BY doc_id, chunk_idx"""))

  /** Deterministic stratified sampling: keep ~20% of documents per
    * language stratum, chosen by md5 bucket — the downsampling step a
    * data-mixture pipeline runs per source/language/quality stratum.
    * Hash-based (never `rand()`/`sample()`): the kept set is stable
    * under reruns, engine changes, and corpus growth (a doc's fate
    * depends only on its id), which is what makes mixtures
    * reproducible and ablations comparable. Uses md5(doc_id || '#s')
    * — a salt distinct from [[qPrepSplit]]'s bucket so sampling is
    * independent of split assignment. One narrow stage + the
    * oracle-mandated ORDER BY; the per-stratum rate is a literal here
    * but in production comes from a broadcast rate table joined on the
    * stratum key. */
  val qPrepSample = Q(
    "q_prep_sample",
    (s, dir) =>
      docs(s, dir)
        .withColumn("bucket",
          conv(substring(md5(concat(col("doc_id").cast("string"),
            lit("#s"))), 1, 2), 16, 10).cast("long"))
        .filter(col("bucket") < 51) // 51/256 ≈ 20%
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, lang, bucket FROM (
        SELECT doc_id, lang,
               CAST((instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || '#s'), 1, 1)) - 1)
                    * 16
                  + instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || '#s'), 2, 1)) - 1
                    AS BIGINT) AS bucket
        FROM documents)
      WHERE bucket < 51 ORDER BY doc_id"""))

  /** Data-mixture assembly — the step [[qPrepSample]]'s scaladoc
    * promises ("the per-stratum rate in production comes from a
    * broadcast rate table joined on the stratum key"), made real: a
    * per-language target rate table (the mixture spec a pretraining
    * run fixes up front — here: keep all English, downsample the rest
    * hard) broadcast-joins onto the corpus, and each document's fate
    * is the deterministic md5 bucket against ITS stratum's rate.
    * Salt '#m' keeps mixture draws independent of both the split
    * ('') and sampling ('#s') hashes.
    *
    * Scale shape: the rate table is tiny by definition (one row per
    * stratum) → broadcast; the corpus pass stays narrow; reruns and
    * corpus growth never reshuffle the kept set (a doc's fate depends
    * only on its id and its stratum's rate). Inner join = unknown
    * strata are dropped, the conservative mixture default. */
  val qPrepMixture = Q(
    "q_prep_mixture",
    (s, dir) => {
      import s.implicits._
      val rates = Seq(
        ("en", 256L), ("de", 96L), ("es", 96L), ("fr", 64L), ("zh", 48L))
        .toDF("lang", "rate")
      docs(s, dir)
        .withColumn("bucket",
          conv(substring(md5(concat(col("doc_id").cast("string"),
            lit("#m"))), 1, 2), 16, 10).cast("long"))
        .join(broadcast(rates), "lang")
        .filter(col("bucket") < col("rate"))
        .select(col("doc_id"), col("lang"), col("bucket"), col("rate"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH rates(lang, rate) AS (
        VALUES ('en', 256), ('de', 96), ('es', 96), ('fr', 64), ('zh', 48)),
      b AS (
        SELECT doc_id, lang,
               CAST((instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || '#m'), 1, 1)) - 1)
                    * 16
                  + instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || '#m'), 2, 1)) - 1
                    AS BIGINT) AS bucket
        FROM documents)
      SELECT b.doc_id, b.lang, b.bucket, CAST(r.rate AS BIGINT) AS rate
      FROM b JOIN rates r USING (lang)
      WHERE b.bucket < r.rate
      ORDER BY b.doc_id"""))

  /** Token-id encoding — the last prep step before training shards:
    * map every token position to its id in the corpus top-100
    * frequency vocabulary (count DESC, token ASC; OOV → 0). Output is
    * one (doc_id, pos, token_id) row per token, the long-form of the
    * id arrays a shard writer packs.
    *
    * Scale shape: the top-K selection runs as `orderBy(count).limit(K)`
    * — Catalyst plans TakeOrderedAndProject, which keeps at most K rows
    * in EVERY task and on the driver, so the full distinct vocabulary
    * (10⁸–10⁹ tokens at 100 TB) is never materialized anywhere. Only
    * the already-bounded K-row result is then collected into one row
    * for in-row id ranking (`sort_array` → `posexplode` — a 100-element
    * array, not a partition-less window, which PlanAuditSpec forbids
    * corpus-wide; its unbounded-single-row-collect guard pins this
    * boundedness). The encode join broadcasts the id table over one
    * narrow pass of the token stream. The frequency aggregation is the
    * same map-side-combining vocabulary shuffle
    * [[TextQueries.qTextVocab]] runs. */
  val qPrepTokenize = Q(
    "q_prep_tokenize",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "w")
      val top = toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(100)
      val vocabArr = top.agg(sort_array(collect_list(
        struct((-col("n")).as("negn"), col("w")))).as("vs"))
      val ids = vocabArr.select(posexplode(col("vs")))
        .select((col("pos") + 1).cast("long").as("token_id"),
          col("col.w").as("w"))
      toks.join(broadcast(ids), Seq("w"), "left")
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          coalesce(col("token_id"), lit(0L)).as("token_id"))
        .orderBy(col("doc_id"), col("pos"))
    },
    Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
      toks AS (
        SELECT doc_id, i - 1 AS pos, ws[i] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
              FROM w)),
      vc AS (SELECT w, COUNT(*) AS n FROM toks GROUP BY w),
      ids AS (
        SELECT w, token_id FROM (
          SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS token_id
          FROM vc)
        WHERE token_id <= 100)
      SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
             COALESCE(i.token_id, 0) AS token_id
      FROM toks t LEFT JOIN ids i USING (w)
      ORDER BY doc_id, pos"""))

  /** Sequence packing — the concat-and-chunk step that turns a corpus
    * into fixed-length training blocks (GPT-style: order documents
    * deterministically, concatenate their token streams with one
    * separator token between docs, cut the stream into 2048-token
    * blocks). Output: the (block_id, doc_id, tok_start, tok_end)
    * manifest mapping each block to the doc token ranges it contains —
    * what a training-shard writer materializes.
    *
    * The scale problem is the GLOBAL prefix sum (every doc's stream
    * offset): a global window is one partition sorting the corpus.
    * Decomposed instead as the classic two-level scan: docs bucket by
    * their md5's first two hex digits (256 ordered groups CONSISTENT
    * with the global md5 order, the q_prep_split trick), the cumsum
    * runs per-bucket inside a partitioned window, and the 256 bucket
    * totals prefix-sum through a bounded self-join and broadcast back.
    * Identical arithmetic to the single global window — the DuckDB
    * oracle computes exactly that global cumsum, so the hash-match
    * PROVES the decomposition exact — but every stage is partitioned:
    * nothing sorts more than one bucket, and the only driver-scale
    * state is 256 rows. Block assignment is then a narrow
    * sequence-explode: doc tokens [g, g+n) touch blocks
    * g/2048 .. (g+n-1)/2048. */
  val qPrepPack = Q(
    "q_prep_pack",
    (s, dir) => {
      val B = 2048
      val d = docs(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          md5(col("doc_id").cast("string")).as("mh"))
        .withColumn("bucket",
          conv(substring(col("mh"), 1, 2), 16, 10).cast("long"))
      val wB = Window.partitionBy(col("bucket"))
        .orderBy(col("mh"), col("doc_id"))
      val inBucket = d
        .withColumn("local_end", sum(col("n_tok") + 1).over(wB))
      // totals as a map-side-combined aggregation of `d`, NOT as
      // max(local_end) over the window output: ReuseExchange already
      // shares the one bucket exchange between this branch and the
      // window (verified in the committed plan — 6 scans/18 exchanges
      // under either formulation), and the partial-agg path skips the
      // window sort on the broadcast side (the max-over-window A/B
      // read +0.15 s at sf0.1 — r13 examined, kept)
      val totals = d.groupBy(col("bucket"))
        .agg(sum(col("n_tok") + 1).as("btot"))
      // prefix over earlier buckets: 256 rows by construction — the
      // one deliberately-bounded theta join in this plan
      val prefix = totals.as("a")
        .join(totals.as("b"), col("b.bucket") < col("a.bucket"), "left")
        .groupBy(col("a.bucket").as("bucket"))
        .agg(coalesce(sum(col("b.btot")), lit(0L)).as("bprefix"))
      val offs = inBucket.join(broadcast(prefix), "bucket")
        .select(col("doc_id"), col("n_tok"),
          (col("bprefix") + col("local_end") - col("n_tok") - 1).as("g"))
      offs
        .withColumn("blk", explode(expr(
          s"sequence(g div $B, (g + n_tok - 1) div $B)")))
        .select(col("blk").as("block_id"), col("doc_id"),
          (greatest(col("g"), col("blk") * B) - col("g")).as("tok_start"),
          (least(col("g") + col("n_tok"), (col("blk") + 1) * B) - col("g"))
            .as("tok_end"))
        .orderBy(col("block_id"), col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS mh
        FROM documents),
      o AS (
        SELECT doc_id, n_tok,
               CAST(SUM(n_tok + 1) OVER (ORDER BY mh, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tok - 1 AS BIGINT) AS g
        FROM d),
      b AS (
        SELECT doc_id, g, n_tok,
               unnest([bb for bb in
                       generate_series(g // 2048, (g + n_tok - 1) // 2048)])
                 AS blk
        FROM o)
      SELECT blk AS block_id, doc_id,
             GREATEST(g, blk * 2048) - g AS tok_start,
             LEAST(g + n_tok, (blk + 1) * 2048) - g AS tok_end
      FROM b ORDER BY block_id, doc_id"""))

  /** Curriculum banding: assign every document to one of 10
    * difficulty bands by token count (short-to-long is the classic
    * length-based curriculum schedule) and emit the per-band profile
    * a training loop consumes to order its epochs.
    *
    * The scale decision: bands are EQUI-WIDTH over the observed
    * [min, max] token range — `1 + (n − lo)·10 DIV (hi − lo + 1)` off
    * a one-row broadcast extrema aggregate — NOT `ntile(10)`, because
    * ntile is a partition-less global-sort window that serializes the
    * corpus through one task at 100 TB. Equi-width banding is one
    * narrow projection plus a 10-key aggregate, all integer-exact in
    * any engine (ntile's equi-DEPTH split is the documented trade:
    * balanced band sizes in exchange for a global sort; the mixture
    * sampler downstream re-weights bands anyway, so width wins). */
  val qPrepCurriculum = Q(
    "q_prep_curriculum",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      val ext = toks.agg(min(col("n_tokens")).as("lo"),
        max(col("n_tokens")).as("hi"))
      toks.crossJoin(broadcast(ext))
        .select(col("doc_id"), col("n_tokens"),
          expr("CAST(1 + (n_tokens - lo) * 10 DIV (hi - lo + 1) AS BIGINT)")
            .as("band"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tok_sum"),
          min(col("n_tokens")).cast("long").as("min_tokens"),
          max(col("n_tokens")).cast("long").as("max_tokens"))
        .select(col("band"), col("n_docs"),
          expr("CAST(tok_sum * 1000000 DIV n_docs AS BIGINT)")
            .as("mean_tokens_micro"),
          col("min_tokens"), col("max_tokens"))
        .orderBy(col("band"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents),
      ext AS (
        SELECT MIN(n_tokens) AS lo, MAX(n_tokens) AS hi FROM toks),
      banded AS (
        SELECT doc_id, n_tokens,
               CAST(1 + (n_tokens - lo) * 10 // (hi - lo + 1) AS BIGINT)
                 AS band
        FROM toks CROSS JOIN ext)
      SELECT band, COUNT(*) AS n_docs,
             CAST(CAST(SUM(n_tokens) AS BIGINT) * 1000000 // COUNT(*)
               AS BIGINT) AS mean_tokens_micro,
             CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
             CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
      FROM banded GROUP BY band ORDER BY band"""))

  /** Per-source winsorization of document length: clip `n_chars` to
    * that source's exact interpolated [p05, p95] and report the
    * clipped-tail counts plus the winsorized mean — the robust-
    * statistics step before length features feed a quality model
    * (a handful of megadocs otherwise dominate a source's mean).
    *
    * Scale shape: one source-keyed aggregate computes both exact
    * quantiles (at 100 TB this swaps for the GK sketch exactly as
    * q_stats_datacard documents); the tiny per-source bound table
    * broadcasts back onto the corpus scan, so the clip pass is
    * narrow. The winsorized mean accumulates in DECIMAL (parity
    * rule) over already-clipped BIGINTs. */
  val qPrepWinsorize = Q(
    "q_prep_winsorize",
    (s, dir) => {
      val d = docs(s, dir).select(col("source"), col("n_chars"))
      val bounds = d.groupBy(col("source")).agg(
        expr("percentile(n_chars, 0.05D)").as("p05"),
        expr("percentile(n_chars, 0.95D)").as("p95"))
      d.join(broadcast(bounds), "source")
        .select(col("source"), col("p05"), col("p95"),
          col("n_chars"),
          when(col("n_chars") < col("p05"), 1L).otherwise(0L).as("lo"),
          when(col("n_chars") > col("p95"), 1L).otherwise(0L).as("hi"),
          greatest(least(col("n_chars").cast("double"), col("p95")),
            col("p05")).as("w"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(min(col("p05")), 6).as("p05"),
          round(min(col("p95")), 6).as("p95"),
          sum(col("lo")).as("n_clipped_low"),
          sum(col("hi")).as("n_clipped_high"),
          round(sum(col("w").cast(DecimalType(25, 6))).cast("double") /
            count(lit(1)), 6).as("winsorized_mean"))
        .orderBy(col("source"))
    },
    Some("""
      WITH bounds AS (
        SELECT source, quantile_cont(n_chars, 0.05) AS p05,
               quantile_cont(n_chars, 0.95) AS p95
        FROM documents GROUP BY source),
      clipped AS (
        SELECT d.source, b.p05, b.p95,
               CASE WHEN n_chars < b.p05 THEN 1 ELSE 0 END AS lo,
               CASE WHEN n_chars > b.p95 THEN 1 ELSE 0 END AS hi,
               GREATEST(LEAST(CAST(n_chars AS DOUBLE), b.p95), b.p05) AS w
        FROM documents d JOIN bounds b ON d.source = b.source)
      SELECT source, COUNT(*) AS n_docs,
             ROUND(MIN(p05), 6) AS p05, ROUND(MIN(p95), 6) AS p95,
             CAST(SUM(lo) AS BIGINT) AS n_clipped_low,
             CAST(SUM(hi) AS BIGINT) AS n_clipped_high,
             ROUND(CAST(SUM(CAST(w AS DECIMAL(25,6))) AS DOUBLE)
                   / COUNT(*), 6) AS winsorized_mean
      FROM clipped GROUP BY source ORDER BY source"""))

  /** Deterministic class-balancing oversampling: each source stratum
    * replicates whole-copy `floor(max_stratum / n_s)` times toward the
    * largest stratum's size — the epoch-weighting / minority-class
    * balancing step a training mix applies when downsampling the
    * majority (q_prep_mixture's direction) would discard scarce data.
    * Whole copies keep the operator exactly reproducible (no
    * fractional remainder lottery); the verified output is the
    * per-stratum contract: factor, exact post-balance count (COUNTED
    * from the exploded rows, proving the replication really ran), and
    * the residual imbalance bound n_after > max_n − n_docs.
    *
    * Scale shape: the per-source factor table is a tiny broadcast
    * joined onto the corpus scan; replication is a narrow
    * explode(sequence(1, factor)) — no shuffle of the corpus; the
    * summary re-aggregates on the small source key. */
  val qPrepOversample = Q(
    "q_prep_oversample",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"))
      val sizes = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val mx = sizes.agg(max(col("n_docs")).as("max_n"))
      val factors = sizes.crossJoin(broadcast(mx))
        .select(col("source"), col("n_docs"),
          expr("max_n div n_docs").as("factor"), col("max_n"))
      d.join(broadcast(factors), "source")
        .select(col("source"), col("n_docs"), col("factor"), col("max_n"),
          explode(expr("sequence(1L, factor)")).as("copy_idx"))
        .groupBy(col("source"), col("n_docs"), col("factor"), col("max_n"))
        .agg(count(lit(1)).as("n_after"))
        .select(col("source"), col("n_docs"), col("factor"),
          col("n_after"),
          (col("n_after") > col("max_n") - col("n_docs")).as("within_bound"))
        .orderBy(col("source"))
    },
    Some("""
      WITH d AS (SELECT doc_id, source FROM documents),
      sizes AS (SELECT source, COUNT(*) AS n_docs FROM d GROUP BY source),
      mx AS (SELECT MAX(n_docs) AS max_n FROM sizes),
      factors AS (
        SELECT source, n_docs, max_n // n_docs AS factor, max_n
        FROM sizes CROSS JOIN mx),
      exploded AS (
        SELECT source, n_docs, factor, max_n,
               unnest(generate_series(1, factor)) AS copy_idx
        FROM (SELECT f.source, f.n_docs, f.factor, f.max_n
              FROM d JOIN factors f USING (source)) x)
      SELECT source, n_docs, factor, COUNT(*) AS n_after,
             COUNT(*) > max_n - n_docs AS within_bound
      FROM exploded GROUP BY source, n_docs, factor, max_n
      ORDER BY source"""))

  /** Distributed linear text-classifier INFERENCE — the model-based
    * quality-filter stage (the fastText-head / logistic-regression
    * shape every production corpus filter runs after the heuristic
    * passes): logit(doc) = bias + Σ_token count(doc, t)·w(t) against
    * a trained bag-of-words weight vector, keep = logit ≥ 0. Weights
    * live in MICRO-UNITS so the whole score is exact BIGINT
    * arithmetic — inference is bit-reproducible in any engine and the
    * gate hash-matches decisions, not just scores (the q_sim_kmeans
    * integer discipline applied to model scoring; a real deployment
    * swaps in its trained weights, same plan).
    *
    * Scale shape: the weight vector is a broadcast dim (vocabulary-
    * bounded — fastText heads are ≤ a few million rows, far under any
    * corpus), so scoring is ONE corpus token pass + a map-side-
    * combined doc-keyed aggregation; unscored docs re-enter via a
    * doc-keyed left join and carry the bias alone. Nothing shuffles
    * text. */
  val qPrepClassifier = Q(
    "q_prep_classifier",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      val weights = Seq(
        ("data", 250000L), ("spark", 300000L), ("query", 200000L),
        ("join", 150000L), ("merge", 120000L), ("window", 90000L),
        ("slow", -400000L), ("the", -180000L), ("a", -150000L),
        ("row", -60000L)).toDF("w", "w_micro")
      val bias = -800000L
      val counts = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
      val dots = counts.join(broadcast(weights), "w")
        .groupBy(col("doc_id"))
        .agg(sum(col("n") * col("w_micro")).as("dot"))
      docs(s, dir).select(col("doc_id"))
        .join(dots, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (coalesce(col("dot"), lit(0L)) + lit(bias)).as("logit_micro"))
        .withColumn("keep", col("logit_micro") >= 0L)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH wt AS (
        SELECT * FROM (VALUES
          ('data', 250000), ('spark', 300000), ('query', 200000),
          ('join', 150000), ('merge', 120000), ('window', 90000),
          ('slow', -400000), ('the', -180000), ('a', -150000),
          ('row', -60000)) t(w, w_micro)),
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents),
      counts AS (
        SELECT doc_id, w, COUNT(*) AS n FROM toks GROUP BY 1, 2),
      dots AS (
        SELECT c.doc_id, CAST(SUM(c.n * wt.w_micro) AS BIGINT) AS dot
        FROM counts c JOIN wt USING (w) GROUP BY 1)
      SELECT d.doc_id,
             COALESCE(dot, 0) - 800000 AS logit_micro,
             COALESCE(dot, 0) - 800000 >= 0 AS keep
      FROM documents d LEFT JOIN dots USING (doc_id)
      ORDER BY doc_id"""))

  /** Perplexity filtering with a per-source retention report — the
    * LM-based quality cut (the "drop the worst-perplexity tail"
    * stage) plus the audit table a pipeline owner actually reads:
    * per source, how many documents survive the cut, their mean NLL,
    * and the retention rate. The per-document score is the
    * [[TextQueries.qTextLogprob]] unigram mean-NLL op tree VERBATIM
    * (per-token NLL rounded to a 6dp DECIMAL once — absorbing libm ln
    * last-ulp differences — exact decimal per-doc sums, the mean in
    * exact integer MICRO-units), so the threshold comparison and the
    * kept-mean report are pure BIGINT arithmetic both engines compute
    * bit-identically (round-9 hardening: the former ROUND-of-a-double
    * mean could tie at the 6th decimal, where engine rounding
    * diverges).
    *
    * Scale shape: the LM build and scoring are the logprob query's
    * one corpus exchange + broadcast vocabulary; everything after the
    * per-doc score lives on |docs| narrow rows and the report is
    * |sources| rows. The 3.402 cut sits at the fixture's median —
    * a real pipeline derives it from the GK quantile sketch
    * (q_quantile_sketch's operator) on a held-out sample. */
  val qPrepPerplexity = Q(
    "q_prep_perplexity",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val perDoc = toks.groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("n"))
      val vocab = perDoc.groupBy(col("w")).agg(sum(col("n")).as("n_w"))
      val total = vocab.agg(sum(col("n_w")).cast("long").as("n_total"))
      val lm = vocab.crossJoin(broadcast(total))
        .select(col("w"),
          round(-log(col("n_w") * lit(1.0) / col("n_total")), 6)
            .cast("decimal(25,6)").as("nll"))
      val scored = perDoc.join(broadcast(lm), "w")
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).cast("long").as("nt"),
          (sum(col("nll") * col("n").cast("decimal(12,0)")) * lit(1000000))
            .cast("long").as("sm"))
        .select(col("doc_id"),
          expr("CAST(sm DIV nt AS BIGINT)").as("mean_nll_micro"))
      scored
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .withColumn("kept", col("mean_nll_micro") <= 3402000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("mean_nll_micro"))).as("kept_sum"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          expr("CAST(kept_sum DIV nullif(n_kept, 0) AS BIGINT)")
            .as("kept_mean_nll_micro"),
          expr("CAST(n_kept * 1000000 DIV n_docs AS BIGINT)")
            .as("retention_micro"))
        .orderBy(col("source"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents),
      per_doc AS (
        SELECT doc_id, w, COUNT(*) AS n FROM toks GROUP BY doc_id, w),
      vocab AS (
        SELECT w, CAST(SUM(n) AS BIGINT) AS n_w FROM per_doc GROUP BY w),
      total AS (
        SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM vocab),
      lm AS (
        SELECT w, CAST(ROUND(-LN(n_w * 1.0 / n_total), 6)
                       AS DECIMAL(25,6)) AS nll
        FROM vocab, total),
      scored AS (
        SELECT d.doc_id,
               CAST(SUM(lm.nll * CAST(d.n AS DECIMAL(12,0))) * 1000000
                    AS BIGINT) // CAST(SUM(d.n) AS BIGINT)
                 AS mean_nll_micro
        FROM per_doc d JOIN lm USING (w) GROUP BY d.doc_id),
      tagged AS (
        SELECT s.doc_id, doc.source, s.mean_nll_micro,
               s.mean_nll_micro <= 3402000 AS kept
        FROM scored s JOIN documents doc USING (doc_id))
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             CAST(SUM(CASE WHEN kept THEN mean_nll_micro END) AS BIGINT)
               // NULLIF(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END)
                             AS BIGINT), 0) AS kept_mean_nll_micro,
             CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) * 1000000
                  // COUNT(*) AS BIGINT) AS retention_micro
      FROM tagged GROUP BY source ORDER BY source"""))

  /** Equal-FREQUENCY decile binning of document length — the
    * feature-bucketization step before a length feature feeds a
    * quality model, and the complement of [[qPrepCurriculum]]'s
    * equal-WIDTH bands (equal-width starves the tail buckets on a
    * skewed length distribution; equal-frequency guarantees every
    * bin trains on the same sample mass). Output: per-bin row count
    * and the exact [min, max] char boundaries — the bin-edge table a
    * feature store materializes.
    *
    * The global rank every row needs is the classic "needs one
    * partition-less window" trap (ROW_NUMBER() OVER (ORDER BY …) —
    * the oracle's formulation — serializes the corpus through one
    * task); the engine instead reuses the
    * [[graft.operators.OrderStatistics.countByRank]] pair-free core:
    * range-bucket on broadcast extrema, one bucket-keyed exchange,
    * per-partition sorted scan, broadcast prefix join — O(N log N)
    * fully parallel, the identical machinery already proven under
    * [[RelationalQueries.qJoinInterval]] and `q_stats_gini`. Rank ties
    * are impossible by construction: the ranked value is the composite
    * `n_chars · 2²¹ + doc_id` (doc_id unique, < 2²¹ at every fixture
    * SF), so the rank equals the oracle's ROW_NUMBER over
    * (n_chars, doc_id) exactly and bin assignment is deterministic in
    * both engines. */
  val qPrepBinning = Q(
    "q_prep_binning",
    (s, dir) => {
      // Bound guard (the q_stats_gini pattern): the composite rank key
      // is order-isomorphic to (n_chars, doc_id) only while
      // doc_id < 2^21 — beyond that composites collide across
      // different n_chars and bins shift SILENTLY. Fail loudly
      // in-plan: assert_true evaluates per row inside codegen and
      // contributes exactly 0 in bounds.
      val guard = coalesce(expr(
        "assert_true(doc_id < 2097152, " +
          "'q_prep_binning: composite-rank bound exceeded " +
          "(need doc_id < 2^21; widen the shift)')").cast("long"),
        lit(0L))
      val d = docs(s, dir)
        .select(col("doc_id"), col("n_chars"),
          (col("n_chars") * lit(2097152L) + col("doc_id") + guard).as("v"))
      val n = d.agg(count(lit(1)).as("n"))
      val ranks = graft.operators.OrderStatistics.countByRank(
        d.select(col("v")),
        d.select(col("doc_id").as("user_id"),
          lit(0L).as("session_idx"), col("v").as("q")),
        inclusive = true)
        .select(col("user_id").as("doc_id"), col("cnt").as("rn"))
      d.join(ranks, "doc_id")
        .crossJoin(broadcast(n))
        .select(col("n_chars"),
          expr("CAST((rn - 1) * 10 DIV n AS BIGINT)").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("bin"))
    },
    Some("""
      WITH r AS (
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM documents)
      SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS bin,
             COUNT(*) AS n_docs,
             MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      FROM r GROUP BY bin ORDER BY bin"""))

  /** Fixed-size eval-set sampling: exactly k=20 documents per
    * language stratum, chosen as the BOTTOM-k by a salted document
    * hash — a uniform without-replacement sample whose membership is
    * a pure function of (doc_id, stratum), so reruns and engine
    * changes reproduce it exactly, and which composes distributively
    * (bottom-k of a union is the bottom-k of per-shard bottom-ks —
    * every shard forwards at most k candidate rows, the classic
    * bottom-k sketch; Spark plans the per-stratum rank as a
    * partitioned window after a stratum exchange, never a global
    * sort). Complements [[qPrepSample]]'s RATE-based thinning: a rate
    * can't promise "exactly 20 eval docs per language" — bottom-k
    * does, the contract an eval harness needs. Salt '#e' keeps the
    * draw independent of the split/sample/mixture hashes. */
  val qPrepEvalSample = Q(
    "q_prep_eval_sample",
    (s, dir) => {
      val h = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("#e"))), 1, 8), 16, 10).cast("long")
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("h"), col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("lang"), h.as("h"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 20)
        .select(col("lang"), col("rank"), col("doc_id"), col("h"))
        .orderBy(col("lang"), col("rank"))
    },
    Some("""
      WITH hashed AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#e'),
                     1, 8)) AS BIGINT) AS h
        FROM documents),
      ranked AS (
        SELECT lang, doc_id, h,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id)
                 AS rank
        FROM hashed)
      SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, h
      FROM ranked WHERE rank <= 20 ORDER BY lang, rank"""))

  /** The composition flagship: the END-TO-END LLM prep chain as ONE
    * gated query — raw corpus → quality gate (length band + language
    * targeting) → exact dedup (min-id per content hash) → benchmark
    * decontamination (≥20 shared distinct 3-gram shingles AND the
    * benchmark docs themselves removed — the [[qPrepDecontam]] rule,
    * via the SHARED [[shingleRows]] probe) → train-split selection
    * (the [[qPrepSplit]] rule via the shared [[splitBucket]]
    * expression) → sequence packing totals — emitting
    * the per-stage survival funnel (docs + tokens after each stage,
    * blocks + padded tokens at the end): the data-ablation card every
    * pipeline run publishes, and the proof the engine's stages
    * COMPOSE (each stage is the registered operator's exact rule, so
    * the chain hash-matching means the composition semantics, not
    * just each piece, are pinned cross-engine).
    *
    * Scale shape = the union of its stages' shapes, nothing new:
    * narrow filters, one content-hash aggregate (32-byte keys, never
    * text), one broadcast shingle probe, and six one-row aggregates
    * unioned — the corpus is scanned once into a persisted base
    * projection and each stage consumes its predecessor. (The
    * fixture corpus carries NEAR-duplicates only — its dedup stage
    * passes everything through, which the oracle confirms is the
    * correct answer, not a missed drop; swap the content-hash rule
    * for the minhash screen's verdicts to chain near-dup removal.) */
  val qPrepPipeline = Q(
    "q_prep_pipeline",
    (s, dir) => {
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val base = docs(s, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .persist(MEMORY_AND_DISK)
      val s1 = base.filter(col("n_chars").between(150, 5000) &&
        col("lang").isin("en", "de", "es", "fr"))
      val keep = s1.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val s2 = s1.join(keep, "doc_id").persist(MEMORY_AND_DISK)
      val benchSh = shingleRows(base.filter(col("doc_id") < 10))
        .select(col("sh")).distinct()
      val contaminated = shingleRows(s2).join(broadcast(benchSh), "sh")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 20).select(col("doc_id"))
      // bench docs themselves leave the funnel here unconditionally
      // (doc_id >= 10 — the registered decontam query's corpus-side
      // rule): eval data must never reach the training split, even a
      // bench doc too short to trip its own >= 20 shingle threshold
      val s3 = s2.filter(col("doc_id") >= 10)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .persist(MEMORY_AND_DISK)
      val s4 = s3.filter(splitBucket(col("doc_id")) < 204)
      def stageRow(stage: Int, name: String, d: DataFrame): DataFrame =
        d.agg(count(lit(1)).as("n_units"),
          coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
          .select(lit(stage.toLong).as("stage"), lit(name).as("stage_name"),
            col("n_units"), col("n_tokens"))
      // block count = the block ids qPrepPack actually EMITS: the last
      // real token sits at padded-2 (the final separator is padding,
      // never a slice), so blocks = (padded-2) DIV 2048 + 1 — the
      // naive ceil(padded/2048) over-counts by one when padded ≡ 1
      // (mod 2048), a block holding only the trailing separator
      val packed = s4.agg(
        coalesce(sum(col("n_tok") + 1), lit(0L)).as("padded"))
        .select(lit(5L).as("stage"), lit("packed").as("stage_name"),
          expr("""CAST(CASE WHEN padded = 0 THEN 0
                       ELSE (padded - 2) DIV 2048 + 1 END AS BIGINT)""")
            .as("n_units"),
          col("padded").as("n_tokens"))
      val result = stageRow(0, "raw", base)
        .unionByName(stageRow(1, "quality", s1))
        .unionByName(stageRow(2, "dedup", s2))
        .unionByName(stageRow(3, "decontam", s3))
        .unionByName(stageRow(4, "train_split", s4))
        .unionByName(packed)
        .orderBy(col("stage"))
      QueryScopedCache.releaseAfter(result, Seq(base, s2, s3))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, text, lang, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      s1 AS (
        SELECT * FROM base
        WHERE n_chars BETWEEN 150 AND 5000
          AND lang IN ('en', 'de', 'es', 'fr')),
      s2 AS (
        SELECT a.* FROM s1 a
        JOIN (SELECT md5(text) AS h, MIN(doc_id) AS doc_id
              FROM s1 GROUP BY 1) g USING (doc_id)),
      bsh AS (
        SELECT DISTINCT sh FROM (
          SELECT unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                         for i in generate_series(1, len(ws)-2)]) AS sh
          FROM (SELECT string_split(text, ' ') AS ws
                FROM base WHERE doc_id < 10))),
      csh AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id,
                 unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                         for i in generate_series(1, len(ws)-2)]) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM s2))),
      contaminated AS (
        SELECT c.doc_id FROM csh c JOIN bsh b ON c.sh = b.sh
        GROUP BY c.doc_id HAVING COUNT(*) >= 20),
      s3 AS (
        SELECT * FROM s2
        WHERE doc_id >= 10
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
      s4 AS (
        SELECT * FROM s3
        WHERE (instr('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 < 204)
      SELECT 0 AS stage, 'raw' AS stage_name, COUNT(*) AS n_units,
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS n_tokens FROM base
      UNION ALL
      SELECT 1, 'quality', COUNT(*),
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s1
      UNION ALL
      SELECT 2, 'dedup', COUNT(*),
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'decontam', COUNT(*),
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s3
      UNION ALL
      SELECT 4, 'train_split', COUNT(*),
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s4
      UNION ALL
      SELECT 5, 'packed',
             CAST(CASE WHEN COALESCE(SUM(n_tok + 1), 0) = 0 THEN 0
                  ELSE (COALESCE(SUM(n_tok + 1), 0) - 2) // 2048 + 1
                  END AS BIGINT),
             CAST(COALESCE(SUM(n_tok + 1), 0) AS BIGINT) FROM s4
      ORDER BY stage"""))

  /** Temperature-reweighted mixture targets (α = 0.5) — the standard
    * multilingual rebalancing rule: sampling weight q_s ∝ p_s^α
    * flattens the language distribution toward uniform without
    * discarding the head (α=1 keeps natural proportions, α=0 is
    * uniform). Emits per language its natural share, the reweighted
    * share, the resampled document budget, and the up/down-sampling
    * boost a sampler applies — the table the [[qPrepMixture]] rates
    * would be DERIVED from in a real pipeline.
    *
    * Exactness discipline: √p is one correctly-rounded IEEE op, but a
    * DOUBLE sum of the √p partials would be accumulation-ORDER
    * sensitive — so each √p is floored into integer nano-units first
    * and the normalizing sum runs over BIGINTs (order-free); every
    * share/budget after that is integer micro-unit division. Scale
    * shape: one count aggregate + two one-row broadcast scalars over
    * a |languages|-row frame. */
  val qPrepTemperature = Q(
    "q_prep_temperature",
    (s, dir) => {
      val counts = docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("nn"))
      val sp = counts.crossJoin(broadcast(tot))
        .select(col("lang"), col("n"), col("nn"),
          expr("""cast(floor(sqrt(cast(n as double) / cast(nn as double))
                  * 1000000000d) as bigint)""").as("sp"))
      val denom = sp.agg(sum(col("sp")).as("denom"))
      sp.crossJoin(broadcast(denom))
        .select(col("lang"), col("n"),
          expr("n * 1000000L div nn").as("share_micro"),
          expr("sp * 1000000L div denom").as("weight_micro"),
          col("nn"))
        .select(col("lang"), col("n"), col("share_micro"),
          col("weight_micro"),
          expr("weight_micro * nn div 1000000L").as("target_docs"),
          expr("weight_micro * nn div n").as("boost_micro"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
      sp AS (
        SELECT lang, n, nn,
               CAST(FLOOR(SQRT(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
                    * 1000000000) AS BIGINT) AS sp
        FROM c CROSS JOIN t),
      d AS (SELECT CAST(SUM(sp) AS BIGINT) AS denom FROM sp),
      w AS (
        SELECT lang, n, nn,
               n * 1000000 // nn AS share_micro,
               sp * 1000000 // denom AS weight_micro
        FROM sp CROSS JOIN d)
      SELECT lang, n, share_micro, weight_micro,
             weight_micro * nn // 1000000 AS target_docs,
             weight_micro * nn // n AS boost_micro
      FROM w ORDER BY lang"""))

  /** Classifier calibration / reliability table — the eval report a
    * model-based quality filter ([[qPrepClassifier]]) needs before
    * its threshold is trusted: documents bucketed into 10 equal-WIDTH
    * logit bins, each bin reporting its population, mean logit, and
    * the observed rate of a proxy ground-truth label (document length
    * above the corpus mean — the same "longer docs are higher
    * quality" prior the curriculum stage uses). A calibrated score ⇒
    * observed rate monotone across bins. ALL-integer algebra — bin
    * edges, bin ids, means, and rates are BIGINT division over
    * micro-unit logits, so no cell can drift cross-engine.
    *
    * Scale shape: the logit computation is the classifier query's
    * broadcast token-weight join; the binning is a 1-row min/max
    * broadcast + one group — no ranking window anywhere (the
    * equal-frequency dual would need a global rank; equal-width is
    * the shape that stays embarrassingly parallel at 100 TB). */
  val qPrepCalibration = Q(
    "q_prep_calibration",
    (s, dir) => {
      val logits = qPrepClassifier.run(s, dir)
        .select(col("doc_id"), col("logit_micro"))
      val len = docs(s, dir).select(col("doc_id"), col("n_chars"))
      val meanLen = len.agg(
        expr("sum(n_chars) div count(1)").as("mean_chars"))
      val labeled = logits.join(len, "doc_id")
        .crossJoin(broadcast(meanLen))
        .select(col("doc_id"), col("logit_micro"),
          when(col("n_chars") > col("mean_chars"), 1L).otherwise(0L)
            .as("label"))
      val rng = labeled.agg(min(col("logit_micro")).as("lo"),
        max(col("logit_micro")).as("hi"))
      labeled.crossJoin(broadcast(rng))
        .select(col("logit_micro"), col("label"),
          expr("""case when hi = lo then 0L
                  else least(9L, (logit_micro - lo) * 10L div (hi - lo))
                  end""").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          expr("sum(logit_micro) div count(1)").as("mean_logit_micro"),
          expr("sum(label) * 1000000L div count(1)").as("pos_rate_micro"))
        .orderBy(col("bin"))
    },
    Some("""
      WITH wt AS (
        SELECT * FROM (VALUES
          ('data', 250000), ('spark', 300000), ('query', 200000),
          ('join', 150000), ('merge', 120000), ('window', 90000),
          ('slow', -400000), ('the', -180000), ('a', -150000),
          ('row', -60000)) t(w, w_micro)),
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents),
      counts AS (
        SELECT doc_id, w, COUNT(*) AS n FROM toks GROUP BY 1, 2),
      dots AS (
        SELECT c.doc_id, CAST(SUM(c.n * wt.w_micro) AS BIGINT) AS dot
        FROM counts c JOIN wt USING (w) GROUP BY 1),
      logits AS (
        SELECT d.doc_id, COALESCE(dot, 0) - 800000 AS logit_micro
        FROM documents d LEFT JOIN dots USING (doc_id)),
      ml AS (
        SELECT CAST(SUM(n_chars) AS BIGINT) // COUNT(*) AS mean_chars
        FROM documents),
      labeled AS (
        SELECT l.doc_id, l.logit_micro,
               CASE WHEN d.n_chars > ml.mean_chars THEN 1 ELSE 0 END
                 AS label
        FROM logits l JOIN documents d USING (doc_id) CROSS JOIN ml),
      rng AS (
        SELECT MIN(logit_micro) AS lo, MAX(logit_micro) AS hi
        FROM labeled),
      binned AS (
        SELECT logit_micro, label,
               CASE WHEN hi = lo THEN 0
                    ELSE LEAST(9, (logit_micro - lo) * 10 // (hi - lo))
               END AS bin
        FROM labeled CROSS JOIN rng)
      SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
             CAST(SUM(logit_micro) AS BIGINT) // COUNT(*)
               AS mean_logit_micro,
             CAST(SUM(label) AS BIGINT) * 1000000 // COUNT(*)
               AS pos_rate_micro
      FROM binned GROUP BY bin ORDER BY bin"""))

  /** Length-bucketed batching report — the padding-waste audit behind
    * every fixed-shape training batcher: assign each document to the
    * smallest power-of-two length bucket that holds its token count,
    * then report per bucket the document count, the exact token mass,
    * the number of 32-sequence batches, and the fraction of padded
    * slots wasted. The complement of [[qPrepPack]]: packing
    * concatenates into a budget (zero padding, documents split),
    * bucketed batching pads to a shape (documents intact, waste the
    * price) — a pipeline picks per corpus, and this query prices the
    * second option. The bucket index is EXACT integer logic in both
    * engines (binary-digit count of n−1, never floating log2, whose
    * last-ulp behavior at exact powers of two is not contractual),
    * so the gate pins bucket boundaries bit-for-bit. Scale shape: one
    * narrow projection, one bucket-keyed aggregation — the shuffle
    * carries per-bucket partials only. */
  val qPrepPadding = Q(
    "q_prep_padding",
    (s, dir) => {
      val d = docs(s, dir)
        .select(size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .select(col("n_tokens"),
          // n = 1 belongs in bucket 1 (2⁰), which the digit-count form
          // misprices (bin(0) = '0' has length 1 → bucket 2)
          expr("""CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)
                  ELSE CAST(shiftleft(1L, length(bin(n_tokens - 1)))
                       AS BIGINT) END""")
            .as("bucket_len"))
      d.groupBy(col("bucket_len"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .select(col("bucket_len"), col("n_docs"), col("sum_tokens"),
          expr("CAST((n_docs + 31) DIV 32 AS BIGINT)").as("n_batches"),
          (col("n_docs") * col("bucket_len")).as("padded_slots"),
          round((col("n_docs") * col("bucket_len") - col("sum_tokens"))
            .cast("double") /
            (col("n_docs") * col("bucket_len")).cast("double"), 6)
            .as("waste_frac"))
        .orderBy(col("bucket_len"))
    },
    Some("""
      WITH d AS (
        SELECT n_tokens,
               CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)
                    ELSE CAST(1 << LENGTH(bin(n_tokens - 1)) AS BIGINT)
               END AS bucket_len
        FROM (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
                AS n_tokens
              FROM documents)),
      agg AS (
        SELECT bucket_len, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        FROM d GROUP BY bucket_len)
      SELECT bucket_len, n_docs, sum_tokens,
             (n_docs + 31) // 32 AS n_batches,
             n_docs * bucket_len AS padded_slots,
             ROUND(CAST(n_docs * bucket_len - sum_tokens AS DOUBLE) /
                   CAST(n_docs * bucket_len AS DOUBLE), 6) AS waste_frac
      FROM agg ORDER BY bucket_len"""))

  /** Differential-privacy release plumbing — per-key Laplace-noised
    * counts (ε = 1), the mechanism a data platform applies before
    * publishing aggregate statistics about a sensitive corpus. The
    * privacy math is standard inverse-CDF Laplace; what the engine
    * demonstrates is the DISTRIBUTED shape (noise is applied to the
    * bounded post-aggregation key table, never per row — the corpus
    * pays one exchange, the mechanism is free) and the parity
    * discipline: the "draw" is the deterministic md5 micro-uniform of
    * the key (replayable release, same recipe as the bootstrap's
    * Poisson draws), inverted through ln with the engine's round-6
    * micro-unit treatment and an explicit floor at the distribution
    * tail (the u→0 singularity clamps at 10⁻⁶, bounding |noise| at
    * ~13.8/ε — a truncated-Laplace release, stated rather than
    * hidden). A production release would swap the md5 seed for a
    * secret RNG; every other line is unchanged. */
  val qPrepDpCount = Q(
    "q_prep_dp_count",
    (s, dir) => {
      val counts = docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("true_count"))
      val u = pmod(graft.functions.TextFunctions.md5Bits(
        concat(lit("dp:"), col("source"))).getField("h"), lit(1000000L))
      val c = u - lit(500000L)
      // decimal route for the ×10⁶ lift: ROUND(,6)·1e6 in DOUBLE can
      // land a hair under the integer and Spark's cast truncates where
      // DuckDB's rounds — DECIMAL(25,6) makes the lift exact (the LM
      // queries' discipline)
      val mag = expr(
        """CAST(CAST(ROUND(-LN(GREATEST(
             1.0 - ABS(u - 500000) * 2.0 / 1000000,
             0.000001)), 6) AS DECIMAL(25,6)) * 1000000 AS BIGINT)""")
      counts.withColumn("u", u)
        .withColumn("noise_micro",
          when(c < 0, -lit(1L)).otherwise(lit(1L)) * mag)
        .select(col("source"), col("true_count"), col("noise_micro"),
          (col("true_count") * lit(1000000L) + col("noise_micro"))
            .as("noised_micro"),
          lit(1.0).as("epsilon"))
        .orderBy(col("source"))
    },
    Some("""
      WITH counts AS (
        SELECT source, COUNT(*) AS true_count
        FROM documents GROUP BY source),
      seeded AS (
        SELECT source, true_count,
               CAST(('0x' || substr(md5('dp:' || source), 1, 15))
                 AS BIGINT) % 1000000 AS u
        FROM counts),
      noised AS (
        SELECT source, true_count,
               (CASE WHEN u - 500000 < 0 THEN -1 ELSE 1 END) *
               CAST(CAST(ROUND(-LN(GREATEST(
                 1.0 - ABS(u - 500000) * 2.0 / 1000000, 0.000001)), 6)
                 AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS noise_micro
        FROM seeded)
      SELECT source, true_count, noise_micro,
             true_count * 1000000 + noise_micro AS noised_micro,
             CAST(1.0 AS DOUBLE) AS epsilon
      FROM noised ORDER BY source"""))

  /** Deterministic k-fold cross-validation layout (k = 5):
    * [[qPrepSplit]]'s content-free md5 bucket rule reduced mod k, so
    * fold membership is a pure function of the id — replayable on any
    * engine, stable under corpus growth (a new doc lands in one fold
    * without moving any other), and mergeable across shards. Output is
    * the CV audit a training loop consumes: per fold, the held-out
    * size and the complementary train-side size (totals minus the
    * fold — k-fold complements need no second scan).
    *
    * Scale shape: one map-side-combining aggregation to k rows; the
    * one-row totals scalar rides a broadcast cross join. */
  val qPrepKfold = Q(
    "q_prep_kfold",
    (s, dir) => {
      val per = docs(s, dir)
        .withColumn("fold", pmod(splitBucket(col("doc_id")), lit(5)))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("held_docs"),
          sum(col("n_chars")).as("held_chars"))
      val tot = per.agg(sum(col("held_docs")).as("td"),
        sum(col("held_chars")).as("tc"))
      per.crossJoin(broadcast(tot))
        .select(col("fold"), col("held_docs"), col("held_chars"),
          (col("td") - col("held_docs")).as("train_docs"),
          (col("tc") - col("held_chars")).as("train_chars"))
        .orderBy(col("fold"))
    },
    Some("""
      WITH f AS (
        SELECT ((instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                + instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 5
                 AS fold,
               n_chars
        FROM documents),
      per AS (
        SELECT fold, COUNT(*) AS held_docs,
               CAST(SUM(n_chars) AS BIGINT) AS held_chars
        FROM f GROUP BY fold),
      tot AS (
        SELECT CAST(SUM(held_docs) AS BIGINT) AS td,
               CAST(SUM(held_chars) AS BIGINT) AS tc
        FROM per)
      SELECT fold, held_docs, held_chars,
             td - held_docs AS train_docs, tc - held_chars AS train_chars
      FROM per CROSS JOIN tot ORDER BY fold"""))

  /** k-anonymity audit before data release — group every document
    * by its quasi-identifier tuple (lang, source, 100-char length
    * band: the attributes a release would expose and a linker could
    * join on) and profile the equivalence-class sizes: a class of
    * size 1 is a uniquely re-identifiable record, classes under k=5
    * fail the usual release bar. Output: one row per class-size band
    * (1 / 2-4 / 5-9 / 10+) with class and row counts, plus the
    * release verdict on every row — the minimum class size and the
    * fraction of rows living in sub-k classes.
    *
    * Everything is exact: class sizes are one QI-keyed count, bands
    * are integer CASE cuts, and the single rounded division is the
    * at-risk row fraction. Scale shape: one QI exchange (the QI
    * tuple is low-cardinality by construction — that is WHY it is a
    * re-identification risk), one bounded band rollup, one one-row
    * risk scalar riding a broadcast cross join. */
  val qPrepKanon = Q(
    "q_prep_kanon",
    (s, dir) => {
      val classes = docs(s, dir)
        .select(col("lang"), col("source"),
          expr("n_chars div 100").as("len_band"))
        .groupBy(col("lang"), col("source"), col("len_band"))
        .agg(count(lit(1)).as("c"))
      // no persist on banded: its two consumers (risk, the band
      // rollup) sit in ONE action over the identical QI-aggregation
      // subtree, which ReuseExchange computes once — the r12 rule
      // (persist pays only across actions or under structurally
      // different subtrees); the InMemoryRelation barrier was pure
      // overhead here (r13 A/B below)
      val banded = classes.select(col("c"),
        when(col("c") === 1, "1")
          .when(col("c") < 5, "2-4")
          .when(col("c") < 10, "5-9")
          .otherwise("10+").as("band"))
      val risk = banded.agg(
        min(col("c")).as("min_class_size"),
        sum(when(col("c") < 5, col("c")).otherwise(0L)).as("rows_sub_k"),
        sum(col("c")).as("n_rows"))
        .select(col("min_class_size"),
          round(col("rows_sub_k").cast("double") /
            col("n_rows").cast("double"), 6).as("sub_k_frac"))
      banded.groupBy(col("band"))
        .agg(count(lit(1)).as("n_classes"), sum(col("c")).as("n_rows"))
        .crossJoin(broadcast(risk))
        .orderBy(col("band"))
    },
    Some("""
      WITH classes AS (
        SELECT lang, source, n_chars // 100 AS len_band, COUNT(*) AS c
        FROM documents GROUP BY 1, 2, 3),
      banded AS (
        SELECT c, CASE WHEN c = 1 THEN '1'
                       WHEN c < 5 THEN '2-4'
                       WHEN c < 10 THEN '5-9'
                       ELSE '10+' END AS band
        FROM classes),
      risk AS (
        SELECT CAST(MIN(c) AS BIGINT) AS min_class_size,
               ROUND(CAST(SUM(CASE WHEN c < 5 THEN c ELSE 0 END)
                   AS DOUBLE) /
                 CAST(SUM(c) AS DOUBLE), 6) AS sub_k_frac
        FROM banded)
      SELECT b.band, COUNT(*) AS n_classes,
             CAST(SUM(b.c) AS BIGINT) AS n_rows,
             r.min_class_size, r.sub_k_frac
      FROM banded b CROSS JOIN risk r
      GROUP BY b.band, r.min_class_size, r.sub_k_frac
      ORDER BY b.band"""))

  /** Rendezvous (highest-random-weight) consistent sharding — assign
    * each document to the shard whose md5(doc:shard) weight is
    * highest, then remove shard 7 and reassign: HRW's defining
    * guarantee is MINIMAL MOVEMENT (only the removed shard's keys
    * move, everything else is pinned), which is why storage systems
    * shard this way instead of `mod n` (where removing one shard
    * reshuffles ~all keys). The invariant is not just probed — it is
    * IN the gate: `minimal_movement` is the machine-checked "no doc
    * moved whose before-shard survived", and `moved_frac` carries the
    * ~1/16 expected movement. Weights compare as md5 HEX STRINGS
    * (lowercase hex compares lexicographically = numerically —
    * identical in both engines, no radix conversion); ties break to
    * the smaller shard id via the (weight, 15−s) struct max.
    *
    * Scale shape: both assignments are in-row argmaxes over a 16-slot
    * literal sequence inside codegen — no join, no explode, no
    * shuffle until the ≤16-row shard rollup; the one-row movement
    * scalars ride broadcast cross joins. */
  val qPrepRendezvous = Q(
    "q_prep_rendezvous",
    (s, dir) => {
      def argmax(seq: String) = expr(
        s"""15 - array_max(transform($seq, sh -> struct(
              md5(concat(cast(doc_id as string), ':',
                         cast(sh as string))) as w,
              15 - sh as inv))).inv""")
      val assigned = Tables.spread(Tables(s, dir, "documents"))
        .select(col("doc_id"))
        .withColumn("shard_before", argmax("sequence(0, 15)").cast("long"))
        .withColumn("shard_after",
          argmax("filter(sequence(0, 15), sh -> sh != 7)").cast("long"))
        .withColumn("moved", col("shard_before") =!= col("shard_after"))
      val scalars = assigned.agg(
        sum(when(col("moved"), 1L).otherwise(0L)).as("n_moved_tot"),
        count(lit(1)).as("n_tot"),
        max(when(col("moved") && col("shard_before") =!= 7L, 1L)
          .otherwise(0L)).as("bad"))
        .select(
          round(col("n_moved_tot").cast("double") /
            col("n_tot").cast("double"), 6).as("moved_frac"),
          (col("bad") === 0L).as("minimal_movement"))
      assigned.groupBy(col("shard_before"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("moved"), 1L).otherwise(0L)).as("n_moved"))
        .crossJoin(broadcast(scalars))
        .select(col("shard_before"), col("n_docs"), col("n_moved"),
          col("moved_frac"), col("minimal_movement"))
        .orderBy(col("shard_before"))
    },
    Some("""
      WITH w AS (
        SELECT d.doc_id, t.s,
               md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                   CAST(t.s AS VARCHAR)) AS w
        FROM documents d CROSS JOIN generate_series(0, 15) AS t(s)),
      bef AS (
        SELECT doc_id, s AS shard_before FROM (
          SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY w DESC, s) AS rn FROM w) x WHERE rn = 1),
      aft AS (
        SELECT doc_id, s AS shard_after FROM (
          SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY w DESC, s) AS rn FROM w WHERE s <> 7) x
        WHERE rn = 1),
      a AS (
        SELECT b.doc_id, CAST(b.shard_before AS BIGINT) AS shard_before,
               b.shard_before <> f.shard_after AS moved
        FROM bef b JOIN aft f USING (doc_id)),
      scal AS (
        SELECT ROUND(CAST(SUM(CASE WHEN moved THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS moved_frac,
               CAST(MAX(CASE WHEN moved AND shard_before <> 7
                 THEN 1 ELSE 0 END) AS BIGINT) = 0 AS minimal_movement
        FROM a)
      SELECT g.shard_before, g.n_docs, g.n_moved,
             s.moved_frac, s.minimal_movement
      FROM (SELECT shard_before, COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN moved THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_moved
            FROM a GROUP BY shard_before) g
      CROSS JOIN scal s
      ORDER BY g.shard_before"""))

  /** Weighted sampling WITHOUT replacement (Ohlsson SEQUENTIAL
    * POISSON sampling) — draw a 100-document sample where each
    * document's inclusion odds are proportional to its length: every
    * document gets the priority key u/w (u a deterministic 32-bit
    * uniform from md5(doc_id∥'#ws'), w = n_chars), and the k
    * SMALLEST keys are a without-replacement probability-
    * proportional-to-size sample — the one-pass/distributed-friendly
    * identity that makes length-proportional corpus sampling
    * (sampling by token budget rather than by document count) a
    * top-k instead of k sequential draws. Unlike [[qPrepSample]]
    * (Bernoulli, per-document independent) and [[qPrepTemperature]]
    * (per-stratum rates), the sample size here is EXACT and
    * competition between documents is global. The key is the
    * INTEGER (u · 2²⁰) DIV w with doc_id as the tiebreak — u/w
    * quantized to 2⁻²⁰, a negligible perturbation of the uniform and
    * the reason NO transcendental touches the selection: the
    * round-9-advice predecessor ranked by ln(u)/w rounded to 6
    * decimals, where a 1-ulp JVM-vs-libm ln divergence at a rounding
    * boundary could flip which document makes the cut (the
    * [[RelationalQueries.qHllSetops]]/[[RelationalQueries.qStatsRuns]]
    * no-log-in-decisions discipline; Efraimidis–Spirakis A-Res needs
    * the log, sequential Poisson does not and shares its PPS
    * guarantees). u < 2³², so u·2²⁰ < 2⁵² — BIGINT-exact; the md5
    * path reuses the [[qPrepSample]] salt convention.
    *
    * Scale shape: the key is an in-row codegen expression over the
    * scan (no shuffle), and the global top-k is TakeOrdered —
    * per-partition heaps, one bounded driver merge, never a full
    * sort. At 100 TB this is the canonical "sample 1M docs
    * proportional to length" plan: one scan, one bounded reduce. */
  val qPrepWeightedSample = Q(
    "q_prep_weighted_sample",
    (s, dir) =>
      Tables.spread(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("priority",
          expr("(cast(conv(substring(md5(concat(cast(doc_id as string)," +
            " '#ws')), 1, 8), 16, 10) as bigint) * 1048576) DIV n_chars")
            .cast("long"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(100),
    Some("""
      SELECT doc_id, source, n_chars,
             CAST(CAST(('0x' ||
                 SUBSTR(md5(CAST(doc_id AS VARCHAR) || '#ws'), 1, 8))
                 AS BIGINT) * 1048576 // n_chars AS BIGINT) AS priority
      FROM documents
      ORDER BY priority, doc_id LIMIT 100"""))

  /** Integer quota apportionment (Hamilton / largest-remainder) — turn
    * a mixture's REAL-valued proportions into EXACT integer sample
    * quotas: split a fixed budget of 1,000,000 training-sample slots
    * across document sources proportional to each source's total
    * characters, with every quota an integer and the quotas summing to
    * the budget EXACTLY. Floor quotas (budget·w DIV W) under-allocate
    * by < n_sources slots; the leftover goes one slot each to the
    * sources with the LARGEST division remainders (source name breaks
    * ties), the classic apportionment rule. This is the planning step
    * [[qPrepMixture]] consumes: mixture keeps per-stratum RATES, this
    * emits the per-stratum integer COUNTS a sharded sampler needs to
    * hand each stratum before drawing ([[qPrepWeightedSample]] within
    * a stratum). All arithmetic is BIGINT-exact — no floating-point
    * proportion ever appears, so reruns are bit-stable cross-engine.
    *
    * Scale shape: the corpus pass is one groupBy(source) rollup (the
    * only shuffle, map-side combined to one row per source); sources
    * are bounded by definition (a mixture spec enumerates them), so
    * everything after the rollup is bounded-frame work: the budget·w
    * product rides an in-plan assert_true bound guard (w < 2^43 keeps
    * BIGINT exact; beyond that fail loudly, never silently — the
    * [[RelationalQueries.qStatsGini]] discipline), the one-row W and
    * leftover scalars ride broadcast cross joins, and remainder
    * ranking is a TakeOrdered + in-row posexplode, never a global
    * window. At 100 TB: one corpus scan, one bounded reduce. */
  /** The Hamilton largest-remainder apportionment core shared by
    * [[qPrepQuota]] (the planner query) and [[qPrepQuotaSample]] (the
    * sampler consuming a plan): per-source (w, floor_quota,
    * remainder, rk, quota) with Σquota = budget exactly. Bounded-
    * frame work after one rollup — see [[qPrepQuota]]'s scaladoc. */
  private[analytics] def apportion(s: SparkSession, dir: String,
      budget: Long): DataFrame = {
    val src = docs(s, dir)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("w"))
    val tot = src.agg(sum(col("w")).as("wtot"))
    val guard = coalesce(expr(
      "assert_true(w >= 0 and w < 8796093022208, " +
        "'q_prep_quota: source weight exceeds BIGINT-safe bound " +
        "(need 0 <= w < 2^43)')").cast("long"), lit(0L))
    val j = src.crossJoin(broadcast(tot))
      .select(col("source"), col("w"),
        (expr(s"CAST(($budget * w) DIV wtot AS BIGINT)") + guard)
          .as("floor_quota"),
        expr(s"($budget * w) % wtot").as("remainder"))
    val lt = j.agg((lit(budget) - sum(col("floor_quota")))
      .as("leftover"))
    j.orderBy(col("remainder").desc, col("source")).limit(4096)
      .agg(sort_array(collect_list(struct(
        (-col("remainder")).as("negrem"), col("source"),
        col("w"), col("floor_quota")))).as("ts"))
      .select(posexplode(col("ts")))
      .select((col("pos") + 1).cast("long").as("rk"),
        col("col.source").as("source"), col("col.w").as("w"),
        col("col.floor_quota").as("floor_quota"),
        (-col("col.negrem")).as("remainder"))
      .crossJoin(broadcast(lt))
      .select(col("source"), col("w"), col("floor_quota"),
        col("remainder"), col("rk"),
        (col("floor_quota") +
          when(col("rk") <= col("leftover"), lit(1L))
            .otherwise(lit(0L))).as("quota"))
  }

  val qPrepQuota = Q(
    "q_prep_quota",
    (s, dir) => apportion(s, dir, 1000000L).orderBy(col("source")),
    Some("""
      WITH w AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM w),
      j AS (
        SELECT source, w,
               CAST((1000000 * w) // wtot AS BIGINT) AS floor_quota,
               CAST((1000000 * w) % wtot AS BIGINT) AS remainder
        FROM w CROSS JOIN tot),
      lt AS (
        SELECT 1000000 - CAST(SUM(floor_quota) AS BIGINT) AS leftover
        FROM j),
      r AS (
        SELECT *, CAST(ROW_NUMBER()
                 OVER (ORDER BY remainder DESC, source) AS BIGINT) AS rk
        FROM j)
      SELECT source, w, floor_quota, remainder, rk,
             floor_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
               AS quota
      FROM r CROSS JOIN lt
      ORDER BY source"""))

  /** Quota-driven stratified sampler — the CONSUMER of
    * [[qPrepQuota]]'s plan, closing the loop: apportion a 200-slot
    * budget across sources by the same largest-remainder rule, then
    * draw EXACTLY quotaₛ documents from each source s — the top-quota
    * by a deterministic md5 priority (salt '#qs', independent of the
    * split/sample/mixture hashes), ranked within the source. The gate
    * composes planner + sampler end-to-end: the output is correct
    * only if the apportionment, the per-source ranking, and the
    * rank ≤ quota cut ALL agree cell-exactly cross-engine.
    *
    * Scale shape: the plan is bounded-frame work (see
    * [[qPrepQuota]]); the draw is one source-partitioned ranking
    * window over the corpus (one exchange) cut by a broadcast join
    * against the ≤ |sources|-row quota table — exactly how a sharded
    * sampler hands each stratum its integer allocation at 100 TB. */
  val qPrepQuotaSample = Q(
    "q_prep_quota_sample",
    (s, dir) => {
      val quotas = apportion(s, dir, 200L)
        .select(col("source"), col("quota"))
      // within-source ranks ride the distributed rank (a source-
      // partitioned row_number over raw documents is the round-9
      // audit's low-card funnel; the quota cut is a COLUMN, so
      // Catalyst's rank-limit pushdown cannot cap it — the rank
      // itself must be scale-safe); n_chars rejoins on the sampled
      // ≤budget rows only
      val rks = graft.operators.OrderStatistics.groupRowRanks(
          docs(s, dir).select(col("source").as("g"),
            conv(substring(md5(concat(col("doc_id").cast("string"),
              lit("#qs"))), 1, 12), 16, 10).cast("long").as("v"),
            col("doc_id").as("p")),
          minRank = false)
        .select(col("g").as("source"),
          col("p").cast("long").as("doc_id"), col("rk"))
      rks.join(broadcast(quotas), Seq("source"))
        .filter(col("rk") <= col("quota"))
        .join(docs(s, dir).select(col("doc_id"), col("n_chars")),
          Seq("doc_id"))
        .select(col("source"), col("rk"), col("quota"), col("doc_id"),
          col("n_chars"))
        .orderBy(col("source"), col("rk"))
    },
    Some("""
      WITH w AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM w),
      j AS (
        SELECT source, w,
               CAST((200 * w) // wtot AS BIGINT) AS floor_quota,
               CAST((200 * w) % wtot AS BIGINT) AS remainder
        FROM w CROSS JOIN tot),
      lt AS (
        SELECT 200 - CAST(SUM(floor_quota) AS BIGINT) AS leftover
        FROM j),
      r AS (
        SELECT *, CAST(ROW_NUMBER()
                 OVER (ORDER BY remainder DESC, source) AS BIGINT) AS rk
        FROM j),
      quotas AS (
        SELECT source,
               floor_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                 AS quota
        FROM r CROSS JOIN lt),
      ranked AS (
        SELECT doc_id, source, n_chars,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY CAST(('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)
                   || '#qs'), 1, 12)) AS BIGINT), doc_id)
                 AS BIGINT) AS rk
        FROM documents)
      SELECT d.source, d.rk, q.quota, d.doc_id, d.n_chars
      FROM ranked d JOIN quotas q USING (source)
      WHERE d.rk <= q.quota
      ORDER BY d.source, d.rk"""))

  /** Context-length planning curve — the table a pretraining run
    * reads before fixing max_seq_len: for each candidate context
    * length, how many documents get truncated, what fraction of the
    * corpus' tokens survives (Σ min(tokens, L) — truncation loss),
    * and how many packed contexts the corpus fills under contiguous
    * concatenation (⌈kept/L⌉). The grid {16, 32, 64, 128} matches the
    * fixture's whitespace-token scale (median ≈ 50 — a production
    * run passes 512…8192); tokens follow [[TextQueries.qTextTokens]]'
    * whitespace convention. All exact integers + one rounded
    * fraction: the decision between "longer contexts waste compute
    * on padding/attention" and "shorter contexts truncate documents"
    * becomes four auditable rows.
    *
    * Scale shape: one narrow corpus scan exploded ×4 (the candidate
    * grid rides in-row), one bounded 4-group rollup — nothing else. */
  val qPrepCtxCurve = Q(
    "q_prep_ctx_curve",
    (s, dir) =>
      docs(s, dir)
        .select(size(split(col("text"), " ")).cast("long").as("tok"))
        .select(col("tok"), explode(expr(
          "array(16L, 32L, 64L, 128L)")).as("ctx_len"))
        .groupBy(col("ctx_len"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("tok") > col("ctx_len"), 1L).otherwise(0L))
            .as("n_truncated"),
          sum(col("tok")).as("tokens_total"),
          sum(least(col("tok"), col("ctx_len"))).as("tokens_kept"))
        .select(col("ctx_len"), col("n_docs"), col("n_truncated"),
          col("tokens_total"), col("tokens_kept"),
          round(col("tokens_kept").cast("double") /
            col("tokens_total").cast("double"), 6).as("keep_frac"),
          expr("(tokens_kept + ctx_len - 1) DIV ctx_len")
            .as("contexts_needed"))
        .orderBy(col("ctx_len")),
    Some("""
      WITH toks AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        FROM documents),
      g AS (
        SELECT tok, CAST(ctx_len AS BIGINT) AS ctx_len
        FROM toks, (SELECT UNNEST([16, 32, 64, 128]) AS ctx_len))
      SELECT ctx_len, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN tok > ctx_len THEN 1 ELSE 0 END)
               AS BIGINT) AS n_truncated,
             CAST(SUM(tok) AS BIGINT) AS tokens_total,
             CAST(SUM(LEAST(tok, ctx_len)) AS BIGINT) AS tokens_kept,
             ROUND(CAST(SUM(LEAST(tok, ctx_len)) AS DOUBLE)
               / CAST(SUM(tok) AS DOUBLE), 6) AS keep_frac,
             (CAST(SUM(LEAST(tok, ctx_len)) AS BIGINT) + ctx_len - 1)
               // ctx_len AS contexts_needed
      FROM g GROUP BY ctx_len
      ORDER BY ctx_len"""))

  /** Epoch-seeded shuffle plan — multi-epoch training must visit the
    * corpus in a DIFFERENT order each epoch while staying bit-
    * reproducible on rerun: shard assignment is the first md5 byte of
    * (doc_id ∥ '#e' ∥ epoch) mod 8, so each epoch is an independent
    * deterministic permutation (epoch is IN the hash — rerunning
    * epoch 2 always yields epoch 2's layout, and no epoch leaks the
    * previous epoch's order, the failure mode of seed+offset
    * schemes). Gated per (epoch, shard) by count AND the doc-id sum —
    * the sum pins the exact assignment, not just the balance; the
    * probe additionally measures cross-epoch shard stickiness
    * (≈ 1/8 — epochs are actually independent).
    *
    * Scale shape: pure in-row hashing over one corpus scan exploded
    * ×3 epochs, one bounded (epoch, shard) rollup — re-sharding
    * never moves data until the trainer reads its shard. */
  val qPrepEpochShuffle = Q(
    "q_prep_epoch_shuffle",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          explode(expr("array(1L, 2L, 3L)")).as("epoch"))
        .select(col("epoch"), col("doc_id"),
          (conv(substring(md5(concat(col("doc_id").cast("string"),
            lit("#e"), col("epoch").cast("string"))), 1, 2), 16, 10)
            .cast("long") % 8).as("shard"))
        .groupBy(col("epoch"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"))
        .orderBy(col("epoch"), col("shard")),
    Some("""
      WITH a AS (
        SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
               CAST((instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || '#e' ||
                         CAST(epoch AS VARCHAR)), 1, 1)) - 1) * 16
                  + instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || '#e' ||
                         CAST(epoch AS VARCHAR)), 2, 1)) - 1
                 AS BIGINT) % 8 AS shard
        FROM documents, (SELECT UNNEST([1, 2, 3]) AS epoch))
      SELECT epoch, shard, COUNT(*) AS n_docs,
             CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
      FROM a GROUP BY epoch, shard
      ORDER BY epoch, shard"""))

  /** Deterministic source interleaving (stride scheduling) — the
    * data-loader ORDER for mixture training: each source emits its
    * k-th document at virtual time k/wₛ (wₛ = the source's share of
    * corpus characters), so merging all sources by virtual time
    * yields ONE stream in which every prefix carries each source in
    * proportion to its weight — no RNG, no epoch drift, the lottery/
    * stride scheduler from OS theory applied to data mixing. Virtual
    * time is exact integer micro-ticks: each source gets the
    * PRECOMPUTED stride 10⁶·W DIV wₛ (one bounded-frame division,
    * guarded by the apportion() assert_true bound W < 2⁴³ — the
    * round-9-advice predecessor computed k·10⁶·W per DOCUMENT, whose
    * factors overflow BIGINT around 10⁹ corpus chars × 10⁵ docs:
    * silent wrap on Spark vs error on DuckDB), and document k ticks
    * at k·stride ≤ 10⁶·W — inside BIGINT whenever the guard passes.
    * Ties break by source then rank; documents within a source are
    * ordered by the '#il' md5 (independent of every other hash
    * family). The gate pins the first 100 stream positions exactly;
    * the probe checks prefix proportionality.
    *
    * Scale shape: within-source ranks ride
    * [[graft.operators.OrderStatistics.groupRowRanks]] — the
    * range-partitioned distributed rank (one exchange spread over
    * ALL partitions; a source-partitioned row_number over raw
    * documents would funnel the corpus into |sources| reducers at
    * scale — the same weak class round 10 migrated the stats family
    * off) — then an in-row tick expression and a global top-100
    * TakeOrdered (per-partition heaps — the stream ORDER is
    * materialized lazily by consumers, never as a global sort). The
    * weight table is the bounded [[qPrepQuota]] rollup, broadcast. */
  val qPrepInterleave = Q(
    "q_prep_interleave",
    (s, dir) => {
      val w = docs(s, dir).groupBy(col("source"))
        .agg(sum(col("n_chars")).as("w"))
      val tot = w.agg(sum(col("w")).as("wtot"))
      val guard = coalesce(expr(
        "assert_true(wtot >= 0 and wtot < 8796093022208, " +
          "'q_prep_interleave: corpus weight exceeds BIGINT-safe " +
          "bound (need 0 <= wtot < 2^43)')").cast("long"), lit(0L))
      val strides = w.crossJoin(broadcast(tot))
        .select(col("source"),
          (expr("(1000000 * wtot) DIV w") + guard).as("stride"))
      graft.operators.OrderStatistics.groupRowRanks(
          docs(s, dir).select(col("source").as("g"),
            conv(substring(md5(concat(col("doc_id").cast("string"),
              lit("#il"))), 1, 12), 16, 10).cast("long").as("v"),
            col("doc_id").as("p")),
          minRank = false)
        .select(col("g").as("source"),
          col("p").cast("long").as("doc_id"), col("rk"))
        .join(broadcast(strides), Seq("source"))
        .select(col("source"), col("rk"), col("doc_id"),
          expr("rk * stride").as("tick"))
        .orderBy(col("tick"), col("source"), col("rk"))
        .limit(100)
        // positions via the bounded collect+posexplode pattern — a
        // partition-less ranking window is banned by the plan audit
        .agg(sort_array(collect_list(struct(col("tick"), col("source"),
          col("rk"), col("doc_id")))).as("ts"))
        .select(posexplode(col("ts")))
        .select((col("pos") + 1).cast("long").as("pos"),
          col("col.tick").as("tick"), col("col.source").as("source"),
          col("col.rk").as("rk"), col("col.doc_id").as("doc_id"))
        .orderBy(col("pos"))
    },
    Some("""
      WITH w AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM w),
      ranked AS (
        SELECT d.doc_id, d.source,
               CAST(ROW_NUMBER() OVER (PARTITION BY d.source
                 ORDER BY CAST(('0x' || SUBSTR(md5(CAST(d.doc_id
                   AS VARCHAR) || '#il'), 1, 12)) AS BIGINT),
                 d.doc_id) AS BIGINT) AS rk
        FROM documents d),
      strides AS (
        SELECT w.source, (1000000 * t.wtot) // w.w AS stride
        FROM w CROSS JOIN tot t),
      ticked AS (
        SELECT r.source, r.rk, r.doc_id, r.rk * s.stride AS tick
        FROM ranked r JOIN strides s USING (source)),
      top AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY tick, source, rk)
                 AS BIGINT) AS pos
        FROM ticked)
      SELECT pos, tick, source, rk, doc_id
      FROM top WHERE pos <= 100
      ORDER BY pos"""))

  val all: Seq[Q] = Seq(qPrepSplit, qPrepRedact, qPrepDecontam,
    qPrepDecontamBloom, qPrepChunk,
    qPrepShard, qPrepSample, qPrepMixture, qPrepTokenize, qPrepPack,
    qPrepCurriculum, qPrepWinsorize, qPrepOversample, qPrepClassifier,
    qPrepPerplexity, qPrepBinning, qPrepEvalSample, qPrepPipeline,
    qPrepTemperature, qPrepCalibration, qPrepPadding, qPrepDpCount,
    qPrepKfold, qPrepKanon, qPrepRendezvous, qPrepWeightedSample,
    qPrepQuota, qPrepQuotaSample, qPrepCtxCurve, qPrepEpochShuffle,
    qPrepInterleave)
}
