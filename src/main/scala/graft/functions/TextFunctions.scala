package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a pre-split word array, as a native
  * expression. Replaces `array_distinct(transform(sequence(...), i =>
  * concat_ws(...)))`, whose per-element interpreted lambdas dominated
  * the dedup pipelines' scan stage (~5× slower than this loop).
  * Semantics identical: shingles in first-occurrence order, deduped,
  * words joined with a single space; fewer than n words → empty array.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  private def shingle(words: ArrayData, from: Int): UTF8String = {
    val parts = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      parts(j) = words.getUTF8String(from + j)
      j += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val total = words.numElements() - n + 1
    if (total <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < total) {
        seen.add(shingle(words, i))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }
  }

  // Interpreted eval above is already loop-tight; codegen delegates to
  // it via reference (no per-element lambda dispatch either way).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("shinglesExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $expr.shingleEval($c);")
  }

  /** Called from generated code. */
  def shingleEval(words: ArrayData): ArrayData =
    nullSafeEval(words).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document repetition statistics of a pre-split word array in ONE
  * O(len) pass: bigram/trigram totals and distinct counts plus the
  * most-frequent bigram with its count (ties → binary-smallest bigram,
  * the `ORDER BY n DESC, bg` tie-break). One hash map over the row's
  * bigrams replaces the explode → (doc, bigram)-keyed shuffle → window
  * chain AND the interpreted `array_distinct`/`zip_with` HOFs: per-row
  * state is bounded by document length — the same bound as the word
  * array itself — so nothing about this grows with the corpus, and the
  * repetition query loses its only exchange. (The per-row argmax the
  * earlier keyed-aggregate shape rejected was the O(len²) interpreted-
  * HOF compare loop; a hash aggregate in-row is O(len).)
  *
  * Returns struct(n_bigrams, n_distinct_bg, n_trigrams, n_distinct_tg,
  * top_bigram, top_n); top_bigram is null (top_n 0) when the doc has
  * fewer than 2 words. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bg", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("n_distinct_tg", LongType, nullable = false),
    StructField("top_bigram", StringType, nullable = true),
    StructField("top_n", LongType, nullable = false)))

  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val nBg = math.max(n - 1, 0)
    val nTg = math.max(n - 2, 0)
    val space = UTF8String.fromString(" ")
    val bgCounts = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < nBg) {
      val bg = UTF8String.concatWs(space,
        ws.getUTF8String(i), ws.getUTF8String(i + 1))
      val c = bgCounts.get(bg)
      if (c == null) bgCounts.put(bg, Array(1L)) else c(0) += 1L
      i += 1
    }
    val tgSeen = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < nTg) {
      tgSeen.add(UTF8String.concatWs(space, ws.getUTF8String(i),
        ws.getUTF8String(i + 1), ws.getUTF8String(i + 2)))
      i += 1
    }
    var topBg: UTF8String = null
    var topN = 0L
    val it = bgCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > topN || (c == topN && topBg != null &&
          e.getKey.compareTo(topBg) < 0)) {
        topBg = e.getKey; topN = c
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nBg.toLong, bgCounts.size().toLong, nTg.toLong,
        tgSeen.size().toLong, topBg, topN))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("repExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $expr.statsEval($c);")
  }

  /** Called from generated code. */
  def statsEval(words: ArrayData): InternalRow =
    nullSafeEval(words).asInstanceOf[InternalRow]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunking of a binary payload — the production shape
  * of q_multimodal_cdc's chunker: ONE narrow O(len) pass per payload
  * (no per-byte row explosion, no positional window, no shuffle until
  * the cross-payload chunk aggregate). Boundary where the rolling hash
  * of the trailing 4 bytes (b + 257·b₋₁ + 257²·b₋₂ + 257³·b₋₃, unsigned)
  * hits 0 mod 64 — the boundary byte CLOSES its chunk. Each chunk
  * emits (start 1-based, len, md5 of the UPPERCASE-hex expansion of
  * its bytes) — hex-string md5, not raw-byte md5, so the value is
  * bit-identical to the SQL oracle's `md5(substr(hex(payload), …))`
  * replay and the differential gate covers this kernel end to end. */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cdc_chunks needs a BINARY payload, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("chunk_hash", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  private val hexDigits = "0123456789ABCDEF".toCharArray

  private def emit(bytes: Array[Byte], start: Int, end: Int,
      out: java.util.ArrayList[InternalRow]): Unit = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = new Array[Byte](2 * (end - start + 1))
    var i = start
    var j = 0
    while (i <= end) {
      val v = bytes(i) & 0xff
      hex(j) = hexDigits(v >>> 4).toByte
      hex(j + 1) = hexDigits(v & 0xf).toByte
      i += 1; j += 2
    }
    val dig = md.digest(hex)
    val sb = new java.lang.StringBuilder(32)
    var k = 0
    while (k < dig.length) {
      val v = dig(k) & 0xff
      sb.append(Character.forDigit(v >>> 4, 16))
      sb.append(Character.forDigit(v & 0xf, 16))
      k += 1
    }
    out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((start + 1).toLong, (end - start + 1).toLong,
        UTF8String.fromString(sb.toString))))
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val out = new java.util.ArrayList[InternalRow]()
    var chunkStart = 0
    var idx = 0
    while (idx < n) {
      if (idx >= 3) {
        val h = (bytes(idx) & 0xff).toLong +
          257L * (bytes(idx - 1) & 0xff) +
          66049L * (bytes(idx - 2) & 0xff) +
          16974593L * (bytes(idx - 3) & 0xff)
        if (h % 64 == 0) {
          emit(bytes, chunkStart, idx, out)
          chunkStart = idx + 1
        }
      }
      idx += 1
    }
    if (chunkStart < n) emit(bytes, chunkStart, n - 1, out)
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size())))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("cdcExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $expr.chunksEval($c);")
  }

  /** Called from generated code. */
  def chunksEval(bytes: Array[Byte]): ArrayData =
    nullSafeEval(bytes).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The dedup pipelines' md5-derived integer pair in ONE digest pass:
  * struct(v, h) where `h` is the digest's first 15 hex digits as a
  * 60-bit BIGINT (the verify-join fingerprint) and `v` is the first 8
  * hex digits mod p = 2^31−1 (the minhash input). Replaces the
  * `conv(substring(md5(x), 1, 15), 16, 10)` /
  * `conv(substring(md5(x), 1, 8), 16, 10) % p` pair — which
  * hex-encodes the digest into a 32-char string and parses nibbles
  * back through two substrings and two base conversions — with two
  * shifts on the digest's first 8 bytes: the first 15 nibbles ARE the
  * big-endian first-8-byte word `>>> 4`, the first 8 nibbles are
  * `>>> 32`. Values are therefore BIT-IDENTICAL to the string
  * formulation, so every DuckDB oracle keeps the md5-hex formula and
  * keeps hash-matching; only the per-shingle CPU changes. Digest
  * instances come from `MessageDigest.getInstance` per call — the
  * same cost model as Spark's own `md5` expression (commons-codec
  * does the identical thing), minus its hex encode + our parse-back.
  */
case class Md5Bits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("h", LongType, nullable = false)))

  override def prettyName: String = "graft_md5_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(input.asInstanceOf[UTF8String].getBytes)
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xFFL); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((be >>> 32) % TextFunctions.MinhashP, be >>> 4))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("md5BitsExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $expr.bitsEval($c);")
  }

  /** Called from generated code. */
  def bitsEval(s: UTF8String): InternalRow =
    nullSafeEval(s).asInstanceOf[InternalRow]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** The MinHash affine-permutation modulus p = 2^31 − 1 (Mersenne
    * prime) — the ONE definition shared by the [[Md5Bits]] kernel's
    * pre-reduction, DedupQueries' (a·v + b) mod p permutation family,
    * and every oracle that states the formula inline. */
  val MinhashP: Long = 2147483647L

  /** Distinct word n-gram shingles of an array<string> column. */
  def shingles(words: Column, n: Int): Column =
    ExprBridge.column(WordShingles(ExprBridge.expression(words), n))

  /** struct(v, h): minhash input + 60-bit fingerprint from one md5. */
  def md5Bits(s: Column): Column =
    ExprBridge.column(Md5Bits(ExprBridge.expression(s)))

  /** One-pass repetition statistics of an array<string> column. */
  def repetitionStats(words: Column): Column =
    ExprBridge.column(RepetitionStats(ExprBridge.expression(words)))

  /** Content-defined chunks of a binary column. */
  def cdcChunks(payload: Column): Column =
    ExprBridge.column(CdcChunks(ExprBridge.expression(payload)))
}
