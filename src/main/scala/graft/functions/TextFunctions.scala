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

object TextFunctions {
  /** Distinct word n-gram shingles of an array<string> column. */
  def shingles(words: Column, n: Int): Column =
    ExprBridge.column(WordShingles(ExprBridge.expression(words), n))

  /** One-pass repetition statistics of an array<string> column. */
  def repetitionStats(words: Column): Column =
    ExprBridge.column(RepetitionStats(ExprBridge.expression(words)))
}
