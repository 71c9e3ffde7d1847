package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

object TextFunctions {
  /** Distinct word n-gram shingles of an array<string> column. */
  def shingles(words: Column, n: Int): Column =
    ExprBridge.column(WordShingles(ExprBridge.expression(words), n))
}
