package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python-strict base64 + UTF-8 decode in one pass: returns the decoded
  * text, or null where CPython's `b64decode(...).decode('utf-8')`
  * would raise (reference app/app.py:222,255-256):
  *  - characters outside the base64 alphabet are DISCARDED first
  *    (b64decode's validate=False behavior);
  *  - then length must be 4k with `=` padding only at the end (else
  *    binascii.Error);
  *  - decoded bytes must be well-formed UTF-8 (else UnicodeDecodeError).
  *
  * Replaces a regexp_replace + rlike + unbase64 + encode-roundtrip
  * expression chain (evaluated ~3× per row once inlined) with a single
  * linear scan — the decode stage's cost dropped an order of magnitude.
  */
case class StrictBase64Utf8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_b64_utf8"

  override protected def nullSafeEval(input: Any): Any =
    StrictBase64.decode(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("b64Expr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = (org.apache.spark.unsafe.types.UTF8String)
         |  $expr.decodeEval($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  /** Called from generated code; null = undecodable. */
  def decodeEval(data: UTF8String): UTF8String =
    nullSafeEval(data).asInstanceOf[UTF8String]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StrictBase64 {

  private def isAlphabet(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '/'

  /** Decoded UTF-8 text or null (strict, see [[StrictBase64Utf8]]). */
  def decode(s: String): UTF8String = {
    val kept = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isAlphabet(c) || c == '=') kept.append(c)
      i += 1
    }
    val n = kept.length
    // trailing '=' padding: at most 2, nothing after, none inside
    var pads = 0
    while (pads < n && kept.charAt(n - 1 - pads) == '=') pads += 1
    if (pads > 2) return null
    var j = 0
    while (j < n - pads) {
      if (kept.charAt(j) == '=') return null
      j += 1
    }
    if (n % 4 != 0) return null
    if (pads > 0 && (n - pads) % 4 != 4 - pads) return null
    if (n == 0) return UTF8String.EMPTY_UTF8
    // same decoder family Spark's unbase64 uses; never let it throw
    val bytes =
      try java.util.Base64.getMimeDecoder.decode(kept.toString)
      catch { case _: IllegalArgumentException => return null }
    if (isValidUtf8(bytes)) UTF8String.fromBytes(bytes) else null
  }

  /** Well-formed UTF-8 check (RFC 3629: no overlongs, no surrogates,
    * max U+10FFFF). */
  private def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80) return false
        if (c == 0xe0 && c1 < 0xa0) return false // overlong
        if (c == 0xed && c1 > 0x9f) return false // surrogate
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        if (c == 0xf0 && c1 < 0x90) return false // overlong
        if (c == 0xf4 && c1 > 0x8f) return false // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }
}
