// Same namespace rationale as VectorExpressions.scala.
package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash hash-pair extraction: tokenize on whitespace, build
  * word n-gram shingles, md5 each shingle once, and emit the
  * Kirsch-Mitzenmacher (a, b) pairs — replacing a 4-deep stack of
  * interpreted higher-order functions (split → transform(get×n) →
  * transform(md5/conv ×2)) with a single Java loop per row. The VALUES are
  * identical to the built-in formulation (and the DuckDB oracle):
  * a = first 14 md5 hex digits, b = next 14, as longs.
  *
  * CodegenFallback: the md5 digests dominate; codegen would only shave
  * dispatch overhead that is already amortized by the one-pass shape.
  */
case class MinHashKmPairs(child: Expression, shingleN: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  import MinHashKmPairs._

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  // NULL text → empty pair list (matching the built-in when/otherwise
  // formulation), so the expression never returns null
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "minhash_km_pairs"

  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) empty else compute(v)
  }

  private def compute(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // SPACE-only trim — Spark's trim() strips ' ' only, while Java's
    // String.trim strips every char <= U+0020 (tabs/newlines), which would
    // change the leading/trailing empty-token behavior vs the built-in
    // split(trim(text), "\\s+") and the DuckDB oracle
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    // limit -1: Spark's split keeps trailing empty tokens; Pattern.split's
    // default (0) would drop them
    val words = Whitespace.split(text.substring(start, end), -1)
    if (words.length < shingleN) return empty
    val md = threadDigest.get()
    val n = words.length - shingleN + 1
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < shingleN) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 14 hex digits = bytes 0-6 (7 bytes = 14 nibbles)
      var a = 0L
      var k = 0
      while (k < 7) { a = (a << 8) | (digest(k) & 0xffL); k += 1 }
      // next 14 hex digits = bytes 7-13 (hex chars 15-28, 1-based)
      var b = 0L
      k = 7
      while (k < 14) { b = (b << 8) | (digest(k) & 0xffL); k += 1 }
      out(i) = InternalRow(a, b)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashKmPairs =
    copy(child = newChild)
}

object MinHashKmPairs {
  /** Compiled once; Pattern is immutable/thread-safe. */
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** MessageDigest is stateful — one per thread, reset() per use. */
  private val threadDigest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private[graft] def digest(): MessageDigest = threadDigest.get()
}

/** One-pass rolling char-n-gram fingerprint: min over hexint15(md5) of all
  * character n-grams — identical values to
  * `TextSketch.charFingerprint(text, n)` (substring → md5 → first 15 hex
  * digits as long → array_min; Long.MaxValue when shorter than n), without
  * materializing the shingle array or paying per-element HOF dispatch.
  *
  * NOTE code-point parity: Spark's `substring`/`length` count code points,
  * so the window advances by code points here too.
  */
case class CharFingerprint(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "char_fingerprint"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return Long.MaxValue
    val text = v.asInstanceOf[UTF8String].toString
    val cpCount = text.codePointCount(0, text.length)
    if (cpCount < n) return Long.MaxValue
    val md = MinHashKmPairs.digest()
    var min = Long.MaxValue
    var start = 0
    var i = 0
    while (i <= cpCount - n) {
      val end = text.offsetByCodePoints(start, n)
      md.reset()
      val d = md.digest(text.substring(start, end)
        .getBytes(StandardCharsets.UTF_8))
      // first 15 hex digits = bytes 0-6 plus the high nibble of byte 7
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0x0fL)
      if (h < min) min = h
      start = text.offsetByCodePoints(start, 1)
      i += 1
    }
    min
  }

  override protected def withNewChildInternal(newChild: Expression): CharFingerprint =
    copy(child = newChild)
}

object SketchExpressions {
  def minhashKmPairs(text: Column, shingleN: Int): Column =
    ExpressionUtils.column(MinHashKmPairs(ExpressionUtils.expression(text), shingleN))

  def charFingerprint(text: Column, n: Int): Column =
    ExpressionUtils.column(CharFingerprint(ExpressionUtils.expression(text), n))
}
