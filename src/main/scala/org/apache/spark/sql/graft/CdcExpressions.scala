// Same namespace rationale as VectorExpressions.scala.
package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass content-defined chunking for the exact-substring dedup
  * family (d14/d15): a TRUE rolling polynomial hash over the character
  * stream (remove-leading via the precomputed 31^(W-1) coefficient, one
  * multiply-add per character) replaces the interpreted
  * filter(sequence)/slice/aggregate HOF stack, whose per-position boxed
  * lambda evaluation measured ~30× slower at the same VALUES.
  *
  * Value contract (what the DuckDB oracle recomputes): a cut falls
  * before 1-based position i ∈ [2, n−W+1] iff
  * fold(acc·31 + codepoint mod M) over the W chars starting at i lands
  * on 0 mod 32; chunks are the text between cuts; `withDigest` returns
  * (clen, md5hex(chunk)) structs, else the chunk strings. The rolling
  * recurrence is the same linear form mod the prime M, so values are
  * IDENTICAL to the per-window fold (parity-pinned in DedupSpec).
  * Positions count UTF-16 units, = code points for the BMP text this
  * corpus carries (the engines' own substring semantics already pin
  * that assumption).
  *
  * CodegenFallback: one Java loop per row; the md5 per CHUNK dominates.
  */
case class CdcChunks(child: Expression, w: Int, mod: Long, div: Int,
    withDigest: Boolean)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (withDigest) ArrayType(StructType(Seq(
      StructField("clen", IntegerType, nullable = false),
      StructField("digest", StringType, nullable = false))),
      containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    // NULL reads as '' (one empty chunk) — the same coalesce the HOF
    // parity reference and both DuckDB oracles apply, so a null-text
    // row keeps its output row on every path instead of silently
    // vanishing from the Spark side of the hash compare
    if (v == null) compute("")
    else compute(v.asInstanceOf[UTF8String].toString)
  }

  // 31^(w-1) mod `mod` — the leading character's coefficient
  private val lead: Long = {
    var p = 1L
    var i = 0
    while (i < w - 1) { p = p * 31 % mod; i += 1 }
    p
  }

  private def compute(text: String): Any = {
    val n = text.length
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (n >= w + 1) {
      // h = window hash at 1-based start i; seed with the window at 1
      var h = 0L
      var j = 0
      while (j < w) { h = (h * 31 + text.charAt(j)) % mod; j += 1 }
      var i = 2
      while (i <= n - w + 1) {
        // slide: drop char at i-2 (0-based), append char at i+w-2
        h = ((h - text.charAt(i - 2) * lead % mod + mod) * 31 +
          text.charAt(i + w - 2)) % mod
        if (h % div == 0) cuts += i
        i += 1
      }
    }
    val starts = 1 +: cuts
    val ends = cuts.map(_ - 1) :+ n
    val out = new Array[Any](starts.length)
    var k = 0
    while (k < starts.length) {
      val s = starts(k)
      val e = ends(k)
      val chunk = text.substring(s - 1, e)
      if (withDigest)
        out(k) = new GenericInternalRow(Array[Any](e - s + 1,
          UTF8String.fromString(graft.functions.Hashing.md5Hex(chunk))))
      else out(k) = UTF8String.fromString(chunk)
      k += 1
    }
    new GenericArrayData(out)
  }
}

object CdcExpressions {
  def cdcChunks(text: Column, w: Int, mod: Long, div: Int,
      withDigest: Boolean): Column =
    ExpressionUtils.column(
      CdcChunks(ExpressionUtils.expression(text), w, mod, div, withDigest))
}
