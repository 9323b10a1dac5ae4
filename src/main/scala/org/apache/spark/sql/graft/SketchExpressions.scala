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
  /** Compiled once; Pattern is immutable/thread-safe. Explicit class, not
    * `\s`: Java's `\s` includes `\x0B` which RE2 (DuckDB) excludes — must
    * match TextSketch.words and the oracle exactly.
    */
  private val Whitespace = java.util.regex.Pattern.compile("[ \\t\\n\\f\\r]+")

  /** MessageDigest is stateful — one per thread, reset() per use. */
  private val threadDigest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private[graft] def digest(): MessageDigest = threadDigest.get()

  /** limit -1: keep trailing empty tokens (Spark split semantics). */
  private[graft] def splitWords(s: String): Array[String] =
    Whitespace.split(s, -1)
}

/** One-pass MinHash SIGNATURE: tokenize → shingle → md5 once per shingle →
  * Kirsch-Mitzenmacher (a, b) → fold component mins s_i = min(a + i·b)
  * directly, never materializing the pair array. Values are identical to
  * `TextSketch.kmComponent(kmHashes(shingles(text, n)), i)` and the DuckDB
  * oracle; empty shingle sets yield Long.MaxValue components (matching the
  * built-ins' coalesce). One tight Java loop replaces k interpreted
  * array_min(transform(...)) passes over a cached struct array — and the
  * cached stage shrinks from every shingle's (a, b) pair to k longs per row.
  */
case class MinHashSignature(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private def emptySig: GenericArrayData =
    new GenericArrayData(Array.fill[Any](k)(Long.MaxValue))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return emptySig
    val text = v.asInstanceOf[UTF8String].toString
    // space-only trim + trailing-empty-keeping split — see MinHashKmPairs
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    val words = MinHashKmPairs.splitWords(text.substring(start, end))
    if (words.length < shingleN) return emptySig
    val md = MinHashKmPairs.digest()
    val sig = Array.fill(k)(Long.MaxValue)
    val n = words.length - shingleN + 1
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
      var a = 0L
      var p = 0
      while (p < 7) { a = (a << 8) | (digest(p) & 0xffL); p += 1 }
      var b = 0L
      p = 7
      while (p < 14) { b = (b << 8) | (digest(p) & 0xffL); p += 1 }
      var c = 0
      var h = a
      while (c < k) {
        if (h < sig(c)) sig(c) = h
        h += b // h = a + (c+1)·b for the next component
        c += 1
      }
      i += 1
    }
    new GenericArrayData(sig.map(_.asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** One-pass SimHash: tokenize → md5 per word → 60-bit hexInt → ±1 bit
  * votes → set bit j when the vote is positive. Values identical to
  * `TextSketch.simhash(text, bits)` (and the DuckDB oracle): same
  * space-only trim, same `[ \t\n\f\r]+` split keeping empty tokens — an
  * empty text still hashes one "" token, matching the built-in transform.
  * Replaces `bits` interpreted aggregate() passes (each re-inlined over the
  * word-hash array by project collapsing) with one loop.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  // NULL text → 0, matching the built-in: each bit's when(null_vote > 0)
  // falls to otherwise(0), so the sum is 0, never NULL
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val text = v.asInstanceOf[UTF8String].toString
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    val words = MinHashKmPairs.splitWords(text.substring(start, end))
    val md = MinHashKmPairs.digest()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < words.length) {
      md.reset()
      val d = md.digest(words(i).getBytes(StandardCharsets.UTF_8))
      // first 15 hex digits as a long (same as TextSketch.hexInt)
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0x0fL)
      var j = 0
      while (j < bits) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
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

/** One-pass character-shingle profile counter: for each profile (a small
  * set of length-`n` strings), count how many of the text's n-code-point
  * windows are members. Replaces an interpreted `aggregate()` fold that
  * rebuilt a 5-field struct and ran ~40 `isin` comparisons per window.
  * Values are identical to the HOF/`charShingles` formulation (and the
  * DuckDB oracle): windows slice CODE POINTS, exactly like Spark's
  * `substring`; texts shorter than `n` (and null texts, which the
  * `when(length >= n)` guard also sent to the empty branch) count zero.
  */
case class ProfileShingleCounts(child: Expression, profiles: Seq[Seq[String]],
    n: Int) extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "profile_shingle_counts"

  @transient private lazy val profSets: Array[java.util.HashSet[String]] =
    profiles.map { p =>
      val s = new java.util.HashSet[String]()
      p.foreach(s.add)
      s
    }.toArray

  override def eval(input: InternalRow): Any = {
    val counts = new Array[Int](profiles.length)
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(counts)
    val text = v.asInstanceOf[UTF8String].toString
    val cpCount = text.codePointCount(0, text.length)
    if (cpCount >= n) {
      var start = 0
      var i = 0
      while (i <= cpCount - n) {
        val end = text.offsetByCodePoints(start, n)
        val win = text.substring(start, end)
        var p = 0
        while (p < profSets.length) {
          if (profSets(p).contains(win)) counts(p) += 1
          p += 1
        }
        start = text.offsetByCodePoints(start, 1)
        i += 1
      }
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): ProfileShingleCounts =
    copy(child = newChild)
}

/** One-pass DISTINCT word-n-gram key set: tokenize → n-gram shingles →
  * md5 → first-15-hex-digit long (TextSketch.hexInt's value) → per-row
  * dedup. Because every document is one row, the corpus-wide
  * `DISTINCT (doc_id, g)` of the gram-pair stage is exactly the union of
  * per-row sets — computing the set here makes `explode(gram_set(text))`
  * produce the distinct pairs directly, removing the corpus-sized
  * distinct Exchange from every consumer (optimization guide §2.4
  * "remove shuffles outright"). Values are identical to
  * `explode(shingles(text, n)) → hexInt → DISTINCT`: same space-only
  * trim, same `[ \t\n\f\r]+` split keeping empty tokens, same
  * `< n words → empty` rule, same 60-bit md5-prefix long (dedup by the
  * hashed key, exactly like the old global distinct and the DuckDB
  * oracles). Output order is first occurrence; consumers treat it as a
  * set (they explode straight into aggregates).
  *
  * CodegenFallback: md5 dominates, same rationale as MinHashKmPairs.
  */
case class GramSet(child: Expression, shingleN: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  // NULL text → empty set (the built-in shingles CASE sends null to the
  // empty branch, and explode drops it) — never null
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_set"

  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return empty
    val text = v.asInstanceOf[UTF8String].toString
    // space-only trim + trailing-empty-keeping split — see MinHashKmPairs
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    val words = MinHashKmPairs.splitWords(text.substring(start, end))
    if (words.length < shingleN) return empty
    val md = MinHashKmPairs.digest()
    val n = words.length - shingleN + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
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
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 15 hex digits = bytes 0-6 plus the high nibble of byte 7
      // (TextSketch.hexInt / SimHash parity)
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0x0fL)
      seen.add(h)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramSet =
    copy(child = newChild)
}

/** One-pass per-row token multiset statistics over a string array:
  * (n, n_distinct, top_c) = element count, distinct-element count, and
  * the highest element multiplicity. Values are identical to
  * `explode(arr) → groupBy(doc, tok).count → groupBy(doc).agg(sum, count,
  * max)` for a document whose tokens live in one row — the per-document
  * repetition statistics (x8) need no shuffle at all. Null elements
  * count as one group, exactly like groupBy on an exploded null.
  */
case class TokenCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = true // null array → null (callers filter)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false)))
  override def prettyName: String = "token_counts"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val m = new java.util.HashMap[UTF8String, Int](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val c = m.getOrDefault(t, 0) + 1
      m.put(t, c)
      if (c > top) top = c
      i += 1
    }
    InternalRow(n.toLong, m.size.toLong, top.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

/** One-pass per-row token histogram: array<struct<tok, c>> with one entry
  * per DISTINCT element (first-occurrence order) carrying its
  * multiplicity. `explode(token_freq(arr))` produces exactly the rows of
  * `explode(arr) → groupBy(doc, tok).count` for a document whose tokens
  * live in one row — the (doc, token) hash-agg Exchange disappears from
  * every term-frequency consumer (x13/x16; guide §2.3/§2.4). Null
  * elements form one group, exactly like groupBy on an exploded null;
  * null array → null (explode drops it, like explode on the null array).
  */
case class TokenFreq(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = true),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "token_freq"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val cell = m.get(t)
      // clone on first sight: an UnsafeArrayData's UTF8String is a view
      // into a buffer the engine may reuse after this eval returns
      if (cell == null) m.put(if (t == null) null else t.clone(), Array(1L))
      else cell(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var p = 0
    while (it.hasNext) {
      val e = it.next()
      out(p) = InternalRow(e.getKey, e.getValue()(0))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenFreq =
    copy(child = newChild)
}

object SketchExpressions {
  def minhashKmPairs(text: Column, shingleN: Int): Column =
    ExpressionUtils.column(MinHashKmPairs(ExpressionUtils.expression(text), shingleN))

  def gramSet(text: Column, shingleN: Int): Column =
    ExpressionUtils.column(GramSet(ExpressionUtils.expression(text), shingleN))

  def tokenCounts(arr: Column): Column =
    ExpressionUtils.column(TokenCounts(ExpressionUtils.expression(arr)))

  def tokenFreq(arr: Column): Column =
    ExpressionUtils.column(TokenFreq(ExpressionUtils.expression(arr)))

  def minhashSignature(text: Column, shingleN: Int, k: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(text), shingleN, k))

  def simhash(text: Column, bits: Int): Column =
    ExpressionUtils.column(SimHash(ExpressionUtils.expression(text), bits))

  def charFingerprint(text: Column, n: Int): Column =
    ExpressionUtils.column(CharFingerprint(ExpressionUtils.expression(text), n))

  def profileShingleCounts(text: Column, profiles: Seq[Seq[String]],
      n: Int): Column =
    ExpressionUtils.column(
      ProfileShingleCounts(ExpressionUtils.expression(text), profiles, n))
}
