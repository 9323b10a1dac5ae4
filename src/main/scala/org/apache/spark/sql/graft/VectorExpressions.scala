// Lives in the org.apache.spark.sql namespace because the extension points
// it needs (AbstractDataType in inputTypes, classic.ExpressionUtils for
// Column construction) are private[sql] in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for float-vector similarity — the measured
  * optimization SURVEY.md §7.4 reserves for the hot scoring path.
  *
  * The `zip_with`+`aggregate` higher-order-function formulation is
  * interpreted (per-element lambda dispatch, boxed accumulators); these
  * expressions generate a tight Java loop inside whole-stage codegen.
  * Arithmetic is IDENTICAL to the HOF form and the DuckDB oracles:
  * per-element float→double multiply, strict left-to-right summation —
  * results stay bit-for-bit equal, only faster.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** One-pass cosine similarity: dot, |a|² and |b|² accumulate in a single
  * loop (independent accumulators ⇒ identical IEEE results to three
  * separate passes, which is what the DuckDB oracle computes).
  */
case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    // zero vector ⇒ similarity 0.0, not NaN — NaN sorts ABOVE every real
    // similarity in a descending orderBy and would silently win all KNNs
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorCosine =
    copy(left = newLeft, right = newRight)
}

/** Cosine DISTANCE — pgvector's `<=>` operator as a named function
  * (reference retrieval/search.py:106-112 serves `ORDER BY embedding
  * <=> $q` with `1 - <=>` as the displayed similarity). NOT a separate
  * kernel: the builder expands to literally `1.0 - vector_cosine(a,
  * b)` over the one accumulator loop, so the bit-for-bit relationship
  * between the two spellings holds by construction (no twin kernel to
  * drift), zero vectors give distance 1.0 via the cosine's own 0.0
  * guard, and [[CosineOrder]]'s `(1 - cosine) ASC` canonical case
  * serves the function in both index rules with no extra pattern.
  */
object VectorCosineDistance {
  def apply(left: Expression, right: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Subtract(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      VectorCosine(left, right))
}

/** The per-row content hash an HNSW index node carries (`vec_hash`):
  * [[graft.search.Hnsw.contentHash]] over a base row's RAW vector —
  * the same raw-bits FNV the index writers compute from each INPUT row
  * at build time (never from the stored normalized copy: normalization
  * is not bit-idempotent, so a normalized-form hash would drift under
  * maintenance rebuilds), so equality proves the node was built from
  * this exact row. Evaluated by [[HnswIndexRewrite]]'s splice over the
  * k served rows only (CodegenFallback is fine off the hot path); a
  * mismatch means the configured index was not built over the scanned
  * relation — stale or foreign — and must hard-error, never silently
  * mis-rank (the ivf_q_hash contract, extended to row content).
  */
case class HnswVectorHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hnsw_vector_hash"
  override def nullSafeEval(a: Any): Any =
    graft.search.Hnsw.contentHash(
      a.asInstanceOf[ArrayData].toFloatArray())
  override protected def withNewChildInternal(
      newChild: Expression): HnswVectorHash = copy(child = newChild)
}

/** The ONE copy of the "(form, direction) ranks best-first by cosine"
  * canonicalization, shared by [[AnnProbeRewrite]] and
  * [[HnswIndexRewrite]] so the two rules cannot drift: if the
  * [[VectorCosineDistance]] expansion shape ever changes, both rules
  * follow through this helper or neither does. Servable spellings:
  *   - `vector_cosine(...) DESC` — the reference's similarity form;
  *   - `(1.0 - vector_cosine(...)) ASC` — the verbatim pgvector
  *     distance port after constant folding, which is also exactly what
  *     [[VectorCosineDistance]] expands to; 1−x is strictly monotone
  *     decreasing so distance-ASC RANKS as cosine-DESC, but it is NOT
  *     injective in doubles (cosines within ~ulp(1.0) collapse to one
  *     distance), so consumers must keep the USER'S own key as any
  *     final sort key rather than substituting the canonical cosine —
  *     see HnswIndexRewrite's splice, which does exactly that.
  * Any other pairing (`cosine ASC`, `distance DESC`, a different
  * constant) orders worst-first and must never be index-served.
  */
object CosineOrder {
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, Literal, SortDirection, Subtract}

  def canonical(e: Expression, dir: SortDirection): Option[VectorCosine] =
    (e, dir) match {
      case (c: VectorCosine, Descending) => Some(c)
      case (Subtract(Literal(one: Double, DoubleType), c: VectorCosine, _),
          Ascending) if one == 1.0 => Some(c)
      case _ => None
    }
}

/** IVF coarse-quantizer assignment: nearest-centroid id (argmin squared-L2,
  * ties → lowest index) in ONE pass over the k×dim centroid table. The
  * centroids ride along as a broadcast-sized constructor param (k ≤ a few
  * thousand × dim ≤ 4096 floats — well under task-binary limits), not a
  * child expression, so codegen references one shared float[] instead of
  * folding k array literals into the plan.
  */
case class IvfAssign(child: Expression, centroidsFlat: Array[Float], dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private def k: Int = centroidsFlat.length / dim

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_assign"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = x.getFloat(i).toDouble - centroidsFlat(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroidsFlat, "float[]")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  int $off = $c * $dim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = (double) $a.getFloat($i) - (double) $cents[$off + $i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfAssign =
    copy(child = newChild)
}

/** Product-quantization encoder: splits the input vector into `m`
  * subvectors of `dsub` dims and emits the nearest-subcentroid index per
  * subspace (argmin squared-L2, ties → lowest index) as ONE byte per
  * subspace (`BinaryType`, hence ksub ≤ 256) — a d×4-byte float vector
  * genuinely becomes m bytes on disk and in Tungsten rows, which is where
  * the advertised compression ratio comes from.
  * Codebook layout: subcentroid (j, c) starts at ((j*ksub)+c)*dsub.
  */
/** Top-`replicas` nearest-centroid ids, rank order, ties to the lower
  * id — the codegen'd multi-assignment for replicated IVF lists and the
  * cluster-routed HNSW layout. Same distance arithmetic as [[IvfAssign]]
  * (double fold over float casts); selection keeps an R-slot insertion
  * array instead of sorting all k candidates, so per-row cost is
  * O(k·(dim + R)) — at 10M rows × 800 shards the difference between a
  * build-time map stage and an array_sort-per-row crawl.
  */
case class IvfMultiAssign(child: Expression, centroidsFlat: Array[Float],
    dim: Int, replicas: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private def k: Int = centroidsFlat.length / dim
  require(replicas >= 1 && replicas <= k,
    s"replicas $replicas outside 1..$k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_multi_assign"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val bestD = Array.fill(replicas)(Double.MaxValue)
    val bestI = Array.fill(replicas)(Int.MaxValue)
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = x.getFloat(i).toDouble - centroidsFlat(off + i)
        d += diff * diff
        i += 1
      }
      // insertion keeps (d asc, id asc); a later equal-d candidate has
      // the larger id, so strict < matches the (d, i) struct sort
      var j = replicas - 1
      if (d < bestD(j)) {
        while (j > 0 && d < bestD(j - 1)) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = d; bestI(j) = c
      }
      c += 1
    }
    // a NaN distance never beats the sentinel (NaN < x is false), so an
    // all-NaN vector would leave Int.MaxValue slots that downstream
    // shard arithmetic (cell · SubFactor) silently overflows — refuse it
    // loudly instead: a non-finite vector is invalid router input
    if (bestI(replicas - 1) == Int.MaxValue)
      throw new IllegalArgumentException(
        "ivf_multi_assign: non-finite vector (all centroid distances " +
          "NaN) — cannot route")
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bestI)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroidsFlat, "float[]")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $bestD = new double[$replicas];
         |int[] $bestI = new int[$replicas];
         |java.util.Arrays.fill($bestD, Double.MAX_VALUE);
         |for (int $c = 0; $c < $k; $c++) {
         |  int $off = $c * $dim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = (double) $a.getFloat($i) - (double) $cents[$off + $i];
         |    $d += $diff * $diff;
         |  }
         |  int $j = $replicas - 1;
         |  if ($d < $bestD[$j]) {
         |    while ($j > 0 && $d < $bestD[$j - 1]) {
         |      $bestD[$j] = $bestD[$j - 1]; $bestI[$j] = $bestI[$j - 1]; $j--;
         |    }
         |    $bestD[$j] = $d; $bestI[$j] = $c;
         |  }
         |}
         |if ($bestI[$replicas - 1] == Integer.MAX_VALUE) {
         |  throw new IllegalArgumentException(
         |    "ivf_multi_assign: non-finite vector (all centroid distances NaN) — cannot route");
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($bestI);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : IvfMultiAssign = copy(child = newChild)
}

/** One-pass nearest-centroid-by-COSINE id: the map-only replacement for
  * g6's `crossJoin(broadcast(centroids)) → groupBy(vec_id).max_by(cid,
  * struct(sim, -cid))` — k cosines per row, no n·k intermediate rows, no
  * exchange. Bit-identical to that formulation by construction: each
  * per-centroid similarity is the EXACT [[VectorCosine]] arithmetic
  * (float→double, fixed index-order fold, zero-norm → 0.0), scanned in
  * ascending cid with strict `>` (ties keep the LOWER cid, = max of
  * (sim, -cid)); a NaN similarity ranks GREATEST exactly like Spark's
  * struct ordering in max_by (first NaN wins, later NaNs lose the
  * tie-break to its lower cid).
  */
case class CosineArgmax(child: Expression, centroidsFlat: Array[Float],
    dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private def k: Int = centroidsFlat.length / dim

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "cosine_argmax"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val xn = x.numElements()
    var best = -1
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      val n = math.min(xn, dim)
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = centroidsFlat(off + i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) 0.0
              else dot / (math.sqrt(na) * math.sqrt(nb))
      if (s > bestS || (java.lang.Double.isNaN(s) &&
          !java.lang.Double.isNaN(bestS))) { bestS = s; best = c }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroidsFlat, "float[]")
      val xn = ctx.freshName("xn")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val sim = ctx.freshName("sim")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      s"""
         |int $xn = $a.numElements();
         |int $best = -1;
         |double $bestS = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  int $off = $c * $dim;
         |  int $n = java.lang.Math.min($xn, $dim);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $cents[$off + $i];
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $sim = ($na == 0.0 || $nb == 0.0) ? 0.0
         |    : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  if ($sim > $bestS || (Double.isNaN($sim) && !Double.isNaN($bestS))) {
         |    $bestS = $sim; $best = $c;
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : CosineArgmax = copy(child = newChild)
}

case class PqEncode(child: Expression, codebookFlat: Array[Float],
    m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(ksub >= 1 && ksub <= 256, s"ksub must fit one byte, got $ksub")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val xi = if (base + i < x.numElements()) x.getFloat(base + i).toDouble else 0.0
          val diff = xi - codebookFlat(off + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    codes
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("codebook", codebookFlat, "float[]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val xi = ctx.freshName("xi")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |byte[] $codes = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = $j * $dsub;
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $off = ($j * $ksub + $c) * $dsub;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $xi = ($base + $i < $a.numElements())
         |        ? (double) $a.getFloat($base + $i) : 0.0;
         |      double $diff = $xi - (double) $cb[$off + $i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$j] = (byte) $best;
         |}
         |${ev.value} = $codes;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) lookup-table sum: given byte PQ codes and a
  * query-specific table `lut` (one double per (subspace, subcentroid)),
  * returns Σ_j lut[j·ksub + codes[j]] — an approximate dot/distance in m
  * table reads instead of d multiplies. Codes are validated against ksub
  * so a codebook/index shape mismatch fails loudly instead of reading a
  * neighboring subspace's table entries.
  */
/** Residual against a coarse centroid: `vec − centroids[list_id]`,
  * element-wise over the centroid's `dim` entries (vector elements past
  * `dim` pass through unchanged; an out-of-range list id — impossible for
  * ids produced by [[IvfAssign]] over the same quantizer — passes the
  * vector through untouched rather than inventing a centroid). The
  * write-time half of residual IVFPQ: PQ codes quantize the residual,
  * which occupies a far smaller region than the raw corpus, so the same
  * m×ksub codebook budget resolves finer (the FAISS `IndexIVFPQ`
  * default, `by_residual=true`). Composes with [[PqEncode]] inside one
  * whole-stage-codegen span.
  */
case class IvfResidual(left: Expression, right: Expression,
    centroidsFlat: Array[Float], dim: Int)
    extends BinaryExpression with ExpectsInputTypes {

  private def k: Int = centroidsFlat.length / dim

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "ivf_residual"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val list = b.asInstanceOf[Int]
    val n = x.numElements()
    val out = new Array[Float](n)
    val off = list * dim
    val lim = if (list >= 0 && list < k) math.min(n, dim) else 0
    var i = 0
    while (i < lim) { out(i) = x.getFloat(i) - centroidsFlat(off + i); i += 1 }
    while (i < n) { out(i) = x.getFloat(i); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cents = ctx.addReferenceObj("centroids", centroidsFlat, "float[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val off = ctx.freshName("off")
      val lim = ctx.freshName("lim")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |float[] $out = new float[$n];
         |int $off = $b * $dim;
         |int $lim = ($b >= 0 && $b < $k) ? java.lang.Math.min($n, $dim) : 0;
         |int $i = 0;
         |for (; $i < $lim; $i++) {
         |  $out[$i] = $a.getFloat($i) - $cents[$off + $i];
         |}
         |for (; $i < $n; $i++) { $out[$i] = $a.getFloat($i); }
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IvfResidual =
    copy(left = newLeft, right = newRight)
}

case class PqAdc(child: Expression, lut: Array[Double], ksub: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    require(codes.length * ksub == lut.length,
      s"pq_adc: ${codes.length}-byte code does not match lut of ${lut.length} = m*$ksub")
    var acc = 0.0
    var j = 0
    while (j < codes.length) {
      val c = codes(j) & 0xFF
      require(c < ksub, s"pq_adc: code $c out of range for ksub=$ksub")
      acc += lut(j * ksub + c)
      j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tbl = ctx.addReferenceObj("lut", lut, "double[]")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.length;
         |if ($m * $ksub != $tbl.length) {
         |  throw new IllegalArgumentException("pq_adc: " + $m +
         |    "-byte code does not match lut of " + $tbl.length + " = m*$ksub");
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $c = $a[$j] & 0xFF;
         |  if ($c >= $ksub) {
         |    throw new IllegalArgumentException(
         |      "pq_adc: code " + $c + " out of range for ksub=$ksub");
         |  }
         |  $acc += $tbl[$j * $ksub + $c];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

/** Per-row rank bucket against a BOUNDED sorted candidate list — the
  * map-only building block of v14's window-free corpus-wide ranks.
  *
  * `cands` are the ≤ 2C candidates pre-sorted in rank order (score DESC,
  * id ASC). For a row (s, i), the set of candidates the row sorts
  * at-or-before is a SUFFIX of that order, so the row's whole rank
  * contribution is one integer: the first candidate position p with
  * `s > cs[p] ∨ (s = cs[p] ∧ i ≤ cid[p])` (else m) — found by binary
  * search (the predicate is monotone in p). rank(candidate q) is then
  * the prefix sum `#{rows : bucket ≤ q}` of the ≤ m+1-group bucket
  * histogram — the row_number-over-(score DESC, id ASC) identity,
  * counting the candidate's own row. Replaces a 2C-column conditional-
  * sum aggregate (O(n·2C) branch evaluations through interpreted
  * projections) with O(n·log 2C) compares in whole-stage codegen.
  */
case class RankBucket(left: Expression, right: Expression,
    candScores: Array[Double], candIds: Array[Long])
    extends BinaryExpression with ExpectsInputTypes {

  private def m: Int = candScores.length

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "rank_bucket"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[Double]
    val id = b.asInstanceOf[Long]
    var lo = 0
    var hi = m
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (s > candScores(mid) ||
          (s == candScores(mid) && id <= candIds(mid))) hi = mid
      else lo = mid + 1
    }
    lo
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cs = ctx.addReferenceObj("candScores", candScores, "double[]")
      val cid = ctx.addReferenceObj("candIds", candIds, "long[]")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $m;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($a > $cs[$mid] || ($a == $cs[$mid] && $b <= $cid[$mid])) {
         |    $hi = $mid;
         |  } else {
         |    $lo = $mid + 1;
         |  }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RankBucket =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column wrappers (classic-session Column construction). */
  def vectorDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vectorCosine(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorCosine(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def ivfAssign(vec: Column, centroidsFlat: Array[Float], dim: Int): Column =
    ExpressionUtils.column(IvfAssign(
      ExpressionUtils.expression(vec), centroidsFlat, dim))

  def ivfMultiAssign(vec: Column, centroidsFlat: Array[Float], dim: Int,
      replicas: Int): Column =
    ExpressionUtils.column(IvfMultiAssign(
      ExpressionUtils.expression(vec), centroidsFlat, dim, replicas))

  def cosineArgmax(vec: Column, centroidsFlat: Array[Float],
      dim: Int): Column =
    ExpressionUtils.column(CosineArgmax(
      ExpressionUtils.expression(vec), centroidsFlat, dim))

  def pqEncode(vec: Column, codebookFlat: Array[Float],
      m: Int, ksub: Int, dsub: Int): Column =
    ExpressionUtils.column(PqEncode(
      ExpressionUtils.expression(vec), codebookFlat, m, ksub, dsub))

  def pqAdc(codes: Column, lut: Array[Double], ksub: Int): Column =
    ExpressionUtils.column(PqAdc(
      ExpressionUtils.expression(codes), lut, ksub))

  def ivfResidual(vec: Column, listId: Column, centroidsFlat: Array[Float],
      dim: Int): Column =
    ExpressionUtils.column(IvfResidual(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(listId),
      centroidsFlat, dim))

  def rankBucket(score: Column, id: Column, candScores: Array[Double],
      candIds: Array[Long]): Column =
    ExpressionUtils.column(RankBucket(
      ExpressionUtils.expression(score), ExpressionUtils.expression(id),
      candScores, candIds))
}
