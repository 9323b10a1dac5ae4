// Lives in the org.apache.spark.sql namespace because the extension points
// it needs (AbstractDataType in inputTypes, classic.ExpressionUtils for
// Column construction) are private[sql] in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType}

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
}
