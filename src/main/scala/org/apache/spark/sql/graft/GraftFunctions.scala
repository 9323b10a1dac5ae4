// In the spark.sql namespace for the same reason as VectorExpressions —
// FunctionIdentifier/ExpressionInfo plumbing is intended for extensions
// but type-private in places.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the graft vector expressions so `spark.sql` users
  * (and the SQL oracle queries) can call them by name:
  *
  *   SELECT vector_cosine(embedding, query_vec) ...
  *
  * Two registration paths: `GraftExtensions` for
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * (cluster-wide), or [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(e.injectFunction)
    e.injectOptimizerRule(AnnProbeRewrite(_))
  }
}

object GraftFunctions {

  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Int literal arguments (sketch widths/sizes) must fold at registration
    * time — the expressions take them as constructor params, not children.
    */
  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val vectorDotDescriptor: Descriptor = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1)))

  val vectorCosineDescriptor: Descriptor = (
    FunctionIdentifier("vector_cosine"),
    new ExpressionInfo(classOf[VectorCosine].getName, "vector_cosine"),
    (exprs: Seq[Expression]) => VectorCosine(exprs(0), exprs(1)))

  // expands to Subtract(1.0, VectorCosine) — see VectorCosineDistance;
  // the ExpressionInfo class is the underlying kernel's
  val vectorCosineDistanceDescriptor: Descriptor = (
    FunctionIdentifier("vector_cosine_distance"),
    new ExpressionInfo(classOf[VectorCosine].getName,
      "vector_cosine_distance"),
    (exprs: Seq[Expression]) => VectorCosineDistance(exprs(0), exprs(1)))

  val minhashSignatureDescriptor: Descriptor = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
    (exprs: Seq[Expression]) => MinHashSignature(exprs(0),
      intArg(exprs(1), "shingle_n"), intArg(exprs(2), "k")))

  val simhashDescriptor: Descriptor = (
    FunctionIdentifier("simhash"),
    new ExpressionInfo(classOf[SimHash].getName, "simhash"),
    (exprs: Seq[Expression]) => SimHash(exprs(0), intArg(exprs(1), "bits")))

  val charFingerprintDescriptor: Descriptor = (
    FunctionIdentifier("char_fingerprint"),
    new ExpressionInfo(classOf[CharFingerprint].getName, "char_fingerprint"),
    (exprs: Seq[Expression]) => CharFingerprint(exprs(0), intArg(exprs(1), "n")))

  /** cdc_chunks(text, w, mod, div, with_digest): the d14/d15 chunker.
    * `with_digest` folds at registration like the int params (a boolean
    * literal selects the struct-vs-string output type, which must be
    * known at plan time). */
  val cdcChunksDescriptor: Descriptor = (
    FunctionIdentifier("cdc_chunks"),
    new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
    (exprs: Seq[Expression]) => {
      if (exprs.length != 5) throw new IllegalArgumentException(
        "cdc_chunks expects 5 arguments: " +
          s"cdc_chunks(text, w, mod, div, with_digest); got ${exprs.length}")
      CdcChunks(exprs(0),
      intArg(exprs(1), "w"),
      intArg(exprs(2), "mod").toLong,
      intArg(exprs(3), "div"),
      exprs(4) match {
        case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Boolean, _) => v
        case other => throw new IllegalArgumentException(
          s"with_digest must be a boolean literal, got $other")
      })
    })

  val descriptors: Seq[Descriptor] = Seq(
    vectorDotDescriptor, vectorCosineDescriptor,
    vectorCosineDistanceDescriptor, minhashSignatureDescriptor,
    simhashDescriptor, charFingerprintDescriptor, cdcChunksDescriptor)

  /** Imperative registration on an existing session: the SQL functions
    * plus the (config-gated, off by default) ANN probe rewrite rule.
    */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[AnnProbeRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AnnProbeRewrite(spark)
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[HnswIndexRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ HnswIndexRewrite(spark)
  }
}
