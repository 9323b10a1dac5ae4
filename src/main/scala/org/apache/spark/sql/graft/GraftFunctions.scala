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
    e.injectFunction(GraftFunctions.vectorDotDescriptor)
    e.injectFunction(GraftFunctions.vectorCosineDescriptor)
  }
}

object GraftFunctions {

  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val vectorDotDescriptor: Descriptor = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1)))

  val vectorCosineDescriptor: Descriptor = (
    FunctionIdentifier("vector_cosine"),
    new ExpressionInfo(classOf[VectorCosine].getName, "vector_cosine"),
    (exprs: Seq[Expression]) => VectorCosine(exprs(0), exprs(1)))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    Seq(vectorDotDescriptor, vectorCosineDescriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(id, info, builder)
    }
}
