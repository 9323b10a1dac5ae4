// In the spark.sql namespace to reach Spark's OWN runtime-filter bloom
// machinery (BloomFilterAggregate / BloomFilterMightContain) — public
// classes, package-guarded plumbing, same rationale as VectorExpressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build/probe as Columns, riding the exact expressions
  * Spark's adaptive runtime filter injects for shuffle-join pruning
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) — codegen'd, no UDF:
  *
  *   - [[bloomAgg]]: a distributed TypedImperativeAggregate that hashes
  *     the column with XxHash64 and ORs per-partition bloom bitsets into
  *     one serialized filter (mergeable-summaries shape, like FreqSketch);
  *   - [[mightContain]]: the probe, evaluating against the serialized
  *     filter literal with the same hash.
  *
  * No false negatives by construction; false-positive rate set by
  * numBits/estItems (≈2% at 8 bits/item with optimal hash count).
  */
object BloomProbe {

  /** Aggregate Column: serialized bloom filter over `xxhash64(c)`. */
  def bloomAgg(c: Column, estItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(c))),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Probe Column: membership of `xxhash64(c)` in a built filter. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(c)))))
}
