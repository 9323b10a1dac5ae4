package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded time-range join — pairs (l, r) sharing equi-keys with
  * `r.time ∈ (l.time + lower, l.time + upper]`. Spark plans a raw
  * inequality join as a per-key cross product (BroadcastNestedLoop or a
  * key-only sort-merge that filters after materializing every pair) —
  * quadratic in the hot key's row count.
  *
  * The scale-safe formulation is the bucketed band join (the pattern range
  * partitioners and interval libraries use): quantize both sides into
  * fixed-width time buckets (width = the range span), explode each left row
  * to its ≤2 candidate buckets, equi-join on (keys, bucket) — which
  * shuffles and hash-joins like any other equi-join, AQE/skew handling
  * included — then apply the exact range predicate to the candidates.
  * Row amplification is bounded: left ≤2×, right 1×, candidate pairs ≤
  * (pairs in a 2-span window) instead of (all pairs per key).
  */
object RangeJoin {

  /** floor division that is correct for negative micros (pre-epoch). */
  private def floorDiv(x: Column, d: Long): Column =
    (x - pmod(x, lit(d))) / lit(d) cast "long"

  /** @param keys      equi-join key columns (same names both sides)
    * @param leftTime  timestamp column on `left`
    * @param rightTime timestamp column on `right` (caller renames collisions)
    * @param lowerExclusiveMicros,upperInclusiveMicros  range bounds relative
    *   to left.time, in microseconds (lower < upper)
    * @return inner-join pairs carrying all columns of both sides
    */
  def timeBand(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      lowerExclusiveMicros: Long, upperInclusiveMicros: Long): DataFrame = {
    require(lowerExclusiveMicros < upperInclusiveMicros,
      "empty range: lower must be < upper")
    val width = upperInclusiveMicros - lowerExclusiveMicros

    val lt = unix_micros(col(leftTime))
    val rt = unix_micros(col(rightTime))

    // every right row lands in exactly ONE bucket → no duplicate pairs,
    // no post-join dedup
    val rightB = right.withColumn("__band", floorDiv(rt, width))
    val leftB = left.withColumn("__band",
      explode(sequence(
        floorDiv(lt + lit(lowerExclusiveMicros + 1L), width),
        floorDiv(lt + lit(upperInclusiveMicros), width))))

    leftB.join(rightB, keys :+ "__band")
      .filter(rt > lt + lit(lowerExclusiveMicros) &&
        rt <= lt + lit(upperInclusiveMicros))
      .drop("__band")
  }
}
