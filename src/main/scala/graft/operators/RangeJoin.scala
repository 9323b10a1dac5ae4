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
  * fixed-width time buckets (width = the range span rounded up to a power
  * of two, so bucketing is an exact arithmetic shift), explode each left row
  * to its ≤2 candidate buckets, equi-join on (keys, bucket) — which
  * shuffles and hash-joins like any other equi-join, AQE/skew handling
  * included — then apply the exact range predicate to the candidates.
  * Row amplification is bounded: left ≤2×, right 1×, candidate pairs ≤
  * (pairs in a 2-span window) instead of (all pairs per key).
  */
object RangeJoin {

  /** Smallest s with 2^s ≥ span: a power-of-two band width makes floor
    * division an arithmetic right shift — exact for EVERY long, negative
    * (pre-epoch) included. A double-division floor would silently lose
    * integer precision past 2^53 µs and drop pairs at band boundaries.
    */
  private def bandShift(span: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(span - 1)

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
    val shift = bandShift(upperInclusiveMicros - lowerExclusiveMicros)

    val lt = unix_micros(col(leftTime))
    val rt = unix_micros(col(rightTime))

    // every right row lands in exactly ONE bucket → no duplicate pairs,
    // no post-join dedup; band width 2^shift ≥ span keeps the left
    // candidate range ≤ 2 buckets
    val rightB = right.withColumn("__band", shiftright(rt, shift))
    val leftB = left.withColumn("__band",
      explode(sequence(
        shiftright(lt + lit(lowerExclusiveMicros + 1L), shift),
        shiftright(lt + lit(upperInclusiveMicros), shift))))

    leftB.join(rightB, keys :+ "__band")
      .filter(rt > lt + lit(lowerExclusiveMicros) &&
        rt <= lt + lit(upperInclusiveMicros))
      .drop("__band")
  }
}
