package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, attach the payload of the single
  * nearest right row with the same key: the most recent at-or-before
  * (`backward`, `right.time <= left.time`) or the earliest at-or-after
  * (`forward`, `right.time >= left.time`); strict mode excludes equality.
  * Spark has no native as-of join; the naive encoding (inequality join +
  * row_number) explodes into a per-key cross product before ranking.
  *
  * This implementation is the union–sort–carry formulation used by
  * time-series stores: tag both inputs, union them, and carry the nearest
  * right payload across a per-key ordered window (time-ascending for
  * backward, time-descending for forward). Cost profile: ONE shuffle on
  * the key columns, a sort within partitions, zero row amplification —
  * the same profile as sessionization, so it holds at 100 TB (the only
  * skew unit is a single hot key's row count, which is the lower bound
  * for any per-key ordered semantics).
  *
  * Tie rules match DuckDB/kdb `ASOF JOIN`:
  *  - equal timestamps match in inclusive mode (`strict = false`);
  *  - among several right rows sharing (key, time), the winner is the
  *    greatest `rightTiebreak` (backward) / the least (forward) — pass one
  *    whenever (key, time) is not unique on the right, otherwise the
  *    winner is nondeterministic;
  *  - NULL keys never match (equi-join semantics): right rows with a null
  *    key are dropped up front — without that, the window's NULL-grouping
  *    partition would happily carry a null-key right payload onto null-key
  *    left rows, which `ON l.k = r.k` never does.
  *  - NULL timestamps never match (SQL comparison with NULL is UNKNOWN):
  *    right rows with a null time are dropped with the null keys, and left
  *    rows with a null time take a null payload in the final projection —
  *    otherwise null-time rows would sort to one end of the scan order and
  *    either seed a spurious carry (backward) or inherit the partition-wide
  *    one (forward).
  */
object AsOfJoin {

  private val T = "__asof_t"
  private val SIDE = "__asof_side"
  private val TB = "__asof_tb"
  private val R = "__asof_r"

  /** Most recent right row at-or-before (strict: strictly before).
    *
    * @param keys        equi-join key columns (present on both sides)
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param payload     right columns to attach (null when no match);
    *                    names must not collide with `left`'s columns
    * @param rightTiebreak right column ordering concurrent right rows;
    *                    None ⇒ (key, rightTime) must be unique
    * @param strict      true ⇒ match only `right.time < left.time`
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTiebreak: Option[String] = None,
      strict: Boolean = false): DataFrame =
    join(left, right, keys, leftTime, rightTime, payload, rightTiebreak,
      strict, forward = false)

  /** Earliest right row at-or-after (strict: strictly after). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTiebreak: Option[String] = None,
      strict: Boolean = false): DataFrame =
    join(left, right, keys, leftTime, rightTime, payload, rightTiebreak,
      strict, forward = true)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTiebreak: Option[String], strict: Boolean,
      forward: Boolean): DataFrame = {
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"payload collides with left columns: $collisions")

    // scan order: time ascending (backward) or descending (forward), so
    // "last seen right" is always the nearest admissible one. Right rows
    // sort BEFORE left rows at equal time in inclusive mode (the carried
    // value includes them), AFTER in strict mode.
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)

    val rightSide = right
      .filter((keys.map(col(_).isNotNull) :+ col(rightTime).isNotNull)
        .reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTime).as(T),
          lit(rightOrd).as(SIDE),
          rightTiebreak.map(col).getOrElse(lit(0L)).as(TB),
          // one non-null struct per right row: last(_, ignoreNulls) then
          // carries rows whose individual payload fields are legitimately null
          struct(payload.map(col): _*).as(R)): _*)

    val leftSide = left
      .withColumn(T, col(leftTime))
      .withColumn(SIDE, lit(leftOrd))

    // tiebreak: the LAST-scanned right among equal (key, time) wins the
    // carry, so ascending tb ⇒ greatest wins (backward); descending tb ⇒
    // least wins (forward)
    val ord =
      if (forward) Seq(col(T).desc, col(SIDE).asc, col(TB).desc_nulls_first)
      else Seq(col(T).asc, col(SIDE).asc, col(TB).asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftSide.unionByName(rightSide, allowMissingColumns = true)
      .withColumn(R, last(col(R), ignoreNulls = true).over(w))
      .filter(col(SIDE) === leftOrd)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => when(col(leftTime).isNotNull, col(R).getField(p))
          .as(p)): _*)
  }
}
