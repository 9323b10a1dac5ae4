package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, attach the payload of the
  * single most recent right row with the same key and
  * `right.time <= left.time` (or `<` in strict mode). Spark has no native
  * as-of join; the naive encoding (inequality join + row_number) explodes
  * into a per-key cross product before ranking.
  *
  * This implementation is the union–sort–carry formulation used by
  * time-series stores: tag both inputs, union them, and carry the last seen
  * right payload forward over a per-key ordered window. Cost profile:
  * ONE shuffle on the key columns, a sort within partitions, zero row
  * amplification — the same profile as sessionization, so it holds at
  * 100 TB (the only skew unit is a single hot key's row count, which is
  * the lower bound for any per-key ordered semantics).
  *
  * Tie rules match DuckDB/kdb `ASOF JOIN`:
  *  - equal timestamps match in inclusive mode (`strict = false`);
  *  - among several right rows sharing (key, time), the one with the
  *    greatest `rightTiebreak` wins — pass one whenever (key, time) is not
  *    unique on the right, otherwise the winner is nondeterministic;
  *  - NULL keys never match (equi-join semantics): right rows with a null
  *    key are dropped up front — without that, the window's NULL-grouping
  *    partition would happily carry a null-key right payload onto null-key
  *    left rows, which `ON l.k = r.k` never does.
  */
object AsOfJoin {

  private val T = "__asof_t"
  private val SIDE = "__asof_side"
  private val TB = "__asof_tb"
  private val R = "__asof_r"

  /** @param keys        equi-join key columns (present on both sides)
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param payload     right columns to attach (null when no match);
    *                    names must not collide with `left`'s columns
    * @param rightTiebreak right column ordering concurrent right rows
    *                    (greatest wins); None ⇒ (key, rightTime) must be unique
    * @param strict      true ⇒ match only `right.time < left.time`
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTiebreak: Option[String] = None,
      strict: Boolean = false): DataFrame = {
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"payload collides with left columns: $collisions")

    // right rows sort BEFORE left rows at equal time in inclusive mode
    // (so the carried value includes them), AFTER in strict mode.
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)

    val rightSide = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
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

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(T).asc, col(SIDE).asc, col(TB).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftSide.unionByName(rightSide, allowMissingColumns = true)
      .withColumn(R, last(col(R), ignoreNulls = true).over(w))
      .filter(col(SIDE) === leftOrd)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => col(R).getField(p).as(p)): _*)
  }
}
