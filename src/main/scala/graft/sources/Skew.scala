package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the manual complement to AQE's
  * skew-join splitting (enabled by default in [[graft.GraftSession]]).
  *
  * At 100 TB a handful of keys (a boilerplate parent_id, the "<missing>"
  * language, a viral document) can hold most rows of a shuffle partition.
  * AQE splits skewed SORT-MERGE partitions at runtime; salting handles the
  * cases AQE can't — skewed AGGREGATIONS and skewed broadcast-ineligible
  * joins — by widening each hot key into `saltBuckets` synthetic keys.
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side gets a random salt in
    * [0, saltBuckets); the small side replicates each row `saltBuckets`
    * times so every salted key finds its match. Shuffle load per hot key
    * drops by saltBuckets×; the small side grows saltBuckets× (bounded —
    * use only when the small side can't broadcast).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-proof aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. `partial` must be decomposable (sum,
    * count, min, max — the same algebra map-side combine relies on).
    */
  def twoPhaseAgg(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int): DataFrame =
    // row-derived salt: hot keys usually repeat one VALUE too, so a
    // value-hash salt would put the whole hot key in one bucket
    df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("count"))

  /** Rough skew report: top-k keys by row count with their share — the
    * input to choosing saltBuckets.
    */
  def skewReport(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(key.as("key")).count()
      .withColumn("share", col("count") / lit(total.toDouble))
      .orderBy(col("count").desc)
      .limit(topK)
  }
}
