package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Always read via these helpers so every query hits the parquet scans with
  * explicit paths; Catalyst handles column pruning / predicate pushdown from
  * the declarative plans built on top.
  */
object Tables {
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")

  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's reader
    * rejects; with spark.sql.legacy.parquet.nanosAsLong (set by
    * [[GraftSession]]) it arrives as a long, converted here to a
    * microsecond timestamp (floor division — matches DuckDB's
    * TIMESTAMP_NS → TIMESTAMP cast used in the oracle SQL).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = load(s, dir, "events")
    // floor division (ts div 1000 truncates toward zero, which would shift
    // pre-epoch timestamps one microsecond vs DuckDB's flooring cast)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
    else raw
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Spread a scan across all cores ONLY when the file layout can't:
    * the local testdata tables are single-row-group parquet files, so a
    * CPU-heavy per-row stage (shingling, parsing, hashing) would otherwise
    * run on one task. A production multi-file / multi-row-group layout
    * already yields one split per ~128 MB, so this is a no-op there — the
    * corpus never pays a redistribution shuffle just to get parallelism
    * the scan provides. (The split count comes from the physical scan's
    * RDD metadata; no job runs.)
    */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
