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

  /** The driver has produced `events.ts` with three parquet encodings over
    * time, and every downstream operator (watermarks, `unix_micros`, range
    * joins) requires session-zoned `TimestampType`:
    *
    *   - TIMESTAMP(NANOS): Spark's reader rejects it; with
    *     spark.sql.legacy.parquet.nanosAsLong (set by [[GraftSession]]) it
    *     arrives as a long, converted here with floor division — matching
    *     DuckDB's flooring TIMESTAMP_NS → TIMESTAMP cast in the oracle SQL.
    *   - timestamp[us] without timezone: Spark 4 reads it as
    *     TIMESTAMP_NTZ, on which `withWatermark` and `unix_micros` throw.
    *     The session TZ is pinned UTC ([[GraftSession]]), so a plain cast
    *     to TimestampType is value-preserving and oracle-hash-neutral.
    *   - timestamp[us] with UTC timezone: already TimestampType; pass
    *     through.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(s, dir, "events"))

  /** Normalize any of the three `ts` encodings to TimestampType. Pure
    * column transform — works identically on a streaming DataFrame (the
    * stream/batch equivalence specs route their file-source streams
    * through this so both sides see the same instants).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // floor division (ts div 1000 truncates toward zero, which would
        // shift pre-epoch timestamps one microsecond vs DuckDB's cast)
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
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
