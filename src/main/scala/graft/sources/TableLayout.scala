package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical table layout for the entity store at scale.
  *
  * The reference's secondary indexes (GIN/BTREE on hot metadata keys,
  * storage/schema.py:86-119) map to columnar layout choices in Spark:
  *
  *  - **Bucketing** on the join key: two tables bucketed `bucketBy(n, k)`
  *    + `sortBy(k)` join WITHOUT a shuffle (co-located sort-merge) — the
  *    equivalent of the reference's FK indexes for repeated
  *    fragment⋈concept / embedding⋈parent joins. At 100 TB the bucket
  *    count is sized to ~1 GB/bucket-file per partition.
  *  - **Partition columns** for pruning equality filters (`view`, coarse
  *    `doc_bucket`, LSH `bucket` for ANN probes).
  *  - **Sort-within-partitions** on (view, lang) for row-group skipping on
  *    the reference's hot filter keys (min/max parquet stats).
  */
object TableLayout {

  /** Write a table bucketed+sorted on `key` so future equi-joins on `key`
    * between co-bucketed tables plan with zero Exchange.
    */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Layout for filter locality: partition by a low-cardinality column,
    * sort within partitions on the hot filter keys.
    */
  def writePartitionedSorted(df: DataFrame, path: String,
      partitionCol: String, sortCols: Seq[String]): Unit =
    df.repartition(df.col(partitionCol))
      .sortWithinPartitions(sortCols.map(df.col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** True when the physical plan of `df` contains no shuffle Exchange —
    * the check that a bucketed join actually co-located.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
