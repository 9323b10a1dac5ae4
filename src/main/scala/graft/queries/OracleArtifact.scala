package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-time oracle artifacts (the g6-centroids pattern, VERDICT r13
  * task 4): a query that depends on a deterministic TRAINED object
  * (k-means centroids, PQ/SQ codebooks, LSH planes, calibration floors)
  * persists it as a small parquet keyed by an exact integer corpus
  * fingerprint, and the DuckDB oracle reads the same values back via
  * `read_parquet(..., hive_partitioning=1)` and independently replays
  * everything DOWNSTREAM of training (assignment, encoding, scoring,
  * ranking, recall arithmetic). Training determinism itself is covered
  * by the trainer specs; what the artifact buys is that the oracle's
  * replay shares nothing with the Spark plan but the trained floats.
  *
  * Dynamic partition overwrite keeps other corpora's partitions: each
  * scale factor writes only its own `corpus_fp` partition.
  */
object OracleArtifact {

  def write(s: SparkSession, df: DataFrame, dir: String): Unit = {
    val overwriteKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(overwriteKey)
    s.conf.set(overwriteKey, "dynamic")
    try df.write.mode("overwrite").partitionBy("corpus_fp").parquet(dir)
    finally prev match {
      case Some(v) => s.conf.set(overwriteKey, v)
      case None => s.conf.unset(overwriteKey)
    }
  }

  /** The `read_parquet` glob for an artifact dir, absolute. */
  def duckGlob(dir: String): String =
    s"'${new java.io.File(dir).getAbsolutePath}/*/*.parquet'"
}
