package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbor via sign-random-projection LSH — the
  * 100 TB path for T1 (SURVEY.md §4: pgvector's HNSW has no Spark
  * equivalent; the idiomatic analog is a coarse bucket column + partition
  * pruning, exact scoring within probed buckets).
  *
  * Index build is write-time map work: `bucket = sign bits of dot(v, Hₚ)`
  * for `numPlanes` deterministic hyperplanes. Stored partitioned by
  * `bucket`, a query probes `1 + numPlanes` buckets (the query's bucket
  * plus all 1-bit flips — multi-probe), so the scan covers ~(p+1)/2ᵖ of
  * the data with recall controlled by p. Exact re-ranking inside buckets
  * keeps results true top-k of the probed set.
  *
  * Planes are seeded deterministically (xorshift from a seed), generated
  * on the driver and folded into the expression as literals — identical
  * plans on every run, no fit step, no model state.
  */
object Ann {

  final case class Planes(seed: Long, dim: Int, numPlanes: Int,
      values: Array[Array[Double]])

  /** Deterministic pseudo-random hyperplanes in [-0.5, 0.5]. */
  def makePlanes(dim: Int, numPlanes: Int, seed: Long = 42L): Planes = {
    var s = seed
    def next(): Long = { // xorshift64*
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545F4914F6CDD1DL
    }
    val values = Array.fill(numPlanes, dim) {
      (next() >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Planes(seed, dim, numPlanes, values)
  }

  private def planeDot(vec: Column, plane: Array[Double]): Column =
    aggregate(
      zip_with(vec, lit(plane), (x, p) => x.cast("double") * p),
      lit(0.0), (acc, x) => acc + x)

  /** Bucket id column: bit p set ⇔ dot(vec, plane_p) ≥ 0. */
  def bucketCol(vec: Column, planes: Planes): Column =
    planes.values.zipWithIndex.map { case (plane, p) =>
      when(planeDot(vec, plane) >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Write-time index: adds the `bucket` column. Persist with
    * `.write.partitionBy("bucket")` so probes become partition pruning.
    */
  def buildIndex(embeddings: DataFrame, planes: Planes,
      vectorCol: String = "vector"): DataFrame =
    embeddings.withColumn("bucket", bucketCol(col(vectorCol), planes))

  /** Driver-side bucket of a query vector (same arithmetic as bucketCol). */
  def bucketOf(vec: Array[Float], planes: Planes): Int =
    planes.values.zipWithIndex.map { case (plane, p) =>
      var d = 0.0
      var i = 0
      while (i < vec.length) { d += vec(i).toDouble * plane(i); i += 1 }
      if (d >= 0) 1 << p else 0
    }.sum

  /** Multi-probe bucket set up to `depth` bit flips of the query bucket
    * (depth 1 → 1+p buckets, depth 2 adds all C(p,2) two-bit flips).
    * Recall grows with probed volume; the scan stays partition-pruned.
    */
  def probeBuckets(queryBucket: Int, planes: Planes, depth: Int = 1): Seq[Int] = {
    val p = planes.numPlanes
    val one =
      if (depth >= 1) (0 until p).map(i => queryBucket ^ (1 << i))
      else Seq.empty
    val two =
      if (depth >= 2)
        for (i <- 0 until p; j <- i + 1 until p)
          yield queryBucket ^ (1 << i) ^ (1 << j)
      else Seq.empty
    (queryBucket +: one) ++ two
  }

  /** ANN top-k: prune to probed buckets (partition pruning on a bucketed
    * table), exact cosine re-rank within. Recall rises with more probes;
    * probeDepth=0 means single-bucket, 1 adds all 1-bit flips.
    *
    * `predicate` = filtered index scan (same contract as
    * [[Ivf.search]]): metadata filters apply to the probed candidates
    * BEFORE the re-rank, so the result is the true top-k of eligible
    * rows in the probed buckets — on a bucket-partitioned layout the
    * predicate reaches the parquet scan under the partition pruning.
    * Probing all 2^p buckets with a predicate degenerates to exact
    * filtered KNN (FilteredAnnSpec pins it).
    */
  def search(index: DataFrame, queryVec: Array[Float], planes: Planes,
      topK: Int, probeDepth: Int = 1, vectorCol: String = "vector",
      tieBreak: String = "fragment_id",
      predicate: Option[Column] = None): DataFrame = {
    val qb = bucketOf(queryVec, planes)
    val buckets = probeBuckets(qb, planes, probeDepth)
    val pruned = index.filter(col("bucket").isin(buckets: _*))
    val eligible = predicate.fold(pruned)(pruned.filter)
    VectorSearch.knn(eligible, queryVec, topK, vectorCol = vectorCol,
      tieBreak = tieBreak)
  }
}
