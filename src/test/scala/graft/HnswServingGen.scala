package graft

import graft.eval.RecallStudy
import graft.search.Hnsw

/** Generates the SCALE.md "HNSW serving shape" table:
  * `sbt "Test/runMain graft.HnswServingGen"`.
  *
  * Quantifies the online-ANN boundary (BASELINE.md): a point query against
  * a RESTORED index ([[Hnsw.restoreServing]] — no Spark job on the query
  * path) vs a single-threaded exact scan of the same in-memory vectors vs
  * launching an actual Spark job per query. Data is the recall study's
  * seeded mixture (20 000 × dim 32), so the recall for each ef is the
  * published crossover row; this main adds the latency axis. Latencies are
  * wall-clock on the current host — indicative magnitudes, not pinned
  * goldens (the spec-pinned facts stay in RecallStudySpec/HnswSpec).
  */
object HnswServingGen {
  private def quantile(sorted: Array[Long], q: Double): Double =
    sorted(math.min(sorted.length - 1, (q * sorted.length).toInt)) / 1e6

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "8").getOrCreate()
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val vecs = RecallStudy.clusteredVectors(
      n = 20000, dim = 32, nClusters = 16, noise = 0.15, seed = 7L)
    val queries = RecallStudy.clusteredVectors(
      n = 50, dim = 32, nClusters = 16, noise = 0.15, seed = 1234L)
    val emb = vecs.zipWithIndex
      .map { case (v, i) => (f"v$i%06d", v) }.toSeq
      .toDF("fragment_id", "vector")

    val dir = java.nio.file.Files.createTempDirectory("hnsw_serving").toString
    val t0 = System.nanoTime()
    Hnsw.saveIndex(emb, dir, numShards = 8)
    val buildMs = (System.nanoTime() - t0) / 1e6

    val t1 = System.nanoTime()
    val serving = Hnsw.restoreServing(spark.read.parquet(dir))
    val restoreMs = (System.nanoTime() - t1) / 1e6

    // warm both paths, then time one-query-at-a-time invocations
    val reps = 2000
    def timeLoop(f: Array[Float] => Unit): Array[Long] = {
      (0 until 200).foreach(i => f(queries(i % queries.length)))
      val lat = new Array[Long](reps)
      var i = 0
      while (i < reps) {
        val q = queries(i % queries.length)
        val s = System.nanoTime()
        f(q)
        lat(i) = System.nanoTime() - s
        i += 1
      }
      java.util.Arrays.sort(lat)
      lat
    }

    println(s"| path | p50 ms | p99 ms | note |")
    println(s"|---|---|---|---|")
    Seq(48, 128, 256).foreach { ef =>
      val lat = timeLoop(q => { serving.search(q, 10, ef); () })
      println(f"| restored graph, ef $ef | ${quantile(lat, 0.5)}%.3f " +
        f"| ${quantile(lat, 0.99)}%.3f | no Spark job |")
    }
    // single-threaded exact scan over the same in-memory vectors
    val withIds = vecs.zipWithIndex.map { case (v, i) => (f"v$i%06d", v) }
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    val latScan = timeLoop { q =>
      val top = withIds.map { case (id, v) => (id, cosine(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10)
      top.length; ()
    }
    println(f"| in-memory exact scan | ${quantile(latScan, 0.5)}%.3f " +
      f"| ${quantile(latScan, 0.99)}%.3f | no Spark job |")
    // one Spark job per point query — the latency floor that rules out
    // per-query Spark serving regardless of operator cost
    val sparkReps = 30
    val latJob = new Array[Long](sparkReps)
    (0 until 5).foreach { i =>
      graft.search.VectorSearch.knn(emb, queries(i), 10).collect()
    }
    (0 until sparkReps).foreach { i =>
      val s = System.nanoTime()
      graft.search.VectorSearch.knn(emb, queries(i % queries.length), 10)
        .collect()
      latJob(i) = System.nanoTime() - s
    }
    java.util.Arrays.sort(latJob)
    println(f"| Spark job per query (exact) | ${quantile(latJob, 0.5)}%.3f " +
      f"| ${quantile(latJob, 0.99)}%.3f | scheduling floor |")
    println(f"| (one-time) index build+save | ${buildMs}%.0f | | write-time |")
    println(f"| (one-time) serving restore | ${restoreMs}%.0f | | per process |")

    spark.stop()
  }
}
