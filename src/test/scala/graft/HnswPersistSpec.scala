package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.RecallStudy
import graft.search.Hnsw

/** The persisted HNSW index ([[Hnsw.saveIndex]]/[[Hnsw.searchIndex]]):
  * the graph serializes to a parquet adjacency table at write time and
  * any later query batch walks the RESTORED graphs — no rebuild. The
  * contract pinned here:
  *
  *  1. restore parity: a saved index answers bit-identically to the
  *     build-and-search path ([[Hnsw.searchBatch]]) at the same ef —
  *     sharding, insertion order, and graph edges all survive the
  *     parquet round-trip;
  *  2. the exactness witness holds through the persisted path;
  *  3. the layout is shard-partitioned (one directory per shard), so a
  *     search task reads exactly one shard's rows.
  */
class HnswPersistSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("hnsw_persist").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val vecs = RecallStudy.clusteredVectors(
    n = 900, dim = 16, nClusters = 5, noise = 0.15, seed = 21L)
  private lazy val queries = RecallStudy.clusteredVectors(
    n = 6, dim = 16, nClusters = 5, noise = 0.15, seed = 77L)
    .zipWithIndex.map { case (q, i) => (s"q$i", q) }.toSeq

  private def df = {
    val s = spark
    import s.implicits._
    vecs.zipWithIndex.map { case (v, i) => (f"f$i%06d", v) }.toSeq
      .toDF("fragment_id", "vector")
  }

  private def collectHits(res: org.apache.spark.sql.DataFrame): Seq[(String, String, Double, Int)] =
    res.select("query_id", "fragment_id", "similarity", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  private lazy val saved = {
    val path = s"$dir/index"
    Hnsw.saveIndex(df, path, numShards = 3)
    spark.read.parquet(path)
  }

  test("saved index answers bit-identically to build-and-search at equal ef") {
    val direct = collectHits(Hnsw.searchBatch(df, queries, topK = 10,
      ef = 32, numShards = 3))
    val persisted = collectHits(Hnsw.searchIndex(saved, queries, topK = 10,
      ef = 32))
    assert(persisted == direct)
  }

  test("exactness witness holds through the persisted path") {
    def norm(v: Array[Float]): Array[Float] = {
      val s = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (s == 0) v else v.map(x => (x / s).toFloat)
    }
    def exact(q: Array[Float]): Seq[String] = {
      val qn = norm(q)
      vecs.zipWithIndex.map { case (v, i) =>
        val vn = norm(v)
        var d = 0.0
        var j = 0
        while (j < vn.length) { d += qn(j).toDouble * vn(j); j += 1 }
        (-d, f"f$i%06d")
      }.sorted.take(10).map(_._2)
    }
    val hits = collectHits(Hnsw.searchIndex(saved, queries, topK = 10,
      ef = vecs.length))
    queries.foreach { case (qid, q) =>
      val got = hits.filter(_._1 == qid).sortBy(_._4).map(_._2)
      assert(got == exact(q), s"query $qid")
    }
  }

  test("ServingIndex point queries match the distributed searchIndex path") {
    val serving = Hnsw.restoreServing(saved)
    assert(serving.numShards == 3 && serving.size == vecs.length)
    val batch = collectHits(Hnsw.searchIndex(saved, queries, topK = 10,
      ef = 32))
    queries.foreach { case (qid, q) =>
      val point = serving.search(q, 10, ef = 32)
        .map { case (id, sim) => (id, sim) }.toSeq
      val viaBatch = batch.filter(_._1 == qid).sortBy(_._4)
        .map(t => (t._2, t._3))
      assert(point == viaBatch, s"query $qid")
    }
  }

  test("ServingIndex clamps topK exactly like the batch path") {
    val serving = Hnsw.restoreServing(saved)
    // topK=0 clamps up to 1; topK beyond the cap clamps down to it
    assert(serving.search(queries.head._2, 0, ef = 32).length == 1)
    assert(serving.search(queries.head._2, 100000, ef = vecs.length).length ==
      math.min(vecs.length, graft.search.VectorSearch.clampTopK(100000)))
  }

  test("ServingIndex restores a shard subset when the DataFrame is filtered") {
    import org.apache.spark.sql.functions.col
    val partial = Hnsw.restoreServing(saved.filter(col("shard_id") === 0))
    assert(partial.numShards == 1 && partial.size < vecs.length)
    // answers come only from the restored shard but are still well-formed
    val res = partial.search(queries.head._2, 5, ef = 32)
    assert(res.length == 5 && res.sliding(2).forall {
      case Array(a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
      case _ => true
    })
  }

  test("layout is shard-partitioned: one directory per shard") {
    val parts = new java.io.File(s"$dir/index").listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(parts.length == 3, s"expected 3 shard dirs, got ${parts.toSeq}")
  }

  test("RoutedServingIndex prunes its walk to the query's cells, " +
      "dedupes replicas, and refuses a retrained router (r14 task 2b)") {
    import graft.search.Ivf
    val path = s"$dir/index_routed"
    val router = Ivf.train(vecs.take(600), 5, iters = 5)
    Hnsw.saveIndexRouted(df, path, router, replicas = 2)
    val saved = spark.read.parquet(path)
    val serving = Hnsw.restoreServingRouted(saved, router)
    assert(serving.numCells == 5)
    assert(serving.size == 2 * vecs.length, "x2 replication restored")
    // full coverage (probeCells = k) matches the distributed routed walk
    val batch = collectHits(Hnsw.searchIndexRouted(saved, queries,
      topK = 10, ef = 32, router, probeShards = router.k))
    queries.foreach { case (qid, q) =>
      val point = serving.search(q, 10, ef = 32, probeCells = router.k)
        .toSeq
      val viaBatch = batch.filter(_._1 == qid).sortBy(_._4)
        .map(t => (t._2, t._3))
      assert(point == viaBatch, s"query $qid")
      // replica dedupe: no id twice
      assert(point.map(_._1).distinct.size == point.size)
      // a pruned point query (1 cell) returns a subset of the full walk
      // — the flat-in-shard-count serving path, no Spark job involved
      val pruned = serving.search(q, 10, ef = 32, probeCells = 1)
      assert(pruned.nonEmpty &&
        pruned.map(_._1).toSet.subsetOf(
          serving.search(q, 100, ef = vecs.length,
            probeCells = router.k).map(_._1).toSet))
    }
    // restore refuses a router that did not assign this adjacency
    val other = Ivf.train(vecs.drop(7).take(600), 5, iters = 5)
    assume(Ivf.contentHash(other) != Ivf.contentHash(router))
    val e = intercept[IllegalArgumentException] {
      Hnsw.restoreServingRouted(saved, other)
    }
    assert(e.getMessage.contains("router_hash mismatch"))
  }
}
