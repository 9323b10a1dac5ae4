package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.RecallStudy
import graft.search.Hnsw

/** HNSW graph ANN ([[graft.search.Hnsw]]) — the properties that make it a
  * trustworthy index rather than a heuristic:
  *
  *  1. deterministic: same rows ⇒ same graph ⇒ same results (hash-derived
  *     levels, caller-ordered insertion, index-tie-broken heaps);
  *  2. exactness witness: ef ≥ n ⇒ the beam never fills ⇒ best-first
  *     search traverses the whole (spine-connected) layer 0 and equals
  *     the exact scan — including through the distributed shard-merge
  *     path;
  *  3. connectivity is guaranteed, not probabilistic: the never-pruned
  *     spine edge keeps layer 0 connected even on adversarial input
  *     (many identical vectors, which make nearest-neighbor pruning
  *     degenerate);
  *  4. a moderate beam already recalls well on clustered data (the
  *     realistic embedding distribution).
  */
class HnswSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def id(i: Int): String = f"f$i%06d"

  private def rows(vecs: Array[Array[Float]]): Seq[(String, Array[Float])] =
    vecs.zipWithIndex.map { case (v, i) => (id(i), v) }.toSeq

  /** Exact top-k under the index's own arithmetic (normalize → dot),
    * ties by id — the oracle for the witness tests.
    */
  private def exactTopK(vecs: Array[Array[Float]], q: Array[Float],
      k: Int): Seq[String] = {
    def norm(v: Array[Float]): Array[Float] = {
      val s = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (s == 0) v else v.map(x => (x / s).toFloat)
    }
    val qn = norm(q)
    vecs.zipWithIndex.map { case (v, i) =>
      val vn = norm(v)
      var d = 0.0
      var j = 0
      while (j < vn.length) { d += qn(j).toDouble * vn(j); j += 1 }
      (-d, id(i))
    }.sorted.take(k).map(_._2)
  }

  private lazy val clustered = RecallStudy.clusteredVectors(
    n = 1200, dim = 16, nClusters = 6, noise = 0.15, seed = 11L)
  private lazy val queries = RecallStudy.clusteredVectors(
    n = 8, dim = 16, nClusters = 6, noise = 0.15, seed = 99L)

  test("deterministic: two builds over the same rows answer identically") {
    val a = Hnsw.build(rows(clustered), m = 16, efConstruction = 64)
    val b = Hnsw.build(rows(clustered), m = 16, efConstruction = 64)
    queries.foreach { q =>
      assert(a.search(q, 10, 24).toSeq == b.search(q, 10, 24).toSeq)
    }
  }

  test("exactness witness: ef >= n equals the exact scan (single graph)") {
    val g = Hnsw.build(rows(clustered), m = 16, efConstruction = 64)
    queries.foreach { q =>
      val got = g.search(q, 10, clustered.length).map(_._1).toSeq
      assert(got == exactTopK(clustered, q, 10))
    }
  }

  test("exactness witness survives the distributed shard-merge path") {
    val s = spark
    import s.implicits._
    val df = rows(clustered).toDF("fragment_id", "vector")
    val hits = Hnsw.searchBatch(df, queries.zipWithIndex.map {
        case (q, i) => (s"q$i", q)
      }.toSeq, topK = 10, ef = clustered.length, numShards = 3)
      .select("query_id", "fragment_id", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    queries.zipWithIndex.foreach { case (q, i) =>
      val got = hits.filter(_._1 == s"q$i").sortBy(_._3).map(_._2).toSeq
      assert(got == exactTopK(clustered, q, 10), s"query q$i")
    }
  }

  test("layer 0 stays connected on adversarial input (duplicate vectors)") {
    // 200 identical vectors + a far outlier cluster: nearest-neighbor
    // pruning alone could orphan nodes; the spine edge must not.
    val dup = Array.fill(200)(Array.tabulate(8)(j => if (j == 0) 1f else 0f))
    val far = Array.fill(50)(Array.tabulate(8)(j => if (j == 7) 1f else 0f))
    val vecs = dup ++ far
    val g = Hnsw.build(rows(vecs), m = 4, efConstruction = 16)
    // ef = n on a connected graph ⇒ every node is reachable ⇒ top-250
    // returns all 250 ids
    val q = Array.tabulate(8)(j => if (j == 3) 1f else 0f)
    val got = g.search(q, vecs.length, vecs.length).map(_._1).toSet
    assert(got.size == vecs.length, s"only ${got.size} of ${vecs.length} reachable")
  }

  test("moderate beam recalls >= 0.9 at ~ef/n cost on clustered data") {
    val g = Hnsw.build(rows(clustered), m = 16, efConstruction = 64)
    val recalls = queries.map { q =>
      val truth = exactTopK(clustered, q, 10).toSet
      val got = g.search(q, 10, 48).map(_._1).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall@10 at ef=48 was $mean")
  }

  test("search visits a small fraction of the graph at moderate ef") {
    val g = Hnsw.build(rows(clustered), m = 16, efConstruction = 64)
    val before = g.distOps
    queries.foreach(q => g.search(q, 10, 48))
    val perQuery = (g.distOps - before).toDouble / queries.length
    // the point of the graph: far fewer distance ops than a 1200-row scan
    assert(perQuery < clustered.length * 0.5,
      s"$perQuery distance ops/query vs n=${clustered.length}")
  }
}
