package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.RecallStudy
import graft.search.{Ann, Hnsw, Ivf, VectorSearch}

/** Filtered ANN search (VERDICT r8 task #1) — the reference's primary
  * query shape is a FILTERED index scan (`WHERE view/lang … ORDER BY
  * embedding <=> $q LIMIT k`, retrieval/search.py:89-124). Every index
  * family takes a metadata predicate; these are the contracts:
  *
  *  1. **Exactness witnesses carry over**: IVF at full probe, LSH with
  *     all buckets probed, and HNSW at ef ≥ n each equal the exact
  *     filtered KNN — for dense, sparse (1%), and empty predicates.
  *  2. **Filter-before-rank, never after limit**: at ANY probe setting
  *     the result is the true top-k of the eligible rows within the
  *     probed region (no dedupe-after-limit underfill,
  *     review/review-01-04-2238.md:5).
  *  3. **Adaptive probe widening** (Ivf.searchFilteredAdaptive) fills k
  *     under selective predicates by widening on eligible COUNT, and
  *     reports the cost it paid.
  *  4. **Over-fetched post-filter** (VectorSearch.postFilterKnn): filled
  *     ⇒ exact; underfill is detectable (row count < k), never silent.
  *  5. **Serving parity**: ServingIndex.searchFiltered ≡ the
  *     distributed filtered walk at equal ef.
  */
class FilteredAnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val N = 600
  private val Dim = 16
  private lazy val vecs =
    RecallStudy.clusteredVectors(n = N, dim = Dim, nClusters = 5,
      noise = 0.2, seed = 7L)
  private lazy val query =
    RecallStudy.clusteredVectors(n = 1, dim = Dim, nClusters = 5,
      noise = 0.2, seed = 31L).head

  /** (fragment_id, vector, grp) — grp = id % 100, so predicates of
    * selectivity 1/m are `grp % m == 0`-style equality sets.
    */
  private lazy val table: DataFrame = {
    val s = spark
    import s.implicits._
    vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v, (i % 100).toLong) }
      .toSeq.toDF("fragment_id", "vector", "grp")
  }

  /** Exact filtered top-k under the canonical cosine, ties by id. */
  private def exactFiltered(pred: Long => Boolean, k: Int): Seq[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    vecs.zipWithIndex.filter { case (_, i) => pred(i.toLong) }
      .map { case (v, i) => (-cos(query, v), i.toLong) }
      .sorted.take(k).map(_._2)
  }

  private def ids(df: DataFrame): Seq[Long] = {
    val s = spark
    import s.implicits._
    df.select(col("fragment_id").cast("long")).as[Long].collect().toSeq
  }

  // predicates: dense (50%), sparse (1%), empty
  private val dense = col("grp") % 2 === 0
  private val denseF = (i: Long) => i % 2 == 0
  private val sparse = col("grp") === 42
  private val sparseF = (i: Long) => i % 100 == 42
  private val empty = col("grp") === -1

  test("IVF full probe with predicate equals exact filtered KNN") {
    val s = spark
    import s.implicits._
    val sample = table.orderBy(col("fragment_id")).limit(512)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val q = Ivf.train(sample, 8)
    val index = Ivf.buildIndex(table, q)
    assert(ids(Ivf.search(index, query, q, 10, nprobe = q.k,
      predicate = Some(dense))) == exactFiltered(denseF, 10))
    assert(ids(Ivf.search(index, query, q, 10, nprobe = q.k,
      predicate = Some(sparse))) == exactFiltered(sparseF, 10))
    // 1% of 600 = 6 eligible < k: fills with ALL of them, no more
    assert(exactFiltered(sparseF, 10).size == 6)
    assert(ids(Ivf.search(index, query, q, 10, nprobe = q.k,
      predicate = Some(empty))).isEmpty)
  }

  test("IVF partial probe: filter-before-rank within probed lists") {
    val s = spark
    import s.implicits._
    val sample = table.orderBy(col("fragment_id")).limit(512)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val q = Ivf.train(sample, 8)
    val index = Ivf.buildIndex(table, q)
    val lists = Ivf.nearestLists(query, q, 2)
    // the filtered probe must equal exact KNN over (probed ∩ eligible) —
    // i.e. the predicate applied BEFORE the top-k, not after it
    val probedEligible = index
      .filter(col("list_id").isin(lists: _*)).filter(dense)
    val want = ids(VectorSearch.knn(probedEligible, query, 10))
    val got = ids(Ivf.search(index, query, q, 10, nprobe = 2,
      predicate = Some(dense)))
    assert(got == want)
  }

  test("IVF adaptive widening fills k under a sparse predicate") {
    val s = spark
    import s.implicits._
    val sample = table.orderBy(col("fragment_id")).limit(512)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val q = Ivf.train(sample, 8)
    val index = Ivf.buildIndex(table, q)
    val a = Ivf.searchFilteredAdaptive(index, query, q, topK = 4,
      predicate = sparse, nprobe = 1, fillFactor = 1)
    assert(a.eligibleCandidates >= 4 || a.nprobeUsed == q.k)
    assert(ids(a.hits).size == 4)
    // widened-to-total ⇒ exact; otherwise still the true top-4 of the
    // probed eligible set
    if (a.nprobeUsed == q.k)
      assert(ids(a.hits) == exactFiltered(sparseF, 4))
    // empty predicate: widens to all lists, returns nothing — honestly
    val e = Ivf.searchFilteredAdaptive(index, query, q, topK = 4,
      predicate = empty, nprobe = 1)
    assert(e.nprobeUsed == q.k && e.eligibleCandidates == 0L &&
      ids(e.hits).isEmpty)
  }

  test("adaptive widening on a MULTI-ASSIGNED index dedupes candidates " +
      "and fill-counts distinct fragments") {
    val s = spark
    import s.implicits._
    val sample = table.orderBy(col("fragment_id")).limit(512)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val q = Ivf.train(sample, 8).copy(replicas = 2)
    val index = Ivf.buildIndexMultiAssign(table, q, replicas = 2)
    val a = Ivf.searchFilteredAdaptive(index, query, q, topK = 10,
      predicate = dense, nprobe = 1, fillFactor = 1)
    val got = ids(a.hits)
    assert(got.distinct == got, "replicated index returned duplicate ids")
    assert(got.forall(denseF), "ineligible row leaked through")
    assert(got.size == 10)
    // eligible count must be DISTINCT fragments, never replica rows:
    // full probe of a 2-replica index holds 2x rows but N/2 eligible docs
    val full = Ivf.searchFilteredAdaptive(index, query, q, topK = 10,
      predicate = dense, nprobe = q.k)
    assert(full.eligibleCandidates == N / 2,
      s"eligible=${full.eligibleCandidates} counted replicas, not docs")
    assert(ids(full.hits) == exactFiltered(denseF, 10))
  }

  test("LSH all-buckets probe with predicate equals exact filtered KNN") {
    val planes = Ann.makePlanes(Dim, numPlanes = 4)
    val index = Ann.buildIndex(table, planes)
    // depth 2 on 4 planes covers 1+4+6 of 16 buckets; for the witness
    // probe EVERYTHING by filtering on the full bucket range
    val all = index // no bucket restriction = every bucket probed
    val got = ids(VectorSearch.knn(all.filter(dense), query, 10))
    assert(got == exactFiltered(denseF, 10))
    // and the probed path at depth 1 is filter-before-rank
    val qb = Ann.bucketOf(query, planes)
    val buckets = Ann.probeBuckets(qb, planes, 1)
    val probedEligible = index
      .filter(col("bucket").isin(buckets: _*)).filter(sparse)
    assert(ids(Ann.search(index, query, planes, 10, probeDepth = 1,
        predicate = Some(sparse))) ==
      ids(VectorSearch.knn(probedEligible, query, 10)))
  }

  test("PQ/SQ/IVFPQ filtered compressed scans: eligibility before the " +
      "ADC shortlist; full shortlist equals exact filtered KNN") {
    val s = spark
    import s.implicits._
    val sample = table.orderBy(col("fragment_id")).limit(512)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val cb = graft.search.Pq.train(sample, m = 4, ksub = 16)
    val index = graft.search.Pq.encode(table, cb)
    // full shortlist ⇒ exact filtered KNN (witness), dense and sparse
    val full = graft.search.Pq.searchCosine(index, query, cb, 10,
      shortlist = N, tieBreak = "fragment_id", predicate = Some(dense))
    assert(ids(full) == exactFiltered(denseF, 10))
    val sparseFull = graft.search.Pq.searchCosine(index, query, cb, 10,
      shortlist = N, tieBreak = "fragment_id", predicate = Some(sparse))
    assert(ids(sparseFull) == exactFiltered(sparseF, 6))
    // tight shortlist on a sparse predicate still fills from ELIGIBLE
    // rows only (filter-before-shortlist, never post-filter underfill):
    // 6 eligible exist, shortlist 10 ≥ 6 ⇒ all 6 back, exact order
    val tight = graft.search.Pq.searchCosine(index, query, cb, 10,
      shortlist = 10, tieBreak = "fragment_id", predicate = Some(sparse))
    assert(ids(tight) == exactFiltered(sparseF, 6))
    // IVFPQ: full probe + full shortlist ⇒ exact filtered
    val q = Ivf.train(sample, 8)
    val ivfpq = graft.search.Pq.encode(Ivf.buildIndex(table, q), cb)
    val got = graft.search.Pq.searchIvfPq(ivfpq, query, q, cb, 10,
      nprobe = q.k, shortlist = N, tieBreak = "fragment_id",
      predicate = Some(dense))
    assert(ids(got) == exactFiltered(denseF, 10))
    // on a MULTI-ASSIGNED index the semi-join keeps every replica row of
    // a shortlisted id — the dedupe derived from quantizer.replicas must
    // collapse them (caught by driving the pq-search CLI against a
    // replicated index)
    val q2 = q.copy(replicas = 2)
    val ivfpq2 = graft.search.Pq.encode(
      Ivf.buildIndexMultiAssign(table, q2, replicas = 2), cb)
    val got2 = graft.search.Pq.searchIvfPq(ivfpq2, query, q2, cb, 10,
      nprobe = q2.k, shortlist = N, tieBreak = "fragment_id",
      predicate = Some(dense))
    assert(ids(got2) == exactFiltered(denseF, 10),
      "replicated IVFPQ diverged (duplicate rows?)")
  }

  test("HNSW filtered walk at ef >= n equals exact filtered KNN") {
    val adj = Hnsw.buildIndexTable(
      table.select(format_string("f%06d", col("fragment_id"))
        .as("fragment_id"), col("vector")), numShards = 3)
    val meta = table.select(
      format_string("f%06d", col("fragment_id")).as("__fid"),
      col("grp").as("__grp"))
    def run(pred: org.apache.spark.sql.Column): Seq[Long] = {
      val s = spark
      import s.implicits._
      Hnsw.searchIndex(adj.join(meta, col("fragment_id") === col("__fid"),
          "left"), Seq(("q", query)), 10, ef = N, predicate = Some(pred))
        .orderBy(col("rank"))
        .select(col("fragment_id")).as[String].collect()
        .map(_.stripPrefix("f").toLong).toSeq
    }
    // HNSW ranks by normalized-dot (same order as cosine); compare SETS
    // plus ORDER via the canonical exact list
    assert(run(col("__grp") % 2 === 0) == exactFiltered(denseF, 10))
    assert(run(col("__grp") === 42) == exactFiltered(sparseF, 6))
    assert(run(col("__grp") === -1).isEmpty)
  }

  test("HNSW filtered walk at moderate ef fills k on a dense predicate") {
    val g = Hnsw.build(
      vecs.zipWithIndex.map { case (v, i) => (f"f$i%06d", v) }.toSeq,
      m = 16, efConstruction = 64)
    val hits = g.searchFiltered(query, 10, ef = 32,
      id => id.stripPrefix("f").toLong % 2 == 0)
    assert(hits.length == 10)
    assert(hits.forall { case (id, _) => id.stripPrefix("f").toLong % 2 == 0 })
    // recall against exact filtered: the result-side filter keeps
    // widening until ef eligible found, so recall stays high
    val exact = exactFiltered(denseF, 10).toSet
    val rec = hits.count { case (id, _) =>
      exact(id.stripPrefix("f").toLong) }.toDouble / 10
    assert(rec >= 0.8, s"filtered recall $rec")
  }

  test("ServingIndex.searchFiltered equals the distributed filtered walk") {
    val s = spark
    import s.implicits._
    val adj = Hnsw.buildIndexTable(
      table.select(format_string("f%06d", col("fragment_id"))
        .as("fragment_id"), col("vector")), numShards = 3)
    val serving = Hnsw.restoreServing(adj)
    val allow = (id: String) => id.stripPrefix("f").toLong % 2 == 0
    val meta = table.select(
      format_string("f%06d", col("fragment_id")).as("__fid"),
      col("grp").as("__grp"))
    for (ef <- Seq(16, 48, N)) {
      val local = serving.searchFiltered(query, 10, ef, allow)
        .map { case (id, sim) => (id, sim) }.toSeq
      val dist = Hnsw.searchIndex(adj.join(meta,
          col("fragment_id") === col("__fid"), "left"),
          Seq(("q", query)), 10, ef,
          predicate = Some(col("__grp") % 2 === 0))
        .orderBy(col("rank"))
        .select(col("fragment_id"), col("similarity"))
        .as[(String, Double)].collect().toSeq
      assert(local == dist, s"ef=$ef")
    }
  }

  test("postFilterKnn: filled => exact; underfill detectable, not silent") {
    // dense predicate, generous over-fetch: fills and is exact
    val filled = ids(VectorSearch.postFilterKnn(table, query, 10, dense,
      overFetch = 8))
    assert(filled == exactFiltered(denseF, 10))
    // sparse predicate (6 of 600 eligible), tight over-fetch: the top-20
    // unfiltered rows rarely hold 10 eligible — the result underfills
    // VISIBLY (fewer rows), never pads with wrong rows
    val tight = VectorSearch.postFilterKnn(table, query, 10, sparse,
      overFetch = 2)
    val got = ids(tight)
    assert(got.size < 10) // only 6 eligible exist — underfill guaranteed
    // the rows that DO come back are the true best eligible, in order:
    // eligible rows inside the unfiltered top-k' all outrank every
    // eligible row outside it
    assert(got == exactFiltered(sparseF, 6).take(got.size))
  }
}
