package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.search.{Pq, VectorSearch}

/** Product-quantization invariants: deterministic encode with in-range
  * codes, the per-point-codebook exactness witness (ADC dot IEEE-equal to
  * the exact dot), and full-shortlist re-rank recovering the exact KNN on
  * real testdata.
  */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def vectors(n: Int): Array[Array[Float]] = {
    // deterministic pseudo-random vectors (seeded, no wall clock)
    val rnd = new scala.util.Random(42)
    Array.fill(n)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
  }

  test("encode is deterministic and codes stay in [0, ksub)") {
    val s = spark
    import s.implicits._
    val sample = vectors(64)
    val cb = Pq.train(sample, m = 4, ksub = 8)
    assert(cb.dsub == 4 && cb.flat.length == 4 * 8 * 4)
    val df = sample.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "vector")
    val once = Pq.encode(df, cb).select("pq_code")
      .as[Array[Byte]].collect()
    val twice = Pq.encode(df, cb).select("pq_code")
      .as[Array[Byte]].collect()
    assert(once.map(_.toSeq).toSeq == twice.map(_.toSeq).toSeq)
    // one byte per subspace — the compression claim is structural
    assert(once.forall(c => c.length == 4 &&
      c.forall(x => (x & 0xFF) >= 0 && (x & 0xFF) < 8)))
  }

  test("per-point codebook: ADC dot equals the subspace-blocked dot exactly") {
    val s = spark
    import s.implicits._
    val sample = vectors(32)
    // ksub = sample size ⇒ every vector is its own codeword: quantization
    // error is zero, so the ADC total must equal the blocked dot (sequential
    // within each subspace, subspaces summed in order) BIT-FOR-BIT — for
    // every vector, independent of the seed. (The flat left-to-right dot
    // may differ in final ulps: FP addition is not associative, which is
    // why ADC is a ranking device and searches re-rank exactly.)
    val cb = Pq.train(sample, m = 4, ksub = 32)
    val query = sample(7)
    def blockedDot(v: Array[Float]): Double = {
      var total = 0.0
      for (j <- 0 until cb.m) {
        var acc = 0.0
        for (i <- 0 until cb.dsub) {
          val idx = j * cb.dsub + i
          val qi = if (idx < query.length) query(idx).toDouble else 0.0
          val vi = if (idx < v.length) v(idx).toDouble else 0.0
          acc += qi * vi
        }
        total += acc
      }
      total
    }
    val df = sample.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "vector")
    val got = Pq.encode(df, cb)
      .withColumn("adc_dot",
        org.apache.spark.sql.graft.VectorExpressions.pqAdc(
          col("pq_code"), Pq.lutDot(query, cb), cb.ksub))
      .select("vec_id", "adc_dot")
      .as[(Long, Double)].collect()
    got.foreach { case (id, adc) =>
      assert(adc == blockedDot(sample(id.toInt)),
        s"vec $id: adc=$adc blocked=${blockedDot(sample(id.toInt))}")
    }
  }

  test("pq_adc rejects codes from a mismatched codebook") {
    val s = spark
    import s.implicits._
    val sample = vectors(32)
    val cb = Pq.train(sample, m = 4, ksub = 8)
    val df = sample.take(4).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq.toDF("vec_id", "vector")
    val encoded = Pq.encode(df, cb)
    // lut sized for a DIFFERENT shape (m=2) must fail loudly, not misread
    val wrongLut = new Array[Double](2 * cb.ksub)
    val ex = intercept[Exception] {
      encoded.withColumn("bad",
        org.apache.spark.sql.graft.VectorExpressions.pqAdc(
          col("pq_code"), wrongLut, cb.ksub)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("codebook save/load round-trips exactly") {
    val cb = Pq.train(vectors(64), m = 4, ksub = 8)
    val path = java.nio.file.Files.createTempFile("pq", ".txt").toString
    Pq.save(cb, path)
    val loaded = Pq.load(path)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
    assert(loaded.m == cb.m && loaded.ksub == cb.ksub && loaded.dsub == cb.dsub)
    assert(loaded.flat.toSeq == cb.flat.toSeq)
    // the fingerprint survives the round-trip (pq-search's torn-rewrite
    // guard compares the index's stamped hash against the loaded sidecar)
    assert(Pq.contentHash(loaded) == Pq.contentHash(cb))
  }

  test("contentHash distinguishes same-shape codebooks; encode stamps it") {
    val s = spark
    import s.implicits._
    val cb1 = Pq.train(vectors(64), m = 4, ksub = 8)
    // same m/ksub/dsub, different training data → different fingerprint
    val rnd = new scala.util.Random(7)
    val other = Array.fill(64)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val cb2 = Pq.train(other, m = 4, ksub = 8)
    assert(cb1.m == cb2.m && cb1.ksub == cb2.ksub && cb1.dsub == cb2.dsub)
    assert(Pq.contentHash(cb1) != Pq.contentHash(cb2))
    val df = vectors(8).zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "vector")
    val stamped = Pq.encode(df, cb1)
      .select("pq_cb_hash").distinct().as[Long].collect()
    assert(stamped.toSeq == Seq(Pq.contentHash(cb1)))
  }

  test("ivfpq: full probe + full shortlist degenerates to the exact KNN") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val sample = e.orderBy(col("vec_id")).limit(256)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val ivfQ = graft.search.Ivf.train(sample, k = 8)
    val cb = Pq.train(sample, m = 8, ksub = 16)
    val index = Pq.encode(graft.search.Ivf.buildIndex(e, ivfQ), cb)
    val query = e.filter(col("vec_id") === 3)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val n = e.count().toInt
    val exact = VectorSearch.knn(e, query, 10,
        vectorCol = "vector", tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    val ivfpq = Pq.searchIvfPq(index, query, ivfQ, cb, 10,
        nprobe = ivfQ.k, shortlist = n, tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(ivfpq == exact)
    // pruned probe scans fewer rows but still finds hits
    val pruned = Pq.searchIvfPq(index, query, ivfQ, cb, 10,
        nprobe = 2, shortlist = 50, tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(pruned.nonEmpty && pruned.toSet.subsetOf(
      index.select("vec_id").as[Long].collect().toSet))
  }

  test("residual ivfpq: full probe + full shortlist degenerates to exact") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val sample = e.orderBy(col("vec_id")).limit(256)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val ivfQ = graft.search.Ivf.train(sample, k = 8)
    val cb = Pq.trainResidual(sample, ivfQ, m = 8, ksub = 16)
    val index = Pq.encodeResidual(
      graft.search.Ivf.buildIndex(e, ivfQ), ivfQ, cb)
    val query = e.filter(col("vec_id") === 3)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val n = e.count().toInt
    val exact = VectorSearch.knn(e, query, 10,
        vectorCol = "vector", tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    val res = Pq.searchIvfPqResidual(index, query, ivfQ, cb, 10,
        nprobe = ivfQ.k, shortlist = n, tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(res == exact)
  }

  test("residual codes: ADC of a zero-residual row reconstructs the centroid") {
    // a vector that IS its centroid has residual 0; if the residual
    // codebook contains the zero codeword (it does when the sample holds
    // any exact-centroid point), the reconstructed vector equals the
    // centroid and the residual ADC cosine equals the exact cosine
    val s = spark
    import s.implicits._
    val base = vectors(32)
    val ivfQ = graft.search.Ivf.train(base, k = 4)
    // sample = the centroids themselves → residuals are exactly zero and
    // per-subspace k-means puts a zero codeword in every subspace
    val centSample = (0 until ivfQ.k).map(ivfQ.centroid).toArray
    val cb = Pq.trainResidual(centSample, ivfQ, m = 4, ksub = 4)
    val df = (0 until ivfQ.k).map(c => (c.toLong, ivfQ.centroid(c).toSeq))
      .toDF("vec_id", "vector")
    val index = Pq.encodeResidual(
      graft.search.Ivf.buildIndex(df, ivfQ), ivfQ, cb)
    val q = ivfQ.centroid(1)
    val scored = index.withColumn("s", Pq.residualAdcCosine(
        col("pq_code"), col("list_id"), q, ivfQ, cb, 0 until ivfQ.k))
      .orderBy(col("s").desc, col("vec_id"))
      .select(col("vec_id"), col("s")).as[(Long, Double)].collect()
    // the query centroid itself must score ~1.0 and rank first
    assert(scored.head._1 == 1L, scored.mkString(","))
    assert(math.abs(scored.head._2 - 1.0) < 1e-9, scored.head.toString)
  }

  test("residual shortlists beat plain on average at equal budget") {
    // the property the encoding exists for, on the real testdata corpus:
    // MEAN ADC-only hit@10 (no re-rank — pure shortlist quality) of
    // residual codes >= plain codes at identical m, ksub, probed lists,
    // averaged over 8 queries. Per-query the comparison is a coin flip
    // at top-10 granularity (measured: one query scores plain 5 vs
    // residual 3 while the 8-query means are 3.125 vs 3.375) — the
    // claim is distributional, so the assertion aggregates.
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val sample = e.orderBy(col("vec_id")).limit(256)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val ivfQ = graft.search.Ivf.train(sample, k = 8)
    val cbPlain = Pq.train(sample, m = 8, ksub = 16)
    val cbRes = Pq.trainResidual(sample, ivfQ, m = 8, ksub = 16)
    val base = graft.search.Ivf.buildIndex(e, ivfQ).cache()
    val plainIdx = Pq.encode(base, cbPlain).cache()
    val resIdx = Pq.encodeResidual(base, ivfQ, cbRes).cache()
    val queries = e.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    def top10(df: org.apache.spark.sql.DataFrame,
        score: org.apache.spark.sql.Column): Set[Long] =
      df.withColumn("s", score).orderBy(col("s").desc, col("vec_id"))
        .limit(10).select("vec_id").as[Long].collect().toSet
    var plainHits = 0
    var resHits = 0
    queries.foreach { query =>
      val exact = VectorSearch.knn(e, query, 10,
          vectorCol = "vector", tieBreak = "vec_id")
        .select("vec_id").as[Long].collect().toSet
      val lists = graft.search.Ivf.nearestLists(query, ivfQ, ivfQ.k)
      plainHits += top10(plainIdx,
        Pq.adcCosine(col("pq_code"), query, cbPlain))
        .intersect(exact).size
      resHits += top10(resIdx, Pq.residualAdcCosine(
        col("pq_code"), col("list_id"), query, ivfQ, cbRes, lists))
        .intersect(exact).size
    }
    base.unpersist(); plainIdx.unpersist(); resIdx.unpersist()
    assert(resHits >= plainHits,
      s"mean residual ADC hit@10 ${resHits / 8.0} < plain " +
        s"${plainHits / 8.0} — residual codes must not shortlist worse " +
        "in aggregate at equal bytes")
  }

  test("full-shortlist re-rank recovers the exact KNN on real embeddings") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val sample = e.orderBy(col("vec_id")).limit(256)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val cb = Pq.train(sample, m = 8, ksub = 16)
    val index = Pq.encode(e, cb)
    val query = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val n = e.count().toInt
    val exact = VectorSearch.knn(e, query, 10,
        vectorCol = "vector", tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    val pq = Pq.searchCosine(index, query, cb, 10,
        shortlist = n, tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(pq == exact)
    // and the compressed representation really is small
    assert(cb.m == 8 && e.head().getAs[scala.collection.Seq[Float]]("vector").length == cb.dim)
  }
}
