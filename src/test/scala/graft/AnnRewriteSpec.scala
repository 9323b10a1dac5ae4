package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.search.{Ivf, VectorSearch}
import graft.sources.TableLayout

/** The ANN probe rewrite rule: with the quantizer + nprobe configs set, an
  * exact-looking KNN (`orderBy(cosine desc).limit(k)`) over the persisted
  * IVF index is narrowed to the probed lists at the parquet source —
  * pgvector's index-accelerated ORDER BY, as a Catalyst rule. Off by
  * default; identical to Ivf.search at the same nprobe when on.
  */
class AnnRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: java.nio.file.Path = _
  private var indexPath: String = _
  private var quantPath: String = _
  private val quant = {
    // 4 well-separated centroids on the first axis
    val bases = Seq(0f, 10f, 20f, 30f)
    val dim = 4
    val flat = new Array[Float](bases.length * dim)
    bases.zipWithIndex.foreach { case (b, c) => flat(c * dim) = b }
    Ivf.Quantizer(bases.length, dim, flat)
  }

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    dir = Files.createTempDirectory("ann-rewrite")
    indexPath = s"$dir/index"
    quantPath = s"$dir/quantizer.txt"
    Ivf.save(quant, quantPath)

    val s = spark
    import s.implicits._
    // 40 vectors in 4 clusters around the centroids
    val rows = (0 until 40).map { i =>
      val c = i % 4
      (f"frag$i%02d", Array(c * 10f + (i / 4) * 0.1f, 0.3f, 1f, 0.7f),
        (i / 4) % 2) // metadata column for the filtered-pattern test
    }.toDF("fragment_id", "vector", "grp")
    TableLayout.writePartitionedSorted(Ivf.buildIndex(rows, quant),
      indexPath, "list_id", Seq("fragment_id"))
  }

  override def afterAll(): Unit = {
    spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
    spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
    if (spark != null) spark.stop()
    graft.ingest.TableSwap.rmTreeAt(dir.toString)
  }

  private def knnPlan(qvec: Array[Float], k: Int): DataFrame =
    VectorSearch.knn(spark.read.parquet(indexPath), qvec, k,
      tieBreak = "fragment_id")

  private def partitionFilters(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
  }

  test("off by default: no list pruning, exact top-k over all lists") {
    val qvec = Array(19.9f, 0.3f, 1f, 0.7f)
    val df = knnPlan(qvec, 5)
    assert(!partitionFilters(df).contains("list_id IN"),
      s"rewrite must be config-gated:\n${df.queryExecution.executedPlan}")
    // exact: top-5 all from the cluster around 20
    assert(df.collect().length == 5)
  }

  test("configs on: plan prunes to the probed lists, results = Ivf.search") {
    spark.conf.set(
      org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey, quantPath)
    spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "2")
    try {
      val qvec = Array(19.9f, 0.3f, 1f, 0.7f)
      val df = knnPlan(qvec, 8)
      val pf = partitionFilters(df)
      assert(pf.contains("list_id"),
        s"probed lists must reach PartitionFilters:\n" +
          df.queryExecution.executedPlan)

      val viaRule = df.select(col("fragment_id"), col("similarity"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val viaExplicit = Ivf.search(spark.read.parquet(indexPath), qvec,
        quant, 8, nprobe = 2)
        .select(col("fragment_id"), col("similarity"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(viaRule == viaExplicit)
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
    }
  }

  test("fires from pure SQL — same query text, index-accelerated") {
    // the reference's contract verbatim: the SQL stays an exact-looking
    // ORDER BY similarity LIMIT k (retrieval/search.py:99-124); the
    // planner supplies the index walk
    spark.conf.set(
      org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey, quantPath)
    spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "1")
    try {
      spark.read.parquet(indexPath).createOrReplaceTempView("emb_idx")
      val df = spark.sql(
        """SELECT fragment_id,
          |  vector_cosine(vector,
          |    CAST(array(19.9, 0.3, 1.0, 0.7) AS array<float>)) AS sim
          |FROM emb_idx ORDER BY sim DESC LIMIT 3""".stripMargin)
      assert(partitionFilters(df).contains("list_id"),
        s"SQL path must prune too:\n${df.queryExecution.executedPlan}")
      // nprobe=1 → only the list around 20; top-3 are its closest members
      val got = df.collect().map(_.getString(0)).toSeq
      assert(got.forall(f => f.drop(4).toInt % 4 == 2),
        s"all hits must come from the probed cluster: $got")
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
      spark.catalog.dropTempView("emb_idx")
    }
  }

  test("the verbatim distance-ASC text prunes too; worst-first forms " +
      "never prune") {
    spark.read.parquet(indexPath).createOrReplaceTempView("emb_idx")
    // pgvector's literal serving text: similarity in the SELECT list,
    // ORDER BY the distance expression (not in the SELECT list)
    val distSql =
      """SELECT fragment_id,
        |  1 - vector_cosine_distance(vector,
        |    CAST(array(19.9, 0.3, 1.0, 0.7) AS array<float>)) AS similarity
        |FROM emb_idx
        |ORDER BY vector_cosine_distance(vector,
        |    CAST(array(19.9, 0.3, 1.0, 0.7) AS array<float>)) ASC
        |LIMIT 3""".stripMargin
    // the exact answer FIRST, configs off — the probed cluster holds the
    // true top-3 here, so the pruned run must return it bit-for-bit
    val exact = spark.sql(distSql).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(exact.size == 3)
    spark.conf.set(
      org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey, quantPath)
    spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "1")
    try {
      val dist = spark.sql(distSql)
      assert(partitionFilters(dist).contains("list_id"),
        s"distance-ASC must prune:\n${dist.queryExecution.executedPlan}")
      val got = dist.collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == exact,
        s"pruned distance-ASC must equal its own exact scan (ordering and " +
          s"values): $got vs $exact")
      assert(got.forall { case (f, _) => f.drop(4).toInt % 4 == 2 },
        s"all hits must come from the probed cluster: $got")
      // worst-first spellings must NOT be narrowed to the BEST lists
      val worst = spark.sql(
        """SELECT fragment_id,
          |  vector_cosine(vector,
          |    CAST(array(19.9, 0.3, 1.0, 0.7) AS array<float>)) AS sim
          |FROM emb_idx ORDER BY sim ASC LIMIT 3""".stripMargin)
      assert(partitionFilters(worst).contains("PartitionFilters: []"),
        "cosine ASC (worst-first) must not prune")
      val worstDist = spark.sql(
        """SELECT fragment_id,
          |  vector_cosine_distance(vector,
          |    CAST(array(19.9, 0.3, 1.0, 0.7) AS array<float>)) AS d
          |FROM emb_idx ORDER BY d DESC LIMIT 3""".stripMargin)
      assert(partitionFilters(worstDist).contains("PartitionFilters: []"),
        "distance DESC (worst-first) must not prune")
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
      spark.catalog.dropTempView("emb_idx")
    }
  }

  test("NULLS FIRST keeps the null partition: a NULL-vector row ranks " +
      "first in the pruned scan exactly as in the exact scan") {
    // Spark's ascending default is NULLS FIRST, so the verbatim distance
    // text ranks NULL-distance rows ABOVE every real match; the injected
    // In(list_id, …) alone would silently drop them (In evaluates NULL on
    // the null partition IvfAssign routes null vectors to). The rule must
    // add the IsNull(list_id) disjunct — still pure partition pruning.
    val s = spark
    import s.implicits._
    val rows = (0 until 8).map { i =>
      val c = i % 4
      (f"nfrag$i%02d", Array(c * 10f + (i / 4) * 0.1f, 0.3f, 1f, 0.7f))
    } :+ (("nfragnull", null.asInstanceOf[Array[Float]]))
    val nullsPath = s"$dir/index_nulls"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(rows.toDF("fragment_id", "vector"), quant),
      nullsPath, "list_id", Seq("fragment_id"))
    spark.read.parquet(nullsPath).createOrReplaceTempView("emb_idx_n")
    val sqlText =
      """SELECT fragment_id,
        |  1 - vector_cosine_distance(vector,
        |    CAST(array(19.9, 0.3, 1.0, 0.7) AS array<float>)) AS similarity
        |FROM emb_idx_n
        |ORDER BY vector_cosine_distance(vector,
        |    CAST(array(19.9, 0.3, 1.0, 0.7) AS array<float>)) ASC
        |LIMIT 3""".stripMargin
    def rowsOf(df: DataFrame): Seq[(String, Option[Double])] =
      df.collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    val exact = rowsOf(spark.sql(sqlText)) // configs off
    assert(exact.head == ("nfragnull", None),
      s"fixture sanity: the exact scan must rank the null row first: $exact")
    spark.conf.set(
      org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey, quantPath)
    spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "1")
    try {
      val pruned = spark.sql(sqlText)
      assert(partitionFilters(pruned).contains("list_id"),
        s"must still prune:\n${pruned.queryExecution.executedPlan}")
      assert(rowsOf(pruned) == exact,
        s"pruned NULLS FIRST must keep the null partition: " +
          s"${rowsOf(pruned)} vs $exact")
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
      spark.catalog.dropTempView("emb_idx_n")
    }
  }

  test("filtered pattern (WHERE … ORDER BY sim LIMIT k) prunes AND keeps " +
      "the predicate — results = Ivf.search with the same predicate") {
    // the reference's PRIMARY query shape in SQL form
    // (retrieval/search.py:89-124): metadata predicates ride along and
    // the probe narrowing composes under them — filter-before-rank
    // within probed lists, identical to the explicit filtered API
    spark.conf.set(
      org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey, quantPath)
    spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "2")
    try {
      spark.read.parquet(indexPath).createOrReplaceTempView("emb_idx_f")
      val df = spark.sql(
        """SELECT fragment_id,
          |  vector_cosine(vector,
          |    CAST(array(19.9, 0.3, 1.0, 0.7) AS array<float>)) AS sim
          |FROM emb_idx_f WHERE grp = 1
          |ORDER BY sim DESC, fragment_id LIMIT 5""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(partitionFilters(df).contains("list_id"),
        s"filtered pattern must still prune lists:\n$plan")
      assert(plan.contains("grp"),
        s"user predicate must survive the rewrite:\n$plan")
      val viaRule = df.collect().map(_.getString(0)).toSeq
      val qvec = Array(19.9f, 0.3f, 1f, 0.7f)
      val viaExplicit = Ivf.search(spark.read.parquet(indexPath), qvec,
          quant, 5, nprobe = 2, predicate = Some(col("grp") === 1))
        .select(col("fragment_id")).collect().map(_.getString(0)).toSeq
      assert(viaRule == viaExplicit)
      assert(viaRule.nonEmpty && viaRule.forall(f =>
        (f.drop(4).toInt / 4) % 2 == 1), s"ineligible rows leaked: $viaRule")
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
      spark.catalog.dropTempView("emb_idx_f")
    }
  }

  test("nprobe=1 stays convergent: OptimizeIn's EqualTo still counts as pruned") {
    // the injected In(list_id, [l]) is rewritten to EqualTo by OptimizeIn
    // inside the same fixpoint batch; the guard must recognize it or the
    // rule re-fires every iteration and stacks filters
    spark.conf.set(
      org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey, quantPath)
    spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "1")
    try {
      val df = knnPlan(Array(19.9f, 0.3f, 1f, 0.7f), 5)
      import org.apache.spark.sql.catalyst.plans.logical.Filter
      val probeFilters = df.queryExecution.optimizedPlan.collect {
        case f: Filter if f.condition.references.exists(_.name == "list_id") => f
      }
      assert(probeFilters.size == 1,
        s"expected exactly one probe Filter, got ${probeFilters.size}:\n" +
          df.queryExecution.optimizedPlan)
      assert(df.collect().nonEmpty)
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
    }
  }

  test("Engine.search accelerates transparently over an index table") {
    // the README's user story: same API call, index table + configs in,
    // pgvector-style acceleration out. Full probe (nprobe = k) must equal
    // the exact path bit-for-bit; a partial probe must still fill top-k.
    val s = spark
    import s.implicits._
    val embedder = new graft.embedding.OfflineEmbedder(4)
    val engine = new graft.api.Engine(s, embedder)
    val rows = (0 until 40).map { i =>
      val c = i % 4
      graft.domain.Model.EmbeddingRow(s"d$i", f"frag$i%02d", s"p$i", s"doc$i",
        "text", Some("en"), s"content $i",
        Array(c * 10f + (i / 4) * 0.1f, 0.3f, 1f, 0.7f))
    }
    val idxPath = s"$dir/engine_idx"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(rows.toDF(), quant), idxPath, "list_id",
      Seq("fragment_id"))
    val parents = s.emptyDataset[graft.domain.Model.ParentRow]
    def hits() = engine.search(
      s.read.parquet(idxPath).as[graft.domain.Model.EmbeddingRow], parents,
      "a query", topK = 6, expandContext = false, applySelfQuery = false)

    val exact = hits() // configs off
    spark.conf.set(
      org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey, quantPath)
    try {
      spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "4")
      assert(hits() == exact, "full probe must equal the exact path")
      spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "1")
      assert(hits().size == 6, "partial probe must still fill top-k")
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
    }
  }

  test("plans without a list_id relation are untouched when configs on") {
    spark.conf.set(
      org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey, quantPath)
    spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "2")
    try {
      val s = spark
      import s.implicits._
      val plain = (0 until 10)
        .map(i => (s"f$i", Array(i.toFloat, 0f, 1f, 0f)))
        .toDF("fragment_id", "vector")
      val df = VectorSearch.knn(plain, Array(3f, 0f, 1f, 0f), 3,
        tieBreak = "fragment_id")
      assert(df.collect().length == 3) // no crash, exact path
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
    }
  }

  test("quantizer fingerprint mismatch is a hard error, not silent mis-pruning") {
    // same dim, different centroid geometry: probes computed from THIS
    // quantizer would scan the wrong lists of an index built with `quant`
    val other = Ivf.Quantizer(quant.k, quant.dim,
      quant.centroidsFlat.map(_ + 1.5f))
    val otherPath = s"$dir/quantizer_other.txt"
    Ivf.save(other, otherPath)
    spark.conf.set(
      org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey, otherPath)
    spark.conf.set(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey, "2")
    try {
      val e = intercept[Exception] {
        knnPlan(Array(20.05f, 0.3f, 1f, 0.7f), 3).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("ivf_q_hash mismatch")),
        s"expected the fingerprint guard to fire, got: $e")
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.QuantizerKey)
      spark.conf.unset(org.apache.spark.sql.graft.AnnProbeRewrite.NprobeKey)
    }
  }

}
