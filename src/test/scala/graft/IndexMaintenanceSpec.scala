package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.search.{IndexMaintenance, Ivf}
import graft.sources.TableLayout

/** Incremental ANN index maintenance: an update with a frozen quantizer
  * must land exactly where a full rebuild would, while touching only the
  * affected list partitions (untouched partition files stay byte-named
  * identical — the 100 TB property: absorbing a delta batch costs
  * O(delta), not O(corpus)).
  */
class IndexMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("idx-maint")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.ingest.TableSwap.rmTreeAt(dir.toString)
  }

  /** Deterministic fake embedding rows: doc -> fragments with 4-d vectors
    * clustered by the doc's numeric suffix so different docs land in
    * different IVF lists.
    */
  private def rows(docs: Seq[(String, Int, Float)]): DataFrame = {
    val s = spark
    import s.implicits._
    docs.flatMap { case (doc, nFrags, base) =>
      (0 until nFrags).map { i =>
        (doc, s"$doc-f$i", Array(base + i * 0.01f, base, 1.0f, 0.5f))
      }
    }.toDF("document_id", "fragment_id", "vector")
  }

  /** Quantizer with one known centroid per base value — assignment is then
    * exactly nearest-base, so the spec controls which doc lands in which
    * list (training determinism is covered by AnnStreamingMediaSpec).
    */
  private def quant(bases: Float*): Ivf.Quantizer = {
    val dim = 4
    val flat = new Array[Float](bases.length * dim)
    bases.zipWithIndex.foreach { case (b, c) =>
      flat(c * dim) = b; flat(c * dim + 1) = b
      flat(c * dim + 2) = 1f; flat(c * dim + 3) = 0.5f
    }
    Ivf.Quantizer(bases.length, dim, flat)
  }

  private def asSet(df: DataFrame): Set[(String, String, Int)] =
    df.select(col("document_id"), col("fragment_id"), col("list_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("incremental update equals full rebuild; untouched lists not rewritten") {
    val base = rows(Seq(("a", 3, 0f), ("b", 2, 10f), ("c", 2, 20f)))
    val q = quant(0f, 10f, 20f)
    val path = s"$dir/ivf_base"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(base, q), path, "list_id", Seq("fragment_id"))

    // record the untouched list's file names: doc c's cluster must survive
    // the update byte-for-byte (nothing reads or rewrites it)
    val cList = Ivf.buildIndex(rows(Seq(("c", 1, 20f))), q)
      .select(col("list_id")).head().getInt(0)
    def filesOf(list: Int): Set[String] = {
      val p = Paths.get(path, s"list_id=$list")
      import scala.jdk.CollectionConverters._
      Files.list(p).iterator().asScala.map(_.getFileName.toString).toSet
    }
    val cFilesBefore = filesOf(cList)

    // replace doc a (different vectors => possibly different lists) and
    // add a brand-new doc d in a cluster of its own
    val delta = rows(Seq(("a", 2, 10.5f), ("d", 2, 0.2f)))
    val st = IndexMaintenance.updateIndex(
      spark, path, delta, Ivf.buildIndex(_, q))
    assert(st.incomingRows == 4)
    assert(!st.affectedLists.contains(cList),
      "doc c's list must not be touched by an a/d update")
    assert(filesOf(cList) == cFilesBefore,
      "untouched partition files must be byte-named identical")

    // ground truth: full rebuild of the merged corpus with the same quantizer
    val merged = rows(Seq(("b", 2, 10f), ("c", 2, 20f),
      ("a", 2, 10.5f), ("d", 2, 0.2f)))
    val expected = asSet(Ivf.buildIndex(merged, q))
    assert(asSet(spark.read.parquet(path)) == expected)
  }

  test("update that empties a list leaves a readable index") {
    val base = rows(Seq(("a", 2, 0f), ("b", 2, 30f)))
    val q = quant(0f, 30f)
    val path = s"$dir/ivf_empty"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(base, q), path, "list_id", Seq("fragment_id"))

    // move doc a into doc b's cluster: a's old list becomes empty
    val st = IndexMaintenance.updateIndex(
      spark, path, rows(Seq(("a", 1, 30.5f))), Ivf.buildIndex(_, q))
    assert(st.affectedLists.size == 2)
    val after = spark.read.parquet(path)
    assert(after.count() == 3)
    assert(after.select(col("list_id")).distinct().count() == 1)
  }

  test("idempotent: re-running the same update batch is a no-op on content") {
    val base = rows(Seq(("a", 2, 0f), ("b", 2, 30f)))
    val q = quant(0f, 30f)
    val path = s"$dir/ivf_idem"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(base, q), path, "list_id", Seq("fragment_id"))
    val delta = rows(Seq(("a", 3, 0.3f)))
    IndexMaintenance.updateIndex(spark, path, delta, Ivf.buildIndex(_, q))
    val first = asSet(spark.read.parquet(path))
    IndexMaintenance.updateIndex(spark, path, delta, Ivf.buildIndex(_, q))
    assert(asSet(spark.read.parquet(path)) == first)
  }

  test("IVFPQ composition: update re-encodes with the frozen codebook") {
    val s = spark
    import s.implicits._
    val base = rows(Seq(("a", 2, 0f), ("b", 3, 10f), ("c", 2, 20f)))
    val q = quant(0f, 10f, 20f)
    val cb = graft.search.Pq.train(
      base.orderBy(col("fragment_id")).select(col("vector"))
        .as[Seq[Float]].collect().map(_.toArray), m = 2, ksub = 4)
    def enc(df: DataFrame): DataFrame =
      graft.search.Pq.encode(Ivf.buildIndex(df, q), cb)
    val path = s"$dir/ivfpq"
    TableLayout.writePartitionedSorted(enc(base), path,
      "list_id", Seq("fragment_id"))

    val delta = rows(Seq(("a", 2, 20.3f), ("e", 1, 10.2f)))
    IndexMaintenance.updateIndex(spark, path, delta, enc)

    def full(df: DataFrame): Set[(String, Int, Seq[Byte], Long)] =
      df.select(col("fragment_id"), col("list_id"), col("pq_code"),
          col("pq_cb_hash"))
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getAs[Array[Byte]](2).toSeq, r.getLong(3))).toSet
    val merged = rows(Seq(("b", 3, 10f), ("c", 2, 20f),
      ("a", 2, 20.3f), ("e", 1, 10.2f)))
    assert(full(spark.read.parquet(path)) == full(enc(merged)))
  }

  test("pure deletion: dropDocs with an empty batch removes the document") {
    val s = spark
    import s.implicits._
    val base = rows(Seq(("a", 2, 0f), ("b", 2, 30f)))
    val q = quant(0f, 30f)
    val path = s"$dir/ivf_drop"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(base, q), path, "list_id", Seq("fragment_id"))

    val empty = Seq.empty[(String, String, Array[Float])]
      .toDF("document_id", "fragment_id", "vector")
    val st = IndexMaintenance.updateIndex(spark, path, empty,
      Ivf.buildIndex(_, q), dropDocs = Seq("a"))
    assert(st.incomingRows == 0)
    assert(asSet(spark.read.parquet(path)) ==
      asSet(Ivf.buildIndex(rows(Seq(("b", 2, 30f))), q)))
  }

  test("randomized update sequences always equal a full rebuild") {
    val q = quant(0f, 10f, 20f, 30f)
    val path = s"$dir/ivf_rand"
    val rnd = new scala.util.Random(42)
    def randDocs(names: Seq[String]): Seq[(String, Int, Float)] =
      names.map(n => (n, 1 + rnd.nextInt(3),
        rnd.nextInt(4) * 10f + rnd.nextFloat()))

    var corpus = Map.empty[String, (String, Int, Float)] ++
      randDocs(Seq("a", "b", "c")).map(d => d._1 -> d).toMap
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(rows(corpus.values.toSeq), q), path,
      "list_id", Seq("fragment_id"))

    for (step <- 1 to 5) {
      // each step replaces a random existing doc and adds a new one
      val replaced = corpus.keys.toSeq.sorted(Ordering.String)
        .apply(rnd.nextInt(corpus.size))
      val delta = randDocs(Seq(replaced, s"n$step"))
      corpus = corpus ++ delta.map(d => d._1 -> d).toMap
      IndexMaintenance.updateIndex(
        spark, path, rows(delta), Ivf.buildIndex(_, q))
      val expected = asSet(Ivf.buildIndex(rows(corpus.values.toSeq), q))
      assert(asSet(spark.read.parquet(path)) == expected,
        s"divergence after step $step")
    }
  }

  test("manifest recovery finishes a multi-list update interrupted mid-loop") {
    val s = spark
    val base = rows(Seq(("a", 1, 0f), ("b", 1, 30f)))
    val q = quant(0f, 30f)
    val path = s"$dir/ivf_tear"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(base, q), path, "list_id", Seq("fragment_id"))

    // doc a gets new vectors in BOTH lists; build the staged update by
    // hand to freeze a crash where list 0 swapped but list 1 did not
    import s.implicits._
    val delta = Seq(
      ("a", "a-f0", Array(0.5f, 0.5f, 1.0f, 0.5f)),
      ("a", "a-f1", Array(30.5f, 30.5f, 1.0f, 0.5f))
    ).toDF("document_id", "fragment_id", "vector")
    val merged = rows(Seq(("b", 1, 30f))).union(delta)
    val staged = Ivf.buildIndex(merged, q)
    val staging = s"$path.update-staging"
    staged.write.partitionBy("list_id").parquet(staging)
    Files.writeString(Paths.get(s"$path.update-manifest"), "0\n1")
    // "crash state": list 0's swap completed (live dir replaced), list 1
    // never started (staged dir still in the staging table)
    graft.ingest.TableSwap.rmTreeAt(s"$path/list_id=0")
    Files.move(Paths.get(staging, "list_id=0"), Paths.get(s"$path/list_id=0"))

    val actions = IndexMaintenance.recover(path)
    assert(actions.exists(_.contains("rolled forward")), actions.toString)
    assert(!Files.exists(Paths.get(s"$path.update-manifest")))
    assert(!Files.exists(Paths.get(staging)))
    assert(asSet(spark.read.parquet(path)) == asSet(staged),
      "both lists must hold the updated contents after forward recovery")
  }

  test("manifest recovery completes a swap caught between stage and move") {
    val s = spark
    val base = rows(Seq(("a", 2, 0f)))
    val q = quant(0f)
    val path = s"$dir/ivf_midswap"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(base, q), path, "list_id", Seq("fragment_id"))

    // crash state 1 of TableSwap.swap: staged data moved to the
    // partition's .staging, live still holds the OLD rows. Without the
    // manifest this state rolls BACK (staging dropped); with it, the
    // staged write is known complete and recovery must roll FORWARD.
    val newRows = Ivf.buildIndex(rows(Seq(("a", 1, 0.7f))), q)
    // partition files never contain the partition column — the dir does
    newRows.drop("list_id").write.parquet(s"$path/list_id=0.staging")
    Files.writeString(Paths.get(s"$path.update-manifest"), "0")

    IndexMaintenance.recover(path)
    assert(asSet(spark.read.parquet(path)) == asSet(newRows),
      "live partition must hold the staged rows after forward recovery")
    assert(!Files.exists(Paths.get(s"$path/list_id=0.staging")))
  }

  test("recover heals a torn partition swap (live moved aside, crash)") {
    val base = rows(Seq(("a", 2, 0f), ("b", 2, 30f)))
    val q = quant(0f, 30f)
    val path = s"$dir/ivf_recover"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(base, q), path, "list_id", Seq("fragment_id"))
    val before = asSet(spark.read.parquet(path))
    val list = before.head._3

    // simulate the crash window between "live -> .old" and "staging ->
    // live": the partition exists only as .old — recovery must roll back
    Files.move(Paths.get(path, s"list_id=$list"),
      Paths.get(path, s"list_id=$list.old"))
    val actions = IndexMaintenance.recover(path)
    assert(actions.nonEmpty)
    assert(asSet(spark.read.parquet(path)) == before)
  }

  test("streaming re-ingest maintains the index ≡ batch, through a mid-stream crash") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.embedding.OfflineEmbedder
    import graft.ingest.IngestPipeline
    import graft.ingest.IngestPipeline.DocInput
    import graft.streaming.EventStreams
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val embedder = new OfflineEmbedder(8)
    def doc(path: String, marker: String) = DocInput(path,
      s"$marker paragraph with enough characters to form a fragment.", isOcr = false)
    def embOf(docs: DocInput*) = IngestPipeline.embeddings(
      IngestPipeline.fragments(IngestPipeline.process(docs.toSeq.toDS())),
      embedder).toDF()

    // initial corpus + index (batch-built; the stream maintains, never
    // bootstraps)
    val initial = embOf(doc("s/a.txt", "alpha"), doc("s/b.txt", "bravo"))
    val sample = initial.select("vector").collect()
      .map(_.getSeq[Float](0).toArray)
    val q = Ivf.train(sample, k = 2)
    val path = s"$dir/idx_stream"
    TableLayout.writePartitionedSorted(Ivf.buildIndex(initial, q),
      path, "list_id", Seq("fragment_id"))

    val mem = MemoryStream[DocInput]
    val query = EventStreams.ingestIndexStream(mem.toDS(), path, embedder,
      Ivf.buildIndex(_, q), s"$dir/idx_stream_ckpt")
    try {
      // micro-batch 1: replace a
      mem.addData(doc("s/a.txt", "alpha-updated"))
      query.processAllAvailable()

      // mid-stream crash: a torn partition swap (live moved aside) left
      // by a killed process — the next micro-batch's updateIndex must
      // heal it before applying
      val someList = spark.read.parquet(path)
        .select("list_id").distinct().as[Int].collect().min
      Files.move(Paths.get(path, s"list_id=$someList"),
        Paths.get(path, s"list_id=$someList.old"))

      // micro-batch 2: new document c
      mem.addData(doc("s/c.txt", "charlie"))
      query.processAllAvailable()
    } finally query.stop()

    // ≡ batch: the streamed index matches a from-scratch build of the
    // final corpus state (same quantizer), row-for-row
    val expected = Ivf.buildIndex(
      embOf(doc("s/a.txt", "alpha-updated"), doc("s/b.txt", "bravo"),
        doc("s/c.txt", "charlie")), q)
      .select("document_id", "fragment_id", "list_id", "content")
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(path)
      .select("document_id", "fragment_id", "list_id", "content")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.exists(_.toString.contains("alpha-updated")))
  }

  test("versioned stream: in-batch duplicates, late stragglers and replays " +
      "all converge to the latest-version corpus; ledger stays bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.embedding.OfflineEmbedder
    import graft.ingest.IngestPipeline
    import graft.ingest.IngestPipeline.DocInput
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.VersionedDocInput
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val embedder = new OfflineEmbedder(8)
    def doc(path: String, marker: String) = DocInput(path,
      s"$marker paragraph with enough characters to form a fragment.", isOcr = false)
    def vdoc(path: String, marker: String, sec: Long) = VersionedDocInput(path,
      s"$marker paragraph with enough characters to form a fragment.",
      isOcr = false, new java.sql.Timestamp(sec * 1000L))
    def embOf(docs: DocInput*) = IngestPipeline.embeddings(
      IngestPipeline.fragments(IngestPipeline.process(docs.toSeq.toDS())),
      embedder).toDF()

    val initial = embOf(doc("v/a.txt", "alpha"), doc("v/b.txt", "bravo"))
    val sample = initial.select("vector").collect()
      .map(_.getSeq[Float](0).toArray)
    val q = Ivf.train(sample, k = 2)
    val path = s"$dir/idx_versioned"
    TableLayout.writePartitionedSorted(Ivf.buildIndex(initial, q),
      path, "list_id", Seq("fragment_id"))

    val mem = MemoryStream[VersionedDocInput]
    // lateness 600 s: the low-water mark trails the newest applied
    // version by 600 s — versions below it are refused outright and
    // their ledger entries pruned
    val query = EventStreams.ingestIndexStreamVersioned(mem.toDS(), path,
      embedder, Ivf.buildIndex(_, q), s"$dir/idx_versioned_ckpt",
      latenessSec = 600L)
    try {
      // batch 1: TWO versions of a in one batch — only the latest (3000s)
      // may land; naive replace-by-document would keep both versions' rows
      mem.addData(vdoc("v/a.txt", "alpha-vtwo", 2000L),
        vdoc("v/a.txt", "alpha-vthree", 3000L))
      query.processAllAvailable()
      val afterB1 = asSet(spark.read.parquet(path))
      assert(afterB1 == asSet(Ivf.buildIndex(
        embOf(doc("v/a.txt", "alpha-vthree"), doc("v/b.txt", "bravo")), q)),
        "in-batch duplicate versions must resolve to the latest only")

      // mid-stream crash: a torn partition swap left by a killed process
      val someList = spark.read.parquet(path)
        .select("list_id").distinct().as[Int].collect().min
      Files.move(Paths.get(path, s"list_id=$someList"),
        Paths.get(path, s"list_id=$someList.old"))

      // batch 2: a LATE OLD version of a (2000s < applied 3000s — must
      // not clobber) + a genuinely new doc c at 3700s (advances the
      // low-water mark to 3100s, past a's applied 3000s)
      mem.addData(vdoc("v/a.txt", "alpha-vtwo", 2000L),
        vdoc("v/c.txt", "charlie", 3700L))
      query.processAllAvailable()
      val wantFinal = asSet(Ivf.buildIndex(
        embOf(doc("v/a.txt", "alpha-vthree"), doc("v/b.txt", "bravo"),
          doc("v/c.txt", "charlie")), q))
      assert(asSet(spark.read.parquet(path)) == wantFinal,
        "late straggler must be dropped; new doc applied; crash healed")

      // the ledger is bounded by the lateness horizon: a's entry (3000s)
      // fell below the 3100s low-water mark and must be pruned
      val ledger = spark.read.parquet(s"$path.versions")
        .as[(String, Long)].collect().toMap
      assert(ledger.keySet == Set("v/c.txt"),
        s"ledger must prune entries below the low-water mark: $ledger")

      // batch 3: a version of a BELOW the low-water mark (3050s < 3100s,
      // and a is no longer in the ledger) must be refused by the mark,
      // and an exact replay of c (3700s) is an equality no-op
      mem.addData(vdoc("v/a.txt", "alpha-vlate", 3050L),
        vdoc("v/c.txt", "charlie", 3700L))
      query.processAllAvailable()
      assert(asSet(spark.read.parquet(path)) == wantFinal,
        "below-watermark arrivals and replays must be no-ops")
    } finally query.stop()
  }

  test("IVFPQ streaming maintenance: the composed frozen encoder maintains " +
      "codes ≡ batch through a mid-stream crash") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.embedding.OfflineEmbedder
    import graft.ingest.IngestPipeline
    import graft.ingest.IngestPipeline.DocInput
    import graft.streaming.EventStreams
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val embedder = new OfflineEmbedder(8)
    def doc(path: String, marker: String) = DocInput(path,
      s"$marker paragraph with enough characters to form a fragment.", isOcr = false)
    def embOf(docs: DocInput*) = IngestPipeline.embeddings(
      IngestPipeline.fragments(IngestPipeline.process(docs.toSeq.toDS())),
      embedder).toDF()

    val initial = embOf(doc("pq/a.txt", "alpha"), doc("pq/b.txt", "bravo"))
    val sample = initial.orderBy(col("fragment_id")).select("vector")
      .as[Seq[Float]].collect().map(_.toArray)
    val q = Ivf.train(sample, k = 2)
    val cb = graft.search.Pq.train(sample, m = 2, ksub = 2)
    def enc(df: DataFrame): DataFrame =
      graft.search.Pq.encode(Ivf.buildIndex(df, q), cb)
    val path = s"$dir/idx_stream_pq"
    TableLayout.writePartitionedSorted(enc(initial), path,
      "list_id", Seq("fragment_id"))

    val mem = MemoryStream[DocInput]
    val query = EventStreams.ingestIndexStream(mem.toDS(), path, embedder,
      enc, s"$dir/idx_stream_pq_ckpt")
    try {
      mem.addData(doc("pq/a.txt", "alpha-updated"))
      query.processAllAvailable()
      // mid-stream crash: torn partition swap healed by the next batch
      val someList = spark.read.parquet(path)
        .select("list_id").distinct().as[Int].collect().min
      Files.move(Paths.get(path, s"list_id=$someList"),
        Paths.get(path, s"list_id=$someList.old"))
      mem.addData(doc("pq/c.txt", "charlie"))
      query.processAllAvailable()
    } finally query.stop()

    // ≡ batch INCLUDING the pq codes and codebook hash: the frozen
    // composed encoder must reproduce exactly what a from-scratch
    // encode of the final corpus produces
    def full(df: DataFrame): Set[(String, Int, Seq[Byte], Long)] =
      df.select(col("fragment_id"), col("list_id"), col("pq_code"),
          col("pq_cb_hash"))
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getAs[Array[Byte]](2).toSeq, r.getLong(3))).toSet
    val expected = full(enc(embOf(doc("pq/a.txt", "alpha-updated"),
      doc("pq/b.txt", "bravo"), doc("pq/c.txt", "charlie"))))
    assert(full(spark.read.parquet(path)) == expected)
  }

  test("residual IVFPQ maintenance: the frozen quantizer+residual-codebook " +
      "encoder ≡ from-scratch rebuild through a torn-swap crash, and the " +
      "maintained artifact serves exactly") {
    val s = spark
    import s.implicits._
    val base = rows(Seq(("a", 2, 0f), ("b", 3, 10f), ("c", 2, 20f)))
    val q = quant(0f, 10f, 20f)
    val sample = base.orderBy(col("fragment_id")).select(col("vector"))
      .as[Seq[Float]].collect().map(_.toArray)
    val cb = graft.search.Pq.trainResidual(sample, q, m = 2, ksub = 4)
    val enc = graft.search.Pq.residualEncoder(q, cb)
    val path = s"$dir/ivfpq_res"
    TableLayout.writePartitionedSorted(enc(base), path,
      "list_id", Seq("fragment_id"))

    IndexMaintenance.updateIndex(spark, path,
      rows(Seq(("a", 2, 20.3f), ("e", 1, 10.2f))), enc)

    // torn-swap crash window (live moved aside, process killed): the
    // next update's recover must heal it before applying the delta
    val someList = spark.read.parquet(path)
      .select("list_id").distinct().as[Int].collect().min
    Files.move(Paths.get(path, s"list_id=$someList"),
      Paths.get(path, s"list_id=$someList.old"))
    IndexMaintenance.updateIndex(spark, path,
      rows(Seq(("b", 1, 0.4f))), enc)

    // ≡ from-scratch residual encode of the final corpus, INCLUDING the
    // residual codes and the mixed codebook⊕quantizer fingerprint
    def full(df: DataFrame): Set[(String, Int, Seq[Byte], Long)] =
      df.select(col("fragment_id"), col("list_id"), col("pq_code"),
          col("pq_cb_hash"))
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getAs[Array[Byte]](2).toSeq, r.getLong(3))).toSet
    val merged = rows(Seq(("c", 2, 20f), ("a", 2, 20.3f),
      ("e", 1, 10.2f), ("b", 1, 0.4f)))
    assert(full(spark.read.parquet(path)) == full(enc(merged)))

    // the maintained artifact SERVES through v23's read path: full probe
    // + corpus shortlist ⇒ exact KNN over the post-delta corpus (the
    // rerank_all exactness witness, now against a maintained index)
    val queryVec = Array(10.2f, 10.2f, 1.0f, 0.5f)
    val n = merged.count().toInt
    val exact = graft.search.VectorSearch
      .knn(merged, queryVec, 3, vectorCol = "vector",
        tieBreak = "fragment_id")
      .select(col("fragment_id")).as[String].collect().toSeq
    val served = graft.search.Pq.searchIvfPqResidual(
        spark.read.parquet(path), queryVec, q, cb, 3, nprobe = q.k,
        shortlist = n, tieBreak = "fragment_id")
      .select(col("fragment_id")).as[String].collect().toSeq
    assert(served == exact,
      s"maintained residual index served $served, exact is $exact")
  }

  test("residual IVFPQ versioned stream: duplicate versions, a torn swap " +
      "and a late straggler converge to the latest-version residual index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.embedding.OfflineEmbedder
    import graft.ingest.IngestPipeline
    import graft.ingest.IngestPipeline.DocInput
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.VersionedDocInput
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val embedder = new OfflineEmbedder(8)
    def doc(path: String, marker: String) = DocInput(path,
      s"$marker paragraph with enough characters to form a fragment.", isOcr = false)
    def vdoc(path: String, marker: String, sec: Long) = VersionedDocInput(path,
      s"$marker paragraph with enough characters to form a fragment.",
      isOcr = false, new java.sql.Timestamp(sec * 1000L))
    def embOf(docs: DocInput*) = IngestPipeline.embeddings(
      IngestPipeline.fragments(IngestPipeline.process(docs.toSeq.toDS())),
      embedder).toDF()

    val initial = embOf(doc("vr/a.txt", "alpha"), doc("vr/b.txt", "bravo"))
    val sample = initial.orderBy(col("fragment_id")).select("vector")
      .as[Seq[Float]].collect().map(_.toArray)
    val q = Ivf.train(sample, k = 2)
    val cb = graft.search.Pq.trainResidual(sample, q, m = 2, ksub = 2)
    val enc = graft.search.Pq.residualEncoder(q, cb)
    val path = s"$dir/idx_versioned_res"
    TableLayout.writePartitionedSorted(enc(initial), path,
      "list_id", Seq("fragment_id"))

    def full(df: DataFrame): Set[(String, Int, Seq[Byte], Long)] =
      df.select(col("fragment_id"), col("list_id"), col("pq_code"),
          col("pq_cb_hash"))
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getAs[Array[Byte]](2).toSeq, r.getLong(3))).toSet

    val mem = MemoryStream[VersionedDocInput]
    val query = EventStreams.ingestIndexStreamVersioned(mem.toDS(), path,
      embedder, enc, s"$dir/idx_versioned_res_ckpt", latenessSec = 600L)
    try {
      // two versions of a in ONE batch — only the latest may land
      mem.addData(vdoc("vr/a.txt", "alpha-vtwo", 2000L),
        vdoc("vr/a.txt", "alpha-vthree", 3000L))
      query.processAllAvailable()
      assert(full(spark.read.parquet(path)) == full(enc(embOf(
        doc("vr/a.txt", "alpha-vthree"), doc("vr/b.txt", "bravo")))))

      // torn swap left by a killed process, then a straggler (2000s,
      // below a's applied 3000s — must not clobber) + a new doc
      val someList = spark.read.parquet(path)
        .select("list_id").distinct().as[Int].collect().min
      Files.move(Paths.get(path, s"list_id=$someList"),
        Paths.get(path, s"list_id=$someList.old"))
      mem.addData(vdoc("vr/a.txt", "alpha-vtwo", 2000L),
        vdoc("vr/c.txt", "charlie", 3700L))
      query.processAllAvailable()
      assert(full(spark.read.parquet(path)) == full(enc(embOf(
        doc("vr/a.txt", "alpha-vthree"), doc("vr/b.txt", "bravo"),
        doc("vr/c.txt", "charlie")))),
        "straggler dropped, new doc applied, crash healed — residual codes")
    } finally query.stop()
  }

  test("updateIndex refuses a residual delta against a plain-code index " +
      "(pq_cb_hash guard)") {
    val s = spark
    import s.implicits._
    val base = rows(Seq(("a", 2, 0f), ("b", 2, 10f)))
    val q = quant(0f, 10f)
    val sample = base.orderBy(col("fragment_id")).select(col("vector"))
      .as[Seq[Float]].collect().map(_.toArray)
    val cbPlain = graft.search.Pq.train(sample, m = 2, ksub = 4)
    val cbRes = graft.search.Pq.trainResidual(sample, q, m = 2, ksub = 4)
    val path = s"$dir/ivfpq_mixed"
    TableLayout.writePartitionedSorted(
      graft.search.Pq.encode(Ivf.buildIndex(base, q), cbPlain), path,
      "list_id", Seq("fragment_id"))
    val e = intercept[IllegalArgumentException] {
      IndexMaintenance.updateIndex(spark, path,
        rows(Seq(("a", 1, 10.1f))), graft.search.Pq.residualEncoder(q, cbRes))
    }
    assert(e.getMessage.contains("pq_cb_hash mismatch"))
  }

  test("updateIndex refuses an encoder whose quantizer differs from the index's") {
    val q1 = quant(0f, 10f)
    val q2 = quant(0f, 11f) // retrained geometry
    val path = s"$dir/idx_fprint"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(rows(Seq(("docA", 2, 0f), ("docB", 2, 10f))), q1),
      path, "list_id", Seq("fragment_id"))
    val e = intercept[IllegalArgumentException] {
      IndexMaintenance.updateIndex(spark, path,
        rows(Seq(("docA", 2, 0.2f))), Ivf.buildIndex(_, q2))
    }
    assert(e.getMessage.contains("ivf_q_hash mismatch"))
    // matching quantizer still goes through
    val st = IndexMaintenance.updateIndex(spark, path,
      rows(Seq(("docA", 2, 0.2f))), Ivf.buildIndex(_, q1))
    assert(st.affectedLists.nonEmpty)
  }
}
