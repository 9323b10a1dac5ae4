package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Engine
import graft.embedding.OfflineEmbedder
import graft.search.{FusionFloor, LexIndex}

/** The inverted lexical postings index: hybrid serving through it must
  * be BIT-FOR-BIT the corpus-scan fallback (same integer tf/df/dl/n
  * facts, same fixed-order literal-idf fold), its reads must be
  * partition-pruned to the query terms' buckets, maintenance must go
  * through delta batches that converge to a full rebuild, and a stale
  * stats sidecar must refuse to serve (the ivf_q_hash contract).
  */
class LexIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("lex-index")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.ingest.TableSwap.rmTreeAt(dir.toString)
  }

  private def writeDoc(name: String, text: String): String = {
    val p = Paths.get(dir.toString, name)
    Files.write(p, text.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private def ingestTables(td: String, files: List[String],
      engine: Engine): Unit = {
    val r = engine.ingest(Cli.readDocFiles(spark, files))
    import graft.ingest.IngestPipeline.writeTable
    writeTable(r.documents.toDF(), s"$td/documents", key = "id")
    writeTable(r.concepts.toDF(), s"$td/concepts")
    writeTable(r.fragments.toDF(), s"$td/fragments")
    writeTable(r.parents.toDF(), s"$td/parents")
    writeTable(r.embeddings.toDF(), s"$td/embeddings")
    r.release()
  }

  private def calibrate(td: String): Unit = {
    val a = FusionFloor.calibrate(
      spark.read.parquet(s"$td/fragments"), "id", "content",
      tableDir = Some(s"$td/fragments"))
    FusionFloor.save(a, s"$td/fusion_floor.txt")
  }

  test("postings-served hybrid search is bit-for-bit the scan fallback; " +
      "delta maintenance converges to a rebuild; compaction is a no-op " +
      "on results") {
    val engine = new Engine(spark, new OfflineEmbedder(64))
    val td = s"$dir/tables"
    val fa = writeDoc("a.txt",
      "alpha document about spark shuffles and partition pruning basics " +
        "with spark appearing twice for a tf above one")
    val fb = writeDoc("b.txt",
      "bravo document about vector search recall and index maintenance")
    val fc = writeDoc("c.txt",
      "charlie document mentions partition layout and vector recall too")
    ingestTables(td, List(fa, fb, fc), engine)
    calibrate(td)

    val query = "spark partition recall"
    // scan fallback first (no index yet)
    assert(!LexIndex.exists(td))
    val scan0 = Cli.hybridSearchCommand(spark, td, query, 5)

    // build the index; serving flips to the pruned path
    val st = LexIndex.build(spark, td)
    assert(LexIndex.exists(td))
    assert(st.n == spark.read.parquet(s"$td/fragments").count())
    val idx0 = Cli.hybridSearchCommand(spark, td, query, 5)
    assert(idx0 == scan0,
      s"pruned path must be bit-for-bit the scan path:\n$idx0\nvs\n$scan0")

    // an out-of-corpus query degrades identically on both paths
    val oov = Cli.hybridSearchCommand(spark, td, "zzz qqq www", 5)
    assert(oov.conf == 0.0 && oov.wLex == 0.0)

    // maintenance: replace one document through the Cli (delta batch,
    // base untouched), then compare against scan fallback AND a full
    // rebuild on the same post-delta corpus
    Files.write(Paths.get(fb),
      ("bravo rewritten to speak of spark streaming recall watermarks " +
        "and partition state stores").getBytes(StandardCharsets.UTF_8))
    Cli.reingestCommand(spark, engine, td, List(fb))
    assert(Files.isDirectory(Paths.get(LexIndex.deltaPath(td))),
      "reingest must maintain by delta batch, not rebuild")
    val viaDelta = Cli.hybridSearchCommand(spark, td, query, 5)

    // scan fallback on the post-delta corpus: hide the sidecar (a torn
    // build looks exactly like this and must degrade safely, not serve)
    val statsBytes = Files.readAllBytes(Paths.get(LexIndex.statsPath(td)))
    Files.delete(Paths.get(LexIndex.statsPath(td)))
    assert(!LexIndex.exists(td))
    val viaScan = Cli.hybridSearchCommand(spark, td, query, 5)
    Files.write(Paths.get(LexIndex.statsPath(td)), statsBytes)
    assert(viaDelta == viaScan,
      s"delta-maintained index diverged from the corpus:\n$viaDelta" +
        s"\nvs\n$viaScan")

    // compaction folds the batches; results identical, delta dir gone
    val folded = LexIndex.compact(spark, td)
    assert(folded >= 1)
    assert(!Files.exists(Paths.get(LexIndex.deltaPath(td))))
    assert(Cli.hybridSearchCommand(spark, td, query, 5) == viaDelta)

    // and a from-scratch rebuild agrees too (delta ∘ compact ≡ rebuild)
    LexIndex.build(spark, td)
    assert(Cli.hybridSearchCommand(spark, td, query, 5) == viaDelta)

    // metadata scoping (F1/F2 on the hybrid path): filter-before-rank
    // on both channels, pruned ≡ scan under the predicate, and every
    // hit belongs to the view
    val fragsDf = spark.read.parquet(s"$td/fragments")
    val v = fragsDf.select("view").distinct()
      .collect().map(_.getString(0)).sorted.head
    val eligible = fragsDf
      .filter(org.apache.spark.sql.functions.col("view") === v)
      .select("id").collect().map(_.getString(0)).toSet
    val idxV = Cli.hybridSearchCommand(spark, td, query, 5,
      view = Some(v))
    assert(idxV.hits.nonEmpty)
    assert(idxV.hits.forall(h => eligible.contains(h._1)),
      s"scoped hits must all be view=$v")
    val sb2 = Files.readAllBytes(Paths.get(LexIndex.statsPath(td)))
    Files.delete(Paths.get(LexIndex.statsPath(td)))
    val scanV = Cli.hybridSearchCommand(spark, td, query, 5,
      view = Some(v))
    Files.write(Paths.get(LexIndex.statsPath(td)), sb2)
    assert(idxV == scanV,
      s"scoped pruned path diverged from scan:\n$idxV\nvs\n$scanV")
  }

  test("pruned reads carry the term buckets into PartitionFilters") {
    val engine = new Engine(spark, new OfflineEmbedder(64))
    val td = s"$dir/tables_prune"
    val fa = writeDoc("p.txt",
      "echo corpus with enough words that several buckets materialize " +
        "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ingestTables(td, List(fa), engine)
    LexIndex.build(spark, td)
    val qTerms = Seq("alpha", "beta")
    val df = LexIndex.prunedPostings(spark, td, qTerms)
    val pf = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("term_bucket"),
      s"term buckets must reach PartitionFilters:\n$pf")
    // driver-side bucket = Spark-side bucket (md5 hex agreement)
    import org.apache.spark.sql.functions._
    val sparkBuckets = spark.read.parquet(LexIndex.indexPath(td))
      .filter(col("term").isin(qTerms: _*))
      .select(col("term"), col("term_bucket")).distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    qTerms.foreach { t =>
      assert(sparkBuckets(t) == LexIndex.bucketOf(t),
        s"bucketOf('$t') must match the written partition value")
    }
  }

  test("maintenance self-limits its delta tail: past MaxBatches the " +
      "segments fold into the base and the merged content is the final " +
      "state") {
    val s = spark
    import s.implicits._
    val td = s"$dir/tables_tail"
    val frags = Seq(("f1", "d1", "alpha beta"), ("f2", "d2", "beta gamma"))
      .toDF("id", "document_id", "content")
    graft.ingest.IngestPipeline.writeTable(frags, s"$td/fragments")
    LexIndex.build(spark, td)
    (0 until 9).foreach { i =>
      val nf = Seq((s"f2_$i", "d2", s"beta gamma round$i"))
        .toDF("id", "document_id", "content")
      LexIndex.appendDelta(spark, td, Seq("d2"), nf)
    }
    // 9 committed batches > MaxBatches(8): the reingest step's call folds
    assert(LexIndex.maybeCompact(spark, td) == 9)
    assert(!Files.exists(Paths.get(LexIndex.deltaPath(td))))
    // and leaves exactly the final state: d2's postings are batch 8's
    val betaIds = LexIndex.prunedPostings(spark, td, Seq("beta"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(betaIds == Set("f1", "f2_8"), s"got $betaIds")
    // under the bound, maintenance leaves the tail alone
    LexIndex.appendDelta(spark, td, Seq("d1"),
      Seq(("f1_n", "d1", "alpha delta")).toDF(
        "id", "document_id", "content"))
    assert(LexIndex.maybeCompact(spark, td) == 0)
    // a torn batch dir (no _SUCCESS — a crashed delta write) is
    // read-invisible but must not block the retry's numbering
    val preDf = LexIndex.dfOf(spark, td, Seq("delta"))
    Files.createDirectories(Paths.get(LexIndex.deltaPath(td), "batch=1"))
    assert(LexIndex.dfOf(spark, td, Seq("delta")) == preDf,
      "an uncommitted batch must be invisible to reads")
    LexIndex.appendDelta(spark, td, Seq("d1"),
      Seq(("f1_n2", "d1", "alpha delta epsilon")).toDF(
        "id", "document_id", "content"))
    assert(LexIndex.dfOf(spark, td, Seq("epsilon"))("epsilon") == 1L,
      "the retry after a torn write must land (numbered past the tomb)")
  }

  test("streaming twin: micro-batches maintain fragments + postings + " +
      "sidecar together; an at-least-once replay converges; serve ≡ " +
      "scan ≡ rebuild over the final corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ingest.IngestPipeline
    import graft.ingest.IngestPipeline.DocInput
    import graft.streaming.EventStreams
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    def doc(path: String, marker: String) = DocInput(path,
      s"$marker paragraph with enough characters to form a fragment.",
      isOcr = false)
    val td = s"$dir/tables_stream"
    // batch bootstrap: fragments table + postings base + fusion floor
    val frags0 = IngestPipeline.fragments(IngestPipeline.process(
      Seq(doc("l/a.txt", "alpha spark"), doc("l/b.txt", "bravo recall"))
        .toDS())).toDF()
    graft.ingest.IngestPipeline.writeTable(frags0, s"$td/fragments")
    // minimal embeddings table for the dense channel
    val engine = new Engine(spark, new OfflineEmbedder(64))
    graft.ingest.IngestPipeline.writeTable(
      engine.ingest(Seq(doc("l/a.txt", "alpha spark"),
        doc("l/b.txt", "bravo recall")).toDS()).embeddings.toDF(),
      s"$td/embeddings")
    LexIndex.build(spark, td)
    calibrate(td)

    val mem = MemoryStream[DocInput]
    val query = EventStreams.ingestLexIndexStream(mem.toDS(), td,
      s"$dir/lex_stream_ckpt")
    try {
      mem.addData(doc("l/b.txt", "bravo rewritten spark recall"))
      query.processAllAvailable()
      mem.addData(doc("l/c.txt", "charlie joins with spark"))
      query.processAllAvailable()
    } finally query.stop()
    // at-least-once: replay the first delta batch directly
    EventStreams.applyLexIngestBatch(td,
      Seq(doc("l/b.txt", "bravo rewritten spark recall")).toDS())
    // the fusion floor is corpus-bound too and the lex stream twin is
    // index-scoped — recalibrate (reingest's floor step) before serving
    calibrate(td)

    // the maintained artifact serves fresh and equals the scan fallback
    val viaStream = Cli.hybridSearchCommand(spark, td, "spark recall", 5)
    val statsBytes = Files.readAllBytes(Paths.get(LexIndex.statsPath(td)))
    Files.delete(Paths.get(LexIndex.statsPath(td)))
    val viaScan = Cli.hybridSearchCommand(spark, td, "spark recall", 5)
    Files.write(Paths.get(LexIndex.statsPath(td)), statsBytes)
    assert(viaStream == viaScan,
      s"stream-maintained index diverged:\n$viaStream\nvs\n$viaScan")
    // ... and a from-scratch rebuild over the final table agrees
    LexIndex.build(spark, td)
    assert(Cli.hybridSearchCommand(spark, td, "spark recall", 5)
      == viaStream)
    // the lexical channel actually saw all three documents' content
    assert(LexIndex.dfOf(spark, td, Seq("spark"))("spark") >= 3L)
  }

  test("self-query hints scope the hybrid serve (E6 composed into " +
      "hybrid); explicit args and the disable flag override") {
    val engine = new Engine(spark, new OfflineEmbedder(64))
    val td = s"$dir/tables_sq"
    val f = writeDoc("m.md",
      "# Title\n\nProse about spark partitions and shuffle basics " +
        "written plainly here.\n\n```python\ndef spark_partition_helper" +
        "():\n    return \"code fragment speaking of spark\"\n```\n")
    ingestTables(td, List(f), engine)
    calibrate(td)
    LexIndex.build(spark, td)
    val fragsDf = spark.read.parquet(s"$td/fragments")
    import org.apache.spark.sql.functions.col
    val codeIds = fragsDf.filter(col("view") === "code")
      .select("id").collect().map(_.getString(0)).toSet
    assume(codeIds.nonEmpty, "fixture must yield code-view fragments")
    // "code" in the query text → the E6 rule scopes to view=code
    val r = Cli.hybridSearchCommand(spark, td, "code spark", 5)
    assert(r.hits.nonEmpty)
    assert(r.hits.forall(h => codeIds.contains(h._1)),
      s"self-query hint must scope to code fragments: ${r.hits}")
    // the flag restores the unscoped serve (prose fragments eligible)
    val r2 = Cli.hybridSearchCommand(spark, td, "code spark", 5,
      applySelfQuery = false)
    assert(r2.hits.exists(h => !codeIds.contains(h._1)),
      "unscoped serve must rank prose fragments too")
    // an explicit view wins over the hint
    val r3 = Cli.hybridSearchCommand(spark, td, "code spark", 5,
      view = Some("text"))
    assert(r3.hits.nonEmpty)
    assert(r3.hits.forall(h => !codeIds.contains(h._1)),
      "explicit view=text must override the code hint")
  }

  test("a stale stats sidecar refuses to serve (fragments rewritten " +
      "without the lex maintenance step)") {
    val engine = new Engine(spark, new OfflineEmbedder(64))
    val td = s"$dir/tables_stale"
    val fa = writeDoc("s.txt", "foxtrot corpus speaks of parquet rows")
    ingestTables(td, List(fa), engine)
    calibrate(td)
    LexIndex.build(spark, td)
    val stale = Files.readAllBytes(Paths.get(LexIndex.statsPath(td)))
    // rewrite the fragments table out from under the index (the
    // reingest-without-lex-step / torn-maintenance shape)
    Files.write(Paths.get(fa),
      "foxtrot rewritten to different words".getBytes(
        StandardCharsets.UTF_8))
    Cli.reingestCommand(spark, engine, td, List(fa))
    Files.write(Paths.get(LexIndex.statsPath(td)), stale)
    val e = intercept[IllegalArgumentException] {
      Cli.hybridSearchCommand(spark, td, "parquet", 5)
    }
    assert(e.getMessage.contains("STALE"),
      s"expected the lex staleness refusal, got: ${e.getMessage}")
  }
}
