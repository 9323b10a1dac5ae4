package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Engine
import graft.embedding.OfflineEmbedder
import graft.ingest.ReingestJournal

/** The cross-step re-ingest journal (VERDICT r5 task #5 / Cli reingest):
  * per-table swaps are individually crash-safe, but a crash BETWEEN swaps
  * used to leave the entity tables mutually inconsistent with nothing
  * recording it. The journal pins detection + completion of the
  * interrupted batch.
  */
class ReingestJournalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    dir = Files.createTempDirectory("reingest-journal")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.ingest.TableSwap.rmTreeAt(dir.toString)
  }

  test("journal round-trips: start, markDone, clear") {
    val td = s"$dir/j1"
    Files.createDirectories(Paths.get(td))
    assert(ReingestJournal.read(td).isEmpty)
    ReingestJournal.start(td, Seq("a.txt", "b.txt"))
    assert(ReingestJournal.read(td).contains(
      ReingestJournal.State(Seq("a.txt", "b.txt"), Nil)))
    ReingestJournal.markDone(td, "documents")
    ReingestJournal.markDone(td, "fragments")
    ReingestJournal.markDone(td, "documents") // idempotent
    assert(ReingestJournal.read(td).contains(
      ReingestJournal.State(Seq("a.txt", "b.txt"), Seq("documents", "fragments"))))
    ReingestJournal.clear(td)
    assert(ReingestJournal.read(td).isEmpty)
  }

  test("torn or foreign journal file reads as absent") {
    val td = s"$dir/j2"
    Files.createDirectories(Paths.get(td))
    Files.write(Paths.get(td, "_reingest_journal"),
      "garbage\nno sections".getBytes(StandardCharsets.UTF_8))
    assert(ReingestJournal.read(td).isEmpty)
  }

  private def writeDoc(name: String, text: String): String = {
    val p = Paths.get(dir.toString, name)
    Files.write(p, text.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private def fragmentTexts(td: String): Set[String] = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(s"$td/fragments").select(col("content"))
      .collect().map(_.getString(0)).toSet
  }

  test("reingestCommand completes an interrupted batch before the new one") {
    val engine = new Engine(spark, new OfflineEmbedder(64))
    val td = s"$dir/tables"
    val fa = writeDoc("a.txt", "alpha original content for document a")
    val fb = writeDoc("b.txt", "bravo original content for document b")
    // initial ingest (same table writes the Cli ingest command performs)
    val r = engine.ingest(Cli.readDocFiles(spark, List(fa, fb)))
    import graft.ingest.IngestPipeline.writeTable
    writeTable(r.documents.toDF(), s"$td/documents", key = "id")
    writeTable(r.concepts.toDF(), s"$td/concepts")
    writeTable(r.fragments.toDF(), s"$td/fragments")
    writeTable(r.parents.toDF(), s"$td/parents")
    writeTable(r.embeddings.toDF(), s"$td/embeddings")
    r.release()
    assert(fragmentTexts(td).exists(_.contains("bravo original")))

    // a batch for b.txt "crashed" after the documents step: the journal
    // remains with one step done, and the table contents for the later
    // steps still hold the OLD b
    Files.write(Paths.get(fb), "bravo UPDATED content for document b"
      .getBytes(StandardCharsets.UTF_8))
    ReingestJournal.start(td, Seq(fb))
    ReingestJournal.markDone(td, "documents")

    // a NEW reingest of c.txt must first finish b's batch (skipping the
    // completed documents step), then apply its own
    val fc = writeDoc("c.txt", "charlie new content for document c")
    Cli.reingestCommand(spark, engine, td, List(fc))

    assert(ReingestJournal.read(td).isEmpty, "journal must clear when done")
    val frags = fragmentTexts(td)
    assert(frags.exists(_.contains("bravo UPDATED")),
      "interrupted batch's remaining steps were not applied")
    assert(!frags.exists(_.contains("bravo original")))
    assert(frags.exists(_.contains("charlie new")))
    assert(frags.exists(_.contains("alpha original")))
  }

  test("re-running the SAME crashed batch skips completed steps and clears") {
    val engine = new Engine(spark, new OfflineEmbedder(64))
    val td = s"$dir/tables2"
    val fa = writeDoc("a2.txt", "delta original content for document a2")
    val r = engine.ingest(Cli.readDocFiles(spark, List(fa)))
    import graft.ingest.IngestPipeline.writeTable
    writeTable(r.documents.toDF(), s"$td/documents", key = "id")
    writeTable(r.concepts.toDF(), s"$td/concepts")
    writeTable(r.fragments.toDF(), s"$td/fragments")
    writeTable(r.parents.toDF(), s"$td/parents")
    writeTable(r.embeddings.toDF(), s"$td/embeddings")
    r.release()

    Files.write(Paths.get(fa), "delta UPDATED content for document a2"
      .getBytes(StandardCharsets.UTF_8))
    ReingestJournal.start(td, Seq(fa))
    ReingestJournal.markDone(td, "documents")
    Cli.reingestCommand(spark, engine, td, List(fa))
    assert(ReingestJournal.read(td).isEmpty)
    assert(fragmentTexts(td).exists(_.contains("delta UPDATED")))
  }

  test("reingest maintains a persisted ROUTED hnsw index: the replaced " +
      "document's old rows leave, the re-embedded ones are servable") {
    import org.apache.spark.sql.functions.{col, md5}
    val s = spark
    import s.implicits._
    val engine = new Engine(spark, new OfflineEmbedder(64))
    val td = s"$dir/tables_routed"
    val fa = writeDoc("r1.txt", "echo original content for document r1")
    val fb = writeDoc("r2.txt", "foxtrot original content for document r2")
    val r = engine.ingest(Cli.readDocFiles(spark, List(fa, fb)))
    import graft.ingest.IngestPipeline.writeTable
    writeTable(r.documents.toDF(), s"$td/documents", key = "id")
    writeTable(r.concepts.toDF(), s"$td/concepts")
    writeTable(r.fragments.toDF(), s"$td/fragments")
    writeTable(r.parents.toDF(), s"$td/parents")
    writeTable(r.embeddings.toDF(), s"$td/embeddings")
    r.release()
    // the hnsw-index-routed verb's body (router frozen at build time)
    val e = spark.read.parquet(s"$td/embeddings").drop("doc_bucket")
    val sample = e.orderBy(md5(col("fragment_id"))).limit(8192)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val router = graft.search.Ivf.train(sample, 2)
    val idxPath = s"$td/embeddings_hnsw_routed"
    graft.search.HnswMaintenance.writeIndexRouted(e, idxPath, router,
      replicas = 2, docCol = Some("document_id"))
    val oldIds = spark.read.parquet(idxPath).select("fragment_id")
      .distinct().as[String].collect().toSet

    Files.write(Paths.get(fb),
      "foxtrot REWRITTEN content for document r2"
        .getBytes(StandardCharsets.UTF_8))
    Cli.reingestCommand(spark, engine, td, List(fb))

    // the routed index now holds exactly the post-reingest fragment set
    val expect = spark.read.parquet(s"$td/embeddings")
      .select("fragment_id").distinct().as[String].collect().toSet
    val got = spark.read.parquet(idxPath).select("fragment_id")
      .distinct().as[String].collect().toSet
    assert(got == expect,
      s"routed index drifted from the corpus: extra=${got -- expect}, " +
        s"missing=${expect -- got}")
    assert(got != oldIds, "the replaced doc must have new fragment ids")
    // and the rewritten fragment is servable through the routed walk
    val newFrag = spark.read.parquet(s"$td/fragments")
      .filter(col("content").contains("REWRITTEN"))
      .select(col("id")).as[String].head()
    val qvec = spark.read.parquet(s"$td/embeddings")
      .filter(col("fragment_id") === newFrag)
      .select(col("vector")).head().getSeq[Float](0).toArray
    val hits = graft.search.Hnsw.searchIndexRouted(
        spark.read.parquet(idxPath), Seq(("q", qvec)), 3, ef = 64,
        router, probeShards = 2)
      .select(col("fragment_id")).as[String].collect()
    assert(hits.headOption.contains(newFrag),
      s"the re-embedded fragment must rank first for its own vector: " +
        s"${hits.toSeq}")
  }
}
