package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.embedding.OfflineEmbedder
import graft.ingest.IngestPipeline
import graft.ingest.IngestPipeline.DocInput
import graft.search.VectorSearch

/** End-to-end: ingest a markdown/text fixture → entity tables → embed →
  * search with filters and parent-context expansion (SURVEY.md §7.3 minimum
  * slice). Runs on a local session; the plan shape (narrow ingest,
  * TakeOrderedAndProject top-k, broadcast parent join) is the same one a
  * cluster run would produce.
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val mdFixture =
    """Intro paragraph explaining the add function in enough words.
      |
      |```python
      |def add(a, b):
      |    return a + b
      |```
      |
      |A second concept paragraph about subtraction and related topics.
      |
      |```python
      |def sub(a, b):
      |    return a - b
      |```
      |
      |Some trailing prose that stands alone and is long enough to embed.
      |""".stripMargin

  test("ingest → tables → knn search → context expansion") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      DocInput("docs/a.md", mdFixture, isOcr = false),
      DocInput("docs/b.txt", "Plain text document about spark joins and shuffles, long enough.", isOcr = false))
      .toDS()

    val processed = IngestPipeline.process(docs).cache()
    val documents = IngestPipeline.documents(processed).collect()
    assert(documents.length == 2)
    assert(documents.forall(_.id.length == 32))

    val fragments = IngestPipeline.fragments(processed)
    val frags = fragments.collect()
    assert(frags.nonEmpty)
    // hierarchy invariant: no orphan fragments (HIER-003)
    val conceptIds = IngestPipeline.concepts(processed).collect().map(_.id).toSet
    assert(frags.forall(f => conceptIds.contains(f.concept_id)))

    val parents = IngestPipeline.parents(processed)
    val parentRows = parents.collect()
    assert(parentRows.map(_.parent_id).toSet == conceptIds)
    // code fragments are fenced in parent content
    assert(parentRows.exists(_.content.contains("```python")))

    val embedder = new OfflineEmbedder(64)
    val embeddings = IngestPipeline.embeddings(fragments, embedder).cache()
    val embRows = embeddings.collect()
    assert(embRows.nonEmpty)
    assert(embRows.forall(_.vector.length == 64))
    assert(embRows.forall(_.doc_id.startsWith("doc:")))
    // only eligible fragments embedded
    assert(embRows.forall(_.content.length >= 10))

    // deterministic: re-embedding the same fragment gives the same vector
    val v1 = embedder.embedQuery(embRows.head.content)
    assert(v1.sameElements(embRows.head.vector))

    // search: query = content of a known code fragment → top hit is itself
    val target = embRows.find(_.view == "code").get
    val q = embedder.embedQuery(target.content)
    val hits = VectorSearch.knn(embeddings.toDF(), q, topK = 3).collect()
    assert(hits.head.getAs[String]("fragment_id") == target.fragment_id)
    assert(math.abs(hits.head.getAs[Double]("similarity") - 1.0) < 1e-6)

    // view filter excludes text hits
    val codeHits = VectorSearch.knn(embeddings.toDF(), q, 10, view = Some("code")).collect()
    assert(codeHits.forall(_.getAs[String]("view") == "code"))

    // context expansion attaches the synthesized parent
    val expanded = VectorSearch.expandContext(
      VectorSearch.knn(embeddings.toDF(), q, 3), parents.toDF()).collect()
    assert(expanded.forall(r => r.getAs[String]("parent_content") != null))

    // per-parent cap
    val capped = VectorSearch.topNPerParent(
      VectorSearch.knn(embeddings.toDF(), q, 10), n = 1)
    val byParent = capped.collect().groupBy(_.getAs[String]("parent_id"))
    assert(byParent.values.forall(_.length <= 1))
  }

  test("re-ingest idempotency: same input produces identical ids (cascade overwrite)") {
    val s = spark
    import s.implicits._
    val docs = Seq(DocInput("docs/a.md", mdFixture, isOcr = false)).toDS()
    val p1 = IngestPipeline.process(docs)
    val p2 = IngestPipeline.process(docs)
    val ids1 = IngestPipeline.fragments(p1).collect().map(_.id).sorted.toSeq
    val ids2 = IngestPipeline.fragments(p2).collect().map(_.id).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("replaceDocuments: anti-join merge keeps untouched docs, replaces incoming") {
    val s = spark
    import s.implicits._
    val existing = Seq(("d1", "old1"), ("d2", "old2")).toDF("document_id", "payload")
    val incoming = Seq(("d2", "new2"), ("d3", "new3")).toDF("document_id", "payload")
    val merged = IngestPipeline.replaceDocuments(existing, incoming)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(merged == Seq(("d1", "old1"), ("d2", "new2"), ("d3", "new3")))
  }

  test("batch knn: one job answers many queries with per-query top-k") {
    val s = spark
    import s.implicits._
    val embedder = new OfflineEmbedder(16)
    val rows = (0 until 50).map(i => (s"f$i", embedder.embedQuery(s"content $i")))
    val emb = rows.toDF("fragment_id", "vector")
    val queries = Seq(("q0", embedder.embedQuery("content 7")),
      ("q1", embedder.embedQuery("content 23"))).toDF("query_id", "query_vector")
    val res = VectorSearch.batchKnn(emb, queries, topK = 2).collect()
    assert(res.length == 4)
    val best = res.filter(_.getAs[Int]("rank") == 1)
      .map(r => (r.getAs[String]("query_id"), r.getAs[String]("fragment_id"))).toMap
    assert(best == Map("q0" -> "f7", "q1" -> "f23"))
  }

  test("readDocuments: a mixed dir of real PDFs and text ingests end-to-end") {
    import java.nio.file.{Files, Paths}
    import graft.sources.{PdfSource, PdfWriter}
    val dir = Files.createTempDirectory("graft-docs").toString
    try {
      val pdfBytes = PdfWriter.build(Seq(PdfWriter.PageSpec(Seq(
        "Adaptive execution re-optimizes the remaining plan between stages " +
          "using the exchange statistics gathered so far at runtime."))),
        compress = true)
      Files.write(Paths.get(dir, "guide.pdf"), pdfBytes)
      Files.write(Paths.get(dir, "notes.md"),
        mdFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val docs = PdfSource.readDocuments(spark, dir)
      assert(docs.count() == 2)
      val frags = IngestPipeline.fragments(IngestPipeline.process(docs)).collect()
      val byDoc = frags.groupBy(_.document_id)
      assert(byDoc.size == 2) // both files produced fragments
      val pdfText = frags.map(_.content).mkString(" ")
      assert(pdfText.contains("re-optimizes the remaining plan"))
      assert(pdfText.contains("add function")) // the markdown came through too
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(dir)).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
