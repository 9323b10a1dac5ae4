package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Engine, Generation, RuleBasedSelfQuery}
import graft.embedding.OfflineEmbedder
import graft.ingest.{IngestPipeline, ParentKeys}
import graft.ingest.IngestPipeline.DocInput

class EngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val fixture =
    """Intro paragraph explaining the add function in enough words.
      |
      |```python
      |def add(a, b):
      |    return a + b
      |```
      |
      |Another passage about numerical subtraction routines and context.
      |""".stripMargin

  test("engine: ingest → search with self-query filters → RAG context") {
    val s = spark
    import s.implicits._
    val engine = new Engine(s, new OfflineEmbedder(32))
    val result = engine.ingest(Seq(
      DocInput("docs/a.md", fixture, isOcr = false)).toDS())

    val emb = result.embeddings.cache()
    assert(emb.count() > 0)

    // target the code fragment verbatim → top hit; "code" keyword triggers
    // the rule-based view filter (E6) — all hits must be code view
    val codeContent = emb.filter(_.view == "code").head().content
    val hits = engine.search(emb, result.parents,
      queryText = "code: " + codeContent, topK = 5)
    assert(hits.nonEmpty)
    assert(hits.forall(_.view == "code"))
    assert(hits.head.content == codeContent)
    assert(hits.head.parent_content.isDefined)

    // RAG stage over collected hits (driver-side, E8)
    val resp = Generation.OfflineGenerator.generate("how to add?", hits)
    assert(resp.answer.nonEmpty && resp.sources.length == hits.length)
    val ctx = Generation.OfflineGenerator.buildContext(hits)
    assert(ctx.contains("[Source 1]"))

    // metrics (A4-A6)
    val m = engine.metrics(emb)
    assert(m.nEmbeddings == emb.count())
    assert(m.nMissingDocId == 0 && m.nDuplicateDocIds == 0)
    assert(m.viewDistribution.nonEmpty)
  }

  test("engine: golden-query eval answers all queries in one job") {
    val s = spark
    import s.implicits._
    val engine = new Engine(s, new OfflineEmbedder(32))
    val r = engine.ingest(Seq(DocInput("docs/a.md", fixture, isOcr = false)).toDS())
    val emb = r.embeddings.cache()
    val someParent = emb.head().parent_id

    val golden = Seq(
      graft.api.Engine.GoldenQuery("g1", "Intro paragraph explaining the add function in enough words.",
        None, None, 5, Seq(someParent), Seq("add function")),
      graft.api.Engine.GoldenQuery("g2", "completely unrelated query text",
        None, None, 5, Seq("no-such-parent"), Seq("zzz-not-present")))
    val results = engine.evalGolden(emb, r.parents, golden)
    assert(results.find(_.query_id == "g1").get.passed)
    assert(!results.find(_.query_id == "g2").get.passed)
  }

  test("self-query rule extraction") {
    assert(RuleBasedSelfQuery.extract("show me the python code for sorting")
      == graft.api.SelfQuery.Filters(Some("code"), Some("python")))
    assert(RuleBasedSelfQuery.extract("overview diagram of the system").view
      .contains("image"))
    assert(RuleBasedSelfQuery.extract("plain question") ==
      graft.api.SelfQuery.Filters(None, None))
  }

  test("parent keys: page/section carry-forward matches reference") {
    val segs = Seq(
      (0, "text", "Page 3\nsome intro text"),
      (1, "text", "1.2 Section Title Here\nbody"),
      (2, "text", "plain paragraph"),
      (3, "text", "--- Page Break ---"),
      (4, "code", "code here"),
      (5, "text", "Chapter 7 overview"))
    val keyed = ParentKeys.assignParents(segs, "docs/My File.txt")
    assert(keyed.map(_.parentId.orNull) == Seq(
      "my-file-p3",
      "my-file-p3-s-12-section-title-here",
      "my-file-p3-s-12-section-title-here",
      "my-file-p1-s-12-section-title-here", // page break resets counter to 1
      "my-file-p1-s-12-section-title-here",
      "my-file-p1-s-chapter-7"))
    assert(keyed.head.page.contains("3"))
  }

  test("caption extraction matches reference") {
    val caps = ParentKeys.extractCaptions(
      "intro\nFigure 3: Architecture overview\nA short explanatory tail line\nTable 12. Results\ndef foo():\nplain")
    assert(caps == Seq(
      ParentKeys.Caption("figure",
        "Figure 3: Architecture overview\nA short explanatory tail line"),
      ParentKeys.Caption("table", "Table 12. Results")))
  }

  test("trigram language ID fires on real multilingual text") {
    // the shipped corpus is ASCII under every lang label, so the catalog
    // query can't exercise the non-English profiles — this does
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    import graft.queries.TextAnalysisQueries
    val rows = Seq(
      ("en", "the cat and the dog are playing in the garden with the children"),
      ("de", "der hund und die katze spielen nicht schlecht im schönen garten"),
      ("fr", "les enfants jouent dans le jardin avec les chiens et les chats"),
      ("zh", "这是一个很好的例子我们的朋友不知道在这里发生了什么是一个谜")
    ).toDF("lang", "text")
    val got = rows.select(col("lang"),
      TextAnalysisQueries.trigramGuess(
        TextAnalysisQueries.trigramCounts(col("text"))).as("guess"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("en") == "en", got.toString)
    assert(got("de") == "de", got.toString)
    assert(got("fr") == "fr", got.toString)
    assert(got("zh") == "zh", got.toString)
  }
}
