package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Engine
import graft.embedding.OfflineEmbedder
import graft.ingest.IngestPipeline.DocInput
import graft.ingest.{ParentKeys, Parsers, Unitizer}

/** FIXTURES.md §1 — the mixed text/code/figure document: page markers,
  * headings, pre-text + python + javascript semantic unit, captions, page
  * breaks. One fixture exercising S1/S2, G1, X11, X12 and the full engine
  * path together (mirrors the reference's app/test/test.txt e2e fixture).
  */
class FixtureE2ESpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val fixture =
    """Page 1
      |# Introduction
      |
      |This pre-text paragraph explains the addition helper in enough detail to embed.
      |
      |```python
      |def add(a, b):
      |    return a + b
      |```
      |
      |```javascript
      |function addJs(a, b) { return a + b; }
      |```
      |
      |Figure 1: Example diagram of flow
      |A short caption tail describing the figure.
      |
      |--- Page Break ---
      |
      |## Advanced Topic
      |
      |2.1 Deeper Material
      |
      |Closing prose that stands alone with sufficient length for embedding checks.
      |""".stripMargin

  test("mixed fixture: unit formation, captions, page keys, search") {
    val s = spark
    import s.implicits._

    // S2 + G1: the python fence absorbs pre-text and the following js
    val segs = Parsers.parseMarkdown("doc1", fixture)
    val unitized = new Unitizer().unitize(segs.toIndexedSeq)
    val roles = unitized.map(u => (u.role, u.unitId.isDefined))
    assert(roles.contains(("pre_text", true)))
    assert(roles.contains(("python", true)))
    assert(roles.contains(("javascript", true)))
    val unitIds = unitized.flatMap(_.unitId).distinct
    assert(unitIds.size == 1, s"expected one semantic unit, got $unitIds")

    // X12: caption + tail from the text segments
    val caps = segs.filter(_.kind == "text")
      .flatMap(t => ParentKeys.extractCaptions(t.content))
    assert(caps.exists(c => c.view == "figure" &&
      c.content.startsWith("Figure 1:") && c.content.contains("caption tail")))

    // X11: section slugs + page-break counter. (The literal "Page 1"
    // marker is eaten by normalize's trailing-page-number fix BEFORE key
    // assignment — faithful to the reference, which normalizes first too —
    // so the first key is section-only and the page comes from the break.)
    val keyed = ParentKeys.assignParents(
      segs.map(t => (t.order, t.kind, t.content)), "docs/fixture.txt")
    assert(keyed.head.parentId.contains("fixture-s-introduction"))
    assert(keyed.last.page.contains("1")) // page-break counter = 1
    assert(keyed.last.section.exists(_.contains("advanced-topic")))
    assert(keyed.last.parentId.contains("fixture-p1-s-advanced-topic"))

    // engine end-to-end on the same fixture
    val engine = new Engine(s, new OfflineEmbedder(32))
    val r = engine.ingest(Seq(DocInput("docs/fixture.md", fixture, isOcr = false)).toDS())
    val emb = r.embeddings.cache()
    assert(emb.filter(_.view == "code").count() == 2) // python + javascript
    val hits = engine.search(emb, r.parents,
      "python code def add", topK = 3)
    assert(hits.nonEmpty && hits.forall(_.view == "code"))
    assert(hits.head.lang.contains("python"))
  }
}
