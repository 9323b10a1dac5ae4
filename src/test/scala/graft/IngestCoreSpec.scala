package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.domain.Model.RawSegment
import graft.ingest.{ConceptBuilder, Parsers, Unitizer}

/** Parity specs for the per-document ingest folds. Expected tuples were
  * produced by executing the reference implementation
  * (ingestion/segmentation.py, ingestion/parsers/{markdown,ocr}.py) on the
  * same fixtures.
  */
class IngestCoreSpec extends AnyFunSuite {

  private def seg(kind: String, content: String, lang: Option[String],
      order: Int): RawSegment =
    RawSegment("doc1", kind, content, lang, order, None)

  test("unitizer: pre_text + python + javascript absorb, tail orphans") {
    val fixture = IndexedSeq(
      seg("text", "Intro paragraph about the function.", None, 0),
      seg("text", "More context right before code.", None, 1),
      seg("code", "def add(a, b):\n    return a + b", Some("python"), 2),
      seg("code", "print(add(1, 2))", Some("python"), 3),
      seg("code", "console.log('hi');", Some("javascript"), 4),
      seg("text", "T" * 600, None, 5),
      seg("image", "fig caption\nimg.png", Some("image"), 6),
      seg("text", "tail.", None, 7))
    val out = new Unitizer().unitize(fixture)
      .map(u => (u.unitId.orNull, u.role, u.order))
    assert(out == Seq(
      ("a804a369770617b0", "pre_text", 0),
      ("a804a369770617b0", "pre_text", 1),
      ("a804a369770617b0", "python", 2),
      ("a804a369770617b0", "python", 3),
      ("a804a369770617b0", "javascript", 4),
      (null, "other", 5),
      (null, "other", 6),
      (null, "other", 7)))
  }

  test("unitizer: buffer overflow flushes text-only unit") {
    val fixture = IndexedSeq(
      seg("text", "A" * 2500, None, 0),
      seg("text", "B" * 2500, None, 1),
      seg("text", "C" * 100, None, 2))
    val out = new Unitizer().unitize(fixture)
      .map(u => (u.unitId.orNull, u.role, u.order))
    assert(out == Seq(
      ("txt-2d6c3dd4f775", "text_unit", 0),
      ("txt-2d6c3dd4f775", "text_unit", 1),
      (null, "other", 2)))
  }

  test("unitizer: lone javascript and table stay other; trailing long text units") {
    val fixture = IndexedSeq(
      seg("text", "short pre", None, 0),
      seg("code", "var x = 1;", Some("javascript"), 1),
      seg("table", "a|b", None, 2),
      seg("text", "post text here that is long enough " * 20, None, 3))
    val out = new Unitizer().unitize(fixture)
      .map(u => (u.unitId.orNull, u.role, u.order))
    assert(out == Seq(
      (null, "other", 0),
      (null, "other", 1),
      (null, "other", 2),
      ("txt-cff20d6f0bb0", "text_unit", 3)))
  }

  test("markdown parser: fences, inline image split, lang normalization") {
    val fixture =
      """# Title
        |
        |Intro paragraph with an image ![alt text](img/pic.png) inline.
        |
        |```py
        |def f():
        |    return 1
        |```
        |
        |Closing text.
        |
        |```
        |const y = 2;
        |let z = 3;
        |```
        |""".stripMargin
    val out = Parsers.parseMarkdown("doc1", fixture)
      .map(s => (s.kind, s.content, s.language.orNull, s.order))
    assert(out == Seq(
      ("text", "# Title\n\nIntro paragraph with an image", null, 0),
      ("image", "alt text\nimg/pic.png", "image", 1),
      ("text", "inline.", null, 2),
      ("code", "def f():\n    return 1", "python", 3),
      ("text", "Closing text.", null, 4),
      ("code", "const y = 2;\nlet z = 3;", "javascript", 5)))
  }

  test("ocr parser plain mode: paragraph split + code detection") {
    val out = Parsers.parseText("doc1",
      "First paragraph long enough to stand alone.\n\ndef add(a, b):\n    return a + b\n\nSecond plain paragraph.")
      .map(s => (s.kind, s.content, s.language.orNull, s.order))
    assert(out == Seq(
      ("text", "First paragraph long enough to stand alone.", null, 0),
      ("code", "def add(a, b):\n    return a + b", "python", 1),
      ("text", "Second plain paragraph.", null, 2)))
  }

  test("concept builder: unit concepts in first-appearance order, orphan chunking") {
    val fixture = IndexedSeq(
      seg("text", "Pre text for the unit that is reasonably sized.", None, 0),
      seg("code", "def f():\n    return 42", Some("python"), 1),
      seg("text", "orphan one.", None, 2),
      seg("image", "cap\nurl.png", Some("image"), 3))
    val unitized = new Unitizer().unitize(fixture)
    val built = ConceptBuilder.build("d" * 32, unitized)
    assert(built.concepts.length == 2)
    val Seq(unitConcept, orphanConcept) = built.concepts
    assert(unitConcept.order == 0)
    assert(unitConcept.metadata("unit_type") == "semantic_unit")
    assert(unitConcept.id.length == 16)
    assert(orphanConcept.id.startsWith("dddddddd-orphans-"))
    val unitFrags = built.fragments.filter(_.concept_id == unitConcept.id)
    assert(unitFrags.map(_.view) == Seq("text", "code"))
    assert(unitFrags.map(_.order) == Seq(0, 1))
    // orphan text got re-chunked (single small chunk) + image kept atomic
    val orphanFrags = built.fragments.filter(_.concept_id == orphanConcept.id)
    assert(orphanFrags.map(f => (f.view, f.unit_role)) ==
      Seq(("text", "chunked_text"), ("image", "other")))
    // fragment id shape: concept[:12]-order-hash8
    built.fragments.foreach { f =>
      assert(f.id.startsWith(f.concept_id.take(12) + "-" + f.order + "-"))
      assert(f.id.split("-").last.length == 8)
    }
  }
}
