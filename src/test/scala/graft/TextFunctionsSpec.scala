package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Chunker, EmbedValidator, Hashing, TextUtils}

/** Parity specs: every expected value below was produced by executing the
  * reference implementation (shared/text_utils.py, embedding/validators.py,
  * shared/hashing.py) on the same inputs.
  */
class TextFunctionsSpec extends AnyFunSuite {

  test("normalize: ligatures, quotes, fullwidth, newline collapse, ocr fixes") {
    assert(TextUtils.normalize("Hello’s “world” ﬁne\n\n\n\nnext   \npara（１）， ok：")
      == "Hello's \"world\" fine\n\nnext\npara(１), ok:")
    assert(TextUtils.normalize("from pkg,module import x\nsome text 42\nline   123")
      == "from pkg.module import x\nsome text\nline")
    // the trailing-page-number regex also eats a trailing "1" after return
    assert(TextUtils.normalize("def foo():\n    return 1\n\nplain paragraph here")
      == "def foo():\n    return\nplain paragraph here")
    assert(TextUtils.normalize("코드 1-2 예제\nconst x = 5;\n")
      == "코드 1-2 예제\nconst x = 5;")
  }

  test("splitParagraph mirrors re.split(r'\\n{2,}')") {
    assert(TextUtils.splitParagraph("one\n\ntwo\n\n\nthree\n \n four")
      == Seq("one", "two", "three\n \n four"))
  }

  test("isCodeBlock heuristics") {
    assert(!TextUtils.isCodeBlock("Hello’s “world” ﬁne\n\n\n\nnext   \npara（１）， ok："))
    assert(TextUtils.isCodeBlock("from pkg,module import x\nsome text 42\nline   123"))
    assert(TextUtils.isCodeBlock("def foo():\n    return 1\n\nplain paragraph here"))
    assert(TextUtils.isCodeBlock("코드 1-2 예제\nconst x = 5;\n"))
    assert(TextUtils.isCodeBlock("a; b; c")) // two ';' occurrences
    assert(TextUtils.isCodeBlock("   indented\n    line one\n    line two"))
  }

  test("guessCodeLang tie-breaks and sign counts") {
    assert(TextUtils.guessCodeLang("from pkg,module import x\nsome text").contains("python"))
    assert(TextUtils.guessCodeLang("코드 1-2 예제\nconst x = 5;\n").contains("javascript"))
    assert(TextUtils.guessCodeLang("a; b; c").isEmpty)
    assert(TextUtils.guessCodeLang("plain words only").isEmpty)
  }

  test("splitCodeSafely: small blocks kept verbatim, oversize packed with overlap") {
    val code = "def a():\n    pass\n\ndef b():\n" + "    x = 1\n" * 100
    val chunks = TextUtils.splitCodeSafely(code, 900, 10)
    assert(chunks.length == 4)
    assert(chunks(0) == "def a():\n    pass\n\n") // un-stripped short block
    assert(chunks(1).startsWith("def b():\n    x = 1"))
    assert(chunks.forall(_.length <= 900))
    // 10-line overlap: each continuation chunk re-starts inside the
    // previous chunk's tail
    assert(chunks(2).split("\n").length == 21)
    assert(chunks(3) == ("x = 1\n" + "    x = 1\n" * 9).trim)
  }

  test("mergeOcrLines: short-line merging with code/heading breaks") {
    val merged = TextUtils.mergeOcrLines(
      "short line\nanother short\n" + "x" * 200 + "\n1.2 Heading here\nmore text after heading")
    assert(merged == "short line another short " + "x" * 200 +
      "\n\n1.2 Heading here\n\nmore text after heading")
  }

  test("normLang maps aliases") {
    assert(TextUtils.normLang("py").contains("python"))
    assert(TextUtils.normLang("TSX").contains("javascript"))
    assert(TextUtils.normLang("rust").contains("rust"))
    assert(TextUtils.normLang("").isEmpty)
  }

  test("validator: reference 22-case table") {
    val expect: Seq[(String, Boolean)] = Seq(
      "Copyright © 2024 Example Corp" -> false,
      "All rights reserved" -> false,
      "저작권 소유" -> false,
      "Page 42" -> false,
      "42 Page" -> false,
      "페이지 3" -> false,
      "  123  " -> false,
      "See Figure 3 for details of the architecture" -> false,
      "see figure 3" -> false,
      "그림 3 참조" -> false,
      "코드 1-1" -> false, // < 10 chars (FRAG-LEN-001)
      "[주석]" -> false,
      "Note: short" -> false,
      "다음과 같이" -> false,
      "1." -> false,
      "same\nsame\nsame" -> false,
      "short" -> false,
      "This is a perfectly fine paragraph describing the system in detail." -> true,
      "def add(a, b):\n    return a + b" -> true,
      "표 2 참고" -> false,
      "refer to table 12" -> false,
      "5. 결론적으로 이 장에서는 다양한 내용을 다루었다" -> true)
    expect.foreach { case (content, eligible) =>
      assert(EmbedValidator.isEligible(content) == eligible, s"case: $content")
    }
  }

  test("hashing known vectors (python hashlib parity)") {
    assert(Hashing.documentId("docs/sample.md") == "abbfcb79c68943bcd5abfbfb366618a9")
    assert(Hashing.conceptId("abc", "unit1") == "e9dc0054b24aed55")
    assert(Hashing.contentHash("parent1", "code", Some("python"), "def f(): pass")
      == "ad5181c04083d223ca8c815104e1434d")
    assert(Hashing.docId("parent1", "code", Some("python"), "def f(): pass")
      == "doc:ad5181c04083d223ca8c815104e1434d")
  }

  test("slugify and korean detection") {
    assert(TextUtils.slugify("Héllo,  Wörld! -- Test") == "hello-world-test")
    assert(TextUtils.isKorean("plain 한국어 mixed"))
    assert(!TextUtils.isKorean("plain english"))
  }

  test("chunker: basic paragraph split with overlap carry") {
    val c = new Chunker(chunkSize = 20, chunkOverlap = 5)
    val chunks = c.chunk("aaaa bbbb\n\ncccc dddd\n\neeee ffff")
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 20))
    // every non-whitespace char of the input appears in some chunk
    val joined = chunks.mkString(" ")
    Seq("aaaa", "bbbb", "cccc", "dddd", "eeee", "ffff").foreach(w =>
      assert(joined.contains(w), s"missing $w in $chunks"))
  }

  test("chunker: no split needed returns whole text") {
    val c = new Chunker(chunkSize = 600, chunkOverlap = 100)
    assert(c.chunk("short text") == Seq("short text"))
    assert(c.chunk("   ") == Nil)
    assert(c.chunk(null) == Nil)
  }

  test("chunker: long unbroken word falls through separators") {
    val c = new Chunker(chunkSize = 10, chunkOverlap = 2)
    val chunks = c.chunk("x" * 35)
    assert(chunks.forall(_.length <= 10))
    assert(chunks.map(_.length).sum >= 35)
  }
}
