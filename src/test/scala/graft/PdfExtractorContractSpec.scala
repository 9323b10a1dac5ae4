package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing
import graft.sources.PdfSource
import graft.sources.PdfSource.{PdfBlock, PdfExtractor}

/** The [[PdfSource.PdfExtractor]] deployment contract (VERDICT r5 task #8):
  * whatever library backs `extract` — pdfbox, PyMuPDF via a sidecar, the
  * stub — the downstream pipeline holds these invariants for ANY block
  * sequence it can emit. Property-tested with seeded generators over
  * arbitrary page/image/short/code block mixes, so plugging a real
  * extractor cannot break the source's semantics, only enrich its input.
  */
class PdfExtractorContractSpec extends AnyFunSuite {

  private val Cases = 120

  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    var executed = 0
    (0 until Cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { a =>
        executed += 1; f(a)
      }
    }
    assert(executed > Cases / 2, s"only $executed/$Cases cases generated")
  }

  /** Arbitrary extractor output: page-ordered blocks; text content is
    * tagged `pg<page>b<idx>` so provenance survives normalization and the
    * page-bounded-merge property is directly checkable on the output.
    */
  private val blocksGen: Gen[Seq[PdfBlock]] = for {
    nPages <- Gen.choose(1, 4)
    pages <- Gen.sequence[List[List[PdfBlock]], List[PdfBlock]]((0 until nPages).map { p =>
      for {
        nBlocks <- Gen.choose(0, 6)
        blocks <- Gen.sequence[List[PdfBlock], PdfBlock]((0 until nBlocks).map { b =>
          for {
            kind <- Gen.frequency(
              (5, Gen.const("text")), (2, Gen.const("short")),
              (2, Gen.const("image")), (1, Gen.const("code")))
            pad <- Gen.choose(0, 400)
          } yield kind match {
            case "image" => PdfBlock(p, isImage = true, s"pg${p}b$b diagram")
            case "short" => PdfBlock(p, isImage = false, "tiny")
            case "code" => PdfBlock(p, isImage = false,
              s"pg${p}b$b def handler(x):\n    import os\n    return x" + ("!" * pad))
            case _ => PdfBlock(p, isImage = false,
              s"pg${p}b$b plain prose content " + ("word " * (pad / 5)))
          }
        })
      } yield blocks
    }).map(_.flatten)
  } yield pages

  private def parse(blocks: Seq[PdfBlock]) = {
    val ex: PdfExtractor = new PdfExtractor {
      def extract(path: String, bytes: Array[Byte]): Seq[PdfBlock] = blocks
    }
    PdfSource.parsePdf("doc-x", "f.pdf", Array.emptyByteArray, ex)
  }

  test("any extractor output: parse is deterministic") {
    forAll(blocksGen) { blocks =>
      assert(parse(blocks) == parse(blocks))
    }
  }

  test("any extractor output: kinds are text/code/image, orders strictly increase") {
    forAll(blocksGen) { blocks =>
      val segs = parse(blocks)
      assert(segs.forall(s => Set("text", "code", "image").contains(s.kind)))
      val orders = segs.map(_.order)
      assert(orders == orders.sorted && orders.distinct == orders)
      assert(segs.forall(_.page.isDefined))
    }
  }

  test("any extractor output: min-length filter holds — no text/code segment under 10 code points") {
    forAll(blocksGen) { blocks =>
      parse(blocks).filter(_.kind != "image").foreach { s =>
        assert(Hashing.lengthCodePoints(s.content.trim) >= PdfSource.MinTextLength,
          s"under-min segment survived: '${s.content}'")
      }
    }
  }

  test("any extractor output: merges never cross a page (provenance tags agree)") {
    val tag = "pg(\\d+)b".r
    forAll(blocksGen) { blocks =>
      parse(blocks).foreach { s =>
        val pagesSeen = tag.findAllMatchIn(s.content).map(_.group(1).toInt).toSet
        assert(pagesSeen.size <= 1,
          s"segment merged across pages $pagesSeen: '${s.content.take(80)}...'")
        pagesSeen.headOption.foreach(p => assert(s.page.contains(p)))
      }
    }
  }

  test("any extractor output: image blocks are hard boundaries and all survive") {
    forAll(blocksGen) { blocks =>
      val segs = parse(blocks)
      val images = blocks.filter(_.isImage)
      assert(segs.count(_.kind == "image") == images.size)
      // an image never gets absorbed into a text merge
      assert(segs.filter(_.kind != "image").forall(!_.content.contains("diagram")))
    }
  }

  test("any extractor output: merge cap — all but the final constituent stay under 1500") {
    forAll(blocksGen) { blocks =>
      parse(blocks).filter(_.kind == "text").foreach { s =>
        val parts = s.content.split("\n\n")
        val withoutLast = parts.dropRight(1).mkString("\n\n")
        assert(Hashing.lengthCodePoints(withoutLast) < 1500,
          s"merge exceeded the page-bounded cap before its last block")
      }
    }
  }
}
