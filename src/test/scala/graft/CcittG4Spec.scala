package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CcittG4, PdfWriter, RealPdfExtractor}

/** CCITT Group 4 codec ([[graft.sources.CcittG4]]) — the scanned-corpus
  * image compression. Contracts:
  *
  *  1. encode∘decode is the identity on every raster shape (vertical,
  *     horizontal and pass modes, makeup-chained wide runs, degenerate
  *     1-column/all-white/all-black inputs);
  *  2. height is recovered from the DATA (no /Rows given to the
  *     decoder), and truncated/garbage input degrades to fewer rows or
  *     None — never throws, never loops;
  *  3. the PDF integration labels a G4 XObject from the DECODED raster
  *     (overriding the dict's lying dims) and labels JBIG2/JPX
  *     `undecoded` with dict dims.
  */
class CcittG4Spec extends AnyFunSuite {

  private def roundTrip(rows: Seq[Array[Boolean]], w: Int): Unit = {
    val enc = CcittG4.encode(rows, w)
    val dec = CcittG4.decode(enc, w)
    assert(dec.isDefined, s"decode failed (w=$w rows=${rows.length})")
    val d = dec.get
    assert(d.height == rows.length, s"rows ${d.height} != ${rows.length}")
    d.rows.zip(rows).zipWithIndex.foreach { case ((got, want), y) =>
      assert(got.sameElements(want), s"row $y diverged (w=$w)")
    }
  }

  test("round-trip across 60 fixture rasters (all three coding modes)") {
    (0 until 60).foreach { m =>
      roundTrip(PdfWriter.g4Raster(m), PdfWriter.g4Dims(m)._1)
    }
  }

  test("round-trip on degenerate and makeup-chained shapes") {
    roundTrip(Seq.fill(5)(Array.fill(10)(false)), 10) // all white
    roundTrip(Seq.fill(5)(Array.fill(10)(true)), 10) // all black
    roundTrip(Seq.fill(7)(Array(true)), 1) // single column
    roundTrip(Seq(Array.tabulate(64)(i => i % 2 == 0)), 64) // 1-px stripes
    // wide runs force makeup + terminal composition (2560-chained)
    roundTrip(Seq(Array.fill(2560)(true), Array.fill(2560)(false)), 2560)
    roundTrip(Seq(
      Array.tabulate(3000)(i => i >= 1700), // 1700 white, 1300 black
      Array.fill(3000)(false)), 3000)
    // checkerboard alternating per row — vertical-mode heavy
    roundTrip((0 until 9).map(y =>
      Array.tabulate(17)(x => (x + y) % 2 == 0)), 17)
  }

  test("truncated and garbage input degrade, never throw or loop") {
    val enc = CcittG4.encode(PdfWriter.g4Raster(7), PdfWriter.g4Dims(7)._1)
    val w = PdfWriter.g4Dims(7)._1
    // every prefix decodes to SOME rows or None, never throws
    (0 until enc.length).foreach { n =>
      val d = CcittG4.decode(enc.take(n), w)
      d.foreach(x => assert(x.height <= PdfWriter.g4Raster(7).length))
    }
    // random-ish garbage (deterministic bytes)
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte)
    CcittG4.decode(junk, 20) // must return without throwing
    assert(CcittG4.decode(Array.emptyByteArray, 20).isEmpty)
    assert(CcittG4.decode(junk, 0).isEmpty)
  }

  test("compression-bomb rows stop at the pixel budget (ADVICE r9)") {
    // an all-uniform G4 row costs ~2 bits (one V0 code), so a few KB
    // of stream could otherwise materialize cols*65536 booleans; the
    // extractor call site budgets maxRows = (1<<25)/cols
    val cols = 4096
    val tall = Seq.fill(20000)(new Array[Boolean](cols))
    val enc = CcittG4.encode(tall, cols)
    assert(enc.length < 16 * 1024, s"bomb premise: ${enc.length} bytes")
    val budget = math.max(1, ((1L << 25) / cols).toInt)
    val d = CcittG4.decode(enc, cols, maxRows = budget)
    assert(d.exists(_.height <= budget))
  }

  test("array-form /Filter + /DecodeParms (the standard PDF shape) decodes") {
    val m = 4
    val bytes = PdfWriter.buildScan(
      Seq(PdfWriter.PageSpec(Seq("scan page"), Map(0 -> 1))),
      compress = false, seed = m)
    val s = new String(bytes, "ISO-8859-1")
    // rewrite the G4 XObject to the array spelling real producers emit:
    // /Filter [/CCITTFaxDecode] /DecodeParms [<< ... >>] — the extractor
    // scans object bodies, so the shifted xref offsets are irrelevant
    val (gw, _) = PdfWriter.g4Dims(m)
    val single = s"/Filter /CCITTFaxDecode " +
      s"/DecodeParms << /K -1 /Columns $gw /BlackIs1 true >>"
    assert(s.contains(single), "fixture layout changed")
    val arrayForm = s"/Filter [/CCITTFaxDecode] " +
      s"/DecodeParms [<< /K -1 /Columns $gw /BlackIs1 true >>]"
    val rewritten = s.replace(single, arrayForm).getBytes("ISO-8859-1")
    val imgs = RealPdfExtractor.extract("scan.pdf", rewritten)
      .filter(_.isImage).map(_.content)
    val (w, h) = PdfWriter.g4Dims(m)
    val black = (for (y <- 0 until h; x <- 0 until w
      if PdfWriter.g4Pixel(m, x, y)) yield 1).sum
    assert(imgs.contains(s"Im0 ${w}x$h g4 b$black"), imgs.mkString("; "))
  }

  test("PDF integration: G4 label from the decoded raster, stubs honest") {
    val m = 13
    val bytes = PdfWriter.buildScan(
      Seq(PdfWriter.PageSpec(Seq("scan page one"), Map(0 -> 3))),
      compress = false, seed = m)
    val imgs = RealPdfExtractor.extract("scan.pdf", bytes)
      .filter(_.isImage).map(_.content)
    val (gw, gh) = PdfWriter.g4Dims(m)
    val black = (for (y <- 0 until gh; x <- 0 until gw
      if PdfWriter.g4Pixel(m, x, y)) yield 1).sum
    // dict says (gw-1)x(gh-1); only the decode recovers the truth
    assert(imgs.contains(s"Im0 ${gw}x$gh g4 b$black"), imgs.mkString("; "))
    val (jw, jh) = PdfWriter.jbig2Dims(m)
    val (xw, xh) = PdfWriter.jpxDims(m)
    assert(imgs.contains(s"Im1 ${jw}x$jh jbig2 undecoded"))
    assert(imgs.contains(s"Im2 ${xw}x$xh jpx undecoded"))
  }
}
