package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Jbig2, PdfWriter, RealPdfExtractor}

/** JBIG2 codec ([[graft.sources.Jbig2]]) — the arithmetic-coded
  * scanned-corpus image compression. Contracts:
  *
  *  1. encode∘decode is the identity on every raster shape, for all four
  *     GB templates and with TPGDON on/off (typical-prediction rows);
  *  2. BOTH dimensions come from the DATA (the region segment info), so
  *     a dict that lies about geometry cannot survive a real decode;
  *  3. truncated/garbage input and non-generic-region streams (symbol
  *     dictionaries) degrade to None — never throw, never loop;
  *  4. the segment parser walks unknown segments by their recorded data
  *     length (long-form referred counts, 4-byte page associations) and
  *     still finds the region;
  *  5. the PDF integration labels a real JBIG2 XObject from the DECODED
  *     raster (overriding the dict's lying dims), keeps `undecoded` for
  *     payloads it cannot decode, and memoizes per object.
  */
class Jbig2Spec extends AnyFunSuite {

  private def roundTrip(rows: Seq[Array[Boolean]], w: Int,
      template: Int = 0, tpgdon: Boolean = false): Unit = {
    val enc = Jbig2.encodeEmbedded(rows, w, template, tpgdon)
    val dec = Jbig2.decode(enc)
    assert(dec.isDefined,
      s"decode failed (w=$w rows=${rows.length} t=$template tpgdon=$tpgdon)")
    val d = dec.get
    assert(d.width == w && d.height == rows.length,
      s"geometry ${d.width}x${d.height} != ${w}x${rows.length}")
    d.rows.zip(rows).zipWithIndex.foreach { case ((got, want), y) =>
      assert(got.sameElements(want), s"row $y diverged (w=$w t=$template)")
    }
  }

  test("round-trip across 60 fixture rasters (MQ coder + template 0)") {
    (0 until 60).foreach { m =>
      roundTrip(PdfWriter.jb2Raster(m), PdfWriter.jb2Dims(m)._1)
    }
  }

  test("round-trip under every GB template, with and without TPGDON") {
    val rows = PdfWriter.jb2Raster(11)
    val w = PdfWriter.jb2Dims(11)._1
    for (t <- 0 to 3; tp <- Seq(false, true)) roundTrip(rows, w, t, tp)
    // TPGDON with actual typical (repeated) rows — the skip path runs
    val striped = Seq.tabulate(12)(y =>
      Array.tabulate(23)(x => (y / 3) % 2 == 0 && x % 5 < 2))
    for (t <- 0 to 3) roundTrip(striped, 23, t, tpgdon = true)
  }

  test("MMR (T.6-coded) generic regions round-trip via the G4 codec") {
    (0 until 12).foreach { m =>
      val rows = PdfWriter.jb2Raster(m)
      val w = PdfWriter.jb2Dims(m)._1
      val enc = Jbig2.encodeEmbedded(rows, w, mmr = true)
      val dec = Jbig2.decode(enc)
      assert(dec.isDefined, s"MMR decode failed m=$m")
      assert(dec.get.width == w && dec.get.height == rows.length)
      dec.get.rows.zip(rows).foreach { case (got, want) =>
        assert(got.sameElements(want))
      }
    }
  }

  test("round-trip on degenerate shapes") {
    roundTrip(Seq.fill(5)(Array.fill(10)(false)), 10) // all white
    roundTrip(Seq.fill(5)(Array.fill(10)(true)), 10) // all black
    roundTrip(Seq.fill(7)(Array(true)), 1) // single column
    roundTrip(Seq(Array.tabulate(64)(i => i % 2 == 0)), 64) // 1-px stripes
    roundTrip((0 until 9).map(y =>
      Array.tabulate(17)(x => (x + y) % 2 == 0)), 17) // checkerboard
    roundTrip(Seq(Array.fill(300)(true), Array.fill(300)(false),
      Array.tabulate(300)(_ % 2 == 0)), 300) // wide rows
  }

  test("truncated and garbage input degrade to None, never throw or loop") {
    val enc = Jbig2.encodeEmbedded(PdfWriter.jb2Raster(7),
      PdfWriter.jb2Dims(7)._1)
    // truncated prefixes: decode may return fewer/garbled pixels inside
    // the declared geometry (the MQ decoder pads with 1-bits past the
    // end) or None — but must return
    (0 until enc.length by 3).foreach { n =>
      Jbig2.decode(enc.take(n)) // must not throw
    }
    // flipped bytes keep the walk bounded
    (0 until enc.length by 7).foreach { i =>
      val mut = enc.clone(); mut(i) = (mut(i) ^ 0x5A).toByte
      Jbig2.decode(mut)
    }
    assert(Jbig2.decode("jbig2-stub-3".getBytes("ISO-8859-1")).isEmpty)
    assert(Jbig2.decode(Array.empty[Byte]).isEmpty)
    assert(Jbig2.decode(Array.fill(64)(0xFF.toByte)).isEmpty)
  }

  test("segment walk skips unknown segments and finds the region") {
    val enc = Jbig2.encodeEmbedded(PdfWriter.jb2Raster(4),
      PdfWriter.jb2Dims(4)._1)
    // hand-craft an extension segment (type 62) with a 4-byte page
    // association and splice it before the stream: the parser must skip
    // it by data length and still decode
    val ext = Array[Byte](
      0, 0, 0, 9, // segment number 9
      (0x40 | 62).toByte, // flags: type 62, 4-byte page assoc
      0x00, // no referred segments
      0, 0, 0, 1, // page 1
      0, 0, 0, 4, // data length 4
      1, 2, 3, 4) // payload
    val dec = Jbig2.decode(ext ++ enc)
    assert(dec.isDefined)
    assert(dec.get.width == PdfWriter.jb2Dims(4)._1)
    // same stream via the globals parameter (the /JBIG2Globals shape)
    val viaGlobals = Jbig2.decode(enc, Some(ext))
    assert(viaGlobals.isDefined &&
      viaGlobals.get.blackCount == dec.get.blackCount)
  }

  test("page-info geometry wins over a trimmed region (trailing white)") {
    val (w, h) = PdfWriter.jb2Dims(9)
    val enc = Jbig2.encodeEmbedded(PdfWriter.jb2Raster(9), w)
    // page-info height lives at bytes 11+4..11+7 (segment header 11B,
    // then width u32, height u32); declare two extra (white) rows — a
    // producer legally trims them from the region, the page keeps them
    val mut = enc.clone()
    mut(11 + 7) = (mut(11 + 7) + 2).toByte
    val d = Jbig2.decode(mut)
    assert(d.isDefined && d.get.width == w && d.get.height == h + 2)
    assert(d.get.blackCount == Jbig2.decode(enc).get.blackCount)
  }

  test("the pixel budget bounds the TOTAL across regions") {
    val (w, h) = PdfWriter.jb2Dims(3)
    val enc = Jbig2.encodeEmbedded(PdfWriter.jb2Raster(3), w)
    assert(Jbig2.decode(enc, maxPixels = w.toLong * h).isDefined)
    assert(Jbig2.decode(enc, maxPixels = w.toLong * h - 1).isEmpty,
      "a region over budget must be skipped, not allocated")
  }

  test("generic refinement regions REPLACE their rect, both templates") {
    def raster(w: Int, h: Int)(f: (Int, Int) => Boolean) =
      (0 until h).map(y => Array.tabulate(w)(x => f(x, y)))
    val w = 42; val h = 30
    val base = raster(w, h)((x, y) => (x / 3 + y / 2) % 2 == 0)
    for (template <- 0 to 1; tpgron <- Seq(false, true)) {
      // the refined rect DIFFERS from the base under it — including
      // cleared pixels, which an OR composite could never express
      val refined = raster(16, 12)((x, y) => (x + y) % 3 == 0)
      val enc = Jbig2.encodeRefinedDocument(base, w, rx = 8, ry = 6,
        refined, template = template, tpgron = tpgron)
      val d = Jbig2.decode(enc)
        .getOrElse(fail(s"t=$template tpgron=$tpgron decode failed"))
      assert(d.width == w && d.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val want =
          if (x >= 8 && x < 24 && y >= 6 && y < 18) refined(y - 6)(x - 8)
          else base(y)(x)
        assert(d.rows(y)(x) == want,
          s"t=$template tpgron=$tpgron pixel ($x,$y)")
      }
    }
    // a refinement identical to its reference (the TPGRON-every-row
    // shape: all pixels typical) and one at the page corner (reference
    // neighborhood out of bounds on two sides)
    val same = raster(10, 8)((x, y) => base(y)(x))
    val dSame = Jbig2.decode(Jbig2.encodeRefinedDocument(base, w, 0, 0,
      same, tpgron = true)).get
    assert((0 until 8).forall(y => (0 until 10).forall(x =>
      dSame.rows(y)(x) == base(y)(x))))
    // fuzz: truncations and bit flips stay bounded, never throw
    val enc = Jbig2.encodeRefinedDocument(base, w, 8, 6,
      raster(16, 12)((x, y) => x % 2 == y % 2), tpgron = true)
    (0 until enc.length by 5).foreach(n => Jbig2.decode(enc.take(n)))
    (0 until enc.length by 7).foreach { i =>
      val mut = enc.clone(); mut(i) = (mut(i) ^ 0x2D).toByte
      Jbig2.decode(mut)
    }
  }

  test("a refinement referring to a retained region skips honestly") {
    val base = (0 until 12).map(y =>
      Array.tabulate(20)(x => (x + y) % 2 == 0))
    val refined = (0 until 6).map(y => Array.tabulate(8)(x => x % 3 == 0))
    val enc = Jbig2.encodeRefinedDocument(base, 20, 4, 3, refined)
    // surgically give the type-43 segment one referred segment: its
    // reference is then a RETAINED intermediate region (7.4.7), which
    // this decoder does not keep — decoding against the page instead
    // would be confident garbage
    val hdrAt = (0 until enc.length - 5).find { i =>
      // segment number 3, type 43, zero refs, page 1
      enc(i) == 0 && enc(i + 1) == 0 && enc(i + 2) == 0 &&
        enc(i + 3) == 3 && (enc(i + 4) & 0x3F) == 43
    }.getOrElse(fail("type-43 header not found"))
    val mut = enc.take(hdrAt + 5) ++
      Array[Byte]((1 << 5).toByte, 2) ++ enc.drop(hdrAt + 6)
    val d = Jbig2.decode(mut).getOrElse(fail("base must still decode"))
    assert(d.rows.zip(base).forall { case (g, w) => g.sameElements(w) },
      "the referring refinement must be skipped, leaving the base")
  }

  test("SDREFAGG dictionaries and REFINE text regions restore true ink") {
    // base glyphs carry a SPARSER pixel rule than the truth; the refagg
    // dictionary refines them to the true rule, and every third
    // instance instead references a sparse base glyph refined inline
    // (REFINE). The page ink equals the true rule exactly — reachable
    // only through §6.5.8.2 + §6.4.11, never by drawing base glyphs.
    def glyph(k: Int, thresh: Int): Array[Array[Boolean]] =
      PdfWriter.jb2GlyphAt(k, thresh)
    for (m <- Seq(0, 4, 11, 23)) {
      val n = 3 + m % 3
      val base = (0 until n).map(k => glyph(k, 2)).toIndexedSeq
      val truth = (0 until n).map(k => glyph(k, 3)).toIndexedSeq
      val variants = (0 until n).map(k => (truth(k), k, 0, 0)).toIndexedSeq
      val ninst = 6 + m % 5
      val insts = (0 until ninst).map { j =>
        val k = (j * 2 + m) % n
        val inst = graft.sources.Jbig2.TextInstance(k, 11 * j, 3 + (j % 3))
        if (j % 3 == 2) inst.copy(refine = Some((truth(k), 0, 0)))
        else inst.copy(id = n + k) // the dict-refined true glyph
      }
      val (pw, ph) = (11 * (ninst - 1) + 8, 12)
      val enc = Jbig2.encodeTextDocument(pw, ph, base, insts,
        refAggVariants = variants)
      val d = Jbig2.decode(enc).getOrElse(fail(s"m=$m decode failed"))
      assert(d.width == pw && d.height == ph, s"m=$m geometry")
      val want = (0 until ninst).map { j =>
        truth((j * 2 + m) % n).map(_.count(identity)).sum
      }.sum
      assert(d.blackCount == want,
        s"m=$m ink ${d.blackCount} != $want (true-rule glyphs)")
    }
    // refinement with CHANGED dims: the placed bitmap's own w/h drive
    // advancement and drawing (6.4.11 places at refined size)
    val sym = glyph(2, 3)
    val bigger = Array.tabulate(sym.length + 2, sym(0).length + 3)(
      (y, x) => (x + y) % 2 == 0)
    val insts2 = Seq(
      graft.sources.Jbig2.TextInstance(0, 0, 1,
        refine = Some((bigger, 1, -1))),
      graft.sources.Jbig2.TextInstance(0, 20, 2))
    val enc2 = Jbig2.encodeTextDocument(40, 14, IndexedSeq(sym), insts2)
    val d2 = Jbig2.decode(enc2).getOrElse(fail("resized refine failed"))
    val want2 = bigger.map(_.count(identity)).sum +
      sym.map(_.count(identity)).sum
    assert(d2.blackCount == want2, "refined dims must drive placement")
    // fuzz: truncations and flips on the refagg organization
    val encF = Jbig2.encodeTextDocument(63, 12,
      (0 until 3).map(k => glyph(k, 2)).toIndexedSeq,
      (0 until 6).map(j => graft.sources.Jbig2.TextInstance(3 + j % 3,
        11 * j, 3)),
      refAggVariants = (0 until 3).map(k =>
        (glyph(k, 3), k, 0, 0)).toIndexedSeq)
    (0 until encF.length by 5).foreach(nn => Jbig2.decode(encF.take(nn)))
    (0 until encF.length by 7).foreach { i =>
      val mut = encF.clone(); mut(i) = (mut(i) ^ 0x4B).toByte
      Jbig2.decode(mut)
    }
  }

  test("REFAGGNINST > 1: aggregate symbols compose nested text regions") {
    // base glyphs, then a LIGATURE symbol built as an aggregate of two
    // refined instances — the wild use: a wide glyph composed from
    // narrower ones, some touched up in place
    val g0 = PdfWriter.jb2GlyphAt(0, 3) // 4x5
    val g1 = PdfWriter.jb2GlyphAt(1, 3) // 5x5
    val g1var = PdfWriter.jb2GlyphAt(1, 2) // refined variant, same dims
    val lig = {
      val rows = Array.ofDim[Boolean](5, 11)
      for (y <- 0 until 5; x <- 0 until 4 if g0(y)(x)) rows(y)(x) = true
      for (y <- 0 until 5; x <- 0 until 5 if g1var(y)(x))
        rows(y)(6 + x) = true
      rows
    }
    val aggInsts = Seq(
      Jbig2.TextInstance(0, 0, 0),
      Jbig2.TextInstance(1, 6, 0, refine = Some((g1var, 0, 0))))
    // page: one instance of each base glyph + the ligature; ids index
    // the refagg dictionary's exports = base ++ new, so lig id = 2
    val pageInsts = Seq(Jbig2.TextInstance(0, 0, 3),
      Jbig2.TextInstance(1, 11, 3), Jbig2.TextInstance(2, 22, 3))
    val enc = Jbig2.encodeTextDocument(33, 12, IndexedSeq(g0, g1),
      pageInsts, refAggVariants = IndexedSeq((lig, 0, 0, 0)),
      refAggAggregates = Map(0 -> aggInsts))
    val d = Jbig2.decode(enc).getOrElse(fail("aggregate decode"))
    val want = Seq(g0, g1, lig).map(_.map(_.count(identity)).sum).sum
    assert(d.width == 33 && d.height == 12 && d.blackCount == want,
      s"${d.width}x${d.height} b${d.blackCount} != 33x12 b$want")
    // fuzz the aggregate organization
    (0 until enc.length by 5).foreach(n => Jbig2.decode(enc.take(n)))
    (0 until enc.length by 7).foreach { i =>
      val mut = enc.clone(); mut(i) = (mut(i) ^ 0x6C).toByte
      Jbig2.decode(mut)
    }
  }

  test("Huffman dictionaries with CUSTOM DH/DW code tables round-trip") {
    for (m <- Seq(0, 5, 13, 28); mmr <- Seq(false, true)) {
      val n = PdfWriter.jb2NumSyms(m)
      val syms = (0 until n).map(PdfWriter.jb2Glyph)
      val insts = PdfWriter.jb2TextInstances(m)
      val (pw, ph) = PdfWriter.jb2TextDims(m)
      val enc = Jbig2.encodeTextDocument(pw, ph, syms, insts,
        huffDict = true, dictMmr = mmr, huffText = true,
        customDictTables = true)
      val d = Jbig2.decode(enc).getOrElse(fail(s"m=$m mmr=$mmr failed"))
      val want = insts.map(i =>
        syms(i.id).map(_.count(identity)).sum).sum
      assert(d.width == pw && d.height == ph && d.blackCount == want,
        s"m=$m mmr=$mmr: ${d.width}x${d.height} b${d.blackCount} " +
          s"!= ${pw}x$ph b$want")
      // identical page to the standard-table organization
      val std = Jbig2.decode(Jbig2.encodeTextDocument(pw, ph, syms,
        insts, huffDict = true, dictMmr = mmr, huffText = true)).get
      assert(std.blackCount == d.blackCount)
    }
    // a custom selection whose referred tables are missing must skip
    // the dictionary (no symbols -> no region -> honest None)
    val syms1 = IndexedSeq(PdfWriter.jb2Glyph(0))
    val enc1 = Jbig2.encodeTextDocument(30, 12, syms1,
      Seq(Jbig2.TextInstance(0, 0, 3)), huffDict = true,
      customDictTables = true)
    // surgically clear the dictionary's referred-segment count: the
    // selection-3 flags then find no tables
    val hdrAt = (0 until enc1.length - 5).find { i =>
      enc1(i) == 0 && enc1(i + 1) == 0 && enc1(i + 2) == 0 &&
        enc1(i + 3) == 4 && (enc1(i + 4) & 0x3F) == 0
    }.getOrElse(fail("dict header not found"))
    val mut = enc1.take(hdrAt + 5) ++ Array[Byte](0) ++
      enc1.drop(hdrAt + 8) // refs count 2 -> 0, drop the 2 ref bytes
    assert(Jbig2.decode(mut).isEmpty,
      "selection 3 with no referred tables must degrade, not guess")
  }

  test("refinement regions debit the budget for rows AND reference") {
    val base = (0 until 20).map(y =>
      Array.tabulate(40)(x => (x + y) % 2 == 0))
    val refined = (0 until 20).map(y =>
      Array.tabulate(40)(x => x % 3 == 0))
    val enc = Jbig2.encodeRefinedDocument(base, 40, 0, 0, refined)
    assert(Jbig2.decode(enc, maxPixels = 3L * 40 * 20).isDefined)
    // base debits 800; the refinement needs 2*800 headroom on top
    val tight = Jbig2.decode(enc, maxPixels = 2L * 40 * 20)
    assert(tight.forall(d => d.rows.zip(base).forall { case (g, w2) =>
      g.sameElements(w2) }), "over-budget refinement must be skipped, " +
      "leaving the base region decode")
  }

  test("every coding organization decodes the SAME page identically") {
    // one glyph layout pushed through six wire organizations — any
    // context/table/protocol asymmetry between them shows up as a
    // pixel diff here, the cross-check a single round-trip cannot do
    for (m <- Seq(2, 7, 16)) {
      val n = PdfWriter.jb2NumSyms(m)
      val syms = (0 until n).map(PdfWriter.jb2Glyph)
      val insts = PdfWriter.jb2TextInstances(m)
      val (pw, ph) = PdfWriter.jb2TextDims(m)
      val truth = (0 until n).map(k => PdfWriter.jb2GlyphAt(k, 3))
      val sparse = (0 until n).map(PdfWriter.jb2GlyphSparse)
      val organizations = Seq(
        "arith" -> Jbig2.encodeTextDocument(pw, ph, syms, insts),
        "huff" -> Jbig2.encodeTextDocument(pw, ph, syms, insts,
          huffDict = true, huffText = true),
        "huff-mmr" -> Jbig2.encodeTextDocument(pw, ph, syms, insts,
          huffDict = true, dictMmr = true, huffText = true),
        "huff-custom" -> Jbig2.encodeTextDocument(pw, ph, syms, insts,
          huffDict = true, huffText = true, customDictTables = true),
        "refagg" -> Jbig2.encodeTextDocument(pw, ph, sparse,
          insts.map(t => t.copy(id = n + t.id)),
          refAggVariants = (0 until n).map(k =>
            (truth(k), k, 0, 0)).toIndexedSeq),
        "refine" -> Jbig2.encodeTextDocument(pw, ph, sparse,
          insts.map(t => t.copy(refine = Some((truth(t.id), 0, 0))))))
      val pages = organizations.map { case (name, enc) =>
        name -> Jbig2.decode(enc).getOrElse(fail(s"m=$m $name failed"))
      }
      val ref = pages.head._2
      pages.tail.foreach { case (name, d) =>
        assert(d.width == ref.width && d.height == ref.height,
          s"m=$m $name geometry diverged")
        d.rows.zip(ref.rows).zipWithIndex.foreach { case ((g, w2), y) =>
          assert(g.sameElements(w2), s"m=$m $name row $y diverged")
        }
      }
    }
  }

  test("the dict cannot lie: decoded geometry and ink beat /Width /Height") {
    (0 until 30).foreach { m =>
      val paras = Seq(s"scan doc $m", "second paragraph")
      val pages = Seq(PdfWriter.PageSpec(paras, Map(0 -> 3)))
      val bytes = PdfWriter.buildJbig2Scan(pages, compress = m % 2 == 0,
        seed = m)
      val imgs = RealPdfExtractor.extract(s"jb2-$m.pdf", bytes)
        .filter(_.isImage).map(_.content)
      val (w, h) = PdfWriter.jb2Dims(m)
      val black = PdfWriter.jb2Raster(m).map(_.count(identity)).sum
      assert(imgs.exists(_ == s"Im0 ${w}x$h jbig2 b$black"),
        s"m=$m: real JBIG2 not decoded truthfully: $imgs")
      val (sw, sh) = PdfWriter.jbig2Dims(m)
      assert(imgs.exists(_ == s"Im1 ${sw}x$sh jbig2 undecoded"),
        s"m=$m: stub must stay undecoded with honest dims: $imgs")
    }
  }
}
