package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PdfWriter, RealPdfExtractor}
import graft.sources.PdfSource
import graft.sources.PdfWriter.PageSpec

/** [[RealPdfExtractor]] against real PDF bytes — closes VERDICT r5 missing
  * item #1 (S3/S4 byte decode). Round-trip specs go through [[PdfWriter]]
  * (bytes the extractor did not itself read: a full PDF 1.4 file with
  * xref, page tree, content streams); the operator-level cases are
  * hand-written PDFs exercising syntax the writer never emits (hex
  * strings, TJ kerning, Tm scaling, quote operators, octal escapes,
  * indirect /Length), so the decoder is pinned to the PDF spec, not to
  * its sibling writer.
  */
class PdfCodecSpec extends AnyFunSuite {

  private def extract(bytes: Array[Byte]) =
    RealPdfExtractor.extract("t.pdf", bytes)

  private def textBlocks(bytes: Array[Byte]): Seq[String] =
    extract(bytes).filter(!_.isImage).map(_.content)

  // ---------------- writer round-trips ----------------

  private val paras1 = Seq(
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "Second paragraph spans two lines\nwith a manual break inside it.",
    "A third block closes the page with ordinary prose content.")

  test("round-trip, uncompressed: every paragraph is one block, text lossless") {
    val bytes = PdfWriter.build(Seq(PageSpec(paras1)), compress = false)
    val blocks = extract(bytes)
    assert(blocks.forall(!_.isImage))
    assert(blocks.map(_.content) == paras1)
    assert(blocks.forall(_.page == 0))
  }

  test("round-trip, FlateDecode: decode is identical to the uncompressed one") {
    val plain = PdfWriter.build(Seq(PageSpec(paras1)), compress = false)
    val packed = PdfWriter.build(Seq(PageSpec(paras1)), compress = true)
    assert(packed.length < plain.length) // the filter actually engaged
    assert(extract(packed) == extract(plain))
  }

  test("round-trip, multi-page: page numbers follow the page tree order") {
    val pages = Seq(
      PageSpec(Seq("Alpha page one content line.", "Beta paragraph two here.")),
      PageSpec(Seq("Gamma page two opens here.")),
      PageSpec(Seq("Delta final page closes out.", "Epsilon tail paragraph.")))
    val blocks = extract(PdfWriter.build(pages, compress = true))
    assert(blocks.map(_.page) == Seq(0, 0, 1, 2, 2))
    assert(blocks.map(_.content) == pages.flatMap(_.paragraphs))
  }

  test("round-trip, images: XObject draws are image blocks in paragraph order") {
    val pg = PageSpec(
      Seq("Text before the figure sits here.", "Text after the figure."),
      imagesAfter = Map(0 -> 2))
    val blocks = extract(PdfWriter.build(Seq(pg), compress = false))
    assert(blocks.map(b => (b.isImage, b.content)) == Seq(
      (false, pg.paragraphs.head),
      (true, PdfWriter.imageContent(0)),
      (true, PdfWriter.imageContent(1)),
      (false, pg.paragraphs(1))))
  }

  test("round-trip: parens, backslashes and Latin-1 bytes survive escaping") {
    val tricky = Seq(
      """f(x) = (a \ b) + (c) backslash\\paren test""",
      "Café naïve résumé über mañana — accented Latin-1.")
    val sane = tricky.map(PdfWriter.sanitize)
    val blocks = textBlocks(PdfWriter.build(Seq(PageSpec(sane)), compress = false))
    assert(blocks == sane)
  }

  test("sanitize maps beyond-Latin-1 to '?' and the writer round-trips that") {
    val s = Seq("Greek αβ and emoji 😀 degrade predictably.")
    val blocks = textBlocks(PdfWriter.build(Seq(PageSpec(s.map(PdfWriter.sanitize))),
      compress = false))
    assert(blocks == Seq("Greek ?? and emoji ?? degrade predictably."))
  }

  // ---------------- Identity-H / CMap round-trips ----------------

  private val uniParas = Seq(
    "한국어 문서 처리 파이프라인 테스트 문장입니다.",
    "Mixed 한글 and Latin text on one line\nsecond line with café naïve.",
    "中文字符 плюс кириллица — all through one Type0 font.",
    "Supplementary plane: 😀𝒜 emoji and math alphanumerics survive.")

  test("CID round-trip: Identity-H text decodes via the ToUnicode CMap") {
    val sane = uniParas.map(PdfWriter.sanitizeCid)
    val blocks = textBlocks(PdfWriter.buildCid(Seq(PageSpec(sane)), compress = false))
    assert(blocks == sane)
  }

  test("CID round-trip, FlateDecode: identical to the uncompressed decode") {
    val sane = uniParas.map(PdfWriter.sanitizeCid)
    val plain = PdfWriter.buildCid(Seq(PageSpec(sane)), compress = false)
    val packed = PdfWriter.buildCid(Seq(PageSpec(sane)), compress = true)
    assert(extract(packed) == extract(plain))
    assert(extract(packed).map(_.content) == sane)
  }

  test("CID codes are not codepoints: ignoring the CMap cannot round-trip") {
    // guards the fixture itself: a decoder that skips ToUnicode and reads
    // CIDs as chars must NOT see the source text
    val sane = Seq("plain ascii but cid-encoded")
    val bytes = PdfWriter.buildCid(Seq(PageSpec(sane)), compress = false)
    assert(textBlocks(bytes) == sane)
    assert(!new String(bytes, ISO_8859_1).contains("plain ascii"))
  }

  test("parseCMap: codespace width, bfchar, and both bfrange forms") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <0041>
        |<0002> <D55C>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0061>
        |<0020> <0022> [<0058> <00590059> <005A>]
        |endbfrange
        |endcmap
        |end""".stripMargin.getBytes(ISO_8859_1)
    val (width, m) = graft.sources.PdfCodec.parseCMap(cmap)
    assert(width == 2)
    assert(m(1) == "A" && m(2) == "한")
    assert(m(0x10) == "a" && m(0x11) == "b" && m(0x12) == "c")
    assert(m(0x20) == "X" && m(0x21) == "YY" && m(0x22) == "Z")
  }

  /** Hand-written Identity-H PDF (hex-string CIDs, explicit CMap) — pins
    * the composite decode to the spec, not to [[PdfWriter.buildCid]]. */
  private def cidPdfWith(content: String, cmap: String): Array[Byte] = {
    val cs = content.getBytes(ISO_8859_1)
    val cm = cmap.getBytes(ISO_8859_1)
    val s = new StringBuilder
    s.append("%PDF-1.4\n")
    s.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    s.append("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    s.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R /F2 8 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    s.append(s"4 0 obj\n<< /Length ${cs.length} >>\nstream\n")
    s.append(content)
    s.append("\nendstream\nendobj\n")
    s.append("5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /X " +
      "/Encoding /Identity-H /DescendantFonts [ 6 0 R ] /ToUnicode 7 0 R >>\nendobj\n")
    s.append("6 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>\nendobj\n")
    s.append(s"7 0 obj\n<< /Length ${cm.length} >>\nstream\n")
    s.append(cmap)
    s.append("\nendstream\nendobj\n")
    s.append("8 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    s.append("trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n")
    s.toString.getBytes(ISO_8859_1)
  }

  private val handCmap =
    """begincmap
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |3 beginbfchar
      |<0001> <D55C>
      |<0002> <AE00>
      |<0003> <0020>
      |endbfchar
      |1 beginbfrange
      |<0010> <0015> <0061>
      |endbfrange
      |endcmap""".stripMargin

  test("hand-written Identity-H PDF: hex CIDs map through the CMap") {
    // <00010002> = 한글, <0003> space, <001000110012> = abc
    val b = cidPdfWith(
      "BT /F1 12 Tf 14 TL 72 700 Td <000100020003001000110012> Tj ET", handCmap)
    assert(textBlocks(b) == Seq("한글 abc"))
  }

  test("mixed fonts on one line: simple and composite decode independently") {
    val b = cidPdfWith(
      "BT /F2 12 Tf 72 700 Td (latin ) Tj /F1 12 Tf <00010002> Tj ET", handCmap)
    assert(textBlocks(b) == Seq("latin 한글"))
  }

  test("TJ with composite font: kerning spaces still apply between CID runs") {
    val b = cidPdfWith(
      "BT /F1 12 Tf 72 700 Td [ <0001> -250 <0002> ] TJ ET", handCmap)
    assert(textBlocks(b) == Seq("한 글"))
  }

  test("Identity-H with a 1-byte ToUnicode codespace still reads 2-byte CIDs") {
    // real producers routinely declare <00> <FF> in the ToUnicode CMap
    // (it describes the map keys, not the font's code width); the FONT
    // type must win or every CID splits into two bogus byte lookups
    val narrowCmap =
      """begincmap
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <D55C>
        |<0002> <AE00>
        |endbfchar
        |endcmap""".stripMargin
    val b = cidPdfWith(
      "BT /F1 12 Tf 72 700 Td <00010002> Tj ET", narrowCmap)
    assert(textBlocks(b) == Seq("한글"))
  }

  test("Identity-H without ToUnicode degrades to code-as-char, never throws") {
    val noUni =
      "5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /X " +
        "/Encoding /Identity-H /DescendantFonts [ 6 0 R ] >>\nendobj\n"
    val withUni =
      "5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /X " +
        "/Encoding /Identity-H /DescendantFonts [ 6 0 R ] /ToUnicode 7 0 R >>\nendobj\n"
    val base = new String(
      cidPdfWith("BT /F1 12 Tf 72 700 Td <00480069> Tj ET", handCmap), ISO_8859_1)
    val b = base.replace(withUni, noUni).getBytes(ISO_8859_1)
    // codes 0x0048 0x0069 pass through as chars 'H' 'i'
    assert(textBlocks(b) == Seq("Hi"))
  }

  // ---------------- no-ToUnicode subset fonts (FontFile2 cmap) ----------------

  test("subset font round-trip: no ToUnicode, text recovered from the font's cmap") {
    val sane = uniParas.map(PdfWriter.sanitizeCid)
    val bytes = PdfWriter.buildCidNoToUni(Seq(PageSpec(sane)), compress = false)
    // the fixture really has no ToUnicode anywhere
    assert(!new String(bytes, ISO_8859_1).contains("ToUnicode"))
    // and CIDs are ranks, so skipping font introspection cannot pass
    assert(!new String(bytes, ISO_8859_1).contains("한국어"))
    assert(textBlocks(bytes) == sane)
  }

  test("subset font round-trip, FlateDecode: identical to the uncompressed decode") {
    val sane = uniParas.map(PdfWriter.sanitizeCid)
    val plain = PdfWriter.buildCidNoToUni(Seq(PageSpec(sane)), compress = false)
    val packed = PdfWriter.buildCidNoToUni(Seq(PageSpec(sane)), compress = true)
    assert(extract(packed) == extract(plain))
    assert(extract(packed).map(_.content) == sane)
  }

  test("extractor never throws on randomly mutated fixtures (all builders)") {
    // blanket fuzz across every decode path the writers exercise —
    // simple/composite/subset/CFF/gid-stream fonts, JPEG XObjects, both
    // encryption modes, Flate on and off. Any byte of a real corpus can
    // be corrupt; the extractor's contract is degrade-never-throw.
    val rnd = new scala.util.Random(42)
    val paras = Seq("fuzz seed paragraph one", "and a second block")
    val uni = Seq(PdfWriter.sanitizeCid("짧은 한글 fuzz 문장"))
    val bases: Seq[Array[Byte]] = Seq(
      PdfWriter.build(Seq(PageSpec(paras, Map(0 -> 1))), compress = true),
      PdfWriter.buildCid(Seq(PageSpec(uni)), compress = false),
      PdfWriter.buildCidNoToUni(Seq(PageSpec(uni)), compress = true),
      PdfWriter.buildCidCff(Seq(PageSpec(uni)), compress = false),
      PdfWriter.buildCidGidStream(Seq(PageSpec(uni)), compress = false),
      PdfWriter.buildJpeg(Seq(PageSpec(paras, Map(0 -> 2))), compress = false),
      PdfWriter.buildEncrypted(Seq(PageSpec(paras)), compress = true, aes = false),
      PdfWriter.buildEncrypted(Seq(PageSpec(paras)), compress = false, aes = true))
    bases.foreach { base =>
      (0 until 25).foreach { _ =>
        val mutated = base.clone()
        (0 until 8).foreach { _ =>
          mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
        }
        val blocks = extract(mutated) // must not throw
        assert(blocks != null)
      }
      // truncations too — every prefix boundary class
      Seq(1, base.length / 4, base.length / 2, base.length - 3).foreach { n =>
        assert(extract(base.take(n)) != null)
      }
    }
  }

  test("Type1 /FontFile built-in encoding recovers remapped simple-font text") {
    // the LaTeX-era shape: a simple font whose encoding lives in the
    // embedded Type1 program's cleartext (`dup N /name put`), no
    // /ToUnicode and no /Differences — codes deliberately ≠ ASCII so the
    // Latin-1 fallback cannot pass
    val fontProg =
      """%!PS-AdobeFont-1.0: Synthetic 001.000
        |/FontName /Synthetic def
        |/Encoding 256 array
        |0 1 255 {1 index exch /.notdef put} for
        |dup 1 /H put
        |dup 2 /e put
        |dup 3 /l put
        |dup 4 /o put
        |dup 5 /space put
        |dup 6 /quoteright put
        |dup 7 /adieresis put
        |readonly def
        |currentdict end
        |currentfile eexec
        |BINARYGARBAGEdup 99 /X putMOREGARBAGE
        |0000000000000000000000000000000000000000000000000000000000000000
        |cleartomark""".stripMargin
    // codes 1 2 3 3 4 5 6 7 = "Hello \u2019\u00e4" in the custom encoding
    val shown = "\u0001\u0002\u0003\u0003\u0004\u0005\u0006\u0007"
    val content =
      s"BT\n/F1 11 Tf\n13 TL\n72 756 Td\n($shown) Tj\nET\n"
    val pdf =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>
         |endobj
         |4 0 obj
         |<< /Length ${content.length} >>
         |stream
         |$content
         |endstream
         |endobj
         |5 0 obj
         |<< /Type /Font /Subtype /Type1 /BaseFont /Synthetic /FontDescriptor 6 0 R >>
         |endobj
         |6 0 obj
         |<< /Type /FontDescriptor /FontName /Synthetic /Flags 4 /FontFile 7 0 R >>
         |endobj
         |7 0 obj
         |<< /Length ${fontProg.length} >>
         |stream
         |$fontProg
         |endstream
         |endobj
         |trailer
         |<< /Size 8 /Root 1 0 R >>
         |%%EOF
         |""".stripMargin.getBytes(ISO_8859_1)
    assert(textBlocks(pdf) == Seq("Hello ’ä"))
    // the guard: the post-eexec `dup 99 /X put` garbage must NOT leak in
    // (parse stops at the cleartext boundary)
    import graft.sources.PdfCodec
    val enc = PdfCodec.parseType1Encoding(fontProg.getBytes(ISO_8859_1))
    assert(enc.get(1).contains("H") && enc.get(7).contains("ä"))
    assert(!enc.contains(99))
  }

  test("inline image (BI..ID..EI) with embedded 'EI' bytes doesn't derail text") {
    // the raw image payload contains the letters EI with NO surrounding
    // whitespace — a substring skip would resume the lexer mid-binary and
    // eat the second text object
    val binary = " EIxÿEIq(garbage" // hostile payload
    val content =
      "BT\n/F1 11 Tf\n13 TL\n72 756 Td\n(before image) Tj\nET\n" +
        s"BI /W 2 /H 2 /CS /G /BPC 8 ID $binary EI\n" +
        "BT\n/F1 11 Tf\n13 TL\n72 700 Td\n(after image) Tj\nET\n"
    val pdf =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>
         |endobj
         |4 0 obj
         |<< /Length ${content.length} >>
         |stream
         |$content
         |endstream
         |endobj
         |5 0 obj
         |<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>
         |endobj
         |trailer
         |<< /Size 6 /Root 1 0 R >>
         |%%EOF
         |""".stripMargin.getBytes(ISO_8859_1)
    assert(textBlocks(pdf) == Seq("before image", "after image"))
  }

  test("filters: ASCIIHex, ASCII85, RunLength decode (unit round-trips)") {
    import graft.sources.PdfCodec
    val rnd = new scala.util.Random(5)
    val payloads = Seq(
      "BT /F1 11 Tf (hi) Tj ET".getBytes(ISO_8859_1),
      Array.tabulate(1000)(i => (i % 251).toByte),
      Array.fill(257)(rnd.nextInt(256).toByte),
      Array.emptyByteArray)
    def hexEnc(b: Array[Byte]) =
      (b.map(x => f"${x & 0xff}%02x").mkString + ">").getBytes(ISO_8859_1)
    def a85Enc(b: Array[Byte]): Array[Byte] = {
      val sb = new StringBuilder
      b.grouped(4).foreach { g =>
        val pad = 4 - g.length
        val full = g ++ Array.fill(pad)(0.toByte)
        var v = 0L
        full.foreach(x => v = (v << 8) | (x & 0xffL))
        val cs = new Array[Char](5)
        (4 to 0 by -1).foreach { k => cs(k) = ('!' + (v % 85)).toChar; v /= 85 }
        sb.appendAll(cs, 0, 5 - pad)
      }
      (sb.toString + "~>").getBytes(ISO_8859_1)
    }
    def rlEnc(b: Array[Byte]): Array[Byte] = {
      // naive literal-only runs (correct, if not compact) + EOD
      val o = new java.io.ByteArrayOutputStream
      b.grouped(128).foreach { g => o.write(g.length - 1); o.write(g) }
      o.write(128)
      o.toByteArray
    }
    payloads.foreach { p =>
      assert(PdfCodec.asciiHexDecode(hexEnc(p)).toSeq == p.toSeq)
      assert(PdfCodec.ascii85Decode(a85Enc(p)).toSeq == p.toSeq)
      if (p.nonEmpty) assert(PdfCodec.runLengthDecode(rlEnc(p)).toSeq == p.toSeq)
    }
    // RunLength repeat form: 257-250=7 copies of 0x41
    assert(PdfCodec.runLengthDecode(Array(250.toByte, 0x41, 128.toByte)).toSeq ==
      Seq.fill(7)(0x41.toByte))
    // ASCIIHex odd final digit zero-pads; whitespace skipped
    assert(PdfCodec.asciiHexDecode("4 1 4>".getBytes(ISO_8859_1)).toSeq ==
      Seq(0x41.toByte, 0x40.toByte))
    // ASCII85 z shorthand
    assert(PdfCodec.ascii85Decode("z~>".getBytes(ISO_8859_1)).toSeq ==
      Seq[Byte](0, 0, 0, 0))
  }

  test("filters: LZW known-answer (TIFF spec example) and encoder round-trip") {
    import graft.sources.PdfCodec
    // the TIFF 6.0 §13 example: 7 7 7 8 8 8 → Clear, 7, 258, 8, 260, EOD
    // (258 and 260 are both still-being-defined codes — the KwKwK case)
    def pack9(codes: Seq[Int]): Array[Byte] = {
      var acc = 0L; var bits = 0
      val o = new java.io.ByteArrayOutputStream
      codes.foreach { c =>
        acc = (acc << 9) | c; bits += 9
        while (bits >= 8) { o.write(((acc >> (bits - 8)) & 0xff).toInt); bits -= 8 }
      }
      if (bits > 0) o.write(((acc << (8 - bits)) & 0xff).toInt)
      o.toByteArray
    }
    val kat = PdfCodec.lzwDecode(pack9(Seq(256, 7, 258, 8, 260, 257)))
    assert(kat.toSeq == Seq[Byte](7, 7, 7, 8, 8, 8), s"got ${kat.toSeq}")

    // spec-side encoder (mirrors the decoder's early-change width timing)
    def lzwEncode(data: Array[Byte]): Array[Byte] = {
      val dict = scala.collection.mutable.Map[Seq[Byte], Int]()
      (0 until 256).foreach(i => dict(Seq(i.toByte)) = i)
      var next = 258
      var width = 9
      var acc = 0L; var bits = 0
      val o = new java.io.ByteArrayOutputStream
      def emit(code: Int): Unit = {
        acc = (acc << width) | code; bits += width
        while (bits >= 8) { o.write(((acc >> (bits - 8)) & 0xff).toInt); bits -= 8 }
      }
      emit(256)
      var w = Seq.empty[Byte]
      data.foreach { b =>
        val wk = w :+ b
        if (dict.contains(wk)) w = wk
        else {
          emit(dict(w))
          if (next < 4096) {
            dict(wk) = next; next += 1
            if (next >= (1 << width) && width < 12) width += 1
          }
          w = Seq(b)
        }
      }
      if (w.nonEmpty) emit(dict(w))
      emit(257)
      if (bits > 0) o.write(((acc << (8 - bits)) & 0xff).toInt)
      o.toByteArray
    }
    val rnd = new scala.util.Random(17)
    // enough distinct pairs to push the dictionary past the 512- and
    // 1024-entry width bumps
    val big = Array.tabulate(6000)(i =>
      ((i * 31 + rnd.nextInt(4)) % 256).toByte)
    val enc = lzwEncode(big)
    assert(enc.length < big.length * 2)
    assert(PdfCodec.lzwDecode(enc).toSeq == big.toSeq)
  }

  test("filters: PNG predictor Up/Sub/Paeth rows undo; TIFF predictor 2") {
    import graft.sources.PdfCodec
    val rowLen = 8
    val rows = 5
    val plain = Array.tabulate(rows * rowLen)(i => ((i * 13 + 5) % 256).toByte)
    // encode with PNG Up (tag 2) rows — the common xref-stream shape
    val encUp = new java.io.ByteArrayOutputStream
    (0 until rows).foreach { r =>
      encUp.write(2)
      (0 until rowLen).foreach { i =>
        val up = if (r > 0) plain((r - 1) * rowLen + i) & 0xff else 0
        encUp.write(((plain(r * rowLen + i) & 0xff) - up) & 0xff)
      }
    }
    assert(PdfCodec.undoPredictor(encUp.toByteArray, 12, 1, 8, rowLen).toSeq ==
      plain.toSeq)
    // Sub (tag 1) with bpp 1
    val encSub = new java.io.ByteArrayOutputStream
    (0 until rows).foreach { r =>
      encSub.write(1)
      (0 until rowLen).foreach { i =>
        val left = if (i > 0) plain(r * rowLen + i - 1) & 0xff else 0
        encSub.write(((plain(r * rowLen + i) & 0xff) - left) & 0xff)
      }
    }
    assert(PdfCodec.undoPredictor(encSub.toByteArray, 11, 1, 8, rowLen).toSeq ==
      plain.toSeq)
    // TIFF horizontal differencing
    val encT = plain.clone()
    (0 until rows).foreach { r =>
      (rowLen - 1 to 1 by -1).foreach { i =>
        encT(r * rowLen + i) =
          ((encT(r * rowLen + i) - encT(r * rowLen + i - 1)) & 0xff).toByte
      }
    }
    assert(PdfCodec.undoPredictor(encT, 2, 1, 8, rowLen).toSeq == plain.toSeq)
  }

  test("a hand-written PDF with an ASCII85+Flate filter chain decodes") {
    // filter chains applied in array order over a real content stream —
    // syntax the writer never emits, pinned to the spec
    import graft.sources.PdfCodec
    val content = "BT\n/F1 11 Tf\n13 TL\n72 756 Td\n(chained filters) Tj\nET\n"
    val flated = PdfCodec.deflate(content.getBytes(ISO_8859_1))
    val a85 = {
      val sb = new StringBuilder
      flated.grouped(4).foreach { g =>
        val pad = 4 - g.length
        val full = g ++ Array.fill(pad)(0.toByte)
        var v = 0L
        full.foreach(x => v = (v << 8) | (x & 0xffL))
        val cs = new Array[Char](5)
        (4 to 0 by -1).foreach { k => cs(k) = ('!' + (v % 85)).toChar; v /= 85 }
        sb.appendAll(cs, 0, 5 - pad)
      }
      sb.toString + "~>"
    }
    val pdf =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>
         |endobj
         |4 0 obj
         |<< /Length ${a85.length} /Filter [/ASCII85Decode /FlateDecode] >>
         |stream
         |$a85
         |endstream
         |endobj
         |5 0 obj
         |<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>
         |endobj
         |trailer
         |<< /Size 6 /Root 1 0 R >>
         |%%EOF
         |""".stripMargin.getBytes(ISO_8859_1)
    assert(textBlocks(pdf) == Seq("chained filters"))
  }

  test("encrypted round-trip (RC4): empty-password decrypt recovers every block") {
    val bytes = PdfWriter.buildEncrypted(Seq(PageSpec(paras1)), compress = false,
      aes = false)
    val s = new String(bytes, ISO_8859_1)
    assert(s.contains("/Encrypt") && s.contains("/V 2 /R 3"))
    // ciphertext guard: no plaintext content anywhere in the file
    assert(!s.contains("quick brown fox"))
    assert(textBlocks(bytes) == paras1)
  }

  test("encrypted round-trip (AES-128): V4 crypt filters decrypt identically") {
    val bytes = PdfWriter.buildEncrypted(Seq(PageSpec(paras1)), compress = false,
      aes = true)
    val s = new String(bytes, ISO_8859_1)
    assert(s.contains("/CFM /AESV2"))
    assert(!s.contains("quick brown fox"))
    assert(textBlocks(bytes) == paras1)
  }

  test("encrypted round-trip (AES-256): V5 R6 hardened hash + wrapped key") {
    val bytes = PdfWriter.buildEncrypted(Seq(PageSpec(paras1)),
      compress = false, cipher = "aes256")
    val s = new String(bytes, ISO_8859_1)
    assert(s.contains("/V 5 /R 6") && s.contains("/CFM /AESV3"))
    assert(s.contains("/UE <") && s.contains("/OE <") &&
      s.contains("/Perms <"))
    assert(!s.contains("quick brown fox"))
    assert(textBlocks(bytes) == paras1)
  }

  test("AES-256 with a tampered /U fails auth and degrades to no text") {
    val bytes = PdfWriter.buildEncrypted(Seq(PageSpec(paras1)),
      compress = false, cipher = "aes256")
    val s = new String(bytes, ISO_8859_1)
    val uAt = s.indexOf("/U <") + 4
    val tampered = (s.substring(0, uAt) + "00000000" + s.substring(uAt + 8))
      .getBytes(ISO_8859_1)
    val blocks = textBlocks(tampered) // must not throw
    assert(!blocks.contains(paras1.head), "locked V5 file leaked plaintext")
  }

  test("Algorithm 2.B hash: R6 differs from R5, is stable, and validates") {
    val pwd = Array.emptyByteArray
    val salt = Array.tabulate[Byte](8)(_.toByte)
    val r5 = graft.sources.PdfCrypt.hash2b(pwd, salt, Array.emptyByteArray, 5)
    val r6 = graft.sources.PdfCrypt.hash2b(pwd, salt, Array.emptyByteArray, 6)
    assert(r5.length == 32 && r6.length == 32)
    assert(!java.util.Arrays.equals(r5, r6),
      "R6 hardened hash degenerated to plain SHA-256")
    // determinism: same inputs, same bytes (the fixture contract)
    assert(java.util.Arrays.equals(r6,
      graft.sources.PdfCrypt.hash2b(pwd, salt, Array.emptyByteArray, 6)))
    // a full writer->reader key round-trip at R5 too (Acrobat IX files)
    val key = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    val (u, ue, _, _, _) = graft.sources.PdfCrypt.v5Entries(
      key, -44, "seed".getBytes(ISO_8859_1), r = 5)
    assert(graft.sources.PdfCrypt.v5EmptyPasswordWorks(u, 5))
    assert(java.util.Arrays.equals(
      graft.sources.PdfCrypt.v5FileKey(u, ue, 5), key))
  }

  test("encrypted + FlateDecode + images: filters apply after decryption") {
    for (aes <- Seq(false, true)) {
      val pg = PageSpec(paras1.take(2), imagesAfter = Map(0 -> 1))
      val bytes = PdfWriter.buildEncrypted(Seq(pg), compress = true, aes = aes)
      val blocks = extract(bytes)
      assert(blocks.map(b => (b.isImage, b.content)) == Seq(
        (false, paras1(0)), (true, PdfWriter.imageContent(0)),
        (false, paras1(1))), s"aes=$aes")
    }
  }

  test("encrypted PDF with an XRef-STREAM trailer (no trailer keyword) decrypts") {
    // modern producers (any file using /ObjStm) carry /Root /Encrypt /ID in
    // a /Type /XRef stream dict and write NO `trailer` keyword at all —
    // rewrite the fixture into that layout and the scan must still find
    // the encryption dict
    for (aes <- Seq(false, true)) {
      val bytes = PdfWriter.buildEncrypted(Seq(PageSpec(paras1)),
        compress = false, aes = aes)
      val s = new String(bytes, ISO_8859_1)
      val trailerDict = {
        val at = s.indexOf("trailer")
        val open = s.indexOf("<<", at)
        val close = s.indexOf(">>", open)
        s.substring(open + 2, close)
      }
      val cut = s.substring(0, s.indexOf("xref\n"))
      val xrefObj =
        s"99 0 obj\n<< /Type /XRef /W [1 2 1] $trailerDict /Length 0 >>\n" +
          "stream\nendstream\nendobj\nstartxref\n0\n%%EOF\n"
      val rewritten = (cut + xrefObj).getBytes(ISO_8859_1)
      assert(!new String(rewritten, ISO_8859_1).contains("trailer"))
      assert(textBlocks(rewritten) == paras1, s"aes=$aes")
    }
  }

  test("a genuinely password-protected file degrades to no text, never throws") {
    val bytes = PdfWriter.buildEncrypted(Seq(PageSpec(paras1)), compress = false,
      aes = false)
    val s = new String(bytes, ISO_8859_1)
    // corrupt /O: the empty-password authentication must now fail, and the
    // extractor must behave like a viewer it locked out — ciphertext
    // streams parse to nothing meaningful, no exception escapes
    val oAt = s.indexOf("/O <") + 4
    val tampered = (s.substring(0, oAt) + "00000000" + s.substring(oAt + 8))
      .getBytes(ISO_8859_1)
    assert(new String(tampered, ISO_8859_1).contains("/O <00000000"))
    val blocks = textBlocks(tampered) // must not throw
    assert(!blocks.contains(paras1.head), "locked file leaked plaintext")
  }

  test("PdfCrypt: key-schedule invariants (lengths, truncation, auth)") {
    import graft.sources.PdfCrypt
    val empty = Array.emptyByteArray
    for (r <- Seq(3, 4)) {
      val o = PdfCrypt.computeO(empty, empty, 16, r)
      assert(o.length == 32)
      val id0 = Array.tabulate(16)(_.toByte)
      val key = PdfCrypt.fileKey(empty, o, -44, id0, 16, r)
      assert(key.length == 16)
      val u = PdfCrypt.computeU(key, id0, r)
      assert(u.length == 32)
      assert(PdfCrypt.emptyPasswordWorks(o, u, -44, id0, 16, r,
        encryptMetadata = true))
      // tampering O changes the derived key → authentication fails
      val o2 = o.clone(); o2(0) = (o2(0) ^ 0x55).toByte
      assert(!PdfCrypt.emptyPasswordWorks(o2, u, -44, id0, 16, r,
        encryptMetadata = true))
      // per-object keys: 16-byte key caps at 16 (min(n+5, 16))
      assert(PdfCrypt.objectKey(key, 7, 0, aes = r == 4).length == 16)
      assert(PdfCrypt.objectKey(key.take(5), 7, 0, aes = false).length == 10)
    }
    // rc4 is an involution; aes round-trips through the IV-prefix format
    val k = Array.tabulate(16)(i => (i * 7).toByte)
    val msg = "attack at dawn on the west gate".getBytes(ISO_8859_1)
    assert(PdfCrypt.rc4(k, PdfCrypt.rc4(k, msg)).toSeq == msg.toSeq)
    val ct = PdfCrypt.encrypt(k, msg, aes = true, num = 3)
    assert(ct.length % 16 == 0 && ct.length >= 32)
    assert(PdfCrypt.decrypt(k, ct, aes = true).toSeq == msg.toSeq)
    // malformed AES ciphertext degrades to empty, never throws
    assert(PdfCrypt.decrypt(k, Array[Byte](1, 2, 3), aes = true).isEmpty)
    assert(PdfCrypt.decrypt(k, new Array[Byte](48).map(_ => 0x5a.toByte),
      aes = true) != null)
  }

  test("CIDToGIDMap stream: permuted glyph order round-trips through the map") {
    val sane = uniParas.map(PdfWriter.sanitizeCid)
    for (compress <- Seq(false, true)) {
      val bytes = PdfWriter.buildCidGidStream(Seq(PageSpec(sane)), compress)
      val s = new String(bytes, ISO_8859_1)
      assert(!s.contains("ToUnicode") && s.contains("/CIDToGIDMap 7 0 R"))
      assert(textBlocks(bytes) == sane, s"compress=$compress")
    }
    // the fixture guard: assuming /Identity must NOT round-trip — flip the
    // descendant's map entry back to /Identity and the composition breaks
    val bytes = PdfWriter.buildCidGidStream(Seq(PageSpec(sane)), compress = false)
    val identityView = new String(bytes, ISO_8859_1)
      .replace("/CIDToGIDMap 7 0 R", "/CIDToGIDMap /Identity")
      .getBytes(ISO_8859_1)
    assert(textBlocks(identityView) != sane,
      "permutation was a no-op; the fixture cannot discriminate")
  }

  test("CFF round-trip: bare FontFile3, text recovered from charset glyph names") {
    val sane = uniParas.map(PdfWriter.sanitizeCid)
    val bytes = PdfWriter.buildCidCff(Seq(PageSpec(sane)), compress = false)
    val s = new String(bytes, ISO_8859_1)
    // no ToUnicode, no sfnt cmap — the CFF charset is the only route back
    assert(!s.contains("ToUnicode"))
    assert(s.contains("CIDFontType0C"))
    assert(!s.contains("한국어"))
    assert(textBlocks(bytes) == sane)
  }

  test("CFF round-trip, FlateDecode: identical to the uncompressed decode") {
    val sane = uniParas.map(PdfWriter.sanitizeCid)
    val plain = PdfWriter.buildCidCff(Seq(PageSpec(sane)), compress = false)
    val packed = PdfWriter.buildCidCff(Seq(PageSpec(sane)), compress = true)
    assert(extract(packed) == extract(plain))
    assert(extract(packed).map(_.content) == sane)
  }

  test("CffCharset: standard-SID names resolve through the AGL table") {
    import graft.sources.CffCharset
    // hand-built name-keyed CFF: glyphs 1..3 carry standard SIDs for
    // A (34), quoteright (8), adieresis (202) — names buildFont never
    // emits, so this pins the std-strings + AGL dictionary path
    val base = CffCharset.buildFont(Map('x'.toInt -> 1, 'y'.toInt -> 2, 'z'.toInt -> 3))
    val m0 = CffCharset.gidToText(base)
    assert(m0 == Map(1 -> "x", 2 -> "y", 3 -> "z"), s"got $m0")
    assert(CffCharset.StdStrings(34) == "A")
    assert(CffCharset.StdStrings(8) == "quoteright")
    assert(CffCharset.StdStrings(202) == "adieresis")
    // patch the fixture's format-0 charset in place with the std SIDs
    val needle = Array[Byte](0,
      ((391 >> 8) & 0xff).toByte, (391 & 0xff).toByte,
      ((392 >> 8) & 0xff).toByte, (392 & 0xff).toByte,
      ((393 >> 8) & 0xff).toByte, (393 & 0xff).toByte)
    val at = base.indices.find(i =>
      i + needle.length <= base.length &&
        needle.indices.forall(k => base(i + k) == needle(k))).get
    val patched = base.clone()
    for ((sid, g) <- Seq(34, 8, 202).zipWithIndex) {
      patched(at + 1 + 2 * g) = ((sid >> 8) & 0xff).toByte
      patched(at + 2 + 2 * g) = (sid & 0xff).toByte
    }
    val m = CffCharset.gidToText(patched)
    assert(m == Map(1 -> "A", 2 -> "’", 3 -> "ä"), s"got $m")
  }

  test("CffCharset: format 1 range charset and predefined ISOAdobe parse") {
    import graft.sources.CffCharset
    val base = CffCharset.buildFont(Map('p'.toInt -> 1, 'q'.toInt -> 2, 'r'.toInt -> 3))
    // rewrite the charset to format 1: one range (first=34 'A', nLeft=2)
    // → glyphs 1..3 = A B C. Format 1 is 4 bytes vs format 0's 7 here, so
    // build a fresh byte image by splicing
    val fmt0 = Array[Byte](0,
      ((391 >> 8) & 0xff).toByte, (391 & 0xff).toByte,
      ((392 >> 8) & 0xff).toByte, (392 & 0xff).toByte,
      ((393 >> 8) & 0xff).toByte, (393 & 0xff).toByte)
    val at = base.indices.find(i =>
      i + fmt0.length <= base.length &&
        fmt0.indices.forall(k => base(i + k) == fmt0(k))).get
    val fmt1 = Array[Byte](1, 0, 34, 2, 0, 0, 0) // format 1, range, padding
    val patched = base.clone()
    fmt1.indices.foreach(k => patched(at + k) = fmt1(k))
    val m = CffCharset.gidToText(patched)
    assert(m == Map(1 -> "A", 2 -> "B", 3 -> "C"), s"got $m")
    // predefined charset (offset 0): identity sid=gid → space, exclam
    // requires a top dict with NO charset op; easiest hand-check is the
    // parser-internal contract via a font whose charset op points at 0 —
    // covered structurally by StdStrings(1) == "space"
    assert(CffCharset.StdStrings(1) == "space")
  }

  test("CffCharset never throws on garbage, truncated, or hostile input") {
    import graft.sources.CffCharset
    val rnd = new scala.util.Random(11)
    val good = CffCharset.buildFont(Map('A'.toInt -> 1, 'B'.toInt -> 2))
    val cases = Seq(
      Array.emptyByteArray,
      "definitely not a CFF".getBytes(ISO_8859_1),
      good.take(3), good.take(10), good.take(25), good.dropRight(4),
      Array.fill(256)(rnd.nextInt(256).toByte),
      Array.fill(64)(0xff.toByte))
    cases.foreach { bytes =>
      val m = CffCharset.gidToText(bytes) // must not throw
      assert(m != null)
    }
    assert(CffCharset.gidToText(good) == Map(1 -> "A", 2 -> "B"))
  }

  test("CffCharset: a CID-keyed CFF (/ROS present) is never name-resolved") {
    import graft.sources.CffCharset
    val good = CffCharset.buildFont(Map('A'.toInt -> 1))
    // splice an ROS operator (12 30 with three operands) into the top
    // dict by rebuilding: simplest faithful check — prepend operands and
    // the 12 30 op to the top dict INDEX item. The top dict in the
    // fixture is the single 12-byte item right after its INDEX header
    // (count=1, offSize=1, off[0]=1, off[1]=13).
    val hdr = Array[Byte](0, 1, 1, 1, 13)
    val at = good.indices.find(i =>
      i + hdr.length <= good.length &&
        hdr.indices.forall(k => good(i + k) == hdr(k))).get
    val pre = good.take(at)
    val dictStart = at + hdr.length
    val dict = good.slice(dictStart, dictStart + 12)
    val post = good.drop(dictStart + 12)
    // ROS: sid sid int (three small ints) then 12 30
    val ros = Array(139, 139, 139, 12, 30).map(_.toByte)
    val newDict = ros ++ dict
    val newHdr = Array[Byte](0, 1, 1, 1, (13 + ros.length).toByte)
    val cidKeyed = pre ++ newHdr ++ newDict ++ post
    // charset/charstrings offsets are now stale by 'ros.length' bytes,
    // but the ROS gate must reject BEFORE any charset read
    assert(CffCharset.gidToText(cidKeyed) == Map.empty)
  }

  test("TrueTypeCmap: format 4 glyphIdArray form (idRangeOffset != 0) parses") {
    // hand-built: one segment 0x41..0x43 whose gids come from glyphIdArray
    // (7, 9, 11) — the pointer-arithmetic branch buildFont never emits
    def u16(v: Int) = Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val segs = 2 // data segment + 0xFFFF terminal
    val sub = Seq(
      u16(4), u16(0), u16(0), // format, length (unchecked), language
      u16(segs * 2), u16(4), u16(1), u16(0), // segCountX2, search fields
      u16(0x43), u16(0xffff), // endCode
      u16(0), // reservedPad
      u16(0x41), u16(0xffff), // startCode
      u16(0), u16(1), // idDelta
      // idRangeOffset[0] points past the 2 remaining slots to glyphIdArray
      u16(4), u16(0),
      u16(7), u16(9), u16(11) // glyphIdArray
    ).flatten.toArray
    val header = Seq(
      Seq(0x00, 0x01, 0x00, 0x00).map(_.toByte), // sfnt 1.0
      u16(1), u16(16), u16(0), u16(0), // numTables + search fields
      "cmap".getBytes(ISO_8859_1).toSeq, Seq(0, 0, 0, 0).map(_.toByte),
      Seq(0, 0, 0, 28).map(_.toByte), // offset
      Seq(0, 0, 0, (12 + sub.length)).map(_.toByte), // length
      u16(0), u16(1), // cmap version, 1 record
      u16(3), u16(1), Seq(0, 0, 0, 12).map(_.toByte) // (3,1) at +12
    ).flatten.toArray
    val font = header ++ sub
    val m = graft.sources.TrueTypeCmap.gidToText(font)
    assert(m == Map(7 -> "A", 9 -> "B", 11 -> "C"), s"got $m")
  }

  test("TrueTypeCmap: format 6 trimmed table parses") {
    def u16(v: Int) = Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val sub = Seq(
      u16(6), u16(0), u16(0), // format, length (unchecked), language
      u16(0x48), u16(3), // firstCode 'H', 3 entries
      u16(5), u16(0), u16(6) // gids for H, I(unmapped), J
    ).flatten.toArray
    val header = Seq(
      Seq(0x00, 0x01, 0x00, 0x00).map(_.toByte),
      u16(1), u16(16), u16(0), u16(0),
      "cmap".getBytes(ISO_8859_1).toSeq, Seq(0, 0, 0, 0).map(_.toByte),
      Seq(0, 0, 0, 28).map(_.toByte),
      Seq(0, 0, 0, (12 + sub.length)).map(_.toByte),
      u16(0), u16(1),
      u16(3), u16(1), Seq(0, 0, 0, 12).map(_.toByte)
    ).flatten.toArray
    val m = graft.sources.TrueTypeCmap.gidToText(header ++ sub)
    assert(m == Map(5 -> "H", 6 -> "J"), s"got $m")
  }

  test("JPEG XObject: the decoded raster labels the image, not the lying dict") {
    // buildJpeg understates /Width /Height by 1 in the object dict, so the
    // expected labels are reachable only through a real pixel decode
    val bytes = PdfWriter.buildJpeg(
      Seq(PageSpec(paras1, Map(0 -> 3))), compress = false)
    val imgs = extract(bytes).filter(_.isImage).map(_.content)
    assert(imgs == (0 until 3).map(PdfWriter.jpegImageContent),
      s"got $imgs")
    // dims recover exactly through the JPEG round-trip
    assert(PdfWriter.jpegImageContent(0).endsWith("16x12 jpeg c3"))
  }

  test("TrueTypeCmap never throws on garbage, truncated, or empty input") {
    val rnd = new scala.util.Random(7)
    val good = graft.sources.TrueTypeCmap.buildFont(Map('A'.toInt -> 1, 'B'.toInt -> 2))
    val cases = Seq(
      Array.emptyByteArray,
      "not a font at all".getBytes(ISO_8859_1),
      good.take(11), good.take(20), good.take(40),
      Array.fill(256)(rnd.nextInt(256).toByte))
    cases.foreach { bytes =>
      val m = graft.sources.TrueTypeCmap.gidToText(bytes) // must not throw
      assert(m != null)
    }
    // and the untruncated fixture round-trips
    assert(graft.sources.TrueTypeCmap.gidToText(good) == Map(1 -> "A", 2 -> "B"))
  }

  // ---------------- object streams (PDF 1.5 /ObjStm) ----------------

  /** Hand-built PDF whose catalog/pages/page/font dicts all live INSIDE a
    * /Type /ObjStm container — the modern-producer layout the raw body
    * scan cannot see. Only the content stream is a top-level object.
    */
  private def objStmPdf(compress: Boolean): Array[Byte] = {
    val members = Seq(
      2 -> "<< /Type /Catalog /Pages 3 0 R >>",
      3 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>",
      4 -> ("<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 6 0 R >> >> /Contents 5 0 R >>"),
      6 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bodyParts = members.map(_._2 + " ")
    val offsets = bodyParts.scanLeft(0)(_ + _.length).init
    val header = members.zip(offsets)
      .map { case ((num, _), off) => s"$num $off" }.mkString(" ") + " "
    val stmRaw = (header + bodyParts.mkString).getBytes(ISO_8859_1)
    val stm =
      if (!compress) stmRaw
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(stmRaw); d.finish()
        val out = new java.io.ByteArrayOutputStream
        val buf = new Array[Byte](4096)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end(); out.toByteArray
      }
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val content = "BT /F1 12 Tf 72 700 Td (Packed objects still decode fine today) Tj ET"
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    w(s"1 0 obj\n<< /Type /ObjStm /N ${members.size} " +
      s"/First ${header.length}$filter /Length ${stm.length} >>\nstream\n")
    out.write(stm)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    w("trailer\n<< /Root 2 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  test("ObjStm: objects packed in an object stream are found (raw and Flate)") {
    Seq(false, true).foreach { compress =>
      val blocks = textBlocks(objStmPdf(compress))
      assert(blocks == Seq("Packed objects still decode fine today"),
        s"compress=$compress got $blocks")
    }
  }

  test("ObjStm: a top-level replacement object shadows its packed original") {
    // incremental-update semantics: append a replacement for packed obj 6
    // (the font) — the LATER top-level object must win over the member
    val base = objStmPdf(false)
    val extra = ("6 0 obj\n<< /Type /Font /Subtype /Type1 " +
      "/BaseFont /Courier >>\nendobj\n%%EOF\n").getBytes(ISO_8859_1)
    val blocks = textBlocks(base ++ extra)
    // still decodes (the replacement is a valid simple font)
    assert(blocks == Seq("Packed objects still decode fine today"))
  }

  test("ObjStm: malformed containers are skipped, never throw") {
    val good = objStmPdf(false)
    val s = new String(good, ISO_8859_1)
    val cases = Seq(
      s.replace("/N 4", "/N 999999"), // absurd member count
      s.replace("/First", "/Firs"), // missing First
      s.replaceFirst("stream\n[^e]*endstream", "stream\ngarbage endstream"))
    cases.foreach { c =>
      val blocks = graft.sources.RealPdfExtractor
        .extract("t.pdf", c.getBytes(ISO_8859_1)) // must not throw
      assert(blocks != null)
    }
  }

  test("parseCMap never throws on garbage, truncated, or empty input") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      Array.emptyByteArray,
      "beginbfchar <00".getBytes(ISO_8859_1),
      "3 beginbfrange <0001> endbfrange".getBytes(ISO_8859_1),
      handCmap.getBytes(ISO_8859_1).take(30),
      Array.fill(512)(rnd.nextInt(256).toByte))
    cases.foreach { bytes =>
      val (w, m) = graft.sources.PdfCodec.parseCMap(bytes) // must not throw
      assert(w >= 0 && m != null)
    }
  }

  test("simple font /Differences remaps bytes via glyph names; ToUnicode wins on overlap") {
    val content = "BT /F2 12 Tf 72 700 Td (AB C) Tj ET"
    val diffFont =
      "8 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /X /Encoding " +
        "<< /Type /Encoding /Differences [ 65 /eacute /uni4E2D 32 /underscore 67 /notarealglyph ] >> >>\nendobj\n"
    val plainFont =
      "8 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
    val base = new String(cidPdfWith(content, handCmap), ISO_8859_1)
    val b = base.replace(plainFont, diffFont).getBytes(ISO_8859_1)
    // 65→é (AGL), 66→中 (uniXXXX), 32→_ (run continues), 67 unknown → 'C'
    assert(textBlocks(b) == Seq("é中_C"))
  }

  test("glyphToText: AGL subset, uniXXXX, single-char, unknown") {
    import graft.sources.PdfCodec.glyphToText
    assert(glyphToText("eacute").contains("é"))
    assert(glyphToText("uni0041").contains("A"))
    assert(glyphToText("uniD55C").contains("한"))
    assert(glyphToText("a").contains("a"))
    assert(glyphToText("uniZZZZ").isEmpty)
    assert(glyphToText("notaglyph").isEmpty)
    assert(glyphToText("emdash").contains("—"))
  }

  // ---------------- hand-written PDFs: spec syntax the writer avoids ----------------

  /** Minimal single-page scaffold around a raw content stream. */
  private def pdfWith(content: String): Array[Byte] = {
    val cs = content.getBytes(ISO_8859_1)
    val s = new StringBuilder
    s.append("%PDF-1.4\n")
    s.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    s.append("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    s.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    s.append(s"4 0 obj\n<< /Length ${cs.length} >>\nstream\n")
    s.append(content)
    s.append("\nendstream\nendobj\n")
    s.append("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    s.append("trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")
    s.toString.getBytes(ISO_8859_1)
  }

  test("hex strings decode, odd digit zero-padded") {
    // 48656C6C6F = "Hello"; trailing odd digit 5 pads to 0x50 = 'P'
    val b = pdfWith("BT /F1 12 Tf 14 TL 72 700 Td <48656C6C6F2068657820776F726C6421> Tj T* <5> Tj ET")
    assert(textBlocks(b) == Seq("Hello hex world!\nP"))
  }

  test("TJ arrays concatenate; kerning <= -180 reads as a space") {
    val b = pdfWith("BT /F1 12 Tf 72 700 Td [ (Ker) -40 (ned) -250 (apart) ] TJ ET")
    assert(textBlocks(b) == Seq("Kerned apart"))
  }

  test("quote operators advance a line then show") {
    val b = pdfWith("BT /F1 12 Tf 14 TL 72 700 Td (first line) Tj (second line) ' 1 0 (third line) \" ET")
    assert(textBlocks(b) == Seq("first line\nsecond line\nthird line"))
  }

  test("octal escapes and line continuations decode") {
    val b = pdfWith("BT /F1 12 Tf 72 700 Td (A\\101 oct \\050paren\\051 cont\\\ninues) Tj ET")
    assert(textBlocks(b) == Seq("AA oct (paren) continues"))
  }

  test("Tm sets absolute position; its scale applies to size and leading") {
    // 6pt font under a 2x Tm = effective 12; T* with TL 14 descends 28.
    // Gap between the two Tm blocks: 700-600=100 > 1.5*28 => two blocks;
    // inside the first, 28 <= 1.5*max(28,12)=42 => one block.
    val b = pdfWith(
      "BT /F1 6 Tf 14 TL 2 0 0 2 72 700 Tm (scaled one) Tj T* (scaled two) Tj " +
        "2 0 0 2 72 600 Tm (next block) Tj ET")
    assert(textBlocks(b) == Seq("scaled one\nscaled two", "next block"))
  }

  test("comments and stray delimiters in the body are tolerated") {
    val b = pdfWith("% leading comment\nBT /F1 12 Tf 72 700 Td % mid comment\n(still works) Tj ET")
    assert(textBlocks(b) == Seq("still works"))
  }

  test("indirect /Length falls back to endstream search") {
    val content = "BT /F1 12 Tf 72 700 Td (indirect length text) Tj ET"
    val raw = new String(pdfWith(content), ISO_8859_1)
      .replace(s"/Length ${content.length}", "/Length 9 0 R")
    assert(textBlocks(raw.getBytes(ISO_8859_1)) == Seq("indirect length text"))
  }

  test("content stream split across an array of streams concatenates") {
    val s = new StringBuilder
    s.append("%PDF-1.4\n")
    s.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    s.append("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    s.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [ 4 0 R 5 0 R ] >>\nendobj\n")
    val c1 = "BT /F1 12 Tf 72 700 Td (part one"
    val c2 = " part two) Tj ET"
    s.append(s"4 0 obj\n<< /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n")
    s.append(s"5 0 obj\n<< /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n")
    s.append("trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")
    // the two halves parse as separate streams; the split point falls inside
    // a literal string, which the concatenation (with \n) preserves
    val blocks = textBlocks(s.toString.getBytes(ISO_8859_1))
    assert(blocks == Seq("part one\n part two"))
  }

  // ---------------- robustness ----------------

  test("non-PDF, empty, and truncated inputs yield no blocks, never throw") {
    assert(extract(Array.emptyByteArray).isEmpty)
    assert(extract("just some text, no header".getBytes(ISO_8859_1)).isEmpty)
    assert(extract(Array.fill[Byte](4096)(0x7f)).isEmpty)
    val whole = PdfWriter.build(Seq(PageSpec(paras1)), compress = true)
    // every truncation point must be handled (objects after the cut vanish)
    Seq(10, whole.length / 4, whole.length / 2, whole.length - 20).foreach { n =>
      extract(java.util.Arrays.copyOf(whole, n)) // must not throw
    }
  }

  test("a corrupt page leaves the other pages intact") {
    val good = "BT /F1 12 Tf 72 700 Td (good page here) Tj ET"
    val s = new StringBuilder
    s.append("%PDF-1.4\n")
    s.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    s.append("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R 6 0 R ] /Count 2 >>\nendobj\n")
    s.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    s.append(s"4 0 obj\n<< /Length ${good.length} >>\nstream\n$good\nendstream\nendobj\n")
    // page 2's content stream claims FlateDecode but holds garbage bytes
    s.append("6 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>\nendobj\n")
    s.append("7 0 obj\n<< /Length 8 /Filter /FlateDecode >>\nstream\n\nendstream\nendobj\n")
    s.append("trailer\n<< /Size 8 /Root 1 0 R >>\n%%EOF\n")
    assert(textBlocks(s.toString.getBytes(ISO_8859_1)) == Seq("good page here"))
  }

  // ---------------- downstream integration ----------------

  test("real bytes through the full PdfSource pipeline: F4 + G4 + policy") {
    val pages = Seq(
      PageSpec(Seq(
        "A real paragraph long enough to clear the minimum length gate.",
        "tiny", // under F4's 10 code points: dropped
        "Another substantial paragraph that should merge with its neighbor."),
        imagesAfter = Map(2 -> 1)),
      PageSpec(Seq("Page two paragraph keeps its own page-bounded merge group.")))
    val bytes = PdfWriter.build(pages, compress = true)
    val segs = PdfSource.parsePdf("doc-1", "t.pdf", bytes, RealPdfExtractor)
    // two page-0 text paragraphs merge (under 1500 chars), image is its own
    // segment and a hard boundary, page 1 text never joins page 0
    assert(segs.map(_.kind) == Seq("text", "image", "text"))
    assert(segs.head.content.contains("real paragraph") &&
      segs.head.content.contains("substantial paragraph"))
    assert(!segs.head.content.contains("tiny"))
    assert(segs.map(_.page) == Seq(Some(0), Some(0), Some(1)))
    assert(!PdfSource.shouldFallbackToVision(segs))
  }

  test("a .pdf DocInput runs the real codec inside the full ingest fold") {
    import graft.ingest.IngestPipeline
    import graft.ingest.IngestPipeline.DocInput
    val pages = Seq(PageSpec(Seq(
      "Spark estimates shuffle partition sizes from the map output statistics " +
        "collected during the exchange, then coalesces small partitions adaptively.",
      "Broadcast joins avoid the shuffle entirely when one side fits under the " +
        "configured threshold, which the optimizer checks at planning time.")))
    val bytes = PdfWriter.build(pages, compress = true)
    // the Latin-1 carrier is a byte-for-byte bijection
    val carrier = new String(bytes, ISO_8859_1)
    assert(carrier.getBytes(ISO_8859_1).sameElements(bytes))
    val pd = IngestPipeline.processDocument(
      DocInput("docs/manual.pdf", carrier, isOcr = false))
    assert(pd.fragments.nonEmpty && pd.concepts.nonEmpty && pd.parents.nonEmpty)
    val allText = pd.fragments.map(_.content).mkString(" ")
    assert(allText.contains("coalesces small partitions adaptively"))
    assert(allText.contains("Broadcast joins avoid the shuffle"))
    // same bytes under a .txt path parse as (binary-garbled) plain text,
    // proving the dispatch keys on the extension, not the content
    val asText = IngestPipeline.processDocument(
      DocInput("docs/manual.txt", carrier, isOcr = false))
    assert(asText.fragments.map(_.content).mkString(" ") != allText)
  }

  test("image-only real PDF triggers the S5 vision fallback policy") {
    val bytes = PdfWriter.build(
      Seq(PageSpec(Seq.empty, imagesAfter = Map(0 -> 1))), compress = false)
    // imagesAfter keys beyond the paragraph list still emit their images
    val segs = PdfSource.parsePdf("doc-2", "t.pdf", bytes, RealPdfExtractor)
    assert(segs.nonEmpty && segs.forall(_.kind == "image"))
    assert(PdfSource.shouldFallbackToVision(segs))
  }
}
