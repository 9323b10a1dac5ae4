package graft.sources

import scala.collection.mutable

/** JBIG2 (ITU-T T.88) bilevel image codec — the OTHER compression scanned
  * PDFs carry in their image XObjects (/Filter /JBIG2Decode), produced by
  * modern scanner firmware and by re-compressors precisely because it
  * beats CCITT G4 on text scans. The reference gets these pixels for free
  * via PyMuPDF rendering (pymupdf_parser.py:773-823); a byte-level
  * extractor must decode the embedded segment stream itself or its image
  * features and `would_ocr` decisions degrade to undecoded-bytes behavior
  * on exactly the documents OCR exists for.
  *
  * Scope: the PDF-embedded organization (T.88 Annex + PDF 32000 §7.4.7 —
  * no file header, a bare sequence of segments, optionally preceded by a
  * /JBIG2Globals stream). Generic regions: MQ-arithmetic (§6.2 + Annex
  * E — all four GB templates, AT pixels, TPGDON) and MMR (= T.6, the
  * shared [[CcittG4]] coder). Symbol dictionaries: arithmetic (§6.5)
  * AND Huffman-coded (SDHUFF — Annex-B standard tables, per-class
  * collective bitmaps uncompressed or MMR, §6.5.9). Text regions:
  * arithmetic AND Huffman (SBHUFF — FS/DS/DT via referred CUSTOM
  * code-table segments, type 53 / Annex B.2, plus the inline runcode
  * symbol-ID tables of 7.4.3.1.7), untransposed. GENERIC REFINEMENT
  * regions (§6.3: both GR templates, TPGRON typical prediction,
  * page-reference form with REPLACE composition — the second-pass
  * quality layer progressive scanners emit). REFINEMENT-AGGREGATE
  * symbol dictionaries (SDREFAGG, §6.5.8.2) in BOTH forms: the
  * single-instance refinement (font-variant dictionaries refining a
  * base dictionary's glyphs) and the REFAGGNINST > 1 aggregate — a
  * nested text region of refined instances composed per symbol, on
  * the dictionary's own coder and contexts. Per-instance refinement
  * in arithmetic TEXT regions (REFINE, §6.4.11 — touched-up
  * instances placed at their refined dims). Huffman DICTIONARIES
  * take their DH/DW/BMSIZE through referred CUSTOM type-53 tables
  * (selection 3, consumed in 7.4.4.1.6 field order) as well as the
  * standard ones. Huffman+refinement combinations and standard-table
  * selections in Huffman TEXT regions degrade to the honest
  * `undecoded` label, never a guess.
  *
  * Both directions are implemented — the encoder produces fixtures whose
  * decoded geometry/ink only a real decoder can recover (JBIG2 carries
  * width AND height inside the region data, so unlike G4 BOTH dimensions
  * are data-only truth), the decoder is the extractor's production path.
  * No RNG, no state: byte-identical output for identical input.
  *
  * All tables and procedures below are the public T.88 standard: the Qe
  * state-transition table is Table E.1; ENCODE/DECODE/BYTEIN/BYTEOUT/
  * FLUSH follow the Annex E flowcharts; the per-template context layouts
  * are the §6.2.5.7 formulas.
  */
object Jbig2 {

  // ---------------- MQ coder state table (T.88 Table E.1) ----------------

  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** Arithmetic-coder context store: adaptation state + MPS sense per
    * context label. Default 2^16 labels covers GB template 0's 16-bit
    * context; callers with small context sets (JPEG 2000 Tier-1 has 19)
    * size it down — the store is allocated and zeroed per code-block,
    * so its size is a hot-path cost, not a detail. */
  private[sources] final class CxStore(size: Int = 1 << 16) {
    val i = new Array[Byte](size)
    val mps = new Array[Byte](size)
  }

  // ---------------- MQ decoder (T.88 E.3.2-E.3.4) ----------------

  private[sources] final class MqDecoder(data: Array[Byte], start: Int, end: Int) {
    private var bp = start
    private var c: Long = 0L
    private var ct = 0
    private var a = 0

    private def byteAt(p: Int): Int =
      if (p < end) data(p) & 0xFF else 0xFF // past-end feeds 1-bits, per spec

    // INITDEC
    c = byteAt(bp).toLong << 16
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xFF) {
        if (byteAt(bp + 1) > 0x8F) { c += 0xFF00; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    def decode(cx: CxStore, label: Int): Int = {
      val s = cx.i(label) & 0xFF
      val qe = Qe(s)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xFFFFL) < qe) {
        // LPS exchange (E.3.4): the sub-interval senses swap when A < Qe
        if (a < qe) { d = cx.mps(label); cx.i(label) = Nmps(s).toByte }
        else {
          d = 1 - cx.mps(label)
          if (Switch(s) == 1) cx.mps(label) = (1 - cx.mps(label)).toByte
          cx.i(label) = Nlps(s).toByte
        }
        a = qe
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          // MPS exchange
          if (a < qe) {
            d = 1 - cx.mps(label)
            if (Switch(s) == 1) cx.mps(label) = (1 - cx.mps(label)).toByte
            cx.i(label) = Nlps(s).toByte
          } else { d = cx.mps(label); cx.i(label) = Nmps(s).toByte }
          renorm()
        } else d = cx.mps(label)
      }
      d
    }

    private def renorm(): Unit = {
      // a < 0x8000 on entry and a ≥ Qe_min ≥ 1 always (A − Qe ≥
      // 0x8000 − 0x5601 on the subtract paths), so the shift never wraps
      var go = true
      while (go) {
        if (ct == 0) byteIn()
        a <<= 1
        c = (c << 1) & 0xFFFFFFFFL
        ct -= 1
        go = (a & 0x8000) == 0
      }
    }
  }

  // ---------------- MQ encoder (T.88 E.3.5-E.3.8) ----------------

  private[sources] final class MqEncoder {
    // leading dummy byte: BYTEOUT's carry branch increments "the previous
    // byte"; before the first real byte that slot is this dummy. A carry
    // OUT of the first code byte is impossible for a valid arithmetic
    // code (the codestream fraction stays < 1), so the dummy is always 0
    // at flush and is stripped — asserted, not assumed.
    private val out = mutable.ArrayBuffer[Byte](0)
    private var bp = 0 // index of the last written byte
    private var c: Long = 0L
    private var a = 0x8000
    private var ct = 12

    def encode(cx: CxStore, label: Int, d: Int): Unit = {
      val s = cx.i(label) & 0xFF
      val qe = Qe(s)
      if (d == cx.mps(label)) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          cx.i(label) = Nmps(s).toByte
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(s) == 1) cx.mps(label) = (1 - cx.mps(label)).toByte
        cx.i(label) = Nlps(s).toByte
        renorm()
      }
    }

    private def renorm(): Unit = {
      var go = true
      while (go) {
        if (ct == 0) byteOut()
        a <<= 1
        c <<= 1
        ct -= 1
        go = (a & 0x8000) == 0
      }
    }

    private def append(b: Int): Unit = { out += b.toByte; bp += 1 }

    private def byteOut(): Unit = {
      if ((out(bp) & 0xFF) == 0xFF) {
        // stuffing: after an 0xFF the next byte takes bits 27-20, so a
        // pending carry is absorbed there instead of propagating back
        append(((c >> 20) & 0xFF).toInt); c &= 0xFFFFFL; ct = 7
      } else if (c < 0x8000000L) {
        append(((c >> 19) & 0xFF).toInt); c &= 0x7FFFFL; ct = 8
      } else {
        out(bp) = (out(bp) + 1).toByte // carry into the previous byte
        if ((out(bp) & 0xFF) == 0xFF) {
          c &= 0x7FFFFFFL
          append(((c >> 20) & 0xFF).toInt); c &= 0xFFFFFL; ct = 7
        } else {
          append(((c >> 19) & 0xFF).toInt); c &= 0x7FFFFL; ct = 8
        }
      }
    }

    /** Bytes committed to the codeword so far. Monotone, so counts
      * taken at two points are stable SLICE OFFSETS into the FINISHED
      * stream — [[Jpx]] slices the post-flush array at these to split
      * a code-block's codeword across quality layers. The byte VALUES
      * around a boundary are not final until [[flush]] returns:
      * byteOut's carry branch can still increment the last committed
      * byte, so never emit or hash a slice before flushing. */
    def committed: Int = bp

    /** FLUSH (E.3.8): set the final bits, push out the last two bytes,
      * terminate with the 0xFF 0xAC marker pair. */
    def flush(): Array[Byte] = {
      // SETBITS: fill the tail with ONES, staying inside [C, C+A-1] —
      // the decoder pads past-end bytes with 1-bits (0xFF), so the
      // committed value must tolerate all-ones low bits. (A
      // trailing-zeros variant here loses the final decision whenever
      // the interval ends tight: caught by the Tier-1 round-trip.)
      val limit = c + a
      c |= 0xFFFFL
      if (c >= limit) c -= 0x8000
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      if ((out(bp) & 0xFF) != 0xFF) append(0xFF)
      append(0xAC)
      require(out.head == 0, "MQ carry escaped the first code byte")
      out.drop(1).toArray
    }
  }

  // ---------------- generic region coding (T.88 §6.2.5.7) ----------------

  /** Per-template nominal AT pixel offsets (x, y). */
  private def nominalAt(template: Int): Array[(Int, Int)] = template match {
    case 0 => Array((3, -1), (-3, -1), (2, -2), (-2, -2))
    case 3 => Array((2, -1))
    case _ => Array((3, -1))
  }

  /** SLTP decision contexts for TPGDON, one per template (§6.2.5.7). */
  private val SltpCx = Array(0x9B25, 0x0795, 0x00E5, 0x0195)

  /** The §6.2.5.7 context label for pixel (x, y). `px(dx, dy)` reads the
    * already-decoded raster with out-of-bounds = 0. Bit positions are the
    * spec formulas; with nominal ATs they coincide with raster order
    * MSB-first. */
  private def context(template: Int, at: Array[(Int, Int)],
      px: (Int, Int) => Int): Int = template match {
    case 0 =>
      px(-1, 0) | px(-2, 0) << 1 | px(-3, 0) << 2 | px(-4, 0) << 3 |
        px(at(0)._1, at(0)._2) << 4 |
        px(2, -1) << 5 | px(1, -1) << 6 | px(0, -1) << 7 |
        px(-1, -1) << 8 | px(-2, -1) << 9 |
        px(at(1)._1, at(1)._2) << 10 | px(at(2)._1, at(2)._2) << 11 |
        px(1, -2) << 12 | px(0, -2) << 13 | px(-1, -2) << 14 |
        px(at(3)._1, at(3)._2) << 15
    case 1 =>
      px(-1, 0) | px(-2, 0) << 1 | px(-3, 0) << 2 |
        px(at(0)._1, at(0)._2) << 3 |
        px(2, -1) << 4 | px(1, -1) << 5 | px(0, -1) << 6 |
        px(-1, -1) << 7 | px(-2, -1) << 8 |
        px(2, -2) << 9 | px(1, -2) << 10 | px(0, -2) << 11 |
        px(-1, -2) << 12
    case 2 =>
      px(-1, 0) | px(-2, 0) << 1 |
        px(at(0)._1, at(0)._2) << 2 |
        px(1, -1) << 3 | px(0, -1) << 4 | px(-1, -1) << 5 |
        px(-2, -1) << 6 |
        px(1, -2) << 7 | px(0, -2) << 8 | px(-1, -2) << 9
    case _ =>
      px(-1, 0) | px(-2, 0) << 1 | px(-3, 0) << 2 | px(-4, 0) << 3 |
        px(at(0)._1, at(0)._2) << 4 |
        px(1, -1) << 5 | px(0, -1) << 6 | px(-1, -1) << 7 |
        px(-2, -1) << 8 | px(-3, -1) << 9
  }

  /** MQ-encode a raster as a generic region bitstream (no segment
    * wrapper). TPGDON codes an SLTP toggle per row and skips rows equal
    * to the one above. */
  private[sources] def encodeGeneric(rows: IndexedSeq[Array[Boolean]],
      width: Int, template: Int, tpgdon: Boolean): Array[Byte] = {
    val enc = new MqEncoder
    encodeGenericWith(enc, new CxStore, rows, width, template, tpgdon)
    enc.flush()
  }

  /** The same coding over a CALLER-OWNED coder and context store — the
    * form symbol dictionaries need: every symbol bitmap in a dictionary
    * shares one arithmetic codeword and one set of GB contexts. */
  private[sources] def encodeGenericWith(enc: MqEncoder, cx: CxStore,
      rows: IndexedSeq[Array[Boolean]], width: Int, template: Int,
      tpgdon: Boolean): Unit = {
    val at = nominalAt(template)
    var ltp = false
    var y = 0
    while (y < rows.length) {
      val row = rows(y)
      def px(dx: Int, dy: Int, x: Int): Int = {
        val xx = x + dx; val yy = y + dy
        if (xx < 0 || xx >= width || yy < 0) 0
        else if (dy == 0) { if (row(xx)) 1 else 0 }
        else if (rows(yy)(xx)) 1 else 0
      }
      if (tpgdon) {
        val typical = y > 0 && java.util.Arrays.equals(row, rows(y - 1))
        val sltp = if (typical != ltp) 1 else 0
        enc.encode(cx, SltpCx(template), sltp)
        ltp = typical
      }
      if (!(tpgdon && ltp)) {
        var x = 0
        while (x < width) {
          val label = context(template, at, (dx, dy) => px(dx, dy, x))
          enc.encode(cx, label, if (row(x)) 1 else 0)
          x += 1
        }
      }
      y += 1
    }
  }

  /** MQ-decode a generic region. Returns rows (true = black). */
  private def decodeGeneric(data: Array[Byte], start: Int, end: Int,
      width: Int, height: Int, template: Int, at: Array[(Int, Int)],
      tpgdon: Boolean): Array[Array[Boolean]] = {
    val dec = new MqDecoder(data, start, end)
    decodeGenericWith(dec, new CxStore, width, height, template, at, tpgdon)
  }

  /** Decode over a caller-owned coder + contexts (symbol dictionaries). */
  private[sources] def decodeGenericWith(dec: MqDecoder, cx: CxStore,
      width: Int, height: Int, template: Int, at: Array[(Int, Int)],
      tpgdon: Boolean): Array[Array[Boolean]] = {
    val rows = Array.ofDim[Boolean](height, width)
    var ltp = false
    var y = 0
    while (y < height) {
      if (tpgdon && dec.decode(cx, SltpCx(template)) == 1) ltp = !ltp
      if (tpgdon && ltp) {
        if (y > 0) System.arraycopy(rows(y - 1), 0, rows(y), 0, width)
      } else {
        var x = 0
        while (x < width) {
          val xf = x
          val yf = y
          def px(dx: Int, dy: Int): Int = {
            val xx = xf + dx; val yy = yf + dy
            if (xx < 0 || xx >= width || yy < 0 || (yy == yf && xx >= xf)) 0
            else if (rows(yy)(xx)) 1 else 0
          }
          if (dec.decode(cx, context(template, at, px)) == 1) rows(y)(x) = true
          x += 1
        }
      }
      y += 1
    }
    rows
  }

  // ---------- generic refinement region coding (T.88 §6.3) ----------

  /** Nominal refinement AT pixels (§6.3.5.3): A1 reads the current
    * layer, A2 the reference layer, both nominally (−1, −1). */
  private def nominalRefAt: Array[(Int, Int)] = Array((-1, -1), (-1, -1))

  /** TPGRON's SLTP decision contexts, one per GR template (§6.3.5.6). */
  private val RefSltpCx = Array(0x0100, 0x0080)

  /** The §6.3.5.3 refinement context label for one pixel: `cur` reads
    * the partially-built refinement raster, `ref` the reference layer
    * shifted by (GRREFERENCEDX, GRREFERENCEDY) — both out-of-bounds =
    * 0. GRTEMPLATE 0 is 13 pixels (4 current incl. A1, 9 reference
    * incl. A2), template 1 is 10 (4 current, 6 reference). */
  private def refContext(template: Int, at: Array[(Int, Int)],
      cur: (Int, Int) => Int, ref: (Int, Int) => Int): Int =
    if (template == 0)
      cur(-1, 0) | cur(1, -1) << 1 | cur(0, -1) << 2 |
        cur(at(0)._1, at(0)._2) << 3 |
        ref(1, 1) << 4 | ref(0, 1) << 5 | ref(-1, 1) << 6 |
        ref(at(1)._1, at(1)._2) << 7 |
        ref(1, 0) << 8 | ref(0, 0) << 9 | ref(-1, 0) << 10 |
        ref(1, -1) << 11 | ref(0, -1) << 12
    else
      cur(-1, 0) | cur(1, -1) << 1 | cur(0, -1) << 2 | cur(-1, -1) << 3 |
        ref(1, 1) << 4 | ref(0, 1) << 5 |
        ref(1, 0) << 6 | ref(0, 0) << 7 | ref(-1, 0) << 8 |
        ref(0, -1) << 9

  /** TPGRON's "typical pixel" test: the 3×3 reference neighborhood is
    * uniform → Some(that value), else None (§6.3.5.6 step 3(c)). */
  private def refUniform(ref: (Int, Int) => Int): Option[Int] = {
    val v = ref(-1, -1)
    var dy = -1
    while (dy <= 1) {
      var dx = -1
      while (dx <= 1) {
        if (ref(dx, dy) != v) return None
        dx += 1
      }
      dy += 1
    }
    Some(v)
  }

  /** MQ-encode a raster as a refinement of `refBm` (nominal ATs,
    * GRREFERENCEDX/DY = 0 — the page-refinement form 7.4.7.2 fixes).
    * With TPGRON, a row is flagged typical when every pixel whose 3×3
    * reference neighborhood is uniform already equals that value; the
    * flagged rows then code only their non-typical pixels. */
  private[sources] def encodeRefinement(rows: IndexedSeq[Array[Boolean]],
      width: Int, template: Int, refBm: Array[Array[Boolean]],
      tpgron: Boolean): Array[Byte] = {
    val enc = new MqEncoder
    encodeRefinementWith(enc, new CxStore, rows, width, template,
      nominalRefAt, refBm, 0, 0, tpgron)
    enc.flush()
  }

  /** The same refinement coding over a CALLER-OWNED coder and GR
    * context store — the form SDREFAGG dictionaries and REFINE text
    * regions need: every refinement in a segment shares one arithmetic
    * codeword and one set of GR contexts (§6.5.8.2.2, §6.4.11). */
  private[sources] def encodeRefinementWith(enc: MqEncoder, cx: CxStore,
      rows: IndexedSeq[Array[Boolean]], width: Int, template: Int,
      at: Array[(Int, Int)], refBm: Array[Array[Boolean]], dx: Int,
      dy: Int, tpgron: Boolean): Unit = {
    val refH = refBm.length
    val refW = if (refH == 0) 0 else refBm(0).length
    var ltp = false
    var y = 0
    while (y < rows.length) {
      val row = rows(y)
      val yf = y
      def ref(xf: Int)(ddx: Int, ddy: Int): Int = {
        val xx = xf - dx + ddx; val yy = yf - dy + ddy
        if (xx < 0 || xx >= refW || yy < 0 || yy >= refH) 0
        else if (refBm(yy)(xx)) 1 else 0
      }
      def cur(xf: Int)(ddx: Int, ddy: Int): Int = {
        val xx = xf + ddx; val yy = yf + ddy
        // yy > yf: not-yet-coded rows read 0 (a custom AT with a
        // positive ay must stay symmetric with the decoder, where
        // those rows do not exist yet)
        if (xx < 0 || xx >= width || yy < 0 || yy > yf ||
            (yy == yf && xx >= xf)) 0
        else if (rows(yy)(xx)) 1 else 0
      }
      if (tpgron) {
        var want = true
        var x = 0
        while (want && x < width) {
          refUniform(ref(x)).foreach(v => if ((v == 1) != row(x)) want = false)
          x += 1
        }
        val sltp = if (want != ltp) 1 else 0
        enc.encode(cx, RefSltpCx(template), sltp)
        ltp = want
      }
      var x = 0
      while (x < width) {
        if (!(ltp && refUniform(ref(x)).isDefined))
          enc.encode(cx, refContext(template, at, cur(x), ref(x)),
            if (row(x)) 1 else 0)
        x += 1
      }
      y += 1
    }
  }

  /** Decode a generic refinement region (§6.3.5.6): each pixel is coded
    * against its own partial raster AND the reference layer; rows under
    * an active TPGRON flag copy pixels whose 3×3 reference neighborhood
    * is uniform instead of decoding them. */
  private[sources] def decodeRefinement(data: Array[Byte], start: Int,
      end: Int, width: Int, height: Int, template: Int,
      at: Array[(Int, Int)], refBm: Array[Array[Boolean]], dx: Int,
      dy: Int, tpgron: Boolean): Array[Array[Boolean]] =
    decodeRefinementWith(new MqDecoder(data, start, end), new CxStore,
      width, height, template, at, refBm, dx, dy, tpgron)

  /** Decode over a caller-owned coder + GR contexts (SDREFAGG symbol
    * dictionaries, REFINE text regions). */
  private[sources] def decodeRefinementWith(dec: MqDecoder, cx: CxStore,
      width: Int, height: Int, template: Int, at: Array[(Int, Int)],
      refBm: Array[Array[Boolean]], dx: Int, dy: Int,
      tpgron: Boolean): Array[Array[Boolean]] = {
    val refH = refBm.length
    val refW = if (refH == 0) 0 else refBm(0).length
    val rows = Array.ofDim[Boolean](height, width)
    var ltp = false
    var y = 0
    while (y < height) {
      if (tpgron && dec.decode(cx, RefSltpCx(template)) == 1) ltp = !ltp
      var x = 0
      while (x < width) {
        val xf = x
        val yf = y
        def cur(ddx: Int, ddy: Int): Int = {
          val xx = xf + ddx; val yy = yf + ddy
          // yy > yf guards hostile ATs with positive ay: those rows
          // are undecoded (and rows(yy) would throw on the last row)
          if (xx < 0 || xx >= width || yy < 0 || yy > yf ||
              (yy == yf && xx >= xf)) 0
          else if (rows(yy)(xx)) 1 else 0
        }
        def ref(ddx: Int, ddy: Int): Int = {
          val xx = xf - dx + ddx; val yy = yf - dy + ddy
          if (xx < 0 || xx >= refW || yy < 0 || yy >= refH) 0
          else if (refBm(yy)(xx)) 1 else 0
        }
        val bit =
          if (ltp) refUniform(ref).getOrElse(
            dec.decode(cx, refContext(template, at, cur, ref)))
          else dec.decode(cx, refContext(template, at, cur, ref))
        if (bit == 1) rows(y)(x) = true
        x += 1
      }
      y += 1
    }
    rows
  }

  // ---------- integer arithmetic decoding (T.88 Annex A) ----------

  /** One IAx procedure's context tree: 512 states addressed by the PREV
    * prefix register. Each procedure (IADH, IADW, IADT, IAFS, IADS,
    * IAIT, IAEX, IAAI) owns its own instance. */
  private[sources] final class IntCtx {
    val cx = new CxStore(512)
  }

  /** A.2 — decode one integer; None is the OOB value ("negative zero"
    * S=1, V=0) that terminates runs. */
  private[sources] def decodeInt(dec: MqDecoder, ctx: IntCtx): Option[Int] = {
    var prev = 1
    def bit(): Int = {
      val b = dec.decode(ctx.cx, prev)
      prev =
        if (prev < 256) (prev << 1) | b
        else ((((prev << 1) | b) & 511) | 256)
      b
    }
    val s = bit()
    var n = 0
    var offset = 0
    if (bit() == 0) { n = 2; offset = 0 }
    else if (bit() == 0) { n = 4; offset = 4 }
    else if (bit() == 0) { n = 6; offset = 20 }
    else if (bit() == 0) { n = 8; offset = 84 }
    else if (bit() == 0) { n = 12; offset = 340 }
    else { n = 32; offset = 4436 }
    var v = 0
    var i = 0
    while (i < n) { v = (v << 1) | bit(); i += 1 }
    v += offset
    if (s == 1 && v == 0) None
    else Some(if (s == 1) -v else v)
  }

  /** Mirror of [[decodeInt]]. */
  private[sources] def encodeInt(enc: MqEncoder, ctx: IntCtx,
      value: Option[Int]): Unit = {
    var prev = 1
    def bit(b: Int): Unit = {
      enc.encode(ctx.cx, prev, b)
      prev =
        if (prev < 256) (prev << 1) | b
        else ((((prev << 1) | b) & 511) | 256)
    }
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    value match {
      case None => bit(1); bit(0); bits(0, 2) // OOB = S=1, smallest class, V=0
      case Some(x) =>
        bit(if (x < 0) 1 else 0)
        val v = math.abs(x)
        if (v < 4) { bit(0); bits(v, 2) }
        else if (v < 20) { bit(1); bit(0); bits(v - 4, 4) }
        else if (v < 84) { bit(1); bit(1); bit(0); bits(v - 20, 6) }
        else if (v < 340) { bit(1); bit(1); bit(1); bit(0); bits(v - 84, 8) }
        else if (v < 4436) {
          bit(1); bit(1); bit(1); bit(1); bit(0); bits(v - 340, 12)
        } else { bit(1); bit(1); bit(1); bit(1); bit(1); bits(v - 4436, 32) }
    }
  }

  /** A.3 — the IAID procedure: SYMCODELEN bits through a 2^(len+1)
    * context tree; the decoded prefix register minus the tree offset IS
    * the symbol id. */
  private[sources] final class IdCtx(val len: Int) {
    val cx = new CxStore(1 << (len + 1))
  }

  private[sources] def decodeId(dec: MqDecoder, ctx: IdCtx): Int = {
    var prev = 1
    var i = 0
    while (i < ctx.len) {
      val b = dec.decode(ctx.cx, prev)
      prev = (prev << 1) | b
      i += 1
    }
    prev - (1 << ctx.len)
  }

  private[sources] def encodeId(enc: MqEncoder, ctx: IdCtx, id: Int): Unit = {
    var prev = 1
    var i = ctx.len - 1
    while (i >= 0) {
      val b = (id >> i) & 1
      enc.encode(ctx.cx, prev, b)
      prev = (prev << 1) | b
      i -= 1
    }
  }

  // ---------- Huffman tables (T.88 Annex B) ----------

  /** MSB-first bit reader over a byte slice; byte-aligned resume points
    * let Huffman runs interleave with embedded collective bitmaps.
    * Overruns throw — callers wrap in the decode's Option boundary. */
  private[sources] final class BitRd(d: Array[Byte], var bytePos: Int,
      end: Int) {
    private var bitPos = 0
    def bit(): Int = {
      if (bytePos >= end) throw new IllegalStateException("bit overrun")
      val v = (d(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** MSB-first bit writer (the encoder twin of [[BitRd]]). */
  private[sources] final class BitWr {
    private val out = mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == 8) { out += cur.toByte; cur = 0; nbits = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    def align(): Unit = while (nbits != 0) bit(0)
    def bytes(bs: Array[Byte]): Unit = { align(); out ++= bs }
    def result(): Array[Byte] = { align(); out.toArray }
  }

  /** One line of an Annex-B table: a `prefLen`-bit prefix selects it,
    * then `rangeLen` offset bits add to (lower: subtract from)
    * `rangeLow`. The LAST 32-bit non-lower line is the upper range. */
  private[sources] final case class HuffLine(prefLen: Int, rangeLen: Int,
      rangeLow: Int, lower: Boolean = false)

  /** An assigned Annex-B Huffman table: canonical prefix codes per B.3
    * (codes assigned by ascending length, declaration order within a
    * length; the OOB pseudo-line takes its slot at `oobPrefLen` after
    * same-length declared lines). decode → Some(Some(v)) for a value,
    * Some(None) for OOB, None for an unmatchable prefix. */
  private[sources] final class HuffTable(lines: Seq[HuffLine],
      oobPrefLen: Int = 0) {
    // (code, len) -> line index, or -1 for OOB
    private val byCode: Map[(Int, Int), Int] = {
      val m = mutable.Map.empty[(Int, Int), Int]
      var code = 0
      for (len <- 1 to 32) {
        code <<= 1
        lines.zipWithIndex.filter(_._1.prefLen == len).foreach {
          case (_, i) => m((code, len)) = i; code += 1
        }
        if (oobPrefLen == len) { m((code, len)) = -1; code += 1 }
      }
      m.toMap
    }
    private val maxLen = lines.map(_.prefLen).max max oobPrefLen

    def decode(r: BitRd): Option[Option[Int]] = {
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | r.bit()
        len += 1
        byCode.get((code, len)) match {
          case Some(-1) => return Some(None) // OOB
          case Some(i) =>
            val l = lines(i)
            val off = r.bits(l.rangeLen)
            val v =
              if (l.lower) l.rangeLow.toLong - off
              else l.rangeLow.toLong + off
            if (v < Int.MinValue || v > Int.MaxValue) return None
            return Some(Some(v.toInt))
          case None => ()
        }
      }
      None
    }

    /** Encoder twin: emit the code for `v` (the first line whose range
      * contains it, in declaration order — mirrors decode exactly). */
    def encode(w: BitWr, v: Int): Unit = {
      val idx = lines.indexWhere { l =>
        if (l.lower) v <= l.rangeLow
        else if (l.rangeLen == 32) v >= l.rangeLow
        else v >= l.rangeLow && v < l.rangeLow + (1L << l.rangeLen)
      }
      require(idx >= 0, s"value $v outside table range")
      val (code, len) = codeOf(idx)
      w.bits(code, len)
      val l = lines(idx)
      val off = if (l.lower) l.rangeLow.toLong - v else v.toLong - l.rangeLow
      w.bits(off, l.rangeLen)
    }

    def encodeOob(w: BitWr): Unit = {
      require(oobPrefLen > 0, "table has no OOB")
      val (code, len) = codeOf(-1)
      w.bits(code, len)
    }

    private def codeOf(idx: Int): (Int, Int) =
      byCode.collectFirst { case ((c, l), i) if i == idx => (c, l) }.get
  }

  /** A CUSTOM code table in the on-wire form of a type-53 segment
    * (T.88 B.2.1): consecutive value ranges from `htLow` to `htHigh`,
    * each line a (prefix length, range length) pair, plus the
    * lower/upper 32-bit range prefixes and an optional OOB prefix.
    * ONE spec builds BOTH the segment bytes and the assigned
    * [[HuffTable]], so encoder and decoder cannot drift. */
  private[sources] final case class CodeTableSpec(htLow: Int, htHigh: Int,
      ranges: Seq[(Int, Int)], lowerPref: Int, upperPref: Int,
      oobPref: Int = 0) {
    def table: HuffTable = {
      val lines = mutable.ArrayBuffer.empty[HuffLine]
      var low = htLow
      ranges.foreach { case (p, rl) =>
        lines += HuffLine(p, rl, low)
        low += (1 << rl)
      }
      lines += HuffLine(lowerPref, 32, htLow - 1, lower = true)
      lines += HuffLine(upperPref, 32, htHigh)
      new HuffTable(lines.toSeq, oobPref)
    }

    /** Segment DATA bytes (flags, HTLOW, HTHIGH, bit-packed lines). */
    def segmentData: Array[Byte] = {
      val htps = ranges.map(_._1).max max lowerPref max upperPref max
        oobPref
      val htrs = ranges.map(_._2).max max 1
      def bitsFor(v: Int): Int =
        math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(1, v)))
      val ps = bitsFor(htps)
      val rs = bitsFor(htrs)
      val b = mutable.ArrayBuffer.empty[Byte]
      b += (((if (oobPref > 0) 1 else 0) | ((ps - 1) << 1) |
        ((rs - 1) << 4)) & 0xFF).toByte
      be32(b, htLow.toLong & 0xFFFFFFFFL)
      be32(b, htHigh.toLong & 0xFFFFFFFFL)
      val w = new BitWr
      ranges.foreach { case (p, rl) => w.bits(p, ps); w.bits(rl, rs) }
      w.bits(lowerPref, ps)
      w.bits(upperPref, ps)
      if (oobPref > 0) w.bits(oobPref, ps)
      b ++= w.result()
      b.toArray
    }
  }

  /** Parse a type-53 code-table segment's data into an assigned table
    * (B.2.1). Line order for canonical assignment = on-wire order:
    * ranges low→high, then lower, upper, OOB. */
  private[sources] def decodeCodeTable(data: Array[Byte], start: Int,
      end: Int): Option[HuffTable] = try {
    if (end - start < 9) return None
    val flags = data(start) & 0xFF
    val oob = (flags & 1) != 0
    val ps = ((flags >> 1) & 7) + 1
    val rs = ((flags >> 4) & 7) + 1
    def i32(p: Int): Int =
      ((data(p) & 0xFF) << 24) | ((data(p + 1) & 0xFF) << 16) |
        ((data(p + 2) & 0xFF) << 8) | (data(p + 3) & 0xFF)
    val htLow = i32(start + 1)
    val htHigh = i32(start + 5)
    if (htLow >= htHigh) return None
    val br = new BitRd(data, start + 9, end)
    val lines = mutable.ArrayBuffer.empty[HuffLine]
    var low = htLow.toLong
    var n = 0
    while (low < htHigh) {
      val p = br.bits(ps).toInt
      val rl = br.bits(rs).toInt
      if (rl > 31) return None
      lines += HuffLine(p, rl, low.toInt)
      low += (1L << rl)
      n += 1
      if (n > 1024) return None // hostile line-count bound
    }
    lines += HuffLine(br.bits(ps).toInt, 32, htLow - 1, lower = true)
    lines += HuffLine(br.bits(ps).toInt, 32, htHigh)
    val oobPref = if (oob) br.bits(ps).toInt else 0
    Some(new HuffTable(lines.toSeq, oobPref))
  } catch { case _: IllegalStateException => None }

  // Standard tables (T.88 Annex B): B.1 sizes/run-lengths, B.2/B.3 the
  // DW deltas (B.3 signed with OOB), B.4/B.5 the DH deltas.
  private[sources] val TableB1 = new HuffTable(Seq(
    HuffLine(1, 4, 0), HuffLine(2, 8, 16), HuffLine(3, 16, 272),
    HuffLine(3, 32, 65808)))
  private[sources] val TableB2 = new HuffTable(Seq(
    HuffLine(1, 0, 0), HuffLine(2, 0, 1), HuffLine(3, 0, 2),
    HuffLine(4, 3, 3), HuffLine(5, 6, 11), HuffLine(6, 32, 75)),
    oobPrefLen = 6)
  private[sources] val TableB3 = new HuffTable(Seq(
    HuffLine(8, 8, -256), HuffLine(1, 0, 0), HuffLine(2, 0, 1),
    HuffLine(3, 0, 2), HuffLine(4, 3, 3), HuffLine(5, 6, 11),
    HuffLine(8, 32, -257, lower = true), HuffLine(7, 32, 75)),
    oobPrefLen = 6)
  private[sources] val TableB4 = new HuffTable(Seq(
    HuffLine(1, 0, 1), HuffLine(2, 0, 2), HuffLine(3, 0, 3),
    HuffLine(4, 3, 4), HuffLine(5, 6, 12), HuffLine(5, 32, 76)))
  private[sources] val TableB5 = new HuffTable(Seq(
    HuffLine(7, 8, -255), HuffLine(1, 0, 1), HuffLine(2, 0, 2),
    HuffLine(3, 0, 3), HuffLine(4, 3, 4), HuffLine(5, 6, 12),
    HuffLine(7, 32, -256, lower = true), HuffLine(6, 32, 76)))

  // ---------- symbol dictionary (T.88 §6.5, arithmetic) ----------

  /** Decode an arithmetic symbol dictionary's data: height classes via
    * IADH/IADW deltas, each symbol bitmap generic-region-coded on the
    * SHARED codeword and GB contexts, then the IAEX export runs. Returns
    * the exported bitmaps. Huffman dictionaries (SDHUFF) dispatch to
    * [[decodeSymbolDictHuff]]; refinement-aggregate (SDREFAGG, §6.5.8.2)
    * decodes both the single-instance form and the REFAGGNINST > 1
    * aggregate (a nested text region per symbol on shared contexts). */
  private[sources] def decodeSymbolDict(data: Array[Byte], start: Int,
      end: Int, input: IndexedSeq[Array[Array[Boolean]]],
      maxPixels: Long,
      tables: IndexedSeq[HuffTable] = IndexedSeq.empty)
      : Option[IndexedSeq[Array[Array[Boolean]]]] = {
    val r = new Reader(data)
    r.p = start
    if (end - start < 2 + 4 + 4) return None
    val flags = r.u16()
    val sdhuff = (flags & 1) != 0
    val sdrefagg = (flags & 2) != 0
    val template = (flags >> 10) & 3
    val rtemplate = (flags >> 12) & 1
    if (sdhuff && sdrefagg) return None // no Huffman refinement support
    if (sdhuff)
      return decodeSymbolDictHuff(data, r.p, end, flags, input, maxPixels,
        tables)
    val atCount = if (template == 0) 4 else 1
    if (end - r.p < 2 * atCount + 8) return None
    val at = Array.fill(atCount) { val x = r.s8(); val y = r.s8(); (x, y) }
    // SDRAT: present only when refinement-aggregate coding is on and
    // the GR template needs AT pixels (7.4.4.1.2)
    val ratCount = if (sdrefagg && rtemplate == 0) 2 else 0
    if (end - r.p < 2 * ratCount + 8) return None
    val rat = Array.fill(ratCount) { val x = r.s8(); val y = r.s8(); (x, y) }
    val numEx = r.u32()
    val numNew = r.u32()
    if (numEx > 10000 || numNew > 10000) return None
    val dec = new MqDecoder(data, r.p, end)
    val gbCx = new CxStore
    val iadh = new IntCtx
    val iadw = new IntCtx
    val iaex = new IntCtx
    // refinement-aggregate state (§6.5.8.2): shared GR contexts, the
    // aggregate-instance count, and symbol-id/offset contexts. The id
    // space is input ++ new with a FIXED code length over the declared
    // totals (6.5.8.2.3), so ids can name symbols not yet decoded —
    // guarded below, a reference must already exist.
    lazy val grCx = new CxStore
    lazy val iaai = new IntCtx
    lazy val iardx = new IntCtx
    lazy val iardy = new IntCtx
    lazy val iaid = new IdCtx(math.max(1,
      32 - Integer.numberOfLeadingZeros(
        math.max(1, input.length + numNew.toInt - 1))))
    // the REFAGGNINST > 1 aggregate form decodes a nested TEXT REGION
    // per symbol, sharing the dictionary's arithmetic decoder and
    // integer contexts (6.5.8.2.2) — these persist across symbols
    lazy val iadt = new IntCtx
    lazy val iafs = new IntCtx
    lazy val iads = new IntCtx
    lazy val iari = new IntCtx
    lazy val iardw = new IntCtx
    lazy val iardh = new IntCtx
    lazy val aggWork = Array(2L * maxPixels + (1L << 20))
    val newSyms = mutable.ArrayBuffer.empty[Array[Array[Boolean]]]
    var budget = maxPixels
    var hcHeight = 0
    while (newSyms.length < numNew.toInt) {
      val dh = decodeInt(dec, iadh).getOrElse(return None)
      // height classes are strictly increasing (6.5.5), which also
      // bounds the class loop: an all-empty-class stream would
      // otherwise never reach numNew and spin forever
      if (dh < 1) return None
      hcHeight += dh
      if (hcHeight > (1 << 12)) return None
      var symWidth = 0
      var classDone = false
      // each height class runs to its OOB terminator — the count alone
      // must NOT end the loop, or the terminator desynchronizes the
      // export-run decode that follows
      while (!classDone) {
        decodeInt(dec, iadw) match {
          case None => classDone = true
          case Some(dw) =>
            if (newSyms.length >= numNew.toInt) return None // malformed
            symWidth += dw
            if (symWidth <= 0 || symWidth > (1 << 12) ||
                symWidth.toLong * hcHeight > budget) return None
            budget -= symWidth.toLong * hcHeight
            if (!sdrefagg)
              newSyms += decodeGenericWith(dec, gbCx, symWidth, hcHeight,
                template, at, tpgdon = false)
            else {
              val nInst = decodeInt(dec, iaai).getOrElse(return None)
              if (nInst == 1) {
                // single-refinement form: refine one referred-or-
                // earlier symbol directly (6.5.8.2.2's short path)
                val id = decodeId(dec, iaid)
                if (id < 0 || id >= input.length + newSyms.length)
                  return None
                val rdx = decodeInt(dec, iardx).getOrElse(return None)
                val rdy = decodeInt(dec, iardy).getOrElse(return None)
                // two-sided compare, not abs(): abs(Int.MinValue) is
                // negative and would sneak under the bound
                if (rdx < -(1 << 12) || rdx > (1 << 12) ||
                    rdy < -(1 << 12) || rdy > (1 << 12)) return None
                val refBm =
                  if (id < input.length) input(id)
                  else newSyms(id - input.length)
                newSyms += decodeRefinementWith(dec, grCx, symWidth,
                  hcHeight, rtemplate, rat, refBm, rdx, rdy,
                  tpgron = false)
              } else {
                // aggregate form (6.5.8.2.1): the symbol is a nested
                // TEXT REGION of REFAGGNINST refined instances drawn
                // onto a symWidth×hcHeight canvas — SBSTRIPS = 1,
                // TOPLEFT, OR, dsOffset 0, ids over input ++ new so far
                if (nInst < 1 || nInst > (1 << 10)) return None
                // constant-cost view frozen at this symbol: a hostile
                // all-aggregate dictionary must not pay O(n^2) copying
                val frozen = newSyms.length
                val symsNow = new scala.collection.immutable.IndexedSeq[
                    Array[Array[Boolean]]] {
                  def length: Int = input.length + frozen
                  def apply(j: Int): Array[Array[Boolean]] =
                    if (j < input.length) input(j)
                    else newSyms(j - input.length)
                }
                val readers = new TextReaders {
                  def dt(): Option[Int] = decodeInt(dec, iadt)
                  def fs(): Option[Int] = decodeInt(dec, iafs)
                  def ds(): Option[Option[Int]] = Some(decodeInt(dec, iads))
                  def curT(): Option[Int] = Some(0) // SBSTRIPS = 1
                  def id(): Option[Int] = Some(decodeId(dec, iaid))
                  override def inst(id: Int, sym: Array[Array[Boolean]])
                      : Option[Array[Array[Boolean]]] =
                    decodeRefinedInst(dec, iari, iardw, iardh, iardx,
                      iardy, grCx, rtemplate, rat, aggWork, sym)
                }
                runTextLoop(symWidth, hcHeight, symsNow, nInst, 1, 0,
                  refCorner = 1, readers, aggWork) match {
                  case Some(rows) => newSyms += rows
                  case None => return None
                }
              }
            }
        }
      }
    }
    // export runs (6.5.10); `run ≤ remaining` phrasing avoids Int
    // overflow, and the rounds cap stops a zero-run stream that would
    // toggle the flag forever without advancing
    val all = input ++ newSyms
    val exported = mutable.ArrayBuffer.empty[Array[Array[Boolean]]]
    var exIndex = 0
    var exFlag = false
    var rounds = 0
    while (exIndex < all.length) {
      val run = decodeInt(dec, iaex).getOrElse(return None)
      if (run < 0 || run > all.length - exIndex) return None
      rounds += 1
      if (rounds > 2 * all.length + 8) return None
      if (exFlag) exported ++= all.slice(exIndex, exIndex + run)
      exIndex += run
      exFlag = !exFlag
    }
    if (exported.length != numEx.toInt) return None
    Some(exported.toIndexedSeq)
  }

  /** Decode a HUFFMAN-coded symbol dictionary (SDHUFF = 1, REFAGG = 0)
    * — the other wild dictionary organization (fax-lineage producers):
    * DH/DW deltas are Annex-B prefix codes (standard tables only;
    * custom-table streams degrade to None), and each height class
    * carries one COLLECTIVE bitmap — uncompressed rows (BMSIZE = 0) or
    * MMR (= T.6, the shared [[CcittG4]] decoder) — sliced into symbols
    * by the decoded widths (§6.5.9). Export runs use Table B.1.
    * `startAfterFlags` points just past the 16-bit flags (no AT bytes
    * exist when SDHUFF = 1). */
  private[sources] def decodeSymbolDictHuff(data: Array[Byte],
      startAfterFlags: Int, end: Int, flags: Int,
      input: IndexedSeq[Array[Array[Boolean]]],
      maxPixels: Long, tables: IndexedSeq[HuffTable] = IndexedSeq.empty)
      : Option[IndexedSeq[Array[Array[Boolean]]]] = try {
    val dhSel = (flags >> 2) & 3
    val dwSel = (flags >> 4) & 3
    val bmSel = (flags >> 6) & 1
    // custom tables come from referred type-53 segments, consumed in
    // field order — DH, then DW, then BMSIZE (7.4.4.1.6's assignment
    // rule); a selection with no table left degrades honestly
    var ti = 0
    def nextTable(): Option[HuffTable] =
      if (ti < tables.length) { val t = tables(ti); ti += 1; Some(t) }
      else None
    val tableDH = dhSel match {
      case 0 => TableB4
      case 1 => TableB5
      case 3 => nextTable().getOrElse(return None)
      case _ => return None
    }
    val tableDW = dwSel match {
      case 0 => TableB2
      case 1 => TableB3
      case 3 => nextTable().getOrElse(return None)
      case _ => return None
    }
    val tableBm =
      if (bmSel == 0) TableB1 else nextTable().getOrElse(return None)
    val r = new Reader(data)
    r.p = startAfterFlags
    if (end - r.p < 8) return None
    val numEx = r.u32()
    val numNew = r.u32()
    if (numEx > 10000 || numNew > 10000) return None
    val br = new BitRd(data, r.p, end)
    val newSyms = mutable.ArrayBuffer.empty[Array[Array[Boolean]]]
    var budget = maxPixels
    var hcHeight = 0
    while (newSyms.length < numNew.toInt) {
      val dhV = tableDH.decode(br).flatten.getOrElse(return None)
      if (dhV < 1) return None // height classes strictly increase
      hcHeight += dhV
      if (hcHeight > (1 << 12)) return None
      var symWidth = 0
      val widths = mutable.ArrayBuffer.empty[Int]
      var classDone = false
      while (!classDone) {
        tableDW.decode(br).getOrElse(return None) match {
          case None => classDone = true // OOB terminates the class
          case Some(dw) =>
            if (newSyms.length + widths.length >= numNew.toInt) return None
            symWidth += dw
            if (symWidth <= 0 || symWidth > (1 << 12)) return None
            widths += symWidth
        }
      }
      if (widths.nonEmpty) {
        val totWidth = widths.sum
        if (totWidth.toLong * hcHeight > budget) return None
        budget -= totWidth.toLong * hcHeight
        // height class collective bitmap (6.5.9): BMSIZE, then skip to
        // a byte boundary, then the bitmap bytes, then resume Huffman
        // at the next byte boundary
        val bmSize = tableBm.decode(br).flatten.getOrElse(return None)
        if (bmSize < 0 || bmSize > end - br.bytePos) return None
        br.align()
        val rows: IndexedSeq[Array[Boolean]] =
          if (bmSize == 0) { // uncompressed, rows padded to bytes
            val rowBytes = (totWidth + 7) / 8
            if (br.bytePos + hcHeight.toLong * rowBytes > end) return None
            val out = (0 until hcHeight).map { y =>
              val row = new Array[Boolean](totWidth)
              var x = 0
              while (x < totWidth) {
                val byte = data(br.bytePos + y * rowBytes + x / 8) & 0xFF
                row(x) = ((byte >> (7 - x % 8)) & 1) == 1
                x += 1
              }
              row
            }
            br.bytePos += hcHeight * rowBytes
            out
          } else { // MMR = T.6 (§6.2.6 via the shared G4 decoder)
            val slice = java.util.Arrays.copyOfRange(data, br.bytePos,
              br.bytePos + bmSize)
            val d = CcittG4.decode(slice, totWidth, maxRows = hcHeight)
              .filter(_.height == hcHeight).getOrElse(return None)
            br.bytePos += bmSize
            d.rows.toIndexedSeq
          }
        // slice the collective bitmap into symbols by decoded widths
        var x0 = 0
        widths.foreach { sw =>
          newSyms += (0 until hcHeight).map { y =>
            java.util.Arrays.copyOfRange(rows(y), x0, x0 + sw)
          }.toArray
          x0 += sw
        }
      }
    }
    // export runs (6.5.10): run lengths via Table B.1 when SDHUFF = 1
    val all = input ++ newSyms
    val exported = mutable.ArrayBuffer.empty[Array[Array[Boolean]]]
    var exIndex = 0
    var exFlag = false
    var rounds = 0
    while (exIndex < all.length) {
      val run = TableB1.decode(br).flatten.getOrElse(return None)
      if (run < 0 || run > all.length - exIndex) return None
      rounds += 1
      if (rounds > 2 * all.length + 8) return None
      if (exFlag) exported ++= all.slice(exIndex, exIndex + run)
      exIndex += run
      exFlag = !exFlag
    }
    if (exported.length != numEx.toInt) return None
    Some(exported.toIndexedSeq)
  } catch { case _: IllegalStateException => None } // bit overrun

  /** Encode an arithmetic symbol dictionary exporting ALL of `syms`
    * (which must be sorted by non-decreasing height). Returns the
    * segment DATA (flags + AT + counts + coded). */
  private[sources] def encodeSymbolDict(
      syms: IndexedSeq[Array[Array[Boolean]]],
      template: Int = 0): Array[Byte] = {
    require(syms.nonEmpty)
    require(syms.sliding(2).forall(p =>
      p.length < 2 || p(0).length <= p(1).length), "sort symbols by height")
    val b = mutable.ArrayBuffer.empty[Byte]
    val flags = (template & 3) << 10 // SDHUFF=0, SDREFAGG=0, SDTEMPLATE
    b += ((flags >> 8) & 0xFF).toByte
    b += (flags & 0xFF).toByte
    nominalAt(template).foreach { case (x, y) => b += x.toByte; b += y.toByte }
    be32(b, syms.length) // SDNUMEXSYMS
    be32(b, syms.length) // SDNUMNEWSYMS
    val enc = new MqEncoder
    val gbCx = new CxStore
    val iadh = new IntCtx
    val iadw = new IntCtx
    val iaex = new IntCtx
    var hcHeight = 0
    var i = 0
    while (i < syms.length) {
      val h = syms(i).length
      encodeInt(enc, iadh, Some(h - hcHeight))
      hcHeight = h
      var symWidth = 0
      while (i < syms.length && syms(i).length == hcHeight) {
        val w = syms(i)(0).length
        encodeInt(enc, iadw, Some(w - symWidth))
        symWidth = w
        encodeGenericWith(enc, gbCx, syms(i).toIndexedSeq, w, template,
          tpgdon = false)
        i += 1
      }
      encodeInt(enc, iadw, None) // end of height class
    }
    encodeInt(enc, iaex, Some(0)) // first run: 0 non-exported
    encodeInt(enc, iaex, Some(syms.length)) // then export them all
    b ++= enc.flush()
    b.toArray
  }

  /** Encode a REFINEMENT-AGGREGATE symbol dictionary (SDREFAGG = 1,
    * single-instance form): every new symbol is coded as a §6.3
    * refinement of a referred (`input`) or earlier-in-dictionary
    * symbol — the organization producers use for font variants, where
    * a base dictionary carries the glyphs and a second dictionary
    * refines them. Exports input ++ new. `newSyms` entries are (rows,
    * reference id into input++new-so-far, rdx, rdy). */
  private[sources] def encodeSymbolDictRefAgg(
      input: IndexedSeq[Array[Array[Boolean]]],
      newSyms: IndexedSeq[(Array[Array[Boolean]], Int, Int, Int)],
      aggregates: Map[Int, Seq[TextInstance]] = Map.empty): Array[Byte] = {
    require(newSyms.nonEmpty)
    require(newSyms.sliding(2).forall(p =>
      p.length < 2 || p(0)._1.length <= p(1)._1.length),
      "sort symbols by height")
    val b = mutable.ArrayBuffer.empty[Byte]
    val flags = 2 // SDHUFF=0, SDREFAGG=1, SDTEMPLATE=0, SDRTEMPLATE=0
    b += ((flags >> 8) & 0xFF).toByte
    b += (flags & 0xFF).toByte
    nominalAt(0).foreach { case (x, y) => b += x.toByte; b += y.toByte }
    nominalRefAt.foreach { case (x, y) => b += x.toByte; b += y.toByte }
    be32(b, input.length + newSyms.length) // SDNUMEXSYMS
    be32(b, newSyms.length) // SDNUMNEWSYMS
    val enc = new MqEncoder
    val iadh = new IntCtx
    val iadw = new IntCtx
    val iaex = new IntCtx
    val iaai = new IntCtx
    // one set of text-stream contexts persists across every symbol —
    // the single path uses its id/rdx/rdy/GR members, the aggregate
    // path the full set (the decoder's 6.5.8.2.2 sharing, mirrored)
    val c = new TextStreamCtx(math.max(1,
      32 - Integer.numberOfLeadingZeros(
        math.max(1, input.length + newSyms.length - 1))))
    var hcHeight = 0
    var i = 0
    while (i < newSyms.length) {
      val h = newSyms(i)._1.length
      encodeInt(enc, iadh, Some(h - hcHeight))
      hcHeight = h
      var symWidth = 0
      while (i < newSyms.length && newSyms(i)._1.length == hcHeight) {
        val (rows, refId, rdx, rdy) = newSyms(i)
        val w = rows(0).length
        encodeInt(enc, iadw, Some(w - symWidth))
        symWidth = w
        aggregates.get(i) match {
          case Some(insts) =>
            val allSoFar = input ++ newSyms.take(i).map(_._1)
            // aggregate form: the symbol is a nested text region of
            // refined instances; the declared rows must BE their
            // composition, so fixtures cannot lie about the result
            require(insts.length > 1, "aggregates need REFAGGNINST > 1")
            val composed = Array.ofDim[Boolean](hcHeight, w)
            insts.foreach { t =>
              val bmp = t.refine.map(_._1).getOrElse(allSoFar(t.id))
              var yy = 0
              while (yy < bmp.length) {
                var xx = 0
                while (xx < bmp(yy).length) {
                  val ty = t.y + yy; val tx = t.x + xx
                  if (bmp(yy)(xx) && ty >= 0 && ty < hcHeight &&
                      tx >= 0 && tx < w) composed(ty)(tx) = true
                  xx += 1
                }
                yy += 1
              }
            }
            require(rows.indices.forall(y2 =>
              rows(y2).sameElements(composed(y2))),
              "aggregate rows must equal the composed instances")
            encodeInt(enc, iaai, Some(insts.length))
            encodeTextStream(enc, c, insts, allSoFar, refine = true)
          case None =>
            require(refId >= 0 && refId < input.length + i,
              "refinement reference must already exist")
            encodeInt(enc, iaai, Some(1)) // REFAGGNINST = 1
            encodeId(enc, c.iaid, refId)
            encodeInt(enc, c.iardx, Some(rdx))
            encodeInt(enc, c.iardy, Some(rdy))
            val refBm =
              if (refId < input.length) input(refId)
              else newSyms(refId - input.length)._1
            encodeRefinementWith(enc, c.grCx, rows.toIndexedSeq, w, 0,
              nominalRefAt, refBm, rdx, rdy, tpgron = false)
        }
        i += 1
      }
      encodeInt(enc, iadw, None) // end of height class
    }
    encodeInt(enc, iaex, Some(0)) // first run: 0 non-exported
    encodeInt(enc, iaex, Some(input.length + newSyms.length))
    b ++= enc.flush()
    b.toArray
  }

  /** Encode a HUFFMAN symbol dictionary (SDHUFF = 1) exporting all of
    * `syms` (height-sorted): DH via Table B.4, DW via Table B.3 (sel 1
    * — signed, so width order within a class is free), per-class
    * collective bitmaps uncompressed (`mmr` = false) or MMR-coded, EX
    * runs via Table B.1 — the organization [[decodeSymbolDictHuff]]
    * reads back. */
  private[sources] def encodeSymbolDictHuff(
      syms: IndexedSeq[Array[Array[Boolean]]],
      mmr: Boolean = false, customTables: Boolean = false): Array[Byte] = {
    require(syms.nonEmpty)
    require(syms.sliding(2).forall(p =>
      p.length < 2 || p(0).length <= p(1).length), "sort symbols by height")
    val b = mutable.ArrayBuffer.empty[Byte]
    // standard: DH = B.4, DW = B.3; custom: selection 3 for both, the
    // tables riding as referred type-53 segments (DictDhSpec/DictDwSpec)
    val flags =
      if (customTables) 1 | (3 << 2) | (3 << 4)
      else 1 | (0 << 2) | (1 << 4)
    val tableDH = if (customTables) DictDhSpec.table else TableB4
    val tableDW = if (customTables) DictDwSpec.table else TableB3
    b += ((flags >> 8) & 0xFF).toByte
    b += (flags & 0xFF).toByte
    be32(b, syms.length) // SDNUMEXSYMS
    be32(b, syms.length) // SDNUMNEWSYMS
    val w = new BitWr
    var hcHeight = 0
    var i = 0
    while (i < syms.length) {
      val h = syms(i).length
      tableDH.encode(w, h - hcHeight)
      hcHeight = h
      val first = i
      var symWidth = 0
      while (i < syms.length && syms(i).length == hcHeight) {
        val sw = syms(i)(0).length
        tableDW.encode(w, sw - symWidth)
        symWidth = sw
        i += 1
      }
      tableDW.encodeOob(w)
      // collective bitmap: symbols of the class side by side
      val cls = syms.slice(first, i)
      val totWidth = cls.map(_(0).length).sum
      val rows = (0 until hcHeight).map { y =>
        val row = new Array[Boolean](totWidth)
        var x0 = 0
        cls.foreach { s =>
          System.arraycopy(s(y), 0, row, x0, s(y).length)
          x0 += s(y).length
        }
        row
      }
      if (mmr) {
        val coded = CcittG4.encode(rows, totWidth)
        TableB1.encode(w, coded.length)
        w.bytes(coded)
      } else {
        TableB1.encode(w, 0) // BMSIZE 0 = uncompressed, byte-padded rows
        val rowBytes = (totWidth + 7) / 8
        val raw = new Array[Byte](hcHeight * rowBytes)
        for (y <- 0 until hcHeight; x <- 0 until totWidth if rows(y)(x))
          raw(y * rowBytes + x / 8) =
            (raw(y * rowBytes + x / 8) | (1 << (7 - x % 8))).toByte
        w.bytes(raw)
      }
    }
    TableB1.encode(w, 0) // first export run: 0 non-exported
    TableB1.encode(w, syms.length) // export them all
    b ++= w.result()
    b.toArray
  }

  // ---------- text region (T.88 §6.4, arithmetic, untransposed) ----------

  /** One placed symbol instance; `refine` carries a per-instance
    * refinement (REFINE = 1, 6.4.11): the ACTUAL bitmap drawn (its dims
    * minus the symbol's give RDW/RDH) plus the RDX/RDY offsets. */
  final case class TextInstance(id: Int, x: Int, y: Int,
      refine: Option[(Array[Array[Boolean]], Int, Int)] = None)

  /** Decode an arithmetic text region's data (after the 17-byte region
    * info): flags, instance loop over strips, symbols drawn with OR.
    * Huffman/refinement/transposed variants are out of scope → None. */
  /** The per-instance reads of the text-region loop — ONE placement
    * loop ([[runTextLoop]]) serves both coding organizations through
    * this seam (arithmetic Annex-A contexts vs Annex-B prefix codes),
    * so the geometry semantics cannot drift between them. `ds` returns
    * Some(None) at a strip's end (IADS OOB / DS-table OOB). */
  private trait TextReaders {
    def dt(): Option[Int]
    def fs(): Option[Int]
    def ds(): Option[Option[Int]]
    def curT(): Option[Int]
    def id(): Option[Int]
    /** The bitmap this instance draws: the symbol itself, or its
      * per-instance refinement when REFINE = 1 and RI is nonzero
      * (6.4.11) — placement then uses the REFINED dims. */
    def inst(id: Int, sym: Array[Array[Boolean]])
        : Option[Array[Array[Boolean]]] = Some(sym)
  }

  /** Shared REFINE instance reader (6.4.11): RI, the four deltas with
    * two-sided bounds BEFORE any arithmetic, a budget charge BEFORE the
    * pixels exist, then the refinement decode — one implementation so
    * text regions and the dictionary aggregate form cannot drift. */
  private def decodeRefinedInst(dec: MqDecoder, iari: IntCtx,
      iardw: IntCtx, iardh: IntCtx, iardx: IntCtx, iardy: IntCtx,
      grCx: CxStore, rtemplate: Int, rat: Array[(Int, Int)],
      budget: Array[Long], sym: Array[Array[Boolean]])
      : Option[Array[Array[Boolean]]] =
    decodeInt(dec, iari) match {
      case None => None
      case Some(0) => Some(sym)
      case Some(_) =>
        for {
          rdw <- decodeInt(dec, iardw)
          rdh <- decodeInt(dec, iardh)
          rdx <- decodeInt(dec, iardx)
          rdy <- decodeInt(dec, iardy)
          if rdw >= -(1 << 12) && rdw <= (1 << 12) &&
            rdh >= -(1 << 12) && rdh <= (1 << 12) &&
            rdx >= -(1 << 12) && rdx <= (1 << 12) &&
            rdy >= -(1 << 12) && rdy <= (1 << 12)
          nw = sym(0).length + rdw
          nh = sym.length + rdh
          if nw > 0 && nw <= (1 << 12) && nh > 0 && nh <= (1 << 12)
          if { budget(0) -= nw.toLong * nh; budget(0) >= 0 }
        } yield decodeRefinementWith(dec, grCx, nw, nh, rtemplate,
          rat, sym, Math.floorDiv(rdw, 2) + rdx,
          Math.floorDiv(rdh, 2) + rdy, tpgron = false)
    }

  private[sources] def decodeTextRegion(data: Array[Byte], start: Int,
      end: Int, w: Int, h: Int,
      syms: IndexedSeq[Array[Array[Boolean]]],
      tables: IndexedSeq[HuffTable] = IndexedSeq.empty)
      : Option[Array[Array[Boolean]]] = {
    if (syms.isEmpty || end - start < 2 + 4) return None
    val r = new Reader(data)
    r.p = start
    val flags = r.u16()
    val sbhuff = (flags & 1) != 0
    val refine = (flags & 2) != 0
    val logStrips = (flags >> 2) & 3
    val refCorner = (flags >> 4) & 3
    val transposed = (flags & 0x40) != 0
    val combOp = (flags >> 7) & 3
    val defPixel = (flags & 0x200) != 0
    var dsOffset = (flags >> 10) & 0x1F
    if (dsOffset > 15) dsOffset -= 32 // signed 5-bit
    val rtemplate = (flags >> 15) & 1
    if (transposed || combOp != 0 || defPixel) return None
    if (sbhuff && refine) return None // Huffman + refinement: degrade
    if (sbhuff)
      return decodeTextRegionHuff(data, r, end, w, h, syms, tables,
        logStrips, refCorner, dsOffset)
    // SBRAT: present when REFINE = 1 and the GR template has ATs
    val ratCount = if (refine && rtemplate == 0) 2 else 0
    if (end - r.p < 2 * ratCount + 4) return None
    val rat = Array.fill(ratCount) { val x = r.s8(); val y = r.s8(); (x, y) }
    val numInstances = r.u32()
    if (numInstances > (1 << 20)) return None
    val strips = 1 << logStrips
    val symCodeLen = math.max(1,
      32 - Integer.numberOfLeadingZeros(math.max(1, syms.length - 1)))
    val dec = new MqDecoder(data, r.p, end)
    val iadt = new IntCtx
    val iafs = new IntCtx
    val iads = new IntCtx
    val iait = new IntCtx
    val iaid = new IdCtx(symCodeLen)
    lazy val iari = new IntCtx
    lazy val iardw = new IntCtx
    lazy val iardh = new IntCtx
    lazy val iardx = new IntCtx
    lazy val iardy = new IntCtx
    lazy val grCx = new CxStore
    val budget = Array(8L * w.toLong * h + (1L << 20))
    val readers = new TextReaders {
      def dt(): Option[Int] = decodeInt(dec, iadt)
      def fs(): Option[Int] = decodeInt(dec, iafs)
      def ds(): Option[Option[Int]] = Some(decodeInt(dec, iads))
      def curT(): Option[Int] =
        if (strips == 1) Some(0) else decodeInt(dec, iait)
      def id(): Option[Int] = Some(decodeId(dec, iaid))
      override def inst(id: Int, sym: Array[Array[Boolean]])
          : Option[Array[Array[Boolean]]] =
        if (!refine) Some(sym)
        else decodeRefinedInst(dec, iari, iardw, iardh, iardx, iardy,
          grCx, rtemplate, rat, budget, sym)
    }
    runTextLoop(w, h, syms, numInstances.toInt, strips, dsOffset,
      refCorner, readers, budget)
  }

  /** Shared placement loop (T.88 6.4.5, untransposed): strips advance
    * by DT×strips, FIRSTS accumulates FS deltas, in-strip S advances by
    * DS + dsOffset, each instance draws its symbol OR-wise under the
    * reference corner. Draw work is budgeted against hostile streams. */
  private def runTextLoop(w: Int, h: Int,
      syms: IndexedSeq[Array[Array[Boolean]]], numInstances: Int,
      strips: Int, dsOffset: Int, refCorner: Int,
      rd: TextReaders, budget: Array[Long]): Option[Array[Array[Boolean]]] = {
    val out = Array.ofDim[Boolean](h, w)
    // CPU bound, not just memory: 2^20 instances of a 16-Mpx symbol is
    // ~10^13 pixel visits from one small stream. Generous for any real
    // page (instances barely overlap), fatal only to hostile input.
    // The caller owns the cell so per-instance REFINEMENT decodes can
    // charge the same budget before any pixel is visited.
    def draw(bmp: Array[Array[Boolean]], sx: Int, ty: Int): Boolean = {
      budget(0) -= bmp.length.toLong * bmp.head.length
      if (budget(0) < 0) return false
      var y = math.max(0, -ty)
      val ymax = math.min(bmp.length, h - ty)
      while (y < ymax) {
        val oy = ty + y
        var x = math.max(0, -sx)
        val xmax = math.min(bmp(y).length, w - sx)
        while (x < xmax) {
          if (bmp(y)(x)) out(oy)(sx + x) = true
          x += 1
        }
        y += 1
      }
      true
    }
    var stripT = -rd.dt().getOrElse(return None) * strips
    var firstS = 0
    var ninst = 0
    var guard = 0
    while (ninst < numInstances && guard < (1 << 22)) {
      val dt = rd.dt().getOrElse(return None)
      stripT += dt * strips
      var stripDone = false
      var first = true
      var curS = 0
      while (!stripDone && ninst < numInstances) {
        if (first) {
          val dfs = rd.fs().getOrElse(return None)
          firstS += dfs
          curS = firstS
          first = false
        } else rd.ds().getOrElse(return None) match {
          case None => stripDone = true
          case Some(ids) => curS += ids + dsOffset
        }
        if (!stripDone) {
          val curT = rd.curT().getOrElse(return None)
          val t = stripT + curT
          val id = rd.id().getOrElse(return None)
          if (id < 0 || id >= syms.length) return None
          val bmp = rd.inst(id, syms(id)).getOrElse(return None)
          val wi = bmp(0).length
          val hi = bmp.length
          // untransposed placement (6.4.5): left corners draw at CURS
          // then advance; right corners advance then right-align
          val drawn = refCorner match {
            case 0 => val d = draw(bmp, curS, t - hi + 1); curS += wi - 1; d
            case 1 => val d = draw(bmp, curS, t); curS += wi - 1; d
            case 2 => curS += wi - 1; draw(bmp, curS - wi + 1, t - hi + 1)
            case _ => curS += wi - 1; draw(bmp, curS - wi + 1, t)
          }
          if (!drawn) return None // draw-work budget exhausted
          ninst += 1
        }
      }
      guard += 1
    }
    if (ninst < numInstances) None else Some(out)
  }

  /** HUFFMAN text region (SBHUFF = 1, 7.4.3): FS/DS/DT via CUSTOM
    * referred code tables (selection 3 in the Huffman flags — the
    * in-stream Annex-B.2 form; standard-table selections degrade
    * honestly), symbol IDs via the inline runcode mechanism
    * (7.4.3.1.7): 35 four-bit runcode lengths build a runcode prefix
    * table that decodes per-symbol code lengths (32 = repeat previous
    * 3+2bits, 33 = 3+3bits zeros, 34 = 11+7bits zeros), and the symbol
    * table assigns canonically from those lengths. CURT reads raw
    * log2(strips) bits. `r.p` sits just past the 16-bit region flags.
    */
  private def decodeTextRegionHuff(data: Array[Byte], r: Reader,
      end: Int, w: Int, h: Int,
      syms: IndexedSeq[Array[Array[Boolean]]],
      tables: IndexedSeq[HuffTable], logStrips: Int, refCorner: Int,
      dsOffset: Int): Option[Array[Array[Boolean]]] = try {
    if (end - r.p < 2 + 4) return None
    val hflags = r.u16()
    val fsSel = hflags & 3
    val dsSel = (hflags >> 2) & 3
    val dtSel = (hflags >> 4) & 3
    // custom tables only (the reference corpus shape we emit); the
    // refinement selections (bits 6-14) are irrelevant with REFINE = 0
    if (fsSel != 3 || dsSel != 3 || dtSel != 3) return None
    if (tables.length < 3) return None
    val Seq(tFs, tDs, tDt) = tables.take(3).toSeq
    val numInstances = r.u32()
    if (numInstances > (1 << 20)) return None
    val strips = 1 << logStrips
    val br = new BitRd(data, r.p, end)
    // symbol ID code lengths via the runcode table
    val runLens = Array.fill(35)(br.bits(4).toInt)
    val runTable = new HuffTable(
      runLens.toIndexedSeq.map(l => HuffLine(l, 0, 0)).zipWithIndex
        .map { case (hl, i) => hl.copy(rangeLow = i) })
    val symLens = new Array[Int](syms.length)
    var i = 0
    var prev = 0
    while (i < symLens.length) {
      val c = runTable.decode(br).flatten.getOrElse(return None)
      c match {
        case v if v <= 31 => symLens(i) = v; prev = v; i += 1
        case 32 =>
          val n = 3 + br.bits(2).toInt
          if (i + n > symLens.length) return None
          (0 until n).foreach { j => symLens(i + j) = prev }; i += n
        case 33 =>
          val n = 3 + br.bits(3).toInt
          if (i + n > symLens.length) return None
          i += n // zeros
        case 34 =>
          val n = 11 + br.bits(7).toInt
          if (i + n > symLens.length) return None
          i += n // zeros
        case _ => return None
      }
    }
    val symTable = new HuffTable(
      symLens.toIndexedSeq.zipWithIndex.map { case (l, j) =>
        HuffLine(l, 0, j)
      })
    // 7.4.3.1.7 final step: skip the remaining bits of the last byte —
    // conformant encoders pad the symbol-ID length section to a byte
    // boundary before the instance stream begins
    br.align()
    val readers = new TextReaders {
      def dt(): Option[Int] = tDt.decode(br).flatten
      def fs(): Option[Int] = tFs.decode(br).flatten
      def ds(): Option[Option[Int]] = tDs.decode(br)
      def curT(): Option[Int] =
        if (strips == 1) Some(0) else Some(br.bits(logStrips).toInt)
      def id(): Option[Int] = symTable.decode(br).flatten
    }
    runTextLoop(w, h, syms, numInstances.toInt, strips, dsOffset,
      refCorner, readers, Array(8L * w.toLong * h + (1L << 20)))
  } catch { case _: IllegalStateException => None } // bit overrun

  /** Encode a text region's data (flags + count + arithmetic stream) for
    * instances referencing `syms` ids; TOPLEFT corner, one-row strips. */
  /** The arithmetic contexts one text-region instance stream owns —
    * shared between standalone regions and the aggregate form inside
    * SDREFAGG dictionaries (where they persist across symbols,
    * 6.5.8.2.2). */
  private[sources] final class TextStreamCtx(symCodeLen: Int) {
    val iadt = new IntCtx
    val iafs = new IntCtx
    val iads = new IntCtx
    val iaid = new IdCtx(symCodeLen)
    val iari = new IntCtx
    val iardw = new IntCtx
    val iardh = new IntCtx
    val iardx = new IntCtx
    val iardy = new IntCtx
    val grCx = new CxStore
  }

  /** Emit one instance stream (initial DT + strip loop, 6.4.5) on a
    * caller-owned coder and contexts. `refine` signals whether IARI
    * bits are interleaved (the REFINE = 1 wire form). */
  private def encodeTextStream(enc: MqEncoder, c: TextStreamCtx,
      instances: Seq[TextInstance],
      syms: IndexedSeq[Array[Array[Boolean]]], refine: Boolean): Unit = {
    encodeInt(enc, c.iadt, Some(0)) // STRIPT starts at 0
    var stripT = 0
    var firstS = 0
    var emitted = 0
    instances.groupBy(_.y).toSeq.sortBy(_._1).foreach { case (y, insts) =>
      encodeInt(enc, c.iadt, Some(y - stripT))
      stripT = y
      var curS = 0
      var first = true
      insts.sortBy(_.x).foreach { inst =>
        if (first) {
          encodeInt(enc, c.iafs, Some(inst.x - firstS))
          firstS = inst.x
          curS = inst.x
          first = false
        } else encodeInt(enc, c.iads, Some(inst.x - curS))
        emitted += 1
        encodeId(enc, c.iaid, inst.id)
        val sym = syms(inst.id)
        val width = inst.refine match {
          case None =>
            if (refine) encodeInt(enc, c.iari, Some(0))
            sym(0).length
          case Some((rows, rdx, rdy)) =>
            val rdw = rows(0).length - sym(0).length
            val rdh = rows.length - sym.length
            encodeInt(enc, c.iari, Some(1))
            encodeInt(enc, c.iardw, Some(rdw))
            encodeInt(enc, c.iardh, Some(rdh))
            encodeInt(enc, c.iardx, Some(rdx))
            encodeInt(enc, c.iardy, Some(rdy))
            encodeRefinementWith(enc, c.grCx, rows.toIndexedSeq,
              rows(0).length, 0, nominalRefAt, sym,
              Math.floorDiv(rdw, 2) + rdx, Math.floorDiv(rdh, 2) + rdy,
              tpgron = false)
            rows(0).length
        }
        curS = inst.x + width - 1
      }
      // 6.4.5 step 3(c)(ii): reaching SBNUMINSTANCES completes the
      // region WITHOUT a trailing OOB — emitting one after the final
      // strip desynchronizes shared-stream consumers (the SDREFAGG
      // aggregate form reads on past the nested region)
      if (emitted < instances.length)
        encodeInt(enc, c.iads, None) // end of strip
    }
  }

  private[sources] def encodeTextRegion(w: Int, h: Int,
      instances: Seq[TextInstance],
      syms: IndexedSeq[Array[Array[Boolean]]]): Array[Byte] = {
    val b = mutable.ArrayBuffer.empty[Byte]
    val refine = instances.exists(_.refine.isDefined)
    // TOPLEFT; SBHUFF=0 LOGSBSTRIPS=0; REFINE + SBRTEMPLATE 0 when any
    // instance carries a refinement
    val flags = (1 << 4) | (if (refine) 2 else 0)
    b += ((flags >> 8) & 0xFF).toByte
    b += (flags & 0xFF).toByte
    if (refine)
      nominalRefAt.foreach { case (x, y) => b += x.toByte; b += y.toByte }
    be32(b, instances.length)
    val symCodeLen = math.max(1,
      32 - Integer.numberOfLeadingZeros(math.max(1, syms.length - 1)))
    val enc = new MqEncoder
    encodeTextStream(enc, new TextStreamCtx(symCodeLen), instances, syms,
      refine)
    b ++= enc.flush()
    b.toArray
  }

  /** The custom code tables [[encodeTextRegionHuff]] emits as type-53
    * segments: one-line tables whose single prefix bit is followed by a
    * fixed-width offset — simple, conformant, and generous enough for
    * any fixture geometry. DS carries the OOB the strip loop needs. */
  /** Custom tables for HUFFMAN dictionaries (selection 3): DH covers
    * the positive height deltas, DW is signed with the OOB the class
    * terminator needs — same wire form as the text-region tables. */
  private[sources] val DictDhSpec =
    CodeTableSpec(0, 4096, Seq((1, 12)), lowerPref = 3, upperPref = 3)
  private[sources] val DictDwSpec =
    CodeTableSpec(-4096, 4096, Seq((1, 13)), lowerPref = 3, upperPref = 3,
      oobPref = 2)

  private[sources] val TextFsSpec =
    CodeTableSpec(-4096, 4096, Seq((1, 13)), lowerPref = 3, upperPref = 3)
  private[sources] val TextDsSpec =
    CodeTableSpec(-4096, 4096, Seq((1, 13)), lowerPref = 3, upperPref = 3,
      oobPref = 2)
  private[sources] val TextDtSpec =
    CodeTableSpec(0, 4096, Seq((1, 12)), lowerPref = 3, upperPref = 3)

  /** Encode a HUFFMAN text region's data (flags + Huffman flags with
    * custom-table selections + count + bit-packed stream): fixed-length
    * symbol ID codes signalled through the runcode mechanism, FS/DS/DT
    * through [[TextFsSpec]]/[[TextDsSpec]]/[[TextDtSpec]] — the twin of
    * [[decodeTextRegionHuff]]. TOPLEFT corner, one-row strips. */
  private[sources] def encodeTextRegionHuff(w: Int, h: Int,
      instances: Seq[TextInstance],
      syms: IndexedSeq[Array[Array[Boolean]]]): Array[Byte] = {
    require(instances.forall(_.refine.isEmpty),
      "Huffman + refinement is out of the codec's scope")
    val b = mutable.ArrayBuffer.empty[Byte]
    val flags = 1 | (1 << 4) // SBHUFF, TOPLEFT; LOGSBSTRIPS=0
    b += ((flags >> 8) & 0xFF).toByte
    b += (flags & 0xFF).toByte
    val hflags = 3 | (3 << 2) | (3 << 4) // FS/DS/DT custom tables
    b += ((hflags >> 8) & 0xFF).toByte
    b += (hflags & 0xFF).toByte
    be32(b, instances.length)
    val wr = new BitWr
    // runcodes: every symbol gets the same fixed code length, signalled
    // as one direct runcode per symbol; only that runcode has a nonzero
    // (1-bit) length, so each signal costs a single bit
    val symCodeLen = math.max(1,
      32 - Integer.numberOfLeadingZeros(math.max(1, syms.length - 1)))
    (0 until 35).foreach(c =>
      wr.bits(if (c == symCodeLen) 1 else 0, 4))
    syms.indices.foreach(_ => wr.bit(0)) // runcode "0" = symCodeLen
    wr.align() // 7.4.3.1.7: the length section pads to a byte boundary
    val symTable = new HuffTable(syms.indices
      .map(j => HuffLine(symCodeLen, 0, j)))
    val tFs = TextFsSpec.table
    val tDs = TextDsSpec.table
    val tDt = TextDtSpec.table
    tDt.encode(wr, 0) // STRIPT starts at 0
    var stripT = 0
    var firstS = 0
    instances.groupBy(_.y).toSeq.sortBy(_._1).foreach { case (y, insts) =>
      tDt.encode(wr, y - stripT)
      stripT = y
      var curS = 0
      var first = true
      insts.sortBy(_.x).foreach { inst =>
        if (first) {
          tFs.encode(wr, inst.x - firstS)
          firstS = inst.x
          curS = inst.x
          first = false
        } else tDs.encode(wr, inst.x - curS)
        symTable.encode(wr, inst.id)
        curS = inst.x + syms(inst.id)(0).length - 1
      }
      tDs.encodeOob(wr) // end of strip
    }
    b ++= wr.result()
    b.toArray
  }

  // ---------------- segment layer (T.88 §7) ----------------

  final case class Decoded(width: Int, height: Int,
      rows: Array[Array[Boolean]]) {
    def blackCount: Long = {
      var n = 0L
      rows.foreach(r => r.foreach(p => if (p) n += 1))
      n
    }
  }

  private def be32(b: mutable.ArrayBuffer[Byte], v: Long): Unit = {
    b += ((v >> 24) & 0xFF).toByte; b += ((v >> 16) & 0xFF).toByte
    b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte
  }

  /** Emit the PDF-embedded organization: page info (48) + immediate
    * lossless generic region (39) + end of page (49) — no file header,
    * exactly what a /JBIG2Decode stream carries. */
  /** Write one segment header (T.88 §7.2, short form: few refs,
    * 1-byte segment numbers and page association) followed by the data
    * length — shared by every document builder so the layout lives in
    * one place. */
  private def segHeader(b: mutable.ArrayBuffer[Byte], num: Int, tpe: Int,
      dataLen: Int, refs: Seq[Int] = Nil): Unit = {
    be32(b, num)
    b += tpe.toByte // flags: type in bits 5-0; 1-byte page assoc
    b += ((refs.length << 5) & 0xFF).toByte // count in top 3 bits
    refs.foreach(rn => b += rn.toByte) // 1-byte numbers (num <= 256)
    b += 0x01 // page 1
    be32(b, dataLen)
  }

  /** Page information segment (§7.4.8) with the given flags byte. */
  private def pageInfo(b: mutable.ArrayBuffer[Byte], num: Int, w: Int,
      h: Int, flags: Int): Unit = {
    segHeader(b, num, 48, 19)
    be32(b, w); be32(b, h); be32(b, 0); be32(b, 0)
    b += flags.toByte
    b += 0; b += 0 // not striped
  }

  def encodeEmbedded(rows: Seq[Array[Boolean]], width: Int,
      template: Int = 0, tpgdon: Boolean = false,
      mmr: Boolean = false): Array[Byte] = {
    require(rows.nonEmpty && width > 0 && rows.forall(_.length == width))
    val height = rows.length
    val b = mutable.ArrayBuffer.empty[Byte]
    def header(num: Int, tpe: Int, dataLen: Int): Unit =
      segHeader(b, num, tpe, dataLen)
    pageInfo(b, 1, width, height, 0x01) // default pixel 0, lossless
    // immediate lossless generic region: MQ-coded, or MMR (= T.6 /
    // CCITT G4, §6.2.6) when asked — real streams carry both forms
    val at = if (mmr) Array.empty[(Int, Int)] else nominalAt(template)
    val coded =
      if (mmr) CcittG4.encode(rows, width)
      else encodeGeneric(rows.toIndexedSeq, width, template, tpgdon)
    header(2, 39, 17 + 1 + 2 * at.length + coded.length)
    be32(b, width); be32(b, height); be32(b, 0); be32(b, 0)
    b += 0x00 // external combination operator OR
    b += ((if (mmr) 1 else 0) | ((template & 3) << 1) |
      (if (tpgdon) 8 else 0)).toByte
    at.foreach { case (x, y) => b += x.toByte; b += y.toByte }
    b ++= coded
    // end of page
    header(3, 49, 0)
    b.toArray
  }

  /** Emit a symbol-coded document: page info + arithmetic symbol
    * dictionary + immediate text region referring to it + end of page —
    * the dominant wild-JBIG2 organization for scanned text (scanners
    * build a glyph dictionary once and place instances). `syms` must be
    * height-sorted; instances reference dictionary ids and carry
    * top-left placements. */
  def encodeTextDocument(pageW: Int, pageH: Int,
      syms: IndexedSeq[Array[Array[Boolean]]],
      instances: Seq[TextInstance],
      huffDict: Boolean = false, dictMmr: Boolean = false,
      huffText: Boolean = false, customDictTables: Boolean = false,
      refAggVariants: IndexedSeq[(Array[Array[Boolean]], Int, Int, Int)] =
        IndexedSeq.empty,
      refAggAggregates: Map[Int, Seq[TextInstance]] = Map.empty)
      : Array[Byte] = {
    require(pageW > 0 && pageH > 0 && syms.nonEmpty)
    val b = mutable.ArrayBuffer.empty[Byte]
    def header(num: Int, tpe: Int, dataLen: Int,
        refs: Seq[Int] = Nil): Unit = segHeader(b, num, tpe, dataLen, refs)
    // 0x43 (refinements + op override) only when refinement coding is
    // actually present; the plain organizations keep their bytes
    val hasRefine = refAggVariants.nonEmpty ||
      instances.exists(_.refine.isDefined)
    pageInfo(b, 1, pageW, pageH, if (hasRefine) 0x43 else 0x01)
    require(refAggAggregates.isEmpty || refAggVariants.nonEmpty,
      "aggregates key into refAggVariants — pass the variants too")
    if (refAggVariants.nonEmpty) {
      // the refinement-aggregate organization: a base dictionary, a
      // SECOND dictionary refining its glyphs (SDREFAGG), and a text
      // region referring to the second — whose exports are base ++
      // refined, so instance ids n.. pick the refined variants
      require(!huffDict && !huffText,
        "Huffman + refinement is out of the codec's scope")
      val d1 = encodeSymbolDict(syms)
      header(2, 0, d1.length)
      b ++= d1
      val d2 = encodeSymbolDictRefAgg(syms, refAggVariants,
        refAggAggregates)
      header(3, 0, d2.length, refs = Seq(2))
      b ++= d2
      val tr = encodeTextRegion(pageW, pageH, instances,
        syms ++ refAggVariants.map(_._1))
      header(4, 6, 17 + tr.length, refs = Seq(3))
      be32(b, pageW); be32(b, pageH); be32(b, 0); be32(b, 0)
      b += 0x00 // external combination operator OR
      b ++= tr
      header(5, 49, 0)
      return b.toArray
    }
    var dictSeg = 2
    if (customDictTables) {
      require(huffDict, "custom dictionary tables are a Huffman form")
      Seq(DictDhSpec, DictDwSpec).zipWithIndex.foreach { case (spec, i) =>
        val td = spec.segmentData
        header(2 + i, 53, td.length)
        b ++= td
      }
      dictSeg = 4
    }
    val dict =
      if (huffDict) encodeSymbolDictHuff(syms, mmr = dictMmr,
        customTables = customDictTables)
      else encodeSymbolDict(syms)
    header(dictSeg, 0, dict.length,
      refs = if (customDictTables) Seq(2, 3) else Nil)
    b ++= dict
    val (tr, trRefs) =
      if (huffText) {
        // custom FS/DS/DT code tables ride as type-53 segments; the
        // text region refers to them in assignment order after the dict
        Seq(TextFsSpec, TextDsSpec, TextDtSpec).zipWithIndex.foreach {
          case (spec, i) =>
            val td = spec.segmentData
            header(dictSeg + 1 + i, 53, td.length)
            b ++= td
        }
        (encodeTextRegionHuff(pageW, pageH, instances, syms),
          Seq(dictSeg, dictSeg + 1, dictSeg + 2, dictSeg + 3))
      } else (encodeTextRegion(pageW, pageH, instances, syms), Seq(dictSeg))
    header(trRefs.max + 1, 6, 17 + tr.length, refs = trRefs)
    be32(b, pageW); be32(b, pageH); be32(b, 0); be32(b, 0)
    b += 0x00 // external combination operator OR
    b ++= tr
    header(trRefs.max + 2, 49, 0)
    b.toArray
  }

  /** Emit a refined document: page info + immediate generic region (the
    * base) + immediate lossless GENERIC REFINEMENT region (type 43) over
    * a sub-rect + end of page. The refinement's reference is the page
    * under its rect (7.4.7.2: GRREFERENCEDX/DY = 0), i.e. the base
    * pixels there, and its result REPLACES the rect — so the decoded
    * page is `base` with [rx, rx+rw)×[ry, ry+rh) swapped for `refined`,
    * including CLEARED pixels an OR composite could never express. */
  def encodeRefinedDocument(base: Seq[Array[Boolean]], width: Int,
      rx: Int, ry: Int, refined: Seq[Array[Boolean]],
      template: Int = 0, tpgron: Boolean = false): Array[Byte] = {
    require(base.nonEmpty && width > 0 && base.forall(_.length == width))
    require(refined.nonEmpty && template >= 0 && template <= 1)
    val rw = refined.head.length
    val rh = refined.length
    require(rw > 0 && refined.forall(_.length == rw))
    require(rx >= 0 && ry >= 0 && rx + rw <= width &&
      ry + rh <= base.length)
    val height = base.length
    val b = mutable.ArrayBuffer.empty[Byte]
    def header(num: Int, tpe: Int, dataLen: Int): Unit =
      segHeader(b, num, tpe, dataLen)
    // 0x43: lossless + MIGHT CONTAIN REFINEMENTS + combination operator
    // may be overridden (7.4.8.5 — the REPLACE below is only conformant
    // with the override bit set)
    pageInfo(b, 1, width, height, 0x43)
    val at = nominalAt(0)
    val coded = encodeGeneric(base.toIndexedSeq, width, 0, tpgdon = false)
    header(2, 39, 17 + 1 + 2 * at.length + coded.length)
    be32(b, width); be32(b, height); be32(b, 0); be32(b, 0)
    b += 0x00 // external combination operator OR
    b += 0x00 // generic flags: MQ, template 0
    at.foreach { case (x, y) => b += x.toByte; b += y.toByte }
    b ++= coded
    val refBm = Array.tabulate(rh, rw)((yy, xx) => base(ry + yy)(rx + xx))
    val rcoded =
      encodeRefinement(refined.toIndexedSeq, rw, template, refBm, tpgron)
    val rat = if (template == 0) nominalRefAt else Array.empty[(Int, Int)]
    header(3, 43, 17 + 1 + 2 * rat.length + rcoded.length)
    be32(b, rw); be32(b, rh); be32(b, rx); be32(b, ry)
    b += 0x04 // external combination operator REPLACE
    b += ((template & 1) | (if (tpgron) 2 else 0)).toByte
    rat.foreach { case (x, y) => b += x.toByte; b += y.toByte }
    b ++= rcoded
    header(4, 49, 0)
    b.toArray
  }

  private final class Reader(val d: Array[Byte]) {
    var p = 0
    def remaining: Int = d.length - p
    def u8(): Int = { val v = d(p) & 0xFF; p += 1; v }
    def s8(): Int = { val v = d(p).toInt; p += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = ((u16().toLong << 16) | u16().toLong) & 0xFFFFFFFFL
  }

  private final case class Segment(number: Long, tpe: Int, dataStart: Int,
      dataLen: Long, refs: Seq[Long])

  /** Parse one segment header (T.88 §7.2) and skip to its data. Returns
    * None on malformed/truncated headers (degrade, never throw). */
  private def segmentHeader(r: Reader): Option[Segment] = {
    if (r.remaining < 11) return None
    val num = r.u32()
    val flags = r.u8()
    val tpe = flags & 0x3F
    val pageAssoc4 = (flags & 0x40) != 0
    val rts = r.u8()
    val refCount =
      if ((rts >> 5) == 7) {
        // long form: 29-bit count, then the retain-bit bytes
        if (r.remaining < 3) return None
        r.p -= 1
        val cnt = r.u32() & 0x1FFFFFFFL
        if (cnt > (1 << 20)) return None
        val retainBytes = ((cnt + 8) / 8).toInt // ceil((count+1)/8)
        if (r.remaining < retainBytes) return None
        r.p += retainBytes
        cnt.toInt
      } else rts >> 5
    val refSize = if (num <= 256) 1 else if (num <= 65536) 2 else 4
    val need = refCount * refSize + (if (pageAssoc4) 4 else 1) + 4
    if (r.remaining < need) return None
    val refs = (0 until refCount).map { _ =>
      refSize match {
        case 1 => r.u8().toLong
        case 2 => r.u16().toLong
        case _ => r.u32()
      }
    }
    if (pageAssoc4) r.u32() else r.u8()
    val len = r.u32()
    Some(Segment(num, tpe, r.p, len, refs))
  }

  /** Decode an embedded JBIG2 stream (PDF organization, optionally with a
    * prepended /JBIG2Globals stream): immediate generic regions (types
    * 36/38/39) composite OR onto the page; anything else — symbol dicts,
    * text regions, refinements — parses and is skipped. None when no
    * region decodes (the extractor's honest `undecoded` label).
    * `maxPixels` bounds the TOTAL pixels materialized across all regions
    * plus the page, so a hostile stream of many maximal region headers
    * cannot exhaust memory before the composite check. */
  def decode(data: Array[Byte], globals: Option[Array[Byte]] = None,
      maxPixels: Long = 1L << 26): Option[Decoded] = {
    val all = globals match {
      case Some(g) if g.nonEmpty => g ++ data
      case _ => data
    }
    try {
      val r = new Reader(all)
      // (x, y, op, rows): op is the external combination operator the
      // region composites onto the page with — 0 = OR (generic/text
      // producers here), 4 = REPLACE (refinement regions, which must be
      // able to CLEAR page pixels their reference had set)
      val regions =
        mutable.ArrayBuffer.empty[(Int, Int, Int, Array[Array[Boolean]])]
      /** Composite every recorded region, in order, into `dst` — a rect
        * view of the page anchored at (dx0, dy0). Used both for the
        * final page assembly (anchor 0,0) and for building a refinement
        * region's reference: "the page under the rect, so far". */
      def compositeInto(dst: Array[Array[Boolean]], dx0: Int,
          dy0: Int): Unit = {
        val dh = dst.length
        val dw = if (dh == 0) 0 else dst(0).length
        regions.foreach { case (rx, ry, op, rows) =>
          // clip the LOOP RANGES to the overlap, not per-pixel: a
          // hostile stream of many tiny refinements against one huge
          // region must cost O(overlap), not O(region) per reference
          val rowW = if (rows.length == 0) 0 else rows(0).length
          val y0 = math.max(0, dy0 - ry)
          val y1 = math.min(rows.length, dy0 + dh - ry)
          val xLo = math.max(0, dx0 - rx)
          val xHi = math.min(rowW, dx0 + dw - rx)
          var y = y0
          while (y < y1) {
            val ty = ry + y - dy0
            val row = rows(y)
            var x = xLo
            while (x < xHi) {
              val tx = rx + x - dx0
              if (op == 4) dst(ty)(tx) = row(x)
              else if (row(x)) dst(ty)(tx) = true
              x += 1
            }
            y += 1
          }
        }
      }
      val symbolDicts =
        mutable.Map.empty[Long, IndexedSeq[Array[Array[Boolean]]]]
      val codeTables = mutable.Map.empty[Long, HuffTable]
      // identity set of symbol bitmaps already charged to pixelBudget
      val debited = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[Array[Array[Boolean]], java.lang.Boolean]())
      var pixelBudget = maxPixels
      var pageW = 0L // first page-info segment's declared geometry
      var pageH = 0L
      var stop = false
      while (!stop && r.remaining > 0) {
        segmentHeader(r) match {
          case None => stop = true
          case Some(seg) =>
            if (seg.dataLen == 0xFFFFFFFFL) stop = true // unknown length
            else {
              val end = seg.dataStart + seg.dataLen.toInt
              if (end > all.length || end < seg.dataStart) stop = true
              else {
                // every fixed-layout read below is bounded by the
                // SEGMENT's own length — a short dataLen must not let a
                // handler read the next segment's (attacker-positioned)
                // bytes and mistake them for region geometry
                val segLen = end - seg.dataStart
                if (seg.tpe == 48 && pageW == 0) { // page information
                  val rr = new Reader(all)
                  rr.p = seg.dataStart
                  if (segLen >= 8) {
                    val pw = rr.u32(); val ph = rr.u32()
                    // 0xFFFFFFFF = striped unknown height: leave 0 (extent)
                    if (pw > 0 && pw <= (1 << 16) && ph > 0 &&
                        ph <= (1 << 16) && pw * ph <= maxPixels) {
                      pageW = pw; pageH = ph
                    }
                  }
                }
                // referred-dictionary resolution, amplification-capped:
                // the header permits 2^20 refs that could all repeat one
                // 10k-symbol dictionary — a ~10^10-element flatMap from
                // a ~MB input. Real streams refer to a handful.
                // None = cap tripped: the SEGMENT must be skipped, not
                // decoded against a falsified empty input (a dictionary's
                // export runs index input ++ new — shifting them would
                // export the wrong glyphs as a "successful" decode)
                def referredSyms(): Option[IndexedSeq[Array[Array[Boolean]]]] =
                  if (seg.refs.length > 64) None
                  else {
                    val s = seg.refs.flatMap(n =>
                      symbolDicts.getOrElse(n, IndexedSeq.empty))
                    if (s.length > 10000) None else Some(s.toIndexedSeq)
                  }
                if (seg.tpe == 0) { // symbol dictionary
                  referredSyms().foreach { input =>
                    val tabs = seg.refs.flatMap(codeTables.get).toIndexedSeq
                    decodeSymbolDict(all, seg.dataStart, end, input,
                      pixelBudget, tabs).foreach { ex =>
                      // retained bitmaps debit the SAME budget as regions
                      // (so K near-blank dictionaries cannot each hold
                      // maxPixels of rasters), but identity-deduped:
                      // re-exports of arrays a prior dictionary already
                      // paid for are free, or legitimate dictionary
                      // chains would spuriously exhaust the budget
                      val fresh = ex.filterNot(debited.contains)
                      val px = fresh.iterator
                        .map(b => b.length.toLong * b.head.length).sum
                      if (px <= pixelBudget) {
                        pixelBudget -= px
                        fresh.foreach(debited.add)
                        symbolDicts(seg.number) = ex
                      }
                    }
                  }
                }
                if (seg.tpe == 53) { // code table (Annex B.2 custom)
                  decodeCodeTable(all, seg.dataStart, end)
                    .foreach(t => codeTables(seg.number) = t)
                }
                if (seg.tpe == 6 || seg.tpe == 7) { // immediate text region
                  val rr = new Reader(all)
                  rr.p = seg.dataStart
                  if (segLen >= 17 + 2 + 4) {
                    val w = rr.u32(); val h = rr.u32()
                    val x = rr.u32(); val y = rr.u32()
                    rr.u8() // external combination operator
                    val syms = referredSyms().getOrElse(IndexedSeq.empty)
                    // referred code tables, in referred order — a
                    // Huffman region assigns FS, DS, DT from them
                    val tabs = seg.refs.flatMap(codeTables.get).toIndexedSeq
                    val ok = syms.nonEmpty && w > 0 && h > 0 &&
                      w <= (1 << 16) && h <= (1 << 16) &&
                      w * h <= pixelBudget &&
                      x + w <= (1 << 16) && y + h <= (1 << 16)
                    if (ok) {
                      decodeTextRegion(all, rr.p, end, w.toInt, h.toInt,
                        syms, tabs).foreach { rows =>
                        pixelBudget -= w * h
                        regions += ((x.toInt, y.toInt, 0, rows))
                      }
                    }
                  }
                }
                if ((seg.tpe == 42 || seg.tpe == 43) &&
                    seg.refs.isEmpty) {
                  // non-empty refs = the reference is a RETAINED
                  // intermediate region (7.4.7), which this decoder
                  // does not keep — decoding against the page instead
                  // would be confident garbage, so those skip honestly
                  // immediate generic refinement region (§6.3 + 7.4.7):
                  // the reference is the page under the rect as
                  // composited SO FAR, GRREFERENCEDX/DY = 0, and the
                  // result REPLACES the rect. (Type 40, intermediate,
                  // refines a RETAINED region for later reference —
                  // parses and is skipped like other retained forms.)
                  val rr = new Reader(all)
                  rr.p = seg.dataStart
                  if (segLen >= 17 + 1) {
                    val w = rr.u32(); val h = rr.u32()
                    val x = rr.u32(); val y = rr.u32()
                    rr.u8() // external combination operator
                    val rflags = rr.u8()
                    val template = rflags & 1
                    val tpgron = (rflags & 2) != 0
                    val atCount = if (template == 0) 2 else 0
                    // 2× the rect: the decode materializes the rows AND
                    // a transient reference bitmap of the same size
                    val ok = w > 0 && h > 0 && w <= (1 << 16) &&
                      h <= (1 << 16) && 2 * w * h <= pixelBudget &&
                      x + w <= (1 << 16) && y + h <= (1 << 16) &&
                      end - rr.p >= 2 * atCount
                    if (ok) {
                      val at = Array.fill(atCount) {
                        val ax = rr.s8(); val ay = rr.s8(); (ax, ay)
                      }
                      val ref = Array.ofDim[Boolean](h.toInt, w.toInt)
                      compositeInto(ref, x.toInt, y.toInt)
                      pixelBudget -= w * h
                      val rows = decodeRefinement(all, rr.p, end, w.toInt,
                        h.toInt, template, at, ref, 0, 0, tpgron)
                      regions += ((x.toInt, y.toInt, 4, rows))
                    }
                  }
                }
                if (seg.tpe == 36 || seg.tpe == 38 || seg.tpe == 39) {
                  val rr = new Reader(all)
                  rr.p = seg.dataStart
                  if (segLen >= 18 + 4) {
                    val w = rr.u32(); val h = rr.u32()
                    val x = rr.u32(); val y = rr.u32()
                    rr.u8() // external combination operator
                    val gflags = rr.u8()
                    val mmr = (gflags & 1) != 0
                    val template = (gflags >> 1) & 3
                    val tpgdon = (gflags & 8) != 0
                    val atCount = if (mmr) 0 else if (template == 0) 4 else 1
                    val ok = w > 0 && h > 0 && w <= (1 << 16) &&
                      h <= (1 << 16) && w * h <= pixelBudget &&
                      x + w <= (1 << 16) && y + h <= (1 << 16) &&
                      end - rr.p >= 2 * atCount
                    if (ok) {
                      pixelBudget -= w * h
                      if (mmr) {
                        // MMR = T.6 two-dimensional coding (§6.2.6):
                        // exactly the CCITT G4 decoder, row count bounded
                        // by the region height instead of EOFB
                        val slice = java.util.Arrays.copyOfRange(all,
                          rr.p, end)
                        CcittG4.decode(slice, w.toInt, maxRows = h.toInt)
                          .filter(_.height == h.toInt) // partial = reject
                          .foreach(d =>
                            regions += ((x.toInt, y.toInt, 0, d.rows)))
                      } else {
                        val at = Array.fill(atCount) {
                          val ax = rr.s8(); val ay = rr.s8(); (ax, ay)
                        }
                        val rows = decodeGeneric(all, rr.p, end, w.toInt,
                          h.toInt, template, at, tpgdon)
                        regions += ((x.toInt, y.toInt, 0, rows))
                      }
                    }
                  }
                }
                r.p = end
              }
            }
        }
      }
      if (regions.isEmpty) None
      else {
        // page geometry: the page-info segment's declaration when it
        // contains every region (producers legally trim trailing white
        // rows from the region but the page bitmap keeps them — the
        // dims a conformant consumer reports), else the region extent
        val extW = regions.map { case (x, _, _, rw) => x + rw.head.length }.max
        val extH = regions.map { case (_, y, _, rw) => y + rw.length }.max
        val w = if (pageW >= extW && pageH >= extH) pageW.toInt else extW
        val h = if (pageW >= extW && pageH >= extH) pageH.toInt else extH
        if (regions.length == 1 && regions.head._1 == 0 &&
            regions.head._2 == 0 && w == extW && h == extH) {
          val rows = regions.head._4
          Some(Decoded(rows.head.length, rows.length, rows))
        } else if (w.toLong * h > maxPixels) None
        else {
          val page = Array.ofDim[Boolean](h, w)
          compositeInto(page, 0, 0)
          Some(Decoded(w, h, page))
        }
      }
    } catch { case _: Exception => None }
  }
}
