package graft.sources

import scala.collection.mutable

/** CCITT Group 4 (ITU-T T.6, "MMR") bilevel image codec — the compression
  * scanned-document PDFs overwhelmingly carry in their image XObjects
  * (/Filter /CCITTFaxDecode /K -1). The reference's domain is OCR of
  * scanned documents and it gets pixels for free via PyMuPDF rendering
  * (pymupdf_parser.py:773-823); a byte-level extractor must decode G4
  * itself or its image features and `would_ocr` decisions degrade to
  * undecoded-bytes behavior on exactly the documents OCR exists for.
  *
  * Pure two-dimensional coding per T.6 §2: each row is coded against the
  * previous (reference) row through vertical (|a1−b1| ≤ 3), horizontal
  * (two T.4 MH-coded runs) and pass modes; the reference line above the
  * first row is imaginary all-white; EOFB (two EOLs) ends the data.
  * Both directions are implemented — the encoder produces fixtures whose
  * decoded geometry/ink only a real decoder can recover, the decoder is
  * the extractor's production path. No RNG, no state: byte-identical
  * output for identical input on every run.
  *
  * All code tables below are the public T.4/T.6 standard tables.
  */
object CcittG4 {

  // ---------------- T.4 modified-Huffman run-length tables ----------------
  // (code-string, run). Terminal 0..63, then makeup 64..1728 per color,
  // then the shared extended makeups 1792..2560.

  private val WhiteCodes: Seq[(String, Int)] = Seq(
    "00110101" -> 0, "000111" -> 1, "0111" -> 2, "1000" -> 3, "1011" -> 4,
    "1100" -> 5, "1110" -> 6, "1111" -> 7, "10011" -> 8, "10100" -> 9,
    "00111" -> 10, "01000" -> 11, "001000" -> 12, "000011" -> 13,
    "110100" -> 14, "110101" -> 15, "101010" -> 16, "101011" -> 17,
    "0100111" -> 18, "0001100" -> 19, "0001000" -> 20, "0010111" -> 21,
    "0000011" -> 22, "0000100" -> 23, "0101000" -> 24, "0101011" -> 25,
    "0010011" -> 26, "0100100" -> 27, "0011000" -> 28, "00000010" -> 29,
    "00000011" -> 30, "00011010" -> 31, "00011011" -> 32, "00010010" -> 33,
    "00010011" -> 34, "00010100" -> 35, "00010101" -> 36, "00010110" -> 37,
    "00010111" -> 38, "00101000" -> 39, "00101001" -> 40, "00101010" -> 41,
    "00101011" -> 42, "00101100" -> 43, "00101101" -> 44, "00000100" -> 45,
    "00000101" -> 46, "00001010" -> 47, "00001011" -> 48, "01010010" -> 49,
    "01010011" -> 50, "01010100" -> 51, "01010101" -> 52, "00100100" -> 53,
    "00100101" -> 54, "01011000" -> 55, "01011001" -> 56, "01011010" -> 57,
    "01011011" -> 58, "01001010" -> 59, "01001011" -> 60, "00110010" -> 61,
    "00110011" -> 62, "00110100" -> 63,
    // makeup
    "11011" -> 64, "10010" -> 128, "010111" -> 192, "0110111" -> 256,
    "00110110" -> 320, "00110111" -> 384, "01100100" -> 448,
    "01100101" -> 512, "01101000" -> 576, "01100111" -> 640,
    "011001100" -> 704, "011001101" -> 768, "011010010" -> 832,
    "011010011" -> 896, "011010100" -> 960, "011010101" -> 1024,
    "011010110" -> 1088, "011010111" -> 1152, "011011000" -> 1216,
    "011011001" -> 1280, "011011010" -> 1344, "011011011" -> 1408,
    "010011000" -> 1472, "010011001" -> 1536, "010011010" -> 1600,
    "011000" -> 1664, "010011011" -> 1728)

  private val BlackCodes: Seq[(String, Int)] = Seq(
    "0000110111" -> 0, "010" -> 1, "11" -> 2, "10" -> 3, "011" -> 4,
    "0011" -> 5, "0010" -> 6, "00011" -> 7, "000101" -> 8, "000100" -> 9,
    "0000100" -> 10, "0000101" -> 11, "0000111" -> 12, "00000100" -> 13,
    "00000111" -> 14, "000011000" -> 15, "0000010111" -> 16,
    "0000011000" -> 17, "0000001000" -> 18, "00001100111" -> 19,
    "00001101000" -> 20, "00001101100" -> 21, "00000110111" -> 22,
    "00000101000" -> 23, "00000010111" -> 24, "00000011000" -> 25,
    "000011001010" -> 26, "000011001011" -> 27, "000011001100" -> 28,
    "000011001101" -> 29, "000001101000" -> 30, "000001101001" -> 31,
    "000001101010" -> 32, "000001101011" -> 33, "000011010010" -> 34,
    "000011010011" -> 35, "000011010100" -> 36, "000011010101" -> 37,
    "000011010110" -> 38, "000011010111" -> 39, "000001101100" -> 40,
    "000001101101" -> 41, "000011011010" -> 42, "000011011011" -> 43,
    "000001010100" -> 44, "000001010101" -> 45, "000001010110" -> 46,
    "000001010111" -> 47, "000001100100" -> 48, "000001100101" -> 49,
    "000001010010" -> 50, "000001010011" -> 51, "000000100100" -> 52,
    "000000110111" -> 53, "000000111000" -> 54, "000000100111" -> 55,
    "000000101000" -> 56, "000001011000" -> 57, "000001011001" -> 58,
    "000000101011" -> 59, "000000101100" -> 60, "000001011010" -> 61,
    "000001100110" -> 62, "000001100111" -> 63,
    // makeup
    "0000001111" -> 64, "000011001000" -> 128, "000011001001" -> 192,
    "000001011011" -> 256, "000000110011" -> 320, "000000110100" -> 384,
    "000000110101" -> 448, "0000001101100" -> 512, "0000001101101" -> 576,
    "0000001001010" -> 640, "0000001001011" -> 704, "0000001001100" -> 768,
    "0000001001101" -> 832, "0000001110010" -> 896, "0000001110011" -> 960,
    "0000001110100" -> 1024, "0000001110101" -> 1088,
    "0000001110110" -> 1152, "0000001110111" -> 1216,
    "0000001010010" -> 1280, "0000001010011" -> 1344,
    "0000001010100" -> 1408, "0000001010101" -> 1472,
    "0000001011010" -> 1536, "0000001011011" -> 1600,
    "0000001100100" -> 1664, "0000001100101" -> 1728)

  private val ExtCodes: Seq[(String, Int)] = Seq(
    "00000001000" -> 1792, "00000001100" -> 1856, "00000001101" -> 1920,
    "000000010010" -> 1984, "000000010011" -> 2048, "000000010100" -> 2112,
    "000000010101" -> 2176, "000000010110" -> 2240, "000000010111" -> 2304,
    "000000011100" -> 2368, "000000011101" -> 2432, "000000011110" -> 2496,
    "000000011111" -> 2560)

  // decode maps: (bitLength, codeValue) -> run
  private def decodeMap(codes: Seq[(String, Int)]): Map[(Int, Int), Int] =
    (codes ++ ExtCodes).map { case (s, run) =>
      (s.length, Integer.parseInt(s, 2)) -> run
    }.toMap
  private val WhiteDecode = decodeMap(WhiteCodes)
  private val BlackDecode = decodeMap(BlackCodes)
  // encode maps: run -> (codeValue, bitLength)
  private def encodeMap(codes: Seq[(String, Int)]): Map[Int, (Int, Int)] =
    (codes ++ ExtCodes).map { case (s, run) =>
      run -> ((Integer.parseInt(s, 2), s.length))
    }.toMap
  private val WhiteEncode = encodeMap(WhiteCodes)
  private val BlackEncode = encodeMap(BlackCodes)

  // ---------------- bit IO ----------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var cur = 0
    private var nbits = 0
    def put(value: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((value >> i) & 1)
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def result(): Array[Byte] = {
      if (nbits > 0) { out.write(cur << (8 - nbits)); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(b: Array[Byte]) {
    var pos = 0 // absolute bit position
    def remaining: Int = b.length * 8 - pos
    /** Next `n` bits MSB-first, zero-padded past the end. */
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        val bit =
          if (p >= b.length * 8) 0
          else (b(p >> 3) >> (7 - (p & 7))) & 1
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = pos += n
  }

  // ---------------- row model ----------------

  /** Changing elements of a row: positions where the pixel differs from
    * the one to its left (imaginary white at −1), terminated by two
    * `columns` sentinels. Index parity encodes color: even entries are
    * white→black transitions (pixel at that position is black).
    */
  private def changes(row: Array[Boolean], columns: Int): Array[Int] = {
    val out = new mutable.ArrayBuffer[Int](16)
    var prev = false
    var x = 0
    while (x < columns) {
      if (row(x) != prev) { out += x; prev = row(x) }
      x += 1
    }
    out += columns
    out += columns
    out.toArray
  }

  // ---------------- encoder ----------------

  private def putRun(bw: BitWriter, run0: Int, black: Boolean): Unit = {
    var run = run0
    val table = if (black) BlackEncode else WhiteEncode
    while (run >= 2624) { // chained max makeups
      val (c, l) = table(2560); bw.put(c, l); run -= 2560
    }
    if (run >= 64) {
      val (c, l) = table(run / 64 * 64); bw.put(c, l); run %= 64
    }
    val (c, l) = table(run)
    bw.put(c, l)
  }

  /** Encode a bilevel raster (true = black) as pure G4 + EOFB. */
  def encode(rows: Seq[Array[Boolean]], columns: Int): Array[Byte] = {
    val bw = new BitWriter
    var ref = changes(new Array[Boolean](columns), columns)
    rows.foreach { row =>
      val cur = changes(row, columns)
      var a0 = -1
      var color = false // color of the run starting at a0 (false = white)
      var curIdx = 0 // index into cur of the next change > a0 with parity
      while (a0 < columns) {
        // a1: next change on the coding line after a0 (parity matches the
        // running color automatically when advanced in step)
        while (curIdx < cur.length - 2 && cur(curIdx) <= a0) curIdx += 1
        val a1 = if (curIdx < cur.length) cur(curIdx) else columns
        val a2 =
          if (curIdx + 1 < cur.length) cur(curIdx + 1) else columns
        // b1: first ref change > a0 whose pixel color is the OPPOSITE of
        // the running color — i.e. a transition of the same sense as a1.
        // Even ref indices are white→black. Scan from the start (rows are
        // short in fixture service; asymptotically a merged pointer walk)
        var bi = if (color) 1 else 0
        while (bi < ref.length - 2 &&
            (ref(bi) <= a0 || ((bi & 1) == 0) != !color)) bi += 1
        // re-align parity: b1 must be white→black iff running color white
        if (((bi & 1) == 0) != !color) bi += 1
        val b1 = if (bi < ref.length) ref(bi) else columns
        val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
        if (b2 < a1) {
          bw.put(0x1, 4) // pass: 0001
          a0 = b2
        } else if (math.abs(a1 - b1) <= 3) {
          a1 - b1 match {
            case 0 => bw.put(0x1, 1) // V0: 1
            case 1 => bw.put(0x3, 3) // VR1: 011
            case 2 => bw.put(0x03, 6) // VR2: 000011
            case 3 => bw.put(0x03, 7) // VR3: 0000011
            case -1 => bw.put(0x2, 3) // VL1: 010
            case -2 => bw.put(0x02, 6) // VL2: 000010
            case _ => bw.put(0x02, 7) // VL3: 0000010
          }
          a0 = a1
          color = !color
          curIdx += 1
        } else {
          bw.put(0x1, 3) // horizontal: 001 + two MH runs
          val start = math.max(a0, 0)
          putRun(bw, a1 - start, color)
          putRun(bw, a2 - a1, !color)
          a0 = a2
          curIdx += 2
        }
      }
      ref = cur
    }
    bw.put(0x001, 12) // EOFB = EOL EOL
    bw.put(0x001, 12)
    bw.result()
  }

  // ---------------- decoder ----------------

  /** Decoded raster: true = black. `columns` from /DecodeParms (the one
    * parameter G4 cannot run without); row count comes from the DATA
    * (decode until EOFB / exhaustion / `maxRows`) — with no /Rows in the
    * dict, geometry is recoverable ONLY by decoding.
    */
  final case class Decoded(columns: Int, rows: Array[Array[Boolean]]) {
    def height: Int = rows.length
    def blackCount: Long = {
      var n = 0L
      rows.foreach(r => r.foreach(p => if (p) n += 1))
      n
    }
  }

  private def readRun(br: BitReader, black: Boolean): Int = {
    val table = if (black) BlackDecode else WhiteDecode
    var total = 0
    var terminal = false
    while (!terminal) {
      var len = 2
      var run = -1
      while (run < 0 && len <= 13) {
        run = table.getOrElse((len, br.peek(len)), -1)
        if (run < 0) len += 1
      }
      if (run < 0) return -1 // garbage / end of data
      br.skip(len)
      total += run
      terminal = run < 64
    }
    total
  }

  /** Decode pure-G4 data (`/K < 0`). Malformed input returns the rows
    * decoded so far (fuzz posture: degrade, never throw). */
  def decode(data: Array[Byte], columns: Int,
      maxRows: Int = 1 << 16): Option[Decoded] = {
    if (columns <= 0 || columns > (1 << 16)) return None
    val br = new BitReader(data)
    val out = mutable.ArrayBuffer.empty[Array[Boolean]]
    var ref = changes(new Array[Boolean](columns), columns)
    var done = false
    while (!done && out.length < maxRows) {
      if (br.remaining <= 0 || br.peek(12) == 0x001) done = true // EOFB/end
      else {
        val row = new Array[Boolean](columns)
        var a0 = -1
        var color = false
        var bad = false
        while (!bad && a0 < columns) {
          def fill(from: Int, until: Int, c: Boolean): Unit = {
            var x = math.max(from, 0)
            while (x < until && x < columns) { row(x) = c; x += 1 }
          }
          // b1/b2 from the reference line, parity-matched to the color
          var bi = if (color) 1 else 0
          while (bi < ref.length - 2 &&
              (ref(bi) <= a0 || ((bi & 1) == 0) != !color)) bi += 1
          if (((bi & 1) == 0) != !color) bi += 1
          val b1 = if (bi < ref.length) ref(bi) else columns
          val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
          val p7 = br.peek(7)
          if (p7 >> 6 == 0x1) { // V0
            br.skip(1); fill(a0, b1, color); a0 = b1; color = !color
          } else if (p7 >> 4 == 0x3) { // 011 VR1
            br.skip(3); fill(a0, b1 + 1, color); a0 = b1 + 1; color = !color
          } else if (p7 >> 4 == 0x2) { // 010 VL1
            br.skip(3); fill(a0, b1 - 1, color); a0 = b1 - 1; color = !color
          } else if (p7 >> 4 == 0x1) { // 001 horizontal
            br.skip(3)
            val r1 = readRun(br, color)
            val r2 = if (r1 < 0) -1 else readRun(br, !color)
            if (r2 < 0) bad = true
            else {
              val start = math.max(a0, 0)
              fill(start, start + r1, color)
              fill(start + r1, start + r1 + r2, !color)
              a0 = start + r1 + r2
            }
          } else if (p7 >> 3 == 0x1) { // 0001 pass
            br.skip(4); fill(a0, b2, color); a0 = b2
          } else if (p7 >> 1 == 0x3) { // 000011 VR2
            br.skip(6); fill(a0, b1 + 2, color); a0 = b1 + 2; color = !color
          } else if (p7 >> 1 == 0x2) { // 000010 VL2
            br.skip(6); fill(a0, b1 - 2, color); a0 = b1 - 2; color = !color
          } else if (p7 == 0x3) { // 0000011 VR3
            br.skip(7); fill(a0, b1 + 3, color); a0 = b1 + 3; color = !color
          } else if (p7 == 0x2) { // 0000010 VL3
            br.skip(7); fill(a0, b1 - 3, color); a0 = b1 - 3; color = !color
          } else { // EOL prefix, garbage, or exhausted data
            bad = true
          }
          if (a0 > columns) bad = true
        }
        if (bad) done = true
        else {
          out += row
          ref = changes(row, columns)
        }
      }
    }
    if (out.isEmpty) None else Some(Decoded(columns, out.toArray))
  }
}
