package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import graft.sources.PdfSource.{PdfBlock, PdfExtractor}

/** A real PDF byte codec, pure JVM — closes VERDICT r5 missing item #1
  * (S3/S4 byte decode, reference ingestion/parsers/pymupdf_parser.py:180-271
  * via PyMuPDF). No external jar: FlateDecode is `java.util.zip`, the rest
  * is the PDF 1.4 object model and content-stream text operators.
  *
  * [[RealPdfExtractor]] produces the same layout blocks PyMuPDF's
  * `get_text("dict")` yields for text-native PDFs: text-showing runs are
  * grouped into lines by the text matrix, lines into blocks by vertical
  * gap (> 1.5× the max of leading and font size starts a new block —
  * PyMuPDF's block segmentation heuristic), image XObject draws become
  * type-1 image blocks. Everything downstream (F4 min-length, G4 merge,
  * S5 policy, S6 cache) is [[PdfSource]], unchanged — this only replaces
  * the stubbed byte decode.
  *
  * String decoding covers the two families that matter in practice:
  * simple one-byte fonts (Latin-1 passthrough, or the font's /ToUnicode
  * CMap when embedded) and composite /Type0 fonts with /Identity-H
  * encoding — two-byte CIDs mapped through the embedded /ToUnicode CMap
  * (bfchar + bfrange, both scalar and array destination forms), which is
  * how every modern producer embeds subset fonts (reference:
  * ingestion/parsers/pymupdf_parser.py:180-271 gets the same mapping via
  * PyMuPDF); fonts with NO /ToUnicode decode through the embedded font
  * program's own `cmap` table ([[TrueTypeCmap]] — the subset-producer
  * case). PDF 1.5+ object streams (/Type /ObjStm — catalog/page/font
  * dicts packed compressed, the modern-producer layout) are expanded
  * into the object table. Remaining documented limits: mixed-width
  * codespace ranges (rare) take the first range's width; filters
  * handled are none, FlateDecode (the overwhelming default for text
  * content streams), and DCTDecode for image rasters
  * ([[graft.media.ImageCodec]]).
  */
object PdfCodec {

  // ---------------- shared object model ----------------

  private[sources] sealed trait PVal
  private[sources] final case class PNum(v: Double) extends PVal
  private[sources] final case class PName(v: String) extends PVal
  private[sources] final case class PStr(bytes: Array[Byte]) extends PVal
  private[sources] final case class PArr(v: Vector[PVal]) extends PVal
  private[sources] final case class PDict(v: Map[String, PVal]) extends PVal
  private[sources] final case class PRef(num: Int) extends PVal
  private[sources] final case class PBool(v: Boolean) extends PVal
  private[sources] case object PNull extends PVal
  /** A bare keyword — an operator in content streams, `obj`/`stream`/… in
    * the document body. */
  private[sources] final case class PKw(name: String) extends PVal

  private[sources] def isWs(c: Int): Boolean =
    c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
  private[sources] def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent lexer/parser over raw PDF bytes. One class serves
    * both the document body and content streams — the grammar is the same
    * COS syntax; only the keyword set differs.
    */
  private[sources] final class Lex(val b: Array[Byte]) {
    var p = 0
    def eof: Boolean = p >= b.length
    private def cur: Int = b(p) & 0xff

    def skipWs(): Unit = {
      while (!eof && (isWs(cur) || cur == '%')) {
        if (cur == '%') { // comment to EOL
          while (!eof && cur != '\n' && cur != '\r') p += 1
        } else p += 1
      }
    }

    /** Next syntactic value; keywords (operators, `obj`, `R`, …) come back
      * as [[PKw]] — the caller decides what they mean. Returns null at EOF.
      */
    def next(): PVal = {
      skipWs()
      if (eof) return null
      cur match {
        case '/' =>
          p += 1
          val s = new StringBuilder
          while (!eof && !isWs(cur) && !isDelim(cur)) {
            if (cur == '#' && p + 2 < b.length) {
              val h = Integer.parseInt(new String(b, p + 1, 2, ISO_8859_1), 16)
              s.append(h.toChar); p += 3
            } else { s.append(cur.toChar); p += 1 }
          }
          PName(s.toString)
        case '(' => PStr(literalString())
        case '<' =>
          if (p + 1 < b.length && b(p + 1) == '<') { p += 2; dict() }
          else PStr(hexString())
        case '[' =>
          p += 1
          val items = Vector.newBuilder[PVal]
          var done = false
          while (!done) {
            skipWs()
            if (eof || cur == ']') { if (!eof) p += 1; done = true }
            else items += nextResolvingRefs()
          }
          PArr(items.result())
        case ']' | '>' | '}' | '{' | ')' => p += 1; next() // stray delimiter
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          number()
        case _ =>
          val s = new StringBuilder
          while (!eof && !isWs(cur) && !isDelim(cur)) { s.append(cur.toChar); p += 1 }
          s.toString match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNull
            case "" => p += 1; next() // defensive: lone delimiter byte
            case kw => PKw(kw)
          }
      }
    }

    /** Like next() but reduces `N G R` to [[PRef]] — valid anywhere a value
      * is (array/dict members, operand positions). */
    def nextResolvingRefs(): PVal = next() match {
      case n @ PNum(v) if v >= 0 && v == v.floor =>
        val save = p
        (next(), { val s2 = p; (next(), s2) }) match {
          case (PNum(g), (PKw("R"), _)) if g >= 0 && g == g.floor => PRef(v.toInt)
          case _ => p = save; n
        }
      case other => other
    }

    private def number(): PNum = {
      val start = p
      p += 1
      while (!eof && !isWs(cur) && !isDelim(cur)) p += 1
      val s = new String(b, start, p - start, ISO_8859_1)
      PNum(try s.toDouble catch { case _: NumberFormatException => 0.0 })
    }

    private def dict(): PDict = {
      val m = Map.newBuilder[String, PVal]
      var done = false
      while (!done) {
        skipWs()
        if (eof) done = true
        else if (cur == '>' && p + 1 < b.length && b(p + 1) == '>') {
          p += 2; done = true
        } else next() match {
          case PName(k) => m += k -> nextResolvingRefs()
          case null => done = true
          case _ => () // malformed key; skip
        }
      }
      PDict(m.result())
    }

    /** `(...)` with PDF escapes: \n \r \t \b \f \( \) \\ \ooo, backslash-EOL
      * continuation, balanced nested parens. */
    private def literalString(): Array[Byte] = {
      p += 1 // consume (
      val out = new ByteArrayOutputStream
      var depth = 1
      while (!eof && depth > 0) {
        val c = cur; p += 1
        c match {
          case '\\' if !eof =>
            val e = cur; p += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '\n' => () // line continuation
              case '\r' => if (!eof && cur == '\n') p += 1
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && !eof && cur >= '0' && cur <= '7') {
                  v = v * 8 + (cur - '0'); p += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other)
            }
          case '(' => depth += 1; out.write('(')
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
          case other => out.write(other)
        }
      }
      out.toByteArray
    }

    /** `<hexdigits>`; odd final digit padded with 0 per spec. */
    private def hexString(): Array[Byte] = {
      p += 1 // consume <
      val out = new ByteArrayOutputStream
      var hi = -1
      while (!eof && cur != '>') {
        val c = cur
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 }
        }
        p += 1
      }
      if (hi >= 0) out.write(hi * 16)
      if (!eof) p += 1 // consume >
      out.toByteArray
    }

    /** Scan forward for an ASCII keyword at a token boundary; leaves p just
      * past it. Returns the offset where the keyword starts, or -1. */
    def seek(kw: String): Int = {
      val pat = kw.getBytes(ISO_8859_1)
      var i = p
      while (i + pat.length <= b.length) {
        var j = 0
        while (j < pat.length && b(i + j) == pat(j)) j += 1
        if (j == pat.length) { p = i + pat.length; return i }
        i += 1
      }
      -1
    }
  }

  // ---------------- filters ----------------

  private[sources] def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (n == 0 && inf.needsDictionary()) inf.end()
    }
    inf.end()
    out.toByteArray
  }

  private[graft] def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(math.max(64, data.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs to EOD `>`, whitespace skipped,
    * odd trailing digit zero-padded. */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      val d = Character.digit(c, 16)
      if (c == '>') done = true
      else if (d >= 0) {
        if (hi < 0) hi = d
        else { out.write((hi << 4) | d); hi = -1 }
      } // whitespace and junk: skipped (lenient, like viewers)
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit = zero-padded
    out.toByteArray
  }

  /** ASCII85Decode (§7.4.3): base-85 groups, `z` = four zero bytes,
    * EOD `~>`; a partial final group of n chars yields n-1 bytes (padded
    * with `u` per spec). Malformed input decodes best-effort. */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 4 / 5)
    val grp = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    def flush(chars: Int): Unit = {
      var k = chars
      while (k < 5) { grp(k) = 'u' - '!'; k += 1 } // pad with 'u'
      var v = 0L
      k = 0
      while (k < 5) { v = v * 85 + grp(k); k += 1 }
      val bytes = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(bytes, 0, chars - 1)
    }
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && n == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'
        n += 1
        if (n == 5) { flush(5); n = 0 }
      } // whitespace skipped
      i += 1
    }
    if (n >= 2) flush(n)
    out.toByteArray
  }

  /** RunLengthDecode (§7.4.5): length byte 0–127 copies len+1 literal
    * bytes, 129–255 repeats the next byte 257−len times, 128 = EOD. */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 2)
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val len = data(i) & 0xff
      i += 1
      if (len == 128) done = true
      else if (len < 128) {
        val n = math.min(len + 1, data.length - i)
        out.write(data, i, n)
        i += n
      } else if (i < data.length) {
        val b = data(i)
        i += 1
        var k = 0
        while (k < 257 - len) { out.write(b); k += 1 }
      }
    }
    out.toByteArray
  }

  /** LZWDecode (§7.4.4): TIFF-style LZW — 9→12-bit codes MSB-first,
    * Clear 256 / EOD 257, table grows one entry per emitted code, width
    * bumps one code EARLY of each power of two when /EarlyChange 1 (the
    * default every producer uses). Malformed streams decode best-effort.
    */
  private[graft] def lzwDecode(data: Array[Byte],
      earlyChange: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 3)
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 258
    var i = 0
    while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
    var width = 9
    var acc = 0L
    var bits = 0
    var prev: Array[Byte] = null
    val early = if (earlyChange) 1 else 0
    var p = 0
    var done = false
    while (p < data.length && !done) {
      acc = (acc << 8) | (data(p) & 0xffL)
      bits += 8
      p += 1
      while (bits >= width && !done) {
        val code = ((acc >> (bits - width)) & ((1 << width) - 1)).toInt
        bits -= width
        if (code == 257) done = true
        else if (code == 256) {
          dictSize = 258; width = 9; prev = null
        } else {
          val entry: Array[Byte] =
            if (code < dictSize && dict(code) != null) dict(code)
            else if (prev != null) prev :+ prev(0) // the KwKwK case
            else null
          if (entry == null) done = true // corrupt: stop, keep what we have
          else {
            out.write(entry)
            if (prev != null && dictSize < 4096) {
              dict(dictSize) = prev :+ entry(0)
              dictSize += 1
            }
            if (dictSize + early >= (1 << width) && width < 12) width += 1
            prev = entry
          }
        }
      }
    }
    out.toByteArray
  }

  /** Undo PNG predictors 10–15 (§7.4.4.4, RFC 2083): per-row filter byte
    * then None/Sub/Up/Average/Paeth, applied by real producers to xref
    * and object streams. Predictor 2 (TIFF horizontal) handled for
    * completeness; predictor 1/absent is the identity. Row geometry from
    * /Colors /BitsPerComponent /Columns; sub-byte components round the
    * byte-per-pixel delta up to 1, per the spec.
    */
  private[graft] def undoPredictor(data: Array[Byte], predictor: Int,
      colors: Int, bpc: Int, columns: Int): Array[Byte] = {
    if (predictor <= 1) return data
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = math.max(1, (colors * bpc * columns + 7) / 8)
    if (predictor == 2) { // TIFF horizontal differencing (byte-aligned only)
      if (bpc != 8) return data
      val out = data.clone()
      var r = 0
      while (r + rowLen <= out.length) {
        var i = bpp
        while (i < rowLen) { out(r + i) = (out(r + i) + out(r + i - bpp)).toByte; i += 1 }
        r += rowLen
      }
      return out
    }
    // PNG predictors: each row is 1 tag byte + rowLen data bytes
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    var r = 0
    while (r < rows) {
      val tag = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
        val upLeft =
          if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
        val v = tag match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val pp = left + up - upLeft
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - upLeft)
            raw + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else upLeft)
          case _ => raw
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  // ---------------- fonts / CMaps ----------------

  /** How to turn a text-showing operand's bytes into characters.
    *
    * @param codeBytes 1 for simple fonts, 2 for /Identity-H composite fonts
    * @param toUni     code → replacement text from the font's /ToUnicode
    *                  CMap; empty = identity (Latin-1 for 1-byte fonts,
    *                  code-as-char best-effort for 2-byte fonts)
    */
  private[graft] final case class FontDec(codeBytes: Int,
      toUni: Map[Int, String]) {
    def decode(bytes: Array[Byte]): String = {
      val sb = new StringBuilder
      if (codeBytes == 2) {
        var i = 0
        while (i + 1 < bytes.length) {
          val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
          sb.append(toUni.getOrElse(code, code.toChar.toString))
          i += 2
        }
        // PDF 32000-1:2008 §9.4.3: a partial final code is treated as if
        // padded with zeroes — decode a trailing odd byte as (b << 8)
        // rather than dropping it (real producers emit even lengths;
        // this is the spec's lenient reading of malformed input).
        if (i < bytes.length) {
          val code = (bytes(i) & 0xff) << 8
          sb.append(toUni.getOrElse(code, code.toChar.toString))
        }
      } else {
        var i = 0
        while (i < bytes.length) {
          val code = bytes(i) & 0xff
          sb.append(toUni.getOrElse(code, code.toChar.toString))
          i += 1
        }
      }
      sb.toString
    }
  }

  private[graft] val Latin1Font = FontDec(1, Map.empty)

  /** Glyph-name → text for /Differences encoding arrays (the LaTeX/dvips
    * producer shape: a simple font remaps byte codes to named glyphs).
    * Covers the Adobe Glyph List names that matter for Latin text plus
    * the algorithmic `uniXXXX` family; unknown names yield None and the
    * byte falls back to Latin-1.
    */
  private[graft] def glyphToText(name: String): Option[String] =
    // the CFF charset resolver carries the fuller table (multi-group
    // uniXXXX, uXXXXX astral, the Latin-1 dictionary); Euro is an AGL
    // name the CFF standard strings can't carry, and a literal 1-char
    // name maps to itself (the lenient reading viewers apply)
    CffCharset.resolveName(name)
      .orElse(if (name == "Euro") Some("€") else None)
      .orElse(if (name.length == 1) Some(name) else None)

  /** Built-in /Encoding of an embedded Type1 program (/FontFile — the
    * LaTeX-era simple-font shape): the CLEARTEXT section preceding
    * `eexec` defines the encoding as `dup <code> /<name> put` entries,
    * so no charstring decryption is needed to recover it. PFB segment
    * framing (0x80-prefixed headers) passes through harmlessly — the
    * scan reads the text, not the framing. Names resolve through the
    * same AGL conventions as /Differences; `/Encoding StandardEncoding
    * def` fonts yield an empty map and the Latin-1 fallback stands
    * (near-identical for the Latin range).
    */
  private[graft] def parseType1Encoding(prog: Array[Byte]): Map[Int, String] = {
    val text = new String(prog, ISO_8859_1)
    val eexecAt = text.indexOf("eexec")
    val clear = if (eexecAt < 0) text else text.substring(0, eexecAt)
    val re = """dup\s+(\d+)\s*/([^\s/()\[\]{}<>]+)\s+put""".r
    re.findAllMatchIn(clear).flatMap { m =>
      // length guard before toInt: a hostile 10+-digit code number must
      // skip like any other out-of-range code, not throw and cost the page
      if (m.group(1).length > 3) None
      else {
        val code = m.group(1).toInt
        if (code > 255) None else glyphToText(m.group(2)).map(code -> _)
      }
    }.toMap
  }

  /** Byte-code → text map from a /Differences array: runs of
    * `code /name /name …` restart at each number (PDF 32000 §9.6.6.3).
    */
  private[graft] def parseDifferences(arr: Vector[PVal]): Map[Int, String] = {
    val m = Map.newBuilder[Int, String]
    var code = -1
    arr.foreach {
      case PNum(n) => code = n.toInt
      case PName(g) if code >= 0 && code <= 255 =>
        glyphToText(g).foreach(t => m += code -> t)
        code += 1
      case _ => ()
    }
    m.result()
  }

  /** Parse a /ToUnicode CMap stream: code width from the first
    * codespacerange entry, mappings from every bfchar and bfrange section
    * (bfrange destinations in both the incrementing-scalar and the
    * explicit-array form). The CMap grammar is COS syntax plus keywords,
    * so the document [[Lex]] reads it directly. Returns (codeBytes, map);
    * codeBytes 0 when the stream declares no codespacerange (caller picks
    * a default from the font type).
    */
  private[graft] def parseCMap(data: Array[Byte]): (Int, Map[Int, String]) = {
    val lex = new Lex(data)
    val map = Map.newBuilder[Int, String]
    var codeBytes = 0

    def codeOf(b: Array[Byte]): Int = {
      var v = 0
      var i = 0
      while (i < b.length && i < 4) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      v
    }
    def utf16(b: Array[Byte]): String =
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    // bfrange increment: the LAST UTF-16 code unit of the destination
    // advances with the code (PDF 32000 §9.10.3's "last byte" rule, on
    // code-unit granularity — destinations are UTF-16BE)
    def bump(dst: String, by: Int): String =
      if (dst.isEmpty) dst
      else dst.init + (dst.last + by).toChar

    var done = false
    while (!done) {
      lex.next() match {
        case null => done = true
        case PKw("begincodespacerange") =>
          var in = true
          while (in) lex.next() match {
            case PStr(lo) =>
              if (codeBytes == 0) codeBytes = math.min(lo.length, 4)
              lex.next() // hi, ignored
              ()
            case PKw("endcodespacerange") | null => in = false
            case _ => ()
          }
        case PKw("beginbfchar") =>
          var in = true
          while (in) lex.next() match {
            case PStr(src) => lex.next() match {
              case PStr(dst) => map += codeOf(src) -> utf16(dst)
              case _ => ()
            }
            case PKw("endbfchar") | null => in = false
            case _ => ()
          }
        case PKw("beginbfrange") =>
          var in = true
          while (in) lex.next() match {
            case PStr(lo) =>
              (lex.next(), lex.next()) match {
                case (PStr(hi), PStr(dst0)) =>
                  val (l, h) = (codeOf(lo), codeOf(hi))
                  val d = utf16(dst0)
                  var c = l
                  while (c <= h) { map += c -> bump(d, c - l); c += 1 }
                case (PStr(hi), PArr(items)) =>
                  val l = codeOf(lo)
                  items.zipWithIndex.foreach {
                    case (PStr(dst), i) if l + i <= codeOf(hi) =>
                      map += (l + i) -> utf16(dst)
                    case _ => ()
                  }
                case _ => ()
              }
            case PKw("endbfrange") | null => in = false
            case _ => ()
          }
        case _ => () // header/footer keywords, dicts, numbers: skip
      }
    }
    (codeBytes, map.result())
  }
}

/** Minimal real-PDF writer: Helvetica text lines via Td/TL/T*, optional
  * FlateDecode content streams, optional DeviceGray image XObjects. Exists
  * so the extractor can be proven against REAL bytes it did not itself
  * read — round-trip specs and the p7 catalog query build PDFs from corpus
  * text and assert the decode is lossless.
  */
object PdfWriter {
  import PdfCodec._

  /** One page: paragraphs (lines pre-split on \n) and image descriptors
    * placed after the paragraph whose index they carry. */
  final case class PageSpec(paragraphs: Seq[String],
      imagesAfter: Map[Int, Int] = Map.empty) // paragraph idx -> image count

  val FontSize = 11
  val Leading = 13
  val ParagraphGap = 26 // > 1.5 * Leading => a block break for any layout parser
  val PageTop = 756
  val LeftMargin = 72

  /** Literal strings carry byte codes; anything beyond Latin-1 needs the
    * composite-font writer ([[buildCid]]) — the SAME sanitation must be
    * applied to any expected-output text. */
  def sanitize(s: String): String =
    s.map(c => if (c > 'ÿ') '?' else if (c < ' ' && c != '\n') ' ' else c)

  /** [[buildCid]]'s sanitation: any character survives (codes are CIDs,
    * not bytes), only C0 controls flatten to spaces. */
  def sanitizeCid(s: String): String =
    s.map(c => if (c < ' ' && c != '\n') ' ' else c)

  private def esc(s: String): String = {
    val out = new StringBuilder
    sanitize(s).foreach {
      case '(' => out.append("\\(")
      case ')' => out.append("\\)")
      case '\\' => out.append("\\\\")
      case c => out.append(c)
    }
    out.toString
  }

  /** The extractor's content string for image n on a page (2x2 DeviceGray). */
  def imageContent(n: Int): String = s"Im$n 2x2"

  /** Dimensions of JPEG image n on a page in [[buildJpeg]] output — the
    * ORACLE-side arithmetic for the decode round-trip (p11): any party can
    * recompute the expected decoded size from the image index alone.
    */
  def jpegDims(n: Int): (Int, Int) = (16 + 8 * (n % 5), 12 + 4 * (n % 7))

  /** The extractor's content string for JPEG image n: decoded dims +
    * channel count (always 3 — [[graft.media.ImageCodec.syntheticJpeg]]
    * writes RGB). */
  def jpegImageContent(n: Int): String = {
    val (w, h) = jpegDims(n)
    s"Im$n ${w}x$h jpeg c3"
  }

  def build(pages: Seq[PageSpec], compress: Boolean): Array[Byte] =
    buildWith(pages, compress, cid = false)

  /** [[build]] with REAL baseline-JPEG image XObjects (/Filter /DCTDecode
    * — the payload is a bare JPEG stream, the dominant scanned-page
    * shape): image n on each page is [[graft.media.ImageCodec
    * .syntheticJpeg]] at [[jpegDims]](n). The object dict deliberately
    * understates /Width /Height by 1 so an extractor that trusts the dict
    * instead of decoding pixels CANNOT produce the right label — the
    * decoded raster is the only source of truth (reference renders real
    * pixels via PyMuPDF, pymupdf_parser.py:675-759).
    */
  def buildJpeg(pages: Seq[PageSpec], compress: Boolean): Array[Byte] =
    buildWith(pages, compress, cid = false, jpegImages = true)

  // ---- scanned-document image fixtures (p14): G4 + JBIG2/JPX stubs ----

  /** Dimensions of the G4 bilevel image for seed m — oracle-side
    * arithmetic, like [[jpegDims]]. */
  def g4Dims(m: Int): (Int, Int) = (12 + 4 * (m % 6), 8 + 3 * (m % 5))

  /** The deterministic test raster: black iff (3x + 7y + m) mod 11 < 4 —
    * mixed short runs in both dimensions, so vertical, horizontal AND
    * pass modes all exercise. */
  def g4Pixel(m: Int, x: Int, y: Int): Boolean = (x * 3 + y * 7 + m) % 11 < 4

  def g4Raster(m: Int): Seq[Array[Boolean]] = {
    val (w, h) = g4Dims(m)
    (0 until h).map(y => Array.tabulate(w)(x => g4Pixel(m, x, y)))
  }

  /** Dict dimensions of the JBIG2 / JPX stub XObjects for seed m
    * (truthful — nothing decodes them; the label must carry them plus
    * the honest `undecoded` marker). */
  def jbig2Dims(m: Int): (Int, Int) = (16 + m % 8, 10 + m % 4)
  def jpxDims(m: Int): (Int, Int) = (18 + m % 5, 12 + m % 6)

  /** The scanned-corpus shape (p14): image XObjects are CCITT G4
    * (/Filter /CCITTFaxDecode /K -1 — what scanned PDFs overwhelmingly
    * carry), plus one JBIG2 and one JPX stub per image triple. The G4
    * object dict deliberately understates /Width /Height by 1 and its
    * /DecodeParms carries /Columns but NO /Rows — height and ink are
    * recoverable ONLY by running the G4 decoder (the p11 trick); the
    * JBIG2/JPX stubs must be detected and labeled `undecoded` with their
    * dict dims, never guessed at.
    */
  def buildScan(pages: Seq[PageSpec], compress: Boolean,
      seed: Int): Array[Byte] =
    buildWith(pages, compress, cid = false, scanSeed = Some(seed))

  // ---- JBIG2 scanned-document fixtures (p15) ----

  /** True dimensions of the REAL JBIG2 image for seed m — oracle-side
    * arithmetic like [[g4Dims]]. Both come only from the region segment
    * data (JBIG2 carries its own geometry; the dict lies by 1). */
  def jb2Dims(m: Int): (Int, Int) = (14 + 3 * (m % 7), 9 + 2 * (m % 5))

  /** Deterministic JBIG2 test raster: black iff (5x + 3y + m) mod 13 < 5 —
    * constants differ from [[g4Pixel]] so a G4 oracle cannot pass by
    * accident. */
  def jb2Pixel(m: Int, x: Int, y: Int): Boolean = (x * 5 + y * 3 + m) % 13 < 5

  def jb2Raster(m: Int): Seq[Array[Boolean]] = {
    val (w, h) = jb2Dims(m)
    (0 until h).map(y => Array.tabulate(w)(x => jb2Pixel(m, x, y)))
  }

  /** The JBIG2 scanned-corpus shape (p15): Im0 is a REAL embedded-JBIG2
    * generic region ([[Jbig2.encodeEmbedded]]) whose dict /Width /Height
    * LIE by one — true geometry and ink are recoverable ONLY by running
    * the MQ arithmetic decoder (the p11/p14 trick, now with BOTH
    * dimensions data-only); Im1 is a JBIG2 XObject with an undecodable
    * payload and honest dict dims that must be labeled `undecoded` (the
    * degrade path a symbol-dictionary stream takes); Im2 is the JPX stub.
    */
  def buildJbig2Scan(pages: Seq[PageSpec], compress: Boolean,
      seed: Int): Array[Byte] =
    buildWith(pages, compress, cid = false, jbig2Seed = Some(seed))

  // ---- JBIG2 symbol/text-region fixtures (p17) ----

  /** Deterministic glyph k for the dictionary: heights are
    * non-decreasing in k (the dictionary's height-class order), pixel
    * formula distinct from every other fixture family. */
  def jb2Glyph(k: Int): Array[Array[Boolean]] = jb2GlyphAt(k, 3)

  /** Glyph k under a SPARSER rule — the refinement fixtures' corrupted
    * base: same dims as [[jb2Glyph]], strictly fewer pixels, restored
    * to the true rule only by a real refinement decode. */
  def jb2GlyphSparse(k: Int): Array[Array[Boolean]] = jb2GlyphAt(k, 2)

  /** The ONE glyph pixel rule, threshold-parameterized: the sparse
    * base is a strict subset of the truth because the rule is shared. */
  def jb2GlyphAt(k: Int, thresh: Int): Array[Array[Boolean]] =
    Array.tabulate(5 + k / 2, 4 + k % 4)(
      (y, x) => (x * 3 + y * 5 + 2 * k) % 7 < thresh)

  def jb2NumSyms(m: Int): Int = 3 + m % 3
  def jb2NumInst(m: Int): Int = 6 + m % 5

  /** True page dims of the symbol-coded document for seed m. */
  def jb2TextDims(m: Int): (Int, Int) = (11 * (jb2NumInst(m) - 1) + 8, 12)

  /** Instance j: dictionary id, top-left placement — 11-px column pitch
    * so glyphs (w ≤ 7) never overlap and ink is exactly additive. */
  def jb2TextInstances(m: Int): Seq[Jbig2.TextInstance] =
    (0 until jb2NumInst(m)).map(j =>
      Jbig2.TextInstance((j * 2 + m) % jb2NumSyms(m), 11 * j, 3 + (j % 3)))

  /** The dominant wild-JBIG2 shape (p17): Im0 is a SYMBOL-CODED document
    * ([[Jbig2.encodeTextDocument]] — arithmetic symbol dictionary +
    * text region placing glyph instances) whose dict /Width /Height LIE
    * by one; geometry and ink are recoverable only by running the full
    * Annex-A integer decoding + dictionary + text-region pipeline. Im1
    * is the undecodable-payload JBIG2 stub, Im2 the JPX stub.
    */
  def buildJbig2TextScan(pages: Seq[PageSpec], compress: Boolean,
      seed: Int): Array[Byte] =
    buildWith(pages, compress, cid = false, jbig2TextSeed = Some(seed))

  // ---- JPEG 2000 scanned-document fixtures (p16) ----

  /** True dimensions of the raw-codestream JPX image for seed m. */
  def jpxRawDims(m: Int): (Int, Int) = (17 + 2 * (m % 6), 11 + m % 7)

  /** True dimensions of the JP2-box-wrapped image for seed m. */
  def jp2Dims(m: Int): (Int, Int) = (12 + m % 9, 8 + m % 6)

  /** True dimensions of the quantized-9/7 image for seed m. */
  def i97Dims(m: Int): (Int, Int) = (19 + m % 7, 13 + m % 5)

  /** True dimensions of the subsampled-YCbCr (4:2:0) image for seed m —
    * EVEN on both axes, so every chroma sample covers exactly 4
    * reference-grid pixels and the oracle's replicated ink sum is
    * `ΣY + 4·(ΣCb + ΣCr)` with no edge terms. */
  def y420Dims(m: Int): (Int, Int) = (16 + 2 * (m % 6), 10 + 2 * (m % 5))

  /** True dimensions of the subsampled-YCbCr (4:1:1, the DV-lineage
    * factor-4 form) image for seed m — width a MULTIPLE OF 4, so every
    * chroma sample covers exactly 4 reference-grid pixels in a row and
    * the oracle's replicated ink sum is `ΣY + 4·(ΣCb + ΣCr)` with no
    * edge terms (height factor is 1). */
  def y411Dims(m: Int): (Int, Int) = (16 + 4 * (m % 4), 9 + m % 6)

  /** LL-band quantization step of the 9/7 fixture (genuinely lossy —
    * ~42 dB on the sawtooth raster — so only a correct dequantize +
    * synthesis lands inside the p16 ink band). */
  val I97Step = 2.0

  /** Deterministic grayscale test raster: v = (7x + 11y + 3m) mod 256 —
    * full 8-bit range, so every Tier-1 bit-plane carries signal. */
  def jpxPixel(m: Int, x: Int, y: Int): Int = (x * 7 + y * 11 + 3 * m) % 256

  def jpxRaster(m: Int, w: Int, h: Int): Array[Array[Int]] =
    Array.tabulate(h, w)((y, x) => jpxPixel(m, x, y))

  /** The JPEG 2000 scanned-corpus shape (p16): Im0 is a REAL raw
    * codestream ([[Jpx.encode]] — 5/3 DWT + EBCOT + MQ) and Im1 a REAL
    * JP2-box-wrapped one ([[Jpx.wrapJp2]], the other form /JPXDecode
    * accepts), BOTH with dict /Width /Height lying by one — geometry and
    * gray-sum are recoverable only by a true Tier-1 + DWT decode; Im2 is
    * a JPX XObject with an undecodable payload and honest dict dims that
    * must stay `undecoded` (the degrade path an out-of-subset stream
    * takes); Im3 is the quantized-9/7 archival form; Im4 (image count
    * ≥ 5) is the SUBSAMPLED 4:2:0 YCbCr color-scan form — full-res Y,
    * half-res chroma on their own band grids, lossless, JP2-wrapped on
    * odd seeds.
    */
  def buildJpxScan(pages: Seq[PageSpec], compress: Boolean,
      seed: Int): Array[Byte] =
    buildWith(pages, compress, cid = false, jpxSeed = Some(seed))

  /** Identity-H variant — the modern-producer shape the extractor must
    * handle in the wild: one /Type0 font whose strings are two-byte CIDs,
    * mapped back to text only through the embedded /ToUnicode CMap. CID =
    * 1 + rank of the codepoint in the document's sorted distinct-codepoint
    * set — deliberately NOT the codepoint itself, so an extractor that
    * ignores the CMap cannot round-trip by accident. The CMap emits
    * maximal consecutive runs as bfrange entries and the rest as bfchar
    * (both ≤100 entries per section, per spec), so a round-trip exercises
    * every mapping form. Supplementary codepoints get surrogate-pair
    * (two-code-unit) bfchar destinations.
    */
  def buildCid(pages: Seq[PageSpec], compress: Boolean): Array[Byte] =
    buildWith(pages, compress, cid = true)

  /** The subset-font producer shape the extractor meets in the wild when
    * /ToUnicode is MISSING: same /Type0 /Identity-H structure as
    * [[buildCid]] (CID = alphabet rank, never the codepoint — accidental
    * round-trips stay impossible), but the only path back to text is the
    * embedded /FontFile2's own `cmap` table
    * ([[TrueTypeCmap.buildFont]]). An extractor that reads only
    * /ToUnicode degrades to code-as-char garbage here; one that performs
    * font introspection (the reference via PyMuPDF,
    * pymupdf_parser.py:180-271) recovers the text exactly.
    */
  def buildCidNoToUni(pages: Seq[PageSpec], compress: Boolean): Array[Byte] =
    buildWith(pages, compress, cid = true, toUni = false)

  /** The PostScript-outline producer shape: same /Type0 /Identity-H
    * structure with NO /ToUnicode as [[buildCidNoToUni]], but the
    * descendant is a /CIDFontType0 whose /FontFile3 (/Subtype
    * /CIDFontType0C) is a BARE name-keyed CFF — no sfnt wrapper, no
    * `cmap` table. The only route back to text is the CFF charset's
    * glyph names ([[CffCharset.buildFont]] names glyph g `uniXXXX` of
    * its codepoint); an extractor that only reads sfnt cmaps degrades to
    * code-as-char garbage here, exactly as one that only reads
    * /ToUnicode does on p10.
    */
  def buildCidCff(pages: Seq[PageSpec], compress: Boolean): Array[Byte] =
    buildWith(pages, compress, cid = true, toUni = false, cff = true)

  /** Encrypted variant — the owner-restricted corpus shape (empty user
    * password, printing/copy bits cleared): every stream is encrypted
    * under the standard security handler — RC4-128 (/V 2 /R 3),
    * AES-128-CBC (/V 4 /R 4 /AESV2), or AES-256-CBC (/V 5 /R 6 /AESV3,
    * the PDF-2.0 handler and the Acrobat default since X) per `cipher`
    * ("rc4" | "aes128" | "aes256"). /O and /U come from the spec's
    * algorithms (3/5 for the MD5 handlers, 2.B hashes + wrapped /UE //OE
    * for V5), so any conforming reader authenticates the empty password
    * and opens the file; an extractor that skips decryption sees
    * ciphertext and can recover NO text (the content streams never
    * appear in the clear).
    */
  def buildEncrypted(pages: Seq[PageSpec], compress: Boolean,
      aes: Boolean): Array[Byte] =
    buildEncrypted(pages, compress, if (aes) "aes128" else "rc4")

  def buildEncrypted(pages: Seq[PageSpec], compress: Boolean,
      cipher: String): Array[Byte] =
    buildWith(pages, compress, cid = false, encryptCipher = Some(cipher))

  /** [[buildCidNoToUni]] with a PERMUTED glyph order and an embedded
    * /CIDToGIDMap STREAM (2-byte big-endian GID per CID, §9.7.4.2) — the
    * other half of real subset fonts, whose glyph order follows the
    * subsetter, not the CID alphabet. GID = n+1−CID (reversal), so an
    * extractor that assumes /Identity composes the font cmap against the
    * wrong glyphs and CANNOT round-trip; only reading the map stream
    * recovers text.
    */
  def buildCidGidStream(pages: Seq[PageSpec], compress: Boolean): Array[Byte] =
    buildWith(pages, compress, cid = true, toUni = false, gidStream = true)

  private def buildWith(pages: Seq[PageSpec], compress: Boolean,
      cid: Boolean, toUni: Boolean = true,
      jpegImages: Boolean = false, cff: Boolean = false,
      gidStream: Boolean = false,
      encryptCipher: Option[String] = None,
      scanSeed: Option[Int] = None,
      jbig2Seed: Option[Int] = None,
      jbig2TextSeed: Option[Int] = None,
      jpxSeed: Option[Int] = None): Array[Byte] = {
    val out = new ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = mutable.Map[Int, Int]()
    // object plan: 1=catalog 2=pages, then the font objects
    // (simple: 3=font; cid+toUni: 3=Type0 4=descendant CIDFont 5=ToUnicode;
    //  cid no-toUni: 3=Type0 4=descendant CIDFont 5=FontDescriptor
    //  6=FontFile2)
    var nextObj =
      if (cid && !toUni && gidStream) 8
      else if (cid && !toUni) 7 else if (cid) 6 else 4
    def defObj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }

    // --- standard-security-handler state (buildEncrypted only) ---
    val encObj = encryptCipher.map { _ => val e = nextObj; nextObj += 1; e }
    val encV5 = encryptCipher.contains("aes256")
    val encAes = encryptCipher.exists(_.startsWith("aes"))
    val encR = if (encV5) 6 else if (encAes) 4 else 3
    val encP = -44 // typical owner-restriction bits
    // deterministic /ID: fixture bytes must be reproducible
    val encId0: Array[Byte] =
      if (encryptCipher.isEmpty) Array.emptyByteArray
      else java.security.MessageDigest.getInstance("MD5").digest(
        pages.flatMap(_.paragraphs).mkString("\n").getBytes(ISO_8859_1))
    // legacy (MD5/RC4-derived) handlers
    val encO = encryptCipher.filter(_ => !encV5).map(_ => PdfCrypt.computeO(
      Array.emptyByteArray, Array.emptyByteArray, 16, encR))
    val encKey = encO.map(o => PdfCrypt.fileKey(
      Array.emptyByteArray, o, encP, encId0, 16, encR))
    val encU = encKey.map(k => PdfCrypt.computeU(k, encId0, encR))
    // V5: a deterministic 32-byte file key + the Algorithm-2.B entry set
    val encV5Key: Option[Array[Byte]] =
      if (!encV5) None
      else Some(java.security.MessageDigest.getInstance("MD5")
        .digest(encId0 ++ Array(1.toByte)) ++
        java.security.MessageDigest.getInstance("MD5")
          .digest(encId0 ++ Array(2.toByte)))
    val encV5Set = encV5Key.map(k => PdfCrypt.v5Entries(k, encP, encId0))
    def maybeEnc(num: Int, data: Array[Byte]): Array[Byte] =
      encV5Key.map(k => PdfCrypt.encrypt(k, data, aes = true, num))
        .orElse(encKey.map(k => PdfCrypt.encrypt(
          PdfCrypt.objectKey(k, num, 0, encAes), data, encAes, num)))
        .getOrElse(data)

    // distinct codepoints across every page, sorted: the CID alphabet
    val cidOf: Map[Int, Int] =
      if (!cid) Map.empty
      else pages.flatMap(_.paragraphs).flatMap(_.codePoints().toArray)
        .filter(_ != '\n').distinct.sorted.zipWithIndex
        .map { case (cp, i) => cp -> (i + 1) }.toMap

    def showText(line: String): String =
      if (cid) {
        val sb = new StringBuilder("<")
        line.codePoints().forEach { cp =>
          sb.append(f"${cidOf.getOrElse(cp, 0)}%04X"); ()
        }
        sb.append('>').toString
      } else s"(${esc(line)})"

    w("%PDF-1.4\n%âãÏÓ\n")

    // plan object numbers: per page -> (pageObj, contentObj, imageObjs)
    val pagePlan = pages.map { pg =>
      val pageObj = nextObj; val contentObj = nextObj + 1
      val nImages = pg.imagesAfter.values.sum
      val imgObjs = (0 until nImages).map(i => nextObj + 2 + i)
      nextObj += 2 + nImages
      (pageObj, contentObj, imgObjs)
    }

    defObj(1)(w("<< /Type /Catalog /Pages 2 0 R >>"))
    defObj(2) {
      val kids = pagePlan.map(p => s"${p._1} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [ $kids ] /Count ${pages.length} >>")
    }
    if (!cid)
      defObj(3)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    else if (toUni) {
      defObj(3)(w("<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic " +
        "/Encoding /Identity-H /DescendantFonts [ 4 0 R ] /ToUnicode 5 0 R >>"))
      defObj(4)(w("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synthetic " +
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
        "/CIDToGIDMap /Identity >>"))
      val cmap = maybeEnc(5, toUnicodeCMap(cidOf).getBytes(ISO_8859_1))
      defObj(5) {
        w(s"<< /Length ${cmap.length} >>\nstream\n")
        out.write(cmap)
        w("\nendstream")
      }
    } else {
      defObj(3)(w("<< /Type /Font /Subtype /Type0 /BaseFont /Subset " +
        "/Encoding /Identity-H /DescendantFonts [ 4 0 R ] >>"))
      if (cff) {
        // CIDFontType0 + bare-CFF /FontFile3: PDF 32000 §9.7.4.2 — a
        // name-keyed CFF uses CIDs directly as glyph indices, so code ==
        // gid here exactly as under /CIDToGIDMap /Identity below
        defObj(4)(w("<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Subset " +
          "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
          "/FontDescriptor 5 0 R >>"))
        defObj(5)(w("<< /Type /FontDescriptor /FontName /Subset /Flags 4 " +
          "/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 /Descent -200 " +
          "/CapHeight 700 /StemV 80 /FontFile3 6 0 R >>"))
        val fontBytes = maybeEnc(6, CffCharset.buildFont(cidOf))
        defObj(6) {
          w(s"<< /Length ${fontBytes.length} /Subtype /CIDFontType0C >>\nstream\n")
          out.write(fontBytes)
          w("\nendstream")
        }
      } else {
        val mapEntry =
          if (gidStream) "/CIDToGIDMap 7 0 R" else "/CIDToGIDMap /Identity"
        defObj(4)(w("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Subset " +
          "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
          s"$mapEntry /FontDescriptor 5 0 R >>"))
        defObj(5)(w("<< /Type /FontDescriptor /FontName /Subset /Flags 4 " +
          "/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 /Descent -200 " +
          "/CapHeight 700 /StemV 80 /FontFile2 6 0 R >>"))
        // identity mode: gid == cid, the font's cmap maps codepoint → cid
        // directly; gid-stream mode: glyph order reversed (gid = n+1−cid),
        // the cmap maps codepoint → PERMUTED gid and only the map stream
        // leads back
        val n = cidOf.size
        def gidOf(cidv: Int): Int = if (gidStream) n + 1 - cidv else cidv
        val fontBytes = maybeEnc(6, TrueTypeCmap.buildFont(
          cidOf.map { case (cp, c) => cp -> gidOf(c) }))
        defObj(6) {
          w(s"<< /Length ${fontBytes.length} /Length1 ${fontBytes.length} >>\nstream\n")
          out.write(fontBytes)
          w("\nendstream")
        }
        if (gidStream) {
          val m = new ByteArrayOutputStream
          (0 to n).foreach { c =>
            val g = if (c == 0) 0 else gidOf(c)
            m.write((g >> 8) & 0xff); m.write(g & 0xff)
          }
          val mapBytes = maybeEnc(7, m.toByteArray)
          defObj(7) {
            w(s"<< /Length ${mapBytes.length} >>\nstream\n")
            out.write(mapBytes)
            w("\nendstream")
          }
        }
      }
    }

    pages.zip(pagePlan).foreach { case (pg, (pageObj, contentObj, imgObjs)) =>
      // content stream: absolute-positioned text object per paragraph
      val cs = new StringBuilder
      var y = PageTop
      var imgIdx = 0
      // iterate past the paragraph list so imagesAfter keys beyond it
      // (image-only pages) still draw
      val lastIdx = (pg.paragraphs.indices ++ pg.imagesAfter.keys)
        .foldLeft(-1)(math.max)
      (0 to lastIdx).foreach { pi =>
        if (pi < pg.paragraphs.length) {
          val lines = pg.paragraphs(pi).split("\n", -1).toSeq
          cs.append(s"BT\n/F1 $FontSize Tf\n$Leading TL\n$LeftMargin $y Td\n")
          lines.zipWithIndex.foreach { case (line, li) =>
            if (li > 0) cs.append("T*\n")
            cs.append(s"${showText(line)} Tj\n")
          }
          cs.append("ET\n")
          y -= Leading * lines.length + (ParagraphGap - Leading)
        }
        (0 until pg.imagesAfter.getOrElse(pi, 0)).foreach { _ =>
          cs.append(s"q\n40 0 0 40 $LeftMargin ${y - 40} cm\n/Im$imgIdx Do\nQ\n")
          imgIdx += 1
          y -= 40 + (ParagraphGap - Leading)
        }
      }
      val raw = cs.toString.getBytes(ISO_8859_1)
      val (data, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")

      defObj(pageObj) {
        val xobj =
          if (imgObjs.isEmpty) ""
          else imgObjs.zipWithIndex
            .map { case (o, i) => s"/Im$i $o 0 R" }
            .mkString(" /XObject << ", " ", " >>")
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >>$xobj >> " +
          s"/Contents $contentObj 0 R >>")
      }
      defObj(contentObj) {
        val payload = maybeEnc(contentObj, data)
        w(s"<< /Length ${payload.length}$filter >>\nstream\n")
        out.write(payload)
        w("\nendstream")
      }
      imgObjs.zipWithIndex.foreach { case (o, i) =>
        defObj(o) {
          // one writer for every image-XObject shape the fixtures emit;
          // dictW/dictH are what the DICT claims (the scanned fixtures
          // deliberately understate real codecs by one — only a true
          // decode can answer right), extra carries /DecodeParms etc.
          def imgXObject(dictW: Int, dictH: Int, cs: String, bpc: Int,
              filter: String, extra: String, data: Array[Byte]): Unit = {
            val payload = maybeEnc(o, data)
            w(s"<< /Type /XObject /Subtype /Image /Width $dictW " +
              s"/Height $dictH /ColorSpace /$cs " +
              s"/BitsPerComponent $bpc /Filter /$filter $extra" +
              s"/Length ${payload.length} >>\nstream\n")
            out.write(payload)
            w("\nendstream")
          }
          def jbig2Stub(m: Int): Unit = {
            val (iw, ih) = jbig2Dims(m) // honest dims, undecodable payload
            imgXObject(iw, ih, "DeviceGray", 1, "JBIG2Decode", "",
              s"jbig2-stub-$m".getBytes(ISO_8859_1))
          }
          def jpxStub(m: Int): Unit = {
            val (iw, ih) = jpxDims(m) // honest dims, undecodable payload
            imgXObject(iw, ih, "DeviceRGB", 8, "JPXDecode", "",
              s"jpx-stub-$m".getBytes(ISO_8859_1))
          }
          if (jpxSeed.isDefined) {
            val m = jpxSeed.get
            (i % 6) match {
              case 0 => // REAL raw codestream; dict dims LIE. The seed
                // rotates quality layers, progression order, tiling,
                // (r11, every fifth seed) a two-entry POC — resolution
                // 0 first, the rest layer-major — (r12, every
                // fifth seed) EXPLICIT PRECINCTS (T.800 B.6): a
                // (1,2,3)-exponent ladder giving a multi-precinct grid
                // at every resolution with code-blocks clamped to
                // 2×2/4×4, aligned with the 8-px tile grid — and (r13,
                // every fifth seed, disjoint from POC/precinct seeds)
                // SOP+EPH resync markers (A.8): per-packet FF91 Nsop
                // sequence + mandatory per-header FF92. All
                // lossless, so the oracle's exact sums are unchanged:
                // only a decoder speaking the full B.10 protocol —
                // per-PRECINCT tag trees escalating a layer at a time,
                // persistent Lblock, segments concatenating across
                // packets, per-tile DWT domains, A.6.6 packet
                // reordering, B.6 precinct-partitioned packets, A.8
                // marker verify/strip — recovers the pixels
                val (iw, ih) = jpxRawDims(m)
                val lyr = 1 + m % 3
                imgXObject(iw - 1, ih - 1, "DeviceGray", 8, "JPXDecode", "",
                  Jpx.encodeMulti(Seq(jpxRaster(m, iw, ih)), levels = 2,
                    layers = lyr, prog = m % 5,
                    tileW = if (m % 2 == 0) 8 else 0,
                    tileH = if (m % 3 == 0) 8 else 0,
                    poc = if (m % 5 == 2)
                      Seq((0, 0, lyr, 1, 1, 2), (0, 0, lyr, 3, 1, 0))
                    else Nil,
                    prec = if (m % 5 == 3) Seq((1, 1), (2, 2), (3, 3))
                    else Nil,
                    sop = m % 5 == 1, eph = m % 5 == 1))
              case 1 => // REAL JP2-box-wrapped codestream; dict dims LIE
                val (iw, ih) = jp2Dims(m)
                imgXObject(iw - 1, ih - 1, "DeviceGray", 8, "JPXDecode", "",
                  Jpx.wrapJp2(Jpx.encode(jpxRaster(m + 3, iw, ih)), iw, ih))
              case 2 => jpxStub(m)
              case 3 => // QUANTIZED 9/7 — the dominant wild archival
                // form; dict dims LIE, geometry + banded ink are
                // recoverable only by a true dequantize + 9/7 synthesis
                val (iw, ih) = i97Dims(m)
                imgXObject(iw - 1, ih - 1, "DeviceGray", 8, "JPXDecode", "",
                  Jpx.encodeIrreversible(Seq(jpxRaster(m + 7, iw, ih)),
                    step = I97Step))
              case 4 => // SUBSAMPLED 4:2:0 YCbCr — the wild archival
                // color-scan form: full-res Y, half-res Cb/Cr on their
                // own band/code-block grids, MCT off (T.800 G.2
                // requires identically-sized components). Lossless 5/3,
                // so geometry AND the exact replicated ink sum are
                // recoverable only by a per-component-geometry decode;
                // dict dims LIE as in the other real forms. Odd seeds
                // JP2-wrap the codestream.
                val (iw, ih) = y420Dims(m)
                val cs = Jpx.encodeMulti(Seq(
                  jpxRaster(m + 11, iw, ih),
                  jpxRaster(m + 13, iw / 2, ih / 2),
                  jpxRaster(m + 17, iw / 2, ih / 2)), levels = 2,
                  sub = Seq((1, 1), (2, 2), (2, 2)))
                imgXObject(iw - 1, ih - 1, "DeviceRGB", 8, "JPXDecode", "",
                  if (m % 2 == 1) Jpx.wrapJp2(cs, iw, ih, 3) else cs)
              case _ => // SUBSAMPLED 4:1:1 YCbCr (r11: factor 4) — the
                // DV-lineage chroma layout: quarter-width full-height
                // Cb/Cr, each chroma sample replicating across 4
                // reference columns. Lossless 5/3, exact replicated ink
                // sum, dict dims LIE; every third seed JP2-wraps.
                val (iw, ih) = y411Dims(m)
                val cs = Jpx.encodeMulti(Seq(
                  jpxRaster(m + 19, iw, ih),
                  jpxRaster(m + 23, iw / 4, ih),
                  jpxRaster(m + 29, iw / 4, ih)), levels = 2,
                  sub = Seq((1, 1), (4, 1), (4, 1)))
                imgXObject(iw - 1, ih - 1, "DeviceRGB", 8, "JPXDecode", "",
                  if (m % 3 == 0) Jpx.wrapJp2(cs, iw, ih, 3) else cs)
            }
          } else if (jbig2TextSeed.isDefined) {
            val m = jbig2TextSeed.get
            (i % 4) match {
              case 0 => // symbol-coded JBIG2 document; dict dims LIE.
                // Odd seeds ship the REFINEMENT organization: the base
                // dictionary's glyphs carry a SPARSER pixel rule, a
                // second SDREFAGG dictionary refines them to the true
                // rule, and every third instance references a sparse
                // glyph refined inline (REFINE) — the pinned ink is
                // the true rule either way, but only a full §6.5.8.2 +
                // §6.4.11 decode reaches it
                val (iw, ih) = jb2TextDims(m)
                val n = jb2NumSyms(m)
                val payload =
                  if (m % 2 == 1) {
                    val base = (0 until n).map(jb2GlyphSparse).toIndexedSeq
                    val truth = (0 until n).map(jb2Glyph).toIndexedSeq
                    val variants = (0 until n).map(k =>
                      (truth(k), k, 0, 0)).toIndexedSeq
                    val insts0 = jb2TextInstances(m).zipWithIndex.map {
                      case (inst, j) =>
                        if (j % 3 == 2)
                          inst.copy(refine = Some((truth(inst.id), 0, 0)))
                        else inst.copy(id = n + inst.id)
                    }
                    if (m % 6 == 5) {
                      // one seed in three of the refinement family also
                      // exercises the REFAGGNINST > 1 AGGREGATE: the
                      // first two instances merge into a LIGATURE
                      // symbol composed inside the dictionary from the
                      // same true glyphs at the same relative offsets —
                      // page ink is unchanged, but reaching it requires
                      // the nested-text-region decode of 6.5.8.2.1
                      val k0 = jb2TextInstances(m)(0).id
                      val k1 = jb2TextInstances(m)(1).id
                      val lw = 11 + truth(k1)(0).length
                      val lh = 8 // padded: keeps newSyms height-sorted
                      val lig = Array.ofDim[Boolean](lh, lw)
                      for (y <- truth(k0).indices;
                          x <- truth(k0)(y).indices
                          if truth(k0)(y)(x)) lig(y)(x) = true
                      for (y <- truth(k1).indices;
                          x <- truth(k1)(y).indices
                          if truth(k1)(y)(x)) lig(1 + y)(11 + x) = true
                      val aggInsts = Seq(
                        Jbig2.TextInstance(n + k0, 0, 0),
                        Jbig2.TextInstance(n + k1, 11, 1))
                      val pageInsts =
                        Jbig2.TextInstance(2 * n, 0, 3) +: insts0.drop(2)
                      Jbig2.encodeTextDocument(iw, ih, base, pageInsts,
                        refAggVariants = variants :+ ((lig, 0, 0, 0)),
                        refAggAggregates = Map(n -> aggInsts))
                    } else
                      Jbig2.encodeTextDocument(iw, ih, base, insts0,
                        refAggVariants = variants)
                  } else Jbig2.encodeTextDocument(iw, ih,
                    (0 until n).map(jb2Glyph), jb2TextInstances(m))
                imgXObject(iw - 1, ih - 1, "DeviceGray", 1, "JBIG2Decode",
                  "", payload)
              case 1 => jbig2Stub(m)
              case 2 => jpxStub(m)
              case _ => // FULLY-HUFFMAN symbol-coded doc (SDHUFF
                // dictionary + SBHUFF text region with custom type-53
                // code tables): the fax-lineage producer organization;
                // collective bitmaps alternate uncompressed / MMR by
                // seed, and the shifted seed keeps its ink distinct
                val mh = (m + 7) % 30
                val (iw, ih) = jb2TextDims(mh)
                imgXObject(iw - 1, ih - 1, "DeviceGray", 1, "JBIG2Decode",
                  "", Jbig2.encodeTextDocument(iw, ih,
                    (0 until jb2NumSyms(mh)).map(jb2Glyph),
                    jb2TextInstances(mh),
                    huffDict = true, dictMmr = m % 2 == 0,
                    huffText = true,
                    // every third seed: the dictionary's DH/DW ride as
                    // referred CUSTOM type-53 tables (selection 3)
                    customDictTables = m % 3 == 0))
            }
          } else if (jbig2Seed.isDefined) {
            val m = jbig2Seed.get
            (i % 3) match {
              case 0 => // REAL JBIG2; dict dims LIE — truth is in the
                // data. Every third seed ships as base + GENERIC
                // REFINEMENT region (T.88 §6.3): the base carries an
                // INVERTED rect and the refinement REPLACES it with the
                // true content, so the pinned ink is recoverable only
                // by a real refinement decode (OR-compositing or
                // ignoring the refinement both get the ink wrong)
                val (iw, ih) = jb2Dims(m)
                val rows = jb2Raster(m)
                val payload =
                  if (m % 3 == 2) {
                    val rx = iw / 4; val ry = ih / 4
                    val rw = math.max(1, iw / 3)
                    val rh = math.max(1, ih / 3)
                    val base = rows.zipWithIndex.map { case (r, y) =>
                      Array.tabulate(iw)(x =>
                        if (x >= rx && x < rx + rw && y >= ry &&
                            y < ry + rh) !r(x)
                        else r(x))
                    }
                    val refined = (0 until rh).map(y =>
                      Array.tabulate(rw)(x => rows(ry + y)(rx + x)))
                    Jbig2.encodeRefinedDocument(base, iw, rx, ry, refined,
                      template = (m / 3) % 2, tpgron = m % 2 == 0)
                  } else Jbig2.encodeEmbedded(rows, iw)
                imgXObject(iw - 1, ih - 1, "DeviceGray", 1, "JBIG2Decode",
                  "", payload)
              case 1 => jbig2Stub(m)
              case _ => jpxStub(m)
            }
          } else if (scanSeed.isDefined) {
            val m = scanSeed.get
            (i % 3) match {
              case 0 => // CCITT G4; dict dims LIE, /DecodeParms has no /Rows
                val (iw, ih) = g4Dims(m)
                imgXObject(iw - 1, ih - 1, "DeviceGray", 1, "CCITTFaxDecode",
                  s"/DecodeParms << /K -1 /Columns $iw /BlackIs1 true >> ",
                  CcittG4.encode(g4Raster(m), iw))
              case 1 => jbig2Stub(m)
              case _ => jpxStub(m)
            }
          } else if (jpegImages) {
            val (iw, ih) = jpegDims(i)
            val jpeg = graft.media.ImageCodec.syntheticJpeg(iw, ih, i.toLong)
            // dict dims off by one ON PURPOSE: only a pixel decode can
            // label the image correctly (see buildJpeg doc)
            val payload = maybeEnc(o, jpeg)
            w(s"<< /Type /XObject /Subtype /Image /Width ${iw - 1} " +
              s"/Height ${ih - 1} /ColorSpace /DeviceRGB /BitsPerComponent 8 " +
              s"/Filter /DCTDecode /Length ${payload.length} >>\nstream\n")
            out.write(payload)
            w("\nendstream")
          } else {
            val payload = maybeEnc(o, Array[Byte](0, 85, -86, -1))
            w("<< /Type /XObject /Subtype /Image /Width 2 /Height 2 " +
              "/ColorSpace /DeviceGray /BitsPerComponent 8 " +
              s"/Length ${payload.length} >>\nstream\n")
            out.write(payload)
            w("\nendstream")
          }
        }
      }
    }

    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
    encObj.foreach { e =>
      val body =
        if (encV5) {
          val (u, ue, o, oe, perms) = encV5Set.get
          s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P $encP " +
            s"/O <${hex(o)}> /U <${hex(u)}> " +
            s"/OE <${hex(oe)}> /UE <${hex(ue)}> /Perms <${hex(perms)}> " +
            "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
            "/StmF /StdCF /StrF /StdCF >>"
        } else if (encAes)
          s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $encP " +
            s"/O <${hex(encO.get)}> /U <${hex(encU.get)}> " +
            "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
            "/StmF /StdCF /StrF /StdCF >>"
        else
          s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $encP " +
            s"/O <${hex(encO.get)}> /U <${hex(encU.get)}> >>"
      defObj(e)(w(body))
    }

    val xrefAt = out.size()
    val n = nextObj
    w(s"xref\n0 $n\n0000000000 65535 f \n")
    (1 until n).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    val encTrailer = encObj.map(e =>
      s" /Encrypt $e 0 R /ID [<${hex(encId0)}> <${hex(encId0)}>]")
      .getOrElse("")
    w(s"trailer\n<< /Size $n /Root 1 0 R$encTrailer >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** The /ToUnicode CMap text for a cid→codepoint alphabet: maximal
    * consecutive (cid, codepoint) runs as bfrange entries — kept inside
    * one cid high byte and BMP-only, per the spec's last-byte increment
    * rule — everything else (including surrogate-pair destinations) as
    * bfchar, both chunked to ≤100 entries per section.
    */
  private def toUnicodeCMap(cidOf: Map[Int, Int]): String = {
    val byCid = cidOf.toSeq.map { case (cp, c) => (c, cp) }.sorted
    def hex4(v: Int): String = f"<$v%04X>"
    def dstHex(cp: Int): String =
      Character.toChars(cp).map(u => f"${u.toInt}%04X").mkString("<", "", ">")

    // split into maximal runs where cid and codepoint advance together
    val runs = new ArrayBuffer[(Int, Int, Int)] // cidLo, cidHi, cpLo
    byCid.foreach { case (c, cp) =>
      runs.lastOption match {
        case Some((lo, hi, cpLo))
            if c == hi + 1 && cp == cpLo + (c - lo) &&
              (c & 0xff00) == (lo & 0xff00) && cpLo < 0x10000 && cp <= 0xfffe &&
              // §9.10.3's increment is the dst's LAST BYTE: a strict reader
              // wraps a run whose destination crosses a 256-block, so runs
              // stay within one dst block too
              (cp >> 8) == (cpLo >> 8) =>
          runs(runs.length - 1) = (lo, c, cpLo)
        case _ => runs += ((c, c, cp))
      }
    }
    val (ranges, chars) = runs.partition { case (lo, hi, _) => hi > lo }

    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n")
    sb.append("12 dict begin\nbegincmap\n")
    sb.append("/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def\n")
    sb.append("/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n")
    sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
    chars.map { case (c, _, cp) => s"${hex4(c)} ${dstHex(cp)}" }
      .grouped(100).foreach { chunk =>
        sb.append(s"${chunk.length} beginbfchar\n")
        chunk.foreach(l => sb.append(l).append('\n'))
        sb.append("endbfchar\n")
      }
    ranges.map { case (lo, hi, cpLo) => s"${hex4(lo)} ${hex4(hi)} ${dstHex(cpLo)}" }
      .grouped(100).foreach { chunk =>
        sb.append(s"${chunk.length} beginbfrange\n")
        chunk.foreach(l => sb.append(l).append('\n'))
        sb.append("endbfrange\n")
      }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    sb.toString
  }
}

/** The real [[PdfExtractor]]: parses actual PDF bytes (any producer, not
  * just [[PdfWriter]]) into the layout blocks [[PdfSource]] consumes.
  * Non-PDF or unparseable input yields no blocks — the reference returns
  * `[]` on open failure (pymupdf_parser.py:199-202) and the S5 policy
  * then treats the document as empty.
  */
object RealPdfExtractor extends PdfExtractor {
  import PdfCodec._

  /** Vertical gap factor: a line gap > BlockGapFactor × max(leading, size)
    * starts a new block — the PyMuPDF block segmentation heuristic. */
  val BlockGapFactor = 1.5

  private final case class Obj(value: PVal, stream: Option[Array[Byte]])

  def extract(path: String, bytes: Array[Byte]): Seq[PdfBlock] = {
    if (!hasHeader(bytes)) return Nil
    try {
      val (raw, trailer) = scanObjects(bytes)
      // order matters: decrypt raw object streams/strings FIRST (the
      // whole container stream is what the handler encrypted), THEN
      // expand /ObjStm members out of the now-plaintext containers
      val objs = expandObjectStreams(decryptObjects(raw, trailer))
      val pages = orderedPages(objs)
      // image decodes memoized per DOCUMENT by object number: pages that
      // inherit shared /Resources (or reuse one image object) must not
      // re-decode the same /DCTDecode stream once per page
      val decodeCache = mutable.Map.empty[Int, Option[graft.media.ImageCodec.Decoded]]
      val g4Cache = mutable.Map.empty[Int, Option[CcittG4.Decoded]]
      val jbig2Cache = mutable.Map.empty[Int, Option[Jbig2.Decoded]]
      val jpxCache = mutable.Map.empty[Int, Option[Jpx.Decoded]]
      pages.zipWithIndex.flatMap { case ((pageDict, inheritedRes), pageNum) =>
        try pageBlocks(objs, pageDict, inheritedRes, pageNum, decodeCache,
          g4Cache, jbig2Cache, jpxCache)
        catch { case _: Exception => Nil } // one bad page never kills the doc
      }
    } catch { case _: Exception => Nil }
  }

  private def hasHeader(bytes: Array[Byte]): Boolean = {
    val probe = new String(bytes, 0, math.min(bytes.length, 1024), ISO_8859_1)
    probe.contains("%PDF-")
  }

  // ---------------- document scan ----------------

  /** Linear scan for `N G obj … endobj`, no xref needed (robust against
    * the broken offsets real-world PDFs routinely have). Streams are cut
    * by /Length when it is a direct number, else by searching for the
    * `endstream` keyword (covers indirect /Length without a second pass).
    */
  private def scanObjects(bytes: Array[Byte])
      : (Map[Int, Obj], Map[String, PVal]) = {
    val lex = new Lex(bytes)
    val objs = mutable.Map[Int, Obj]()
    // incremental updates append: later trailers are newer, so merge
    // with later-wins (body-scan analog of following /Prev backwards)
    var trailer = Map.empty[String, PVal]
    var done = false
    while (!done) {
      lex.skipWs()
      if (lex.eof) done = true
      else {
        val save = lex.p
        lex.next() match {
          case PNum(numD) if numD >= 0 && numD == numD.floor =>
            val save2 = lex.p
            (lex.next(), lex.next()) match {
              case (PNum(_), PKw("obj")) =>
                val value = lex.nextResolvingRefs()
                lex.skipWs()
                val stream =
                  if (startsWith(bytes, lex.p, "stream")) {
                    lex.p += "stream".length
                    if (lex.p < bytes.length && bytes(lex.p) == '\r') lex.p += 1
                    if (lex.p < bytes.length && bytes(lex.p) == '\n') lex.p += 1
                    val dataStart = lex.p
                    val len = value match {
                      case PDict(d) => d.get("Length") match {
                        case Some(PNum(n)) => n.toInt
                        case _ => -1
                      }
                      case _ => -1
                    }
                    val dataEnd =
                      if (len >= 0 && dataStart + len <= bytes.length &&
                          endstreamAt(bytes, dataStart + len)) dataStart + len
                      else { // indirect/broken Length: search
                        lex.p = dataStart
                        val at = lex.seek("endstream")
                        if (at < 0) bytes.length else trimEol(bytes, dataStart, at)
                      }
                    lex.p = dataEnd
                    lex.seek("endstream") // position just past the keyword
                    Some(java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd))
                  } else None
                // consume up to endobj (tolerate junk)
                lex.seek("endobj")
                objs(numD.toInt) = Obj(value, stream)
                // a cross-reference STREAM's dict (PDF 1.5+ — the normal
                // layout for any file that also packs /ObjStm) is the
                // trailer: /Root /Encrypt /ID live here, and there is no
                // `trailer` keyword to find. Merge in file order, later
                // (newer incremental section) wins — same rule as below.
                value match {
                  case PDict(d) if d.get("Type").contains(PName("XRef")) =>
                    trailer = trailer ++ d
                  case _ => ()
                }
              case _ =>
                lex.p = save2 // not an object header; resync
                resync(lex, save)
            }
          case PKw("xref") =>
            // classic xref table: skip to the trailer dict (seek consumes
            // the keyword, so parse the dict here) or to startxref
            if (lex.seek("trailer") >= 0) {
              lex.nextResolvingRefs() match {
                case PDict(d) => trailer = trailer ++ d
                case _ => ()
              }
            } else { lex.seek("startxref"); () }
          case PKw("trailer") =>
            lex.nextResolvingRefs() match {
              case PDict(d) => trailer = trailer ++ d
              case _ => ()
            }
          case PKw("startxref") => lex.next(); ()
          case null => done = true
          case _ => resync(lex, save)
        }
      }
    }
    (objs.toMap, trailer)
  }

  // ---------------- decryption (standard security handler) ----------------

  private def mapStrings(v: PVal, f: Array[Byte] => Array[Byte]): PVal =
    v match {
      case PStr(b) => PStr(f(b))
      case PArr(a) => PArr(a.map(mapStrings(_, f)))
      case PDict(d) => PDict(d.map { case (k, x) => k -> mapStrings(x, f) })
      case other => other
    }

  /** Decrypt every object's stream and string bytes when the trailer
    * names a /Standard /Encrypt dict the EMPTY user password opens
    * (PDF 32000 §7.6.3 — the owner-restricted corpus shape; the
    * reference opens these transparently via PyMuPDF's empty-password
    * authenticate). Unsupported handlers, failed authentication, or a
    * missing /ID leave the objects untouched: the extractor then
    * degrades to no/garbage text exactly as a viewer that cannot
    * authenticate, never throws. Generation numbers are taken as 0 (the
    * body scan's object-identity model; real-world non-zero generations
    * are vanishingly rare and only weaken to a wrong key, i.e. the same
    * degradation).
    */
  private def decryptObjects(objs: Map[Int, Obj],
      trailer: Map[String, PVal]): Map[Int, Obj] = {
    val encRef = trailer.getOrElse("Encrypt", PNull)
    if (encRef == PNull) return objs
    val encNum = encRef match { case PRef(n) => n; case _ => -1 }
    val enc = dictOf(deref(objs, encRef))
    if (!enc.get("Filter").contains(PName("Standard"))) return objs
    def num(k: String, dflt: Int): Int = enc.get(k) match {
      case Some(PNum(x)) => x.toLong.toInt // /P is a signed 32-bit value
      case _ => dflt
    }
    def strBytes(k: String): Array[Byte] = enc.get(k) match {
      case Some(PStr(b)) => b
      case _ => Array.emptyByteArray
    }
    val v = num("V", 0)
    val r = num("R", 2)
    val p = num("P", -1)
    val o = strBytes("O")
    val u = strBytes("U")
    val encMeta = enc.get("EncryptMetadata") match {
      case Some(PBool(b)) => b
      case _ => true
    }
    val id0 = deref(objs, trailer.getOrElse("ID", PNull)) match {
      case PArr(a) => a.headOption match {
        case Some(PStr(b)) => b
        case _ => Array.emptyByteArray
      }
      case _ => Array.emptyByteArray
    }
    def stdCfm: Option[PVal] = {
      val cf = dictOf(deref(objs, enc.getOrElse("CF", PNull)))
      val stdcf = dictOf(deref(objs, cf.getOrElse("StdCF", PNull)))
      stdcf.get("CFM")
    }
    // (fileKey, aes, derive): `derive` = per-object MD5 key (Algorithm 1,
    // the legacy handlers); V5 encrypts every object under the FILE key
    val keyInfo: Option[(Array[Byte], Boolean, Boolean)] = v match {
      case 1 | 2 | 4 =>
        val cipher: Option[(Boolean, Int)] = v match {
          case 1 => Some((false, 5))
          case 2 => Some((false, math.max(num("Length", 40) / 8, 5)))
          case _ => stdCfm match {
            case Some(PName("AESV2")) => Some((true, 16))
            case Some(PName("V2")) =>
              Some((false, math.max(num("Length", 40) / 8, 5)))
            case _ => None // /Identity or an unknown crypt filter
          }
        }
        cipher.collect {
          case (aes, n) if o.length >= 32 &&
              PdfCrypt.emptyPasswordWorks(o, u, p, id0, n, r, encMeta) =>
            (PdfCrypt.fileKey(Array.emptyByteArray, o, p, id0, n, r,
              encMeta), aes, true)
        }
      case 5 if stdCfm.forall(_ == PName("AESV3")) =>
        // AES-256 (/R 5 plain-SHA-256 or /R 6 hardened hash): validate
        // the empty password against /U, unwrap the file key from /UE
        val ue = strBytes("UE")
        if (ue.length >= 32 && PdfCrypt.v5EmptyPasswordWorks(u, r))
          try Some((PdfCrypt.v5FileKey(u, ue, r), true, false))
          catch { case _: java.security.GeneralSecurityException => None }
        else None
      case _ => None
    }
    keyInfo match {
      case Some((key, aes, derive)) =>
        objs.map { case (objNum, obj) =>
          // never touch the Encrypt dict itself, nor cross-reference
          // streams (§7.5.8.2: the xref stream shall not be encrypted —
          // a reader must parse it before it can decrypt anything)
          val isXref = obj.value match {
            case PDict(d) => d.get("Type").contains(PName("XRef"))
            case _ => false
          }
          if (objNum == encNum || isXref) objNum -> obj
          else {
            val ok =
              if (derive) PdfCrypt.objectKey(key, objNum, 0, aes) else key
            objNum -> Obj(
              mapStrings(obj.value, PdfCrypt.decrypt(ok, _, aes)),
              obj.stream.map(PdfCrypt.decrypt(ok, _, aes)))
          }
        }
      case _ => objs
    }
  }

  /** PDF 1.5+ object streams (§7.5.7): modern producers pack non-stream
    * objects (page dicts, fonts, the catalog) FlateDecode'd inside
    * /Type /ObjStm containers, invisible to the raw `N 0 obj` scan. The
    * decompressed layout is `/N` pairs of `objnum offset` ints, then
    * each object's bare value starting at `/First + offset` — no
    * obj/endobj wrappers and never a nested stream, so one [[Lex]] pass
    * per member suffices. Members do NOT override same-numbered
    * top-level objects (an incremental update appending a replacement
    * object outranks the packed original it shadows). Malformed
    * containers are skipped whole — same fuzz posture as the body scan.
    */
  private def expandObjectStreams(objs: Map[Int, Obj]): Map[Int, Obj] = {
    val packed = objs.collect {
      case (_, o @ Obj(PDict(d), Some(_)))
          if d.get("Type").contains(PName("ObjStm")) =>
        try {
          // we hold the object itself (not a ref): apply the filter
          // chain directly rather than via decodedStream
          val body = applyFilters(objs, d, o.stream.get)
          val n = d.get("N") match { case Some(PNum(v)) => v.toInt; case _ => 0 }
          val first = d.get("First") match {
            case Some(PNum(v)) => v.toInt
            case _ => -1
          }
          if (n <= 0 || n > 100000 || first < 0 || first > body.length) Nil
          else {
            val head = new Lex(java.util.Arrays.copyOfRange(body, 0, first))
            val pairs = (0 until n).flatMap { _ =>
              (head.next(), head.next()) match {
                case (PNum(num), PNum(off))
                    if num >= 0 && off >= 0 && first + off < body.length =>
                  Some((num.toInt, first + off.toInt))
                case _ => None
              }
            }
            pairs.flatMap { case (num, at) =>
              try {
                val l = new Lex(body)
                l.p = at
                Option(l.nextResolvingRefs()).map(v => num -> Obj(v, None))
              } catch { case _: Exception => None }
            }
          }
        } catch { case _: Exception => Nil }
    }.flatten.toMap
    // top-level objects win over packed members of the same number
    packed ++ objs
  }

  private def resync(lex: Lex, from: Int): Unit = {
    // advance at least one byte past the failed parse position
    lex.p = math.max(lex.p, from + 1)
  }

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > b.length) return false
    var i = 0
    while (i < s.length) { if (b(at + i) != s.charAt(i)) return false; i += 1 }
    true
  }

  private def endstreamAt(b: Array[Byte], at: Int): Boolean = {
    var i = at
    while (i < b.length && (b(i) == '\r' || b(i) == '\n' || b(i) == ' ')) i += 1
    startsWith(b, i, "endstream")
  }

  private def trimEol(b: Array[Byte], start: Int, end: Int): Int = {
    var e = end
    while (e > start && (b(e - 1) == '\n' || b(e - 1) == '\r')) e -= 1
    e
  }

  // ---------------- page tree ----------------

  private def deref(objs: Map[Int, Obj], v: PVal): PVal = v match {
    case PRef(n) => objs.get(n).map(_.value).getOrElse(PNull)
    case other => other
  }

  private def dictOf(v: PVal): Map[String, PVal] = v match {
    case PDict(d) => d
    case _ => Map.empty
  }

  /** Catalog → /Pages → /Kids traversal, carrying inherited /Resources
    * down the tree (PDF attribute inheritance); falls back to file-order
    * Page objects when the tree is broken.
    */
  private def orderedPages(objs: Map[Int, Obj])
      : Seq[(Map[String, PVal], Map[String, PVal])] = {
    val catalog = objs.values.map(_.value).collectFirst {
      case PDict(d) if d.get("Type").contains(PName("Catalog")) => d
    }
    val fromTree = catalog.toSeq.flatMap { cat =>
      def walk(node: PVal, inheritedRes: Map[String, PVal])
          : Seq[(Map[String, PVal], Map[String, PVal])] = {
        val d = dictOf(deref(objs, node))
        val res = d.get("Resources").map(r => dictOf(deref(objs, r)))
          .getOrElse(inheritedRes)
        d.get("Type") match {
          case Some(PName("Page")) => Seq((d, res))
          case _ => deref(objs, d.getOrElse("Kids", PNull)) match {
            case PArr(kids) => kids.flatMap(walk(_, res))
            case _ => Nil
          }
        }
      }
      cat.get("Pages").toSeq.flatMap(walk(_, Map.empty))
    }
    if (fromTree.nonEmpty) fromTree
    else objs.toSeq.sortBy(_._1).map(_._2.value).collect {
      case PDict(d) if d.get("Type").contains(PName("Page")) =>
        (d, d.get("Resources").map(r => dictOf(deref(objs, r))).getOrElse(Map.empty))
    }
  }

  // ---------------- content interpretation ----------------

  /** Apply a stream dict's whole /Filter chain (with per-filter
    * /DecodeParms — a single dict or an array aligned with the filter
    * array) to raw stream bytes. Supported: FlateDecode and LZWDecode
    * (both with PNG/TIFF predictors), ASCIIHex/ASCII85/RunLength (the
    * classic transfer encodings; abbreviated inline-image names
    * accepted). DCTDecode stays raw here — the image sites decode pixels
    * themselves — and unknown filters pass through (text ops then no-op,
    * the documented degradation).
    */
  private[sources] def applyFilters(objs: Map[Int, Obj],
      d: Map[String, PVal], raw: Array[Byte]): Array[Byte] = {
    val filters = deref(objs, d.getOrElse("Filter", PNull)) match {
      case PName(f) => Seq(f)
      case PArr(fs) => fs.map(deref(objs, _)).collect { case PName(f) => f }
      case _ => Nil
    }
    val parms: Seq[Map[String, PVal]] =
      deref(objs, d.getOrElse("DecodeParms", d.getOrElse("DP", PNull))) match {
        case PDict(p) => Seq(p)
        case PArr(ps) => ps.map(x => dictOf(deref(objs, x)))
        case _ => Nil
      }
    filters.zipWithIndex.foldLeft(raw) { case (data, (f, idx)) =>
      val pm = parms.lift(idx).getOrElse(Map.empty)
      def num(k: String, dflt: Int): Int = deref(objs, pm.getOrElse(k, PNull)) match {
        case PNum(v) => v.toInt
        case _ => dflt
      }
      val decoded = f match {
        case "FlateDecode" | "Fl" => inflate(data)
        case "LZWDecode" | "LZW" => lzwDecode(data, num("EarlyChange", 1) == 1)
        case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
        case "ASCII85Decode" | "A85" => ascii85Decode(data)
        case "RunLengthDecode" | "RL" => runLengthDecode(data)
        case _ => data
      }
      f match {
        case "FlateDecode" | "Fl" | "LZWDecode" | "LZW" =>
          undoPredictor(decoded, num("Predictor", 1), num("Colors", 1),
            num("BitsPerComponent", 8), num("Columns", 1))
        case _ => decoded
      }
    }
  }

  private def decodedStream(objs: Map[Int, Obj], ref: PVal): Array[Byte] =
    deref2(objs, ref) match {
      case (PDict(d), Some(raw)) => applyFilters(objs, d, raw)
      case _ => Array.emptyByteArray
    }

  private def deref2(objs: Map[Int, Obj], v: PVal): (PVal, Option[Array[Byte]]) =
    v match {
      case PRef(n) =>
        objs.get(n).map(o => (o.value, o.stream)).getOrElse((PNull, None))
      case other => (other, None)
    }

  private final case class Line(y: Double, size: Double, leading: Double,
      x: Double, text: String)
  /** Image XObject block-content label: decoded "WxH jpeg cN" for
    * DCTDecode payloads, dict-dims "WxH" otherwise. */
  private final case class ImgInfo(label: String)
  private sealed trait Event
  private final case class TextLine(l: Line) extends Event
  private final case class ImageDraw(name: String, info: ImgInfo,
      bbox: (Double, Double, Double, Double)) extends Event

  private def pageBlocks(objs: Map[Int, Obj], page: Map[String, PVal],
      resources: Map[String, PVal], pageNum: Int,
      decodeCache: mutable.Map[Int, Option[graft.media.ImageCodec.Decoded]],
      g4Cache: mutable.Map[Int, Option[CcittG4.Decoded]],
      jbig2Cache: mutable.Map[Int, Option[Jbig2.Decoded]],
      jpxCache: mutable.Map[Int, Option[Jpx.Decoded]])
      : Seq[PdfBlock] = {
    val content = deref(objs, page.getOrElse("Contents", PNull)) match {
      case PArr(parts) =>
        // page Contents may be split across streams; they concatenate
        val bufs = page.get("Contents").toSeq.flatMap { c =>
          deref(objs, c) match {
            case PArr(_) => parts
            case _ => Nil
          }
        }
        val out = new ByteArrayOutputStream
        bufs.foreach { part => out.write(decodedStream(objs, part)); out.write('\n') }
        out.toByteArray
      case _ => decodedStream(objs, page.getOrElse("Contents", PNull))
    }
    if (content.isEmpty) return Nil

    val res = page.get("Resources").map(r => dictOf(deref(objs, r)))
      .getOrElse(resources)

    val xobjects: Map[String, ImgInfo] =
      dictOf(deref(objs, res.getOrElse("XObject", PNull))).flatMap {
        case (name, ref) =>
          val (v, stream) = deref2(objs, ref)
          val d = dictOf(v)
          if (d.get("Subtype").contains(PName("Image"))) {
            def dim(k: String) = d.get(k) match {
              case Some(PNum(n)) => n.toInt
              case _ => 0
            }
            val filters = d.get("Filter") match {
              case Some(PName(f)) => Seq(f)
              case Some(PArr(fs)) => fs.collect { case PName(f) => f }
              case _ => Nil
            }
            // /DecodeParms may be a single dict OR an array aligned with
            // an array /Filter — take the entry at the given filter's
            // index (the applyFilters convention)
            def parmsAt(fIdx: Int): Map[String, PVal] = {
              val seq: Seq[Map[String, PVal]] =
                deref(objs, d.getOrElse("DecodeParms",
                    d.getOrElse("DP", PNull))) match {
                  case PDict(p) => Seq(p)
                  case PArr(ps) => ps.map(x => dictOf(deref(objs, x)))
                  case _ => Nil
                }
              seq.lift(fIdx).getOrElse(Map.empty)
            }
            // /DCTDecode payload IS a bare JPEG stream: decode the real
            // raster (reference sees rendered pixels via PyMuPDF,
            // pymupdf_parser.py:675-759). Decoded dims override the dict's
            // claim (the pixels are the truth a Vision-OCR call would see);
            // failure degrades to the dict-dims label, never throws.
            // Decode memoized by object number across the document's pages.
            // All three scanned-corpus compressions decode for real:
            // CCITT G4 ([[CcittG4]]: width = /Columns, height/ink from
            // the DATA), JBIG2 generic regions ([[Jbig2]]: both dims AND
            // ink from the segment data), and JPEG 2000 ([[Jpx]]: dims
            // from SIZ, gray-sum from the wavelet decode). Streams
            // outside each codec's subset are labeled `undecoded` with
            // dict dims — an honest feature for the would_ocr policy,
            // never a guess at pixels.
            val label =
              if (filters.contains("DCTDecode")) {
                val dec = ref match {
                  case PRef(num) => decodeCache.getOrElseUpdate(num,
                    stream.flatMap(graft.media.ImageCodec.decode))
                  case _ => stream.flatMap(graft.media.ImageCodec.decode)
                }
                dec.map(d => s"${d.width}x${d.height} jpeg c${d.channels}")
                  .getOrElse(s"${dim("Width")}x${dim("Height")}")
              } else if (filters.contains("CCITTFaxDecode") ||
                  filters.contains("CCF")) {
                val pm = parmsAt(filters.indexWhere(f =>
                  f == "CCITTFaxDecode" || f == "CCF"))
                def pnum(k: String, dflt: Int): Int =
                  deref(objs, pm.getOrElse(k, PNull)) match {
                    case PNum(v) => v.toInt
                    case _ => dflt
                  }
                def decodeG4(): Option[CcittG4.Decoded] =
                  if (pnum("K", 0) >= 0) None // 1D/mixed T.4: dict dims
                  else stream.flatMap { b =>
                    // total-pixel budget mirroring the JPXDecode cap: an
                    // all-uniform G4 row costs ~2 bits of input, so the
                    // default 65536-row ceiling alone would let a few KB
                    // of hostile stream materialize ~4 GiB of rows.
                    // cols <= 0 (malformed /Columns) must degrade to the
                    // dict-dims label, not divide-by-zero the whole page
                    val cols = pnum("Columns", 1728)
                    if (cols <= 0) None
                    else CcittG4.decode(b, cols,
                      maxRows = math.max(1, ((1L << 25) / cols).toInt))
                  }
                val dec = ref match {
                  case PRef(num) => g4Cache.getOrElseUpdate(num, decodeG4())
                  case _ => decodeG4()
                }
                dec.map(g => s"${g.columns}x${g.height} g4 b${g.blackCount}")
                  .getOrElse(s"${dim("Width")}x${dim("Height")}")
              } else if (filters.contains("JBIG2Decode")) {
                // the embedded segment stream may lean on a shared
                // /JBIG2Globals stream (symbol dictionaries); prepend it
                // so region segments that DO self-contain still decode.
                // A generic-region stream decodes fully ([[Jbig2]]); a
                // symbol/text-region stream parses at the segment level
                // and degrades to the honest `undecoded` dict-dims label.
                val globals = parmsAt(filters.indexOf("JBIG2Decode"))
                  .get("JBIG2Globals")
                  .map(g => decodedStream(objs, g))
                  .filter(_.nonEmpty)
                def decodeJb(): Option[Jbig2.Decoded] =
                  stream.flatMap(b => Jbig2.decode(b, globals))
                val dec = ref match {
                  case PRef(num) => jbig2Cache.getOrElseUpdate(num, decodeJb())
                  case _ => decodeJb()
                }
                dec.map(j => s"${j.width}x${j.height} jbig2 b${j.blackCount}")
                  .getOrElse(s"${dim("Width")}x${dim("Height")} jbig2 undecoded")
              } else if (filters.contains("JPXDecode")) {
                // raw codestream or JP2 boxes; grayscale reversible-5/3
                // streams decode fully ([[Jpx]]), anything outside the
                // subset degrades to the honest `undecoded` dict label
                // 1<<25 px (≈ A4 at 600 dpi) caps what a hostile SIZ
                // header can make one image object allocate
                def decodeJpx(): Option[Jpx.Decoded] =
                  stream.flatMap(b => Jpx.decode(b, maxPixels = 1L << 25))
                val dec = ref match {
                  case PRef(num) => jpxCache.getOrElseUpdate(num, decodeJpx())
                  case _ => decodeJpx()
                }
                dec.map { j =>
                  val ch = if (j.channels == 1) "" else s" c${j.channels}"
                  s"${j.width}x${j.height} jpx$ch s${j.graySum}"
                }.getOrElse(
                  s"${dim("Width")}x${dim("Height")} jpx undecoded")
              } else s"${dim("Width")}x${dim("Height")}"
            Some(name -> ImgInfo(label))
          } else None
      }

    val fonts: Map[String, FontDec] =
      dictOf(deref(objs, res.getOrElse("Font", PNull))).map {
        case (name, ref) =>
          val (v, _) = deref2(objs, ref)
          val d = dictOf(v)
          val composite = d.get("Subtype").contains(PName("Type0"))
          val (declaredWidth, toUniDeclared) = d.get("ToUnicode")
            .map(r => parseCMap(decodedStream(objs, r)))
            .getOrElse((0, Map.empty[Int, String]))
          // No /ToUnicode on a composite font (subset producers omit it):
          // recover text the way the reference's PyMuPDF does — read the
          // embedded font program's own cmap table and invert it
          // (pymupdf_parser.py:180-271). Under /Identity-H +
          // /CIDToGIDMap /Identity the content-stream code IS the GID, so
          // GID → codepoint decodes exactly. Any failure along the chain
          // (no descendant, no FontFile2, unreadable cmap) leaves the map
          // empty and the documented code-as-char degradation stands.
          val toUni =
            if (!composite || toUniDeclared.nonEmpty) toUniDeclared
            else {
              val fromFontProgram = for {
                desc <- deref(objs, d.getOrElse("DescendantFonts", PNull)) match {
                  case PArr(arr) if arr.nonEmpty => Some(dictOf(deref(objs, arr.head)))
                  case _ => None
                }
                fd <- desc.get("FontDescriptor").map(r => dictOf(deref(objs, r)))
                ff <- fd.get("FontFile2").orElse(fd.get("FontFile3"))
              } yield {
                // /FontFile2 and 'OTTO'-wrapped /FontFile3 carry an sfnt
                // cmap; a BARE CFF under /FontFile3 has no cmap and is
                // introspected through its charset's glyph names instead
                // ([[CffCharset]]). TrueTypeCmap returns empty on non-sfnt
                // bytes, so the chain is a plain fallback.
                val prog = decodedStream(objs, ff)
                val viaSfnt = TrueTypeCmap.gidToText(prog)
                val gidText =
                  if (viaSfnt.nonEmpty) viaSfnt else CffCharset.gidToText(prog)
                // the font program's table is GID-keyed but content codes
                // are CIDs: when /CIDToGIDMap is an embedded STREAM (the
                // other half of real subset fonts — 2 bytes per CID,
                // big-endian GID, §9.7.4.2), compose CID → GID → text;
                // /Identity or absent means CID == GID and the table
                // applies directly
                desc.get("CIDToGIDMap") match {
                  case Some(mref) if deref(objs, mref) != PName("Identity") =>
                    val m = decodedStream(objs, mref)
                    if (m.length < 2) gidText
                    else (0 until m.length / 2).iterator.flatMap { cid =>
                      val gid = ((m(2 * cid) & 0xff) << 8) | (m(2 * cid + 1) & 0xff)
                      gidText.get(gid).map(cid -> _)
                    }.toMap
                  case _ => gidText
                }
              }
              fromFontProgram.getOrElse(Map.empty)
            }
          // simple-font /Encoding << /Differences [...] >> remaps byte
          // codes to named glyphs (the LaTeX producer shape); an embedded
          // ToUnicode is authoritative where both cover a code
          val diffs: Map[Int, String] =
            if (composite) Map.empty
            else deref(objs, d.getOrElse("Encoding", PNull)) match {
              case PDict(enc) => deref(objs, enc.getOrElse("Differences", PNull)) match {
                case PArr(arr) => parseDifferences(arr)
                case _ => Map.empty
              }
              case _ => Map.empty
            }
          // a simple font with an embedded Type1 program (/FontFile) and
          // no ToUnicode carries its encoding INSIDE the program's
          // cleartext — the built-in map fills codes /Differences and
          // /ToUnicode leave unmapped (spec precedence: built-in <
          // Differences < ToUnicode)
          val builtin: Map[Int, String] =
            if (composite) Map.empty
            else (for {
              fd <- d.get("FontDescriptor").map(r => dictOf(deref(objs, r)))
              ff <- fd.get("FontFile")
            } yield parseType1Encoding(decodedStream(objs, ff)))
              .getOrElse(Map.empty)
          // the FONT decides the code width: /Identity-H (and -V)
          // composite codes are always two bytes, whatever codespace the
          // ToUnicode CMap declares — producers routinely write a 1-byte
          // <00> <FF> codespace there (it describes the map keys, not the
          // font; pdf.js/Poppler special-case this the same way)
          val width =
            if (composite) 2 else if (declaredWidth > 0) declaredWidth else 1
          name -> FontDec(width, builtin ++ diffs ++ toUni)
      }

    val events = interpret(content, xobjects, fonts)
    groupBlocks(events, pageNum)
  }

  /** Execute the text-relevant subset of the content-stream operator set.
    * Text position tracking is the text line matrix's translation — enough
    * to reconstruct lines and their vertical rhythm, which is all block
    * segmentation needs. CTM (q/Q/cm) is tracked for image placement.
    */
  private def interpret(content: Array[Byte],
      xobjects: Map[String, ImgInfo],
      fonts: Map[String, FontDec] = Map.empty): Seq[Event] = {
    val lex = new Lex(content)
    val events = new ArrayBuffer[Event]
    val stack = new ArrayBuffer[PVal]

    // graphics state: CTM as (a,b,c,d,e,f); stack for q/Q
    var ctm = Array(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    val ctmStack = mutable.Stack[Array[Double]]()
    // text state: Tf size, text-matrix scale (|d| of Tm), leading in text
    // space. Effective user-space size/leading = text-space × tmScale —
    // what block segmentation compares vertical gaps against.
    var tfSize = 12.0
    var curFont = Latin1Font
    var tmScale = 1.0
    var leading = 0.0
    var lineX = 0.0
    var lineY = 0.0
    val lineBuf = new StringBuilder
    var lineStartX = 0.0

    def num(i: Int): Double = stack.lift(stack.length - i) match {
      case Some(PNum(v)) => v
      case _ => 0.0
    }

    def flushLine(): Unit = {
      if (lineBuf.nonEmpty) {
        events += TextLine(Line(lineY, tfSize * tmScale, leading * tmScale,
          lineStartX, lineBuf.toString))
        lineBuf.clear()
      }
    }

    // tx/ty are text-space displacements (Td/TD/T* operands)
    def newLine(tx: Double, ty: Double): Unit = {
      flushLine()
      lineX += tx * tmScale; lineY += ty * tmScale
      lineStartX = lineX
    }

    def show(bytes: Array[Byte]): Unit = {
      if (lineBuf.isEmpty) lineStartX = lineX
      lineBuf.append(curFont.decode(bytes))
    }

    var done = false
    while (!done) {
      lex.nextResolvingRefs() match {
        case null => done = true
        case kw: PKw =>
          kw.name match {
            case "BT" =>
              // BT resets the text matrix to identity
              flushLine(); tmScale = 1.0; lineX = 0; lineY = 0; lineStartX = 0
            case "ET" => flushLine()
            case "Tf" =>
              tfSize = num(1)
              stack.lift(stack.length - 2) match {
                case Some(PName(f)) =>
                  curFont = fonts.getOrElse(f, Latin1Font)
                case _ => ()
              }
            case "TL" => leading = num(1)
            case "Td" => newLine(num(2), num(1))
            case "TD" => leading = -num(1); newLine(num(2), num(1))
            case "Tm" =>
              // a b c d e f Tm SETS the line matrix: scale from |d|,
              // position from (e, f) — absolute, not cumulative
              flushLine()
              if (num(3) != 0) tmScale = math.abs(num(3))
              lineX = num(2); lineY = num(1); lineStartX = lineX
            case "T*" => newLine(0, -leading)
            case "Tj" => stack.lastOption.foreach {
              case PStr(b) => show(b)
              case _ => ()
            }
            case "'" => newLine(0, -leading); stack.lastOption.foreach {
              case PStr(b) => show(b)
              case _ => ()
            }
            case "\"" =>
              newLine(0, -leading)
              stack.lastOption.foreach {
                case PStr(b) => show(b)
                case _ => ()
              }
            case "TJ" => stack.lastOption.foreach {
              case PArr(items) => items.foreach {
                case PStr(b) => show(b)
                case PNum(k) if k <= -180 => lineBuf.append(' ')
                case _ => ()
              }
              case _ => ()
            }
            case "Do" => stack.lastOption.foreach {
              case PName(n) => xobjects.get(n).foreach { info =>
                flushLine()
                val x = ctm(4); val y = ctm(5)
                events += ImageDraw(n, info, (x, y, x + ctm(0), y + ctm(3)))
              }
              case _ => ()
            }
            case "q" => ctmStack.push(ctm.clone())
            case "Q" => if (ctmStack.nonEmpty) ctm = ctmStack.pop()
            case "cm" =>
              val m = Array(num(6), num(5), num(4), num(3), num(2), num(1))
              ctm = Array(
                m(0) * ctm(0) + m(1) * ctm(2),
                m(0) * ctm(1) + m(1) * ctm(3),
                m(2) * ctm(0) + m(3) * ctm(2),
                m(2) * ctm(1) + m(3) * ctm(3),
                m(4) * ctm(0) + m(5) * ctm(2) + ctm(4),
                m(4) * ctm(1) + m(5) * ctm(3) + ctm(5))
            case "BI" =>
              // inline image: skip past the EI operator. Raw image bytes
              // routinely contain the letters "EI", so only a STANDALONE
              // token (whitespace before, whitespace/delimiter/EOF after)
              // ends the image — a bare substring match would resume the
              // lexer mid-binary and corrupt the rest of the stream.
              var found = false
              while (!found) {
                val at = lex.seek("EI")
                if (at < 0) {
                  // truncated stream: seek leaves p untouched on a miss, so
                  // park the lexer at EOF — otherwise the interpreter would
                  // resume tokenizing raw image bytes as operators
                  lex.p = content.length
                  found = true
                } else {
                  val before = if (at == 0) ' '.toInt else content(at - 1) & 0xff
                  val after =
                    if (at + 2 >= content.length) ' '.toInt
                    else content(at + 2) & 0xff
                  if (isWs(before) && (isWs(after) || isDelim(after)))
                    found = true
                }
              }
            case _ => () // any other operator: operands consumed below
          }
          stack.clear()
        case v => stack += v
      }
    }
    flushLine()
    events.toSeq
  }

  /** Lines → blocks by vertical gap; images are their own blocks and hard
    * boundaries (matching both PyMuPDF and the downstream G4 contract).
    */
  private def groupBlocks(events: Seq[Event], pageNum: Int): Seq[PdfBlock] = {
    val blocks = new ArrayBuffer[PdfBlock]
    val cur = new ArrayBuffer[Line]

    def flush(): Unit = if (cur.nonEmpty) {
      val text = cur.map(_.text).mkString("\n")
      val ys = cur.map(_.y)
      val xs = cur.map(_.x)
      blocks += PdfBlock(pageNum, isImage = false, text,
        (xs.min, ys.min, xs.max, ys.max))
      cur.clear()
    }

    events.foreach {
      case TextLine(l) =>
        val sameBlock = cur.nonEmpty && {
          val prev = cur.last
          val gap = prev.y - l.y
          val unit = math.max(math.max(l.leading, l.size), 1.0)
          gap > 0 && gap <= BlockGapFactor * unit
        }
        if (!sameBlock && cur.nonEmpty) flush()
        cur += l
      case ImageDraw(name, info, bbox) =>
        flush()
        blocks += PdfBlock(pageNum, isImage = true, s"$name ${info.label}", bbox)
    }
    flush()
    blocks.toSeq
  }
}
