package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

import scala.collection.mutable

/** Bare-CFF (/FontFile3) glyph-name introspection — the OTHER half of the
  * no-/ToUnicode recovery.
  *
  * [[TrueTypeCmap]] handles /FontFile2 (and 'OTTO'-wrapped OpenType, which
  * carries an sfnt `cmap`). But producers embedding PostScript outlines ship
  * a BARE CFF under /FontFile3 /Subtype /CIDFontType0C or /Type1C — no sfnt
  * wrapper, no `cmap` table. The reference still recovers text there because
  * PyMuPDF reads the font program's charset: glyph → SID → glyph NAME, and
  * glyph names encode Unicode by convention (Adobe Glyph List: `uni0041`,
  * `u1F600`, or a dictionary name like `Aacute`;
  * pymupdf_parser.py:180-271 — glyph text via font introspection). This is
  * that recovery in pure JVM: parse the CFF INDEX chain (header → Name →
  * Top DICT → String), the charset (formats 0/1/2 per CFF spec §13), and
  * resolve names through the AGL conventions.
  *
  * Name-keyed CFF inside a /CIDFontType0 descendant is the case PDF 32000
  * §9.7.4.2 defines as "CIDs are used directly as glyph indices", so under
  * /Identity-H a content-stream code is the GID here exactly as in the
  * FontFile2 path — one inverted table decodes text where /ToUnicode would
  * have.
  *
  * Fuzz posture matches [[TrueTypeCmap]]: every read is bounds-checked; a
  * truncated or hostile font yields an empty map (caller degrades to
  * code-as-char, documented), never an exception.
  */
object CffCharset {

  private def u8(b: Array[Byte], p: Int): Int = b(p) & 0xff
  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  /** Read a CFF1 INDEX at `p`: (items, position after the INDEX). */
  private def readIndex(b: Array[Byte], p: Int)
      : Option[(IndexedSeq[Array[Byte]], Int)] = {
    if (p < 0 || p + 2 > b.length) return None
    val count = u16(b, p)
    if (count == 0) return Some((Vector.empty, p + 2))
    if (count > 65535 || p + 3 > b.length) return None
    val offSize = u8(b, p + 2)
    if (offSize < 1 || offSize > 4) return None
    val offBase = p + 3
    val dataBase = offBase + (count + 1) * offSize - 1 // offsets are 1-based
    def off(i: Int): Long = {
      var v = 0L
      var k = 0
      while (k < offSize) { v = (v << 8) | (b(offBase + i * offSize + k) & 0xffL); k += 1 }
      v
    }
    if (dataBase + 1 > b.length || offBase + (count + 1) * offSize > b.length)
      return None
    val items = Vector.newBuilder[Array[Byte]]
    var i = 0
    while (i < count) {
      val s = dataBase + off(i)
      val e = dataBase + off(i + 1)
      if (s < 0 || e < s || e > b.length) return None
      items += java.util.Arrays.copyOfRange(b, s.toInt, e.toInt)
      i += 1
    }
    Some((items.result(), (dataBase + off(count)).toInt))
  }

  /** DICT scan for the operators the charset walk needs: 15 = charset
    * offset, 17 = CharStrings offset (both absolute), and 1230 (/ROS) —
    * presence alone marks the CFF as CID-keyed, whose charset holds CIDs
    * rather than name SIDs and must not be resolved through the string
    * tables.
    */
  private def parseTopDict(d: Array[Byte]): Map[Int, Long] = {
    val out = mutable.Map.empty[Int, Long]
    val stack = mutable.ArrayBuffer.empty[Long]
    var p = 0
    while (p < d.length) {
      val b0 = u8(d, p)
      if (b0 <= 21) { // operator
        val op = if (b0 == 12) {
          if (p + 1 >= d.length) return out.toMap
          p += 1; 1200 + u8(d, p)
        } else b0
        if (stack.nonEmpty && (op == 15 || op == 17)) out(op) = stack.last
        if (op == 1230) out(op) = 1L
        stack.clear()
        p += 1
      } else if (b0 == 28) {
        if (p + 2 >= d.length) return out.toMap
        stack += ((d(p + 1) << 8) | (d(p + 2) & 0xff)).toShort.toLong
        p += 3
      } else if (b0 == 29) {
        if (p + 4 >= d.length) return out.toMap
        stack += ((d(p + 1) & 0xffL) << 24) | ((d(p + 2) & 0xffL) << 16) |
          ((d(p + 3) & 0xffL) << 8) | (d(p + 4) & 0xffL)
        p += 5
      } else if (b0 == 30) { // real number: nibbles until 0xf terminator
        p += 1
        var done = false
        while (!done && p < d.length) {
          val n = u8(d, p); p += 1
          if ((n & 0x0f) == 0x0f || (n & 0xf0) == 0xf0) done = true
        }
        stack += 0L // reals never carry the offsets we need
      } else if (b0 >= 32 && b0 <= 246) {
        stack += (b0 - 139).toLong
        p += 1
      } else if (b0 >= 247 && b0 <= 250) {
        if (p + 1 >= d.length) return out.toMap
        stack += ((b0 - 247) * 256 + u8(d, p + 1) + 108).toLong
        p += 2
      } else if (b0 >= 251 && b0 <= 254) {
        if (p + 1 >= d.length) return out.toMap
        stack += (-(b0 - 251) * 256 - u8(d, p + 1) - 108).toLong
        p += 2
      } else return out.toMap // 22-27, 31: reserved
    }
    out.toMap
  }

  /** charset → SID per glyph (gid 1.. — gid 0 is .notdef and has no
    * charset entry). Predefined charset 0 (ISOAdobe) is the identity
    * sid = gid table; Expert/ExpertSubset (1/2) are left to degrade.
    */
  private def parseCharset(b: Array[Byte], off: Long, nGlyphs: Int)
      : Map[Int, Int] = {
    if (nGlyphs < 2 || nGlyphs > 65535) return Map.empty
    if (off == 0)
      return (1 until math.min(nGlyphs, 229)).map(g => g -> g).toMap
    if (off == 1 || off == 2 || off < 0 || off + 1 > b.length) return Map.empty
    val p = off.toInt
    val out = Map.newBuilder[Int, Int]
    u8(b, p) match {
      case 0 =>
        if (p + 1 + 2 * (nGlyphs - 1) > b.length) return Map.empty
        var g = 1
        while (g < nGlyphs) { out += g -> u16(b, p + 1 + 2 * (g - 1)); g += 1 }
      case 1 | 2 =>
        val fmt = u8(b, p)
        val recLen = if (fmt == 1) 3 else 4
        var g = 1
        var q = p + 1
        while (g < nGlyphs) {
          if (q + recLen > b.length) return Map.empty
          val first = u16(b, q)
          val nLeft = if (fmt == 1) u8(b, q + 2) else u16(b, q + 2)
          var k = 0
          while (k <= nLeft && g < nGlyphs) { out += g -> (first + k); g += 1; k += 1 }
          q += recLen
        }
      case _ => return Map.empty
    }
    out.result()
  }

  /** The 391 CFF standard strings, SIDs 0–390 (CFF spec Appendix A). */
  private[graft] val StdStrings: IndexedSeq[String] =
    (".notdef space exclam quotedbl numbersign dollar percent ampersand " +
      "quoteright parenleft parenright asterisk plus comma hyphen period " +
      "slash zero one two three four five six seven eight nine colon " +
      "semicolon less equal greater question at A B C D E F G H I J K L M " +
      "N O P Q R S T U V W X Y Z bracketleft backslash bracketright " +
      "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q " +
      "r s t u v w x y z braceleft bar braceright asciitilde exclamdown " +
      "cent sterling fraction yen florin section currency quotesingle " +
      "quotedblleft guillemotleft guilsinglleft guilsinglright fi fl " +
      "endash dagger daggerdbl periodcentered paragraph bullet " +
      "quotesinglbase quotedblbase quotedblright guillemotright ellipsis " +
      "perthousand questiondown grave acute circumflex tilde macron breve " +
      "dotaccent dieresis ring cedilla hungarumlaut ogonek caron emdash " +
      "AE ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash " +
      "oslash oe germandbls onesuperior logicalnot mu trademark Eth " +
      "onehalf plusminus Thorn onequarter divide brokenbar degree thorn " +
      "threequarters twosuperior registered minus eth multiply " +
      "threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring " +
      "Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute " +
      "Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis " +
      "Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute " +
      "Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde " +
      "ccedilla eacute ecircumflex edieresis egrave iacute icircumflex " +
      "idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde " +
      "scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron " +
      "exclamsmall Hungarumlautsmall dollaroldstyle dollarsuperior " +
      "ampersandsmall Acutesmall parenleftsuperior parenrightsuperior " +
      "twodotenleader onedotenleader zerooldstyle oneoldstyle twooldstyle " +
      "threeoldstyle fouroldstyle fiveoldstyle sixoldstyle sevenoldstyle " +
      "eightoldstyle nineoldstyle commasuperior threequartersemdash " +
      "periodsuperior questionsmall asuperior bsuperior centsuperior " +
      "dsuperior esuperior isuperior lsuperior msuperior nsuperior " +
      "osuperior rsuperior ssuperior tsuperior ff ffi ffl " +
      "parenleftinferior parenrightinferior Circumflexsmall " +
      "hyphensuperior Gravesmall Asmall Bsmall Csmall Dsmall Esmall " +
      "Fsmall Gsmall Hsmall Ismall Jsmall Ksmall Lsmall Msmall Nsmall " +
      "Osmall Psmall Qsmall Rsmall Ssmall Tsmall Usmall Vsmall Wsmall " +
      "Xsmall Ysmall Zsmall colonmonetary onefitted rupiah Tildesmall " +
      "exclamdownsmall centoldstyle Lslashsmall Scaronsmall Zcaronsmall " +
      "Dieresissmall Brevesmall Caronsmall Dotaccentsmall Macronsmall " +
      "figuredash hypheninferior Ogoneksmall Ringsmall Cedillasmall " +
      "questiondownsmall oneeighth threeeighths fiveeighths seveneighths " +
      "onethird twothirds zerosuperior foursuperior fivesuperior " +
      "sixsuperior sevensuperior eightsuperior ninesuperior zeroinferior " +
      "oneinferior twoinferior threeinferior fourinferior fiveinferior " +
      "sixinferior seveninferior eightinferior nineinferior centinferior " +
      "dollarinferior periodinferior commainferior Agravesmall " +
      "Aacutesmall Acircumflexsmall Atildesmall Adieresissmall " +
      "Aringsmall AEsmall Ccedillasmall Egravesmall Eacutesmall " +
      "Ecircumflexsmall Edieresissmall Igravesmall Iacutesmall " +
      "Icircumflexsmall Idieresissmall Ethsmall Ntildesmall Ogravesmall " +
      "Oacutesmall Ocircumflexsmall Otildesmall Odieresissmall OEsmall " +
      "Oslashsmall Ugravesmall Uacutesmall Ucircumflexsmall " +
      "Udieresissmall Yacutesmall Thornsmall Ydieresissmall 001.000 " +
      "001.001 001.002 001.003 Black Bold Book Light Medium Regular " +
      "Roman Semibold").split(' ').toIndexedSeq

  /** AGL-convention glyph-name → codepoint for the dictionary names real
    * Latin fonts use (ASCII + Latin-1 + the common typographic set —
    * the subset of the public Adobe Glyph List the standard strings can
    * name). `uniXXXX` / `uXXXXX` forms are resolved structurally in
    * [[resolveName]], not here.
    */
  private[sources] val aglNames: Map[String, Int] = {
    val ascii = Map(
      "space" -> 0x20, "exclam" -> 0x21, "quotedbl" -> 0x22,
      "numbersign" -> 0x23, "dollar" -> 0x24, "percent" -> 0x25,
      "ampersand" -> 0x26, "quotesingle" -> 0x27, "parenleft" -> 0x28,
      "parenright" -> 0x29, "asterisk" -> 0x2a, "plus" -> 0x2b,
      "comma" -> 0x2c, "hyphen" -> 0x2d, "period" -> 0x2e, "slash" -> 0x2f,
      "zero" -> 0x30, "one" -> 0x31, "two" -> 0x32, "three" -> 0x33,
      "four" -> 0x34, "five" -> 0x35, "six" -> 0x36, "seven" -> 0x37,
      "eight" -> 0x38, "nine" -> 0x39, "colon" -> 0x3a,
      "semicolon" -> 0x3b, "less" -> 0x3c, "equal" -> 0x3d,
      "greater" -> 0x3e, "question" -> 0x3f, "at" -> 0x40,
      "bracketleft" -> 0x5b, "backslash" -> 0x5c, "bracketright" -> 0x5d,
      "asciicircum" -> 0x5e, "underscore" -> 0x5f, "grave" -> 0x60,
      "braceleft" -> 0x7b, "bar" -> 0x7c, "braceright" -> 0x7d,
      "asciitilde" -> 0x7e)
    val letters = (('A' to 'Z') ++ ('a' to 'z'))
      .map(c => c.toString -> c.toInt).toMap
    // Latin-1 precomposed accents: name = base letter + accent suffix
    val accentCp = Map(
      // (suffix, base) -> codepoint; uppercase then lowercase in each row
      "Agrave" -> 0xc0, "Aacute" -> 0xc1, "Acircumflex" -> 0xc2,
      "Atilde" -> 0xc3, "Adieresis" -> 0xc4, "Aring" -> 0xc5,
      "Ccedilla" -> 0xc7, "Egrave" -> 0xc8, "Eacute" -> 0xc9,
      "Ecircumflex" -> 0xca, "Edieresis" -> 0xcb, "Igrave" -> 0xcc,
      "Iacute" -> 0xcd, "Icircumflex" -> 0xce, "Idieresis" -> 0xcf,
      "Ntilde" -> 0xd1, "Ograve" -> 0xd2, "Oacute" -> 0xd3,
      "Ocircumflex" -> 0xd4, "Otilde" -> 0xd5, "Odieresis" -> 0xd6,
      "Ugrave" -> 0xd9, "Uacute" -> 0xda, "Ucircumflex" -> 0xdb,
      "Udieresis" -> 0xdc, "Yacute" -> 0xdd,
      "agrave" -> 0xe0, "aacute" -> 0xe1, "acircumflex" -> 0xe2,
      "atilde" -> 0xe3, "adieresis" -> 0xe4, "aring" -> 0xe5,
      "ccedilla" -> 0xe7, "egrave" -> 0xe8, "eacute" -> 0xe9,
      "ecircumflex" -> 0xea, "edieresis" -> 0xeb, "igrave" -> 0xec,
      "iacute" -> 0xed, "icircumflex" -> 0xee, "idieresis" -> 0xef,
      "ntilde" -> 0xf1, "ograve" -> 0xf2, "oacute" -> 0xf3,
      "ocircumflex" -> 0xf4, "otilde" -> 0xf5, "odieresis" -> 0xf6,
      "ugrave" -> 0xf9, "uacute" -> 0xfa, "ucircumflex" -> 0xfb,
      "udieresis" -> 0xfc, "yacute" -> 0xfd, "ydieresis" -> 0xff)
    val symbols = Map(
      "exclamdown" -> 0xa1, "cent" -> 0xa2, "sterling" -> 0xa3,
      "currency" -> 0xa4, "yen" -> 0xa5, "brokenbar" -> 0xa6,
      "section" -> 0xa7, "dieresis" -> 0xa8, "copyright" -> 0xa9,
      "ordfeminine" -> 0xaa, "guillemotleft" -> 0xab,
      "logicalnot" -> 0xac, "registered" -> 0xae, "macron" -> 0xaf,
      "degree" -> 0xb0, "plusminus" -> 0xb1, "twosuperior" -> 0xb2,
      "threesuperior" -> 0xb3, "acute" -> 0xb4, "mu" -> 0xb5,
      "paragraph" -> 0xb6, "periodcentered" -> 0xb7, "cedilla" -> 0xb8,
      "onesuperior" -> 0xb9, "ordmasculine" -> 0xba,
      "guillemotright" -> 0xbb, "onequarter" -> 0xbc, "onehalf" -> 0xbd,
      "threequarters" -> 0xbe, "questiondown" -> 0xbf,
      "AE" -> 0xc6, "Eth" -> 0xd0, "multiply" -> 0xd7, "Oslash" -> 0xd8,
      "Thorn" -> 0xde, "germandbls" -> 0xdf, "ae" -> 0xe6, "eth" -> 0xf0,
      "divide" -> 0xf7, "oslash" -> 0xf8, "thorn" -> 0xfe,
      "OE" -> 0x152, "oe" -> 0x153, "Scaron" -> 0x160, "scaron" -> 0x161,
      "Ydieresis" -> 0x178, "Zcaron" -> 0x17d, "zcaron" -> 0x17e,
      "florin" -> 0x192, "dotlessi" -> 0x131, "Lslash" -> 0x141,
      "lslash" -> 0x142, "circumflex" -> 0x2c6, "caron" -> 0x2c7,
      "breve" -> 0x2d8, "dotaccent" -> 0x2d9, "ring" -> 0x2da,
      "ogonek" -> 0x2db, "tilde" -> 0x2dc, "hungarumlaut" -> 0x2dd,
      "endash" -> 0x2013, "emdash" -> 0x2014, "figuredash" -> 0x2012,
      "quoteleft" -> 0x2018, "quoteright" -> 0x2019,
      "quotesinglbase" -> 0x201a, "quotedblleft" -> 0x201c,
      "quotedblright" -> 0x201d, "quotedblbase" -> 0x201e,
      "dagger" -> 0x2020, "daggerdbl" -> 0x2021, "bullet" -> 0x2022,
      "ellipsis" -> 0x2026, "perthousand" -> 0x2030,
      "guilsinglleft" -> 0x2039, "guilsinglright" -> 0x203a,
      "fraction" -> 0x2044, "trademark" -> 0x2122, "minus" -> 0x2212,
      "fi" -> 0xfb01, "fl" -> 0xfb02, "ff" -> 0xfb00, "ffi" -> 0xfb03,
      "ffl" -> 0xfb04)
    ascii ++ letters ++ accentCp ++ symbols
  }

  private val uniRe = "uni((?:[0-9A-Fa-f]{4})+)".r
  private val uRe = "u([0-9A-Fa-f]{4,6})".r

  /** Glyph name → replacement text per AGL conventions; None degrades. */
  private[sources] def resolveName(name: String): Option[String] =
    name match {
      case uniRe(hex) =>
        val sb = new StringBuilder
        hex.grouped(4).foreach { h =>
          val v = Integer.parseInt(h, 16)
          // AGL excludes surrogate code units from the uni form
          if (v >= 0xd800 && v <= 0xdfff) return None
          sb.append(v.toChar)
        }
        Some(sb.toString)
      case uRe(hex) =>
        val v = Integer.parseInt(hex, 16)
        if (v > 0x10ffff || (v >= 0xd800 && v <= 0xdfff)) None
        else Some(new String(Character.toChars(v)))
      case n => aglNames.get(n).map(cp => new String(Character.toChars(cp)))
    }

  /** GID → replacement text from a bare CFF's charset, the shape
    * [[PdfCodec.FontDec]] consumes (same contract as
    * [[TrueTypeCmap.gidToText]]). Empty on any structural problem or a
    * CID-keyed CFF (whose charset holds CIDs, not names — there is no
    * name table to resolve; op 1230 /ROS marks it).
    */
  def gidToText(font: Array[Byte]): Map[Int, String] = {
    try {
      if (font.length < 4 || u8(font, 0) != 1) return Map.empty
      val hdrSize = u8(font, 2)
      if (hdrSize < 4 || hdrSize > font.length) return Map.empty
      val afterName = readIndex(font, hdrSize) match {
        case Some((_, p)) => p
        case None => return Map.empty
      }
      val (topDicts, afterTop) = readIndex(font, afterName) match {
        case Some(x) => x
        case None => return Map.empty
      }
      if (topDicts.isEmpty) return Map.empty
      val strings = readIndex(font, afterTop) match {
        case Some((items, _)) => items
        case None => return Map.empty
      }
      val dict = parseTopDict(topDicts.head)
      if (dict.contains(1230)) return Map.empty // CID-keyed: no name table
      val charsetOff = dict.getOrElse(15, 0L)
      val csOff = dict.getOrElse(17, -1L)
      if (csOff < 0 || csOff + 2 > font.length) return Map.empty
      val nGlyphs = u16(font, csOff.toInt)
      val sids = parseCharset(font, charsetOff, nGlyphs)
      def sidName(sid: Int): Option[String] =
        if (sid < StdStrings.length) Some(StdStrings(sid))
        else strings.lift(sid - StdStrings.length)
          .map(new String(_, ISO_8859_1))
      sids.iterator.flatMap { case (gid, sid) =>
        sidName(sid).flatMap(resolveName).map(gid -> _)
      }.toMap
    } catch {
      case _: RuntimeException => Map.empty
    }
  }

  // ---------------- fixture-side writer ----------------

  /** Minimal name-keyed CFF whose charset names glyph gid `uni%04X` (or
    * `u%X` for astral) of the codepoint mapped to that gid — the fixture
    * generator for the FontFile3 round-trip ([[PdfWriter.buildCidCff]],
    * p12). Mirrors [[TrueTypeCmap.buildFont]]'s philosophy: enough CFF
    * for any charset-reading extractor (header, Name/Top DICT/String
    * INDEXes, explicit format-0 charset, CharStrings INDEX for the glyph
    * count), nothing else.
    */
  def buildFont(unicodeToGid: Map[Int, Int]): Array[Byte] = {
    require(unicodeToGid.nonEmpty, "CFF fixture needs at least one mapping")
    val byGid = unicodeToGid.map(_.swap).toSeq.sortBy(_._1)
    val nGlyphs = byGid.last._1 + 1 // + .notdef
    require(byGid.map(_._1) == (1 until nGlyphs),
      "fixture gids must be dense 1..n")
    // custom SIDs are 391 + i and must fit u16 charset entries
    require(nGlyphs <= 65000, s"CFF fixture alphabet too large: $nGlyphs")
    val names = byGid.map { case (_, cp) =>
      if (cp <= 0xffff) f"uni$cp%04X" else f"u$cp%X"
    }

    // offSize chosen from the actual data size — a fixed size would
    // silently truncate offsets past 2^(8·offSize) and corrupt the font
    def idx(items: Seq[Array[Byte]]): Array[Byte] = {
      val o = new ByteArrayOutputStream
      o.write(items.length >> 8); o.write(items.length & 0xff)
      if (items.nonEmpty) {
        val lastOff = items.map(_.length.toLong).sum + 1
        val offSize =
          if (lastOff <= 0xffL) 1 else if (lastOff <= 0xffffL) 2
          else if (lastOff <= 0xffffffL) 3 else 4
        o.write(offSize)
        var off = 1L
        (items.map(_.length.toLong) :+ 0L).zipWithIndex.foreach {
          case (len, i) =>
            var k = offSize - 1
            while (k >= 0) { o.write(((off >> (8 * k)) & 0xff).toInt); k -= 1 }
            if (i < items.length) off += len
        }
        items.foreach(o.write)
      }
      o.toByteArray
    }

    val header = Array[Byte](1, 0, 4, 2)
    val nameIdx = idx(Seq("TestSubset".getBytes(ISO_8859_1)))
    val stringIdx = idx(names.map(_.getBytes(ISO_8859_1)))
    val gsubrIdx = idx(Nil)
    // Top DICT is fixed-size (two 5-byte ints + 1-byte ops), so every
    // absolute offset is computable before assembly
    val topDictLen = 12
    val topIdxLen = 2 + 1 + 2 + topDictLen // count, offSize 1, offsets[2]
    val charsetOff =
      header.length + nameIdx.length + topIdxLen + stringIdx.length +
        gsubrIdx.length
    val charsetLen = 1 + 2 * (nGlyphs - 1)
    val charStringsOff = charsetOff + charsetLen

    val topDict = new ByteArrayOutputStream
    def int5(o: ByteArrayOutputStream, v: Long): Unit = {
      o.write(29)
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    int5(topDict, charsetOff.toLong); topDict.write(15)
    int5(topDict, charStringsOff.toLong); topDict.write(17)
    val topIdx = idx(Seq(topDict.toByteArray))
    require(topIdx.length == topIdxLen, "top dict layout drifted")

    val charset = new ByteArrayOutputStream
    charset.write(0) // format 0: SID per glyph
    names.indices.foreach { i =>
      val sid = StdStrings.length + i
      charset.write((sid >> 8) & 0xff); charset.write(sid & 0xff)
    }

    // one endchar (0x0e) per glyph including .notdef
    val charStrings = idx(Seq.fill(nGlyphs)(Array[Byte](0x0e)))

    val out = new ByteArrayOutputStream
    out.write(header); out.write(nameIdx); out.write(topIdx)
    out.write(stringIdx); out.write(gsubrIdx)
    out.write(charset.toByteArray); out.write(charStrings)
    out.toByteArray
  }
}
