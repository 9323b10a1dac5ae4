package graft.sources

import java.io.ByteArrayOutputStream

import scala.collection.mutable

/** TrueType `cmap` table introspection — the no-/ToUnicode fallback.
  *
  * Subset fonts from some producers omit the /ToUnicode CMap entirely; the
  * reference still recovers text there because PyMuPDF reads the embedded
  * font program's own character-to-glyph table and inverts it
  * (pymupdf_parser.py:180-271 — glyph text via font introspection). This is
  * the same recovery in pure JVM: parse the sfnt table directory out of the
  * /FontFile2 stream, find `cmap` (OpenType spec §cmap), decode the best
  * Unicode subtable, and invert it to GID → codepoint. Under /Identity-H
  * with /CIDToGIDMap /Identity — the dominant subset shape — a content
  * stream's two-byte code IS the GID, so the inverted table decodes text
  * exactly where /ToUnicode would have.
  *
  * Subtable formats: 4 (segment mapping — the mandatory Windows BMP form)
  * and 6 (trimmed array) per the round brief, plus 0 (byte table) and 12
  * (segmented coverage — where astral codepoints live) because rejecting
  * them would fail fonts that are strictly easier to read. Preference
  * order (3,10)>(0,4+)>(3,1)>(0,*)>(3,0): highest Unicode coverage first,
  * symbol table last.
  *
  * All reads are bounds-checked against the byte array — a truncated or
  * hostile font program yields an empty map (caller falls back to the
  * documented code-as-char degradation), never an exception or a wild
  * read. Same fuzz posture as [[PdfCodec.parseCMap]].
  */
object TrueTypeCmap {

  private def u8(b: Array[Byte], p: Int): Int = b(p) & 0xff
  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  /** codepoint → GID from the font's best Unicode cmap subtable; empty on
    * any structural problem.
    */
  private[sources] def unicodeToGid(font: Array[Byte]): Map[Int, Int] = {
    if (font.length < 12) return Map.empty
    val sfnt = u32(font, 0)
    // 0x00010000 = TrueType outlines, 'OTTO' = CFF, 'true' = legacy Apple
    if (sfnt != 0x00010000L && sfnt != 0x4f54544fL && sfnt != 0x74727565L)
      return Map.empty
    val numTables = u16(font, 4)
    var cmapOff = -1L
    var cmapLen = -1L
    var i = 0
    while (i < numTables) {
      val rec = 12 + 16 * i
      if (rec + 16 > font.length) return Map.empty
      if (u32(font, rec) == 0x636d6170L) { // 'cmap'
        cmapOff = u32(font, rec + 8)
        cmapLen = u32(font, rec + 12)
      }
      i += 1
    }
    // directory-declared length sanity: a cmap table too short for its
    // own header is structural garbage
    if (cmapOff < 0 || cmapLen < 4 || cmapOff + 4 > font.length)
      return Map.empty
    val cm = cmapOff.toInt
    val nSub = u16(font, cm + 2)
    // collect (platform, encoding, subtable offset)
    val subs = (0 until nSub).flatMap { j =>
      val rec = cm + 4 + 8 * j
      if (rec + 8 > font.length) None
      else Some((u16(font, rec), u16(font, rec + 2), cm + u32(font, rec + 4).toInt))
    }
    def rank(pe: (Int, Int)): Int = pe match {
      case (3, 10) => 0 // Windows, UCS-4: full Unicode
      case (0, e) if e >= 4 => 1 // Unicode platform, 2.0+ full repertoire
      case (3, 1) => 2 // Windows BMP — the mandatory table
      case (0, _) => 3
      case (3, 0) => 4 // symbol: codes are PUA-shifted, last resort
      case _ => 9
    }
    val usable = subs.filter { case (p, e, _) => rank((p, e)) < 9 }
      .sortBy { case (p, e, _) => rank((p, e)) }
    usable.view.map { case (_, _, off) => parseSubtable(font, off) }
      .find(_.nonEmpty).getOrElse(Map.empty)
  }

  private def parseSubtable(b: Array[Byte], off: Int): Map[Int, Int] = {
    if (off < 0 || off + 2 > b.length) return Map.empty
    u16(b, off) match {
      case 0 => // byte encoding table: 256 glyph bytes
        if (off + 6 + 256 > b.length) Map.empty
        else (0 until 256).iterator
          .map(c => c -> u8(b, off + 6 + c)).filter(_._2 != 0).toMap
      case 4 => parseFormat4(b, off)
      case 6 => // trimmed table: firstCode + entryCount gids
        if (off + 10 > b.length) Map.empty
        else {
          val first = u16(b, off + 6)
          val n = u16(b, off + 8)
          if (off + 10 + 2 * n > b.length) Map.empty
          else (0 until n).iterator
            .map(k => (first + k) -> u16(b, off + 10 + 2 * k))
            .filter(_._2 != 0).toMap
        }
      case 12 => // segmented coverage: nGroups × (startChar, endChar, startGid)
        if (off + 16 > b.length) Map.empty
        else {
          val nGroups = u32(b, off + 12)
          if (nGroups > 10000 || off + 16 + 12 * nGroups > b.length) Map.empty
          else {
            val out = Map.newBuilder[Int, Int]
            var g = 0
            while (g < nGroups) {
              val rec = off + 16 + 12 * g
              val lo = u32(b, rec).toInt
              val hi = u32(b, rec + 4).toInt
              val gid0 = u32(b, rec + 8).toInt
              // cap run length: a hostile (lo=0, hi=0x10FFFF) group would
              // materialize the whole codespace
              if (hi >= lo && hi - lo < 65536 && hi <= 0x10ffff) {
                var c = lo
                while (c <= hi) {
                  val gid = gid0 + (c - lo)
                  if (gid != 0) out += c -> gid
                  c += 1
                }
              }
              g += 1
            }
            out.result()
          }
        }
      case _ => Map.empty
    }
  }

  private def parseFormat4(b: Array[Byte], off: Int): Map[Int, Int] = {
    if (off + 14 > b.length) return Map.empty
    val segCountX2 = u16(b, off + 6)
    val segCount = segCountX2 / 2
    val endP = off + 14
    val startP = endP + segCountX2 + 2 // +2: reservedPad
    val deltaP = startP + segCountX2
    val rangeP = deltaP + segCountX2
    if (rangeP + segCountX2 > b.length) return Map.empty
    val out = Map.newBuilder[Int, Int]
    var i = 0
    while (i < segCount) {
      val end = u16(b, endP + 2 * i)
      val start = u16(b, startP + 2 * i)
      val delta = u16(b, deltaP + 2 * i)
      val rangeOff = u16(b, rangeP + 2 * i)
      if (start <= end) {
        var c = start
        while (c <= end && c != 0xffff) {
          val gid =
            if (rangeOff == 0) (c + delta) & 0xffff
            else {
              // spec's pointer arithmetic: the offset is relative to the
              // idRangeOffset slot itself
              val addr = rangeP + 2 * i + rangeOff + 2 * (c - start)
              if (addr + 2 > b.length) 0
              else {
                val raw = u16(b, addr)
                if (raw == 0) 0 else (raw + delta) & 0xffff
              }
            }
          if (gid != 0) out += c -> gid
          c += 1
        }
      }
      i += 1
    }
    out.result()
  }

  /** GID → replacement text (codepoint as a String, surrogate-paired for
    * astral), the shape [[PdfCodec.FontDec]] consumes directly. Inversion
    * keeps the SMALLEST codepoint per GID — deterministic, and the
    * convention extractors (pdf.js's reverse-cmap, fonttools) use for
    * multi-mapped glyphs.
    */
  def gidToText(font: Array[Byte]): Map[Int, String] = {
    val fwd = unicodeToGid(font)
    val inv = mutable.Map.empty[Int, Int]
    fwd.foreach { case (cp, gid) =>
      val prev = inv.get(gid)
      if (prev.forall(cp < _)) inv(gid) = cp
    }
    inv.iterator
      .map { case (gid, cp) => gid -> new String(Character.toChars(cp)) }
      .toMap
  }

  // ---------------- fixture-side writer ----------------

  /** Minimal valid sfnt containing exactly one table — a `cmap` with a
    * format 4 subtable under (3,1) (plus a format 12 under (3,10) iff any
    * codepoint is astral). This is the fixture generator for the
    * no-ToUnicode round-trip ([[PdfWriter.buildCidNoToUni]], p10): enough
    * font for any cmap-reading extractor, nothing else — the decode path
    * under test reads only this table.
    *
    * Format 4 is emitted one segment per contiguous (codepoint, gid) run
    * with the required (0xFFFF, 0xFFFF) terminal segment, idDelta
    * arithmetic modulo 65536, and idRangeOffset 0 throughout (runs carry
    * their own delta — the glyphIdArray form is a parser-side concern the
    * fixture still exercises via [[parseFormat4]]'s spec tests).
    */
  def buildFont(unicodeToGid: Map[Int, Int]): Array[Byte] = {
    val bmp = unicodeToGid.filter(_._1 <= 0xfffe).toSeq.sorted
    val astral = unicodeToGid.filter(_._1 > 0xfffe).toSeq.sorted
    require(bmp.nonEmpty, "cmap fixture needs at least one BMP mapping")

    def w16(o: ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >> 8) & 0xff); o.write(v & 0xff)
    }
    def w32(o: ByteArrayOutputStream, v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }

    // contiguous runs where gid advances with codepoint
    val runs = mutable.ArrayBuffer.empty[(Int, Int, Int)] // start, end, gid0
    bmp.foreach { case (cp, gid) =>
      runs.lastOption match {
        case Some((s, e, g0)) if cp == e + 1 && gid == g0 + (cp - s) =>
          runs(runs.length - 1) = (s, cp, g0)
        case _ => runs += ((cp, cp, gid))
      }
    }
    val segs = runs.toSeq :+ ((0xffff, 0xffff, 0)) // terminal segment
    val segCount = segs.length

    val f4 = new ByteArrayOutputStream
    w16(f4, 4) // format
    w16(f4, 16 + 8 * segCount) // length
    w16(f4, 0) // language
    w16(f4, segCount * 2)
    val searchRange = 2 * Integer.highestOneBit(segCount)
    w16(f4, searchRange)
    w16(f4, 31 - Integer.numberOfLeadingZeros(segCount))
    w16(f4, segCount * 2 - searchRange)
    segs.foreach { case (_, e, _) => w16(f4, e) }
    w16(f4, 0) // reservedPad
    segs.foreach { case (s, _, _) => w16(f4, s) }
    segs.foreach { case (s, _, g0) =>
      // terminal segment maps 0xFFFF→0 via delta 1 (the spec's own example)
      w16(f4, if (s == 0xffff) 1 else (g0 - s) & 0xffff)
    }
    segs.foreach(_ => w16(f4, 0)) // idRangeOffset: all delta-form
    val fmt4 = f4.toByteArray

    val fmt12: Option[Array[Byte]] = if (astral.isEmpty) None else {
      val groups = mutable.ArrayBuffer.empty[(Int, Int, Int)]
      astral.foreach { case (cp, gid) =>
        groups.lastOption match {
          case Some((s, e, g0)) if cp == e + 1 && gid == g0 + (cp - s) =>
            groups(groups.length - 1) = (s, cp, g0)
          case _ => groups += ((cp, cp, gid))
        }
      }
      // format 12 must cover the BMP mappings too (a (3,10) reader never
      // falls back to (3,1))
      val all = (runs ++ groups).sortBy(_._1)
      val o = new ByteArrayOutputStream
      w16(o, 12); w16(o, 0) // format, reserved
      w32(o, 16L + 12L * all.length)
      w32(o, 0) // language
      w32(o, all.length.toLong)
      all.foreach { case (s, e, g0) => w32(o, s.toLong); w32(o, e.toLong); w32(o, g0.toLong) }
      Some(o.toByteArray)
    }

    // cmap table: header + encoding records (sorted ascending by
    // platform, encoding per spec: (3,1) before (3,10)) + subtables
    val nRec = 1 + fmt12.size
    val headerLen = 4 + 8 * nRec
    val fmt4Off = headerLen
    val fmt12Off = headerLen + fmt4.length
    val cmapTable = new ByteArrayOutputStream
    w16(cmapTable, 0) // version
    w16(cmapTable, nRec)
    w16(cmapTable, 3); w16(cmapTable, 1); w32(cmapTable, fmt4Off.toLong)
    fmt12.foreach { _ =>
      w16(cmapTable, 3); w16(cmapTable, 10); w32(cmapTable, fmt12Off.toLong)
    }
    cmapTable.write(fmt4)
    fmt12.foreach(cmapTable.write)
    val cmapBytes = cmapTable.toByteArray

    // sfnt wrapper: version, 1 table, directory entry, table data
    val font = new ByteArrayOutputStream
    w32(font, 0x00010000L)
    w16(font, 1) // numTables
    w16(font, 16); w16(font, 0); w16(font, 0) // search fields (unchecked)
    w32(font, 0x636d6170L) // 'cmap'
    w32(font, 0) // checksum (readers don't verify)
    w32(font, 28) // offset: 12 header + 16 directory
    w32(font, cmapBytes.length.toLong)
    font.write(cmapBytes)
    font.toByteArray
  }
}
