package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Symbol-dictionary + text-region coding ([[Jbig2]] §6.4/§6.5 + the
  * Annex A integer procedures) — the dominant wild-JBIG2 organization.
  * Layered: integer coder alone, dictionary alone, then the full
  * page-info + dictionary + text-region document. */
class Jbig2TextSpec extends AnyFunSuite {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)

  test("Annex A integer coder round-trips every value class and OOB") {
    val values: Seq[Option[Int]] =
      Seq(0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 100000,
        -100000, 1 << 20).map(v => Some(v)) ++ Seq(None, Some(-4), None) ++
        lcg(5).take(300).map(s =>
          if ((s >>> 40) % 11 == 0) None
          else Some(((s >>> 20) % 9000).toInt - 4500)).toSeq
    val enc = new Jbig2.MqEncoder
    val ctxE = new Jbig2.IntCtx
    values.foreach(v => Jbig2.encodeInt(enc, ctxE, v))
    val data = enc.flush()
    val dec = new Jbig2.MqDecoder(data, 0, data.length)
    val ctxD = new Jbig2.IntCtx
    values.zipWithIndex.foreach { case (v, i) =>
      assert(Jbig2.decodeInt(dec, ctxD) == v, s"value $i")
    }
  }

  test("IAID round-trips ids at several code lengths") {
    for (len <- 1 to 6) {
      val n = 1 << len
      val ids = lcg(len).map(s => ((s >>> 33) % n).toInt).take(100).toSeq
      val enc = new Jbig2.MqEncoder
      val ctxE = new Jbig2.IdCtx(len)
      ids.foreach(id => Jbig2.encodeId(enc, ctxE, id))
      val data = enc.flush()
      val dec = new Jbig2.MqDecoder(data, 0, data.length)
      val ctxD = new Jbig2.IdCtx(len)
      ids.zipWithIndex.foreach { case (id, i) =>
        assert(Jbig2.decodeId(dec, ctxD) == id, s"len=$len id $i")
      }
    }
  }

  private def glyph(k: Int): Array[Array[Boolean]] = {
    val w = 4 + k % 4
    val h = 5 + k / 2
    Array.tabulate(h, w)((y, x) => (x * 3 + y * 5 + k * 2) % 7 < 3)
  }

  test("symbol dictionary round-trips height classes and export runs") {
    for (n <- Seq(1, 2, 3, 5, 8)) {
      val syms = (0 until n).map(glyph) // heights non-decreasing in k
      val data = Jbig2.encodeSymbolDict(syms)
      val got = Jbig2.decodeSymbolDict(data, 0, data.length,
        IndexedSeq.empty, 1L << 20)
      assert(got.isDefined, s"n=$n")
      assert(got.get.length == n)
      got.get.zip(syms).zipWithIndex.foreach { case ((a, b), k) =>
        assert(a.length == b.length && a.head.length == b.head.length,
          s"sym $k geometry")
        a.zip(b).foreach { case (ra, rb) => assert(ra.sameElements(rb)) }
      }
    }
  }

  test("full text document: dictionary + placed instances round-trip") {
    for (m <- 0 until 12) {
      val numSyms = 3 + m % 3
      val syms = (0 until numSyms).map(glyph)
      val nInst = 6 + m % 5
      val insts = (0 until nInst).map(j =>
        Jbig2.TextInstance((j * 2 + m) % numSyms, 11 * j, 3 + (j % 3)))
      val pw = 11 * (nInst - 1) + 8
      val ph = 12
      val enc = Jbig2.encodeTextDocument(pw, ph, syms, insts)
      val dec = Jbig2.decode(enc)
      assert(dec.isDefined, s"m=$m")
      assert(dec.get.width == pw && dec.get.height == ph)
      // non-overlapping placements: ink = sum of placed glyph ink
      val expect = insts.map(i =>
        syms(i.id).map(_.count(identity)).sum.toLong).sum
      assert(dec.get.blackCount == expect, s"m=$m ink")
      // every instance's pixels land exactly at its placement
      insts.foreach { inst =>
        val g = syms(inst.id)
        g.indices.foreach { y =>
          g(y).indices.foreach { x =>
            assert(dec.get.rows(inst.y + y)(inst.x + x) == g(y)(x),
              s"m=$m inst@(${inst.x},${inst.y}) pixel ($x,$y)")
          }
        }
      }
    }
  }

  /** Hand-build a dictionary data block (flags + AT + counts) around a
    * caller-scripted MQ payload — the hostile shapes no honest encoder
    * emits. */
  private def dictData(numEx: Int, numNew: Int)(
      script: Jbig2.MqEncoder => Unit): Array[Byte] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    b += 0; b += 0 // flags: arithmetic, template 0
    Seq((3, -1), (-3, -1), (2, -2), (-2, -2)).foreach { case (x, y) =>
      b += x.toByte; b += y.toByte
    }
    def be32(v: Int): Unit = {
      b += ((v >> 24) & 0xFF).toByte; b += ((v >> 16) & 0xFF).toByte
      b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte
    }
    be32(numEx); be32(numNew)
    val enc = new Jbig2.MqEncoder
    script(enc)
    b ++= enc.flush()
    b.toArray
  }

  test("guards: empty height classes and zero-run exports terminate") {
    // dh = 0 violates 6.5.5's strictly-increasing height classes — an
    // all-empty-class stream would otherwise never reach numNew
    val dh0 = dictData(1, 1) { enc =>
      Jbig2.encodeInt(enc, new Jbig2.IntCtx, Some(0))
    }
    assert(Jbig2.decodeSymbolDict(dh0, 0, dh0.length,
      IndexedSeq.empty, 1L << 20).isEmpty)
    // export runs of length 0 toggle the flag without advancing — the
    // rounds cap must stop the spin
    val zeroRuns = dictData(1, 1) { enc =>
      val iadh = new Jbig2.IntCtx
      val iadw = new Jbig2.IntCtx
      val iaex = new Jbig2.IntCtx
      Jbig2.encodeInt(enc, iadh, Some(5)) // height class 5
      Jbig2.encodeInt(enc, iadw, Some(4)) // one 4-wide symbol
      Jbig2.encodeGenericWith(enc, new Jbig2.CxStore,
        glyph(0).toIndexedSeq, 4, 0, tpgdon = false)
      Jbig2.encodeInt(enc, iadw, None) // class end
      (0 until 64).foreach(_ => Jbig2.encodeInt(enc, iaex, Some(0)))
    }
    assert(Jbig2.decodeSymbolDict(zeroRuns, 0, zeroRuns.length,
      IndexedSeq.empty, 1L << 20).isEmpty)
  }

  test("guards: text-region draw work is budgeted") {
    // one 96x96 symbol placed 600 times into a 40x12 region: each draw
    // costs the full bitmap, far beyond 8x the region area — a decoder
    // without the work budget burns unbounded CPU on streams this small
    val big = Array.fill(96)(Array.fill(96)(true))
    val insts = (0 until 600).map(j => Jbig2.TextInstance(0, j % 30, 0))
    val tr = Jbig2.encodeTextRegion(40, 12, insts, IndexedSeq(big))
    assert(Jbig2.decodeTextRegion(tr, 0, tr.length, 40, 12,
      IndexedSeq(big)).isEmpty, "draw budget must reject the flood")
    // the same shape at sane scale decodes fine
    val small = glyph(1)
    val ok = Jbig2.encodeTextRegion(40, 12,
      (0 until 6).map(j => Jbig2.TextInstance(0, j * 6, 0)),
      IndexedSeq(small))
    assert(Jbig2.decodeTextRegion(ok, 0, ok.length, 40, 12,
      IndexedSeq(small)).isDefined)
  }

  test("Annex-B standard tables round-trip their value classes and OOB") {
    import Jbig2.{BitRd, BitWr}
    val cases = Seq(
      (Jbig2.TableB1, Seq(0, 7, 15, 16, 200, 271, 272, 65807, 65808,
        100000), false),
      (Jbig2.TableB2, Seq(0, 1, 2, 3, 10, 11, 74, 75, 1000), true),
      (Jbig2.TableB3, Seq(-1000, -257, -256, -1, 0, 1, 2, 5, 11, 74, 75,
        1000), true),
      (Jbig2.TableB4, Seq(1, 2, 3, 4, 11, 12, 75, 76, 1000), false),
      (Jbig2.TableB5, Seq(-1000, -256, -255, -1, 0, 1, 3, 12, 76, 1000),
        false))
    cases.foreach { case (table, vals, hasOob) =>
      val w = new BitWr
      vals.foreach(table.encode(w, _))
      if (hasOob) table.encodeOob(w)
      val bytes = w.result()
      val r = new BitRd(bytes, 0, bytes.length)
      vals.foreach(v => assert(table.decode(r) == Some(Some(v)), s"v=$v"))
      if (hasOob) assert(table.decode(r) == Some(None), "OOB")
    }
  }

  test("Huffman symbol dictionary ≡ arithmetic across seeds and both " +
      "collective-bitmap codings") {
    for (m <- 0 until 12; mmr <- Seq(false, true)) {
      val syms = (0 until (3 + m % 3)).map(glyph)
      val dictH = Jbig2.encodeSymbolDictHuff(syms, mmr = mmr)
      val ex = Jbig2.decodeSymbolDict(dictH, 0, dictH.length,
        IndexedSeq.empty, 1 << 20)
        .getOrElse(fail(s"huff dict m=$m mmr=$mmr failed"))
      assert(ex.length == syms.length)
      ex.zip(syms).zipWithIndex.foreach { case ((a, b), k) =>
        assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
          s"m=$m mmr=$mmr glyph $k bitmap differs")
      }
    }
  }

  test("full text document with a Huffman dictionary ≡ arithmetic form") {
    for (m <- 0 until 8; mmr <- Seq(false, true)) {
      val syms = (0 until PdfWriter.jb2NumSyms(m)).map(PdfWriter.jb2Glyph)
      val inst = PdfWriter.jb2TextInstances(m)
      val (w, h) = PdfWriter.jb2TextDims(m)
      val huff = Jbig2.decode(Jbig2.encodeTextDocument(w, h,
        syms.toIndexedSeq, inst, huffDict = true, dictMmr = mmr))
        .getOrElse(fail(s"huff doc m=$m mmr=$mmr failed"))
      val arith = Jbig2.decode(Jbig2.encodeTextDocument(w, h,
        syms.toIndexedSeq, inst)).getOrElse(fail(s"arith doc m=$m failed"))
      assert(huff.width == arith.width && huff.height == arith.height)
      assert(huff.blackCount == arith.blackCount,
        s"m=$m mmr=$mmr ink differs")
    }
  }

  test("custom code-table segments (type 53) round-trip their tables") {
    import Jbig2.{BitRd, BitWr}
    for (spec <- Seq(Jbig2.TextFsSpec, Jbig2.TextDsSpec, Jbig2.TextDtSpec)) {
      val bytes = spec.segmentData
      val parsed = Jbig2.decodeCodeTable(bytes, 0, bytes.length)
        .getOrElse(fail("code table segment did not parse"))
      val built = spec.table
      // the parsed table must decode exactly what the built one encodes
      val vals = Seq(spec.htLow, spec.htLow + 1, 0, 37, spec.htHigh - 1)
        .filter(v => v >= spec.htLow && v < spec.htHigh)
      val w = new BitWr
      vals.foreach(built.encode(w, _))
      if (spec.oobPref > 0) built.encodeOob(w)
      val out = w.result()
      val r = new BitRd(out, 0, out.length)
      vals.foreach(v => assert(parsed.decode(r) == Some(Some(v)), s"v=$v"))
      if (spec.oobPref > 0) assert(parsed.decode(r) == Some(None))
    }
  }

  test("fully-Huffman document (SDHUFF dict + SBHUFF text region with " +
      "custom tables) ≡ arithmetic form") {
    for (m <- 0 until 8; mmr <- Seq(false, true)) {
      val syms = (0 until PdfWriter.jb2NumSyms(m)).map(PdfWriter.jb2Glyph)
      val inst = PdfWriter.jb2TextInstances(m)
      val (w, h) = PdfWriter.jb2TextDims(m)
      val huff = Jbig2.decode(Jbig2.encodeTextDocument(w, h,
        syms.toIndexedSeq, inst, huffDict = true, dictMmr = mmr,
        huffText = true))
        .getOrElse(fail(s"fully-huff doc m=$m mmr=$mmr failed"))
      val arith = Jbig2.decode(Jbig2.encodeTextDocument(w, h,
        syms.toIndexedSeq, inst)).getOrElse(fail(s"arith doc m=$m failed"))
      assert(huff.width == arith.width && huff.height == arith.height)
      assert(huff.blackCount == arith.blackCount,
        s"m=$m mmr=$mmr ink differs")
    }
  }

  test("hostile fully-Huffman documents degrade, never throw; " +
      "standard-table selections degrade honestly") {
    val syms = (0 until 3).map(glyph)
    val inst = Seq(Jbig2.TextInstance(0, 0, 0), Jbig2.TextInstance(2, 10, 2))
    val doc = Jbig2.encodeTextDocument(40, 12, syms, inst,
      huffDict = true, huffText = true)
    assert(Jbig2.decode(doc).isDefined)
    (0 until doc.length by 3).foreach(n => Jbig2.decode(doc.take(n)))
    (0 until doc.length by 2).foreach { i =>
      val mut = doc.clone(); mut(i) = (mut(i) ^ 0x77).toByte
      Jbig2.decode(mut) // bounded, no throw
    }
    // a text region selecting STANDARD tables (sel 0) must degrade to
    // None rather than guess: flip the Huffman-flags selections
    val tr = Jbig2.encodeTextRegionHuff(40, 12, inst, syms)
    val std = tr.clone()
    std(3) = 0 // low byte of the huffman flags: FS/DS/DT sel -> 0
    assert(Jbig2.decodeTextRegion(std, 0, std.length, 40, 12, syms,
      IndexedSeq(Jbig2.TextFsSpec.table, Jbig2.TextDsSpec.table,
        Jbig2.TextDtSpec.table)).isEmpty)
    // and a region whose table refs are missing degrades too
    assert(Jbig2.decodeTextRegion(tr, 0, tr.length, 40, 12, syms,
      IndexedSeq.empty).isEmpty)
  }

  test("hostile Huffman dictionaries degrade to None, never throw") {
    val syms = (0 until 4).map(glyph)
    val dict = Jbig2.encodeSymbolDictHuff(syms)
    (0 until dict.length).foreach(n =>
      Jbig2.decodeSymbolDict(dict.take(n), 0, n, IndexedSeq.empty, 1 << 20))
    (0 until dict.length).foreach { i =>
      val mut = dict.clone(); mut(i) = (mut(i) ^ 0x5A).toByte
      Jbig2.decodeSymbolDict(mut, 0, mut.length, IndexedSeq.empty, 1 << 20)
    }
    // pixel budget bounds collective bitmaps exactly like arithmetic
    assert(Jbig2.decodeSymbolDict(dict, 0, dict.length,
      IndexedSeq.empty, 10).isEmpty, "budget must bound huff symbols")
    // custom-table selections degrade honestly (sel 3 = custom)
    val custom = dict.clone()
    custom(1) = (custom(1) | (3 << 2)).toByte // SDHUFFDH = 3
    assert(Jbig2.decodeSymbolDict(custom, 0, custom.length,
      IndexedSeq.empty, 1 << 20).isEmpty)
  }

  test("hostile/degenerate symbol streams degrade to None, never throw") {
    val syms = (0 until 3).map(glyph)
    val doc = Jbig2.encodeTextDocument(40, 12, syms,
      Seq(Jbig2.TextInstance(0, 0, 0), Jbig2.TextInstance(2, 10, 2)))
    (0 until doc.length by 3).foreach(n => Jbig2.decode(doc.take(n)))
    (0 until doc.length by 5).foreach { i =>
      val mut = doc.clone(); mut(i) = (mut(i) ^ 0x77).toByte
      Jbig2.decode(mut) // bounded, no throw
    }
    // a text region whose dictionary reference is missing -> no regions
    val noDict = doc.clone()
    // segment 2 (the dict) type byte: corrupt its segment number so the
    // text region's ref resolves to nothing
    val dictData = Jbig2.encodeSymbolDict(syms)
    assert(Jbig2.decodeSymbolDict(dictData, 0, dictData.length,
      IndexedSeq.empty, 10).isEmpty, "pixel budget must bound symbols")
  }
}
