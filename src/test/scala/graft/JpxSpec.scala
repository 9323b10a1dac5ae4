package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Jpx, PdfWriter, RealPdfExtractor}

/** JPEG 2000 codec ([[graft.sources.Jpx]]) end-to-end. Contracts:
  *
  *  1. encode∘decode is the IDENTITY on 8-bit grayscale (reversible 5/3,
  *     no quantization — lossless is the whole point), across image
  *     geometries, decomposition levels, and content shapes;
  *  2. the JP2 box wrapping decodes identically to the raw codestream;
  *  3. geometry comes from the DATA (SIZ), so a dict that lies cannot
  *     survive a real decode;
  *  4. out-of-subset streams (multi-component, quantized, POC…) and
  *     truncated/garbage input degrade to None — never throw, never
  *     loop;
  *  5. the PDF integration labels real JPX XObjects (raw AND JP2) from
  *     decoded pixels, keeps `undecoded` for undecodable payloads, and
  *     memoizes per object.
  */
class JpxSpec extends AnyFunSuite {

  private def roundTrip(img: Array[Array[Int]], levels: Int = 2): Unit = {
    val h = img.length
    val w = img(0).length
    val enc = Jpx.encode(img, levels)
    val dec = Jpx.decode(enc)
    assert(dec.isDefined, s"decode failed (${w}x$h levels=$levels)")
    val d = dec.get
    assert(d.width == w && d.height == h,
      s"geometry ${d.width}x${d.height} != ${w}x$h")
    d.pixels.zip(img).zipWithIndex.foreach { case ((got, want), y) =>
      assert(got.sameElements(want), s"row $y diverged (${w}x$h l=$levels)")
    }
  }

  test("lossless round-trip across the 60 fixture rasters") {
    (0 until 30).foreach { m =>
      val (w, h) = PdfWriter.jpxRawDims(m)
      roundTrip(PdfWriter.jpxRaster(m, w, h))
      val (w2, h2) = PdfWriter.jp2Dims(m)
      roundTrip(PdfWriter.jpxRaster(m + 3, w2, h2))
    }
  }

  test("round-trip across geometries, levels, and content shapes") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    for (levels <- 0 to 4) {
      roundTrip(gray(37, 29)((x, y) => x * 31 + y * 17), levels)
      roundTrip(gray(16, 16)((x, y) => if ((x / 4 + y / 4) % 2 == 0) 0 else 255),
        levels)
    }
    roundTrip(gray(1, 1)((_, _) => 77))
    roundTrip(gray(1, 9)((_, y) => y * 28), 2)
    roundTrip(gray(9, 1)((x, _) => x * 28), 2)
    roundTrip(gray(64, 64)((x, y) => (x * x + y * 3) % 256), 3)
    // larger than one code-block per subband at levels=0
    roundTrip(gray(130, 70)((x, y) => (x ^ y) & 0xFF), 0)
    roundTrip(gray(130, 70)((x, y) => (x ^ y) & 0xFF), 2)
    // flat images (all-zero code-blocks -> not-included path)
    roundTrip(gray(20, 12)((_, _) => 128), 2)
    roundTrip(gray(20, 12)((_, _) => 0), 2)
  }

  test("RGB round-trips losslessly through the reversible color transform") {
    def plane(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    for ((w, h, levels) <- Seq((21, 13, 2), (16, 16, 3), (7, 9, 1),
        (64, 33, 2))) {
      val r = plane(w, h)((x, y) => x * 37 + y * 5)
      val g = plane(w, h)((x, y) => x * 3 + y * 41 + 100)
      val b = plane(w, h)((x, y) => (x ^ y) * 19)
      val enc = Jpx.encodeRgb(r, g, b, levels)
      val d = Jpx.decode(enc)
      assert(d.isDefined && d.get.channels == 3, s"${w}x$h l=$levels")
      val Seq(dr, dg, db) = d.get.comps
      def eq(a: Array[Array[Int]], c: Array[Array[Int]], n: String): Unit =
        a.zip(c).zipWithIndex.foreach { case ((got, want), y) =>
          assert(got.sameElements(want), s"$n row $y (${w}x$h l=$levels)")
        }
      eq(dr, r, "R"); eq(dg, g, "G"); eq(db, b, "B")
      // extremes stress the RCT chroma range (±255) at depth
      val black = plane(w, h)((_, _) => 0)
      val white = plane(w, h)((_, _) => 255)
      val d2 = Jpx.decode(Jpx.encodeRgb(white, black, white, levels)).get
      assert(d2.comps(0).head.head == 255 && d2.comps(1).head.head == 0)
    }
    // multi-component without MCT (independent planes) also round-trips
    val p0 = plane(11, 8)((x, y) => x * 20 + y)
    val p1 = plane(11, 8)((x, y) => 255 - x * 9 - y * 3)
    val d3 = Jpx.decode(Jpx.encodeMulti(Seq(p0, p1), 2, rct = false)).get
    assert(d3.channels == 2)
    assert(d3.comps(0).flatten.toSeq == p0.flatten.toSeq &&
      d3.comps(1).flatten.toSeq == p1.flatten.toSeq)
    // and the JP2 wrap carries RGB too
    val rgb = Jpx.encodeRgb(plane(9, 7)((x, y) => x + y),
      plane(9, 7)((x, y) => x * y), plane(9, 7)((x, _) => x * 28))
    val viaJp2 = Jpx.decode(Jpx.wrapJp2(rgb, 9, 7, nc = 3))
    assert(viaJp2.isDefined && viaJp2.get.channels == 3)
  }

  test("JP2 box wrapping decodes identically to the raw codestream") {
    val img = PdfWriter.jpxRaster(5, 21, 13)
    val raw = Jpx.encode(img)
    val wrapped = Jpx.wrapJp2(raw, 21, 13)
    val a = Jpx.decode(raw).get
    val b = Jpx.decode(wrapped).get
    assert(a.graySum == b.graySum && b.width == 21 && b.height == 13)
    assert(a.pixels.map(_.toSeq).toSeq == b.pixels.map(_.toSeq).toSeq)
  }

  test("truncated and garbage input degrade to None, never throw or loop") {
    val enc = Jpx.encode(PdfWriter.jpxRaster(7, 19, 11))
    (0 until enc.length by 3).foreach(n => Jpx.decode(enc.take(n)))
    (0 until enc.length by 5).foreach { i =>
      val mut = enc.clone(); mut(i) = (mut(i) ^ 0x3C).toByte
      Jpx.decode(mut) // bounded, no throw
    }
    assert(Jpx.decode("jpx-stub-3".getBytes("ISO-8859-1")).isEmpty)
    assert(Jpx.decode(Array.empty[Byte]).isEmpty)
    assert(Jpx.decode(Array.fill(64)(0xFF.toByte)).isEmpty)
    // out-of-subset markers reject cleanly: flip Csiz to 3 components
    val multi = enc.clone()
    // Csiz is at offset 4 (SOC) + 2+2 (SIZ,Lsiz) + 2 (Rsiz) + 32 = 40,41
    multi(41) = 3
    assert(Jpx.decode(multi).isEmpty)
  }

  private def psnr(a: Array[Array[Int]], b: Array[Array[Int]]): Double = {
    var se = 0.0
    var n = 0
    for (y <- a.indices; x <- a(0).indices) {
      val d = a(y)(x) - b(y)(x); se += d.toDouble * d; n += 1
    }
    if (se == 0) 99.0 else 10 * math.log10(255.0 * 255.0 * n / se)
  }

  test("irreversible 9/7: exact geometry, PSNR floor, step monotonicity") {
    // the sawtooth raster is a worst case for a wavelet (full-range
    // discontinuities every 37 pixels); measured PSNR at step 1.0 is
    // ~50 dB, at 8.0 ~32 dB — floors hold 4+ dB of margin
    val errAt = Seq(1.0, 8.0).map { step =>
      val ps = (0 until 12).map { m =>
        val w = 17 + 2 * (m % 6); val h = 11 + m % 7
        val img = PdfWriter.jpxRaster(m, w, h)
        val enc = Jpx.encodeIrreversible(Seq(img), levels = 2, step = step)
        val d = Jpx.decode(enc).getOrElse(fail(s"decode failed m=$m"))
        assert(d.width == w && d.height == h, s"geometry m=$m step=$step")
        psnr(img, d.pixels)
      }
      step -> ps.min
    }.toMap
    assert(errAt(1.0) >= 45.0, f"step 1.0 PSNR floor: ${errAt(1.0)}%.1f dB")
    assert(errAt(8.0) >= 28.0, f"step 8.0 PSNR floor: ${errAt(8.0)}%.1f dB")
    assert(errAt(1.0) > errAt(8.0) + 6.0,
      "coarser quantization must cost fidelity (steps not actually used?)")
  }

  test("9/7 derived-style QCD (one signalled step) decodes within band") {
    val img = PdfWriter.jpxRaster(3, 21, 15)
    val enc = Jpx.encodeIrreversible(Seq(img), levels = 2, step = 1.0,
      derived = true)
    val d = Jpx.decode(enc).getOrElse(fail("derived decode failed"))
    assert(d.width == 21 && d.height == 15)
    assert(psnr(img, d.pixels) >= 40.0)
  }

  test("9/7 RGB through the irreversible color transform (ICT)") {
    val r = Array.tabulate(20, 24)((y, x) => (x * 9 + y * 5) % 256)
    val g = Array.tabulate(20, 24)((y, x) => (x * 3 + y * 13 + 40) % 256)
    val b = Array.tabulate(20, 24)((y, x) => (x * 11 + y * 2 + 90) % 256)
    val enc = Jpx.encodeIrreversible(Seq(r, g, b), levels = 2, step = 1.0,
      ict = true)
    val d = Jpx.decode(enc).getOrElse(fail("ICT decode failed"))
    assert(d.width == 24 && d.height == 20 && d.channels == 3)
    assert(psnr(r, d.comps(0)) >= 38.0)
    assert(psnr(g, d.comps(1)) >= 38.0)
    assert(psnr(b, d.comps(2)) >= 38.0)
  }

  test("9/7 JP2-wrapped decodes; truncations and bit flips never throw") {
    val img = PdfWriter.jpxRaster(5, 19, 13)
    val enc = Jpx.encodeIrreversible(Seq(img), levels = 2, step = 2.0)
    val d = Jpx.decode(Jpx.wrapJp2(enc, 19, 13))
      .getOrElse(fail("JP2-wrapped 9/7 decode failed"))
    assert(d.width == 19 && d.height == 13)
    assert(psnr(img, d.pixels) >= 38.0)
    (0 until enc.length by 3).foreach(n => Jpx.decode(enc.take(n)))
    (0 until enc.length by 5).foreach { i =>
      val mut = enc.clone(); mut(i) = (mut(i) ^ 0x3C).toByte
      Jpx.decode(mut) // bounded, no throw
    }
  }

  test("the p16 fixture's quantized stream: dims truthful, ink in band") {
    (0 until 30).foreach { m =>
      val (iw, ih) = PdfWriter.i97Dims(m)
      val img = PdfWriter.jpxRaster(m + 7, iw, ih)
      val trueSum = img.map(_.map(_.toLong).sum).sum
      val enc = Jpx.encodeIrreversible(Seq(img), step = PdfWriter.I97Step)
      val d = Jpx.decode(enc).getOrElse(fail(s"m=$m decode failed"))
      assert(d.width == iw && d.height == ih, s"m=$m geometry")
      val err = math.abs(d.graySum - trueSum)
      assert(err <= 300, s"m=$m ink error $err outside the p16 band")
      assert(err > 0 || m % 5 == 4, // quantization IS lossy on most seeds
        s"m=$m decoded losslessly at step ${PdfWriter.I97Step}?")
    }
  }

  test("subsampled YCbCr (4:2:0/4:2:2/4:4:0/4:1:1) round-trips " +
      "losslessly; chroma upsamples by sample replication") {
    def plane(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    for ((w, h, xr, yr, levels) <- Seq(
        (24, 16, 2, 2, 2), // 4:2:0, even dims
        (21, 13, 2, 2, 2), // 4:2:0, odd dims (ceil chroma grid)
        (32, 20, 2, 1, 3), // 4:2:2
        (19, 11, 1, 2, 1), // 4:4:0
        (40, 12, 4, 1, 2), // 4:1:1 (the DV-lineage factor-4 form)
        (23, 9, 4, 1, 1), // 4:1:1, odd dims
        (32, 16, 4, 2, 1), // factor 4 on x, 2 on y
        (8, 8, 2, 2, 0))) { // no decomposition
      val cw = (w + xr - 1) / xr
      val chh = (h + yr - 1) / yr
      val yp = plane(w, h)((x, y) => x * 7 + y * 3)
      val cb = plane(cw, chh)((x, y) => x * 11 + y * 5 + 40)
      val cr = plane(cw, chh)((x, y) => (x ^ y) * 13 + 90)
      val tag = s"${w}x$h $xr:$yr l=$levels"
      val enc = Jpx.encodeMulti(Seq(yp, cb, cr), levels,
        sub = Seq((1, 1), (xr, yr), (xr, yr)))
      val d = Jpx.decode(enc).getOrElse(fail(s"decode failed ($tag)"))
      assert(d.width == w && d.height == h && d.channels == 3, tag)
      // Y (full-res) is exactly lossless
      d.comps(0).zip(yp).zipWithIndex.foreach { case ((got, want), y) =>
        assert(got.sameElements(want), s"Y row $y diverged ($tag)")
      }
      // chroma = the original subsampled samples replicated onto the
      // reference grid (T.800 B.2's component-grid mapping; lossless
      // because 5/3 reconstructs the subsampled plane exactly)
      for ((decoded, orig, name) <- Seq((d.comps(1), cb, "Cb"),
          (d.comps(2), cr, "Cr")); y <- 0 until h; x <- 0 until w)
        assert(decoded(y)(x) == orig(y / yr)(x / xr),
          s"$name($x,$y) != source(${x / xr},${y / yr}) ($tag)")
      // JP2 wrapping unchanged
      assert(Jpx.decode(Jpx.wrapJp2(enc, w, h, 3)).exists(
        _.graySum == d.graySum), tag)
    }
  }

  test("tiled subsampled codestream assembles exactly") {
    // tile dims must divide by factor << levels (16 % (2<<2) == 0) so
    // component-tile origins stay even at every DWT level
    val (w, h, levels) = (48, 32, 2)
    def plane(pw: Int, ph: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(ph, pw)((y, x) => f(x, y) & 0xFF)
    val yp = plane(w, h)((x, y) => (x * 5) ^ (y * 9))
    val cb = plane(w / 2, h / 2)((x, y) => x * 13 + y * 7 + 30)
    val cr = plane(w / 2, h / 2)((x, y) => x * 3 + y * 17 + 80)
    val sub = Seq((1, 1), (2, 2), (2, 2))
    val single = Jpx.decode(Jpx.encodeMulti(Seq(yp, cb, cr), levels,
      sub = sub)).getOrElse(fail("untiled decode failed"))
    val enc = Jpx.encodeMulti(Seq(yp, cb, cr), levels, tileW = 16,
      tileH = 16, sub = sub)
    val d = Jpx.decode(enc).getOrElse(fail("tiled subsampled decode failed"))
    assert(d.width == w && d.height == h && d.channels == 3)
    for (c <- 0 until 3; y <- 0 until h)
      assert(d.comps(c)(y).sameElements(single.comps(c)(y)),
        s"tiled comp $c row $y != untiled")
    // misaligned-in-the-component-domain grid must REJECT: 4 satisfies
    // the full-res comp's 1<<levels = 4 but not chroma's 2<<levels = 8
    assertThrows[IllegalArgumentException] {
      Jpx.encodeMulti(Seq(yp, cb, cr), levels, tileW = 4, tileH = 16,
        sub = sub)
    }
    // factor-4 tiling: 8 % (4<<2) != 0 rejects (aligned for comp 0's
    // 1<<2 = 4 but not chroma's 4<<2 = 16); 32 % (4<<2) == 0 assembles
    // to the untiled pixels
    val cb4 = plane(w / 4, h)((x, y) => x * 13 + y * 7 + 30)
    val cr4 = plane(w / 4, h)((x, y) => x * 3 + y * 17 + 80)
    val sub4 = Seq((1, 1), (4, 1), (4, 1))
    assertThrows[IllegalArgumentException] {
      Jpx.encodeMulti(Seq(yp, cb4, cr4), levels, tileW = 8, tileH = 16,
        sub = sub4)
    }
    val single4 = Jpx.decode(Jpx.encodeMulti(Seq(yp, cb4, cr4), levels,
      sub = sub4)).getOrElse(fail("untiled 4:1:1 decode failed"))
    val tiled4 = Jpx.decode(Jpx.encodeMulti(Seq(yp, cb4, cr4), levels,
      tileW = 32, tileH = 16, sub = sub4))
      .getOrElse(fail("tiled 4:1:1 decode failed"))
    for (c <- 0 until 3; y <- 0 until h)
      assert(tiled4.comps(c)(y).sameElements(single4.comps(c)(y)),
        s"tiled 4:1:1 comp $c row $y != untiled")
  }

  test("subsampled 9/7 decodes within the quantizer band") {
    val (w, h) = (30, 22)
    val yp = Array.tabulate(h, w)((y, x) => (x * 9 + y * 4) % 256)
    val cb = Array.tabulate(h / 2, w / 2)((y, x) => (x * 6 + y * 11 + 50) % 256)
    val cr = Array.tabulate(h / 2, w / 2)((y, x) => (x * 2 + y * 3 + 120) % 256)
    val enc = Jpx.encodeIrreversible(Seq(yp, cb, cr), levels = 2,
      step = 1.0, sub = Seq((1, 1), (2, 2), (2, 2)))
    val d = Jpx.decode(enc).getOrElse(fail("subsampled 9/7 decode failed"))
    assert(d.width == w && d.height == h && d.channels == 3)
    assert(psnr(yp, d.comps(0)) >= 40.0)
    // chroma PSNR measured against the REPLICATED source (the decode's
    // contract), not an interpolation
    val cbUp = Array.tabulate(h, w)((y, x) => cb(y / 2)(x / 2))
    val crUp = Array.tabulate(h, w)((y, x) => cr(y / 2)(x / 2))
    assert(psnr(cbUp, d.comps(1)) >= 40.0)
    assert(psnr(crUp, d.comps(2)) >= 40.0)
  }

  test("out-of-scope subsampling forms reject — encoder and decoder") {
    val yp = Array.tabulate(16, 16)((y, x) => (x + y) % 256)
    val c2 = Array.tabulate(8, 8)((y, x) => (x * y) % 256)
    // encoder: factors outside {1,2,4}, wrong plane dims, MCT with
    // subsampling
    assertThrows[IllegalArgumentException] {
      Jpx.encodeMulti(Seq(yp, c2, c2), sub = Seq((1, 1), (3, 1), (3, 1)))
    }
    assertThrows[IllegalArgumentException] {
      Jpx.encodeMulti(Seq(yp, yp, c2), sub = Seq((1, 1), (2, 2), (2, 2)))
    }
    assertThrows[IllegalArgumentException] {
      Jpx.encodeMulti(Seq(yp, c2, c2), rct = true,
        sub = Seq((1, 1), (2, 2), (2, 2)))
    }
    // decoder: patch a valid 4:2:0 stream's SIZ/COD bytes. Layout from
    // the encoder: SOC [0,2), SIZ len at [4,6), SIZ payload at 6 —
    // comp c's (Ssiz, XRsiz, YRsiz) at 42+3c — COD at 51, SGcod's MCT
    // byte at 59 (see encodeCore's marker assembly).
    val enc = Jpx.encodeMulti(Seq(yp, c2, c2),
      sub = Seq((1, 1), (2, 2), (2, 2)))
    assert(Jpx.decode(enc).isDefined)
    // 3 stays OUT of the widened {1,2,4} scope: no wild chroma form
    // uses it, and a factor patched under mismatched plane data must
    // reject upfront, not mis-parse
    val xr3 = enc.clone(); xr3(46) = 3 // comp 1 XRsiz = 3
    assert(Jpx.decode(xr3).isEmpty, "XRsiz=3 must stay undecoded")
    val xr8 = enc.clone(); xr8(46) = 8 // comp 1 XRsiz = 8
    assert(Jpx.decode(xr8).isEmpty, "XRsiz=8 must stay undecoded")
    // an IN-scope factor patched over data coded at a different factor:
    // when the factor change alters the packet STRUCTURE (different
    // code-block counts), the parse desyncs and the unconsumed-tile-part
    // guard rejects. (A structure-preserving patch — tiny planes where
    // both factors give one block per band — yields a syntactically
    // valid stream describing a different image, the same undetectable
    // class as a coefficient byte flip; conformant decoders decode
    // those too.) 320 wide at levels=0: factor-2 chroma = 160 = 3
    // blocks, factor-4 = 80 = 2 blocks — structure differs.
    val ypw = Array.tabulate(8, 320)((y, x) => (x * 3 + y) % 256)
    val c2w = Array.tabulate(8, 160)((y, x) => (x + y * 7 + 30) % 256)
    val encW = Jpx.encodeMulti(Seq(ypw, c2w, c2w), levels = 0,
      sub = Seq((1, 1), (2, 1), (2, 1)))
    assert(Jpx.decode(encW).isDefined)
    val xr4 = encW.clone(); xr4(46) = 4 // comp 1 XRsiz = 4 over 2-coded data
    assert(Jpx.decode(xr4).isEmpty,
      "a structure-changing in-scope factor patch must stay undecoded")
    val comp0Sub = enc.clone(); comp0Sub(43) = 2 // comp 0 XRsiz = 2
    assert(Jpx.decode(comp0Sub).isEmpty,
      "subsampled component 0 must stay undecoded")
    val mctSub = enc.clone(); mctSub(59) = 1 // MCT over subsampled comps
    assert(Jpx.decode(mctSub).isEmpty,
      "MCT with non-identical component sizes must stay undecoded")
  }

  test("POC progression-order changes round-trip; partial coverage and " +
      "bad entries reject") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    val img = gray(40, 28)((x, y) => (x * 9 + y * 5) % 256)
    val (levels, layers) = (2, 3)
    val plain = Jpx.decode(Jpx.encodeMulti(Seq(img), levels,
      layers = layers)).getOrElse(fail("plain decode failed"))
    // resolution 0 first (RPCL), then everything else layer-major — a
    // two-entry POC whose union covers every packet exactly once
    val poc2 = Seq((0, 0, layers, 1, 1, 2), (0, 0, layers, levels + 1, 1, 0))
    val enc = Jpx.encodeMulti(Seq(img), levels, layers = layers, poc = poc2)
    val d = Jpx.decode(enc).getOrElse(fail("POC decode failed"))
    assert(d.pixels.map(_.toSeq).toSeq == img.map(_.toSeq).toSeq,
      "POC stream not lossless")
    assert(d.graySum == plain.graySum)
    // POC + tiling + multi-component + subsampling compose
    val yp = gray(32, 16)((x, y) => x * 3 + y * 7)
    val cb = gray(16, 8)((x, y) => x * 5 + y * 11 + 30)
    val cr = gray(16, 8)((x, y) => (x ^ y) * 9 + 70)
    val sub = Seq((1, 1), (2, 2), (2, 2))
    val poc3 = Seq((0, 0, 2, levels + 1, 1, 1), // comp 0 first, RLCP
      (0, 1, 2, levels + 1, 3, 4)) // chroma, CPRL
    val encS = Jpx.encodeMulti(Seq(yp, cb, cr), levels, layers = 2,
      tileW = 16, tileH = 16, sub = sub, poc = poc3)
    val dS = Jpx.decode(encS).getOrElse(fail("POC+tiled+sub decode failed"))
    val dPlain = Jpx.decode(Jpx.encodeMulti(Seq(yp, cb, cr), levels,
      layers = 2, tileW = 16, tileH = 16, sub = sub)).get
    assert(dS.graySum == dPlain.graySum)
    for (c <- 0 until 3; y <- 0 until 16)
      assert(dS.comps(c)(y).sameElements(dPlain.comps(c)(y)),
        s"POC comp $c row $y != plain")
    // encoder rejects a POC that does not cover every packet
    assertThrows[IllegalArgumentException] {
      Jpx.encodeMulti(Seq(img), levels, layers = layers,
        poc = Seq((0, 0, layers, 1, 1, 2)))
    }
    // decoder rejects byte-patched partial coverage / unknown
    // progression. Single-entry POC layout for nc=1: SIZ [2,45), COD
    // [45,59), POC at 59 — entry bytes rs@63 cs@64 lye@65-66 re@67
    // ce@68 pp@69 (see encodeCore's marker assembly)
    val enc1 = Jpx.encodeMulti(Seq(img), levels, layers = layers,
      poc = Seq((0, 0, layers, levels + 1, 1, 1)))
    assert(Jpx.decode(enc1).isDefined)
    val shortLye = enc1.clone(); shortLye(65) = 0; shortLye(66) = 1
    assert(Jpx.decode(shortLye).isEmpty,
      "partial-coverage POC must stay undecoded")
    val badPp = enc1.clone(); badPp(69) = 7
    assert(Jpx.decode(badPp).isEmpty, "unknown Ppoc must stay undecoded")
  }

  test("multiple quality layers round-trip losslessly in every count") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    val img = gray(50, 34)((x, y) => (x * 7 + y * 13) % 256)
    val single = Jpx.decode(Jpx.encodeMulti(Seq(img))).get
    for (layers <- Seq(2, 3, 5, 8, 17)) {
      val enc = Jpx.encodeMulti(Seq(img), layers = layers)
      val d = Jpx.decode(enc).getOrElse(fail(s"layers=$layers"))
      assert(d.pixels.map(_.toSeq).toSeq == img.map(_.toSeq).toSeq,
        s"layers=$layers not lossless")
      assert(d.graySum == single.graySum)
      // more layers than any block has passes: empty contributions
      val sparse = Jpx.encodeMulti(Seq(gray(12, 9)((_, _) => 128)),
        layers = layers)
      assert(Jpx.decode(sparse).exists(_.pixels(0)(0) == 128))
    }
    // layers split the body across packets: streams must actually grow
    val l1 = Jpx.encodeMulti(Seq(img), layers = 1)
    val l8 = Jpx.encodeMulti(Seq(img), layers = 8)
    assert(l8.length > l1.length, "multi-layer headers cost bytes")
  }

  test("all five progression orders round-trip, single- and multi-layer") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    val r = gray(33, 21)((x, y) => x * 5 + y * 11)
    val g = gray(33, 21)((x, y) => 250 - x * 3 - y * 2)
    val b = gray(33, 21)((x, y) => (x * y) % 256)
    for (prog <- 0 to 4; layers <- Seq(1, 3)) {
      val enc = Jpx.encodeMulti(Seq(r, g, b), rct = true, layers = layers,
        prog = prog)
      val d = Jpx.decode(enc).getOrElse(fail(s"prog=$prog layers=$layers"))
      assert(d.channels == 3)
      assert(d.comps(0).map(_.toSeq).toSeq == r.map(_.toSeq).toSeq &&
        d.comps(1).map(_.toSeq).toSeq == g.map(_.toSeq).toSeq &&
        d.comps(2).map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
        s"prog=$prog layers=$layers diverged")
      // component-major packet bodies are genuinely reordered vs LRCP:
      // the streams differ, yet decode to the same raster
      if (prog >= 3 && layers == 1) {
        val lrcp = Jpx.encodeMulti(Seq(r, g, b), rct = true)
        assert(!enc.sameElements(lrcp), "PCRL must reorder packets")
      }
    }
  }

  test("tiled codestreams: independent tile domains, exact assembly") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    // even grid, ragged right/bottom edges, deep levels, single column
    for ((w, h, tw, th, lv) <- Seq((64, 48, 32, 16, 2), (70, 45, 32, 16, 2),
        (40, 40, 8, 8, 3), (33, 50, 64, 16, 2), (17, 11, 4, 4, 1))) {
      val img = gray(w, h)((x, y) => (x * 31 + y * 17 + (x ^ y)) % 256)
      val enc = Jpx.encodeMulti(Seq(img), levels = lv, tileW = tw,
        tileH = th)
      val d = Jpx.decode(enc).getOrElse(fail(s"${w}x$h t=${tw}x$th"))
      assert(d.width == w && d.height == h)
      assert(d.pixels.map(_.toSeq).toSeq == img.map(_.toSeq).toSeq,
        s"${w}x$h tiles ${tw}x$th levels=$lv not lossless")
    }
    // RGB + RCT across tiles
    val r = gray(48, 32)((x, y) => x * 4 + y)
    val g = gray(48, 32)((x, y) => 200 - x - y * 3)
    val b = gray(48, 32)((x, y) => (x * x + y) % 256)
    val rgb = Jpx.decode(Jpx.encodeMulti(Seq(r, g, b), rct = true,
      tileW = 16, tileH = 16)).get
    assert(rgb.comps(0).map(_.toSeq).toSeq == r.map(_.toSeq).toSeq &&
      rgb.comps(2).map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // tile dims that break the 2^levels alignment are refused up front
    intercept[IllegalArgumentException] {
      Jpx.encodeMulti(Seq(gray(20, 20)((x, y) => x + y)), levels = 2,
        tileW = 10, tileH = 8)
    }
  }

  test("tiled + multi-layer + RPCL: the full wild-stream shape") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    val img = gray(72, 40)((x, y) => (x * 13 + y * 29) % 256)
    for (prog <- 0 to 4) {
      val enc = Jpx.encodeMulti(Seq(img), layers = 4, prog = prog,
        tileW = 32, tileH = 24)
      val d = Jpx.decode(enc).getOrElse(fail(s"prog=$prog"))
      assert(d.pixels.map(_.toSeq).toSeq == img.map(_.toSeq).toSeq,
        s"tiled multi-layer prog=$prog not lossless")
    }
    // and the irreversible pipeline through the same machinery
    val enc97 = Jpx.encodeIrreversible(Seq(img), step = 2.0, layers = 3,
      prog = 2, tileW = 32, tileH = 24)
    val d97 = Jpx.decode(enc97).getOrElse(fail("tiled 9/7"))
    assert(d97.width == 72 && d97.height == 40)
    assert(psnr(img, d97.pixels) >= 34.0,
      "tiled quantized decode lost the PSNR floor")
    // fuzz the combined form: truncations and bit flips never throw
    val enc = Jpx.encodeMulti(Seq(img), layers = 3, prog = 4,
      tileW = 32, tileH = 24)
    (0 until enc.length by 7).foreach(n => Jpx.decode(enc.take(n)))
    (0 until enc.length by 11).foreach { i =>
      val mut = enc.clone(); mut(i) = (mut(i) ^ 0x5A).toByte
      Jpx.decode(mut) // bounded, no throw
    }
  }

  test("hostile tile grids reject: misaligned, bombed, or short streams") {
    val enc = Jpx.encodeMulti(Seq(Array.tabulate(16, 16)((y, x) => x + y)),
      levels = 2)
    // XTsiz=1: 16 tiles whose origins break 2^levels parity
    val mis = enc.clone()
    for (b <- 0 until 4) mis(24 + b) = 0
    mis(27) = 1
    assert(Jpx.decode(mis).isEmpty, "misaligned tile width must reject")
    // XTsiz=4 is aligned (4 = 2^2) and makes a 4x4 grid — but the
    // stream carries one SOT, so the decode must refuse at EOC rather
    // than return a quarter-decoded raster
    val short = enc.clone()
    for (b <- 0 until 4) short(24 + b) = 0
    short(27) = 4
    assert(Jpx.decode(short).isEmpty, "missing tile-parts must reject")
  }

  test("Psot=0 (last tile-part runs to EOC) decodes; earlier tiles reject") {
    def sotOffsets(enc: Array[Byte]): Seq[Int] =
      (0 until enc.length - 1).filter(i =>
        (enc(i) & 0xFF) == 0xFF && (enc(i + 1) & 0xFF) == 0x90)
    def zeroPsot(enc: Array[Byte], sot: Int): Array[Byte] = {
      val mut = enc.clone()
      for (b <- 0 until 4) mut(sot + 6 + b) = 0 // marker,Lsot,Isot then Psot
      mut
    }
    val img = Array.tabulate(24, 40)((y, x) => (x * 3 + y * 7) % 256)
    val single = Jpx.encode(img)
    val s0 = sotOffsets(single)
    assert(s0.length == 1)
    val dS = Jpx.decode(zeroPsot(single, s0.head))
    assert(dS.exists(_.pixels.map(_.toSeq).toSeq == img.map(_.toSeq).toSeq),
      "single-tile Psot=0 must still decode (T.800 A.4.2)")
    val tiled = Jpx.encodeMulti(Seq(img), tileW = 20, tileH = 12)
    val sT = sotOffsets(tiled).filter { i => // real SOTs have Lsot=10
      (tiled(i + 2) & 0xFF) == 0 && (tiled(i + 3) & 0xFF) == 10
    }
    assert(sT.length == 4)
    val dLast = Jpx.decode(zeroPsot(tiled, sT.last))
    assert(dLast.exists(_.pixels.map(_.toSeq).toSeq == img.map(_.toSeq).toSeq),
      "last-tile Psot=0 must still decode")
    assert(Jpx.decode(zeroPsot(tiled, sT.head)).isEmpty,
      "Psot=0 on a non-final tile-part must reject")
  }

  test("main-header markers after the first tile-part reject") {
    val img = Array.tabulate(16, 16)((y, x) => x * y % 256)
    val enc = Jpx.encode(img)
    // splice a copy of the main-header SIZ segment between the tile
    // data and EOC: a decoder that keeps honoring it could re-pin w/h
    // after the pixels were assembled (a lying Some)
    val lsiz = ((enc(4) & 0xFF) << 8) | (enc(5) & 0xFF)
    val siz = enc.slice(2, 2 + 2 + lsiz)
    val mut = enc.dropRight(2) ++ siz ++ enc.takeRight(2)
    assert(Jpx.decode(mut).isEmpty, "post-SOT SIZ must reject")
  }

  test("hostile SIZ dims that overflow the Long pixel product reject") {
    // xs*ys*nc on u32-max dims wraps past 2^63 to a negative product
    // that would sneak under the old single-multiplication cap while
    // the truncated toInt dims demand huge planes (ADVICE r9, high)
    val enc = Jpx.encode(PdfWriter.jpxRaster(5, 16, 16))
    for (dim <- Seq(0xFFFFFFFFL, 0x80001000L, 0x10000000L)) {
      val mut = enc.clone()
      // SIZ: SOC(0-1) FF51(2-3) Lsiz(4-5) Rsiz(6-7) Xsiz@8 Ysiz@12
      // XTsiz@24 YTsiz@28 — tiles must cover the image or the earlier
      // xt<xs guard fires before the cap under test
      for (off <- Seq(8, 12, 24, 28); b <- 0 until 4)
        mut(off + b) = ((dim >>> (8 * (3 - b))) & 0xFF).toByte
      assert(Jpx.decode(mut).isEmpty, f"dim=0x$dim%x must reject")
    }
  }

  test("the dict cannot lie: decoded geometry and gray-sum beat the dict") {
    (0 until 30).foreach { m =>
      val paras = Seq(s"jpx doc $m", "second paragraph")
      val pages = Seq(PdfWriter.PageSpec(paras, Map(0 -> 3)))
      val bytes = PdfWriter.buildJpxScan(pages, compress = m % 2 == 0,
        seed = m)
      val imgs = RealPdfExtractor.extract(s"jpx-$m.pdf", bytes)
        .filter(_.isImage).map(_.content)
      val (w0, h0) = PdfWriter.jpxRawDims(m)
      val s0 = (for (y <- 0 until h0; x <- 0 until w0)
        yield PdfWriter.jpxPixel(m, x, y).toLong).sum
      assert(imgs.exists(_ == s"Im0 ${w0}x$h0 jpx s$s0"),
        s"m=$m: raw codestream not decoded truthfully: $imgs")
      val (w1, h1) = PdfWriter.jp2Dims(m)
      val s1 = (for (y <- 0 until h1; x <- 0 until w1)
        yield PdfWriter.jpxPixel(m + 3, x, y).toLong).sum
      assert(imgs.exists(_ == s"Im1 ${w1}x$h1 jpx s$s1"),
        s"m=$m: JP2-wrapped stream not decoded truthfully: $imgs")
      val (sw, sh) = PdfWriter.jpxDims(m)
      assert(imgs.exists(_ == s"Im2 ${sw}x$sh jpx undecoded"),
        s"m=$m: stub must stay undecoded with honest dims: $imgs")
    }
  }

  test("the 4:2:0 PDF form decodes truthfully: lying dims beaten, " +
      "exact replicated ink") {
    (0 until 30).foreach { m =>
      val pages = Seq(PdfWriter.PageSpec(Seq(s"y420 doc $m"), Map(0 -> 5)))
      val bytes = PdfWriter.buildJpxScan(pages, compress = m % 2 == 0,
        seed = m)
      val imgs = RealPdfExtractor.extract(s"y420-$m.pdf", bytes)
        .filter(_.isImage).map(_.content)
      val (w, h) = PdfWriter.y420Dims(m)
      val ySum = (for (y <- 0 until h; x <- 0 until w)
        yield PdfWriter.jpxPixel(m + 11, x, y).toLong).sum
      val cSum = (for (y <- 0 until h / 2; x <- 0 until w / 2) yield
        (PdfWriter.jpxPixel(m + 13, x, y) +
          PdfWriter.jpxPixel(m + 17, x, y)).toLong).sum
      val want = s"Im4 ${w}x$h jpx c3 s${ySum + 4 * cSum}"
      assert(imgs.contains(want),
        s"m=$m: 4:2:0 image not decoded truthfully (want $want): $imgs")
    }
  }

  test("the 4:1:1 PDF form decodes truthfully: factor-4 chroma " +
      "replication, exact ink") {
    (0 until 30).foreach { m =>
      val pages = Seq(PdfWriter.PageSpec(Seq(s"y411 doc $m"), Map(0 -> 6)))
      val bytes = PdfWriter.buildJpxScan(pages, compress = m % 2 == 0,
        seed = m)
      val imgs = RealPdfExtractor.extract(s"y411-$m.pdf", bytes)
        .filter(_.isImage).map(_.content)
      val (w, h) = PdfWriter.y411Dims(m)
      val ySum = (for (y <- 0 until h; x <- 0 until w)
        yield PdfWriter.jpxPixel(m + 19, x, y).toLong).sum
      val cSum = (for (y <- 0 until h; x <- 0 until w / 4) yield
        (PdfWriter.jpxPixel(m + 23, x, y) +
          PdfWriter.jpxPixel(m + 29, x, y)).toLong).sum
      val want = s"Im5 ${w}x$h jpx c3 s${ySum + 4 * cSum}"
      assert(imgs.contains(want),
        s"m=$m: 4:1:1 image not decoded truthfully (want $want): $imgs")
    }
  }

  test("explicit precincts (B.6): multi-precinct grids round-trip across " +
      "all orders and layer counts, clamping the code-blocks") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    val img = gray(130, 70)((x, y) => (x * 7 + y * 13) % 256)
    val want = img.map(_.toSeq).toSeq
    // PPx = 3..5: multiple precincts at every resolution AND code-blocks
    // clamped well below 64 (r=0: 8×16; band precincts 4×8 at r=1 -> 4×8
    // blocks) — the positional orders iterate a real precinct grid
    for (prog <- 0 to 4; layers <- Seq(1, 3)) {
      val enc = Jpx.encodeMulti(Seq(img), levels = 2, layers = layers,
        prog = prog, prec = Seq((3, 4), (4, 3), (5, 5)))
      val d = Jpx.decode(enc)
        .getOrElse(fail(s"precinct decode failed: prog=$prog l=$layers"))
      assert(d.width == 130 && d.height == 70)
      assert(d.pixels.map(_.toSeq).toSeq == want,
        s"precinct stream not lossless at prog=$prog layers=$layers")
    }
    // PPx = 0 is legal at r = 0 only (1×1 resolution-0 precincts)
    val enc0 = Jpx.encodeMulti(Seq(gray(24, 18)((x, y) => x * 11 + y * 3)),
      levels = 1, prec = Seq((0, 0), (2, 2)))
    assert(Jpx.decode(enc0).exists(_.pixels.map(_.toSeq).toSeq ==
      gray(24, 18)((x, y) => x * 11 + y * 3).map(_.toSeq).toSeq))
    assertThrows[IllegalArgumentException] { // r>0 PPx=0 rejects
      Jpx.encodeMulti(Seq(img), levels = 1, prec = Seq((2, 2), (0, 2)))
    }
    // 9/7 pipeline composes: within the quantizer band, geometry exact
    val encQ = Jpx.encodeIrreversible(Seq(img), levels = 2, step = 1.0,
      prec = Seq((4, 4), (4, 4), (5, 5)))
    val dQ = Jpx.decode(encQ).getOrElse(fail("9/7 precinct decode failed"))
    assert(dQ.width == 130 && dQ.height == 70)
    val mse = (for (y <- 0 until 70; x <- 0 until 130)
      yield { val e = dQ.pixels(y)(x) - img(y)(x); (e * e).toDouble }).sum /
      (130 * 70)
    assert(mse < 4.0, s"9/7 precinct reconstruction off-band: mse=$mse")
    // JP2 wrap decodes identically
    val raw = Jpx.encodeMulti(Seq(img), levels = 2,
      prec = Seq((4, 4), (4, 4), (4, 4)))
    val wrapped = Jpx.wrapJp2(raw, 130, 70, 1)
    assert(Jpx.decode(wrapped).map(_.graySum) == Jpx.decode(raw).map(_.graySum))
  }

  test("explicit precincts compose with tiles, subsampling and POC; " +
      "misaligned tile grids and r>0 zero exponents reject") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    // aligned tiled + subsampled + explicit precincts: tileW/xr = 16 is
    // a multiple of 2^(levels - r + ppx) for every (r, ppx) below
    val yp = gray(64, 32)((x, y) => x * 3 + y * 7)
    val cb = gray(32, 16)((x, y) => x * 5 + y * 11 + 30)
    val cr = gray(32, 16)((x, y) => (x ^ y) * 9 + 70)
    val sub = Seq((1, 1), (2, 2), (2, 2))
    val prec = Seq((2, 2), (3, 3), (3, 3))
    val enc = Jpx.encodeMulti(Seq(yp, cb, cr), levels = 2, layers = 2,
      prog = 2, tileW = 32, tileH = 32, sub = sub, prec = prec)
    val d = Jpx.decode(enc).getOrElse(fail("tiled+sub+prec decode failed"))
    val dPlain = Jpx.decode(Jpx.encodeMulti(Seq(yp, cb, cr), levels = 2,
      layers = 2, prog = 2, tileW = 32, tileH = 32, sub = sub)).get
    assert(d.graySum == dPlain.graySum)
    for (c <- 0 until 3; y <- 0 until 32)
      assert(d.comps(c)(y).sameElements(dPlain.comps(c)(y)),
        s"precinct comp $c row $y != plain")
    // POC over a precinct grid: volumes cover every (r,c,l,precinct)
    val img = gray(48, 32)((x, y) => (x * 9 + y * 5) % 256)
    val poc2 = Seq((0, 0, 2, 1, 1, 2), (0, 0, 2, 3, 1, 0))
    val encP = Jpx.encodeMulti(Seq(img), levels = 2, layers = 2,
      poc = poc2, prec = Seq((3, 3), (3, 3), (4, 4)))
    val dP = Jpx.decode(encP).getOrElse(fail("POC+prec decode failed"))
    assert(dP.pixels.map(_.toSeq).toSeq == img.map(_.toSeq).toSeq)
    // encoder rejects a tile grid that misaligns the precinct anchors
    assertThrows[IllegalArgumentException] {
      Jpx.encodeMulti(Seq(img), levels = 1, tileW = 8, tileH = 8,
        prec = Seq((4, 4), (4, 4)))
    }
    // ADVICE r12: PPx=0 at r=0 means the r=0 modulus check used to be
    // skipped entirely (the ppx<=r skip was only sound when that check
    // ran) — the gate now tests every resolution, so levels=2 +
    // prec=((0,0),(1,1),(1,1)) + tileW=2 rejects at the alignment gate
    // itself (and independently at the tile-origin evenness gate)
    assertThrows[IllegalArgumentException] {
      Jpx.encodeMulti(Seq(gray(4, 8)((x, y) => x + y)), levels = 2,
        tileW = 2, tileH = 8, prec = Seq((0, 0), (1, 1), (1, 1)))
    }
    // decoder: byte-patch the COD precinct bytes of an ALIGNED tiled
    // stream to a misaligning size — honest None, never a desynced Some
    val tiled = Jpx.encodeMulti(Seq(img), levels = 1, layers = 1,
      tileW = 16, tileH = 16, prec = Seq((3, 3), (3, 3)))
    assert(Jpx.decode(tiled).isDefined)
    val codAt = { // find COD: SOC(2) then SIZ(2+len), COD marker next
      var q = 4 + (((tiled(4) & 0xFF) << 8) | (tiled(5) & 0xFF))
      assert(((tiled(q) & 0xFF) << 8 | (tiled(q + 1) & 0xFF)) == 0xFF52)
      q
    }
    // marker(2) len(2) Scod prog layers(2) mct levels xcb ycb style wav
    val precByte0 = codAt + 14
    val patched = tiled.clone()
    patched(precByte0) = 0x66.toByte // r0: 6,6 — 64 > the 16px tile at r... misaligned
    assert(Jpx.decode(patched).isEmpty,
      "misaligned precinct grid must stay undecoded")
    // r>0 zero exponent byte-patches reject too
    val zeroExp = tiled.clone()
    zeroExp(precByte0 + 1) = 0x30.toByte // r1: PPx=0
    assert(Jpx.decode(zeroExp).isEmpty,
      "r>0 zero precinct exponent must stay undecoded")
    // hostile POC entry-count bomb (>64 entries) rejects before any
    // sequence expansion — splice 64 duplicate entries into the POC
    // segment of a valid single-entry-POC stream
    val enc1 = Jpx.encodeMulti(Seq(img), levels = 2, layers = 2,
      poc = Seq((0, 0, 2, 3, 1, 1)))
    assert(Jpx.decode(enc1).isDefined)
    val pocAt = { // SOC SIZ COD, then POC (this encoder's layout)
      var q = 4 + (((enc1(4) & 0xFF) << 8) | (enc1(5) & 0xFF))
      q += 2 + (((enc1(q + 2) & 0xFF) << 8) | (enc1(q + 3) & 0xFF)) // COD
      assert(((enc1(q) & 0xFF) << 8 | (enc1(q + 1) & 0xFF)) == 0xFF5F)
      q
    }
    val entry = enc1.slice(pocAt + 4, pocAt + 11) // the 7 entry bytes
    val bomb = enc1.take(pocAt + 11) ++
      Array.fill(64)(entry).flatten ++ enc1.drop(pocAt + 11)
    val newLen = 2 + 7 * 65
    bomb(pocAt + 2) = (newLen >> 8).toByte
    bomb(pocAt + 3) = (newLen & 0xFF).toByte
    assert(Jpx.decode(bomb).isEmpty, "POC entry bomb must stay undecoded")
  }

  test("SOP/EPH markers round-trip, are optional-per-packet on read, and " +
      "malformed ones stay undecoded") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(h, w)((y, x) => f(x, y) & 0xFF)
    val img = gray(48, 32)((x, y) => (x * 9 + y * 5) % 256)
    val plain = Jpx.decode(Jpx.encodeMulti(Seq(img), levels = 2, layers = 2,
      prog = 2, tileW = 16, tileH = 16)).get
    // every flag combination, composed with tiles + layers + a positional
    // progression, decodes to the identical raster
    for ((sop, eph) <- Seq((true, false), (false, true), (true, true))) {
      val enc = Jpx.encodeMulti(Seq(img), levels = 2, layers = 2,
        prog = 2, tileW = 16, tileH = 16, sop = sop, eph = eph)
      val d = Jpx.decode(enc)
        .getOrElse(fail(s"sop=$sop eph=$eph decode failed"))
      assert(d.pixels.map(_.toSeq).toSeq == plain.pixels.map(_.toSeq).toSeq,
        s"sop=$sop eph=$eph pixels != plain")
    }
    // SOP/EPH compose with explicit precincts (per-precinct packet walk)
    val encP = Jpx.encodeMulti(Seq(img), levels = 2, layers = 2,
      prec = Seq((3, 3), (3, 3), (4, 4)), sop = true, eph = true)
    assert(Jpx.decode(encP).exists(
      _.pixels.map(_.toSeq).toSeq == img.map(_.toSeq).toSeq))
    // multi-component + subsampling + SOP/EPH
    val cb2 = gray(24, 16)((x, y) => x * 5 + y * 11 + 30)
    val cr2 = gray(24, 16)((x, y) => (x ^ y) * 9 + 70)
    val encS = Jpx.encodeMulti(Seq(img, cb2, cr2), levels = 2,
      sub = Seq((1, 1), (2, 2), (2, 2)), sop = true, eph = true)
    assert(Jpx.decode(encS).isDefined)
    def codAt(b: Array[Byte]): Int = {
      val q = 4 + (((b(4) & 0xFF) << 8) | (b(5) & 0xFF))
      assert(((b(q) & 0xFF) << 8 | (b(q + 1) & 0xFF)) == 0xFF52)
      q
    }
    // A.8.1 optionality: Scod bit 1 set on a stream that carries NO SOP
    // markers is still conformant — byte-patch the flag on, same pixels
    val noSop = Jpx.encodeMulti(Seq(img), levels = 2, layers = 2,
      prog = 2, tileW = 16, tileH = 16)
    val flagOnly = noSop.clone()
    flagOnly(codAt(noSop) + 4) = (flagOnly(codAt(noSop) + 4) | 2).toByte
    assert(Jpx.decode(flagOnly).exists(
      _.pixels.map(_.toSeq).toSeq == plain.pixels.map(_.toSeq).toSeq),
      "SOP flag without markers must decode (markers are optional)")
    // an out-of-sequence Nsop is the desync SOP exists to catch: None
    val withSop = Jpx.encodeMulti(Seq(img), levels = 2, layers = 2,
      prog = 2, tileW = 16, tileH = 16, sop = true)
    val sopAt = withSop.indices.find(i => i + 3 < withSop.length &&
      (withSop(i) & 0xFF) == 0xFF && (withSop(i + 1) & 0xFF) == 0x91 &&
      (withSop(i + 2) & 0xFF) == 0 && (withSop(i + 3) & 0xFF) == 4).get
    val badNsop = withSop.clone()
    badNsop(sopAt + 5) = (badNsop(sopAt + 5) ^ 1).toByte
    assert(Jpx.decode(badNsop).isEmpty,
      "out-of-sequence Nsop must stay undecoded")
    val badLsop = withSop.clone()
    badLsop(sopAt + 3) = 5.toByte
    assert(Jpx.decode(badLsop).isEmpty, "bad Lsop must stay undecoded")
    // EPH is MANDATORY after every header once Scod bit 2 is set: a
    // stream whose first EPH is overwritten must stay undecoded
    val withEph = Jpx.encodeMulti(Seq(img), levels = 2, layers = 2,
      prog = 2, tileW = 16, tileH = 16, eph = true)
    val sodAt = withEph.indices.find(i => i + 1 < withEph.length &&
      (withEph(i) & 0xFF) == 0xFF && (withEph(i + 1) & 0xFF) == 0x93).get
    val ephAt = (sodAt + 2 until withEph.length - 1).find(i =>
      (withEph(i) & 0xFF) == 0xFF && (withEph(i + 1) & 0xFF) == 0x92).get
    val noEph = withEph.clone()
    noEph(ephAt + 1) = 0x00.toByte
    assert(Jpx.decode(noEph).isEmpty, "missing EPH must stay undecoded")
    // reserved Scod bits above 2 still reject
    val reserved = noSop.clone()
    reserved(codAt(noSop) + 4) = (reserved(codAt(noSop) + 4) | 8).toByte
    assert(Jpx.decode(reserved).isEmpty,
      "reserved Scod bits must stay undecoded")
  }

  test("hostile precinct/packet bomb rejects before any per-precinct " +
      "allocation") {
    // hand-built header: a 2^20 x 1 image (inside the pixel cap) with
    // levels=10, layers=256 and PPx=PPy=1 at every resolution — ~2^20
    // precincts x 256 layers of packets. Without the cap, decodeTile
    // would materialize hundreds of millions of per-precinct states and
    // packet tuples (an uncatchable OOM); with it, an honest fast None.
    val out = new java.io.ByteArrayOutputStream
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit = { u16((v >> 16).toInt); u16(v.toInt) }
    val (w, h, levels, layers) = (1 << 20, 1, 10, 256)
    u16(0xFF4F) // SOC
    u16(0xFF51); u16(41); u16(0) // SIZ, 1 component
    u32(w); u32(h); u32(0); u32(0)
    u32(w); u32(h); u32(0); u32(0) // single tile
    u16(1); u8(7); u8(1); u8(1)
    u16(0xFF52); u16(12 + levels + 1) // COD, Scod bit 0
    u8(1); u8(0); u16(layers); u8(0)
    u8(levels); u8(4); u8(4); u8(0); u8(1) // 64x64 cb, 5/3
    (0 to levels).foreach(_ => u8(0x11)) // PPx=PPy=1 everywhere
    val nsb = 3 * levels + 1
    u16(0xFF5C); u16(3 + nsb); u8(3 << 5) // QCD, no quant, 3 guard bits
    (0 until nsb).foreach(_ => u8(8 << 3))
    u16(0xFF90); u16(10); u16(0); u32(0); u8(0); u8(1) // SOT, Psot=0
    u16(0xFF93) // SOD
    u8(0)
    u16(0xFFD9) // EOC
    val t0 = System.nanoTime()
    assert(Jpx.decode(out.toByteArray).isEmpty,
      "packet bomb must stay undecoded")
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 3.0, f"packet bomb took $sec%.1f s — cap not early enough")
  }
}
