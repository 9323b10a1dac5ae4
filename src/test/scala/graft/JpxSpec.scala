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
}
