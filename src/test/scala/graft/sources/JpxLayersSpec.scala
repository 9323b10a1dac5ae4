package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Layer-by-layer pins for [[Jpx]]: each stage round-trips in isolation
  * before the full codestream does, so a failure localizes. */
class JpxLayersSpec extends AnyFunSuite {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)

  // ---- DWT: perfect reconstruction (the reversible-5/3 contract) ----

  test("fdwt/idwt perfect reconstruction on every small geometry") {
    for (w <- Seq(1, 2, 3, 5, 8, 17, 32); h <- Seq(1, 2, 4, 7, 16, 23);
        levels <- 0 to 3) {
      val src = lcg(w * 1000 + h * 10 + levels)
        .map(s => ((s >>> 33) % 511).toInt - 255).take(w * h).toArray
      val a = src.clone()
      Jpx.fdwt(a, w, h, levels)
      Jpx.idwt(a, w, h, levels)
      assert(a.sameElements(src), s"w=$w h=$h levels=$levels")
    }
  }

  test("5/3 lifting matches an independent interleaved-extension reference") {
    // first-principles reference: whole-sample symmetric extension of the
    // INTERLEAVED signal Y, predict/update straight off T.800 F.4 — so a
    // subband-domain extension mistake in f1d (self-consistent but
    // non-conformant, e.g. d(-1)=d(1) instead of d(0)) cannot hide behind
    // the round-trip tests
    def refForward(s: Array[Int]): Array[Int] = {
      val n = s.length
      def y(i0: Int): Int = { // iterated reflection covers tiny n
        var i = i0
        while (i < 0 || i >= n) i = if (i < 0) -i else 2 * (n - 1) - i
        s(i)
      }
      def d(i: Int): Int = y(2 * i + 1) - ((y(2 * i) + y(2 * i + 2)) >> 1)
      val nL = (n + 1) / 2
      val nH = n / 2
      val out = new Array[Int](n)
      for (i <- 0 until nL) out(i) = y(2 * i) + ((d(i - 1) + d(i) + 2) >> 2)
      for (i <- 0 until nH) out(nL + i) = d(i)
      out
    }
    for (n <- Seq(2, 3, 4, 5, 8, 9, 16, 17, 31)) {
      val src = lcg(n * 7 + 1).map(s => ((s >>> 33) % 511).toInt - 255)
        .take(n).toArray
      val a = src.clone()
      Jpx.fdwt(a, n, 1, 1) // one row, one level = exactly one f1d
      assert(a.sameElements(refForward(src)), s"n=$n")
    }
  }

  // ---- tag trees ----

  test("tag tree round-trip on random grids (incremental thresholds)") {
    for ((gw, gh) <- Seq((1, 1), (2, 1), (3, 2), (4, 4), (5, 3))) {
      val vals = lcg(gw * 17 + gh).map(s => ((s >>> 33) % 7).toInt)
        .take(gw * gh).toArray
      val enc = new Jpx.TagTree(gw, gh)
      for (j <- 0 until gh; i <- 0 until gw) enc.setLeaf(i, j, vals(j * gw + i))
      enc.buildParents()
      val w = new Jpx.HdrWriter
      // the packet-header usage pattern: full value communication per leaf
      for (j <- 0 until gh; i <- 0 until gw)
        enc.encode(w, i, j, vals(j * gw + i) + 1)
      w.align()
      val bytes = w.result()
      val dec = new Jpx.TagTree(gw, gh)
      val r = new Jpx.HdrReader(bytes, 0)
      for (j <- 0 until gh; i <- 0 until gw) {
        var t = 1
        while (!dec.decode(r, i, j, t)) t += 1
        assert(t - 1 == vals(j * gw + i), s"leaf ($i,$j) of ${gw}x$gh")
      }
    }
  }

  // ---- header bit IO stuffing ----

  test("HdrWriter/HdrReader round-trip bit streams incl. 0xFF runs") {
    val patterns = Seq(
      Array.fill(64)(1), // all-ones forces 0xFF stuffing
      Array.fill(64)(0),
      lcg(99).map(s => ((s >>> 33) & 1).toInt).take(200).toArray,
      Array.tabulate(31)(i => (i / 3) % 2))
    patterns.foreach { bits =>
      val w = new Jpx.HdrWriter
      bits.foreach(w.put)
      w.align()
      val bytes = w.result()
      val r = new Jpx.HdrReader(bytes, 0)
      bits.foreach(b => assert(r.bit() == b))
      r.align()
      assert(r.p == bytes.length) // align lands exactly at the body
    }
  }

  // ---- Tier-1 block coder ----

  test("Tier-1 round-trip per band type on random coefficient blocks") {
    for (btype <- 0 to 3; (bw, bh) <- Seq((8, 8), (13, 7), (5, 11), (1, 4))) {
      val rng = lcg(btype * 100 + bw * 10 + bh)
      val mags = rng.map(s => ((s >>> 33) % 200).toInt).take(bw * bh).toArray
      val sgns = lcg(btype + 7).map(s => ((s >>> 31) & 1).toInt)
        .take(bw * bh).toArray
      val enc = new Jpx.T1Encoder(bw, bh, btype)
      Array.copy(mags, 0, enc.mag, 0, mags.length)
      Array.copy(sgns, 0, enc.sgn, 0, sgns.length)
      val planes = 8 // covers mags < 256
      val passes = enc.run(planes, 3 * planes - 2)
      val data = enc.result()
      val dec = new Jpx.T1Decoder(bw, bh, btype, data, 0, data.length)
      dec.run(planes, passes)
      assert(dec.mag.sameElements(mags), s"mag btype=$btype ${bw}x$bh")
      (0 until bw * bh).foreach { i =>
        if (mags(i) != 0)
          assert(dec.sgn(i) == sgns(i), s"sgn $i btype=$btype ${bw}x$bh")
      }
    }
  }

  test("Tier-1 all-zero and single-coefficient blocks") {
    val enc = new Jpx.T1Encoder(4, 4, 0)
    enc.mag(10) = 1
    val passes = enc.run(1, 1)
    val data = enc.result()
    val dec = new Jpx.T1Decoder(4, 4, 0, data, 0, data.length)
    dec.run(1, passes)
    assert(dec.mag.sameElements(enc.mag))
  }
}
