package graft.sources

/** One-off fuzz campaign over the byte-level codecs (not a spec — run
  * via `Test/runMain graft.sources.CodecFuzzGen [seconds]`).
  *
  * The decoders' hostile-input contract is "return, bounded, never
  * throw": each catches Exception internally, so anything REACHING us
  * here — StackOverflowError, NegativeArraySizeException wrapped in an
  * Error, OutOfMemoryError from a budget escape — is a real finding,
  * as is any single decode exceeding the per-call time budget (a CPU
  * bound the pixel budgets failed to enforce). Inputs are deterministic
  * (seeded LCG): every finding is replayable from its (family, seed).
  */
object CodecFuzzGen {

  private final class Lcg(var s: Long) {
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def int(bound: Int): Int = (((next() >>> 33) % bound).toInt + bound) % bound
    def byte(): Byte = (next() >>> 56).toByte
  }

  def main(args: Array[String]): Unit = {
    val budgetSec = if (args.nonEmpty) args(0).toInt else 120
    val deadline = System.nanoTime() + budgetSec * 1000L * 1000 * 1000
    val slowNs = 3L * 1000 * 1000 * 1000 // per-decode time budget

    // seed corpora: one small valid stream per family, mutated heavily
    val img = Array.tabulate(40, 56)((y, x) => (x * 7 + y * 3) % 256)
    val bits = (0 until 24).map(y => Array.tabulate(40)(x => (x + y) % 3 == 0))
    val n = 4
    val syms = (0 until n).map(PdfWriter.jb2GlyphAt(_, 3))
    val insts = (0 until 7).map(j =>
      Jbig2.TextInstance((j * 2) % n, 11 * j, 3 + j % 3))
    val corpus: Seq[(String, Array[Byte])] = Seq(
      "jpx-lossless" -> Jpx.encode(img),
      "jpx-tiled-layered" -> Jpx.encodeMulti(Seq(img), layers = 3,
        prog = 2, tileW = 28, tileH = 20),
      "jpx-97" -> Jpx.encodeIrreversible(Seq(img), step = 2.0),
      "jpx-jp2" -> Jpx.wrapJp2(Jpx.encode(img), 56, 40),
      // r11 forms: subsampled 4:2:0 YCbCr and a two-entry POC — the new
      // per-component-geometry and packet-reorder paths under mutation
      "jpx-420" -> Jpx.encodeMulti(Seq(img,
        Array.tabulate(20, 28)((y, x) => (x * 5 + y * 9 + 40) % 256),
        Array.tabulate(20, 28)((y, x) => ((x ^ y) * 11 + 80) % 256)),
        sub = Seq((1, 1), (2, 2), (2, 2))),
      "jpx-411" -> Jpx.encodeMulti(Seq(img,
        Array.tabulate(40, 14)((y, x) => (x * 7 + y * 3 + 60) % 256),
        Array.tabulate(40, 14)((y, x) => (x * y + 130) % 256)),
        sub = Seq((1, 1), (4, 1), (4, 1))),
      "jpx-poc" -> Jpx.encodeMulti(Seq(img), layers = 3,
        poc = Seq((0, 0, 3, 1, 1, 2), (0, 0, 3, 3, 1, 0))),
      // r12 form: explicit precincts (B.6) — multi-precinct grids with
      // clamped code-blocks, the per-precinct tag-tree path under
      // mutation (tiled so grid/alignment checks are exercised too)
      "jpx-prec" -> Jpx.encodeMulti(Seq(img), layers = 2, prog = 2,
        tileW = 32, tileH = 24, prec = Seq((1, 1), (2, 2), (3, 3))),
      // r13 form: SOP/EPH resync markers (A.8) — tiled + layered so
      // per-packet SOP sequence and per-header EPH checks run under
      // mutation (flipped Nsop, shifted markers, truncated SOPs)
      "jpx-sopeph" -> Jpx.encodeMulti(Seq(img), layers = 3, prog = 2,
        tileW = 28, tileH = 20, sop = true, eph = true),
      "jb2-generic" -> Jbig2.encodeEmbedded(bits, 40),
      "jb2-refined" -> Jbig2.encodeRefinedDocument(bits, 40, 8, 4,
        (0 until 10).map(y => Array.tabulate(16)(x => x % 2 == y % 2)),
        tpgron = true),
      "jb2-text" -> Jbig2.encodeTextDocument(80, 12, syms, insts),
      "jb2-huff-custom" -> Jbig2.encodeTextDocument(80, 12, syms, insts,
        huffDict = true, huffText = true, customDictTables = true),
      "jb2-refagg" -> Jbig2.encodeTextDocument(80, 12,
        (0 until n).map(PdfWriter.jb2GlyphAt(_, 2)),
        insts.map(t => t.copy(id = n + t.id)),
        refAggVariants = (0 until n).map(k =>
          (PdfWriter.jb2GlyphAt(k, 3), k, 0, 0)).toIndexedSeq),
      "g4" -> CcittG4.encode(bits, 40))

    def decodeFor(fam: String, b: Array[Byte]): Unit = fam match {
      case f if f.startsWith("jpx") => Jpx.decode(b, maxPixels = 1L << 22)
      case f if f.startsWith("jb2") => Jbig2.decode(b, maxPixels = 1L << 22)
      case _ => CcittG4.decode(b, 40, maxRows = 4096)
    }

    var iters = 0L
    var findings = 0
    var slowest = 0L
    val rnd = new Lcg(0x9E3779B97F4A7C15L)
    while (System.nanoTime() < deadline) {
      val (fam, base) = corpus(rnd.int(corpus.length))
      val seed = rnd.next()
      val r = new Lcg(seed)
      val mode = r.int(4)
      val mut: Array[Byte] = mode match {
        case 0 => // byte flips, 1..8 of them
          val m = base.clone()
          (0 to r.int(8)).foreach { _ =>
            val i = r.int(m.length); m(i) = (m(i) ^ (1 << r.int(8))).toByte }
          m
        case 1 => base.take(r.int(base.length + 1)) // truncation
        case 2 => // splice two regions of the stream
          val a = r.int(base.length); val b2 = r.int(base.length)
          base.take(a) ++ base.drop(b2)
        case _ => // pure noise, occasionally long
          Array.fill(r.int(if (r.int(20) == 0) 65536 else 512))(r.byte())
      }
      val t0 = System.nanoTime()
      try decodeFor(fam, mut)
      catch {
        case e: Throwable =>
          findings += 1
          // scalastyle:off println
          println(s"FINDING: $fam seed=$seed mode=$mode " +
            s"${e.getClass.getName}: ${e.getMessage}")
          // scalastyle:on println
      }
      val dt = System.nanoTime() - t0
      if (dt > slowest) slowest = dt
      if (dt > slowNs) {
        findings += 1
        // scalastyle:off println
        println(f"SLOW: $fam seed=$seed mode=$mode ${dt / 1e9}%.1f s")
        // scalastyle:on println
      }
      iters += 1
    }
    // scalastyle:off println
    println(f"fuzz done: $iters%d decodes, $findings%d findings, " +
      f"slowest ${slowest / 1e9}%.3f s")
    // scalastyle:on println
    if (findings > 0) sys.exit(1)
  }
}
