package graft.sources

import java.io.ByteArrayOutputStream

import scala.collection.mutable

/** JPEG 2000 Part 1 (ITU-T T.800) codec subset — the third scanned-PDF
  * image compression (/Filter /JPXDecode), carried by archival scans and
  * born-digital re-compressors. The reference sees these pixels via
  * PyMuPDF rendering (pymupdf_parser.py:773-823); a byte-level extractor
  * must decode the codestream itself or degrade to undecoded-bytes
  * behavior on the documents OCR exists for.
  *
  * Scope (both directions): 8-bit components — grayscale or
  * multi-component up to 4, including RGB under either color transform
  * (RCT, T.800 G.2, with 5/3; ICT, G.3, with 9/7) — BOTH wavelet
  * pipelines: the reversible 5/3 with no quantization (lossless) and
  * the irreversible 9/7 with scalar dead-zone quantization, derived or
  * expounded (E.1) — the dominant wild form of archival lossy scans.
  * TILED codestreams (the form large archival scans actually ship:
  * XTsiz/YTsiz grid at origin 0, one tile-part per tile, each tile an
  * independent DWT/Tier-1 domain; tile sizes must divide by 2^levels so
  * tile-local band geometry is exactly the canvas-coordinate geometry),
  * MULTIPLE quality layers (the real B.10 packet-header protocol:
  * per-code-block inclusion tag trees escalating a layer at a time,
  * persistent Lblock state, codeword segments concatenating across
  * packets), and all five progression orders in the
  * single-precinct-per-resolution case this codec emits and accepts
  * (LRCP/RLCP/RPCL, plus the component-major PCRL/CPRL collapse), and
  * SUBSAMPLED components with XRsiz/YRsiz ∈ {1, 2, 4} — 4:2:0 / 4:2:2
  * / 4:4:0 / 4:1:1 YCbCr, the wild archival scan forms (4:1:1 is the
  * DV-lineage variant): component 0 stays at
  * reference resolution, chroma planes carry their own band/code-block
  * geometry at ceil(size / factor) dims (T.800 B.2/B.3), MCT is off
  * (the in-codestream transforms require identically-sized components,
  * G.2/G.3), and decode returns the planes upsampled to the reference
  * grid by sample replication. Any
  * number of decomposition levels, EBCOT Tier-1
  * with the MQ arithmetic coder (the SAME Annex E coder as [[Jbig2]] —
  * T.800 and T.88 share it; the Tier-1 contexts and pass structure
  * here are T.800 Annex D), tag-tree-coded packet headers (T.800
  * B.10), and both the raw codestream and the JP2 box wrapping.
  * EXPLICIT PRECINCTS (B.6, r12): per-resolution PPx/PPy exponents in
  * the COD, packets partitioned per precinct with per-precinct
  * inclusion/zero-bitplane tag trees, code-blocks clamped to the
  * precinct (B.7's xcb' = min(xcb, PPx [−1 for r>0])), and the
  * positional progression orders (RPCL/PCRL/CPRL) iterating real
  * precinct grids on the reference grid; the default 2^15 grid is the
  * historical single-precinct case, bit-identical. Multi-tile streams
  * whose tile grid misaligns the precinct anchors reject (tile-local
  * anchoring must equal B.6's global anchoring).
  * POC (progression order change, A.6.6) segments are DECODED,
  * composing with precincts: each entry's volume iterates in its own
  * progression with already-emitted packets skipped, encoder and
  * decoder sharing one sequence function; a POC whose union does not
  * cover every packet of the tile exactly once is an exotic interleave
  * that rejects. Subsampling factors outside
  * {1, 2, 4} are detected and rejected to None — the extractor's
  * honest `undecoded` label, never a guess. The lossless path reconstructs exactly; the 9/7 path
  * reconstructs within the quantizer's error band (JpxSpec pins a PSNR
  * floor).
  *
  * The encoder exists to produce fixtures whose decoded geometry and ink
  * only a real Tier-1 + DWT decode can recover; the decoder is the
  * extractor's production path. The Tier-1 pass machine is written ONCE
  * and parameterized by coding direction (the `codeBit` seam), so the
  * encoder and decoder cannot drift apart — the same guarantee the
  * shared-table structure gives [[CcittG4]] and [[Jbig2]].
  */
object Jpx {

  // ---------------- packet-header bit IO (T.800 B.10.1) ----------------
  // A 0xFF byte is followed by a 7-bit byte (MSB stuffed to 0); a header
  // never ends with 0xFF (the writer pads an extra 0x00).

  private[sources] final class HdrWriter {
    private val out = mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    private def cap: Int =
      if (out.nonEmpty && (out.last & 0xFF) == 0xFF) 7 else 8
    def put(bit: Int): Unit = {
      cur = (cur << 1) | (bit & 1)
      nb += 1
      if (nb == cap) { out += cur.toByte; cur = 0; nb = 0 }
    }
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { put((v >> i) & 1); i -= 1 }
    }
    def align(): Unit = {
      while (nb != 0) put(0)
      if (out.nonEmpty && (out.last & 0xFF) == 0xFF) out += 0
    }
    def result(): Array[Byte] = out.toArray
  }

  private[sources] final class HdrReader(data: Array[Byte], start: Int) {
    var p = start // byte cursor; after align() points at the packet body
    private var cur = 0
    private var avail = 0
    private var last = 0
    def bit(): Int = {
      if (avail == 0) {
        if (p >= data.length) throw new IllegalStateException("hdr EOF")
        val cap = if (last == 0xFF) 7 else 8
        last = data(p) & 0xFF
        p += 1
        cur = last
        avail = cap
      }
      avail -= 1
      (cur >> avail) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = {
      avail = 0
      if (last == 0xFF) p += 1 // the writer's trailing stuffing byte
      last = 0
    }
  }

  // ---------------- tag trees (T.800 B.10.2) ----------------

  /** Quad-tree over a w×h leaf grid; each node's value is the min of its
    * children. Encoding at a threshold communicates exactly the bits a
    * decoder needs to answer "leaf value < threshold?", and the
    * `low`/`known` state makes repeated calls incremental. */
  private[sources] final class TagTree(lw: Int, lh: Int) {
    private val dims = {
      val b = mutable.ArrayBuffer((lw, lh))
      while (b.last._1 > 1 || b.last._2 > 1)
        b += (((b.last._1 + 1) / 2, (b.last._2 + 1) / 2))
      b.toArray // level 0 = leaves … last = root
    }
    private val off = dims.scanLeft(0)((a, d) => a + d._1 * d._2)
    private val n = off.last
    val value = new Array[Int](n)
    val low = new Array[Int](n)
    private val known = new Array[Boolean](n)
    java.util.Arrays.fill(value, 1 << 20) // decoder: unknown upper bound

    def setLeaf(i: Int, j: Int, v: Int): Unit = value(j * lw + i) = v

    /** Encoder prep: parent = min(children), after all setLeaf calls. */
    def buildParents(): Unit = {
      var l = 1
      while (l < dims.length) {
        val (w, h) = dims(l)
        val (cw, ch) = dims(l - 1)
        var j = 0
        while (j < h) {
          var i = 0
          while (i < w) {
            var m = Int.MaxValue
            var dj = 0
            while (dj < 2) {
              var di = 0
              while (di < 2) {
                val ci = 2 * i + di
                val cj = 2 * j + dj
                if (ci < cw && cj < ch)
                  m = math.min(m, value(off(l - 1) + cj * cw + ci))
                di += 1
              }
              dj += 1
            }
            value(off(l) + j * w + i) = m
            i += 1
          }
          j += 1
        }
        l += 1
      }
    }

    private def path(i: Int, j: Int): Array[Int] = {
      val out = new Array[Int](dims.length)
      var l = 0
      var ci = i
      var cj = j
      while (l < dims.length) {
        out(dims.length - 1 - l) = off(l) + cj * dims(l)._1 + ci
        ci /= 2; cj /= 2
        l += 1
      }
      out // root … leaf
    }

    def encode(out: HdrWriter, i: Int, j: Int, threshold: Int): Unit = {
      var lo = 0
      path(i, j).foreach { nd =>
        if (lo < low(nd)) lo = low(nd) else low(nd) = lo
        var brk = false
        while (!brk && lo < threshold) {
          if (lo >= value(nd)) {
            if (!known(nd)) { out.put(1); known(nd) = true }
            brk = true
          } else { out.put(0); lo += 1 }
        }
        low(nd) = lo
      }
    }

    /** Decode: is the leaf's value < threshold? */
    def decode(in: HdrReader, i: Int, j: Int, threshold: Int): Boolean = {
      var lo = 0
      var leaf = 0
      path(i, j).foreach { nd =>
        if (lo < low(nd)) lo = low(nd) else low(nd) = lo
        while (lo < threshold && lo < value(nd)) {
          if (in.bit() == 1) value(nd) = lo else lo += 1
        }
        low(nd) = lo
        leaf = value(nd)
      }
      leaf < threshold
    }
  }

  // ---------------- Tier-1 code-block coder (T.800 Annex D) ----------------

  /** The three-pass bit-plane machine, written once; `codeBit` is the
    * only direction-dependent seam (encoder evaluates the by-name true
    * bit and codes it; decoder ignores it and returns the decoded bit).
    * All state mutations after codeBit are identities for the encoder,
    * so the two directions execute the same statements. */
  private[sources] abstract class T1(val w: Int, val h: Int, btype: Int) {
    val n = w * h
    val mag = new Array[Int](n)
    val sgn = new Array[Int](n) // 0 positive, 1 negative
    private val sig = new Array[Boolean](n)
    private val vis = new Array[Boolean](n)
    private val ref = new Array[Boolean](n)
    protected val cxs = new Jbig2.CxStore(19) // Tier-1 has 19 contexts
    // Table D.7 initial states: UNIFORM 46, run-length 3, ZC zero 4
    cxs.i(18) = 46; cxs.i(17) = 3; cxs.i(0) = 4

    /** The direction seam: the encoder codes `encBit` and returns it,
      * the decoder ignores it and returns the decoded bit. `encBit` is
      * computed eagerly by every caller (cheap bounded array reads;
      * decoder-side values are unused garbage). */
    protected def codeBit(cx: Int, encBit: Int): Int

    private def sigAt(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h || !sig(y * w + x)) 0 else 1
    private def sgnAt(x: Int, y: Int): Int = // +1 / -1 / 0 contribution
      if (sigAt(x, y) == 0) 0 else if (sgn(y * w + x) == 0) 1 else -1

    /** Zero-coding context (Table D.1): 0 iff no significant neighbor. */
    private def zcCx(x: Int, y: Int): Int = {
      var hh = sigAt(x - 1, y) + sigAt(x + 1, y)
      var vv = sigAt(x, y - 1) + sigAt(x, y + 1)
      val dd = sigAt(x - 1, y - 1) + sigAt(x + 1, y - 1) +
        sigAt(x - 1, y + 1) + sigAt(x + 1, y + 1)
      if (btype == 1) { val t = hh; hh = vv; vv = t } // HL: roles swap
      if (btype == 3) { // HH: diagonal-primary
        val hv = hh + vv
        if (dd >= 3) 8
        else if (dd == 2) { if (hv >= 1) 7 else 6 }
        else if (dd == 1) { if (hv >= 2) 5 else if (hv == 1) 4 else 3 }
        else { if (hv >= 2) 2 else if (hv == 1) 1 else 0 }
      } else {
        if (hh == 2) 8
        else if (hh == 1) {
          if (vv >= 1) 7 else if (dd >= 1) 6 else 5
        } else {
          if (vv == 2) 4
          else if (vv == 1) 3
          else if (dd >= 2) 2
          else if (dd == 1) 1
          else 0
        }
      }
    }

    /** Sign coding (Table D.3): context 9-13 plus the prediction bit. */
    private def codeSign(x: Int, y: Int): Unit = {
      val pos = y * w + x
      val hc = math.max(-1, math.min(1, sgnAt(x - 1, y) + sgnAt(x + 1, y)))
      val vc = math.max(-1, math.min(1, sgnAt(x, y - 1) + sgnAt(x, y + 1)))
      val (cx, xor) =
        if (hc == 1) { if (vc == 1) (13, 0) else if (vc == 0) (12, 0) else (11, 0) }
        else if (hc == 0) { if (vc == 1) (10, 0) else if (vc == 0) (9, 0) else (10, 1) }
        else { if (vc == 1) (11, 1) else if (vc == 0) (12, 1) else (13, 1) }
      val b = codeBit(cx, sgn(pos) ^ xor)
      sgn(pos) = b ^ xor
    }

    /** Significance coding: ZC bit (context precomputed by the caller —
      * every call site already needed it), then sign on a 1. */
    private def codeSig(x: Int, y: Int, p: Int, cx: Int): Unit = {
      val pos = y * w + x
      val b = codeBit(cx, (mag(pos) >>> p) & 1)
      if (b == 1) {
        mag(pos) |= 1 << p
        sig(pos) = true
        codeSign(x, y)
      }
    }

    private def spp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          val ymax = math.min(y0 + 4, h)
          var y = y0
          while (y < ymax) {
            val pos = y * w + x
            if (!sig(pos)) {
              val cx = zcCx(x, y)
              if (cx != 0) {
                codeSig(x, y, p, cx)
                vis(pos) = true
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    private def mrp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          val ymax = math.min(y0 + 4, h)
          var y = y0
          while (y < ymax) {
            val pos = y * w + x
            if (sig(pos) && !vis(pos)) {
              val cx =
                if (ref(pos)) 16
                else {
                  val any = sigAt(x - 1, y) + sigAt(x + 1, y) +
                    sigAt(x, y - 1) + sigAt(x, y + 1) +
                    sigAt(x - 1, y - 1) + sigAt(x + 1, y - 1) +
                    sigAt(x - 1, y + 1) + sigAt(x + 1, y + 1)
                  if (any > 0) 15 else 14
                }
              val b = codeBit(cx, (mag(pos) >>> p) & 1)
              mag(pos) |= b << p
              ref(pos) = true
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    private def cleanup(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          // run-length mode: a full 4-sample column, every sample
          // uncoded, insignificant, and with an all-zero context
          var rl = y0 + 4 <= h
          if (rl) {
            var k = 0
            while (rl && k < 4) {
              val pos = (y0 + k) * w + x
              if (sig(pos) || vis(pos) || zcCx(x, y0 + k) != 0) rl = false
              k += 1
            }
          }
          if (rl) {
            val any = codeBit(17, {
              var a = 0
              var k = 0
              while (k < 4) {
                if (((mag((y0 + k) * w + x) >>> p) & 1) == 1) a = 1
                k += 1
              }
              a
            })
            if (any == 1) {
              // first set bit in the column; bounded at 3 so the
              // decoder's eager evaluation over garbage mags is safe
              val encIdx = {
                var k = 0
                while (k < 3 &&
                    ((mag((y0 + k) * w + x) >>> p) & 1) == 0) k += 1
                k
              }
              val hi = codeBit(18, (encIdx >> 1) & 1)
              val loBit = codeBit(18, encIdx & 1)
              val idx = (hi << 1) | loBit
              val pos = (y0 + idx) * w + x
              mag(pos) |= 1 << p
              sig(pos) = true
              codeSign(x, y0 + idx)
              var k = idx + 1
              while (k < 4) {
                codeSig(x, y0 + k, p, zcCx(x, y0 + k))
                k += 1
              }
            }
          } else {
            val ymax = math.min(y0 + 4, h)
            var y = y0
            while (y < ymax) {
              val pos = y * w + x
              if (!sig(pos) && !vis(pos)) codeSig(x, y, p, zcCx(x, y))
              y += 1
            }
          }
          x += 1
        }
        y0 += 4
      }
    }

    /** Byte offset of the codeword after each completed pass — the
      * encoder's MQ committed count, recorded so a multi-layer split
      * can slice the codeword at pass boundaries. Decoder side these
      * are zeros and unused. */
    val passEnds = mutable.ArrayBuffer.empty[Int]
    protected def committedBytes: Int = 0

    /** Run the pass sequence: cleanup-only on the first (most
      * significant) plane, then SPP/MRP/CP per plane, bounded by
      * `maxPasses` (truncated streams stop mid-plane). Returns the
      * number of passes executed. */
    def run(planes: Int, maxPasses: Int): Int = {
      var passes = 0
      var p = planes - 1
      var first = true
      def endPass(): Unit = { passes += 1; passEnds += committedBytes }
      while (p >= 0 && passes < maxPasses) {
        if (!first) {
          spp(p); endPass()
          if (passes < maxPasses) { mrp(p); endPass() }
        }
        if (passes < maxPasses) { cleanup(p); endPass() }
        java.util.Arrays.fill(vis, false)
        first = false
        p -= 1
      }
      passes
    }
  }

  private[sources] final class T1Encoder(w: Int, h: Int, btype: Int)
      extends T1(w, h, btype) {
    private val mq = new Jbig2.MqEncoder
    protected def codeBit(cx: Int, encBit: Int): Int = {
      mq.encode(cxs, cx, encBit)
      encBit
    }
    override protected def committedBytes: Int = mq.committed
    def result(): Array[Byte] = mq.flush()
  }

  private[sources] final class T1Decoder(w: Int, h: Int, btype: Int,
      data: Array[Byte], start: Int, end: Int) extends T1(w, h, btype) {
    private val mq = new Jbig2.MqDecoder(data, start, end)
    protected def codeBit(cx: Int, encBit: Int): Int = mq.decode(cxs, cx)
  }

  // ---------------- reversible 5/3 DWT (T.800 Annex F) ----------------

  // whole-sample symmetric extension
  private def mirror(i: Int, n: Int): Int =
    if (n == 1) 0
    else if (i < 0) -i
    else if (i >= n) 2 * n - 2 - i
    else i

  /** One forward 1D step on s(0..n-1): low into out(0..nL-1), high into
    * out(nL..n-1). */
  private def f1d(s: Array[Int], n: Int, out: Array[Int]): Unit = {
    if (n == 1) { out(0) = s(0); return }
    val nL = (n + 1) / 2
    val nH = n / 2
    val d = new Array[Int](nH)
    var i = 0
    while (i < nH) {
      d(i) = s(2 * i + 1) -
        ((s(mirror(2 * i, n)) + s(mirror(2 * i + 2, n))) >> 1)
      i += 1
    }
    // extension of d in the INTERLEAVED signal's index space: Y(-1) =
    // Y(1) = d(0) and the right edge mirrors to d(nH-1) — a clamp, NOT
    // a subband-domain mirror (that self-consistent variant diverges
    // from conformant codecs on the first/last column)
    def dm(j: Int): Int = d(if (j < 0) 0 else if (j >= nH) nH - 1 else j)
    i = 0
    while (i < nL) {
      out(i) = s(2 * i) + ((dm(i - 1) + dm(i) + 2) >> 2)
      i += 1
    }
    i = 0
    while (i < nH) { out(nL + i) = d(i); i += 1 }
  }

  /** Inverse of [[f1d]]. */
  private def i1d(in: Array[Int], n: Int, out: Array[Int]): Unit = {
    if (n == 1) { out(0) = in(0); return }
    val nL = (n + 1) / 2
    val nH = n / 2
    // same interleaved-space extension of the high band as in [[f1d]]
    def dm(j: Int): Int =
      in(nL + (if (j < 0) 0 else if (j >= nH) nH - 1 else j))
    var i = 0
    while (i < nL) {
      out(2 * i) = in(i) - ((dm(i - 1) + dm(i) + 2) >> 2)
      i += 1
    }
    i = 0
    while (i < nH) {
      val l = mirror(2 * i, n)
      val r = mirror(2 * i + 2, n)
      out(2 * i + 1) = in(nL + i) + ((out(l) + out(r)) >> 1)
      i += 1
    }
  }

  /** 2D multi-level forward transform, in place (mallat layout). */
  private[sources] def fdwt(a: Array[Int], w: Int, h: Int,
      levels: Int): Unit = {
    var cw = w
    var ch = h
    var l = 0
    val buf = new Array[Int](math.max(w, h))
    val out = new Array[Int](math.max(w, h))
    while (l < levels) {
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) { buf(x) = a(y * w + x); x += 1 }
        f1d(buf, cw, out)
        x = 0
        while (x < cw) { a(y * w + x) = out(x); x += 1 }
        y += 1
      }
      var x = 0
      while (x < cw) {
        var yy = 0
        while (yy < ch) { buf(yy) = a(yy * w + x); yy += 1 }
        f1d(buf, ch, out)
        yy = 0
        while (yy < ch) { a(yy * w + x) = out(yy); yy += 1 }
        x += 1
      }
      cw = (cw + 1) / 2
      ch = (ch + 1) / 2
      l += 1
    }
  }

  /** Inverse of [[fdwt]]. */
  private[sources] def idwt(a: Array[Int], w: Int, h: Int,
      levels: Int): Unit = {
    // region dims per level, replayed coarsest-first
    val ws = new Array[Int](levels + 1)
    val hs = new Array[Int](levels + 1)
    ws(0) = w; hs(0) = h
    var l = 1
    while (l <= levels) {
      ws(l) = (ws(l - 1) + 1) / 2
      hs(l) = (hs(l - 1) + 1) / 2
      l += 1
    }
    val buf = new Array[Int](math.max(w, h))
    val out = new Array[Int](math.max(w, h))
    l = levels
    while (l >= 1) {
      val cw = ws(l - 1)
      val ch = hs(l - 1)
      var x = 0
      while (x < cw) {
        var yy = 0
        while (yy < ch) { buf(yy) = a(yy * w + x); yy += 1 }
        i1d(buf, ch, out)
        yy = 0
        while (yy < ch) { a(yy * w + x) = out(yy); yy += 1 }
        x += 1
      }
      var y = 0
      while (y < ch) {
        x = 0
        while (x < cw) { buf(x) = a(y * w + x); x += 1 }
        i1d(buf, cw, out)
        x = 0
        while (x < cw) { a(y * w + x) = out(x); x += 1 }
        y += 1
      }
      l -= 1
    }
  }

  // ------------- 9/7 irreversible transform (T.800 Annex F) -------------
  // Lifting coefficients and scaling constant, Table F.4 — the public
  // standard's values. Analysis scales the low band by 1/K (DC gain 1,
  // matching the LL gain exponent 0 in E.1) and the high band by K
  // (Nyquist gain 2, matching the +1 gain exponent per high-pass axis).

  private val A97 = -1.586134342059924
  private val B97 = -0.052980118572961
  private val C97 = 0.882911075530934
  private val D97 = 0.443506852043971
  private val K97 = 1.230174104914001

  /** One forward 1D 9/7 step on s(0..n-1): four lifting passes over the
    * interleaved signal with whole-sample-symmetric extension, then
    * scale + deinterleave (low into out(0..nL-1), high after). In-place
    * sequencing is the lifting contract: each pass reads the previous
    * pass's updated values, including through the mirror. */
  private def f1d97(s: Array[Double], n: Int, out: Array[Double]): Unit = {
    if (n == 1) { out(0) = s(0); return }
    val y = java.util.Arrays.copyOf(s, n)
    def at(i: Int): Double = y(mirror(i, n))
    def pass(odd: Boolean, c: Double): Unit = {
      var i = if (odd) 1 else 0
      while (i < n) { y(i) += c * (at(i - 1) + at(i + 1)); i += 2 }
    }
    pass(odd = true, A97)
    pass(odd = false, B97)
    pass(odd = true, C97)
    pass(odd = false, D97)
    val nL = (n + 1) / 2
    var i = 0
    while (i < n) {
      if ((i & 1) == 0) out(i / 2) = y(i) / K97
      else out(nL + i / 2) = y(i) * K97
      i += 1
    }
  }

  /** Inverse of [[f1d97]]: undo scaling, interleave, run the lifting
    * passes in reverse order with negated coefficients. */
  private def i1d97(in: Array[Double], n: Int, out: Array[Double]): Unit = {
    if (n == 1) { out(0) = in(0); return }
    val nL = (n + 1) / 2
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      if ((i & 1) == 0) y(i) = in(i / 2) * K97
      else y(i) = in(nL + i / 2) / K97
      i += 1
    }
    def at(j: Int): Double = y(mirror(j, n))
    def pass(odd: Boolean, c: Double): Unit = {
      var j = if (odd) 1 else 0
      while (j < n) { y(j) -= c * (at(j - 1) + at(j + 1)); j += 2 }
    }
    pass(odd = false, D97)
    pass(odd = true, C97)
    pass(odd = false, B97)
    pass(odd = true, A97)
    System.arraycopy(y, 0, out, 0, n)
  }

  /** 2D multi-level forward 9/7, in place (mallat layout) — the double
    * twin of [[fdwt]]. */
  private[sources] def fdwt97(a: Array[Double], w: Int, h: Int,
      levels: Int): Unit = {
    var cw = w
    var ch = h
    var l = 0
    val buf = new Array[Double](math.max(w, h))
    val out = new Array[Double](math.max(w, h))
    while (l < levels) {
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) { buf(x) = a(y * w + x); x += 1 }
        f1d97(buf, cw, out)
        x = 0
        while (x < cw) { a(y * w + x) = out(x); x += 1 }
        y += 1
      }
      var x = 0
      while (x < cw) {
        var yy = 0
        while (yy < ch) { buf(yy) = a(yy * w + x); yy += 1 }
        f1d97(buf, ch, out)
        yy = 0
        while (yy < ch) { a(yy * w + x) = out(yy); yy += 1 }
        x += 1
      }
      cw = (cw + 1) / 2
      ch = (ch + 1) / 2
      l += 1
    }
  }

  /** Inverse of [[fdwt97]]. */
  private[sources] def idwt97(a: Array[Double], w: Int, h: Int,
      levels: Int): Unit = {
    val ws = new Array[Int](levels + 1)
    val hs = new Array[Int](levels + 1)
    ws(0) = w; hs(0) = h
    var l = 1
    while (l <= levels) {
      ws(l) = (ws(l - 1) + 1) / 2
      hs(l) = (hs(l - 1) + 1) / 2
      l += 1
    }
    val buf = new Array[Double](math.max(w, h))
    val out = new Array[Double](math.max(w, h))
    l = levels
    while (l >= 1) {
      val cw = ws(l - 1)
      val ch = hs(l - 1)
      var x = 0
      while (x < cw) {
        var yy = 0
        while (yy < ch) { buf(yy) = a(yy * w + x); yy += 1 }
        i1d97(buf, ch, out)
        yy = 0
        while (yy < ch) { a(yy * w + x) = out(yy); yy += 1 }
        x += 1
      }
      var y = 0
      while (y < ch) {
        x = 0
        while (x < cw) { buf(x) = a(y * w + x); x += 1 }
        i1d97(buf, cw, out)
        x = 0
        while (x < cw) { a(y * w + x) = out(x); x += 1 }
        y += 1
      }
      l -= 1
    }
  }

  /** Quantization step from the (exponent, mantissa) pair of a QCD
    * 16-bit value, T.800 E.1: Δ_b = 2^(R_b − ε_b) · (1 + μ_b / 2^11),
    * with R_b = sample bit depth + band gain. */
  private def quantStep(rb: Int, eps: Int, mu: Int): Double =
    math.pow(2.0, rb - eps) * (1.0 + mu / 2048.0)

  /** Encoder-side (ε, μ) for a target step: the largest ε with
    * 2^(R_b−ε) ≤ Δ, mantissa filling the remainder. Callers must
    * re-derive the ACTUAL step via [[quantStep]] — the decoder will. */
  private def quantParams(delta: Double, rb: Int): (Int, Int) = {
    var eps = rb - math.floor(math.log(delta) / math.log(2.0)).toInt
    if (eps < 1) eps = 1
    if (eps > 31) eps = 31
    val mu = math.max(0, math.min(2047,
      math.round((delta / math.pow(2.0, rb - eps) - 1.0) * 2048.0).toInt))
    (eps, mu)
  }

  // ---------------- codestream (T.800 Annex A/B) ----------------

  // 3 guard bits: RCT chroma spans ±255 and the 5/3 low-pass grows
  // amplitude ~1.5× per level, so deep LL bands need the extra plane
  // (zero-bitplane signaling absorbs it when unused)
  private val Guard = 3

  private final case class Band(btype: Int, x0: Int, y0: Int,
      bw: Int, bh: Int) {
    def gain: Int = btype match {
      case 0 => 0
      case 3 => 2
      case _ => 1
    }
    def mb: Int = 8 + gain + Guard - 1
  }

  /** Subbands contributing to resolution r (0 = LL only; else HL, LH,
    * HH of level levels−r+1), with offsets in the mallat-layout array. */
  private def bands(w: Int, h: Int, levels: Int, r: Int): Seq[Band] = {
    def dw(k: Int) = (0 until k).foldLeft(w)((d, _) => (d + 1) / 2)
    def dh(k: Int) = (0 until k).foldLeft(h)((d, _) => (d + 1) / 2)
    if (r == 0) Seq(Band(0, 0, 0, dw(levels), dh(levels)))
    else {
      val l = levels - r + 1
      val pw = dw(l - 1); val ph = dh(l - 1)
      val lw = dw(l); val lh = dh(l)
      Seq(Band(1, lw, 0, pw - lw, lh),
        Band(2, 0, lh, lw, ph - lh),
        Band(3, lw, lh, pw - lw, ph - lh))
    }
  }

  private val CbExp = 6 // 64×64 code-blocks (before precinct clamping)
  private def cbSize = 1 << CbExp

  /** One band's code-block geometry under explicit precincts (T.800
    * B.6/B.7): band-domain precinct exponents (halved for r > 0 — band
    * coordinates are half the resolution grid's), the precinct-clamped
    * code-block dims (xcb' = min(xcb, PPx [−1 for r>0]), B.7), and the
    * band's full block grid. Code-blocks anchor at 0 like precincts, so
    * blocks never straddle a precinct boundary and each resolution
    * precinct's blocks are a rectangular window of the band grid. */
  private final case class BandGeom(band: Band, cbw: Int, cbh: Int,
      ncx: Int, ncy: Int, bppx: Int, bppy: Int) {
    /** Block-index window of resolution-precinct (pi, pj) in this band:
      * (first col, first row, cols, rows); cols/rows are 0 when the
      * precinct falls past this band's edge (odd-dims asymmetry). */
    def precWindow(pi: Int, pj: Int): (Int, Int, Int, Int) = {
      val bx0 = pi.toLong << bppx
      val by0 = pj.toLong << bppy
      val bx1 = math.min(bx0 + (1L << bppx), band.bw.toLong)
      val by1 = math.min(by0 + (1L << bppy), band.bh.toLong)
      if (bx1 <= bx0 || by1 <= by0) (0, 0, 0, 0)
      else {
        val ci0 = (bx0 / cbw).toInt
        val cj0 = (by0 / cbh).toInt
        (ci0, cj0, ceilDiv(bx1.toInt, cbw) - ci0,
          ceilDiv(by1.toInt, cbh) - cj0)
      }
    }
  }

  private def bandGeom(b: Band, r: Int, ppx: Int, ppy: Int): BandGeom = {
    val bppx = if (r == 0) ppx else ppx - 1
    val bppy = if (r == 0) ppy else ppy - 1
    val cbw = 1 << math.min(CbExp, bppx)
    val cbh = 1 << math.min(CbExp, bppy)
    BandGeom(b, cbw, cbh, ceilDiv(b.bw, cbw), ceilDiv(b.bh, cbh),
      bppx, bppy)
  }

  /** Number-of-coding-passes codeword (Table B.4). */
  private def putNumPasses(w: HdrWriter, np: Int): Unit = {
    if (np == 1) w.put(0)
    else if (np == 2) { w.put(1); w.put(0) }
    else if (np <= 5) { w.putBits(3, 2); w.putBits(np - 3, 2) }
    else if (np <= 36) { w.putBits(0xF, 4); w.putBits(np - 6, 5) }
    else { w.putBits(0x1FF, 9); w.putBits(np - 37, 7) }
  }

  private def getNumPasses(r: HdrReader): Int = {
    if (r.bit() == 0) 1
    else if (r.bit() == 0) 2
    else {
      val t = r.bits(2)
      if (t < 3) 3 + t
      else {
        val t2 = r.bits(5)
        if (t2 < 31) 6 + t2
        else 37 + r.bits(7)
      }
    }
  }

  private def log2floor(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** The "no explicit precincts" spelling: 2^15 precincts cover any
    * legal resolution in one piece, so geometry, packet counts and
    * stream bytes collapse to the historical single-precinct forms. */
  private[sources] val DefaultPrec = (15, 15)

  /** Per-(resolution, component) precinct grid (T.800 B.6): counts on
    * the RESOLUTION grid (shared by the resolution's bands — at odd
    * dims a precinct can be empty in one band yet populated in a
    * sibling), plus the precinct origin step on the REFERENCE grid
    * (component step 2^(PPx + levels − r) scaled by the subsampling
    * factor) — the coordinate the positional progression orders
    * (RPCL/PCRL/CPRL, A.6.1) iterate. */
  private final case class PrecGrid(npx: Int, npy: Int,
      stepX: Long, stepY: Long) {
    def n: Int = npx * npy
  }

  /** Grids for every (r, c) of one tile: `dims(c)` the component-tile
    * dims, `precs(r)` the (PPx, PPy) exponents. Tile-local anchor 0 —
    * exact for single-tile streams and for the aligned multi-tile case
    * [[checkPrecAlign]] admits. */
  private def precGrids(levels: Int, dims: IndexedSeq[(Int, Int)],
      subs: Seq[(Int, Int)], precs: IndexedSeq[(Int, Int)])
      : IndexedSeq[IndexedSeq[PrecGrid]] =
    IndexedSeq.tabulate(levels + 1) { r =>
      IndexedSeq.tabulate(dims.length) { c =>
        def dd(v: Int, k: Int) =
          (0 until k).foldLeft(v)((d, _) => (d + 1) / 2)
        val rw = dd(dims(c)._1, levels - r)
        val rh = dd(dims(c)._2, levels - r)
        val (ppx, ppy) = precs(r)
        PrecGrid(ceilDiv(math.max(rw, 1), 1 << ppx),
          ceilDiv(math.max(rh, 1), 1 << ppy),
          (1L << (ppx + levels - r)) * subs(c)._1,
          (1L << (ppy + levels - r)) * subs(c)._2)
      }
    }

  /** Total packets of one tile — layers × Σ_(r,c) precincts — in LONG
    * arithmetic (a hostile SIZ/COD pair can push the product past Int).
    * The POC coverage check's denominator AND the packet-bomb cap's
    * measure. */
  private def totalPacketsL(grids: IndexedSeq[IndexedSeq[PrecGrid]],
      layers: Int): Long =
    grids.iterator.flatten.map(g => g.npx.toLong * g.npy).sum * layers

  /** Packet-count cap per tile (the tile-grid-bomb discipline extended
    * to the precinct dimension): a ~100-byte stream with a huge SIZ
    * width, PPx=1 everywhere and 256 layers would otherwise demand tens
    * of millions of per-precinct states and packet tuples before the
    * first tile byte is read — an uncatchable OOM, not the honest None.
    * Conformant fixtures sit in the hundreds; 2^20 is far above any
    * real producer. */
  private val MaxTilePackets = 1L << 20

  /** One entry's packet volume in its own progression order (A.6.1),
    * over explicit ranges — the shared engine of [[packetSequence]]
    * (full volume) and [[pocSequence]] (per-POC-entry volumes). Emits
    * (r, c, l, p) with p the linear precinct index pj·npx+pi. The
    * positional orders sort precinct origins on the reference grid
    * with the standard's tie order (RPCL: component; PCRL: component
    * then resolution; CPRL: resolution); the sort is stable and the
    * remaining key is unique, so the order is total. */
  private def packetSeqVol(grids: IndexedSeq[IndexedSeq[PrecGrid]],
      rr: Range, cc: Range, ll: Range, pp: Int)
      : IndexedSeq[(Int, Int, Int, Int)] = {
    // memoized per (r, c): the layer-outer orders (LRCP/RLCP) would
    // otherwise rebuild every precinct list once per layer
    val cache =
      mutable.Map.empty[(Int, Int), IndexedSeq[(Int, Long, Long)]]
    def precsOf(r: Int, c: Int): IndexedSeq[(Int, Long, Long)] =
      cache.getOrElseUpdate((r, c), {
        val g = grids(r)(c)
        for (pj <- 0 until g.npy; pi <- 0 until g.npx)
          yield (pj * g.npx + pi, pi * g.stepX, pj * g.stepY)
      })
    pp match {
      case 0 => // layer-resolution-component-position
        for (l <- ll; r <- rr; c <- cc; p <- precsOf(r, c))
          yield (r, c, l, p._1)
      case 1 => // resolution-layer-component-position
        for (r <- rr; l <- ll; c <- cc; p <- precsOf(r, c))
          yield (r, c, l, p._1)
      case 2 => // resolution-position-component-layer
        rr.flatMap { r =>
          val cells = for (c <- cc; p <- precsOf(r, c))
            yield (p._3, p._2, c, p._1)
          cells.sortBy(t => (t._1, t._2, t._3)).flatMap {
            case (_, _, c, p) => ll.map(l => (r, c, l, p))
          }
        }.toIndexedSeq
      case 3 => // position-component-resolution-layer
        val cells = for (r <- rr; c <- cc; p <- precsOf(r, c))
          yield (p._3, p._2, c, r, p._1)
        cells.sortBy(t => (t._1, t._2, t._3, t._4)).flatMap {
          case (_, _, c, r, p) => ll.map(l => (r, c, l, p))
        }.toIndexedSeq
      case _ => // component-position-resolution-layer
        cc.flatMap { c =>
          val cells = for (r <- rr; p <- precsOf(r, c))
            yield (p._3, p._2, r, p._1)
          cells.sortBy(t => (t._1, t._2, t._3)).flatMap {
            case (_, _, r, p) => ll.map(l => (r, c, l, p))
          }
        }.toIndexedSeq
    }
  }

  /** Packet iteration order (r, c, l, p) for the five T.800 progression
    * orders (A.6.1), precinct-aware: under the default 2^15 grid every
    * precinct loop is a singleton and the orders collapse to the
    * historical single-precinct forms bit-for-bit. */
  private def packetSequence(levels: Int, nc: Int, layers: Int, prog: Int,
      grids: IndexedSeq[IndexedSeq[PrecGrid]])
      : IndexedSeq[(Int, Int, Int, Int)] =
    packetSeqVol(grids, 0 to levels, 0 until nc, 0 until layers, prog)

  /** Packet iteration under a POC (progression order change, T.800
    * A.6.6): each entry (RSpoc, CSpoc, LYEpoc, REpoc, CEpoc, Ppoc)
    * iterates its resolution/component/layer volume — every precinct of
    * it — in its own progression, and a packet already emitted by an
    * earlier entry is skipped (A.6.6's "packets … are not included
    * again"). Layer lower bound is 0 for every entry — overlap handling
    * IS the dedup. Shared by encoder and decoder (the codeBit-seam
    * guarantee), so the two cannot disagree on packet order. */
  private[sources] def pocSequence(levels: Int, nc: Int, layers: Int,
      entries: Seq[(Int, Int, Int, Int, Int, Int)],
      grids: IndexedSeq[IndexedSeq[PrecGrid]])
      : IndexedSeq[(Int, Int, Int, Int)] = {
    val seen = mutable.Set.empty[(Int, Int, Int, Int)]
    val out = mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    entries.foreach { case (rs, cs, lye, re, ce, pp) =>
      packetSeqVol(grids, rs until math.min(re, levels + 1),
        cs until math.min(ce, nc), 0 until math.min(lye, layers), pp)
        .foreach(p => if (seen.add(p)) out += p)
    }
    out.toIndexedSeq
  }

  /** Entry sanity shared by the encoder's require and the decoder's
    * reject: bounds ordered and in range, progression known. */
  private[sources] def pocEntryOk(e: (Int, Int, Int, Int, Int, Int),
      levels: Int, nc: Int, layers: Int): Boolean = {
    val (rs, cs, lye, re, ce, pp) = e
    rs >= 0 && rs < re && re <= levels + 1 &&
      cs >= 0 && cs < ce && ce <= nc &&
      lye >= 1 && lye <= layers && pp >= 0 && pp <= 4
  }

  /** Row-major tile rectangles (x0, y0, tw, th) of a tileW×tileH grid
    * anchored at the origin, clipped to the canvas (T.800 B.3 with
    * XTOsiz = YTOsiz = 0). */
  private def tileRects(w: Int, h: Int, tileW: Int, tileH: Int)
      : IndexedSeq[(Int, Int, Int, Int)] = {
    val tx = (w + tileW - 1) / tileW
    val ty = (h + tileH - 1) / tileH
    for (j <- 0 until ty; i <- 0 until tx) yield {
      val x0 = i * tileW
      val y0 = j * tileH
      (x0, y0, math.min(tileW, w - x0), math.min(tileH, h - y0))
    }
  }

  /** Validate layer/progression/tiling params; resolve 0 tile dims to
    * the canvas (single tile). Tile dims must be multiples of 2^levels
    * when they actually split the canvas: tile origins then stay even
    * at every DWT level, so tile-local band geometry and sample parity
    * equal the canvas-coordinate geometry T.800 B.5 defines. */
  private def checkTiling(w: Int, h: Int, tileW: Int, tileH: Int,
      levels: Int, layers: Int, prog: Int): (Int, Int) = {
    require(layers >= 1 && layers <= 64, s"layers out of range: $layers")
    require(prog >= 0 && prog <= 4, s"unknown progression order: $prog")
    val tw = if (tileW <= 0) w else tileW
    val th = if (tileH <= 0) h else tileH
    if (tw < w) require(tw % (1 << levels) == 0,
      s"tile width $tw must be a multiple of 2^$levels")
    if (th < h) require(th % (1 << levels) == 0,
      s"tile height $th must be a multiple of 2^$levels")
    (tw, th)
  }

  /** One tile's coefficient planes (tile-local mallat layout).
    * `dims(c)` is the COMPONENT-tile size — equal across components
    * except under subsampling, where component c covers
    * ceil(span / XRsiz_c) columns of the reference-grid tile. */
  private final case class TilePlanes(dims: IndexedSeq[(Int, Int)],
      planes: Array[Array[Int]])

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Validate a subsampling spec against the component planes: factors
    * in {1, 2, 4} (4:4:4 / 4:2:2 / 4:2:0 / 4:4:0 / 4:1:1 — the wild
    * YCbCr forms; 3 has no wild producer and stays out of scope),
    * component 0 at full reference resolution, each plane sized
    * ceil(reference / factor) (T.800 B.2's component-grid mapping), and
    * a tile grid that stays aligned in every component domain. */
  private def checkSub(sub: Seq[(Int, Int)], nc: Int, w: Int, h: Int,
      comps: Seq[Array[Array[Int]]], tw: Int, th: Int,
      levels: Int): Seq[(Int, Int)] = {
    val subs = if (sub.isEmpty) Seq.fill(nc)((1, 1)) else sub
    require(subs.length == nc, s"sub spec for ${subs.length} of $nc comps")
    require(subs.head == ((1, 1)),
      "component 0 must be full-resolution (it defines the reference grid)")
    subs.zipWithIndex.foreach { case ((xr, yr), c) =>
      require((xr == 1 || xr == 2 || xr == 4) &&
          (yr == 1 || yr == 2 || yr == 4),
        s"subsampling factors out of the {1,2,4} scope: ($xr, $yr)")
      require(comps(c).length == ceilDiv(h, yr) &&
        comps(c)(0).length == ceilDiv(w, xr),
        s"component $c dims ${comps(c)(0).length}x${comps(c).length} != " +
          s"ceil($w/$xr) x ceil($h/$yr)")
      // tile origins must stay even at every DWT level IN THE COMPONENT
      // DOMAIN: reference origin x0 = i·tw maps to x0/xr, so tw must
      // carry the extra factor of xr (same for rows)
      if (tw < w) require(tw % (xr << levels) == 0,
        s"tile width $tw must be a multiple of ${xr << levels}")
      if (th < h) require(th % (yr << levels) == 0,
        s"tile height $th must be a multiple of ${yr << levels}")
    }
    subs
  }

  /** Component-tile rectangle (cx0, cy0, cw, ch) of the reference-grid
    * tile (x0, y0, ctw, cth) under (xr, yr) subsampling: T.800 B.3's
    * ceil-mapping, exact here because tile origins are multiples of the
    * factors (checkSub / the decoder's alignment reject). */
  private def compRect(x0: Int, y0: Int, ctw: Int, cth: Int,
      xr: Int, yr: Int): (Int, Int, Int, Int) = {
    val cx0 = x0 / xr
    val cy0 = y0 / yr
    (cx0, cy0, ceilDiv(x0 + ctw, xr) - cx0, ceilDiv(y0 + cth, yr) - cy0)
  }

  /** Encode one grayscale raster (values 0..255) as a raw codestream. */
  def encode(img: Array[Array[Int]], levels: Int = 2): Array[Byte] =
    encodeMulti(Seq(img), levels, rct = false)

  /** Encode an RGB raster with the reversible color transform. */
  def encodeRgb(r: Array[Array[Int]], g: Array[Array[Int]],
      b: Array[Array[Int]], levels: Int = 2): Array[Byte] =
    encodeMulti(Seq(r, g, b), levels, rct = true)

  /** Multi-component codestream; `rct` applies the reversible color
    * transform (T.800 G.2, 5/3-only) across exactly three same-sized
    * components. `layers` splits each code-block's coding passes across
    * that many quality layers through the real B.10 packet protocol;
    * `prog` picks the progression order (0=LRCP 1=RLCP 2=RPCL 3=PCRL
    * 4=CPRL); `tileW`/`tileH` (0 = whole canvas) tile the image into an
    * origin-anchored grid, each tile an independent DWT/Tier-1 domain. */
  def encodeMulti(comps: Seq[Array[Array[Int]]], levels: Int = 2,
      rct: Boolean = false, layers: Int = 1, prog: Int = 0,
      tileW: Int = 0, tileH: Int = 0,
      sub: Seq[(Int, Int)] = Nil,
      poc: Seq[(Int, Int, Int, Int, Int, Int)] = Nil,
      prec: Seq[(Int, Int)] = Nil,
      sop: Boolean = false, eph: Boolean = false): Array[Byte] = {
    require(comps.nonEmpty && (!rct || comps.length == 3))
    require(!rct || sub.forall(_ == ((1, 1))),
      "the in-codestream color transform requires identically-sized " +
        "components (T.800 G.2) — subsampled YCbCr ships with MCT off")
    val h = comps.head.length
    val w = comps.head(0).length
    require(w > 0 && h > 0 && levels >= 0 && levels <= 6)
    val (tw, th) = checkTiling(w, h, tileW, tileH, levels, layers, prog)
    val nc = comps.length
    val subs = checkSub(sub, nc, w, h, comps, tw, th, levels)
    val canvas = comps.map { img =>
      val ch = img.length
      val cw = img(0).length
      val a = new Array[Int](cw * ch)
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) { a(y * cw + x) = img(y)(x) - 128; x += 1 } // DC shift
        y += 1
      }
      a
    }.toArray
    if (rct) { // forward RCT on the shifted samples (per-pixel: tiling-safe)
      var i = 0
      val n = w * h
      while (i < n) {
        val r0 = canvas(0)(i); val g0 = canvas(1)(i)
        val b0 = canvas(2)(i)
        canvas(0)(i) = (r0 + 2 * g0 + b0) >> 2
        canvas(1)(i) = b0 - g0
        canvas(2)(i) = r0 - g0
        i += 1
      }
    }
    val tiles = tileRects(w, h, tw, th).map { case (x0, y0, ctw, cth) =>
      val rects = IndexedSeq.tabulate(nc) { c =>
        compRect(x0, y0, ctw, cth, subs(c)._1, subs(c)._2)
      }
      val planes = Array.tabulate(nc) { c =>
        val (cx0, cy0, cw, ch) = rects(c)
        val stride = ceilDiv(w, subs(c)._1)
        val s = new Array[Int](cw * ch)
        var y = 0
        while (y < ch) {
          System.arraycopy(canvas(c), (cy0 + y) * stride + cx0, s, y * cw, cw)
          y += 1
        }
        fdwt(s, cw, ch, levels)
        s
      }
      TilePlanes(rects.map(r => (r._3, r._4)), planes)
    }
    encodeCore(tiles, w, h, tw, th, levels, nc, mct = if (rct) 1 else 0,
      irrevQ = None, derivedBase = None, layers = layers, prog = prog,
      subs = subs, poc = poc, prec = prec, sop = sop, eph = eph)
  }

  /** Encode with the IRREVERSIBLE pipeline — the dominant wild
    * /JPXDecode form (archival lossy scans): DC shift → optional ICT →
    * 9/7 DWT → dead-zone scalar quantization (expounded (ε, μ) per
    * band) → the same Tier-1/tag-tree machinery as the reversible path.
    * `step` is the base quantization step for the LL band; high bands
    * scale by their gain (Δ_b = step · 2^gain), so step ≈ 1 is
    * near-lossless and step ≈ 4 visibly lossy. `ict` applies the
    * irreversible YCbCr color transform across exactly 3 components
    * (T.800 G.3 — the 9/7 twin of the RCT). `layers`/`prog`/`tileW`/
    * `tileH` as in [[encodeMulti]].
    */
  def encodeIrreversible(comps: Seq[Array[Array[Int]]], levels: Int = 2,
      step: Double = 1.0, ict: Boolean = false,
      derived: Boolean = false, layers: Int = 1, prog: Int = 0,
      tileW: Int = 0, tileH: Int = 0,
      sub: Seq[(Int, Int)] = Nil,
      poc: Seq[(Int, Int, Int, Int, Int, Int)] = Nil,
      prec: Seq[(Int, Int)] = Nil,
      sop: Boolean = false, eph: Boolean = false): Array[Byte] = {
    require(comps.nonEmpty && (!ict || comps.length == 3))
    require(!ict || sub.forall(_ == ((1, 1))),
      "the in-codestream color transform requires identically-sized " +
        "components (T.800 G.3) — subsampled YCbCr ships with MCT off")
    require(step > 0)
    val h = comps.head.length
    val w = comps.head(0).length
    require(w > 0 && h > 0 && levels >= 0 && levels <= 6)
    val (tw, th) = checkTiling(w, h, tileW, tileH, levels, layers, prog)
    val nc = comps.length
    val subs = checkSub(sub, nc, w, h, comps, tw, th, levels)
    val canvas = comps.map { img =>
      val ch = img.length
      val cw = img(0).length
      val a = new Array[Double](cw * ch)
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) { a(y * cw + x) = img(y)(x) - 128.0; x += 1 }
        y += 1
      }
      a
    }.toArray
    if (ict) { // forward ICT (T.800 G.3) on the shifted samples
      var i = 0
      val n = w * h
      while (i < n) {
        val r0 = canvas(0)(i); val g0 = canvas(1)(i)
        val b0 = canvas(2)(i)
        canvas(0)(i) = 0.299 * r0 + 0.587 * g0 + 0.114 * b0
        canvas(1)(i) = -0.168736 * r0 - 0.331264 * g0 + 0.5 * b0
        canvas(2)(i) = 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0
        i += 1
      }
    }
    // derived: one (ε₀, μ₀) signals every band via the E.1.1 depth rule;
    // expounded: independent params targeting Δ_b = step · 2^gain.
    // (ε, μ) per (r, btype) is geometry-independent, so the one main-
    // header QCD governs every tile.
    val base = quantParams(step, 8)
    val q = (for (r <- 0 to levels; b <- bands(w, h, levels, r)) yield {
      val p =
        if (derived) {
          val nb = if (r == 0) levels else levels - r + 1
          val eps = base._1 - levels + nb
          require(eps >= 1 && eps <= 31,
            s"derived exponent out of range: $eps (raise step or lower levels)")
          (eps, base._2)
        } else quantParams(step * (1 << b.gain), 8 + b.gain)
      (r, b.btype) -> p
    }).toMap
    val tiles = tileRects(w, h, tw, th).map { case (x0, y0, ctw, cth) =>
      val rects = IndexedSeq.tabulate(nc) { c =>
        compRect(x0, y0, ctw, cth, subs(c)._1, subs(c)._2)
      }
      val planes = Array.tabulate(nc) { c =>
        val (cx0, cy0, cw, ch) = rects(c)
        val stride = ceilDiv(w, subs(c)._1)
        val d = new Array[Double](cw * ch)
        var y = 0
        while (y < ch) {
          System.arraycopy(canvas(c), (cy0 + y) * stride + cx0,
            d, y * cw, cw)
          y += 1
        }
        fdwt97(d, cw, ch, levels)
        val a = new Array[Int](cw * ch)
        for (r <- 0 to levels; b <- bands(cw, ch, levels, r)
            if b.bw > 0 && b.bh > 0) {
          val (eps, mu) = q((r, b.btype))
          val delta = quantStep(8 + b.gain, eps, mu)
          var yy = 0
          while (yy < b.bh) {
            var xx = 0
            while (xx < b.bw) {
              val idx = (b.y0 + yy) * cw + (b.x0 + xx)
              val v = d(idx)
              val m = (math.abs(v) / delta).toInt // dead-zone floor
              a(idx) = if (v < 0) -m else m
              xx += 1
            }
            yy += 1
          }
        }
        a
      }
      TilePlanes(rects.map(r => (r._3, r._4)), planes)
    }
    encodeCore(tiles, w, h, tw, th, levels, nc, mct = if (ict) 1 else 0,
      irrevQ = Some(q), derivedBase = if (derived) Some(base) else None,
      layers = layers, prog = prog, subs = subs, poc = poc, prec = prec,
      sop = sop, eph = eph)
  }

  /** Tier-1 output for one code-block: the finished MQ codeword, the
    * pass count, the missing-bit-plane count, and the cumulative byte
    * offset of the codeword after each pass (cum(0) = 0 … cum(total) =
    * bytes.length) — the truncation marks a multi-layer split slices
    * the codeword at. Layer l of L takes passes [l·total/L,
    * (l+1)·total/L) and bytes [cum(start), cum(end)): the slices tile
    * the codeword, so a decoder concatenating every packet's segment
    * (B.10.7's codeword-segment continuation) reconstructs it exactly. */
  private final case class BlockEnc(bytes: Array[Byte], total: Int,
      p0: Int, cum: Array[Int]) {
    def passStart(l: Int, layers: Int): Int =
      (l.toLong * total / layers).toInt
    def passEnd(l: Int, layers: Int): Int =
      ((l + 1).toLong * total / layers).toInt
    def firstLayer(layers: Int): Int = {
      var i = 0
      while (passEnd(i, layers) == 0) i += 1
      i
    }
  }

  /** Per-PRECINCT packet-coding trees: the B.10 inclusion and
    * zero-bit-plane tag trees span one precinct of one band, with leaf
    * coordinates local to the precinct's block window. */
  private final class PrecState(val ci0: Int, val cj0: Int,
      val pncx: Int, val pncy: Int) {
    val inc = new TagTree(pncx, pncy)
    val zbp = new TagTree(pncx, pncy)
  }

  /** Per-band packet-coding state that persists across a tile's quality
    * layers: per-precinct tag trees, and the per-CODE-BLOCK Lblock /
    * included state (blocks belong to exactly one precinct, but the
    * state arrays index the band's full block grid — B.10 is stateful
    * by design). */
  private final class EncBandState(val geom: BandGeom,
      val blocks: IndexedSeq[Option[BlockEnc]], grid: PrecGrid,
      layers: Int) {
    val lblock = Array.fill(geom.ncx * geom.ncy)(3)
    val included = new Array[Boolean](geom.ncx * geom.ncy)
    /** Tree pair per resolution precinct; None where the precinct falls
      * entirely past this band's edge. */
    val precs: IndexedSeq[Option[PrecState]] =
      IndexedSeq.tabulate(grid.n) { p =>
        val (ci0, cj0, pw, ph) = geom.precWindow(p % grid.npx, p / grid.npx)
        if (pw <= 0 || ph <= 0) None
        else {
          val st = new PrecState(ci0, cj0, pw, ph)
          var jj = 0
          while (jj < ph) {
            var ii = 0
            while (ii < pw) {
              val b = blocks((cj0 + jj) * geom.ncx + (ci0 + ii))
              st.inc.setLeaf(ii, jj,
                b.map(_.firstLayer(layers)).getOrElse(layers))
              st.zbp.setLeaf(ii, jj, b.map(_.p0).getOrElse(0))
              ii += 1
            }
            jj += 1
          }
          st.inc.buildParents()
          st.zbp.buildParents()
          Some(st)
        }
      }
  }

  /** Tier-1 + packet assembly for one tile: code every block once
    * (recording pass-end truncation marks), split passes across layers,
    * then walk the progression order emitting packet headers against
    * the persistent per-band/per-precinct state. */
  private def encodeTile(tp: TilePlanes, levels: Int, nc: Int,
      layers: Int, prog: Int, mbOf: (Int, Band) => Int,
      poc: Seq[(Int, Int, Int, Int, Int, Int)],
      subs: Seq[(Int, Int)],
      precs: IndexedSeq[(Int, Int)],
      sop: Boolean, eph: Boolean): Array[Byte] = {
    val grids = precGrids(levels, tp.dims, subs, precs)
    // mirror the decoder's packet-bomb cap — everything we emit, we
    // must also decode
    require(totalPacketsL(grids, layers) <= MaxTilePackets,
      "precinct/layer volume exceeds the packet cap")
    val states: IndexedSeq[IndexedSeq[Seq[EncBandState]]] =
      for (r <- 0 to levels) yield for (c <- 0 until nc) yield {
        val a = tp.planes(c)
        val (tw, th) = tp.dims(c)
        val live = bands(tw, th, levels, r)
          .filter(b => b.bw > 0 && b.bh > 0)
        live.map { band =>
          val g = bandGeom(band, r, precs(r)._1, precs(r)._2)
          val blocks = for (cj <- 0 until g.ncy; ci <- 0 until g.ncx) yield {
            val bx = ci * g.cbw
            val by = cj * g.cbh
            val bw = math.min(g.cbw, band.bw - bx)
            val bh = math.min(g.cbh, band.bh - by)
            val t1 = new T1Encoder(bw, bh, band.btype)
            var maxMag = 0
            var yy = 0
            while (yy < bh) {
              var xx = 0
              while (xx < bw) {
                val v = a((band.y0 + by + yy) * tw + (band.x0 + bx + xx))
                val m = math.abs(v)
                t1.mag(yy * bw + xx) = m
                t1.sgn(yy * bw + xx) = if (v < 0) 1 else 0
                if (m > maxMag) maxMag = m
                xx += 1
              }
              yy += 1
            }
            val planes = if (maxMag == 0) 0 else log2floor(maxMag) + 1
            val mb = mbOf(r, band)
            require(planes <= mb, s"coefficient overflow: $planes > $mb")
            if (planes == 0) None
            else {
              val passes = t1.run(planes, 3 * planes - 2)
              val data = t1.result()
              val cum = new Array[Int](passes + 1)
              var k = 1
              while (k < passes) {
                cum(k) = math.max(cum(k - 1),
                  math.min(t1.passEnds(k - 1), data.length))
                k += 1
              }
              cum(passes) = data.length
              Some(BlockEnc(data, passes, mb - planes, cum))
            }
          }
          new EncBandState(g, blocks, grids(r)(c), layers)
        }
      }

    val out = new ByteArrayOutputStream
    val pseq =
      if (poc.isEmpty) packetSequence(levels, nc, layers, prog, grids)
      else {
        // per-TILE coverage (A.6.6 applies tile by tile — edge tiles
        // have their own precinct counts)
        val s = pocSequence(levels, nc, layers, poc, grids)
        require(s.size.toLong == totalPacketsL(grids, layers),
          "POC entries must cover every packet exactly once in union")
        s
      }
    // per-tile packet counter for SOP's Nsop (T.800 A.8.1: starts at 0
    // for the tile's first packet, increments per packet, modulo 65536 —
    // single tile-part per tile here, so tile scope == tile-part scope)
    var nsop = 0
    pseq.foreach { case (r, c, l, p) =>
      val hdr = new HdrWriter
      val bodies = mutable.ArrayBuffer.empty[Array[Byte]]
      val sts = states(r)(c)
      if (sts.isEmpty) hdr.put(0)
      else {
        hdr.put(1)
        sts.foreach { st =>
          st.precs(p).foreach { pr =>
            var jj = 0
            while (jj < pr.pncy) {
              var ii = 0
              while (ii < pr.pncx) {
                val k = (pr.cj0 + jj) * st.geom.ncx + (pr.ci0 + ii)
                val be = st.blocks(k)
                val ps = be.map(b =>
                  b.passEnd(l, layers) - b.passStart(l, layers)).getOrElse(0)
                def emit(b: BlockEnc): Unit = {
                  val seg = java.util.Arrays.copyOfRange(b.bytes,
                    b.cum(b.passStart(l, layers)), b.cum(b.passEnd(l, layers)))
                  putNumPasses(hdr, ps)
                  val lenBits =
                    if (seg.length == 0) 1 else log2floor(seg.length) + 1
                  val need = math.max(st.lblock(k), lenBits - log2floor(ps))
                  var i = need - st.lblock(k)
                  while (i > 0) { hdr.put(1); i -= 1 }
                  hdr.put(0)
                  hdr.putBits(seg.length, need + log2floor(ps))
                  st.lblock(k) = need
                  bodies += seg
                }
                if (!st.included(k)) {
                  pr.inc.encode(hdr, ii, jj, l + 1)
                  if (be.isDefined && be.get.firstLayer(layers) == l) {
                    pr.zbp.encode(hdr, ii, jj, be.get.p0 + 1)
                    st.included(k) = true
                    emit(be.get)
                  }
                } else if (ps > 0) {
                  hdr.put(1)
                  emit(be.get)
                } else hdr.put(0)
                ii += 1
              }
              jj += 1
            }
          }
        }
      }
      hdr.align()
      if (sop) { // FF91 + Lsop(0004) + Nsop before the packet (A.8.1)
        out.write(0xFF); out.write(0x91); out.write(0); out.write(4)
        out.write((nsop >> 8) & 0xFF); out.write(nsop & 0xFF)
      }
      out.write(hdr.result())
      if (eph) { out.write(0xFF); out.write(0x92) } // after the header (A.8.2)
      bodies.foreach(out.write)
      nsop = (nsop + 1) & 0xFFFF
    }
    out.toByteArray
  }

  /** Validate an explicit precinct spec (one (PPx, PPy) per resolution,
    * r = 0 first) and resolve the default. PPx = 0 is only legal at
    * r = 0 (T.800 A.6.1 — band-domain precincts halve for r > 0). When
    * the tile grid actually splits the canvas, tile-local precinct
    * anchoring must equal the standard's global anchoring: every tile's
    * resolution-grid origin must be a multiple of the precinct size —
    * `(tileDim / factor) % 2^(levels − r + PPx) == 0` per component per
    * resolution (the decoder rejects the same misalignment). */
  private def checkPrec(prec: Seq[(Int, Int)], levels: Int,
      tileW: Int, tileH: Int, w: Int, h: Int,
      subs: Seq[(Int, Int)]): IndexedSeq[(Int, Int)] = {
    if (prec.isEmpty) return IndexedSeq.fill(levels + 1)(DefaultPrec)
    require(prec.length == levels + 1,
      s"precinct spec needs ${levels + 1} entries, got ${prec.length}")
    prec.zipWithIndex.foreach { case ((ppx, ppy), r) =>
      require(ppx >= (if (r == 0) 0 else 1) && ppx <= 15 &&
        ppy >= (if (r == 0) 0 else 1) && ppy <= 15,
        s"precinct exponents out of range at r=$r: ($ppx, $ppy)")
      subs.foreach { case (xr, yr) =>
        // run the modulus test at EVERY resolution (a ppx<=r skip is
        // only sound when the r=0 check ran, which PPx=0 at r=0 never
        // does), and require xr | tileW first — truncating division
        // would otherwise let a non-divisible tile width slip past
        if (tileW < w)
          require(tileW % xr == 0 &&
            (tileW / xr) % (1L << (levels - r + ppx)) == 0,
            s"tile width $tileW misaligns the r=$r precinct grid " +
              s"(needs a multiple of ${xr * (1L << (levels - r + ppx))})")
        if (tileH < h)
          require(tileH % yr == 0 &&
            (tileH / yr) % (1L << (levels - r + ppy)) == 0,
            s"tile height $tileH misaligns the r=$r precinct grid " +
              s"(needs a multiple of ${yr * (1L << (levels - r + ppy))})")
      }
    }
    prec.toIndexedSeq
  }

  /** Shared marker assembly: main header (SIZ with the tile grid, COD
    * with progression + layers + optional precinct bytes, QCD per
    * pipeline), then one SOT/SOD/tile-part per tile, in raster order. */
  private def encodeCore(tiles: Seq[TilePlanes], w: Int, h: Int,
      tileW: Int, tileH: Int, levels: Int, nc: Int, mct: Int,
      irrevQ: Option[Map[(Int, Int), (Int, Int)]],
      derivedBase: Option[(Int, Int)], layers: Int,
      prog: Int, subs: Seq[(Int, Int)],
      poc: Seq[(Int, Int, Int, Int, Int, Int)],
      prec: Seq[(Int, Int)] = Nil,
      sop: Boolean = false, eph: Boolean = false): Array[Byte] = {
    val precs = checkPrec(prec, levels, tileW, tileH, w, h, subs)
    if (poc.nonEmpty) {
      // mirror the decoder's entry cap — everything we emit, we decode
      require(poc.size <= 64, s"POC entry count ${poc.size} > 64")
      poc.foreach(e => require(pocEntryOk(e, levels, nc, layers),
        s"invalid POC entry $e")) // coverage is checked per tile
    }
    def mbOf(r: Int, band: Band): Int =
      irrevQ.map(m => m((r, band.btype))._1 + Guard - 1).getOrElse(band.mb)
    val tileStreams = tiles.map(tp =>
      encodeTile(tp, levels, nc, layers, prog, mbOf, poc, subs, precs,
        sop, eph))

    val out = new ByteArrayOutputStream
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }
    u16(0xFF4F) // SOC
    u16(0xFF51); u16(38 + 3 * nc) // SIZ
    u16(0) // Rsiz
    u32(w); u32(h); u32(0); u32(0) // image / offset
    u32(tileW); u32(tileH); u32(0); u32(0) // tile grid / offset
    u16(nc) // Csiz
    // 8-bit unsigned; XRsiz/YRsiz carry the component's subsampling
    subs.foreach { case (xr, yr) => u8(7); u8(xr); u8(yr) }
    val explicitPrec = prec.nonEmpty
    u16(0xFF52); u16(12 + (if (explicitPrec) levels + 1 else 0)) // COD
    // Scod (A.6.1): bit 0 explicit precincts, bit 1 SOP markers used,
    // bit 2 EPH markers used
    u8((if (explicitPrec) 1 else 0) | (if (sop) 2 else 0) |
      (if (eph) 4 else 0))
    u8(prog); u16(layers); u8(mct)
    u8(levels); u8(CbExp - 2); u8(CbExp - 2) // SPcod
    u8(0) // code-block style: none of the Part-1 mode switches
    u8(if (irrevQ.isDefined) 0 else 1) // 0 = 9/7 irreversible, 1 = 5/3
    if (explicitPrec) // one PPx|PPy<<4 byte per resolution, r = 0 first
      precs.foreach { case (ppx, ppy) => u8(ppx | (ppy << 4)) }
    if (poc.nonEmpty) { // POC (A.6.6): u8 bounds — Csiz < 257 here
      u16(0xFF5F); u16(2 + 7 * poc.length)
      poc.foreach { case (rs, cs, lye, re, ce, pp) =>
        u8(rs); u8(cs); u16(lye); u8(re); u8(ce); u8(pp)
      }
    }
    val nsb = 3 * levels + 1
    (irrevQ, derivedBase) match {
      case (Some(_), Some((e0, mu0))) => // scalar derived: one 16-bit pair
        u16(0xFF5C); u16(3 + 2) // QCD
        u8((Guard << 5) | 1)
        u16((e0 << 11) | mu0)
      case (Some(qm), None) => // scalar expounded: 16-bit (ε, μ) per band
        u16(0xFF5C); u16(3 + 2 * nsb) // QCD
        u8((Guard << 5) | 2)
        for (r <- 0 to levels; b <- bands(w, h, levels, r)) {
          val (eps, mu) = qm((r, b.btype))
          u16((eps << 11) | mu)
        }
      case _ =>
        u16(0xFF5C); u16(3 + nsb) // QCD
        u8(Guard << 5) // no quantization
        for (r <- 0 to levels; b <- bands(w, h, levels, r))
          u8((8 + b.gain) << 3)
    }
    tileStreams.zipWithIndex.foreach { case (tileBytes, i) =>
      u16(0xFF90); u16(10) // SOT
      u16(i) // Isot
      u32(12 + 2 + tileBytes.length) // Psot: SOT..end of data
      u8(0); u8(1) // TPsot, TNsot
      u16(0xFF93) // SOD
      out.write(tileBytes)
    }
    u16(0xFFD9) // EOC
    out.toByteArray
  }

  /** Minimal JP2 file wrapping (signature, ftyp, jp2h, jp2c boxes). */
  def wrapJp2(codestream: Array[Byte], w: Int, h: Int,
      nc: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }
    def box(tpe: String, payload: Array[Byte]): Unit = {
      u32(8 + payload.length)
      tpe.getBytes("ISO-8859-1").foreach(b => u8(b & 0xFF))
      out.write(payload)
    }
    box("jP  ", Array(0x0D, 0x0A, 0x87, 0x0A).map(_.toByte))
    val ftyp = new ByteArrayOutputStream
    ftyp.write("jp2 ".getBytes("ISO-8859-1"))
    ftyp.write(Array[Byte](0, 0, 0, 0))
    ftyp.write("jp2 ".getBytes("ISO-8859-1"))
    box("ftyp", ftyp.toByteArray)
    val ihdr = new ByteArrayOutputStream
    def iu32(v: Int): Unit = {
      ihdr.write((v >>> 24) & 0xFF); ihdr.write((v >>> 16) & 0xFF)
      ihdr.write((v >>> 8) & 0xFF); ihdr.write(v & 0xFF)
    }
    iu32(h); iu32(w)
    ihdr.write((nc >> 8) & 0xFF); ihdr.write(nc & 0xFF)
    ihdr.write(7) // 8-bit unsigned
    ihdr.write(7); ihdr.write(0); ihdr.write(0) // jp2 compression, colr ok
    // enumerated colorspace: 17 = grayscale, 16 = sRGB
    val colr = Array[Byte](1, 0, 0, 0, 0, 0, if (nc == 3) 16 else 17)
    val jp2h = new ByteArrayOutputStream
    def sub(tpe: String, payload: Array[Byte]): Unit = {
      val l = 8 + payload.length
      jp2h.write((l >>> 24) & 0xFF); jp2h.write((l >>> 16) & 0xFF)
      jp2h.write((l >>> 8) & 0xFF); jp2h.write(l & 0xFF)
      jp2h.write(tpe.getBytes("ISO-8859-1"))
      jp2h.write(payload)
    }
    sub("ihdr", ihdr.toByteArray)
    sub("colr", colr)
    box("jp2h", jp2h.toByteArray)
    box("jp2c", codestream)
    out.toByteArray
  }

  /** Decoded raster: `comps` holds one row-major plane per component
    * (1 = grayscale, 3 = RGB after inverse RCT). `pixels` is the first
    * plane; `graySum` totals EVERY plane, so it stays the single-number
    * ink statistic for any channel count. */
  final case class Decoded(width: Int, height: Int,
      comps: Seq[Array[Array[Int]]]) {
    def channels: Int = comps.length
    def pixels: Array[Array[Int]] = comps.head
    def graySum: Long = {
      var s = 0L
      comps.foreach(_.foreach(r => r.foreach(s += _)))
      s
    }
  }

  /** Strip JP2 boxes down to the raw codestream (or pass one through). */
  private def unwrap(data: Array[Byte]): Option[Array[Byte]] = {
    if (data.length >= 2 && (data(0) & 0xFF) == 0xFF &&
        (data(1) & 0xFF) == 0x4F) return Some(data)
    if (data.length < 12) return None
    var p = 0
    while (p + 8 <= data.length) {
      val len = ((data(p) & 0xFF) << 24) | ((data(p + 1) & 0xFF) << 16) |
        ((data(p + 2) & 0xFF) << 8) | (data(p + 3) & 0xFF)
      val tpe = new String(data, p + 4, 4, "ISO-8859-1")
      val end =
        if (len == 0) data.length
        else if (len == 1) return None // 64-bit XLBox: out of scope
        else p + len
      if (end < p + 8 || end > data.length) return None
      if (tpe == "jp2c") return Some(java.util.Arrays.copyOfRange(data, p + 8, end))
      p = end
    }
    None
  }

  /** Decoder twin of [[EncBandState]]: per-band state persisting across
    * a tile's layers, plus the accumulated codeword segments (byte
    * ranges of the input) each block's packets contributed. */
  private final class DecPrecState(val ci0: Int, val cj0: Int,
      val pncx: Int, val pncy: Int) {
    val inc = new TagTree(pncx, pncy)
    val zbp = new TagTree(pncx, pncy)
  }

  private final class DecBandState(val geom: BandGeom, grid: PrecGrid) {
    def band: Band = geom.band
    val ncx = geom.ncx
    val ncy = geom.ncy
    val n = ncx * ncy
    val included = new Array[Boolean](n)
    val lblock = Array.fill(n)(3)
    val p0 = new Array[Int](n)
    val passes = new Array[Int](n)
    val segs = Array.fill(n)(mutable.ArrayBuffer.empty[(Int, Int)])
    /** Tag trees per resolution precinct; None past this band's edge. */
    val precs: IndexedSeq[Option[DecPrecState]] =
      IndexedSeq.tabulate(grid.n) { p =>
        val (ci0, cj0, pw, ph) = geom.precWindow(p % grid.npx, p / grid.npx)
        if (pw <= 0 || ph <= 0) None
        else Some(new DecPrecState(ci0, cj0, pw, ph))
      }
  }

  /** Decode a raw codestream or JP2 file. None on anything outside the
    * supported subset — the extractor's honest `undecoded` label. */
  def decode(raw: Array[Byte], maxPixels: Long = 1L << 26): Option[Decoded] =
    try {
      val data = unwrap(raw).getOrElse(return None)
      var p = 0
      def u8(): Int = { val v = data(p) & 0xFF; p += 1; v }
      def u16(): Int = (u8() << 8) | u8()
      def u32(): Long = ((u16().toLong << 16) | u16().toLong) & 0xFFFFFFFFL
      if (u16() != 0xFF4F) return None
      var w = 0
      var h = 0
      var nc = 0
      var mct = 0
      var levels = -1
      var layers = 0
      var prog = 0
      var tileW = 0
      var tileH = 0
      var subs: Array[(Int, Int)] = null
      var precs: IndexedSeq[(Int, Int)] = null // (PPx, PPy) per r
      var useSop = false // Scod bit 1: SOP markers may precede packets
      var useEph = false // Scod bit 2: EPH follows every packet header
      var poc: Seq[(Int, Int, Int, Int, Int, Int)] = Nil
      var mbs = Map.empty[(Int, Int), Int] // (r, btype) -> Mb
      var irrev = false // COD transform 0 = 9/7 + quantization
      var deltas = Map.empty[(Int, Int), Double] // (r, btype) -> Δ_b
      var rects: IndexedSeq[(Int, Int, Int, Int)] = null
      var outPx: Array[Array[Array[Int]]] = null
      var tilesDecoded = 0
      var eoc = false

      def fail(msg: String): Nothing = throw new IllegalStateException(msg)

      /** One tile: packets in progression order against persistent
        * per-band state, then Tier-1 over each block's concatenated
        * segments, then tile-local inverse transform into the canvas. */
      def decodeTile(rect: (Int, Int, Int, Int), bodyStart: Int,
          tileEnd: Int): Unit = {
        val (x0, y0, ctw, cth) = rect
        // per-component tile rectangles (component-domain coords): the
        // identity except under subsampling
        val crs = Array.tabulate(nc)(c =>
          compRect(x0, y0, ctw, cth, subs(c)._1, subs(c)._2))
        val grids = precGrids(levels,
          IndexedSeq.tabulate(nc)(c => (crs(c)._3, crs(c)._4)),
          subs.toSeq, precs)
        // packet-bomb cap BEFORE any per-precinct allocation (Long
        // arithmetic — see MaxTilePackets)
        if (totalPacketsL(grids, layers) > MaxTilePackets)
          fail("hostile precinct/packet volume")
        val states: IndexedSeq[IndexedSeq[Seq[DecBandState]]] =
          for (r <- 0 to levels) yield
            for (c <- 0 until nc) yield
              bands(crs(c)._3, crs(c)._4, levels, r)
                .filter(b => b.bw > 0 && b.bh > 0)
                .map(b => new DecBandState(
                  bandGeom(b, r, precs(r)._1, precs(r)._2), grids(r)(c)))
        var cursor = bodyStart
        val pseq =
          if (poc.isEmpty) packetSequence(levels, nc, layers, prog, grids)
          else {
            // per-TILE coverage (A.6.6): the union must emit every
            // packet of THIS tile exactly once — edge tiles carry
            // their own precinct counts
            val s = pocSequence(levels, nc, layers, poc, grids)
            if (s.size.toLong != totalPacketsL(grids, layers))
              fail("POC entries do not cover the tile exactly once")
            s
          }
        var nsop = 0 // per-tile packet counter (A.8.1 scope)
        pseq.foreach { case (r, c, l, pp) =>
          if (cursor >= tileEnd) fail("tile body exhausted")
          if (useSop && cursor + 1 < tileEnd &&
              (data(cursor) & 0xFF) == 0xFF &&
              (data(cursor + 1) & 0xFF) == 0x91) {
            // SOP is optional per packet when Scod bit 1 is set (A.8.1),
            // but one that IS present must be well-formed and in
            // sequence — a mismatched Nsop means the reader and writer
            // disagree about the packet ordering, the exact desync the
            // marker exists to catch: honest None, never garbage
            if (cursor + 6 > tileEnd) fail("truncated SOP")
            if ((data(cursor + 2) & 0xFF) != 0 ||
                (data(cursor + 3) & 0xFF) != 4) fail("bad Lsop")
            val got = ((data(cursor + 4) & 0xFF) << 8) |
              (data(cursor + 5) & 0xFF)
            if (got != (nsop & 0xFFFF)) fail("Nsop out of sequence")
            cursor += 6
          }
          nsop += 1
          val hdr = new HdrReader(data, cursor)
          val sts = states(r)(c)
          val contrib = mutable.ArrayBuffer.empty[(DecBandState, Int, Int)]
          if (hdr.bit() == 1) {
            if (sts.isEmpty) fail("contribution to an empty resolution")
            sts.foreach { st =>
              st.precs(pp).foreach { pr =>
                var jj = 0
                while (jj < pr.pncy) {
                  var ii = 0
                  while (ii < pr.pncx) {
                    val k = (pr.cj0 + jj) * st.ncx + (pr.ci0 + ii)
                    var fresh = false
                    if (!st.included(k)) {
                      if (pr.inc.decode(hdr, ii, jj, l + 1)) {
                        var t = 1
                        while (!pr.zbp.decode(hdr, ii, jj, t)) t += 1
                        st.p0(k) = t - 1
                        st.included(k) = true
                        fresh = true
                      }
                    } else fresh = hdr.bit() == 1
                    if (fresh) {
                      val np = getNumPasses(hdr)
                      while (hdr.bit() == 1) st.lblock(k) += 1
                      val lenBits = st.lblock(k) + log2floor(np)
                      if (lenBits > 30) fail("hostile Lblock growth")
                      val len = hdr.bits(lenBits)
                      val planes =
                        mbs.getOrElse((r, st.band.btype), 0) - st.p0(k)
                      st.passes(k) += np
                      if (planes <= 0 || planes > 31 || np < 1 ||
                          st.passes(k) > 3 * planes - 2)
                        fail("inconsistent packet header")
                      contrib += ((st, k, len))
                    }
                    ii += 1
                  }
                  jj += 1
                }
              }
            }
          }
          hdr.align()
          cursor = hdr.p
          if (cursor > tileEnd) fail("header overrun")
          if (useEph) {
            // EPH SHALL follow every packet header when Scod bit 2 is
            // set (A.8.2) — absence is a malformed stream, honest None
            if (cursor + 2 > tileEnd || (data(cursor) & 0xFF) != 0xFF ||
                (data(cursor + 1) & 0xFF) != 0x92) fail("missing EPH")
            cursor += 2
          }
          contrib.foreach { case (st, k, len) =>
            if (cursor + len > tileEnd) fail("body overrun")
            st.segs(k) += ((cursor, len))
            cursor += len
          }
        }
        // every tile-part byte must be consumed by the packet parse:
        // leftover bytes mean the SIZ-derived geometry disagrees with
        // the stream that was actually coded (e.g. a patched XRsiz
        // shrinking the expected packet set) — decoding would return a
        // conformant-looking Some over desynced data, the exact lie the
        // honest-None contract exists to prevent. Conformant tile-parts
        // are exact: Psot covers the packets with no padding (A.4.2).
        if (cursor != tileEnd) fail("tile-part bytes left unconsumed")

        // Tier-1 each included block over its concatenated segments —
        // the layer slices tile the codeword, so this reconstructs the
        // encoder's exact coefficient planes
        val tPlanes = Array.tabulate(nc)(c =>
          new Array[Int](crs(c)._3 * crs(c)._4))
        for (r <- 0 to levels; c <- 0 until nc; st <- states(r)(c)) {
          val band = st.band
          val cw = crs(c)._3
          var k = 0
          while (k < st.n) {
            if (st.included(k)) {
              val total = st.segs(k).iterator.map(_._2).sum
              val buf = new Array[Byte](total)
              var off = 0
              st.segs(k).foreach { case (s, ln) =>
                System.arraycopy(data, s, buf, off, ln)
                off += ln
              }
              val planes = mbs((r, band.btype)) - st.p0(k)
              val ci = k % st.ncx
              val cj = k / st.ncx
              val bx = ci * st.geom.cbw
              val by = cj * st.geom.cbh
              val bw = math.min(st.geom.cbw, band.bw - bx)
              val bh = math.min(st.geom.cbh, band.bh - by)
              val t1 = new T1Decoder(bw, bh, band.btype, buf, 0, total)
              t1.run(planes, st.passes(k))
              val a = tPlanes(c)
              var yy = 0
              while (yy < bh) {
                var xx = 0
                while (xx < bw) {
                  val m = t1.mag(yy * bw + xx)
                  val v = if (t1.sgn(yy * bw + xx) == 1) -m else m
                  a((band.y0 + by + yy) * cw + (band.x0 + bx + xx)) = v
                  xx += 1
                }
                yy += 1
              }
            }
            k += 1
          }
        }

        if (!irrev) {
          var ci0 = 0
          while (ci0 < nc) {
            idwt(tPlanes(ci0), crs(ci0)._3, crs(ci0)._4, levels)
            ci0 += 1
          }
          if (mct == 1) { // inverse RCT (T.800 G.2); components full-size
            var i = 0
            val n = ctw * cth
            while (i < n) {
              val y0v = tPlanes(0)(i); val u = tPlanes(1)(i)
              val v = tPlanes(2)(i)
              val g = y0v - ((u + v) >> 2)
              tPlanes(0)(i) = v + g // R
              tPlanes(1)(i) = g // G
              tPlanes(2)(i) = u + g // B
              i += 1
            }
          }
          var c = 0
          while (c < nc) {
            val a = tPlanes(c)
            val px = outPx(c)
            val (cx0, cy0, cw, ch) = crs(c)
            var y = 0
            while (y < ch) {
              var x = 0
              while (x < cw) {
                px(cy0 + y)(cx0 + x) =
                  math.max(0, math.min(255, a(y * cw + x) + 128))
                x += 1
              }
              y += 1
            }
            c += 1
          }
        } else {
          // IRREVERSIBLE reconstruction: the Tier-1 ints are quantizer
          // indices — dequantize per band (midpoint reconstruction,
          // x̂ = sign·(|q| + ½)·Δ, within E.1's decoder freedom), inverse
          // 9/7 on doubles, inverse ICT, then shift + round + clamp
          val dPlanes = Array.tabulate(nc) { c =>
            val a = tPlanes(c)
            val (_, _, cw, ch) = crs(c)
            val d = new Array[Double](cw * ch)
            for (r <- 0 to levels; b <- bands(cw, ch, levels, r)
                if b.bw > 0 && b.bh > 0) {
              val delta = deltas.getOrElse((r, b.btype),
                fail("missing quantization step"))
              var yy = 0
              while (yy < b.bh) {
                var xx = 0
                while (xx < b.bw) {
                  val idx = (b.y0 + yy) * cw + (b.x0 + xx)
                  val qv = a(idx)
                  d(idx) =
                    if (qv == 0) 0.0
                    else if (qv > 0) (qv + 0.5) * delta
                    else (qv - 0.5) * delta
                  xx += 1
                }
                yy += 1
              }
            }
            idwt97(d, cw, ch, levels)
            d
          }
          if (mct == 1) { // inverse ICT (T.800 G.3); components full-size
            var i = 0
            val n = ctw * cth
            while (i < n) {
              val y0v = dPlanes(0)(i); val cb = dPlanes(1)(i)
              val cr = dPlanes(2)(i)
              dPlanes(0)(i) = y0v + 1.402 * cr
              dPlanes(1)(i) = y0v - 0.344136 * cb - 0.714136 * cr
              dPlanes(2)(i) = y0v + 1.772 * cb
              i += 1
            }
          }
          var c = 0
          while (c < nc) {
            val d = dPlanes(c)
            val px = outPx(c)
            val (cx0, cy0, cw, ch) = crs(c)
            var y = 0
            while (y < ch) {
              var x = 0
              while (x < cw) {
                px(cy0 + y)(cx0 + x) = math.max(0, math.min(255,
                  math.round(d(y * cw + x) + 128.0).toInt))
                x += 1
              }
              y += 1
            }
            c += 1
          }
        }
      }

      while (!eoc) {
        val marker = u16()
        marker match {
          case 0xFF51 =>
            // main-header markers are frozen once the first tile-part
            // starts: a mid-stream SIZ/COD/QCD could otherwise rewrite
            // w/h/layers/deltas under the already-pinned tile grid and
            // turn a hostile stream into a lying Some(...)
            if (rects != null) return None
            val len = u16()
            val base = p
            u16() // Rsiz
            val xs = u32(); val ys = u32()
            val xo = u32(); val yo = u32()
            val xt = u32(); val yt = u32()
            val xto = u32(); val yto = u32()
            nc = u16()
            if (xo != 0 || yo != 0 || xto != 0 || yto != 0 || nc < 1 ||
                nc > 4 || xt < 1 || yt < 1) return None
            // 8-bit components; subsampling factors {1, 2, 4} per axis
            // with component 0 at full resolution (the wild YCbCr 4:2:0
            // / 4:2:2 / 4:4:0 / 4:1:1 forms) — 3 and anything wider
            // have no wild producer and stay an honest None
            subs = new Array[(Int, Int)](nc)
            for (c <- 0 until nc) {
              val ssiz = u8(); val xr = u8(); val yr = u8()
              if ((ssiz & 0x80) != 0 || (ssiz & 0x7F) > 7 ||
                  !(xr == 1 || xr == 2 || xr == 4) ||
                  !(yr == 1 || yr == 2 || yr == 4)) return None
              subs(c) = (xr, yr)
            }
            if (subs(0) != ((1, 1))) return None
            // bound each axis BEFORE multiplying: xs/ys are untrusted
            // u32s, so xs*ys*nc can wrap past Long range and sneak a
            // negative product under the cap while truncated toInt dims
            // still demand multi-GiB planes (OOM = Error, uncatchable)
            if (xs <= 0 || ys <= 0 || xs > maxPixels || ys > maxPixels ||
                xs * ys * nc > maxPixels) return None
            w = xs.toInt; h = ys.toInt
            tileW = math.min(xt, xs).toInt
            tileH = math.min(yt, ys).toInt
            p = base + len - 2
          case 0xFF52 =>
            if (rects != null) return None // main header frozen after SOT
            val len = u16()
            val base = p
            val scod = u8()
            if ((scod & ~7) != 0) return None // reserved Scod bits
            val explicitPrec = (scod & 1) != 0
            useSop = (scod & 2) != 0
            useEph = (scod & 4) != 0
            prog = u8()
            layers = u16()
            mct = u8()
            if (prog > 4 || layers < 1 || layers > 256 || mct > 1) return None
            levels = u8()
            if (levels > 10) return None
            val cbw = 1 << (u8() + 2)
            val cbh = 1 << (u8() + 2)
            if (cbw != cbSize || cbh != cbSize) return None
            if (u8() != 0) return None // mode switches unsupported
            u8() match {
              case 0 => irrev = true // 9/7 irreversible
              case 1 => irrev = false // 5/3 reversible
              case _ => return None
            }
            if (explicitPrec) {
              // one PPx|PPy<<4 byte per resolution (B.6); PPx = 0 only
              // at r = 0 (band precincts halve for r > 0, A.6.1)
              if (base + len - 2 - p != levels + 1) return None
              precs = IndexedSeq.tabulate(levels + 1) { r =>
                val b = u8(); (b & 0xF, b >>> 4)
              }
              if (precs.zipWithIndex.exists { case ((px, py), r) =>
                  r > 0 && (px == 0 || py == 0) }) return None
            } else precs = IndexedSeq.fill(levels + 1)(DefaultPrec)
            p = base + len - 2
          case 0xFF5C =>
            if (rects != null) return None // main header frozen after SOT
            val len = u16()
            val base = p
            val sqcd = u8()
            val style = sqcd & 0x1F
            val guard = sqcd >>> 5
            if (levels < 0 || w == 0) return None // need SIZ + COD first
            style match {
              case 0 => // no quantization: the reversible pairing only
                if (irrev) return None
                val exps = mutable.ArrayBuffer.empty[Int]
                while (p < base + len - 2) exps += (u8() >>> 3)
                var i = 0
                for (r <- 0 to levels; b <- bands(w, h, levels, r)) {
                  if (i < exps.length)
                    mbs += ((r, b.btype) -> (exps(i) + guard - 1))
                  i += 1
                }
              case 1 => // scalar DERIVED: one (ε₀, μ₀), per-band ε from
                // the decomposition depth (T.800 E.1.1: ε_b = ε₀ − NL
                // + n_b; μ_b = μ₀) — requires quantization, so 9/7 only
                if (!irrev) return None
                val v = u16()
                val e0 = v >>> 11; val mu0 = v & 0x7FF
                for (r <- 0 to levels; b <- bands(w, h, levels, r)) {
                  val nb = if (r == 0) levels else levels - r + 1
                  val eps = e0 - levels + nb
                  if (eps < 1 || eps > 31) return None
                  mbs += ((r, b.btype) -> (eps + guard - 1))
                  deltas += ((r, b.btype) ->
                    quantStep(8 + b.gain, eps, mu0))
                }
              case 2 => // scalar EXPOUNDED: 16-bit (ε, μ) per band
                if (!irrev) return None
                for (r <- 0 to levels; b <- bands(w, h, levels, r)) {
                  if (p + 2 > base + len - 2) return None
                  val v = u16()
                  val eps = v >>> 11; val mu = v & 0x7FF
                  if (eps < 1) return None
                  mbs += ((r, b.btype) -> (eps + guard - 1))
                  deltas += ((r, b.btype) ->
                    quantStep(8 + b.gain, eps, mu))
                }
              case _ => return None
            }
            p = base + len - 2
          case 0xFF90 =>
            val len = u16()
            val base = p
            val isot = u16()
            val psot = u32()
            val tpsot = u8()
            val tnsot = u8()
            if (w == 0 || levels < 0 || layers < 1 || mbs.isEmpty)
              return None // main header must precede the first tile-part
            if (rects == null) {
              if (mct == 1 && nc != 3) return None // color transform = RGB
              // the in-codestream transforms require identically-sized
              // components (T.800 G.2/G.3) — subsampled YCbCr ships
              // with MCT off, the planes already being Y/Cb/Cr
              if (mct == 1 && subs.exists(_ != ((1, 1)))) return None
              // POC entries validate once layers/levels are known; a
              // POC whose union does not cover every packet exactly
              // once is an exotic interleave out of this subset —
              // honest None, never a silent partial decode
              if (poc.nonEmpty) {
                // entry-count cap BEFORE expanding pocSequence (the
                // tile-grid-bomb discipline): a hostile segment can
                // carry ~9k u8-valid entries whose per-entry volumes
                // pocSequence would materialize (~1e8 tuples) before
                // the coverage check rejects. Wild streams carry a
                // handful (64 is far above any conformant producer);
                // the exactly-once coverage check runs per TILE inside
                // decodeTile, where the precinct grids are known.
                if (poc.size > 64) return None
                if (poc.exists(e => !pocEntryOk(e, levels, nc, layers)))
                  return None
              }
              // explicit precincts + a splitting tile grid: tile-local
              // precinct anchoring must equal the standard's global
              // anchoring — every tile's resolution-grid origin a
              // multiple of the precinct size (the encoder enforces
              // the same; a misaligned wild stream is an honest None)
              if (precs == null) return None // COD must precede SOT
              if (precs.exists(_ != DefaultPrec)) {
                // mirror of the encoder's checkPrec: every resolution
                // is tested (no ppx<=r skip — unsound when PPx=0 at
                // r=0 means the r=0 check never ran) and xr must
                // divide tileW before the truncating division
                val misaligned = precs.zipWithIndex.exists {
                  case ((px, py), r) =>
                    subs.exists { case (xr, yr) =>
                      (tileW < w && (tileW % xr != 0 ||
                        (tileW / xr) % (1L << (levels - r + px)) != 0)) ||
                      (tileH < h && (tileH % yr != 0 ||
                        (tileH / yr) % (1L << (levels - r + py)) != 0))
                    }
                }
                if (misaligned) return None
              }
              val ntx = (w.toLong + tileW - 1) / tileW
              val nty = (h.toLong + tileH - 1) / tileH
              if (ntx * nty > 1024) return None // hostile tile-grid bomb
              // tile origins must stay even at every DWT level IN EACH
              // COMPONENT DOMAIN (origin x0/xr needs the extra factor
              // of xr) — the same constraint the encoder enforces
              if (ntx > 1 &&
                subs.exists(s => tileW % (s._1 << levels) != 0)) return None
              if (nty > 1 &&
                subs.exists(s => tileH % (s._2 << levels) != 0)) return None
              rects = tileRects(w, h, tileW, tileH)
              outPx = Array.tabulate(nc)(c => Array.ofDim[Int](
                ceilDiv(h, subs(c)._2), ceilDiv(w, subs(c)._1)))
            }
            if (isot != tilesDecoded || tilesDecoded >= rects.length ||
                tpsot != 0 || (tnsot != 0 && tnsot != 1)) return None
            // Psot = 0 (A.4.2: data runs to EOC) is only legal on the
            // LAST tile-part; the EOC marker itself is not tile data
            if (psot == 0 && tilesDecoded != rects.length - 1) return None
            val tileEnd =
              if (psot == 0) data.length - 2
              else base - 4 + psot.toInt // Psot counts from the marker
            p = base + len - 2
            // in-tile-part COM/PLT are skippable; then SOD must follow
            var m2 = u16()
            while (m2 == 0xFF64 || m2 == 0xFF58) { p += u16() - 2; m2 = u16() }
            if (m2 != 0xFF93) return None
            if (tileEnd <= p || tileEnd > data.length) return None
            decodeTile(rects(tilesDecoded), p, tileEnd)
            tilesDecoded += 1
            p = tileEnd
          case 0xFFD9 =>
            if (rects == null || tilesDecoded != rects.length) return None
            eoc = true
          case 0xFF5F => // POC (A.6.6), u8-bound form (Csiz < 257)
            if (rects != null) return None // main header frozen after SOT
            val len = u16()
            if (len < 9 || (len - 2) % 7 != 0) return None
            val nEntries = (len - 2) / 7
            poc = (0 until nEntries).map { _ =>
              val rs = u8(); val cs = u8(); val lye = u16()
              val re = u8(); val ce = u8(); val pp = u8()
              (rs, cs, lye, re, ce, pp)
            }
          case 0xFF64 | 0xFF63 | 0xFF55 | 0xFF57 | 0xFF58 =>
            p += u16() - 2 // COM/CRG/TLM/PLM skippable
          case m if m >= 0xFF30 && m <= 0xFF3F => // segmentless
          case _ => return None // PPM/RGN/COC/QCC…: out of scope
        }
      }
      // subsampled components return UPSAMPLED to the reference grid by
      // sample replication: T.800 B.2 maps component sample (x, y) onto
      // reference-grid points [x·XRsiz, (x+1)·XRsiz) × [y·YRsiz, …), so
      // nearest-neighbor is the standard's own grid semantics (renderers
      // may interpolate; replication is the deterministic decode-only
      // truth) — and Decoded consumers keep one w×h plane per component
      val full = (0 until nc).map { c =>
        val (xr, yr) = subs(c)
        if (xr == 1 && yr == 1) outPx(c)
        else {
          val src = outPx(c)
          Array.tabulate(h, w)((y, x) => src(y / yr)(x / xr))
        }
      }
      Some(Decoded(w, h, full))
    } catch { case _: Exception => None }
}
