package graft.search

/** Scalar quantization (SQ8) — the third compression point on the ANN
  * accuracy/size curve, between full floats and [[Pq]] codes: each
  * DIMENSION is quantized independently to one byte on a uniform per-dim
  * grid (faiss `SQ8` / pgvector-halfvec territory), so a d-dim float
  * vector (4·d bytes) becomes d bytes — 4× smaller with far less
  * distortion than PQ's 32× (one byte per dimension vs one byte per
  * 8-dim subspace).
  *
  * The whole implementation is a *codebook shape*, not new machinery: SQ
  * is exactly PQ with `m = dim, dsub = 1, ksub = levels`, where subspace
  * i's "codewords" are the 256 grid points `vmin_i + c·step_i`. That makes
  *  - [[Pq.encode]]'s nearest-codeword search ≡ round-to-nearest-level
  *    (the SQ encoding rule),
  *  - [[Pq.adcCosine]]'s table lookups ≡ dequantize-and-dot (the per-dim
  *    LUT folds `q_i · level` and `level²` ahead of the scan),
  *  - [[Pq.searchCosine]]'s two-phase shortlist → exact re-rank reusable
  *    verbatim, vector-free ADC scan included.
  * A production write path would use the closed-form `round((x-vmin)/step)`
  * instead of the 256-way argmin (identical output, d vs 256·d ops/row);
  * the shared-shape form keeps one scan/search code path for all codecs.
  *
  * Train = per-dimension min/max over a driver-side sample — like the PQ
  * codebook, KBs shipped in the task binary, never distributed. Values
  * outside the sampled range clamp to the edge levels (the argmin picks
  * the nearest grid point), the standard SQ behavior.
  */
object Sq {

  /** Per-dimension uniform-grid codebook over a sample. A degenerate
    * dimension (vmax == vmin) collapses its grid to one repeated level —
    * every value encodes to code 0 and decodes to the constant.
    */
  def train(sample: Array[Array[Float]], levels: Int = 256): Pq.Codebook = {
    require(sample.nonEmpty, "empty training sample")
    require(levels >= 2 && levels <= 256, s"levels must fit one byte, got $levels")
    val dim = sample(0).length
    val flat = new Array[Float](dim * levels)
    var i = 0
    while (i < dim) {
      var vmin = Float.MaxValue
      var vmax = Float.MinValue
      sample.foreach { v =>
        if (v(i) < vmin) vmin = v(i)
        if (v(i) > vmax) vmax = v(i)
      }
      val step = (vmax - vmin) / (levels - 1)
      var c = 0
      while (c < levels) {
        flat(i * levels + c) = vmin + c * step
        c += 1
      }
      i += 1
    }
    Pq.Codebook(m = dim, ksub = levels, dsub = 1, flat = flat)
  }
}
