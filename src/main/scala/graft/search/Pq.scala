package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** Product quantization (PQ) — the compression leg of the ANN toolkit,
  * complementing the pruning legs ([[Ann]] LSH buckets, [[Ivf]] coarse
  * lists). Where IVF decides WHICH rows to scan, PQ shrinks WHAT each scan
  * reads: a d-dim float vector (d·4 bytes) becomes m subspace codes
  * (m bytes at ksub ≤ 256), a 32× reduction at the catalog defaults —
  * the difference between a 100 TB and a 3 TB scan of the same corpus.
  *
  *  - **train**: per-subspace k-means ([[Ivf.train]] reused on subvector
  *    slices) over a driver-side sample — deterministic, never distributes.
  *  - **encode**: one codegen'd pass (`PqEncode`) → `pq_code` array column;
  *    write-time map work like `list_id`.
  *  - **search (ADC)**: the query builds an m×ksub lookup table of
  *    subspace dot products and squared norms on the driver; scoring a row
  *    is then m table reads (`PqAdc`), no float math — approximate cosine =
  *    lutDot(codes) / sqrt(lutNorm2(codes)) against the reconstructed
  *    codeword, re-ranked exactly over a small shortlist.
  *
  * Exactness witness (spec-pinned): training with ksub = sample size makes
  * every sample vector its own codeword, so quantization error is zero and
  * the ADC dot equals the SUBSPACE-BLOCKED dot of the original vectors
  * bit-for-bit (each LUT entry is the sequential per-subspace dot; PqAdc
  * sums them in subspace order). Blocked summation is a reordering of the
  * flat left-to-right dot, so it can differ from [[VectorSearch.dot]] in
  * final ulps — which is why the ADC score is a RANKING device and every
  * search re-ranks its shortlist with the exact cosine.
  *
  * At 100 TB: codebook is m·ksub·dsub floats (KBs) shipped in the task
  * binary; IVF partition pruning composes in front (IVFPQ — prune lists,
  * then ADC-scan codes, then exact re-rank of the shortlist from the
  * original vectors, which only the ≤k·4 shortlist rows ever read).
  */
object Pq {

  /** Trained codebook: m subspaces × ksub codewords × dsub dims,
    * subcentroid (j, c) at offset ((j·ksub)+c)·dsub.
    */
  final case class Codebook(m: Int, ksub: Int, dsub: Int, flat: Array[Float]) {
    def dim: Int = m * dsub
    def codeword(j: Int, c: Int): Array[Float] =
      java.util.Arrays.copyOfRange(flat, (j * ksub + c) * dsub,
        (j * ksub + c + 1) * dsub)
  }

  /** Per-subspace deterministic k-means over a driver-side sample.
    * Vectors shorter than m·dsub are zero-padded (matching PqEncode).
    */
  def train(sample: Array[Array[Float]], m: Int, ksub: Int,
      iters: Int = 10): Codebook = {
    require(sample.nonEmpty, "empty training sample")
    require(ksub >= 1 && ksub <= 256, s"ksub must fit one byte, got $ksub")
    val dsub = (sample(0).length + m - 1) / m
    val flat = new Array[Float](m * ksub * dsub)
    for (j <- 0 until m) {
      val sub = sample.map { v =>
        val s = new Array[Float](dsub)
        var i = 0
        while (i < dsub) {
          val idx = j * dsub + i
          s(i) = if (idx < v.length) v(idx) else 0.0f
          i += 1
        }
        s
      }
      val q = Ivf.train(sub, ksub, iters)
      // Ivf.train caps k at the sample size; replicate the last centroid so
      // the codebook stays rectangular (codes simply never reach the pads)
      for (c <- 0 until ksub) {
        val src = math.min(c, q.k - 1)
        System.arraycopy(q.centroidsFlat, src * dsub, flat,
          (j * ksub + c) * dsub, dsub)
      }
    }
    Codebook(m, ksub, dsub, flat)
  }

  /** Write-time encoding: adds `pq_code` (array of m subcentroid ids) and
    * the codebook fingerprint column (see [[contentHash]]).
    */
  def encode(embeddings: DataFrame, cb: Codebook,
      vectorCol: String = "vector", codeCol: String = "pq_code"): DataFrame =
    embeddings
      .withColumn(codeCol,
        VectorExpressions.pqEncode(col(vectorCol), cb.flat, cb.m, cb.ksub, cb.dsub))
      .withColumn("pq_cb_hash", lit(contentHash(cb)))

  /** RESIDUAL encoding — the FAISS `IndexIVFPQ` default (`by_residual`):
    * PQ-encode `vector − centroid[list_id]` instead of the raw vector.
    * Residuals of a coarse-quantized corpus occupy a region ~1/k the
    * diameter of the corpus, so the same m×ksub codebook budget resolves
    * proportionally finer — measurably better shortlists at identical
    * code bytes (PqSpec pins the comparison on clustered data). Requires
    * an IVF-indexed input (has `list_id` from the SAME quantizer) and a
    * codebook trained on residual samples ([[trainResidual]]). The
    * fingerprint column mixes BOTH artifacts' hashes: a residual code is
    * meaningless against either a different codebook or a different
    * coarse quantizer, and the two are separate sidecars with no atomic
    * co-rewrite.
    */
  def encodeResidual(ivfIndexed: DataFrame, quantizer: Ivf.Quantizer,
      cb: Codebook, vectorCol: String = "vector",
      listCol: String = "list_id", codeCol: String = "pq_code"): DataFrame =
    ivfIndexed
      .withColumn(codeCol, VectorExpressions.pqEncode(
        VectorExpressions.ivfResidual(col(vectorCol), col(listCol),
          quantizer.centroidsFlat, quantizer.dim),
        cb.flat, cb.m, cb.ksub, cb.dsub))
      .withColumn("pq_cb_hash",
        lit(contentHash(cb) ^ Ivf.contentHash(quantizer)))

  /** The composed FROZEN residual-IVFPQ encoder for incremental index
    * maintenance ([[IndexMaintenance.updateIndex]] /
    * [[graft.streaming.EventStreams.ingestIndexStream]] and its
    * versioned twin): coarse-assign with the frozen quantizer, then
    * residual-encode with the frozen residual codebook. The emitted
    * rows carry BOTH frozen-artifact fingerprints (`ivf_q_hash` from
    * the coarse assignment, `pq_cb_hash` = codebook ⊕ quantizer from
    * the residual encode), so updateIndex's hash guards refuse a delta
    * encoded against either a retrained quantizer or a retrained
    * codebook — a residual code is meaningless against either. */
  def residualEncoder(quantizer: Ivf.Quantizer, cb: Codebook)
      : DataFrame => DataFrame =
    df => encodeResidual(Ivf.buildIndex(df, quantizer), quantizer, cb)

  /** Train a codebook on the RESIDUALS of the sample under `quantizer`
    * (each sample vector minus its nearest centroid) — the codebook
    * [[encodeResidual]] expects. Deterministic like [[train]]. */
  def trainResidual(sample: Array[Array[Float]], quantizer: Ivf.Quantizer,
      m: Int, ksub: Int, iters: Int = 10): Codebook = {
    val residuals = sample.map { v =>
      val list = Ivf.nearestLists(v, quantizer, 1).head
      val cent = quantizer.centroid(list)
      val r = new Array[Float](v.length)
      var i = 0
      while (i < v.length) {
        r(i) = v(i) - (if (i < cent.length) cent(i) else 0.0f)
        i += 1
      }
      r
    }
    train(residuals, m, ksub, iters)
  }

  /** Query-specific LUT of subspace dot products: lut[j·ksub+c] =
    * dot(query_j, codeword(j,c)), sequential within each subspace — the
    * ADC total is therefore the subspace-blocked dot of query ×
    * reconstructed vector (see the exactness-witness note above).
    */
  def lutDot(query: Array[Float], cb: Codebook): Array[Double] = {
    val lut = new Array[Double](cb.m * cb.ksub)
    for (j <- 0 until cb.m; c <- 0 until cb.ksub) {
      val off = (j * cb.ksub + c) * cb.dsub
      var acc = 0.0
      var i = 0
      while (i < cb.dsub) {
        val qi = if (j * cb.dsub + i < query.length) query(j * cb.dsub + i).toDouble else 0.0
        acc += qi * cb.flat(off + i)
        i += 1
      }
      lut(j * cb.ksub + c) = acc
    }
    lut
  }

  /** Query-independent LUT of codeword squared norms (for the cosine
    * denominator of the reconstructed vector).
    */
  def lutNorm2(cb: Codebook): Array[Double] = {
    val lut = new Array[Double](cb.m * cb.ksub)
    for (j <- 0 until cb.m; c <- 0 until cb.ksub) {
      val off = (j * cb.ksub + c) * cb.dsub
      var acc = 0.0
      var i = 0
      while (i < cb.dsub) {
        val x = cb.flat(off + i).toDouble
        acc += x * x
        i += 1
      }
      lut(j * cb.ksub + c) = acc
    }
    lut
  }

  /** Approximate cosine of the query against each row's reconstructed
    * codeword — m table reads per row, zero-norm-guarded like
    * `VectorCosine`.
    */
  def adcCosine(codeCol: Column, query: Array[Float], cb: Codebook): Column = {
    var qn = 0.0
    query.foreach(x => qn += x.toDouble * x.toDouble)
    val dot = VectorExpressions.pqAdc(codeCol, lutDot(query, cb), cb.ksub)
    val n2 = VectorExpressions.pqAdc(codeCol, lutNorm2(cb), cb.ksub)
    if (qn == 0.0) lit(0.0)
    else when(n2 === 0.0, 0.0)
      .otherwise(dot / (sqrt(n2) * math.sqrt(qn)))
  }

  private def serialize(cb: Codebook): String = {
    val sb = new StringBuilder
    sb.append(cb.m).append(' ').append(cb.ksub).append(' ').append(cb.dsub)
      .append('\n')
    for (j <- 0 until cb.m; c <- 0 until cb.ksub)
      sb.append(cb.codeword(j, c).mkString(" ")).append('\n')
    sb.toString
  }

  /** Stable fingerprint of a codebook: md5 of its [[save]] serialization
    * folded to a long. [[encode]] stamps it into every index row as a
    * constant `pq_cb_hash` column (dictionary-encodes to ~nothing in
    * parquet), and the search CLI verifies it against the loaded sidecar —
    * the index and the codebook are separate artifacts, so NO write
    * ordering makes their rewrite atomic (a crash between the two leaves
    * a new/old mismatch either way); the embedded hash turns that
    * torn state into a hard error instead of silently wrong scores.
    */
  def contentHash(cb: Codebook): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(serialize(cb).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(md, 0, 8).getLong
  }

  /** Persist a codebook as a text sidecar (line 1: "m ksub dsub", then one
    * codeword per line) — Float.toString round-trips exactly, so
    * save∘load is the identity (same contract as [[Ivf.save]]). Written
    * via temp-file + atomic rename so the sidecar itself is never torn.
    */
  def save(cb: Codebook, path: String): Unit = {
    val target = java.nio.file.Paths.get(path)
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp,
      serialize(cb).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def load(path: String): Codebook = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray(Array.empty[String])
    val Array(m, ksub, dsub) = lines(0).split(" ").map(_.toInt)
    val flat = new Array[Float](m * ksub * dsub)
    for (j <- 0 until m; c <- 0 until ksub) {
      val vals = lines(1 + j * ksub + c).split(" ")
      for (i <- 0 until dsub) flat((j * ksub + c) * dsub + i) = vals(i).toFloat
    }
    Codebook(m, ksub, dsub, flat)
  }

  /** IVFPQ: coarse-list pruning composed with compressed ADC scoring —
    * the standard two-level ANN layout at corpus scale. The index carries
    * both `list_id` (partition column → probes prune at the file source)
    * and `pq_code`; the probed lists are ADC-scanned over codes, and only
    * the shortlist reads full vectors for the exact re-rank. Probing all
    * lists with a corpus-sized shortlist degenerates to the exact scan —
    * the spec-pinned exactness witness.
    */
  /** Replica dedupe is REQUIRED when the underlying IVF index was built
    * multi-assigned ([[Ivf.buildIndexMultiAssign]]): replicas of one
    * vector can land in several probed lists, and without the dedupe
    * both rows survive the shortlist semi-join and the top-k holds the
    * same fragment twice (caught by driving the pq-search CLI against a
    * replicated index). The quantizer sidecar records exactly when that
    * build ran, so the default derives it — `Some(…)` only overrides for
    * experiments.
    */
  def searchIvfPq(index: DataFrame, query: Array[Float], quantizer: Ivf.Quantizer,
      cb: Codebook, topK: Int, nprobe: Int = 1, shortlist: Int = 100,
      vectorCol: String = "vector", codeCol: String = "pq_code",
      tieBreak: String = "vec_id",
      predicate: Option[Column] = None,
      dedupe: Option[Boolean] = None): DataFrame = {
    val lists = Ivf.nearestLists(query, quantizer, nprobe)
    searchCosine(index.filter(col("list_id").isin(lists: _*)),
      query, cb, topK, shortlist, vectorCol, codeCol, tieBreak, predicate,
      dedupe.getOrElse(quantizer.replicas != 1)) // 0 = unknown → dedupe
  }

  /** ADC top-k with exact re-rank, in two phases so the compressed scan
    * never touches vector bytes:
    *  1. shortlist `shortlist` ids by the ADC score, projecting ONLY
    *     (tieBreak, codes) — a columnar reader skips the vector column
    *     entirely (plan-asserted in PlanShapeSpec);
    *  2. left-semi join the (broadcast-small) shortlist ids back and run
    *     the exact cosine on just those rows — on an index sorted by
    *     `tieBreak`, min/max row-group stats prune the vector read too.
    *
    * `predicate` makes this a filtered compressed scan (same contract as
    * [[Ivf.search]]): eligibility applies BEFORE the ADC shortlist, so
    * the shortlist holds only eligible rows and k fills whenever the
    * scanned region holds k eligible rows — never the post-filter
    * underfill of filtering an unfiltered shortlist. With a full
    * shortlist the result is exact filtered KNN over the scanned region
    * (the same witness the unfiltered contract pins).
    */
  def searchCosine(index: DataFrame, query: Array[Float], cb: Codebook,
      topK: Int, shortlist: Int = 100, vectorCol: String = "vector",
      codeCol: String = "pq_code", tieBreak: String = "vec_id",
      predicate: Option[Column] = None,
      dedupe: Boolean = false): DataFrame = {
    val eligible = predicate.fold(index)(index.filter)
    shortlistRerank(eligible, adcCosine(col(codeCol), query, cb), query,
      topK, shortlist, vectorCol, tieBreak, dedupe)
  }

  /** The shared phase-2 of every compressed search: ADC-shortlist ids on
    * a vector-free projection, then exact re-rank of only those rows.
    * Replica dedupe happens where each side is cheap, never as a
    * full-row shuffle over the probed region: the shortlist collapses
    * ids in the SAME narrow (id, score) aggregation it already shuffles,
    * and the row-level dedupe runs only on the semi-joined candidates —
    * a shortlist-bounded set. Replica score semantics per caller: with
    * RAW codes ([[searchCosine]]) replicas carry identical codes, so
    * max IS the score; with RESIDUAL codes ([[searchIvfPqResidual]])
    * each replica encodes against its own list centroid, so max picks
    * the replica whose reconstruction scores highest — the optimistic
    * estimate, which only shapes the shortlist (the re-rank is exact
    * on raw vectors either way).
    */
  private def shortlistRerank(eligible: DataFrame, adcScore: Column,
      query: Array[Float], topK: Int, shortlist: Int, vectorCol: String,
      tieBreak: String, dedupe: Boolean): DataFrame = {
    val scored = eligible.select(col(tieBreak), adcScore.as("adc_score"))
    val perId =
      if (dedupe) scored.groupBy(col(tieBreak))
        .agg(max(col("adc_score")).as("adc_score"))
      else scored
    val ids = perId
      .orderBy(col("adc_score").desc, col(tieBreak))
      .limit(math.max(topK, shortlist))
      .select(col(tieBreak))
    val joined = eligible.join(broadcast(ids), Seq(tieBreak), "left_semi")
    val cand = if (dedupe) joined.dropDuplicates(tieBreak) else joined
    VectorSearch.knn(cand, query, topK, vectorCol = vectorCol,
      tieBreak = tieBreak)
  }

  /** ADC cosine against the RECONSTRUCTED vector of a residual code:
    * rec = centroid[list] + codeword, so per probed list ℓ
    *
    *   dot(q, rec)  = dot(q, cℓ) + Σⱼ lutDot[j, code_j]
    *   ‖rec‖²       = ‖cℓ‖² + Σⱼ (2·dot(cℓⱼ, cw) + ‖cw‖²)
    *
    * — the first terms are per-list driver constants, the sums are the
    * same m-table-read [[VectorExpressions.pqAdc]] shape as the plain
    * ADC (lutB folds the cross term and the codeword norm into one
    * table). The column is a CASE over the probed lists, so codegen
    * evaluates exactly one branch per row.
    */
  def residualAdcCosine(codeCol: Column, listCol: Column,
      query: Array[Float], quantizer: Ivf.Quantizer, cb: Codebook,
      lists: Seq[Int]): Column = {
    var qn = 0.0
    query.foreach(x => qn += x.toDouble * x.toDouble)
    if (qn == 0.0) return lit(0.0)
    val lutQ = lutDot(query, cb)
    val n2 = lutNorm2(cb)
    val branches = lists.map { l =>
      val cent = quantizer.centroid(l)
      var qc = 0.0
      var cn = 0.0
      var i = 0
      while (i < cent.length) {
        if (i < query.length) qc += query(i).toDouble * cent(i)
        cn += cent(i).toDouble * cent(i)
        i += 1
      }
      val lutB = new Array[Double](cb.m * cb.ksub)
      for (j <- 0 until cb.m; c <- 0 until cb.ksub) {
        val off = (j * cb.ksub + c) * cb.dsub
        var dcc = 0.0
        var t = 0
        while (t < cb.dsub) {
          val ci = j * cb.dsub + t
          if (ci < cent.length) dcc += cent(ci).toDouble * cb.flat(off + t)
          t += 1
        }
        lutB(j * cb.ksub + c) = 2.0 * dcc + n2(j * cb.ksub + c)
      }
      val dotCol = lit(qc) +
        VectorExpressions.pqAdc(codeCol, lutQ, cb.ksub)
      val n2Col = lit(cn) +
        VectorExpressions.pqAdc(codeCol, lutB, cb.ksub)
      (listCol === l,
        when(n2Col <= 0.0, 0.0)
          .otherwise(dotCol / (sqrt(n2Col) * math.sqrt(qn))))
    }
    branches.foldRight(lit(0.0): Column) { case ((cond, v), acc) =>
      when(cond, v).otherwise(acc)
    }
  }

  /** Residual IVFPQ search: coarse-list pruning + residual-ADC scoring +
    * exact shortlist re-rank. Same exactness witness as [[searchIvfPq]]
    * (full probe + corpus shortlist ⇒ exact KNN — the re-rank reads raw
    * vectors, so approximation only ever shapes the shortlist); better
    * shortlists than the raw-vector codes at equal bytes because the
    * codebook spends its resolution on the residual region.
    */
  def searchIvfPqResidual(index: DataFrame, query: Array[Float],
      quantizer: Ivf.Quantizer, cb: Codebook, topK: Int, nprobe: Int = 1,
      shortlist: Int = 100, vectorCol: String = "vector",
      codeCol: String = "pq_code", tieBreak: String = "vec_id",
      predicate: Option[Column] = None,
      dedupe: Option[Boolean] = None): DataFrame = {
    val lists = Ivf.nearestLists(query, quantizer, nprobe)
    val probed = index.filter(col("list_id").isin(lists: _*))
    val eligible = predicate.fold(probed)(probed.filter)
    shortlistRerank(eligible,
      residualAdcCosine(col(codeCol), col("list_id"), query, quantizer,
        cb, lists),
      query, topK, shortlist, vectorCol, tieBreak,
      dedupe.getOrElse(quantizer.replicas != 1))
  }
}
