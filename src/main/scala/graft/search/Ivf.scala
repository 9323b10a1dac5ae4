package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** IVF (inverted-file) ANN — the k-means coarse-quantizer alternative to the
  * sign-random-projection index in [[Ann]] (SURVEY.md §4: "partition pruning
  * by coarse cluster id is the idiomatic Spark analog of an IVF list";
  * reference analog: pgvector IVFFlat `lists=100`, app/storage.py:165-169).
  *
  * Shape (identical plumbing to [[Ann]], different bucket function):
  *  - **train**: deterministic Lloyd iterations over a driver-side sample —
  *    the standard IVF recipe (FAISS trains on ~1M sampled vectors, not the
  *    corpus); at 100 TB the sample is a `TABLESAMPLE` collect, the k-means
  *    itself never distributes.
  *  - **assign**: one codegen'd pass per row (`IvfAssign`: argmin of
  *    squared-L2 over all centroids) — write-time map work, no shuffle.
  *    Persist with `.write.partitionBy("list_id")`.
  *  - **search**: query → `nprobe` nearest lists on the driver → partition-
  *    pruned scan of those lists → exact cosine re-rank within.
  *
  * Versus LSH buckets: centroids adapt to the data distribution (clustered
  * real-world embeddings give IVF much better recall-per-scanned-row than
  * data-oblivious hyperplanes), at the cost of a training step and of
  * shipping the centroid table (k·dim floats) in the task binary.
  */
object Ivf {

  /** Trained coarse quantizer: k centroids of `dim` floats, row-major.
    * `replicas` records how the PERSISTED index was built (1 = single
    * assignment) so readers can skip the candidate dedupe when the index
    * provably holds one row per vector; it is index metadata carried on
    * the sidecar, not part of the quantizer math, and is excluded from
    * [[contentHash]] so fingerprints are replica-invariant. */
  final case class Quantizer(k: Int, dim: Int, centroidsFlat: Array[Float],
      replicas: Int = 1) {
    def centroid(c: Int): Array[Float] =
      java.util.Arrays.copyOfRange(centroidsFlat, c * dim, (c + 1) * dim)
  }

  private def sqDist(v: Array[Float], flat: Array[Float], off: Int, dim: Int): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(v.length, dim)
    while (i < n) {
      val diff = v(i).toDouble - flat(off + i)
      d += diff * diff
      i += 1
    }
    d
  }

  /** Deterministic Lloyd k-means on a driver-side sample. Init = k evenly
    * spaced sample points (sample order is the caller's responsibility —
    * pass rows collected in a deterministic order); ties in assignment go
    * to the lowest centroid index; an emptied cluster keeps its previous
    * centroid. Fixed iteration count, no RNG ⇒ same centroids every run.
    */
  def train(sample: Array[Array[Float]], k: Int, iters: Int = 10): Quantizer = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    val kk = math.min(k, sample.length)
    val flat = new Array[Float](kk * dim)
    for (c <- 0 until kk) {
      val src = sample((c.toLong * sample.length / kk).toInt)
      System.arraycopy(src, 0, flat, c * dim, math.min(dim, src.length))
    }
    val assign = new Array[Int](sample.length)
    var iter = 0
    while (iter < iters) {
      var i = 0
      while (i < sample.length) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          val d = sqDist(sample(i), flat, c * dim, dim)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < sample.length) {
        val c = assign(i)
        counts(c) += 1
        val v = sample(i)
        var j = 0
        val n = math.min(v.length, dim)
        while (j < n) { sums(c)(j) += v(j); j += 1 }
        i += 1
      }
      for (c <- 0 until kk if counts(c) > 0; j <- 0 until dim)
        flat(c * dim + j) = (sums(c)(j) / counts(c)).toFloat
      iter += 1
    }
    Quantizer(kk, dim, flat)
  }

  /** Nearest-list assignment column (codegen'd one-pass argmin). */
  def assignCol(vec: Column, q: Quantizer): Column =
    VectorExpressions.ivfAssign(vec, q.centroidsFlat, q.dim)

  /** Write-time index: adds `list_id` plus the quantizer fingerprint
    * `ivf_q_hash` (constant — dictionary-encodes to ~nothing in parquet).
    * Persist partitioned by `list_id` so probes become partition pruning.
    * The fingerprint is the same torn-state guard [[Pq.contentHash]] gives
    * codebooks: the index and its quantizer sidecar are separate
    * artifacts, so a mismatched pair must be a hard error, never silently
    * mis-pruned probes ([[org.apache.spark.sql.graft.AnnProbeRewrite]]
    * and [[IndexMaintenance.updateIndex]] both verify it).
    */
  def buildIndex(embeddings: DataFrame, q: Quantizer,
      vectorCol: String = "vector"): DataFrame =
    embeddings.withColumn("list_id", assignCol(col(vectorCol), q))
      .withColumn("ivf_q_hash", lit(contentHash(q)))

  /** Multi-assignment (replicated) write-time index: each vector lands in
    * its `replicas` nearest lists, not just the nearest — the IVF answer
    * to the round-8 hard-corpus finding that cell pruning is weakest
    * exactly on BETWEEN-cluster queries (a vector near a cell boundary is
    * invisible to a probe of the neighboring cell it almost joined).
    * Storage and write cost scale ×R; recall at a FIXED nprobe rises
    * because boundary vectors are reachable from both sides. Distances to
    * all k centroids are computed with codegen'd higher-order functions
    * over a centroid array literal (the same k·dim work the argmin
    * assignment already does), ranked by (distance, list id) — the
    * [[nearestLists]] tie rule — and the top R explode into index rows.
    * Searches over a replicated index must dedupe candidates
    * ([[searchMultiAssign]]); everything else (partition layout,
    * fingerprint guard) matches [[buildIndex]].
    */
  /** Array column of a vector's `replicas` nearest list/shard ids under
    * `q` (rank order, ties to the lower id) — the codegen'd
    * multi-assignment shared by [[buildIndexMultiAssign]] and the
    * routed HNSW layout ([[Hnsw.buildIndexTableRouted]]). Per-row cost
    * O(k·(dim + R)): an R-slot insertion select, not a k-element sort —
    * what keeps a 10M-row × 800-shard routed build a map stage. */
  def multiAssignCol(vec0: Column, q: Quantizer, replicas: Int): Column =
    VectorExpressions.ivfMultiAssign(vec0, q.centroidsFlat, q.dim, replicas)

  def buildIndexMultiAssign(embeddings: DataFrame, q: Quantizer,
      replicas: Int, vectorCol: String = "vector"): DataFrame =
    embeddings
      .withColumn("list_id",
        explode(multiAssignCol(col(vectorCol), q, replicas)))
      .withColumn("ivf_q_hash", lit(contentHash(q)))

  /** [[search]] over a multi-assigned index: replicas of one vector can
    * land in several probed lists, so candidates dedupe on `tieBreak`
    * before the exact re-rank (otherwise top-k could hold the same
    * fragment twice). `predicate` filters candidates BEFORE the re-rank,
    * same contract as [[search]]. */
  def searchMultiAssign(index: DataFrame, queryVec: Array[Float],
      q: Quantizer, topK: Int, nprobe: Int = 1,
      vectorCol: String = "vector",
      tieBreak: String = "fragment_id",
      predicate: Option[Column] = None): DataFrame = {
    val lists = nearestLists(queryVec, q, nprobe)
    val pruned = index.filter(col("list_id").isin(lists: _*))
    val eligible = predicate.fold(pruned)(pruned.filter)
      .dropDuplicates(tieBreak)
    VectorSearch.knn(eligible, queryVec, topK, vectorCol = vectorCol,
      tieBreak = tieBreak)
  }

  private def serialize(q: Quantizer): String = {
    val sb = new StringBuilder
    sb.append(q.k).append(' ').append(q.dim).append('\n')
    for (c <- 0 until q.k)
      sb.append(q.centroid(c).mkString(" ")).append('\n')
    sb.toString
  }

  /** Stable fingerprint: md5 of the [[save]] serialization folded to a
    * long (same contract as [[Pq.contentHash]]).
    */
  def contentHash(q: Quantizer): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(serialize(q).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(md, 0, 8).getLong
  }

  /** The `nprobe` lists nearest to the query (driver-side; ties → lower id). */
  def nearestLists(queryVec: Array[Float], q: Quantizer, nprobe: Int): Seq[Int] =
    (0 until q.k)
      .map(c => (sqDist(queryVec, q.centroidsFlat, c * q.dim, q.dim), c))
      .sortBy(identity)
      .take(math.max(1, nprobe))
      .map(_._2)

  /** Persist a quantizer as a small text sidecar next to the index table
    * (line 1: "k dim", then one centroid per line; a trailing
    * "replicas R" line recording how the index was built, so readers
    * know whether candidate dedupe is needed). Float.toString
    * round-trips exactly through parseFloat, so save∘load is the
    * identity. The replicas line is OUTSIDE [[serialize]] — fingerprints
    * stay replica-invariant. It is ALWAYS written (even "replicas 1"):
    * a sidecar with no line predates the record and its index's build
    * provenance is unknown, so [[load]] marks it `replicas = 0` and
    * searchers keep the dedupe they always applied before the record
    * existed (skipping it is only safe on an explicit single-assign).
    */
  def save(q: Quantizer, path: String): Unit = {
    // replicas 0 persists AS 0 (unknown provenance): rewriting it to an
    // explicit 1 on a load→save round-trip would turn dedupe OFF for a
    // possibly multi-assigned legacy index — the exact bug the unknown
    // state exists to prevent — and break save∘load identity
    val body = serialize(q) + s"replicas ${math.max(0, q.replicas)}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def load(path: String): Quantizer = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray(Array.empty[String])
    val Array(k, dim) = lines(0).split(" ").map(_.toInt)
    val flat = new Array[Float](k * dim)
    for (c <- 0 until k) {
      val vals = lines(c + 1).split(" ")
      for (j <- 0 until dim) flat(c * dim + j) = vals(j).toFloat
    }
    val replicas = lines.lift(k + 1) match {
      case Some(l) if l.startsWith("replicas ") =>
        l.stripPrefix("replicas ").trim.toInt
      case _ => 0 // pre-record sidecar: build provenance unknown
    }
    Quantizer(k, dim, flat, replicas)
  }

  /** ANN top-k: prune to the probed lists, exact cosine re-rank within.
    *
    * `predicate` makes this a FILTERED index scan — the reference's
    * primary query shape (`WHERE view = ? AND lang = ? ORDER BY
    * embedding <=> $q LIMIT k` runs the metadata predicates inside the
    * pgvector index walk, retrieval/search.py:89-124). The filter
    * applies to the probed candidates BEFORE the exact re-rank, never
    * after the limit, so the result is the true top-k of the eligible
    * rows within the probed lists — the only approximation is which
    * lists were probed, identical to the unfiltered contract. On a
    * list-partitioned table the list pruning is partition pruning and
    * the predicate reaches the parquet scan (PushedFilters). A full
    * probe (`nprobe = q.k`) therefore degenerates to EXACT filtered KNN
    * — the exactness witness the v15 catalog query pins. For probe
    * widening when the predicate starves the probed lists, see
    * [[searchFilteredAdaptive]].
    */
  def search(index: DataFrame, queryVec: Array[Float], q: Quantizer,
      topK: Int, nprobe: Int = 1, vectorCol: String = "vector",
      tieBreak: String = "fragment_id",
      predicate: Option[Column] = None): DataFrame = {
    val lists = nearestLists(queryVec, q, nprobe)
    val pruned = index.filter(col("list_id").isin(lists: _*))
    val eligible = predicate.fold(pruned)(pruned.filter)
    VectorSearch.knn(eligible, queryVec, topK, vectorCol = vectorCol,
      tieBreak = tieBreak)
  }

  /** What [[searchFilteredAdaptive]] actually did — the probe count it
    * settled on and how many eligible candidates those lists held, so
    * callers (and the recall study) can see cost, not just results.
    */
  final case class AdaptiveProbe(hits: DataFrame, nprobeUsed: Int,
      eligibleCandidates: Long)

  /** Filtered ANN with per-list eligible-count early exit: probe the
    * initial `nprobe` lists, COUNT the eligible candidates inside them
    * (a partition-pruned, pushdown-filtered count — list metadata work,
    * not a scan of vectors), and geometrically widen the probe until the
    * candidate pool holds `fillFactor·k` eligible rows or every list is
    * probed. The fill rule is A2's over-fetch discipline applied to
    * probe width: a selective predicate concentrated outside the nearest
    * lists starves a fixed-nprobe probe (the post-filter underfill the
    * reference's own review flagged for dedupe-after-limit,
    * review/review-01-04-2238.md:5); widening by eligible COUNT instead
    * of a fixed multiplier adapts to the predicate's actual selectivity
    * at O(log k) count jobs worst case. When the widening reaches all
    * `q.k` lists the result is exact filtered KNN by construction.
    *
    * Replica-aware: on a multi-assigned index (`q.replicas > 1` — the
    * sidecar records it) eligible candidates count DISTINCT `tieBreak`
    * values (a replicated boundary vector must not inflate the fill
    * estimate) and the final search dedupes ([[searchMultiAssign]]);
    * single-assign indexes skip both costs.
    */
  def searchFilteredAdaptive(index: DataFrame, queryVec: Array[Float],
      q: Quantizer, topK: Int, predicate: Column, nprobe: Int = 1,
      fillFactor: Int = 2, vectorCol: String = "vector",
      tieBreak: String = "fragment_id"): AdaptiveProbe = {
    val want = math.max(1L, fillFactor.toLong * topK)
    // != 1, not > 1: replicas = 0 flags a pre-record sidecar whose
    // index may well be multi-assigned — dedupe stays on for it
    val replicated = q.replicas != 1
    // one ranking of all k lists, widened by prefix — each step reuses it
    val ranked = nearestLists(queryVec, q, q.k)
    var np = math.max(1, nprobe)
    var eligibleCount = -1L
    var done = false
    while (!done) {
      val lists = ranked.take(np)
      val eligible = index.filter(col("list_id").isin(lists: _*))
        .filter(predicate)
      eligibleCount =
        if (replicated) eligible.select(col(tieBreak)).distinct().count()
        else eligible.count()
      if (eligibleCount >= want || np >= q.k) done = true
      else np = math.min(q.k, np * 2)
    }
    AdaptiveProbe(
      if (replicated)
        searchMultiAssign(index, queryVec, q, topK, np, vectorCol,
          tieBreak, Some(predicate))
      else
        search(index, queryVec, q, topK, np, vectorCol, tieBreak,
          Some(predicate)),
      np, eligibleCount)
  }
}
