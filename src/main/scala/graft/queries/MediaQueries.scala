package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.media.MediaPipeline
import graft.search.{Ann, Hnsw, Ivf, Pq, VectorSearch}

/** Multimodal plumbing + ANN index catalog entries.
  *
  * m1 runs the full binary-column feature-extraction pipeline (documents
  * wrapped as fake media bytes → mapPartitions decode) and carries an exact
  * DuckDB oracle because the stub decoder derives every feature from md5 /
  * byte length.
  *
  * v5 runs the LSH ANN index end-to-end (build → multi-probe search) and
  * reports recall against the exact scan — a self-checking query (no SQL
  * oracle; the plan includes the deterministic plane literals).
  */
object MediaQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- write-time ANN index tables (VERDICT r10 task #7) ----
  // Each index TABLE reads through to a persisted parquet copy under
  // the stage-cache root (`Cli index-sketches` / the bench read-through
  // pass): at 100 TB the corpus-wide assign/encode/graph-build scan is
  // write-time cost, paid once per corpus write, while a serving query
  // pays only deterministic quantizer training on a FIXED 1024-row
  // sample (driver-side, sub-second) plus the pruned probe. ONE
  // builder per table, shared by the queries and
  // [[WriteTimeTables.persistAll]], so the persisted copy can never
  // drift from the recompute; ONE family fingerprint pinning the
  // sample rule and every trainer/build constant (coarse on purpose —
  // changing any constant invalidates the whole index set).

  // the trainer/build constants, named ONCE and interpolated into the
  // fingerprint below — a constant edit that forgot the fingerprint
  // would serve a stale persisted index as fresh
  private[queries] val AnnSampleN = 1024
  private[queries] val IvfK = 16
  private[queries] val IvfItersFull = 10 // v6's trainer
  private[queries] val IvfItersPq = 5 // v9's trainer
  private[queries] val PqM = 8
  private[queries] val PqKsub = 16
  private[queries] val HnswShards = 4
  private[queries] val HnswM = 16
  private[queries] val HnswEfc = 200
  private[queries] val HnswIdFmt = "v%08d"

  private def embT(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))

  private[queries] def trainSample(s: SparkSession, dir: String)
      : Array[Array[Float]] = {
    import s.implicits._
    embT(s, dir).orderBy(col("vec_id")).limit(AnnSampleN)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
  }

  def annIndexFingerprint(dir: String): Option[String] =
    Some(StageCache.sourceFingerprint(Seq(s"$dir/embeddings.parquet"),
      s"annidx|sample=$AnnSampleN,vec_id|ivf:k=$IvfK,iters=$IvfItersFull" +
        s"|pq:m=$PqM,ksub=$PqKsub|sq:8bit" +
        s"|ivfpq:k=$IvfK,iters=$IvfItersPq,m=$PqM,ksub=$PqKsub" +
        s"|ivfpqres:res-trained-cb,v1" +
        s"|hnsw:shards=$HnswShards,m=$HnswM,efc=$HnswEfc,id=$HnswIdFmt" +
        ",vh2")) // vh2: adjacency stamps vec_hash (raw-vector FNV)

  // each builder has a quantizer-taking overload so a query that has
  // ALREADY trained (it needs the quantizer probe-side regardless)
  // does not pay a second sample collect + trainer run on a cache
  // miss; the no-arg forms are WriteTimeTables' deferred builders

  private[queries] def buildIvfIndex(s: SparkSession, dir: String,
      q: Ivf.Quantizer): DataFrame = Ivf.buildIndex(embT(s, dir), q)

  private[queries] def buildIvfIndex(s: SparkSession, dir: String): DataFrame =
    buildIvfIndex(s, dir, Ivf.train(trainSample(s, dir), IvfK,
      iters = IvfItersFull))

  private[queries] def buildPqIndex(s: SparkSession, dir: String,
      cb: Pq.Codebook): DataFrame = Pq.encode(embT(s, dir), cb)

  private[queries] def buildPqIndex(s: SparkSession, dir: String): DataFrame =
    buildPqIndex(s, dir, Pq.train(trainSample(s, dir), m = PqM, ksub = PqKsub))

  private[queries] def buildSqIndex(s: SparkSession, dir: String,
      cb: Pq.Codebook): DataFrame = Pq.encode(embT(s, dir), cb)

  private[queries] def buildSqIndex(s: SparkSession, dir: String): DataFrame =
    buildSqIndex(s, dir, graft.search.Sq.train(trainSample(s, dir)))

  private[queries] def buildIvfPqIndex(s: SparkSession, dir: String,
      q: Ivf.Quantizer, cb: Pq.Codebook): DataFrame =
    Pq.encode(Ivf.buildIndex(embT(s, dir), q), cb)

  private[queries] def buildIvfPqIndex(s: SparkSession, dir: String): DataFrame = {
    val sm = trainSample(s, dir)
    buildIvfPqIndex(s, dir, Ivf.train(sm, IvfK, iters = IvfItersPq),
      Pq.train(sm, m = PqM, ksub = PqKsub))
  }

  private[queries] def buildIvfPqResIndex(s: SparkSession, dir: String,
      q: Ivf.Quantizer, cb: Pq.Codebook): DataFrame =
    Pq.encodeResidual(Ivf.buildIndex(embT(s, dir), q), q, cb)

  private[queries] def buildIvfPqResIndex(s: SparkSession, dir: String)
      : DataFrame = {
    val sm = trainSample(s, dir)
    val q = Ivf.train(sm, IvfK, iters = IvfItersPq)
    buildIvfPqResIndex(s, dir, q, Pq.trainResidual(sm, q, PqM, PqKsub))
  }

  private[queries] def buildHnswIndex(s: SparkSession, dir: String): DataFrame =
    Hnsw.buildIndexTable(
      embT(s, dir).select(
        format_string(HnswIdFmt, col("vec_id")).as("vec_id"), col("vector")),
      numShards = HnswShards, m = HnswM, efConstruction = HnswEfc,
      idCol = "vec_id")

  /** Deferred builders, keyed like the queries' getOrCache calls.
    * Thunks, not plans: building trains a quantizer (a sample collect),
    * which a freshness-skip must not pay. */
  def annIndexStages(dir: String)
      : Seq[(String, SparkSession => DataFrame)] = Seq(
    (s"ivf_index:$dir", buildIvfIndex(_, dir)),
    (s"pq_index:$dir", buildPqIndex(_, dir)),
    (s"sq_index:$dir", buildSqIndex(_, dir)),
    (s"ivfpq_index:$dir", buildIvfPqIndex(_, dir)),
    (s"ivfpq_res_index:$dir", buildIvfPqResIndex(_, dir)),
    (s"hnsw_index:$dir", buildHnswIndex(_, dir)))

  private val m1Features: Q = (s, dir) => {
    val media = MediaPipeline.mediaFromDocuments(Tables.documents(s, dir))
    MediaPipeline.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("byte_len"),
        col("content_hash"), col("header_hex"), col("width"), col("height"),
        col("n_frames"))
      .orderBy(col("media_id"))
  }

  private val m1Sql =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  octet_length(encode(text)) AS byte_len,
      |  md5(text) AS content_hash,
      |  substr(hex(encode(text)), 1, 8) AS header_hex,
      |  16 + (CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 1024) AS width,
      |  16 + (CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 1024) AS height,
      |  CASE WHEN doc_id % 3 = 2 THEN 1 + (ascii(substr(md5(text), 9, 1)) & 15) ELSE 1 END AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin

  // m2 — frame sampling + resize: decode → uniform-stride sample (≤4
  // frames/video) → aspect-preserving fit into a 224² box, per-frame
  // content hash. Pure integer arithmetic + md5 ⇒ exact DuckDB oracle.
  private val m2Frames: Q = (s, dir) => {
    val media = MediaPipeline.mediaFromDocuments(Tables.documents(s, dir))
    MediaPipeline.sampleFrames(MediaPipeline.extractFeatures(media).toDF())
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val m2Sql =
    """WITH f AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    md5(text) AS content_hash,
      |    16 + (CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 1024) AS width,
      |    16 + (CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 1024) AS height,
      |    CASE WHEN doc_id % 3 = 2 THEN 1 + (ascii(substr(md5(text), 9, 1)) & 15) ELSE 1 END AS n_frames
      |  FROM documents),
      |u AS (
      |  SELECT media_id, kind, content_hash, width, height,
      |    unnest(range(0, n_frames, (n_frames + 3) // 4)) AS frame_idx
      |  FROM f)
      |SELECT media_id, kind, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  md5(content_hash || ':' || frame_idx) AS frame_hash,
      |  CAST(greatest(1, (width * 224) // greatest(width, height)) AS BIGINT) AS out_w,
      |  CAST(greatest(1, (height * 224) // greatest(width, height)) AS BIGINT) AS out_h
      |FROM u ORDER BY media_id, frame_idx""".stripMargin

  // m3 — REAL raster decode (VERDICT r7 task #3): a deterministic
  // synthetic JPEG per document (dims are pure doc_id arithmetic), decoded
  // back through javax.imageio inside the scan-stage mapPartitions. The
  // DuckDB oracle recomputes the expected dimensions independently, so a
  // hash match proves the encode→decode round-trip recovered the true
  // raster geometry — dims and channel count survive JPEG exactly even
  // though pixels are lossy. Scale shape: bytes live for one row inside
  // the partition iterator; only (id, w, h, c) rows flow out.
  private val m3JpegDecode: Q = (s, dir) => {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 + (id % 40).toInt
        val h = 12 + ((id * 7) % 40).toInt
        val dec = graft.media.ImageCodec
          .decode(graft.media.ImageCodec.syntheticJpeg(w, h, id))
        (id, dec.map(_.width.toLong).getOrElse(-1L),
          dec.map(_.height.toLong).getOrElse(-1L),
          dec.map(_.channels.toLong).getOrElse(-1L))
      })
      .toDF("media_id", "width", "height", "channels")
      .orderBy(col("media_id"))
  }

  private val m3Sql =
    """SELECT doc_id AS media_id,
      |  CAST(16 + doc_id % 40 AS BIGINT) AS width,
      |  CAST(12 + (doc_id * 7) % 40 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels
      |FROM documents ORDER BY media_id""".stripMargin

  // v5 — ANN self-check: multi-probe LSH search vs exact scan, one row per
  // probe depth (0 = single bucket, 1 = +1-bit flips, 2 = +2-bit flips) —
  // the recall/scan-cost tradeoff curve. Deterministic (seeded planes,
  // fixed query); PlanShapeSpec asserts recall/scan monotonicity in depth.
  /** One-job probe evaluation shared by v5/v6: collect each group's exact
    * top-10 + group size, then answer every probe set on the driver (the
    * global top-10 over any union of groups is the top-10 of the union of
    * per-group top-10s — [[graft.search.VectorSearch.topKPerGroup]]).
    */
  private def probeCurve(index: DataFrame, query: Array[Float],
      groupCol: String, probes: Seq[(Int, Set[Int])]): Seq[(Int, Double, Long, Long, Double)] = {
    val cand = graft.search.VectorSearch
      .topKPerGroup(index, query, 10, groupCol, tieBreak = "vec_id")
      .select(col(groupCol).cast("int"), col("vec_id").cast("long"),
        col("similarity"), col("group_size").cast("long"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val sizeOf = cand.map(c => c._1 -> c._4).toMap
    val total = sizeOf.values.sum
    def top10(groups: Set[Int]): Set[Long] =
      cand.filter(c => groups(c._1)).sortBy(c => (-c._3, c._2))
        .take(10).map(_._2).toSet
    val exact = top10(sizeOf.keySet)
    probes.map { case (label, groups) =>
      val approx = top10(groups)
      val scanned = groups.toSeq.map(g => sizeOf.getOrElse(g, 0L)).sum
      (label, exact.intersect(approx).size.toDouble / exact.size,
        scanned, total, scanned.toDouble / total)
    }
  }

  private val v5AnnRecall: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val dim = e.head().getAs[scala.collection.Seq[Float]]("vector").length
    val planes = Ann.makePlanes(dim, numPlanes = 6)
    val index = Ann.buildIndex(e, planes)
    val query = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val qb = Ann.bucketOf(query, planes)
    val probes = (0 to 2).map(d =>
      d -> Ann.probeBuckets(qb, planes, d).toSet)
    probeCurve(index, query, "bucket", probes)
      .toDF("probe_depth", "recall_at_10", "rows_scanned", "rows_total",
        "scan_fraction")
  }

  // v6 — IVF ANN self-check: k-means coarse quantizer (the pgvector-IVFFlat
  // analog) trained on a deterministic sample, nearest-list assignment via
  // the codegen'd IvfAssign, nprobe-pruned exact re-rank. One row per
  // nprobe; probing all k lists degenerates to the exact scan, so the last
  // row's recall is 1.0 by construction — a built-in exactness witness.
  private val v6IvfRecall: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val k = IvfK
    val q = Ivf.train(trainSample(s, dir), k, iters = IvfItersFull)
    // the corpus-wide assign scan is a write-time table; the query pays
    // training on the fixed sample (deterministic — the same q the
    // persisted table was built with) plus the pruned probe. The
    // already-trained q rides into the builder: a cache miss must not
    // train twice
    val index = StageCache.getOrCache(s, s"ivf_index:$dir",
      annIndexFingerprint(dir))(buildIvfIndex(s, dir, q))
    val query = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val probes = Seq(1, 2, 4, k).map(np =>
      np -> Ivf.nearestLists(query, q, np).toSet)
    probeCurve(index, query, "list_id", probes)
      .toDF("nprobe", "recall_at_10", "rows_scanned", "rows_total",
        "scan_fraction")
  }

  // v7 — product-quantization self-check: 32× compressed ADC scan, recall
  // vs the exact scan for ADC-only / shortlist-re-ranked variants. The
  // rerank_all row re-ranks every row exactly, so its recall is 1.0 by
  // construction (the same exactness witness pattern as v6's full probe).
  private val v7PqRecall: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val cb = Pq.train(trainSample(s, dir), m = PqM, ksub = PqKsub)
    val index = StageCache.getOrCache(s, s"pq_index:$dir",
      annIndexFingerprint(dir))(buildPqIndex(s, dir, cb))
    val query = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val exact = graft.search.VectorSearch
      .knn(e, query, 10, vectorCol = "vector", tieBreak = "vec_id")
      .select(col("vec_id")).as[Long].collect().toSet
    def recall(df: DataFrame): Double =
      df.select(col("vec_id")).as[Long].collect().toSet
        .intersect(exact).size.toDouble / exact.size
    val adcOnly = index
      .withColumn("adc_score", Pq.adcCosine(col("pq_code"), query, cb))
      .orderBy(col("adc_score").desc, col("vec_id")).limit(10)
    val rerank50 = Pq.searchCosine(index, query, cb, 10,
      shortlist = 50, tieBreak = "vec_id")
    val nRows = e.count().toInt
    val rerankAll = Pq.searchCosine(index, query, cb, 10,
      shortlist = nRows, tieBreak = "vec_id")
    val ratio = cb.dim * 4.0 / cb.m // float bytes vs one byte per code
    Seq(
      ("adc_only", recall(adcOnly), 10L, ratio),
      ("rerank_50", recall(rerank50), 50L, ratio),
      ("rerank_all", recall(rerankAll), nRows.toLong, ratio))
      .toDF("variant", "recall_at_10", "shortlist", "compression_ratio")
  }

  // v9 — IVFPQ composition self-check: the 100 TB search shape end to
  // end. IVF decides WHICH rows to scan (nprobe-pruned list partitions),
  // PQ shrinks WHAT the scan reads (byte codes for ADC scoring), and an
  // exact re-rank of the shortlist finishes. Per probe depth the query
  // reports recall@10 vs the exact scan and the scanned-row fraction.
  // Scan fraction is monotone in nprobe; recall at a FIXED shortlist is
  // not — probing all lists admits every ADC-distortion distractor into
  // the 50-row shortlist and converges exactly to flat PQ (v7's
  // rerank_50), while a tight probe pre-filters distractors by true
  // geometry (measured at sf0.01: nprobe 1/4/16 → recall 0.9/1.0/0.7
  // at 7%/26%/100% scan; 0.7 = v7's flat rerank_50). That interplay —
  // shortlist must grow with probed volume — is the real IVFPQ tuning
  // rule, and this query is the regression guard that documents it.
  // Training is deterministic (seedless k-means over a sorted sample),
  // so the driver's rows-only check is stable.
  private val v9IvfPqRecall: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val sample = trainSample(s, dir)
    val q = Ivf.train(sample, k = IvfK, iters = IvfItersPq)
    val cb = Pq.train(sample, m = PqM, ksub = PqKsub)
    val index = StageCache.getOrCache(s, s"ivfpq_index:$dir",
      annIndexFingerprint(dir))(buildIvfPqIndex(s, dir, q, cb))
    val query = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val exact = graft.search.VectorSearch
      .knn(e, query, 10, vectorCol = "vector", tieBreak = "vec_id")
      .select(col("vec_id")).as[Long].collect().toSet
    val n = e.count().toDouble
    val rows = Seq(1, 4, 16).map { nprobe =>
      val lists = Ivf.nearestLists(query, q, nprobe)
      val probed = index.filter(col("list_id").isin(lists: _*))
      val hits = Pq.searchCosine(probed, query, cb, 10,
          shortlist = 50, tieBreak = "vec_id")
        .select(col("vec_id")).as[Long].collect().toSet
      (nprobe.toLong, hits.intersect(exact).size.toDouble / exact.size,
        probed.count() / n)
    }
    rows.toDF("nprobe", "recall_at_10", "scan_fraction")
  }

  // v23 — RESIDUAL IVFPQ (the FAISS IndexIVFPQ default, by_residual):
  // PQ codes quantize `vector − centroid[list_id]` instead of the raw
  // vector, and the ADC reconstructs `centroid + codeword` per probed
  // list (per-list LUT constants fold the cross terms — Pq.
  // residualAdcCosine). Same code bytes as v9's plain IVFPQ; the output
  // compares recall@10 of both variants at equal (nprobe, shortlist)
  // budgets, plus the exactness witness every compressed search carries:
  // full probe + corpus-sized shortlist ⇒ exact KNN (the re-rank reads
  // raw vectors, so approximation only ever shapes the shortlist).
  // No SQL oracle (the output IS approximation quality) — checks.json
  // verifies the witness row self-evidently; the full result is
  // golden-pinned per sf.
  private val v23IvfPqResidual: Q = (s, dir) => {
    import s.implicits._
    val e = embT(s, dir)
    val sm = trainSample(s, dir)
    val q = Ivf.train(sm, IvfK, iters = IvfItersPq)
    val cbPlain = Pq.train(sm, m = PqM, ksub = PqKsub)
    val cbRes = Pq.trainResidual(sm, q, m = PqM, ksub = PqKsub)
    val plainIdx = StageCache.getOrCache(s, s"ivfpq_index:$dir",
      annIndexFingerprint(dir))(buildIvfPqIndex(s, dir, q, cbPlain))
    val resIdx = StageCache.getOrCache(s, s"ivfpq_res_index:$dir",
      annIndexFingerprint(dir))(buildIvfPqResIndex(s, dir, q, cbRes))
    val query = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val exact = graft.search.VectorSearch
      .knn(e, query, 10, vectorCol = "vector", tieBreak = "vec_id")
      .select(col("vec_id")).as[Long].collect().toSet
    def recall(df: DataFrame): Double =
      df.select(col("vec_id")).as[Long].collect().toSet
        .intersect(exact).size.toDouble / exact.size
    val n = e.count().toInt
    val rows = Seq(1, 4).flatMap { np =>
      Seq(
        ("plain", np.toLong, recall(Pq.searchIvfPq(plainIdx, query, q,
          cbPlain, 10, nprobe = np, shortlist = 50, tieBreak = "vec_id"))),
        ("residual", np.toLong, recall(Pq.searchIvfPqResidual(resIdx,
          query, q, cbRes, 10, nprobe = np, shortlist = 50,
          tieBreak = "vec_id"))))
    } :+ (("rerank_all", IvfK.toLong, recall(Pq.searchIvfPqResidual(
      resIdx, query, q, cbRes, 10, nprobe = IvfK, shortlist = n,
      tieBreak = "vec_id"))))
    rows.toDF("variant", "nprobe", "recall_at_10")
      .orderBy(col("variant"), col("nprobe"))
  }

  // v8 — scalar-quantization (SQ8) self-check: 4× compressed per-dimension
  // byte codes ([[graft.search.Sq]] — a uniform-grid PQ codebook shape, so
  // encode/ADC/search reuse the PQ machinery and its vector-free scan).
  // Far less distortion than PQ's 32×: the adc_only row typically already
  // recovers the exact top-10; rerank_all is 1.0 by construction — the
  // same exactness witness as v6's full probe and v7's rerank_all.
  private val v8SqRecall: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val cb = graft.search.Sq.train(trainSample(s, dir))
    val index = StageCache.getOrCache(s, s"sq_index:$dir",
      annIndexFingerprint(dir))(buildSqIndex(s, dir, cb))
    val query = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val exact = graft.search.VectorSearch
      .knn(e, query, 10, vectorCol = "vector", tieBreak = "vec_id")
      .select(col("vec_id")).as[Long].collect().toSet
    def recall(df: DataFrame): Double =
      df.select(col("vec_id")).as[Long].collect().toSet
        .intersect(exact).size.toDouble / exact.size
    val adcOnly = index
      .withColumn("adc_score", Pq.adcCosine(col("pq_code"), query, cb))
      .orderBy(col("adc_score").desc, col("vec_id")).limit(10)
    val rerank50 = Pq.searchCosine(index, query, cb, 10,
      shortlist = 50, tieBreak = "vec_id")
    val nRows = e.count().toInt
    val rerankAll = Pq.searchCosine(index, query, cb, 10,
      shortlist = nRows, tieBreak = "vec_id")
    val ratio = 4.0 // d floats → d bytes
    Seq(
      ("adc_only", recall(adcOnly), 10L, ratio),
      ("rerank_50", recall(rerank50), 50L, ratio),
      ("rerank_all", recall(rerankAll), nRows.toLong, ratio))
      .toDF("variant", "recall_at_10", "shortlist", "compression_ratio")
  }

  // v10 — HNSW graph-ANN self-check: shard-local deterministic HNSW
  // graphs ([[graft.search.Hnsw]] — the reference's primary index class,
  // pgvector HNSW, storage/schema.py:78-84) + global top-k merge, recall
  // vs the exact batch scan per beam width. The last row runs ef = n ≥
  // every shard size: the beam never fills, the spine-connected graph is
  // fully traversed, and the search IS the exact scan — recall 1.0 by
  // construction (same witness pattern as v6 full-probe / v7 rerank_all).
  private val v10HnswRecall: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(format_string("v%08d", col("vec_id")).as("vec_id"),
        col("embedding").as("vector"))
    val n = e.count().toInt
    val queries = e.orderBy(col("vec_id")).limit(5)
      .as[(String, Array[Float])].collect().toSeq
    val qDf = queries.toDF("query_id", "query_vector")
    def topSets(df: DataFrame): Map[String, Set[String]] =
      df.select(col("query_id"), col("vec_id")).as[(String, String)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(VectorSearch.batchKnn(e, qDf, 10, tieBreak = "vec_id"))
    // build the shard graphs ONCE (the adjacency-table form) and answer
    // every beam width off the restored graphs — searchIndex ≡
    // searchBatch at equal ef is spec-pinned (HnswPersistSpec), so this
    // is the same query three builds cheaper
    val indexTable = StageCache.getOrCache(s, s"hnsw_index:$dir",
      annIndexFingerprint(dir))(buildHnswIndex(s, dir))
    Seq(8, 24, n).distinct.map { ef =>
      val hits = topSets(Hnsw.searchIndex(indexTable, queries, 10, ef,
        idCol = "vec_id"))
      val rec = queries.map { case (qid, _) =>
        val t = exact(qid)
        hits.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
      }
      (ef.toLong, rec.sum / rec.size)
    }.toDF("ef", "recall_at_10")
  }

  val defs: Map[String, Q] = Map(
    "v10_hnsw_recall" -> v10HnswRecall,
    "v8_sq_recall" -> v8SqRecall,
    "v9_ivfpq_recall" -> v9IvfPqRecall,
    "v23_ivfpq_residual" -> v23IvfPqResidual,
    "m1_media_features" -> m1Features,
    "m2_frame_sample" -> m2Frames,
    "m3_jpeg_decode" -> m3JpegDecode,
    "v5_ann_recall" -> v5AnnRecall,
    "v6_ivf_recall" -> v6IvfRecall,
    "v7_pq_recall" -> v7PqRecall)

  val oracles: Map[String, String] = Map(
    "m1_media_features" -> m1Sql,
    "m2_frame_sample" -> m2Sql,
    "m3_jpeg_decode" -> m3Sql)
}
