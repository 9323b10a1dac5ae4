package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic corpus splitting and sampling — the operations every
  * training-data pipeline runs before anything else: assign each document
  * to train/validation/test by a stable content-independent hash, and draw
  * reproducible stratified samples for eval sets and ablations.
  *
  * Determinism is the whole point: `rand()` splits are neither reproducible
  * across runs nor stable under re-partitioning, so both queries key off
  * `md5(doc_id)` — the same recipe as the ingest ids (shared/hashing.py:10-25
  * in the reference) — making the split a pure function of the row. That is
  * also what makes the DuckDB oracle possible (identical md5 on both
  * engines, per the 60-bit hex-prefix recipe used by the dedup queries).
  *
  * Scale: g1 is a narrow map + one partial hash-agg (three output rows);
  * g2 shuffles once on the stratum key and sorts within partitions — the
  * same profile as any per-key window, so a skewed stratum is bounded by
  * its own row count. Neither materializes the sample before filtering.
  */
object SamplingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** 60-bit integer from the md5 hex prefix of a column's string form —
    * uniform, deterministic, and byte-identical to DuckDB's
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`. Delegates to the ONE
    * pinned Spark/DuckDB hash recipe ([[graft.functions.TextSketch.hexInt]],
    * shared with the MinHash family) so the parity-critical construction
    * cannot drift between the sampling and dedup paths.
    */
  private def hash60(c: Column): Column =
    graft.functions.TextSketch.hexInt(c.cast("string"))

  private val duckHash60 =
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"

  // ---- G1: deterministic train/validation/test split (90/5/5) by hash
  // bucket — the assignment is a pure function of doc_id, so re-running
  // the pipeline (or re-partitioning the input) never moves a document
  // across splits. Aggregates per split: docs, chars, distinct languages.
  private val g1HashSplit: Q = (s, dir) => {
    val bucket = pmod(hash60(col("doc_id")), lit(100L))
    val split = when(bucket < 90, "train")
      .when(bucket < 95, "validation")
      .otherwise("test")
    Tables.documents(s, dir)
      .select(split.as("split"), col("lang"), col("n_chars"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))
  }

  private val g1Sql =
    s"""SELECT CASE WHEN h < 90 THEN 'train'
       |            WHEN h < 95 THEN 'validation'
       |            ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
       |  COUNT(DISTINCT lang) AS n_langs
       |FROM (SELECT lang, n_chars, $duckHash60 % 100 AS h FROM documents)
       |GROUP BY 1 ORDER BY split""".stripMargin

  // ---- G2: stratified 10% sample — per-language hash-rank pick, so every
  // stratum contributes ceil(10%) of its rows and the picked set is stable
  // across runs/partitionings. Integer ceil-div keeps both engines exact.
  private val g2StratifiedSample: Q = (s, dir) => {
    val rankW = Window.partitionBy(col("lang"))
      .orderBy(hash60(col("doc_id")).asc, col("doc_id").asc)
    val sizeW = Window.partitionBy(col("lang"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("__rn", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(sizeW))
      .filter(col("__rn") <= expr("(__n + 9) DIV 10"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("lang"), col("doc_id"))
  }

  private val g2Sql =
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY $duckHash60, doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM documents)
       |WHERE rn <= (n + 9) // 10
       |ORDER BY lang, doc_id""".stripMargin

  // G3 — corpus mixing: upsample low-resource languages by an integer
  // repeat factor (the training-data mixing recipe — epochs per source,
  // not fractional sampling), then give every copy a deterministic
  // shuffle key md5(doc_id:copy) so the training order is reproducible
  // and uniform without a global sort (at 100 TB the trainer range-
  // partitions on the key; the key assignment itself is narrow map
  // work). The fan-out is explode(sequence(1, w)) — bounded by the
  // weight table, never data-dependent. Output: per-language census of
  // the mixed corpus with key-range witnesses, exact strings/longs.
  private val mixWeights =
    Seq("en" -> 1, "de" -> 2, "es" -> 2, "fr" -> 2, "zh" -> 3)

  private val g3CorpusMix: Q = (s, dir) => {
    val w = mixWeights.tail.foldLeft(
      when(col("lang") === mixWeights.head._1, mixWeights.head._2)) {
      case (acc, (l, n)) => acc.when(col("lang") === l, n)
    }.otherwise(1)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1), w)).as("copy"))
      .withColumn("shuffle_key",
        md5(concat_ws(":", col("doc_id"), col("copy"))))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_copies"),
        min(col("shuffle_key")).as("first_key"),
        max(col("shuffle_key")).as("last_key"))
      .orderBy(col("lang"))
  }

  private val g3Sql = {
    val cases = mixWeights
      .map { case (l, n) => s"WHEN lang = '$l' THEN $n" }.mkString(" ")
    s"""SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_copies,
       |  MIN(shuffle_key) AS first_key, MAX(shuffle_key) AS last_key
       |FROM (
       |  SELECT doc_id, lang,
       |    md5(doc_id || ':' || copy) AS shuffle_key
       |  FROM (SELECT doc_id, lang,
       |          UNNEST(range(1, (CASE $cases ELSE 1 END) + 1)) AS copy
       |        FROM documents))
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // G4 — sequence packing (the concat-and-chunk training-batch recipe):
  // documents concatenate in a deterministic shuffle order and split into
  // fixed-size bins; each document's bin is its running token count's
  // integer quotient. A single global cumsum would serialize the corpus
  // through one task, so packing is SHARD-LOCAL (the production layout:
  // one packed stream per output shard): shard = hash bucket, the cumsum
  // window partitions on it, and waste stays bounded per shard. Token
  // counts, cumsums and bin ids are exact integers end to end; the
  // per-shard summary reports fill fraction as one double division.
  private val PackShards = 8
  private val PackLen = 512L // tokens per packed sequence

  private val g4SequencePacking: Q = (s, dir) => {
    val toks = size(graft.functions.TextSketch.words(col("text"))).cast("long")
    val shard = pmod(hash60(col("doc_id")), lit(PackShards.toLong))
    val order = Window.partitionBy(col("shard"))
      .orderBy(hash60(col("doc_id")).asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("doc_id"), shard.as("shard"), toks.as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(order))
      // bin of the document's FIRST token (concat-and-chunk: a doc can
      // straddle a boundary; it starts in this bin)
      .withColumn("bin", expr(s"(cum - n_tok) DIV $PackLen"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        max(col("n_docs")).as("max_docs_per_bin"))
      .select(col("shard"), col("n_bins"), col("n_docs"), col("n_tokens"),
        col("max_docs_per_bin"),
        (col("n_tokens").cast("double") /
          (col("n_bins") * PackLen).cast("double")).as("fill_fraction"))
      .orderBy(col("shard"))
  }

  private val g4Sql = {
    val w = graft.functions.TextSketch.duck.words("text")
    s"""WITH d AS (
       |  SELECT doc_id, $duckHash60 % $PackShards AS shard,
       |    CAST(len($w) AS BIGINT) AS n_tok, $duckHash60 AS h
       |  FROM documents),
       |c AS (
       |  SELECT shard, n_tok,
       |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d),
       |bins AS (
       |  SELECT shard, (cum - n_tok) // $PackLen AS bin,
       |    COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens
       |  FROM c GROUP BY 1, 2)
       |SELECT shard, COUNT(*) AS n_bins,
       |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  MAX(n_docs) AS max_docs_per_bin,
       |  CAST(SUM(n_tokens) AS DOUBLE) /
       |    CAST(COUNT(*) * $PackLen AS DOUBLE) AS fill_fraction
       |FROM bins GROUP BY shard ORDER BY shard""".stripMargin
  }

  // G5 — UniMax language balancing (public recipe: cap every language at
  // a fixed document budget; under-budget languages keep everything,
  // over-budget ones are thinned to ~B docs). The thinning decision is
  // `md5-hash(doc) mod n_lang < B` — a pure INTEGER test, so (a) it is a
  // deterministic function of the row plus one per-language count, never
  // of partitioning or float rounding, and (b) each doc keeps with
  // probability exactly B/n_lang (the hash residue is uniform on
  // [0, n_lang)). Uses a salted hash so membership is independent of the
  // g1 split assignment. Shape: one shuffle on lang for the count window;
  // the following lang agg reuses the same partitioning (no second
  // exchange). At 100 TB the language census is a dictionary-sized
  // broadcast instead of a window — same decision rule either way.
  private val UnimaxBudget = 60L

  private val g5Unimax: Q = (s, dir) => {
    val perLang = Window.partitionBy(col("lang"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("__n", count(lit(1)).over(perLang))
      .withColumn("__keep",
        pmod(hash60(concat(lit("unimax:"), col("doc_id").cast("string"))),
          col("__n")) < lit(UnimaxBudget))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        sum(when(col("__keep"), col("n_chars")).otherwise(lit(0L)))
          .as("kept_chars"))
      .orderBy(col("lang"))
  }

  private val g5Sql =
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
       |FROM (SELECT lang, n_chars,
       |  (CAST('0x' || substr(md5('unimax:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
       |     % COUNT(*) OVER (PARTITION BY lang)) < $UnimaxBudget AS keep
       |  FROM documents)
       |GROUP BY lang ORDER BY lang""".stripMargin

  // G6 — CLUSTER-BALANCED sampling (the embedding-space curation shape:
  // cluster the corpus, then draw equally from every cluster so no
  // region of embedding space dominates the mix — the cluster-side twin
  // of g5's per-language UniMax). Centroids are TRAINED (r13, production
  // shape): [[graft.search.Ivf.train]] k-means over the deterministic
  // bounded sample the v-family quantizers use (first G6SampleN ids,
  // ordered — fully deterministic: evenly-spaced init, fixed-order Lloyd
  // folds), K = 64. The trained centroids persist as a WRITE-TIME
  // artifact keyed by an exact corpus fingerprint, and the DuckDB oracle
  // reads the same floats back — training correctness is covered by the
  // Ivf specs and v6's full-probe oracle; what the oracle independently
  // replays here is the assignment + balance logic over those centroids.
  // Assignment is nearest-centroid by the v-family's fixed-IEEE-sequence
  // cosine with an id tie-break; the balance rule keeps min-cluster-size
  // docs per cluster, picked by the salted 60-bit hash rank
  // (reproducible under any partitioning, independent of the g1 split).
  // Output is ids only — no float ever reaches the hash compare.
  //
  // Scale shape: centroids BROADCAST (K rows); the K cosines per row are
  // map-side; the per-vector argmax is a groupBy(vec_id) max_by — the
  // partial aggregate reduces each vector's K candidate rows to one
  // BEFORE the shuffle, so the exchange carries n rows, not n·K
  // (plan-guarded). The cluster census/rank is one cluster_id shuffle
  // over K=64 real partitions (the g2/g5 window profile); the global min
  // is a K-row aggregate broadcast back. At 100 TB: training stays a
  // bounded driver-side sample, centroids stay a broadcast table, and
  // the only corpus-sized exchanges are the n-row argmax output and the
  // cluster_id window.
  private val G6K = 64
  private val G6SampleN = 1024
  private[queries] val G6CentroidDir = "localdata/g6-centroids"

  /** Exact corpus fingerprint keying the centroid artifact partition:
    * an order-free LONG sum both engines compute bit-identically
    * (float32 → double is exact; floor lands on an integer; the sums
    * are integral, so no float fold-order can leak in). Mixes EVERY
    * dimension (position-weighted) and the vec_id — a first-coordinate-
    * only digest collided for corpora differing in later dims or id
    * assignment, letting one corpus clobber another's artifact
    * partition and feed the wrong centroids to its oracle replay.
    * The aggregate is coalesced to 0 for an EMPTY embedding: Spark's
    * sequence(1, 0) is the descending [1, 0], zip_with null-pads, and
    * the fold goes null — which sum() would silently drop, while the
    * DuckDB twin (range → empty list → reduce = 0) still counts that
    * row's vec_id (ADVICE r13). */
  private[queries] def g6CorpusFp(e: DataFrame): Long =
    e.agg(sum(col("vec_id").cast("long") + expr(
      "coalesce(aggregate(zip_with(embedding, sequence(1, size(embedding)), " +
        "(v, i) -> CAST(i AS BIGINT) * " +
        "CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x), CAST(0 AS BIGINT))"))
      .as("v"))
      .head().getLong(0)

  /** The DuckDB twin of [[g6CorpusFp]] over the `embeddings` view —
    * shared with the v5–v9 oracle artifacts (they key on the same
    * corpus fingerprint). */
  private[queries] val duckEmbCorpusFp: String =
    """(SELECT CAST(SUM(vec_id + list_reduce(
      |        list_prepend(0::BIGINT, list_transform(
      |          range(1, len(embedding)+1),
      |          i -> i * CAST(FLOOR(embedding[i]::DOUBLE * 1e6) AS BIGINT))),
      |        (acc, x) -> acc + x)) AS BIGINT) FROM embeddings)"""
      .stripMargin

  private val g6ClusterBalance: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val fp = g6CorpusFp(e)
    val sample = e.filter(col("vec_id") < G6SampleN).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val q = graft.search.Ivf.train(sample, G6K)
    val spark2 = s
    import spark2.implicits._
    val cents = (0 until q.k)
      .map(c => (fp, c.toLong, q.centroid(c).toSeq))
      .toDF("corpus_fp", "cid", "cvec")
    // write-time centroid artifact: dynamic partition overwrite keeps
    // other corpora's partitions (each sf writes only its own fp)
    val overwriteKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(overwriteKey)
    s.conf.set(overwriteKey, "dynamic")
    try cents.write.mode("overwrite").partitionBy("corpus_fp")
      .parquet(G6CentroidDir)
    finally prev match {
      case Some(v) => s.conf.set(overwriteKey, v)
      case None => s.conf.unset(overwriteKey)
    }
    // r15: nearest-centroid by a one-pass codegen'd argmax
    // ([[org.apache.spark.sql.graft.CosineArgmax]] — bit-identical cosine
    // arithmetic + the same (sim, -cid) tie rule) instead of
    // crossJoin(broadcast) → groupBy(vec_id).max_by: no n·K intermediate
    // rows, and the n-row argmax exchange disappears — assignment is now
    // pure map work (guide §2.4). The min-cluster size likewise comes
    // from a K-row groupBy census instead of a count-over-window +
    // distinct (guide §2.3); the rank window is the only corpus-sized
    // exchange left. CosineArgmaxSpec pins argmax parity to the old
    // formulation; the unchanged DuckDB oracle replays assignment +
    // balance from the artifact floats.
    val assigned = e.select(col("vec_id"),
      org.apache.spark.sql.graft.VectorExpressions
        .cosineArgmax(col("embedding"), q.centroidsFlat, q.dim)
        .cast("long").as("cluster_id"))
    val perCluster = Window.partitionBy(col("cluster_id"))
    val ranked = assigned
      .withColumn("__r", row_number().over(perCluster.orderBy(
        hash60(concat(lit("cluster:"), col("vec_id").cast("string"))),
        col("vec_id"))))
    val m = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__m"))
    ranked.crossJoin(broadcast(m))
      .filter(col("__r") <= col("__m"))
      .select(col("cluster_id").cast("long").as("cluster_id"),
        col("vec_id").cast("long").as("vec_id"))
      .orderBy(col("cluster_id"), col("vec_id"))
  }

  private val g6Sql = {
    // the same fixed-order cosine the v-family oracles use
    def norm2(v: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($v)+1), i -> $v[i]::DOUBLE * $v[i]::DOUBLE)), (acc, x) -> acc + x)"
    val dot =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len(e.embedding)+1), i -> e.embedding[i]::DOUBLE * c.cvec[i]::DOUBLE)), (acc, x) -> acc + x)"
    val sim = s"(CASE WHEN ${norm2("e.embedding")} = 0.0 OR ${norm2("c.cvec")} = 0.0 " +
      s"THEN 0.0 ELSE $dot / (sqrt(${norm2("e.embedding")}) * sqrt(${norm2("c.cvec")})) END)"
    s"""WITH fp AS (SELECT CAST(SUM(vec_id + list_reduce(
       |        list_prepend(0::BIGINT, list_transform(
       |          range(1, len(embedding)+1),
       |          i -> i * CAST(FLOOR(embedding[i]::DOUBLE * 1e6) AS BIGINT))),
       |        (acc, x) -> acc + x)) AS BIGINT) AS v FROM embeddings),
       |c AS (SELECT CAST(cid AS BIGINT) AS cid, cvec
       |      FROM read_parquet(
       |        '${new java.io.File(G6CentroidDir).getAbsolutePath}/*/*.parquet',
       |        hive_partitioning=1), fp
       |      WHERE CAST(corpus_fp AS BIGINT) = fp.v),
       |a AS (SELECT e.vec_id, c.cid,
       |        ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |          ORDER BY $sim DESC, c.cid) AS rn
       |      FROM embeddings e CROSS JOIN c),
       |asg AS (SELECT vec_id, cid AS cluster_id FROM a WHERE rn = 1),
       |r AS (SELECT cluster_id, vec_id,
       |        ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY
       |          CAST('0x' || substr(md5('cluster:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
       |          vec_id) AS rr,
       |        COUNT(*) OVER (PARTITION BY cluster_id) AS n
       |      FROM asg),
       |m AS (SELECT MIN(n) AS mn
       |      FROM (SELECT DISTINCT cluster_id, n FROM r))
       |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       |  CAST(vec_id AS BIGINT) AS vec_id
       |FROM r, m WHERE rr <= m.mn ORDER BY cluster_id, vec_id""".stripMargin
  }

  // G7 — TEMPERATURE-SCALED language mixing (the mT5/XLM-R rule:
  // sample language l with p_l ∝ n_l^α so low-resource languages are
  // up-weighted relative to their corpus share; α = 0.5 here). The
  // per-language quota is INTEGER-EXACT on purpose: s_l =
  // (T · ⌊√n_l⌋) div Σ⌊√n_m⌋ — ⌊√n⌋ of a BIGINT is exactly one
  // correctly-rounded IEEE sqrt + floor (bit-identical across engines,
  // unlike pow(n, 0.3), whose last ulp is libm-specific and would flap
  // a hash-threshold compare), the sum is an order-free integer sum,
  // and the division is integral. Selection within a language is the
  // g5 rule — the T·p_l lowest salted-hash docs, rank-capped — so a
  // small language whose quota exceeds n_l keeps everything (the
  // UniMax cap emerges naturally from the rank). Output per language:
  // corpus size, quota, kept docs/chars.
  //
  // Scale shape: one narrow row per document through the per-language
  // count + rank windows (the g5/x23 profile); quotas are an L-row
  // broadcast. At 100 TB the rank cutoff becomes a per-language
  // approximate hash-threshold (keep iff hash < quota/n_l · 2^60 —
  // no sort) with the same expected allocation; this entry keeps the
  // exact rank form the oracle can replay.
  private val G7Budget = 600L
  private val g7TemperatureMix: Q = (s, dir) => {
    val perLang = Window.partitionBy(col("lang"))
    val counted = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("__n", count(lit(1)).over(perLang))
      .withColumn("__sq",
        floor(sqrt(col("__n").cast("double"))).cast("long"))
      .withColumn("__rk", row_number().over(
        perLang.orderBy(hash60(col("doc_id")).asc, col("doc_id").asc)))
    val sTotal = counted.select(col("lang"), col("__sq")).distinct()
      .agg(sum(col("__sq")).as("S"))
    counted.join(broadcast(sTotal))
      .withColumn("__quota", expr(s"($G7Budget * __sq) div S"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("__quota")).as("quota"),
        sum(when(col("__rk") <= col("__quota"), lit(1L)).otherwise(lit(0L)))
          .as("n_kept"),
        sum(when(col("__rk") <= col("__quota"), col("n_chars"))
          .otherwise(lit(0L))).as("kept_chars"))
      .orderBy(col("lang"))
  }

  private val g7Sql =
    s"""WITH counted AS (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(FLOOR(SQRT(COUNT(*) OVER (PARTITION BY lang))) AS BIGINT)
       |      AS sq,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY $duckHash60, doc_id) AS rk
       |  FROM documents),
       |s AS (SELECT CAST(SUM(sq) AS BIGINT) AS S
       |      FROM (SELECT DISTINCT lang, sq FROM counted)),
       |flagged AS (
       |  SELECT lang, n_chars, rk,
       |    ($G7Budget * sq) // S AS quota
       |  FROM counted, s)
       |SELECT lang, COUNT(*) AS n_docs, MAX(quota) AS quota,
       |  CAST(SUM(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(CASE WHEN rk <= quota THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS kept_chars
       |FROM flagged GROUP BY lang ORDER BY lang""".stripMargin

  // G8 — temperature mixing at the CANONICAL α = 0.3 (mT5/XLM-R's
  // published temperature; VERDICT r13 task 8). g7 froze α = 0.5
  // because ⌊√n⌋ is the only n^α an IEEE sqrt computes exactly;
  // pow(n, 0.3)'s last ulp is libm-specific and would flap a
  // hash-threshold compare. The rational-α form restores exactness for
  // α = 3/10: r_l = ⌊(n_l)^(3/10)⌋ = ⌊(n_l³)^(1/10)⌋ is an INTEGER
  // 10th root, and an integer root is checkable with pure integer
  // arithmetic — compute the libm guess g = ⌊pow(n, 0.3)⌋, then pick
  // the largest candidate c ∈ {g+1, g, g−1} with c ≥ 1 and c¹⁰ ≤ n³
  // (the true root is within ±1 of any sub-ulp-accurate pow, so the
  // exact integer comparisons make the libm disagreement irrelevant —
  // engine-independent by construction). All arithmetic stays in
  // BIGINT: safe while n ≤ ~7·10⁵ docs per language (c¹⁰ ≤ 2⁶³); at
  // 100 TB promote the two products to DECIMAL(38,0)/HUGEINT — same
  // construction, wider lanes. Quota + rank-cap semantics are g7's,
  // unchanged: s_l = (T · r_l) div Σ r_m, keep the s_l lowest
  // salted-hash docs, small languages keep everything.
  private def g8Root(nCol: String): String = {
    def p10(c: String) = (1 to 10).map(_ => c).mkString("*")
    val n3 = s"($nCol*$nCol*$nCol)"
    s"""CASE WHEN ${p10(s"(__g+1)")} <= $n3 THEN __g+1
       | WHEN __g >= 1 AND ${p10("__g")} <= $n3 THEN __g
       | ELSE GREATEST(__g-1, CAST(1 AS BIGINT)) END""".stripMargin
      .replace("\n", "")
  }

  private val g8TemperatureAlpha3: Q = (s, dir) => {
    val perLang = Window.partitionBy(col("lang"))
    val counted = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("__n", count(lit(1)).over(perLang))
      .withColumn("__g",
        floor(pow(col("__n").cast("double"), lit(0.3))).cast("long"))
      .withColumn("__r10", expr(g8Root("__n")))
      .withColumn("__rk", row_number().over(
        perLang.orderBy(hash60(col("doc_id")).asc, col("doc_id").asc)))
    val sTotal = counted.select(col("lang"), col("__r10")).distinct()
      .agg(sum(col("__r10")).as("S"))
    counted.join(broadcast(sTotal))
      .withColumn("__quota", expr(s"($G7Budget * __r10) div S"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("__r10")).as("root10"),
        max(col("__quota")).as("quota"),
        sum(when(col("__rk") <= col("__quota"), lit(1L)).otherwise(lit(0L)))
          .as("n_kept"),
        sum(when(col("__rk") <= col("__quota"), col("n_chars"))
          .otherwise(lit(0L))).as("kept_chars"))
      .orderBy(col("lang"))
  }

  private val g8Sql = {
    def p10(c: String) = (1 to 10).map(_ => c).mkString("*")
    s"""WITH counted AS (
       |  SELECT doc_id, lang, n_chars,
       |    COUNT(*) OVER (PARTITION BY lang)::BIGINT AS n,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY $duckHash60, doc_id) AS rk
       |  FROM documents),
       |rooted AS (
       |  SELECT *, CASE WHEN ${p10("(g+1)")} <= (n*n*n) THEN g+1
       |    WHEN g >= 1 AND ${p10("g")} <= (n*n*n) THEN g
       |    ELSE GREATEST(g-1, 1) END AS r10
       |  FROM (SELECT *, CAST(FLOOR(POW(n, 0.3)) AS BIGINT) AS g
       |        FROM counted)),
       |s AS (SELECT CAST(SUM(r10) AS BIGINT) AS S
       |      FROM (SELECT DISTINCT lang, r10 FROM rooted)),
       |flagged AS (
       |  SELECT lang, n_chars, rk, r10,
       |    ($G7Budget * r10) // S AS quota
       |  FROM rooted, s)
       |SELECT lang, COUNT(*) AS n_docs, MAX(r10) AS root10,
       |  MAX(quota) AS quota,
       |  CAST(SUM(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(CASE WHEN rk <= quota THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS kept_chars
       |FROM flagged GROUP BY lang ORDER BY lang""".stripMargin
  }

  def defs: Map[String, Q] = Map(
    "g1_hash_split" -> g1HashSplit,
    "g2_stratified_sample" -> g2StratifiedSample,
    "g3_corpus_mix" -> g3CorpusMix,
    "g4_sequence_packing" -> g4SequencePacking,
    "g5_unimax_sample" -> g5Unimax,
    "g6_cluster_balance" -> g6ClusterBalance,
    "g7_temperature_mix" -> g7TemperatureMix,
    "g8_temperature_alpha3" -> g8TemperatureAlpha3)

  def oracles: Map[String, String] = Map(
    "g1_hash_split" -> g1Sql,
    "g2_stratified_sample" -> g2Sql,
    "g3_corpus_mix" -> g3Sql,
    "g4_sequence_packing" -> g4Sql,
    "g5_unimax_sample" -> g5Sql,
    "g6_cluster_balance" -> g6Sql,
    "g7_temperature_mix" -> g7Sql,
    "g8_temperature_alpha3" -> g8Sql)
}
