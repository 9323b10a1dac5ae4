package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-query verification for the catalog entries that have NO DuckDB
  * oracle (VERDICT r12 task 8 — ledger hygiene). The driver records those
  * rows `err: no_oracle`, which reads as a failure to any consumer even
  * though each query is verified by design. [[Verify]] now evaluates the
  * checks below against the freshly-dumped output and writes a
  * `checks.json` beside `oracle_sql.json`, so every no-oracle row carries
  * an explicit `check` kind and a real `passed` bit:
  *
  *  - `self`  — the output embeds its own pass evidence (row-level
  *    `lossless`/`self_retrieved` bits, recall exactness witnesses,
  *    bloom's zero-false-negative guarantee) and a structural predicate
  *    over the result evaluates it;
  *  - `golden` — the output is deterministic at the Verify session config
  *    but carries no internal pass bit; the dumped result's canonical
  *    [[GoldenHash]] is compared to a reviewed pin (same discipline as
  *    GoldenHashSpec, pinned per scale factor at the `GraftSession.local()`
  *    config Verify runs under).
  *
  * Every self query ALSO hash-checks when a pin exists for the sf — the
  * strongest available evidence is always applied; `passed` is the AND.
  * Pins regenerate via `sbt "Test/runMain graft.VerifyPinGen"` after a
  * REVIEWED semantic change (never to make a red row green).
  */
object VerifyChecks {

  /** (passed, detail) — detail is a short human-readable witness. */
  type Check = DataFrame => (Boolean, String)

  private def allTrue(c: String): Check = df => {
    val bad = df.filter(!col(c)).count()
    (bad == 0,
      if (bad == 0) s"all rows $c=true" else s"$bad rows with $c=false")
  }

  private val checksImpl: Map[String, Check] = Map(
    // row-level lossless decode bits (PDF round-trips)
    "p7_real_pdf" -> allTrue("lossless"),
    "p8_cid_pdf" -> allTrue("lossless"),
    "p10_subset_font" -> allTrue("lossless"),
    "p12_cff_font" -> allTrue("lossless"),
    "p13_encrypted_pdf" -> allTrue("lossless"),
    // flagship self-retrieval: every golden query finds itself at rank 1
    "p5_e2e_golden45" -> allTrue("self_retrieved"),
    // v10's recall exactness witness: the ef >= n row fully traverses
    // the spine-connected graph, so it IS the exact scan (v5–v9's old
    // witnesses retired in r14 — those queries are DuckDB-oracled now)
    "v10_hnsw_recall" -> (df => {
      val r = df.orderBy(col("ef").desc).limit(1).collect()(0)
      val rec = r.getAs[Double]("recall_at_10")
      (rec == 1.0, s"witness ef=${r.getAs[Long]("ef")}: recall $rec")
    }),
    // production-knob serving floor (recall@10 >= 0.9 per family)
    "v22_approx_serving" -> allTrue("recall_ok"),
    // Misra-Gries deterministic error bound holds on every row
    "x14_approx_topk" -> allTrue("bound_ok"),
    // v23 (residual IVFPQ): the rerank_all row is the exactness witness
    // (full probe + corpus shortlist ⇒ exact KNN); residual must also
    // not shortlist WORSE than plain codes IN AGGREGATE across the
    // nprobe settings — per-query, per-nprobe the comparison is a coin
    // flip (PqSpec's own finding), so a live per-nprobe assert could
    // fail spuriously on a new pinless sf even when the encoding is
    // healthy (ADVICE r13). The strictness lives in the rerank_all
    // witness + the golden pins.
    "v23_ivfpq_residual" -> (df => {
      val rows = df.collect()
      val w = rows.filter(_.getAs[String]("variant") == "rerank_all")
      val wOk = w.length == 1 && w(0).getAs[Double]("recall_at_10") == 1.0
      val pruned = rows.filterNot(_.getAs[String]("variant") == "rerank_all")
      def recSum(v: String): Double = pruned
        .filter(_.getAs[String]("variant") == v)
        .map(_.getAs[Double]("recall_at_10")).sum
      val resGe = pruned.nonEmpty && recSum("residual") >= recSum("plain")
      (wOk && resGe, s"witness rerank_all recall ${w.headOption
        .map(_.getAs[Double]("recall_at_10")).getOrElse(-1.0)}, " +
        s"Σrecall residual ${recSum("residual")} >= plain ${
          recSum("plain")}: $resGe")
    }),
    // x24 (threshold bucketing): the DEFINING properties are
    // self-evident in the output — every bucket's [min_oov, max_oov]
    // range respects the thresholds it was cut by, and the bucket
    // counts sum back to each language's corpus (no doc dropped or
    // double-bucketed). Near-thirds balance vs x23's exact NTILE is
    // bounded separately in PerplexityBucketsSpec (it needs the scored
    // table, not just this output).
    "x24_perplexity_thresholds" -> (df => {
      val rows = df.collect()
      val sepOk = rows.forall { r =>
        val (mn, mx) = (r.getAs[Double]("min_oov"), r.getAs[Double]("max_oov"))
        val (t1, t2) = (r.getAs[Double]("t1"), r.getAs[Double]("t2"))
        r.getAs[Long]("bucket") match {
          case 1L => mx <= t1
          case 2L => mn > t1 && mx <= t2
          case 3L => mn > t2
          case _ => false
        }
      }
      val sumOk = rows.groupBy(_.getAs[String]("lang")).forall {
        case (_, rs) =>
          rs.map(_.getAs[Long]("n_docs")).sum == rs.head.getAs[Long]("n_lang")
      }
      (sepOk && sumOk,
        s"threshold separation: $sepOk, per-lang counts sum: $sumOk")
    }),
    // bloom prefilters admit false positives, never false negatives
    "d13_bloom_incremental" -> (df => {
      val fn = df.agg(sum(col("n_false_negatives"))).collect()(0).getLong(0)
      (fn == 0, s"false negatives: $fn")
    }))

  /** Self predicates, keyed by query name. */
  def selfChecks: Map[String, Check] = checksImpl

  /** Check kind for a no-oracle query: self if a predicate exists,
    * golden otherwise (every no-oracle query has a reviewed pin). */
  def kindOf(name: String): String =
    if (checksImpl.contains(name)) "self" else "golden"

  /** Reviewed golden hashes of each no-oracle query's output at the
    * exact session config [[Verify]] runs under (GraftSession.local():
    * local[cpus], shuffle partitions = cpus — stamped into checks.json so
    * a config mismatch is self-describing). Keyed by sf dir basename.
    * Regenerate: `sbt "Test/runMain graft.VerifyPinGen"`. */
  val pins: Map[String, Map[String, String]] = Map(
    "sf0.001" -> Map(
      "p1_ingest_fragments" -> "32c227f519272783ad481e0456d3e04c",
      "p2_parent_synthesis" -> "72aca4c977ded015f336695c330e52ba",
      "p3_embed_fragments" -> "15bae67e53b1d2e7744de937dc2ded7d",
      "p4_pdf_segments" -> "599104d08747c7c70373563629ffa5a0",
      "p5_e2e_golden45" -> "211b506be808e27fd9faf92756b9db03",
      "p6_adversarial_recall" -> "7fc143fa968d452cf83472a28147cc8d",
      "p7_real_pdf" -> "cb6d5e32c669271c7fded91fe7d6dbf1",
      "p8_cid_pdf" -> "d6f9dd1938082bf0818880d805b40314",
      "p9_hard_eval" -> "f39498fac17cf54ae5778a6cab76c473",
      "p10_subset_font" -> "5d0e88778ba82ebdc83bd17c26781a1f",
      "p12_cff_font" -> "5533e65ed4673bbd0a99987be8785f91",
      "p13_encrypted_pdf" -> "ec3bec477709529576b6ba55068943ea",
      "d13_bloom_incremental" -> "69596ca3f48f0bb2918f2476bb841537",
      "v23_ivfpq_residual" -> "5f8e6df870f543430309103ceea5af4a",
      "v10_hnsw_recall" -> "2ba57af5e2dd874e63f57f4e55a9c113",
      "v22_approx_serving" -> "3a0604ebf1eab45496a072f735091554",
      "x4_approx_stats" -> "b1a7f6fa897e9168f66f463ce9d157d1",
      "x14_approx_topk" -> "03d0cc91a100036d57ef942396763a06",
      "x21_quality_classifier" -> "99f87ac4a409c0e0471be31c0a3ed4f7",
      "x24_perplexity_thresholds" -> "d868d1cd325385fcc98a7e8079f77e71",
    ),
    "sf0.01" -> Map(
      "p1_ingest_fragments" -> "a8017e99d941ed84656182ecbead17ed",
      "p2_parent_synthesis" -> "ace643de7bbeb18c5497f84970108842",
      "p3_embed_fragments" -> "7a32ad02a042e75e03d3e29668b583b4",
      "p4_pdf_segments" -> "580fa1fe2b8e063b425636dcb04c11d2",
      "p5_e2e_golden45" -> "6ddb7ef1dafac6ac327b8cbfa2281cbe",
      "p6_adversarial_recall" -> "bdb2b119e7bfe22b9f5e62eda87b4d3a",
      "p7_real_pdf" -> "f05692152b9a9ea4922f58b370df9ab2",
      "p8_cid_pdf" -> "5846151962acc3ea63fc96f98bcee75f",
      "p9_hard_eval" -> "02c9fcc33494c0f3dd69bc6081082381",
      "p10_subset_font" -> "43700dc8fbf21c6b1bc273f9340f24b5",
      "p12_cff_font" -> "ab5379e6de19f17ab1f5ca2aba110b7f",
      "p13_encrypted_pdf" -> "78a1046a9c06476ac1d9937b4ea42935",
      "d13_bloom_incremental" -> "785285f77dd0ee52deb677d8214cf0f0",
      "v23_ivfpq_residual" -> "112495b8ceb229ed9fe34c5d871c595b",
      "v10_hnsw_recall" -> "2ba57af5e2dd874e63f57f4e55a9c113",
      "v22_approx_serving" -> "496e924c886105a49cebaa401e2a54ea",
      "x4_approx_stats" -> "adf11b6133c6262db3703d3ed0951e6f",
      "x14_approx_topk" -> "4c73189de2ac533f0e1edd5683fa91ba",
      "x21_quality_classifier" -> "1d57e530a6009c810dfee9f0ccf05db8",
      "x24_perplexity_thresholds" -> "201834b33de8b29abc40a238a9058ed2",
    ),
  )
}
