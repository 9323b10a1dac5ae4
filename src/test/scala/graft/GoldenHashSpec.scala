package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pinned golden output hashes for every catalog query that has no DuckDB
  * oracle (the driver records them `err: no_oracle` — rows-only). The
  * queries are deterministic (seeded sampling, hash ids, fixed session
  * config), so one reviewed output per scale factor can be hashed and
  * asserted — turning rows-only checks into full regression oracles
  * (VERDICT r5 task #2; SURVEY §5 rebuild strategy).
  *
  * Hashes are pinned at sf0.001 under the exact session config below
  * (local[4], 8 shuffle partitions — sketch merges like x14's Misra-Gries
  * are partitioning-dependent, so the config is part of the pin). To
  * re-pin after a REVIEWED semantic change:
  * `sbt "Test/runMain graft.GoldenHashGen"`.
  */
object GoldenHashSpec {
  /** The no-oracle queries: stateful per-document folds and approximate
    * structures whose self-checks aren't SQL. x15/x17 left this list in
    * round 7 when the recursive-CTE BPE oracle landed; p8 (Identity-H
    * round-trip) joined with round 7's CMap decoding. */
  val noOracleQueries: Seq[String] = Seq(
    "p1_ingest_fragments", "p2_parent_synthesis", "p3_embed_fragments",
    "p4_pdf_segments", "p5_e2e_golden45", "p6_adversarial_recall",
    "p7_real_pdf", "p8_cid_pdf", "p9_hard_eval", "p10_subset_font",
    "p12_cff_font", "p13_encrypted_pdf",
    "d13_bloom_incremental",
    "v10_hnsw_recall", "v22_approx_serving",
    "x4_approx_stats", "x14_approx_topk", "x21_quality_classifier",
    "x24_perplexity_thresholds")

  /** Reviewed-once golden hashes (sf0.001, session config above). */
  val pinned: Map[String, String] = Map(
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
    "v10_hnsw_recall" -> "2ba57af5e2dd874e63f57f4e55a9c113",
    "v22_approx_serving" -> "3a0604ebf1eab45496a072f735091554",
    "x4_approx_stats" -> "b1a7f6fa897e9168f66f463ce9d157d1",
    "x14_approx_topk" -> "03d0cc91a100036d57ef942396763a06",
    "x21_quality_classifier" -> "99f87ac4a409c0e0471be31c0a3ed4f7",
    "x24_perplexity_thresholds" -> "d868d1cd325385fcc98a7e8079f77e71",
  )
}

class GoldenHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("every no-oracle query has a pinned hash") {
    assert(GoldenHashSpec.noOracleQueries.toSet ==
      GoldenHashSpec.pinned.keySet)
  }

  test("the no-oracle list tracks the live catalog") {
    // a new catalog query must either ship a DuckDB oracle or land here
    // with a reviewed golden hash — this pin makes forgetting impossible
    val live = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val listed = GoldenHashSpec.noOracleQueries.toSet
    assert(live == listed,
      s"unpinned no-oracle queries: ${live -- listed}; " +
        s"stale pins (gained an oracle or left the catalog): ${listed -- live}")
  }

  GoldenHashSpec.noOracleQueries.foreach { name =>
    test(s"golden hash: $name") {
      val got = GoldenHash.of(SparkEntry.queries(name)(spark, dir))
      val want = GoldenHashSpec.pinned.getOrElse(name, "<unpinned>")
      assert(got == want,
        s"$name output drifted from its reviewed golden (got $got). If the " +
          "change is an intended semantic change, review the new output and " +
          "re-pin via: sbt \"Test/runMain graft.GoldenHashGen\"")
    }
  }
}
