package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** x24 (approx-percentile threshold bucketing) vs x23 (exact NTILE
  * thirds) — VERDICT r13 task 7's self-check: per (lang, bucket), the
  * two bucket counts may differ by at most the sketch's rank-error
  * bound PLUS the boundary tie mass. The tie term is not slack-padding:
  * threshold bucketing sends every document with oov_rate equal to a
  * cut value to the same side, while NTILE splits a tied run
  * arbitrarily (by doc_id) to force exact thirds — on a corpus where
  * most documents score 0.0 (this testdata at small sf) the tie mass at
  * the cut IS the dominant, expected divergence. The sketch term is
  * N/accuracy per the GK guarantee (0 at these sfs, where N per
  * language ≪ accuracy and the summary never compresses).
  */
class PerplexityBucketsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) {
      graft.queries.StageCache.release(spark)
      spark.stop()
    }
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
    test(s"x24 counts within sketch error + boundary tie mass of x23 at " +
        new java.io.File(dir).getName) {
      val x23 = SparkEntry.queries("x23_perplexity_buckets")(spark, dir)
        .select(col("lang"), col("bucket"), col("n_docs"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val x24rows = SparkEntry.queries("x24_perplexity_thresholds")(
        spark, dir).collect()
      val x24 = x24rows.map(r => (r.getAs[String]("lang"),
        r.getAs[Long]("bucket")) -> r.getAs[Long]("n_docs")).toMap
      val cuts: Map[String, (Double, Double)] = x24rows
        .map(r => r.getAs[String]("lang") ->
          ((r.getAs[Double]("t1"), r.getAs[Double]("t2")))).toMap

      // tie mass at each language's cut values, from the shared scored
      // table (exact: how many docs sit ON a threshold)
      val scored = graft.queries.TextAnalysisQueries.x23Scored(spark, dir)
        .select(col("lang"), col("oov_rate"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      val langs = (x23.keySet ++ x24.keySet).map(_._1)
      langs.foreach { lang =>
        val (t1, t2) = cuts(lang)
        val rates = scored.filter(_._1 == lang).map(_._2)
        val n = rates.length
        val sketchErr = math.ceil(
          n.toDouble / 10000).toLong // X24Accuracy — exact at these sfs
        def tie(t: Double): Long = rates.count(_ == t).toLong
        // the MIDDLE bucket has a boundary at BOTH cuts, so its count
        // can drift by ties at t1 AND t2 simultaneously (and by the
        // sketch error at each boundary) — bound with the sum of the
        // per-boundary terms, not their max
        val bound = sketchErr * 2 + tie(t1) + tie(t2)
        (1L to 3L).foreach { b =>
          val c23 = x23.getOrElse((lang, b), 0L)
          val c24 = x24.getOrElse((lang, b), 0L)
          assert(math.abs(c23 - c24) <= bound,
            s"$lang bucket $b: x23=$c23 x24=$c24 exceeds bound $bound " +
              s"(ties t1=${tie(t1)}, t2=${tie(t2)}, sketch=$sketchErr)")
        }
        // and both variants conserve the corpus
        assert((1L to 3L).map(b => x24.getOrElse((lang, b), 0L)).sum ==
          (1L to 3L).map(b => x23.getOrElse((lang, b), 0L)).sum)
      }
    }
}
