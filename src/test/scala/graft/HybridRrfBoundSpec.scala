package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r16 v14 rewrite (bounded candidates + count-aggregate ranks
  * instead of two corpus-wide single-partition rank windows):
  *
  *  1. the count-aggregate rank identity — for any candidate set,
  *     [[graft.queries.VectorQueries.candRanks]] returns exactly the
  *     row_number-over-(score DESC, doc_id ASC) rank, including ties;
  *  2. the candidate bound that makes C = HybridC sufficient — a doc
  *     outside BOTH channels' top-C has rrf < 2/(60+C+1), strictly below
  *     the 1/70 every top-10-by-r_vec doc is guaranteed, so it can never
  *     enter the fused top-10. (End-to-end equality with the corpus-wide
  *     spec is HybridFusionSpec's v16-full-coverage pin plus the DuckDB
  *     oracle, both unchanged.)
  */
class HybridRrfBoundSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

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

  test("exactRanks == row_number over the full corpus, ties included") {
    val vec = graft.queries.VectorQueries.hybridCosAll(spark, dir)
    val w = Window.orderBy(col("cos").desc, col("doc_id"))
    val ref = vec
      .withColumn("r", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("cos"), col("r"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byRank = ref.sortBy(_._3)
    // head, tail, and a mid-range slice — the corpus cosine has heavy
    // ties (16-term count vectors), so tie-break ranks are exercised
    val cands = (byRank.take(5) ++ byRank.slice(120, 130) ++
      byRank.takeRight(5)).map { case (d, sc, _) => d -> sc }.toSeq
    val refRank = ref.map { case (d, _, r) => d -> r }.toMap
    val got = graft.queries.VectorQueries.exactRanks(vec, "cos", cands)
    assert(got.keySet == cands.map(_._1).toSet)
    cands.foreach { case (d, _) =>
      assert(got(d) == refRank(d), s"doc $d") }
  }

  test("the HybridC candidate bound is strict") {
    val c = graft.queries.VectorQueries.HybridC
    // non-candidate max rrf (both ranks > C) < guaranteed 10th-best rrf
    assert(2.0 / (60.0 + c + 1.0) < 1.0 / 70.0,
      s"C=$c no longer covers the fused top-10: raise HybridC")
    assert(c >= 10)
  }
}
