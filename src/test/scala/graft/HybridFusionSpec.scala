package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** v16 (production hybrid fusion over bounded top-C candidate lists) vs
  * v14 (the corpus-wide-rank oracle artifact): rank within a candidate
  * list equals the corpus-wide rank for every member, so when C covers
  * the corpus BOTH lists contain every document with its global rank and
  * the fused top-10 must equal v14's bit-for-bit — same doc ids, same
  * integer ranks, same double RRF scores. This is the equivalence that
  * licenses serving the bounded plan: v14 defines the semantics, v16
  * computes them without a single non-partitioned window
  * (PlanShapeSpec pins the candidate plans window-free).
  */
class HybridFusionSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("v16 with corpus-covering C equals v14's fused top-10 bit-for-bit") {
    val n = Tables.documents(spark, dir).count().toInt
    val v14 = graft.queries.VectorQueries.defs("v14_hybrid_rrf")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val v16 = graft.queries.VectorQueries.v16Fused(spark, dir, c = n)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(v16 == v14)
    // full coverage ⇒ no sentinel ranks anywhere
    assert(v16.forall { case (_, rl, rv, _) => rl > 0 && rv > 0 })
  }

  test("v16 at bounded C: sentinel ranks are honest single-side fusions") {
    // C = 3 forces disjointness between the two top lists on this corpus
    // unless the retrievers agree; every output row's RRF must equal the
    // recomputation from its own rank fields — no hidden state
    val rows = graft.queries.VectorQueries.v16Fused(spark, dir, c = 3)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows.nonEmpty && rows.size <= 6)
    rows.foreach { case (_, rl, rv, rrf) =>
      val want = (if (rl > 0) 1.0 / (60.0 + rl.toDouble) else 0.0) +
        (if (rv > 0) 1.0 / (60.0 + rv.toDouble) else 0.0)
      assert(rrf == want)
      assert(rl != -1 || rv != -1)
      assert(rl <= 3 && rv <= 3)
    }
    // descending fused order with doc_id ties
    assert(rows == rows.sortBy { case (d, _, _, s) => (-s, d) })
  }
}
