package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.VectorExpressions

/** Pins the r15 `cosine_argmax` native expression to the formulation it
  * replaced in g6: per row,
  *   cosine_argmax(v, cents) == crossJoin(centroids)
  *     → max_by(cid, struct(cosine(v, cvec), -cid))
  * — same VectorCosine arithmetic (zero-norm → 0.0), same lower-cid tie
  * rule. g6 itself stays oracle-checked end to end.
  */
class CosineArgmaxSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cosine_argmax == crossJoin+max_by on corpus embeddings + edges") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    // edge rows: zero vector (all sims 0.0 → tie across every centroid →
    // cid 0), a centroid replica (sim exactly 1.0 somewhere), short vector
    val edges = Seq(
      (900001L, Array.fill(dim)(0f).toSeq),
      (900002L, Array.fill(dim)(1f).toSeq),
      (900003L, Seq(1f, 2f))
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val all = e.unionByName(edges)

    val sample = e.filter(col("vec_id") < 64).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val q = graft.search.Ivf.train(sample, 16)

    val cents = (0 until q.k)
      .map(c => (c.toLong, q.centroid(c).toSeq)).toDF("cid", "cvec")
    val want = all.crossJoin(broadcast(cents))
      .withColumn("__sim",
        graft.search.VectorSearch.cosine(col("embedding"), col("cvec")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"),
        struct(col("__sim"), (-col("cid")).cast("double"))).as("cluster_id"))
      .as[(Long, Long)].collect().toMap
    val got = all.select(col("vec_id"),
        VectorExpressions.cosineArgmax(col("embedding"), q.centroidsFlat,
          q.dim).cast("long").as("cluster_id"))
      .as[(Long, Long)].collect().toMap

    assert(got.size == want.size)
    val diff = want.keys.filter(k => got(k) != want(k)).take(5)
    assert(diff.isEmpty,
      s"argmax diverges on vec_ids $diff: " +
        s"${diff.map(k => (k, got(k), want(k))).toList}")
    assert(got(900001L) == 0L) // zero vector: all sims 0.0, lowest cid wins
  }
}
