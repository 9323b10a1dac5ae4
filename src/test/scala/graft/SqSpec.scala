package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.search.{Pq, Sq, VectorSearch}

/** Scalar-quantization invariants: the uniform-grid codebook shape, exact
  * round-trip of on-grid values through the shared PQ encode path, clamping
  * of out-of-range values, degenerate-dimension handling, and full-shortlist
  * re-rank recovering the exact KNN on real testdata.
  */
class SqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("codebook is a per-dimension uniform grid spanning the sample range") {
    val sample = Array(Array(0.0f, -2.0f), Array(1.0f, 2.0f), Array(0.5f, 0.0f))
    val cb = Sq.train(sample, levels = 5)
    assert(cb.m == 2 && cb.dsub == 1 && cb.ksub == 5)
    // dim 0 spans [0,1] in steps of 0.25; dim 1 spans [-2,2] in steps of 1
    assert(cb.flat.slice(0, 5).toSeq == Seq(0.0f, 0.25f, 0.5f, 0.75f, 1.0f))
    assert(cb.flat.slice(5, 10).toSeq == Seq(-2.0f, -1.0f, 0.0f, 1.0f, 2.0f))
  }

  test("on-grid values encode to their level and round-trip exactly") {
    val s = spark
    import s.implicits._
    val sample = Array(Array(0.0f, -2.0f), Array(1.0f, 2.0f))
    val cb = Sq.train(sample, levels = 5)
    // (0.75, 1.0) sits exactly on grid points (3, 3)
    val df = Seq((0L, Seq(0.75f, 1.0f))).toDF("vec_id", "vector")
    val codes = Pq.encode(df, cb).select("pq_code").as[Array[Byte]].head()
    assert(codes.toSeq == Seq(3.toByte, 3.toByte))
    // decode = grid value at the code — exact for on-grid inputs
    assert(cb.flat(0 * 5 + 3) == 0.75f && cb.flat(1 * 5 + 3) == 1.0f)
  }

  test("values outside the trained range clamp to the edge levels") {
    val s = spark
    import s.implicits._
    val sample = Array(Array(0.0f), Array(1.0f))
    val cb = Sq.train(sample, levels = 4)
    val df = Seq((0L, Seq(-5.0f)), (1L, Seq(9.0f))).toDF("vec_id", "vector")
    val codes = Pq.encode(df, cb).orderBy("vec_id")
      .select("pq_code").as[Array[Byte]].collect()
    assert(codes(0).toSeq == Seq(0.toByte))  // below range → lowest level
    assert(codes(1).toSeq == Seq(3.toByte))  // above range → highest level
  }

  test("a degenerate (constant) dimension encodes to 0 and decodes exactly") {
    val s = spark
    import s.implicits._
    val sample = Array(Array(0.5f, 7.0f), Array(1.5f, 7.0f))
    val cb = Sq.train(sample, levels = 8)
    assert((0 until 8).forall(c => cb.flat(1 * 8 + c) == 7.0f))
    val df = Seq((0L, Seq(1.0f, 7.0f))).toDF("vec_id", "vector")
    val codes = Pq.encode(df, cb).select("pq_code").as[Array[Byte]].head()
    assert(codes(1) == 0.toByte)
  }

  test("full-shortlist SQ search recovers the exact KNN on testdata") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val sample = e.orderBy(col("vec_id")).limit(256)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val cb = Sq.train(sample)
    val index = Pq.encode(e, cb)
    val query = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val n = e.count().toInt
    val exact = VectorSearch.knn(e, query, 10, vectorCol = "vector",
      tieBreak = "vec_id").select("vec_id").as[Long].collect().toSeq
    val viaSq = Pq.searchCosine(index, query, cb, 10, shortlist = n,
      tieBreak = "vec_id").select("vec_id").as[Long].collect().toSeq
    assert(viaSq == exact)
  }
}
