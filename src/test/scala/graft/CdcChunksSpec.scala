package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native [[org.apache.spark.sql.graft.CdcChunks]] rolling-hash
  * chunker must produce byte-identical chunks/digests to the built-in-
  * functions parity reference (the HOF formulation the DuckDB oracle
  * mirrors) — the rolling recurrence and the per-window fold are the
  * same linear form mod the prime, and this pin keeps them that way. */
class CdcChunksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = { spark = GraftSession.local() }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)

  test("native chunker ≡ HOF parity reference on corpus + crafted text") {
    val s = spark
    import s.implicits._
    val crafted = Seq(
      null.asInstanceOf[String], // null contract: reads as ''
      "", "x", "short", "exactly12ch!", "thirteen chars",
      "a" * 500, // degenerate constant text
      ("the quick brown fox jumps over the lazy dog " * 30),
      lcg(7).map(v => (' ' + ((v >>> 33) % 90).toInt).toChar)
        .take(2000).mkString)
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect().toSeq
    val df = (crafted ++ corpus).toDF("text")
    for (withDigest <- Seq(true, false)) {
      val native = df.withColumn("chunks",
        org.apache.spark.sql.graft.CdcExpressions
          .cdcChunks(col("text"), 12, 1000003L, 32, withDigest))
      val reference = df.withColumn("chunks",
        expr(graft.queries.DedupQueries.cdcChunksExpr(withDigest)))
      val a = native.select(col("chunks").cast("string")).as[String].collect()
      val b = reference.select(col("chunks").cast("string")).as[String].collect()
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"row $i diverged (withDigest=$withDigest)")
      }
    }
  }
}
