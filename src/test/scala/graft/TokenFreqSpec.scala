package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextSketch
import org.apache.spark.sql.graft.SketchExpressions

/** Pins the r15 `token_freq` native expression to the formulation it
  * replaced in x13/x16: per row,
  *   explode(token_freq(arr)) == explode(arr) → groupBy(doc, tok).count
  * as a row SET (including multiplicities), with null elements forming
  * one group and null array exploding to nothing. x13/x16 stay
  * oracle-checked end to end.
  */
class TokenFreqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("token_freq == explode→groupBy count over corpus + edge cases") {
    val s = spark
    import s.implicits._
    val corpus = Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextSketch.words(col("text")).as("arr"))
    val edges = Seq(
      (900001L, Seq("a", "b", "a", null, null)),
      (900002L, Seq.empty[String]),
      (900003L, null: Seq[String]),
      (900004L, Seq("", "x", "", "x", "x"))
    ).toDF("doc_id", "arr")
    val df = corpus.unionByName(edges)

    val got = df.select(col("doc_id"),
        explode(SketchExpressions.tokenFreq(col("arr"))).as("tc"))
      .select(col("doc_id"), col("tc.tok"), col("tc.c"))
      .as[(Long, Option[String], Long)].collect().toSet
    val want = df.select(col("doc_id"), explode(col("arr")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .as[(Long, Option[String], Long)].collect().toSet
    assert(got == want,
      s"token_freq diverges (missing=${(want -- got).take(3)}, " +
        s"extra=${(got -- want).take(3)})")
  }
}
