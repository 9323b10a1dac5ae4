package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextSketch
import org.apache.spark.sql.graft.SketchExpressions

/** Pins the r15 `gram_set` native expression to the formulation it
  * replaced in gramPairs/x10: per row,
  *   set(gram_set(text, n)) == set(hexInt(g) for g in shingles(text, n))
  * — same whitespace split, same `< n words → empty` rule, same 60-bit
  * md5-prefix value. The rewritten d9/d12/x10 queries are oracle-checked
  * end to end; this spec isolates the expression so a parity break is
  * attributed to the expression, not the query shape.
  */
class GramSetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // edge inputs: nulls, empties, whitespace variants, exactly-n words,
  // fewer-than-n words, repeated grams, multibyte text, vertical tab
  // (NOT a separator — the RE2-parity character class)
  private val edgeTexts: Seq[String] = Seq(
    null,
    "",
    "   ",
    "one",
    "one two",
    "one two three",
    "  one two three  ",
    "one\ttwo\nthree\ffour\rfive",
    "a b a b a b a b",
    "x y x y x y",
    "한국어 텍스트 토큰 분리 검증 테스트",
    "mix 한글 and ascii words here",
    "verttab is one token here plus more words",
    "a  b   c    d",
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")

  private def checkParity(n: Int): Unit = {
    val s = spark
    import s.implicits._
    val edge = edgeTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val corpus = Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val df = edge.unionByName(corpus)

    val got = df.select(col("doc_id"),
        SketchExpressions.gramSet(col("text"), n).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
      .as[(Long, Long)].collect().toSet
    val want = df.select(col("doc_id"),
        explode(TextSketch.shingles(col("text"), n)).as("gstr"))
      .select(col("doc_id"), TextSketch.hexInt(col("gstr")).as("g"))
      .distinct()
      .as[(Long, Long)].collect().toSet

    assert(got == want,
      s"n=$n: gram_set diverges from shingles→hexInt→distinct " +
        s"(missing=${(want -- got).take(3)}, extra=${(got -- want).take(3)})")

    // per-row uniqueness: the whole point is that explode(gram_set)
    // needs no downstream distinct
    val dupRows = df.select(col("doc_id"),
        SketchExpressions.gramSet(col("text"), n).as("gs"))
      .select(size(col("gs")).as("n_all"),
        size(array_distinct(col("gs"))).as("n_uniq"))
      .filter(col("n_all") =!= col("n_uniq")).count()
    assert(dupRows == 0, s"n=$n: gram_set emitted duplicate grams in a row")
  }

  test("gram_set == shingles→hexInt→distinct, corpus + edge cases, n=4") {
    checkParity(4)
  }

  test("gram_set == shingles→hexInt→distinct, corpus + edge cases, n=8") {
    checkParity(8)
  }
}
