package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextSketch
import org.apache.spark.sql.graft.SketchExpressions

/** Pins the r15 `token_counts` native expression to the shuffle
  * formulation it replaced in x8: per row,
  *   token_counts(arr) == explode(arr) → groupBy(doc, tok).count
  *                        → (sum c, count(*), max c)
  * including null elements (one group, like groupBy on an exploded null)
  * and the null-array → null / empty-array → (0,0,0) boundary the query
  * arithmetic depends on. x8 itself stays oracle-checked end to end.
  */
class TokenCountsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("token_counts == explode→two-level agg on corpus words + bigrams") {
    val s = spark
    import s.implicits._
    val words = Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextSketch.words(col("text")).as("arr"))
    val bigrams = Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id") + 1000000L,
        when(size(TextSketch.words(col("text"))) >= 2,
          expr("transform(sequence(0, size(split(trim(text), '[ \\t\\n\\f\\r]+')) - 2), " +
            "i -> concat(element_at(split(trim(text), '[ \\t\\n\\f\\r]+'), i+1), ' ', " +
            "element_at(split(trim(text), '[ \\t\\n\\f\\r]+'), i+2)))"))
          .otherwise(array().cast("array<string>")).as("arr"))
      .toDF("doc_id", "arr")
    val df = words.unionByName(bigrams)

    val got = df
      .select(col("doc_id"), SketchExpressions.tokenCounts(col("arr")).as("tc"))
      .filter(col("tc").isNotNull)
      .select(col("doc_id"), col("tc.n"), col("tc.n_distinct"), col("tc.top_c"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = df
      .select(col("doc_id"), explode(col("arr")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // explode drops empty arrays; token_counts reports (0,0,0) for them —
    // the query filters/branches on n > 0, so compare on the common domain
    val gotNonEmpty = got.filter(_._2 > 0)
    assert(gotNonEmpty == want,
      s"token_counts diverges (missing=${(want -- gotNonEmpty).take(3)}, " +
        s"extra=${(gotNonEmpty -- want).take(3)})")
  }

  test("token_counts edge cases: null array, empty, null elements, ties") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "a", null, null, null)),
      (2L, Seq.empty[String]),
      (3L, null: Seq[String]),
      (4L, Seq("x")),
      (5L, Seq("", "", " ")),
      (6L, Seq("t", "t", "u", "u"))
    ).toDF("doc_id", "arr")
    val rows = df
      .select(col("doc_id"), SketchExpressions.tokenCounts(col("arr")).as("tc"))
      .select(col("doc_id"), col("tc.n"), col("tc.n_distinct"), col("tc.top_c"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows(1L) == ((6L, 3L, 3L))) // nulls form one group of 3
    assert(rows(2L) == ((0L, 0L, 0L)))
    assert(rows(3L) == null) // null array → null struct
    assert(rows(4L) == ((1L, 1L, 1L)))
    assert(rows(5L) == ((3L, 2L, 2L))) // "" twice, " " once
    assert(rows(6L) == ((4L, 2L, 2L)))
  }
}
