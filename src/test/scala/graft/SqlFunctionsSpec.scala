package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SqlFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("vector_dot / vector_cosine callable from SQL, exact values") {
    val r = spark.sql(
      """SELECT
        |  vector_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |             CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d,
        |  vector_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c_same,
        |  vector_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)) AS c_orth
        |""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("vector_cosine_distance: 1 - distance equals cosine bit-for-bit, " +
      "zero-vector and null handling") {
    // the rewrite canonicalizes distance-ASC into the cosine walk, so
    // the two spellings must be the same IEEE sequence modulo the one
    // final 1.0-x — verified over an awkward non-round vector pair
    val r = spark.sql(
      """SELECT
        |  vector_cosine_distance(CAST(array(0.3, -1.7, 2.9) AS ARRAY<FLOAT>),
        |    CAST(array(1.1, 0.2, -0.4) AS ARRAY<FLOAT>)) AS dist,
        |  vector_cosine(CAST(array(0.3, -1.7, 2.9) AS ARRAY<FLOAT>),
        |    CAST(array(1.1, 0.2, -0.4) AS ARRAY<FLOAT>)) AS cos,
        |  vector_cosine_distance(CAST(array(0.0, 0.0) AS ARRAY<FLOAT>),
        |    CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS dzero,
        |  vector_cosine_distance(CAST(NULL AS ARRAY<FLOAT>),
        |    CAST(array(1.0) AS ARRAY<FLOAT>)) AS dnull
        |""".stripMargin).head()
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(1.0 - r.getDouble(1)))
    assert(r.getDouble(2) == 1.0)
    assert(r.isNullAt(3))
    // interpreted path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.VectorCosineDistance
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def litArr(xs: Array[Float]) = Literal.create(xs, ArrayType(FloatType))
    val interp = VectorCosineDistance(litArr(Array(0.3f, -1.7f, 2.9f)),
      litArr(Array(1.1f, 0.2f, -0.4f))).eval(null)
    assert(java.lang.Double.doubleToLongBits(
      interp.asInstanceOf[Double]) ==
      java.lang.Double.doubleToLongBits(r.getDouble(0)))
  }

  test("null propagation and interpreted path agree with codegen") {
    val r = spark.sql(
      """SELECT vector_dot(CAST(NULL AS ARRAY<FLOAT>),
        |                  CAST(array(1.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .head()
    assert(r.isNullAt(0))

    // codegen path: both formulations through a normal plan
    import graft.search.VectorSearch
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val native = df.select(VectorSearch.dot(col("a"), col("b"))).head().getDouble(0)
    val hof = df.select(VectorSearch.dotHof(col("a"), col("b"))).head().getDouble(0)
    assert(native == hof && native == 11.0)

    // interpreted path: invoke the expressions' eval() directly (this is
    // what runs when codegen falls back) — must agree with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.{VectorCosine, VectorDot}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def litArr(xs: Array[Float]) = Literal.create(xs, ArrayType(FloatType))
    val interpDot = VectorDot(litArr(Array(1.0f, 2.0f)), litArr(Array(3.0f, 4.0f)))
      .eval(null)
    assert(interpDot == 11.0)
    val interpCos = VectorCosine(litArr(Array(1.0f, 0.0f)), litArr(Array(1.0f, 0.0f)))
      .eval(null)
    assert(interpCos == 1.0)
    // interpreted zero-norm guard
    val interpZero = VectorCosine(litArr(Array(0.0f, 0.0f)), litArr(Array(1.0f, 0.0f)))
      .eval(null)
    assert(interpZero == 0.0)
  }

  test("native minhash km pairs equal the built-in formulation") {
    import graft.functions.TextSketch
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three",
      "too few", // < 3 words → empty
      "  spaced   out   words   here  ",
      "\tleading tab one two three", // Spark trim strips spaces ONLY
      "trailing newline one two three\n",
      "a\nb\tc d").toDF("text")
    val builtin = df.select(
      TextSketch.kmHashes(TextSketch.shingles(col("text"), 3)).as("hs"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(r =>
        (r.getLong(0), r.getLong(1))))
    val native = df.select(
      org.apache.spark.sql.graft.SketchExpressions
        .minhashKmPairs(col("text"), 3).as("hs"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(r =>
        (r.getLong(0), r.getLong(1))))
    assert(builtin.toSeq.map(_.toSeq) == native.toSeq.map(_.toSeq))
    assert(native(2).isEmpty)

    // native char fingerprint equals the built-in formulation
    val fpDf = Seq("the quick brown fox jumps over it",
      "short", "exactly sixteen!", "unicode 好的吗 content here").toDF("text")
    val fpBuiltin = fpDf.select(
      TextSketch.charFingerprint(col("text"), 16)).collect().map(_.getLong(0))
    val fpNative = fpDf.select(
      org.apache.spark.sql.graft.SketchExpressions
        .charFingerprint(col("text"), 16)).collect().map(_.getLong(0))
    assert(fpBuiltin.toSeq == fpNative.toSeq)
    assert(fpNative(1) == Long.MaxValue) // shorter than n

    // NULL text → empty pair list on both formulations
    val nullDf = Seq[Option[String]](None).toDF("text")
    val nativeNull = nullDf.select(
      org.apache.spark.sql.graft.SketchExpressions
        .minhashKmPairs(col("text"), 3).as("hs"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(nativeNull != null && nativeNull.isEmpty)
  }

  test("native one-pass minhash signature equals the built-in formulation") {
    import graft.functions.TextSketch
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val k = 8
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three",
      "too few", // < 3 words → all-MaxValue signature
      "  spaced   out   words   here  ",
      "trailing newline one two three\n",
      "unicode 好的 吗 content here 好").toDF("text")
    val builtin = df.select(array((0 until k).map(i =>
      TextSketch.kmComponent(
        TextSketch.kmHashes(TextSketch.shingles(col("text"), 3)), i)): _*))
      .collect().map(_.getSeq[Long](0))
    val native = df.select(
      org.apache.spark.sql.graft.SketchExpressions
        .minhashSignature(col("text"), 3, k))
      .collect().map(_.getSeq[Long](0))
    assert(builtin.toSeq.map(_.toSeq) == native.toSeq.map(_.toSeq))
    assert(native(2).forall(_ == Long.MaxValue))

    // NULL text → all-MaxValue signature (never null)
    val nullSig = Seq[Option[String]](None).toDF("text")
      .select(org.apache.spark.sql.graft.SketchExpressions
        .minhashSignature(col("text"), 3, k))
      .head().getSeq[Long](0)
    assert(nullSig.length == k && nullSig.forall(_ == Long.MaxValue))
  }

  test("sketch functions callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  minhash_signature('the quick brown fox jumps', 3, 4) AS sig,
        |  simhash('hello world tokens here', 16) AS sh,
        |  char_fingerprint('abcdefghijklmnopqrstuvwxyz', 16) AS fp
        |""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 4)
    assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 16))
    assert(r.getLong(2) != Long.MaxValue)
    // non-literal width must be rejected, not silently misread
    val err = intercept[Exception](
      spark.sql("SELECT simhash('x', CAST(id AS INT)) FROM range(1)").collect())
    assert(err.getMessage != null)
  }

  test("cdc_chunks callable from SQL, reassembles the input") {
    val r = spark.sql(
      """SELECT cdc_chunks('the quick brown fox jumps over the lazy dog',
        |  12, 1000003, 32, false) AS chunks,
        |  cdc_chunks('the quick brown fox jumps over the lazy dog',
        |  12, 1000003, 32, true) AS digests""".stripMargin).head()
    val chunks = r.getSeq[String](0)
    assert(chunks.mkString == "the quick brown fox jumps over the lazy dog")
    assert(r.getSeq[org.apache.spark.sql.Row](1).length == chunks.length)
    val err = intercept[Exception](spark.sql(
      "SELECT cdc_chunks('x', 12, 1000003, 32, id = 0) FROM range(1)")
      .collect())
    assert(err.getMessage != null)
    // wrong arity names the signature instead of an index error
    val arity = intercept[Exception](
      spark.sql("SELECT cdc_chunks('x', 12, 1000003, 32)").collect())
    assert(arity.getMessage.contains("cdc_chunks expects 5 arguments"),
      s"got: ${arity.getMessage}")
  }

  test("native one-pass simhash equals the built-in formulation") {
    import graft.functions.TextSketch
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three",
      "", // empty text still hashes one "" token
      "  spaced   out  ",
      "unicode 好的 吗 content here 好").toDF("text")
    val builtin = df.select(TextSketch.simhash(col("text"), 16))
      .collect().map(_.getLong(0))
    val native = df.select(
      org.apache.spark.sql.graft.SketchExpressions.simhash(col("text"), 16))
      .collect().map(_.getLong(0))
    assert(builtin.toSeq == native.toSeq)

    // NULL text → 0 on both formulations (built-in when/otherwise sums 0s)
    val nullDf = Seq[Option[String]](None).toDF("text")
    val b = nullDf.select(TextSketch.simhash(col("text"), 16)).head().getLong(0)
    val n = nullDf.select(
      org.apache.spark.sql.graft.SketchExpressions.simhash(col("text"), 16))
      .head().getLong(0)
    assert(b == 0L && n == 0L)
  }

  test("native profile-shingle counts equal the HOF formulation") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    import graft.functions.TextSketch
    import graft.queries.TextAnalysisQueries.trigramProfiles

    // HOF reference: the aggregate() struct fold the native pass replaced
    def hofCounts(text: org.apache.spark.sql.Column) = {
      val tri = TextSketch.charShingles(text, 3)
      val zero = struct(trigramProfiles.map { case (l, _) => lit(0).as(s"t_$l") }: _*)
      aggregate(tri, zero, (acc, t) =>
        struct(trigramProfiles.map { case (l, prof) =>
          (acc.getField(s"t_$l") +
            when(t.isin(prof.map(lit): _*), 1).otherwise(0)).as(s"t_$l")
        }: _*))
    }
    val texts = Seq(
      Some("the theater and the thing"), // overlapping en hits
      Some("这是一个测试 我们的中国的"),     // zh three-char windows
      Some("ab"),                        // shorter than a trigram
      Some(""),                          // empty
      Some("a😀the and"),     // supplementary char shifts windows
      None)                              // null text
    val df = texts.toDF("text")
    val native = df.select(
      org.apache.spark.sql.graft.SketchExpressions
        .profileShingleCounts(col("text"), trigramProfiles.map(_._2), 3))
      .as[Seq[Int]].collect()
    val hof = df.select(hofCounts(col("text"))).collect()
      .map(r => trigramProfiles.indices
        .map(i => r.getStruct(0).getInt(i)).toSeq)
    assert(native.map(_.toSeq).toSeq == hof.toSeq)
    assert(native(0).sum > 0, "en text produced no hits — vacuous check")
    assert(native(1).sum > 0, "zh text produced no hits — vacuous check")
  }
}
