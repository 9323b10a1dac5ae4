package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashedLogReg

/** The distributed classifier trainer behind x21: learning actually
  * happens (trained accuracy beats the majority class by a margin on the
  * linear-teacher task), and training is bit-DETERMINISTIC under
  * different partitionings — the property that makes the golden pin
  * valid and that order-dependent double gradient sums would break.
  */
class HashedLogRegSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val dim = 64

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs =
    HashedLogReg.teacherDocs(Tables.documents(spark, dir))

  test("trained accuracy beats the majority class by a real margin") {
    val feats = HashedLogReg.hashedFeatures(docs, col("doc_id"), col("y"),
      col("w"), dim).cache()
    val n = feats.count().toDouble
    val majority = {
      val pos = feats.agg(sum(col("y"))).head().getLong(0).toDouble
      math.max(pos, n - pos) / n
    }
    val (w, b) = HashedLogReg.train(feats, dim, iters = 40, lr = 20.0,
      decay = 0.1)
    val acc = HashedLogReg.score(feats, w, b)
      .agg(avg(col("correct"))).head().getDouble(0)
    feats.unpersist()
    assert(majority < 0.82, s"teacher degenerated to majority $majority")
    assert(acc >= majority + 0.08,
      s"no learning: acc $acc vs majority $majority")
    assert(acc >= 0.85, s"trained accuracy too low: $acc")
  }

  /** Train with `fit`, score the SAME model through the batch scorer and
    * the streaming serving path, and require bit-for-bit agreement —
    * the train→serve contract behind x21 + classifyStream. */
  private def assertServingMatchesBatch(queryName: String,
      fit: org.apache.spark.sql.DataFrame => (Array[Double], Double))
      : Unit = {
    val s = spark
    val feats = HashedLogReg.hashedFeatures(docs, col("doc_id"), col("y"),
      col("w"), dim).cache()
    feats.count()
    val (w, b) = fit(feats)
    val batch = HashedLogReg.score(feats, w, b)
      .collect()
      .map(r => (r.getLong(0),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(4)))
      .toSet
    feats.unpersist()

    // stream the raw texts through the stateless serving path
    val stage = java.nio.file.Files.createTempDirectory(queryName)
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .coalesce(1).write.mode("overwrite")
      .parquet(stage.resolve("docs.parquet").toString)
    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("docs.parquet").toString).schema)
      .parquet(stage.toString + "/*/")
    val q = graft.streaming.EventStreams.classifyStream(stream, w, b)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val streamed = s.sql(
      s"SELECT doc_id, margin, predicted FROM $queryName")
      .collect()
      .map(r => (r.getLong(0),
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getLong(2)))
      .toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"serving diverged from batch scoring: ${streamed.diff(batch).take(3)}")
  }

  test("streaming scoring matches the batch scorer bit-for-bit") {
    assertServingMatchesBatch("classify_stream",
      HashedLogReg.train(_, dim, iters = 12, lr = 20.0, decay = 0.1))
  }

  test("Newton-trained weights flow through the streaming scorer with " +
      "the same bit-for-bit batch/stream equality") {
    // x21 now trains with 5 IRLS/Newton steps — the serving contract
    // must hold for the production model, not just the old GD schedule
    assertServingMatchesBatch("classify_stream_newton",
      HashedLogReg.trainNewton(_, dim, iters = 5))
  }

  test("training is bit-identical under different partitionings") {
    def trainWith(parts: Int): (Seq[Long], Long) = {
      val feats = HashedLogReg.hashedFeatures(
        docs.repartition(parts), col("doc_id"), col("y"), col("w"), dim)
        .cache()
      feats.count()
      val (w, b) = HashedLogReg.train(feats, dim, iters = 12, lr = 20.0,
        decay = 0.1)
      feats.unpersist()
      (w.toSeq.map(java.lang.Double.doubleToLongBits),
        java.lang.Double.doubleToLongBits(b))
    }
    val a = trainWith(2)
    val c = trainWith(7)
    assert(a == c,
      "weights diverged across partitionings — gradient sums are not order-free")
  }

  test("Newton training is bit-identical under different partitionings " +
      "and beats plain GD's accuracy in 5 steps") {
    def trainWith(parts: Int): (Seq[Long], Long) = {
      val feats = HashedLogReg.hashedFeatures(
        docs.repartition(parts), col("doc_id"), col("y"), col("w"), dim)
        .cache()
      feats.count()
      val (w, b) = HashedLogReg.trainNewton(feats, dim, iters = 5)
      feats.unpersist()
      (w.toSeq.map(java.lang.Double.doubleToLongBits),
        java.lang.Double.doubleToLongBits(b))
    }
    val a = trainWith(2)
    val c = trainWith(7)
    assert(a == c, "Newton weights diverged across partitionings — " +
      "Hessian/gradient sums are not order-free")

    // quality: the 5-step Newton model must be at least as accurate as
    // the 40-step GD schedule it replaced in x21
    val feats = HashedLogReg.hashedFeatures(docs, col("doc_id"), col("y"),
      col("w"), dim).cache()
    feats.count()
    val (wG, bG) = HashedLogReg.train(feats, dim, iters = 40, lr = 20.0,
      decay = 0.1)
    val (wN, bN) = HashedLogReg.trainNewton(feats, dim, iters = 5)
    def acc(w: Array[Double], b: Double): Double =
      HashedLogReg.score(feats, w, b)
        .agg(avg(col("correct"))).head().getDouble(0)
    val aG = acc(wG, bG)
    val aN = acc(wN, bN)
    feats.unpersist()
    assert(aN >= aG, s"Newton acc $aN fell below the GD schedule $aG")
  }
}
