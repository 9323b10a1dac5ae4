package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Skew

class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("salted join matches plain join results on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of rows share one hot key
    val big = ((1 to 900).map(i => ("hot", i)) ++
      (1 to 100).map(i => (s"k${i % 7}", i))).toDF("key", "v")
    val small = Seq(("hot", 1.0), ("k1", 2.0), ("k3", 3.0)).toDF("key", "w")

    val plain = big.join(small, "key")
      .agg(count(lit(1)), sum($"v"), sum($"w")).head()
    val salted = Skew.saltedJoin(big, small, "key", saltBuckets = 8)
      .agg(count(lit(1)), sum($"v"), sum($"w")).head()
    assert(plain == salted)
  }

  test("two-phase aggregation equals direct aggregation") {
    val s = spark
    import s.implicits._
    val df = ((1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val direct = df.groupBy($"key")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("count"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val twoPhase = Skew.twoPhaseAgg(df, "key", "v", saltBuckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct == twoPhase)
  }

  test("skew report surfaces the hot key share") {
    val s = spark
    import s.implicits._
    val df = ((1 to 90).map(_ => "hot") ++ (1 to 10).map(i => s"k$i"))
      .toDF("key")
    val top = Skew.skewReport(df, $"key", 1).head()
    assert(top.getAs[String]("key") == "hot")
    assert(math.abs(top.getAs[Double]("share") - 0.9) < 1e-9)
  }
}
