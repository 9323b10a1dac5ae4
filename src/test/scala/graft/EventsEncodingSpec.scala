package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Guard against silent testdata regeneration breaking the catalog.
  *
  * The driver has produced `events.parquet` with three different physical
  * encodings of `ts` across rounds (TIMESTAMP(NANOS) → nanos-as-long under
  * the legacy flag; timezone-less timestamp[us] → TIMESTAMP_NTZ in
  * Spark 4; zoned timestamp[us] → TIMESTAMP). Round 6 lost the entire
  * streaming component plus three oracled queries when the encoding
  * flipped to NTZ and [[Tables.events]] passed it through unchanged.
  * This spec writes events under each encoding and asserts the loader
  * always yields session-zoned TimestampType with the same instant.
  */
class EventsEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var tmp: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tmp = java.nio.file.Files.createTempDirectory("events-encoding")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  // 2021-03-04T05:06:07.123456 UTC, plus a pre-epoch instant (floor-division
  // edge for the nanos path)
  private val micros = Seq(1614834367123456L, -1L)

  private def writeEvents(sub: String)(build: SparkSession => org.apache.spark.sql.DataFrame): String = {
    val dir = tmp.resolve(sub).toString
    build(spark).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadedMicros(dir: String): Seq[Long] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables.events must yield TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("nanos-as-long encoding (legacy TIMESTAMP(NANOS)) → TimestampType") {
    // The legacy flag surfaces parquet TIMESTAMP(NANOS) as a plain long;
    // writing LongType directly exercises the identical loader branch.
    val dir = writeEvents("nanos") { s =>
      import s.implicits._
      micros.map(_ * 1000L).toDF("ts")
    }
    // floor division: -1000 ns → -1 us; pre-epoch must not shift
    assert(loadedMicros(dir) == micros.sorted)
  }

  test("timezone-less timestamp[us] (TIMESTAMP_NTZ) → TimestampType, value-preserving under UTC") {
    val dir = writeEvents("ntz") { s =>
      import s.implicits._
      micros.toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    }
    assert(loadedMicros(dir) == micros.sorted)
  }

  test("zoned timestamp[us] (TIMESTAMP) → passes through unchanged") {
    val dir = writeEvents("ltz") { s =>
      import s.implicits._
      micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    }
    assert(loadedMicros(dir) == micros.sorted)
  }

  test("w15 anomaly survives extreme values: power sum widens before the multiply") {
    // one $100M event: v = 1e10 cents, v·v = 1e20 > 2^63 — a 64-bit
    // pre-multiply aborts under ANSI; the widened decimal must not
    // |z| is bounded by (n−1)/√n, so 20 rows make the outlier's z ≈ 4.25
    val dir = writeEvents("extreme") { s =>
      import s.implicits._
      val rows = (1L to 19L).map(i =>
        (i, 1614834367123456L + i, 7L, "error", (i % 3).toDouble, "{}")) :+
        ((20L, 1614834367123500L, 7L, "error", 100000000.00, "{}"))
      rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    }
    val out = SparkEntry.queries("w15_anomaly")(spark, dir).collect()
    assert(out.length == 1 && out.head.getLong(1) == 20L)
    assert(out.head.getLong(2) == 1L, "exactly the extreme value must flag")
  }

  test("watermark + unix_micros work on whatever the current testdata encodes") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    // both threw AnalysisException on NTZ in round 6
    df.withWatermark("ts", "1 hour").limit(1).collect()
    assert(df.select(unix_micros(col("ts"))).limit(1).collect().nonEmpty)
  }
}
