package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLayout

/** Small-file compaction: fragmented partitions coalesce to the target
  * file count with identical content; already-compact partitions are left
  * byte-identical; rewritten files keep the sorted-file contract.
  */
class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("compaction")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.ingest.TableSwap.rmTreeAt(dir.toString)
  }

  private def filesIn(p: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(p)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .toSeq.sorted
  }

  test("fragmented partitions coalesce; content and sort order preserved") {
    val s = spark
    import s.implicits._
    val path = s"$dir/t1"
    // 2 partitions x 6 files each (repartition before partitionBy fans the
    // rows of every k across all 6 tasks)
    val df = (1 to 600).map(i => (i % 2, i, s"v$i")).toDF("k", "id", "v")
    df.repartition(6).write.partitionBy("k").parquet(path)
    assert(filesIn(s"$path/k=0").size > 1)

    val before = df.collect().map(_.toSeq).toSet
    val st = TableLayout.compact(s, path, targetBytes = 1L << 30,
      sortCols = Seq("id"))
    assert(st.partitionsCompacted == 2)
    assert(st.filesAfter == 2, s"expected 1 file per partition: $st")
    assert(filesIn(s"$path/k=0").size == 1)
    assert(s.read.parquet(path).select(col("k"), col("id"), col("v"))
      .collect().map(_.toSeq).toSet == before)

    // sorted-file contract: the compacted file is ordered by the sort key
    val ids = s.read.parquet(s"$path/k=0/${filesIn(s"$path/k=0").head}")
      .select(col("id")).collect().map(_.getInt(0)).toSeq
    assert(ids == ids.sorted, "compacted file must be sorted on sortCols")
  }

  test("filesAfter reports what landed, not the coalesce plan") {
    val s = spark
    import s.implicits._
    val path = s"$dir/t_report"
    val df = (1 to 300).map(i => (i, s"v$i")).toDF("id", "v")
    df.repartition(3).write.parquet(path)
    assert(filesIn(path).size == 3)
    // targetBytes ≈ 60% of the table ⇒ planned nOut = 2, but the scan
    // reads these 3 tiny files as ONE input partition, so coalesce(2)
    // can only write 1 file — the stats must report the actual count
    val bytes = filesIn(path)
      .map(f => Files.size(Paths.get(path, f))).sum
    val st = TableLayout.compact(s, path, targetBytes = (bytes * 6) / 10,
      sortCols = Seq("id"))
    assert(st.partitionsCompacted == 1)
    assert(st.filesAfter == filesIn(path).size,
      s"filesAfter=${st.filesAfter} but disk has ${filesIn(path).size}")
  }

  test("second pass is a no-op: compact partitions stay byte-identical") {
    val s = spark
    val path = s"$dir/t1"
    val names = filesIn(s"$path/k=1")
    val st = TableLayout.compact(s, path, targetBytes = 1L << 30,
      sortCols = Seq("id"))
    assert(st.partitionsCompacted == 0)
    assert(filesIn(s"$path/k=1") == names)
  }

  test("unpartitioned table compacts its root directory") {
    val s = spark
    import s.implicits._
    val path = s"$dir/flat"
    (1 to 100).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(5).write.parquet(path)
    assert(filesIn(path).size == 5)
    val st = TableLayout.compact(s, path, targetBytes = 1L << 30,
      sortCols = Seq("id"))
    assert(st.partitionsCompacted == 1 && st.filesAfter == 1)
    assert(s.read.parquet(path).count() == 100)
  }
}
