package graft

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.search.{IndexMaintenance, Ivf}
import graft.sources.TableLayout

/** Concurrent reader vs maintenance swaps (VERDICT r7 task #6): while
  * [[IndexMaintenance.updateIndex]] rewrites every list through the
  * manifest stage-then-swap protocol, a reader hammering the same index
  * must NEVER observe a torn list — rows from two generations inside one
  * list partition, or a partially-swapped list. Directory renames are the
  * protocol's atom: a list is wholly old or wholly new at every instant;
  * a read that races a rename may fail cleanly (file vanished between
  * listing and reading — the reader retries), but a read that SUCCEEDS
  * must be generation-consistent per list.
  *
  * The generation is encoded in fragment ids, every update replaces all
  * four docs (all four lists swap each round — maximum interleave
  * surface), and each (doc, generation) always carries exactly
  * FragsPerDoc rows, so both tear modes (mixed gens, partial list) are
  * detectable from any successful read. A final [[IndexMaintenance
  * .recover]] + read proves the index lands whole at the last generation.
  */
class SwapChaosSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("swap-chaos")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.ingest.TableSwap.rmTreeAt(dir.toString)
  }

  private val Docs = Seq("a" -> 0f, "b" -> 10f, "c" -> 20f, "d" -> 30f)
  private val FragsPerDoc = 2

  /** All four docs at one generation; the gen rides in the fragment id. */
  private def genRows(gen: Int): DataFrame = {
    val s = spark
    import s.implicits._
    Docs.flatMap { case (doc, base) =>
      (0 until FragsPerDoc).map { i =>
        (doc, s"$doc-g$gen-f$i", Array(base + i * 0.01f, base, 1f, 0.5f))
      }
    }.toDF("document_id", "fragment_id", "vector")
  }

  private def quant(): Ivf.Quantizer = {
    val dim = 4
    val flat = new Array[Float](Docs.length * dim)
    Docs.map(_._2).zipWithIndex.foreach { case (b, c) =>
      flat(c * dim) = b; flat(c * dim + 1) = b
      flat(c * dim + 2) = 1f; flat(c * dim + 3) = 0.5f
    }
    Ivf.Quantizer(Docs.length, dim, flat)
  }

  test("a concurrent reader never sees a torn list across manifest swaps") {
    val q = quant()
    val path = s"$dir/ivf_chaos"
    TableLayout.writePartitionedSorted(
      Ivf.buildIndex(genRows(0), q), path, "list_id", Seq("fragment_id"))

    val gens = 4
    val writerDone = new AtomicBoolean(false)
    val cleanReads = new AtomicInteger(0)
    val failedReads = new AtomicInteger(0)
    @volatile var tear: Option[String] = None
    @volatile var writerErr: Option[Throwable] = None

    val writer = new Thread(() => {
      try {
        (1 to gens).foreach { g =>
          IndexMaintenance.updateIndex(spark, path, genRows(g),
            Ivf.buildIndex(_, q))
        }
      } catch { case t: Throwable => writerErr = Some(t) }
      finally writerDone.set(true)
    }, "chaos-writer")

    val reader = new Thread(() => {
      val genRe = """.+-g(\d+)-f\d+""".r
      // do-while shape: at least ONE read must complete even if the
      // writer finishes before the reader's first collect (loaded-host
      // race) — otherwise the cleanReads>0 assertion fails spuriously
      var first = true
      while ((first || !writerDone.get()) && tear.isEmpty) {
        try {
          val rows = spark.read.parquet(path)
            .select(col("list_id").cast("int"), col("fragment_id"))
            .collect().map(r => (r.getInt(0), r.getString(1)))
          cleanReads.incrementAndGet()
          first = false
          rows.groupBy(_._1).foreach { case (list, rs) =>
            // exhaustive: an unparseable fragment id is itself a tear
            // (it must not fall into the catch-all retry below)
            val gensSeen = rs.map { case (_, f) =>
              f match {
                case genRe(g) => g.toInt
                case other =>
                  tear = Some(s"list $list has a malformed fragment id: $other")
                  -1
              }
            }.distinct
            if (gensSeen.length != 1)
              tear = Some(s"list $list mixes generations $gensSeen: " +
                rs.map(_._2).sorted.mkString(", "))
            else if (rs.length != FragsPerDoc)
              tear = Some(s"list $list partially swapped: ${rs.length} rows " +
                s"(${rs.map(_._2).sorted.mkString(", ")})")
          }
        } catch {
          // a rename won the race against this read: clean failure, retry
          case _: Throwable => failedReads.incrementAndGet()
        }
      }
    }, "chaos-reader")

    writer.start(); reader.start()
    writer.join(300000); reader.join(300000)

    assert(writerErr.isEmpty, s"writer failed: $writerErr")
    assert(tear.isEmpty, s"TORN READ: ${tear.getOrElse("")}")
    assert(cleanReads.get() > 0,
      s"reader never completed a read (${failedReads.get()} failures) — " +
        "the race assertions were vacuous")

    // after recovery, the whole index is at the final generation
    IndexMaintenance.recover(path)
    val finalRows = spark.read.parquet(path)
      .select(col("fragment_id")).collect().map(_.getString(0)).sorted
    val expected = (for ((d, _) <- Docs; i <- 0 until FragsPerDoc)
      yield s"$d-g$gens-f$i").sorted
    assert(finalRows.toSeq == expected,
      s"final state not at generation $gens: ${finalRows.mkString(", ")}")
  }
}
