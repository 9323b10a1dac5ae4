package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.RecallStudy
import graft.search.Ivf

/** Multi-assignment IVF: the replicated index contains the single-assign
  * index (the nearest list is among the R nearest), costs exactly ×R
  * rows, never returns a fragment twice, and — the point — lifts recall
  * at a FIXED nprobe on between-cluster queries, the case the round-8
  * hard-corpus study measured as cell pruning's weak spot.
  */
class IvfMultiAssignSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val dim = 32
  private val n = 3000
  private val k = 10

  private def normalize(v: Array[Float]): Array[Float] = {
    val s = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    if (s == 0) v else v.map(_ / s)
  }

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.indices.map(i => a(i).toDouble * b(i)).sum

  test("replicated IVF: superset of single-assign, 2x rows, recall up at fixed nprobe") {
    val s = spark
    import s.implicits._
    val vecs = RecallStudy.clusteredVectors(n, dim, nClusters = 16,
      noise = 0.25, seed = 77L)
    val df = vecs.zipWithIndex
      .map { case (v, i) => (f"f$i%06d", v) }.toSeq
      .toDF("fragment_id", "vector")
    val sample = vecs.take(1500)
    val quant = Ivf.train(sample, 16)

    val single = Ivf.buildIndex(df, quant).cache()
    val multi = Ivf.buildIndexMultiAssign(df, quant, replicas = 2).cache()

    // exactly xR rows, and the single-assign pair set is contained
    assert(multi.count() == 2 * single.count())
    val singlePairs = single.select("fragment_id", "list_id")
      .as[(String, Int)].collect().toSet
    val multiPairs = multi.select("fragment_id", "list_id")
      .as[(String, Int)].collect().toSet
    assert(singlePairs.subsetOf(multiPairs),
      s"nearest list missing from replicas: ${(singlePairs -- multiPairs).take(3)}")
    // a vector's two nearest lists are distinct
    assert(multiPairs.size == multi.count())

    // between-cluster queries: even blends of vectors from two different
    // clusters — the boundary case the hard-corpus study found weakest
    val rnd = new scala.util.Random(5)
    val queries = (0 until 40).map { _ =>
      val a = vecs(rnd.nextInt(n))
      val b = vecs(rnd.nextInt(n))
      normalize(a.zip(b).map { case (x, y) => x + y })
    }
    def truth(q: Array[Float]): Set[String] =
      vecs.zipWithIndex.map { case (v, i) => (-dot(q, v), f"f$i%06d") }
        .sorted.take(k).map(_._2).toSet
    def recall(index: org.apache.spark.sql.DataFrame,
        replicated: Boolean): Double = {
      val per = queries.map { q =>
        val top =
          if (replicated)
            Ivf.searchMultiAssign(index, q, quant, k, nprobe = 2)
          else Ivf.search(index, q, quant, k, nprobe = 2)
        val ids = top.select("fragment_id").as[String].collect()
        // no fragment may surface twice
        assert(ids.distinct.length == ids.length)
        ids.toSet.intersect(truth(q)).size.toDouble / k
      }
      per.sum / per.length
    }
    val r1 = recall(single, replicated = false)
    val r2 = recall(multi, replicated = true)
    info(f"between-cluster recall@$k nprobe=2: single=$r1%.3f replicated=$r2%.3f")
    assert(r2 > r1 + 0.02,
      f"replication did not lift boundary recall: $r1%.3f -> $r2%.3f")
    assert(r2 >= 0.8, f"replicated recall too low: $r2%.3f")
    single.unpersist(); multi.unpersist()
  }

  test("pre-record sidecars load as replicas-unknown and keep the dedupe") {
    // a sidecar written before the replicas record existed says nothing
    // about how the index was built — a multi-assigned index behind it
    // must not silently lose candidate dedupe (ADVICE r9, low)
    val dir = java.nio.file.Files.createTempDirectory("ivf-sidecar")
    try {
      val q = Ivf.Quantizer(2, 4, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f))
      val p = dir.resolve("q.txt").toString
      Ivf.save(q, p)
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8")
      // the record is now always written, replicas=1 included
      assert(text.linesIterator.toSeq.last == "replicas 1")
      assert(Ivf.load(p).replicas == 1)
      // strip it: the pre-r9 on-disk form
      val legacy = text.linesIterator.filterNot(_.startsWith("replicas"))
        .mkString("", "\n", "\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        legacy.getBytes("UTF-8"))
      val loaded = Ivf.load(p)
      assert(loaded.replicas == 0, "legacy sidecar must load as unknown")
      assert(loaded.replicas != 1, "unknown provenance must keep dedupe")
      assert(loaded.centroidsFlat.sameElements(q.centroidsFlat))
      // explicit multi-assign round-trips
      Ivf.save(q.copy(replicas = 3), p)
      assert(Ivf.load(p).replicas == 3)
      // a load→save round-trip of the UNKNOWN state must preserve it —
      // rewriting 0 to an explicit "replicas 1" would silently turn
      // dedupe off for a possibly multi-assigned legacy index
      Ivf.save(loaded, p)
      assert(Ivf.load(p).replicas == 0,
        "save must not launder unknown provenance into single-assign")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("a non-finite vector is a hard routing error, not a sentinel shard") {
    // NaN distances never beat the Int.MaxValue sentinel (NaN < x is
    // false), so without the guard an all-NaN vector would silently
    // land in shard Int.MaxValue·SubFactor (overflowed) — ADVICE r14:
    // refuse loudly in BOTH eval paths
    val s = spark
    import s.implicits._
    val q = Ivf.Quantizer(2, 4, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f))
    val bad = Seq(("x", Array(Float.NaN, 0f, 0f, 0f)))
      .toDF("fragment_id", "vector")
    val e = intercept[Exception] {
      bad.select(Ivf.multiAssignCol(org.apache.spark.sql.functions
        .col("vector"), q, 2)).collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null || (t.getCause eq t)) t else root(t.getCause)
    assert(root(e).getMessage.contains("non-finite vector"),
      s"expected the routing refusal, got: ${root(e).getMessage}")
  }
}
