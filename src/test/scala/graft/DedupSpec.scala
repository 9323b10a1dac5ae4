package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.ConnectedComponents

class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def clusters(edges: Seq[(Long, Long)],
      maxRounds: Int = 50): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    // smallThreshold = 0 forces the distributed loop — the scale path is
    // what these shapes pin; the driver-side fast path is checked by the
    // equivalence test below
    ConnectedComponents.label(edges.toDF("id_a", "id_b"),
      maxRounds = maxRounds, smallThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("driver fast path and distributed loop agree") {
    val s = spark
    import s.implicits._
    val edges = Seq((5L, 9L), (9L, 2L), (7L, 8L), (1L, 5L), (3L, 3L))
    val fast = ConnectedComponents.label(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = clusters(edges)
    assert(fast == loop)
    assert(fast(9L) == 1L && fast(8L) == 7L && fast(3L) == 3L)
  }

  test("strategy cutoff is session-conf tunable (spark.graft.dedup.smallThreshold)") {
    val s = spark
    import s.implicits._
    val edges = Seq((5L, 9L), (9L, 2L), (7L, 8L))
    // conf 0 forces the distributed loop on this tiny edge set; the
    // default (argument -1 → conf absent → 1M) takes the driver path.
    // Identical labels either way — the conf only moves the strategy cut.
    s.conf.set(ConnectedComponents.SmallThresholdKey, "0")
    try {
      val viaConf = ConnectedComponents.label(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaConf == clusters(edges))
    } finally s.conf.unset(ConnectedComponents.SmallThresholdKey)
  }

  test("path graph collapses to the minimum endpoint") {
    // diameter 24 with maxRounds=10: pointer jumping converges in ~log2(24)
    // rounds; plain O(diameter) propagation needs ~24 and would trip the
    // convergence require() — THIS bound is what pins the optimization
    val path = (0L until 24L).map(i => (i, i + 1))
    val got = clusters(path, maxRounds = 10)
    assert(got.keySet == (0L to 24L).toSet)
    assert(got.values.toSet == Set(0L))
  }

  test("disjoint components get distinct minimum labels") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L))
    val got = clusters(edges)
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("write-time sketch columns round-trip parquet and bypass recompute") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.SketchExpressions
    val docs = (0L until 50L).map(i => (i, s"some document body $i with shared words"))
      .toDF("doc_id", "text")
    val computed = docs.select(col("doc_id"),
      SketchExpressions.minhashSignature(col("text"), 3, 8).as("sig"),
      SketchExpressions.simhash(col("text"), 16).as("simhash"))
    val path = "/tmp/graft-warehouse/sketch_cols"
    computed.write.mode("overwrite").parquet(path)
    val stored = s.read.parquet(path)

    // lossless round-trip: stored columns equal freshly computed ones
    assert(stored.join(computed.withColumnRenamed("sig", "sig2")
      .withColumnRenamed("simhash", "sh2"), "doc_id")
      .filter(col("sig") =!= col("sig2") || col("simhash") =!= col("sh2"))
      .count() == 0)

    // a consumer deriving band hashes from the stored column never
    // re-tokenizes: no sketch expression, no md5-over-text in its plan
    val bands = stored.select(col("doc_id"),
      graft.functions.TextSketch.bandHash(col("sig"), 0, 2).as("b0"))
    val p = bands.queryExecution.executedPlan.toString
    assert(!p.contains("minhash_signature") && !p.contains("simhash"), p)
  }

  test("star and clique shapes label every member with the hub minimum") {
    val star = (1L to 8L).map(i => (0L, i))
    val clique = for (i <- 100L to 104L; j <- i + 1 to 104L) yield (i, j)
    val got = clusters(star ++ clique)
    assert((0L to 8L).forall(got(_) == 0L))
    assert((100L to 104L).forall(got(_) == 100L))
  }
}
