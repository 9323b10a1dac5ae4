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

  test("BloomProbe: planted membership — no false negatives, fpp within bound") {
    import org.apache.spark.sql.graft.BloomProbe
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    // 2000 member digests; probe them plus 2000 disjoint non-members
    val members = (0 until 2000).map(i => s"member-$i")
    val outsiders = (0 until 2000).map(i => s"outsider-$i")
    val bloom = members.toDF("d")
      .select(BloomProbe.bloomAgg(col("d"), 1L << 12, 1L << 15))
      .head.getAs[Array[Byte]](0)
    val hits = (members ++ outsiders).toDF("d")
      .withColumn("hit", BloomProbe.mightContain(bloom, col("d")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(members.forall(hits(_)), "bloom false negative")
    val fp = outsiders.count(hits(_))
    // 16 bits/item ⇒ fpp well under 1%; allow generous slack
    assert(fp <= 60, s"$fp false positives of 2000 non-members")
    // determinism: same items ⇒ same serialized filter bytes
    val bloom2 = scala.util.Random.shuffle(members).toDF("d")
      .repartition(7)
      .select(BloomProbe.bloomAgg(col("d"), 1L << 12, 1L << 15))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bloom, bloom2),
      "bloom bytes must be independent of row order and partitioning")
  }

  test("d13 bloom prefilter: zero false negatives, bounded false positives, deterministic") {
    val q = SparkEntry.queries("d13_bloom_incremental")
    val rows = q(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var totalNew = 0L; var totalFp = 0L; var totalTrue = 0L
    rows.foreach { r =>
      val Seq(nNew, hits, confirmed, truth, fn, fp) =
        (1 to 6).map(i => r.getLong(i))
      // the bloom guarantee: a missed duplicate would be corpus corruption
      assert(fn == 0L, s"false negatives in ${r.getString(0)}")
      assert(confirmed == truth, "confirm join must recover exactly the true dups")
      assert(hits >= truth && hits <= nNew)
      assert(fp == hits - truth)
      totalNew += nNew; totalFp += fp; totalTrue += truth
    }
    // ~8 bits/item ⇒ ≈2% fpp; allow generous statistical slack
    assert(totalFp.toDouble <= 0.10 * (totalNew - totalTrue) + 3,
      s"false-positive rate above bound: $totalFp of ${totalNew - totalTrue}")
    // fixed hash seed + order-free OR-merge ⇒ bit-identical reruns
    assert(q(spark, "/root/testdata/sf0.001").collect().toSeq == rows.toSeq)
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
