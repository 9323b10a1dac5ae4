package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.search.{Hnsw, Ivf, VectorSearch}

/** The cluster-routed HNSW layout (VERDICT r13 task 3): routing a query
  * to its R nearest shard centroids must hold the recall floor the
  * verdict set (≥ 0.95 vs exact on the probe set), degenerate EXACTLY
  * to the full fan-out at R = numShards, survive the save/load round
  * trip, and prune the scan to the routed shard partitions at the file
  * source. The walk-cost-flat-in-shard-count property is measured at
  * 1M/10M in the index soak (SCALE.md); this spec pins semantics.
  */
class RoutedHnswSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var tmp: java.nio.file.Path = _
  private val S = 16
  private val R = 6
  private val Ef = 64
  private val K = 10
  private val NQueries = 20

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tmp = Files.createTempDirectory("routed-hnsw")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.ingest.TableSwap.rmTreeAt(tmp.toString)
  }

  private def corpus(dir: String) = Tables.embeddings(spark, dir)
    .select(format_string("v%08d", col("vec_id")).as("vec_id"),
      col("embedding").as("vector"))

  private def topSets(df: org.apache.spark.sql.DataFrame)
      : Map[String, Set[String]] = {
    val s = spark
    import s.implicits._
    df.select(col("query_id"), col("vec_id")).as[(String, String)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
    test(s"routed R=$R/$S holds the ≥0.95 recall floor; R=S ≡ full " +
        s"fan-out at ${new java.io.File(dir).getName}") {
      val s = spark
      import s.implicits._
      val e = corpus(dir)
      val sample = e.orderBy(col("vec_id")).limit(1024)
        .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
      val router = Ivf.train(sample, S)
      val path = s"$tmp/idx-${new java.io.File(dir).getName}"
      Hnsw.saveIndexRouted(e, path, router, idCol = "vec_id")
      val idx = spark.read.parquet(path)
      val loaded = Ivf.load(s"$path.router.txt")
      assert(loaded.centroidsFlat.toSeq == router.centroidsFlat.toSeq,
        "router sidecar must round-trip exactly")
      assert(loaded.replicas == 3, "sidecar records the replica factor")

      val queries = e.orderBy(col("vec_id")).limit(NQueries)
        .as[(String, Array[Float])].collect().toSeq
      val exact = topSets(VectorSearch.batchKnn(e,
        queries.toDF("query_id", "query_vector"), K, tieBreak = "vec_id"))

      // R-of-S routing: the verdict's recall floor on the probe set
      val routed = topSets(Hnsw.searchIndexRouted(idx, queries, K, Ef,
        loaded, probeShards = R, idCol = "vec_id"))
      val recalls = queries.map { case (qid, _) =>
        val t = exact(qid)
        routed.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
      }
      val mean = recalls.sum / recalls.size
      assert(mean >= 0.95,
        s"routed recall ${recalls.mkString(",")} mean $mean < 0.95 floor")

      // R = S degenerates to the full fan-out EXACTLY (same rows) — on
      // an UNREPLICATED routed layout, where searchIndex's merge
      // semantics apply verbatim
      val idx1 = Hnsw.buildIndexTableRouted(e, router, replicas = 1,
        idCol = "vec_id").cache()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("query_id"), col("vec_id"), col("similarity"),
            col("rank"))
          .collect().map(r => (r.getString(0), r.getString(1),
            r.getDouble(2), r.getInt(3))).toSet
      val full = rows(Hnsw.searchIndex(idx1, queries, K, Ef,
        idCol = "vec_id"))
      val routedFull = rows(Hnsw.searchIndexRouted(idx1, queries, K, Ef,
        router, probeShards = S, idCol = "vec_id"))
      assert(routedFull == full)
      idx1.unpersist()

      // the routed scan partition-prunes to the routed shards
      val plan = Hnsw.searchIndexRouted(idx, queries.take(1), K, Ef,
        loaded, probeShards = 1, idCol = "vec_id")
        .queryExecution.executedPlan.toString
      assert(plan.linesIterator.filter(_.contains("PartitionFilters"))
        .exists(_.contains("shard_id")),
        s"shard_id must reach PartitionFilters:\n$plan")
    }

  test("routed walk answers only from routed shards (isolation witness)") {
    val s = spark
    import s.implicits._
    val e = corpus("/root/testdata/sf0.001")
    val sample = e.orderBy(col("vec_id")).limit(1024)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val router = Ivf.train(sample, S)
    val idx = Hnsw.buildIndexTableRouted(e, router, replicas = 1,
      idCol = "vec_id").cache()
    val queries = e.orderBy(col("vec_id")).limit(3)
      .as[(String, Array[Float])].collect().toSeq
    val hits = Hnsw.searchIndexRouted(idx, queries, K, Ef, router,
      probeShards = 1, idCol = "vec_id")
      .join(idx.select(col("vec_id"), col("shard_id")), Seq("vec_id"))
      .select(col("query_id"), col("shard_id").cast("int"))
      .as[(String, Int)].collect()
    queries.foreach { case (qid, qv) =>
      val want = Ivf.nearestLists(qv, router, 1).head
      val got = hits.filter(_._1 == qid)
        .map(_._2 / Hnsw.RoutedSubFactor).distinct.toSeq
      assert(got == Seq(want),
        s"$qid answered from cells $got, routed to $want")
    }
    idx.unpersist()
  }

  test("skewed cells split into size-bounded sub-shards; routing probes " +
      "all of a cell's sub-shards") {
    val s = spark
    import s.implicits._
    val e = corpus("/root/testdata/sf0.01")
    val sample = e.orderBy(col("vec_id")).limit(1024)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val router = Ivf.train(sample, 4) // few cells ⇒ big cells
    val idx = Hnsw.buildIndexTableRouted(e, router, replicas = 1,
      idCol = "vec_id", targetShardRows = 100L).cache()
    // every sub-shard holds ≤ ~2× the target (hash split of the cell)
    val sizes = idx.groupBy(col("shard_id")).count()
      .select(col("shard_id").cast("int"), col("count"))
      .as[(Int, Long)].collect()
    assert(sizes.exists(_._1 % Hnsw.RoutedSubFactor > 0),
      "a 500-row corpus at target 100 must have split some cell")
    assert(sizes.forall(_._2 <= 200L),
      s"sub-shard over 2× target: ${sizes.mkString(",")}")
    // a routed probe of one cell still sees the WHOLE cell: at ef ≥ n
    // every sub-graph answers exactly, so the merged result equals the
    // exact top-K over the cell's rows — splitting cannot lose nodes
    val (qid, qv) = e.orderBy(col("vec_id"))
      .as[(String, Array[Float])].head()
    val cell = Ivf.nearestLists(qv, router, 1).head
    val n = e.count().toInt
    val routedIds = Hnsw.searchIndexRouted(idx, Seq((qid, qv)), K,
        ef = n, router, probeShards = 1, idCol = "vec_id")
      .orderBy(col("rank"))
      .select(col("vec_id")).as[String].collect().toSeq
    val cellRows = idx.filter(
        col("shard_id") >= cell * Hnsw.RoutedSubFactor &&
          col("shard_id") < (cell + 1) * Hnsw.RoutedSubFactor)
      .select(col("vec_id"), col("vector"))
    val exactIds = VectorSearch.knn(cellRows, qv, K,
        vectorCol = "vector", tieBreak = "vec_id")
      .select(col("vec_id")).as[String].collect().toSeq
    assert(routedIds == exactIds,
      s"sub-shard union must cover the cell: $routedIds != $exactIds")
    idx.unpersist()
  }

  test("a retrained router against a stamped adjacency is a hard error " +
      "(router_hash guard)") {
    // ADVICE r14 (medium): shard ids are meaningless under a different
    // router — a torn adjacency/sidecar pair or a retrained router must
    // refuse to route, not silently probe the wrong cells
    val s = spark
    import s.implicits._
    val e = corpus("/root/testdata/sf0.001")
    val sample = e.orderBy(col("vec_id")).limit(1024)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val router = Ivf.train(sample, S)
    val other = Ivf.train(sample.drop(7), S) // a different training run
    assert(Ivf.contentHash(other) != Ivf.contentHash(router))
    val idx = Hnsw.buildIndexTableRouted(e, router, replicas = 1,
      idCol = "vec_id").cache()
    val queries = e.orderBy(col("vec_id")).limit(1)
      .as[(String, Array[Float])].collect().toSeq
    // the stamped router routes fine…
    assert(Hnsw.searchIndexRouted(idx, queries, K, Ef, router,
      probeShards = R, idCol = "vec_id").count() > 0)
    // …the retrained one errors out loudly
    val err = intercept[Exception] {
      Hnsw.searchIndexRouted(idx, queries, K, Ef, other,
        probeShards = R, idCol = "vec_id").collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null || (t.getCause eq t)) t else root(t.getCause)
    val msgs = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("router_hash mismatch"),
      s"expected the routing refusal, got: $msgs")
    idx.unpersist()
  }
}
