package graft

import org.apache.spark.sql.functions._

import graft.search.{Hnsw, Ivf}

/** Dev tool: where does the routed walk's time go at 1M? Builds the
  * routed + hash layouts over the clustered 1M table (must exist:
  * localdata/vec1m_c), then measures probed row volume and walk time
  * for both paths, plus a probed-rows-only scan as the IO floor. */
object RoutedWalkProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val e = spark.read.parquet("localdata/vec1m_c")
    val shards = 80
    val qs = e.filter(col("fragment_id") < f"f${8L}%09d")
      .orderBy(col("fragment_id"))
      .as[(String, Array[Float])].collect().toSeq
    val sample = e.orderBy(col("fragment_id")).limit(8192)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val router = Ivf.train(sample, shards, iters = 5)
    val dir = java.nio.file.Files.createTempDirectory("rwprobe").toString
    try {
      timed("routed_build") {
        Hnsw.saveIndexRouted(e, s"$dir/routed", router) }
      timed("hash_build") {
        Hnsw.saveIndex(e, s"$dir/hash", numShards = shards) }
      val rAdj = spark.read.parquet(s"$dir/routed")
      val fAdj = spark.read.parquet(s"$dir/hash")
      println(s"PROBE routed_total_rows ${rAdj.count()}")
      val cells = qs.flatMap(q => Ivf.nearestLists(q._2, router, 6))
        .distinct.sorted
      println(s"PROBE probed_cells ${cells.size}")
      val pruned = rAdj.filter(cells.map { c =>
        col("shard_id") >= c * Hnsw.RoutedSubFactor &&
          col("shard_id") < (c + 1) * Hnsw.RoutedSubFactor
      }.reduce(_ || _))
      println(s"PROBE probed_rows ${timed("probed_count")(pruned.count())}")
      // IO floor: scan+deserialize the probed rows only
      timed("probed_scan_noop") {
        pruned.write.mode("overwrite").format("noop").save() }
      // warm + timed walks
      Hnsw.searchIndexRouted(rAdj, qs, 10, 64, router, 6).count()
      timed("routed_walk") {
        Hnsw.searchIndexRouted(rAdj, qs, 10, 64, router, 6).count() }
      timed("routed_walk2") {
        Hnsw.searchIndexRouted(rAdj, qs, 10, 64, router, 6).count() }
      Hnsw.searchIndex(fAdj, qs, 10, 64).count()
      timed("fanout_walk") {
        Hnsw.searchIndex(fAdj, qs, 10, 64).count() }
      // shard group census of the probed set
      val census = pruned.groupBy(col("shard_id")).count()
        .select(col("count")).as[Long].collect().sorted
      println(s"PROBE probed_groups ${census.length} " +
        s"min=${census.head} med=${census(census.length / 2)} " +
        s"max=${census.last}")
    } finally graft.ingest.TableSwap.rmTreeAt(dir)
    spark.stop()
  }
}
