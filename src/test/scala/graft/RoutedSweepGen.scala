package graft

import org.apache.spark.sql.functions._

import graft.search.{Hnsw, Ivf, VectorSearch}

/** Dev tool: routed-HNSW knob sweep over (cells S × replicas × probed
  * cells R), recording recall, per-query probed FRACTION of the
  * replicated index, and build cost — the table a deployment picks its
  * knobs from (VERDICT r14 task 7) instead of re-deriving them. The
  * production default RoutedHnswSpec pins (replicas=3, R=6 of 16) came
  * from this sweep's earlier form; SCALE.md carries the current table.
  *
  * Reading the three axes:
  *  - S (cells) sets the pruning granularity: probed fraction ≈ R/S at
  *    balance, so bigger corpora want more cells at fixed R;
  *  - replicas buys recall at cluster boundaries (storage/build ×rep):
  *    rep=1 is measurably lossy at any practical R;
  *  - R buys recall linearly in probe cost; past the point where the
  *    query's true neighbors are covered it only adds walk volume.
  */
object RoutedSweepGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val out = new StringBuilder
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = Tables.embeddings(spark, dir)
        .select(format_string("v%08d", col("vec_id")).as("vec_id"),
          col("embedding").as("vector"))
      val sample = e.orderBy(md5(col("vec_id"))).limit(1024)
        .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
      val queries = e.orderBy(col("vec_id")).limit(20)
        .as[(String, Array[Float])].collect().toSeq
      val exact = VectorSearch.batchKnn(e,
          queries.toDF("query_id", "query_vector"), 10, tieBreak = "vec_id")
        .select(col("query_id"), col("vec_id")).as[(String, String)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      for (s <- Seq(8, 16, 32); rep <- Seq(1, 2, 3, 4)) {
        val router = Ivf.train(sample, s)
        val t0 = System.nanoTime()
        val idx = Hnsw.buildIndexTableRouted(e, router, replicas = rep,
          idCol = "vec_id").cache()
        val indexRows = idx.count()
        val buildSec = (System.nanoTime() - t0) / 1e9
        // per-cell row census -> mean per-query probed fraction per R
        val cellRows: Map[Int, Long] = idx
          .groupBy((col("shard_id") / Hnsw.RoutedSubFactor).cast("int"))
          .count().as[(Int, Long)].collect().toMap
        for (r <- Seq(2, 4, 6, 8).filter(_ <= s)) {
          val routed = Hnsw.searchIndexRouted(idx, queries, 10, 64,
            router, probeShards = r, idCol = "vec_id")
            .select(col("query_id"), col("vec_id")).as[(String, String)]
            .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
          val recs = queries.map { case (qid, _) =>
            val t = exact(qid)
            routed.getOrElse(qid, Set.empty).intersect(t).size.toDouble /
              t.size
          }
          val fracs = queries.map { case (_, qv) =>
            Ivf.nearestLists(qv, router, r)
              .map(c => cellRows.getOrElse(c, 0L)).sum.toDouble / indexRows
          }
          val line = f"SWEEP $dir S=$s rep=$rep R=$r " +
            f"recall=${recs.sum / recs.size}%.3f min=${recs.min}%.2f " +
            f"probed=${fracs.sum / fracs.size}%.3f build=${buildSec}%.1f s"
          println(line)
          out ++= line += '\n'
        }
        idx.unpersist()
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_SWEEP_OUT", "/tmp/routed_sweep.txt")),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
