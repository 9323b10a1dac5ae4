package graft

import org.apache.spark.sql.functions._

import graft.search.{Hnsw, Ivf, VectorSearch}

/** Dev tool: routed-HNSW recall sweep over (replicas, probeShards) —
  * picks the production knobs RoutedHnswSpec pins. */
object RoutedSweepGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val S = 16
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = Tables.embeddings(spark, dir)
        .select(format_string("v%08d", col("vec_id")).as("vec_id"),
          col("embedding").as("vector"))
      val sample = e.orderBy(col("vec_id")).limit(1024)
        .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
      val router = Ivf.train(sample, S)
      val queries = e.orderBy(col("vec_id")).limit(20)
        .as[(String, Array[Float])].collect().toSeq
      val exact = VectorSearch.batchKnn(e,
          queries.toDF("query_id", "query_vector"), 10, tieBreak = "vec_id")
        .select(col("query_id"), col("vec_id")).as[(String, String)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      for (rep <- Seq(2, 3, 4)) {
        val idx = Hnsw.buildIndexTableRouted(e, router, replicas = rep,
          idCol = "vec_id").cache()
        idx.count()
        for (r <- Seq(2, 4, 6, 8)) {
          val routed = Hnsw.searchIndexRouted(idx, queries, 10, 64,
            router, probeShards = r, idCol = "vec_id")
            .select(col("query_id"), col("vec_id")).as[(String, String)]
            .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
          val recs = queries.map { case (qid, _) =>
            val t = exact(qid)
            routed.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
          }
          println(f"SWEEP $dir rep=$rep R=$r mean=${recs.sum / recs.size}%.3f " +
            f"min=${recs.min}%.2f")
        }
        idx.unpersist()
      }
    }
    spark.stop()
  }
}
