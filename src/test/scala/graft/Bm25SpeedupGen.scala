package graft

import graft.queries.{StageCache, TextAnalysisQueries}

/** Measures the write-time BM25 posting/stats-table payoff (VERDICT r8
  * task #6): the BM25-scoring queries cold (tokenize + tf-count inside
  * the query) vs against the tables `index-sketches` persists
  * (read-through — scoring becomes a 7-column parquet scan plus a 1-row
  * stats read). Same protocol as StageSpeedupGen: JIT-warm at sf0.001,
  * release between passes so both start from zero in-memory state.
  */
object Bm25SpeedupGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = Seq("x22_bm25", "v14_hybrid_rrf", "v16_hybrid_topk")

    def runAll(): Double = {
      val t0 = System.nanoTime()
      queries.foreach(q => SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save())
      (System.nanoTime() - t0) / 1e9
    }

    queries.foreach { q =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    StageCache.release(spark)

    val cold = runAll()
    StageCache.release(spark)

    val root = java.nio.file.Files
      .createTempDirectory("bm25_speedup").toString
    val fp = TextAnalysisQueries.writeTimeFingerprint(dir)
    val t0 = System.nanoTime()
    TextAnalysisQueries.writeTimeStages(spark, dir).foreach { case (k, df) =>
      StageCache.persistStage(spark, k, df, root, fp)
    }
    val vfp = graft.queries.VectorQueries.writeTimeFingerprint(dir)
    graft.queries.VectorQueries.writeTimeStages(spark, dir).foreach {
      case (k, df) => StageCache.persistStage(spark, k, df, root, vfp)
    }
    val persistSec = (System.nanoTime() - t0) / 1e9
    StageCache.release(spark)

    spark.conf.set(StageCache.PathConf, root)
    val warm = runAll()
    println(f"BM25-SPEEDUP sf=$dir queries=${queries.size} " +
      f"recompute=$cold%.2fs readthrough=$warm%.2fs " +
      f"speedup=${cold / warm}%.2fx persist_cost=$persistSec%.2fs")
    spark.stop()
  }
}
