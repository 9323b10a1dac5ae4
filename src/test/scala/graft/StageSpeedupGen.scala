package graft

import graft.queries.{DedupQueries, StageCache}

/** Measures the write-time-table payoff for ROUND8.md (VERDICT r7 task
  * #5): the sketch-consuming dedup queries cold (recompute inside the
  * query) vs against tables `index-sketches` persisted (read-through).
  * StageCache is released between passes so both run from zero in-memory
  * state; the catalog is JIT-warmed at sf0.001 first so neither pass
  * pays compilation.
  */
object StageSpeedupGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = Seq("d2_minhash_sig", "d3_minhash_lsh_pairs",
      "d9_crossdoc_grams", "d10_incremental_dedup", "d12_novelty",
      "d13_bloom_incremental")

    def runAll(): Double = {
      val t0 = System.nanoTime()
      queries.foreach(q => SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save())
      (System.nanoTime() - t0) / 1e9
    }

    // JIT warmup on the smallest sf (different dataset, nothing cached from it)
    queries.foreach { q =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    StageCache.release(spark)

    val cold = runAll()
    StageCache.release(spark)

    val root = java.nio.file.Files
      .createTempDirectory("stage_speedup").toString
    val t0 = System.nanoTime()
    DedupQueries.writeTimeStages(spark, dir).foreach { case (k, df) =>
      StageCache.persistStage(spark, k, df, root)
    }
    val persistSec = (System.nanoTime() - t0) / 1e9
    StageCache.release(spark)

    spark.conf.set(StageCache.PathConf, root)
    val warm = runAll()
    println(f"STAGE-SPEEDUP sf=$dir queries=${queries.size} " +
      f"recompute=$cold%.2fs readthrough=$warm%.2fs " +
      f"speedup=${cold / warm}%.2fx persist_cost=$persistSec%.2fs")
    spark.stop()
  }
}
