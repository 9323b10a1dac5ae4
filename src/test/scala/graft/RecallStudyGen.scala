package graft

import graft.eval.RecallStudy

/** Generates the SCALE.md recall/scan-fraction crossover table:
  * `sbt "Test/runMain graft.RecallStudyGen"`. Deterministic (seeded data,
  * seeded planes, deterministic k-means) — re-running reproduces the
  * published table exactly.
  */
object RecallStudyGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "8").getOrCreate()
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = RecallStudy.clusteredVectors(
      n = 20000, dim = 32, nClusters = 16, noise = 0.15, seed = 7L)
    val queries = RecallStudy.clusteredVectors(
      n = 50, dim = 32, nClusters = 16, noise = 0.15, seed = 1234L)
    val points = RecallStudy.run(spark, vecs, queries,
      pqM = 8, pqKsub = 64, pqShortlist = 200)
    println("| method | param | recall@10 | scan fraction |")
    println("|---|---|---|---|")
    points.foreach { p =>
      println(f"| ${p.method} | ${p.param} | ${p.meanRecallAt10}%.3f " +
        f"| ${p.meanScanFraction}%.4f |")
    }
    spark.stop()
  }
}
