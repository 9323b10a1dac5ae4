package graft

/** Dev tool: time individual catalog queries by name at
  * SPARK_GRAFT_SF_DIR (count()-based — NOTE count lets Catalyst prune
  * map-only projections; use graft.Bench's noop sink for honest numbers
  * on projection-heavy queries).
  */
object BenchOne extends App {
  val spark = GraftSession.local()
  val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  for (name <- args) {
    val t0 = System.nanoTime()
    try {
      spark.sparkContext.setJobDescription(name)
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"BENCHONE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    } catch {
      case e: Throwable => println(s"BENCHONE $name FAILED: ${e.getMessage}")
    }
  }
  spark.stop()
}
