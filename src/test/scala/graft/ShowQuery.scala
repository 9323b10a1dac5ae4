package graft

/** Dev tool: print a catalog query's full output at a given sf dir —
  * `sbt "Test/runMain graft.ShowQuery <name> [sfDir]"`. Used when
  * reviewing an output before pinning its golden hash.
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "8").getOrCreate()
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    args.take(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.show(200, truncate = false)
      println(s"GOLDEN ${GoldenHash.of(df)}")
    }
    spark.stop()
  }
}
