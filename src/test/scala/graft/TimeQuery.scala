package graft

/** Dev tool: time one or more catalog queries on a data dir and dump the
  * formatted physical plan. `sbt "Test/runMain graft.TimeQuery <dir> <q>..."`
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"==== $name ====")
      df.explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
