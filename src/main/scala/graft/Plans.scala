package graft
object Plans extends App {
  val spark = GraftSession.local()
  val dir = "/root/testdata/sf0.01"
  for (name <- args) {
    println(s"===== $name =====")
    println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString.take(3000))
  }
  spark.stop()
}
