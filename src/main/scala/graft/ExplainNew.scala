package graft

/** Dev tool: one-line physical-plan summary (exchange / join-strategy /
  * top-k counts) per named catalog query — the quick check that a new
  * query's plan matches its scaladoc's scale claims before it gets a
  * PlanShapeSpec guard.
  */
object ExplainNew extends App {
  val spark = GraftSession.local()
  spark.sparkContext.setLogLevel("WARN")
  val dir = "/root/testdata/sf0.001"
  for (name <- args) {
    val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
    println(s"===== $name =====")
    println(s"  hashEx=${"Exchange hashpartitioning".r.findAllIn(p).size} rangeEx=${"Exchange rangepartitioning".r.findAllIn(p).size} bhj=${"BroadcastHashJoin".r.findAllIn(p).size} smj=${"SortMergeJoin".r.findAllIn(p).size} bnlj=${"BroadcastNestedLoopJoin".r.findAllIn(p).size} cart=${"CartesianProduct".r.findAllIn(p).size} top=${p.contains("TakeOrderedAndProject")}")
  }
  spark.stop()
}
