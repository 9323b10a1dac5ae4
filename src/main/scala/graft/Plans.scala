package graft

/** Dev tool: executed physical plan per named catalog query, prefixed with
  * a one-line exchange / join-strategy / top-k summary — the quick check
  * that a new query's plan matches its scaladoc's scale claims before it
  * gets a PlanShapeSpec guard. `SPARK_GRAFT_SF_DIR` overrides the data
  * dir; `PLANS_SUMMARY_ONLY=1` suppresses the full plan text (the mode
  * used for whole-catalog sweeps).
  */
object Plans extends App {
  val spark = GraftSession.local()
  val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
  val summaryOnly = sys.env.get("PLANS_SUMMARY_ONLY").contains("1")
  for (name <- args) {
    val p = SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString
    def n(pat: String) = pat.r.findAllIn(p).size
    println(s"===== $name =====")
    println(s"  hashEx=${n("Exchange hashpartitioning")} " +
      s"rangeEx=${n("Exchange rangepartitioning")} " +
      s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
      s"bnlj=${n("BroadcastNestedLoopJoin")} cart=${n("CartesianProduct")} " +
      s"top=${p.contains("TakeOrderedAndProject")}")
    if (!summaryOnly) println(p.take(3000))
  }
  spark.stop()
}
