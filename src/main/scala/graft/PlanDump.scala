package graft

/** Dev tool: write `.explain("formatted")` for named catalog queries to
  * files (`plans/r15/<query>_<suffix>.txt`) — the optimization-round
  * evidence artifact. Usage:
  *   runMain graft.PlanDump <outDir> <suffix> <query...>
  * `SPARK_GRAFT_SF_DIR` sets the data dir (default sf0.1 — the bench sf,
  * so the captured plans are the ones the bench record corresponds to).
  */
object PlanDump extends App {
  val spark = GraftSession.local()
  val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val outDir = args(0)
  val suffix = args(1)
  new java.io.File(outDir).mkdirs()
  // SPARK_GRAFT_PLAN_EXEC=1: run the query (noop sink) first and dump
  // the EXECUTED plan — under AQE the initial explain shows
  // isFinalPlan=false and hides runtime exchange reuse / coalescing;
  // the executed plan is what actually ran.
  val execMode = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
  for (name <- args.drop(2)) {
    try {
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = if (execMode) {
        // collect() executes THIS DataFrame's own QueryExecution, so the
        // AdaptiveSparkPlan below finalizes (a noop write would execute a
        // separate QueryExecution and leave this one isFinalPlan=false)
        df.collect()
        df.queryExecution.executedPlan.toString
      } else df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"PLANDUMP $name ok (${txt.length} chars)")
    } catch {
      case e: Throwable => println(s"PLANDUMP $name FAILED: ${e.getMessage}")
    }
  }
  spark.stop()
}
