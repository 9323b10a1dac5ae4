package graft

// GoldenHash itself moved to main scope (src/main/scala/graft/
// GoldenHash.scala) in round 13 so Verify can hash-check the no-oracle
// queries against VerifyChecks.pins; the generators stay test-scoped.

/** Re-pin helper: `sbt "Test/runMain graft.GoldenHashGen"` prints the
  * current hash for every no-oracle query at the spec's exact session
  * config. Re-pin GoldenHashSpec ONLY after reviewing the new output —
  * the hash is the regression oracle, not a self-fulfilling check.
  */
object GoldenHashGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "8").getOrCreate()
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    GoldenHashSpec.noOracleQueries.foreach { name =>
      val h = GoldenHash.of(SparkEntry.queries(name)(spark, dir))
      println(s"""    "$name" -> "$h",""")
    }
    spark.stop()
  }
}

/** Pin generator for [[VerifyChecks.pins]]: hashes every no-oracle query
  * at the EXACT session config Verify runs under (GraftSession.local()),
  * per scale factor, and prints the `pins` map body to paste into
  * VerifyChecks.scala. Same review discipline as GoldenHashGen: re-pin
  * only after reviewing the output change, never to green a red check.
  */
object VerifyPinGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    dirs.foreach { dir =>
      val sfName = new java.io.File(dir).getName
      println(s"""    "$sfName" -> Map(""")
      GoldenHashSpec.noOracleQueries.foreach { name =>
        val h = GoldenHash.of(SparkEntry.queries(name)(spark, dir))
        println(s"""      "$name" -> "$h",""")
      }
      println("    ),")
    }
    spark.stop()
  }
}
