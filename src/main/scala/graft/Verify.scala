package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Queries with no
  * DuckDB oracle additionally get a real verdict in checks.json
  * ([[VerifyChecks]] — self predicates + reviewed golden pins at this
  * session config), so no row of the round's correctness ledger is ever
  * just "no oracle". */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional names after the two dirs restrict the dump (dev loop:
    // oracle-check one new query without re-running the whole catalog)
    val only = args.drop(2).toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    val oracles =
      if (only.isEmpty) SparkEntry.oracleSql
      else SparkEntry.oracleSql.filter { case (n, _) => only(n) }
    val sfName = new java.io.File(sfDir).getName
    val sfPins = VerifyChecks.pins.getOrElse(sfName, Map.empty)
    // name -> (check kind, passed, detail); built as queries dump
    val checks = scala.collection.mutable.Map.empty[String, (String, Boolean, String)]
    selected.foreach { case (name, fn) =>
      // one retry: a transient executor hiccup (GC pause, broadcast
      // timeout) must not zero a query's correctness for the round —
      // queries are deterministic, so a retry changes nothing but luck
      def dump(): Unit = fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      var dumped = true
      try dump()
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed (retrying): ${e.getMessage}")
        try dump()
        catch { case e2: Throwable =>
          dumped = false
          System.err.println(s"[verify] $name failed: ${e2.getMessage}")
        }
      }
      if (!oracles.contains(name)) {
        // verify the WRITTEN parquet (what the driver reads), not the
        // in-memory plan: a write bug must fail the check too. A FAILED
        // dump must fail the check outright — outDir may hold a prior
        // run's parquet for this name, and validating that stale output
        // would report a broken query as verified.
        val verdict = if (!dumped)
          (VerifyChecks.kindOf(name), false, "dump failed: no fresh output")
        else try {
          val out = spark.read.parquet(s"$outDir/$name")
          val detail = new StringBuilder
          var passed = true
          VerifyChecks.selfChecks.get(name).foreach { check =>
            val (ok, d) = check(out)
            passed &&= ok
            detail ++= s"self[$d]"
          }
          sfPins.get(name) match {
            case Some(pin) =>
              val h = GoldenHash.of(out)
              passed &&= h == pin
              if (detail.nonEmpty) detail ++= " "
              detail ++= (if (h == pin) s"golden[pin match $h]"
                          else s"golden[MISMATCH got $h want $pin]")
            case None =>
              if (VerifyChecks.kindOf(name) == "golden") {
                // no pin at this sf and no self predicate: rows>0 is the
                // only evidence — report it honestly as the weaker kind
                val n = out.count()
                passed &&= n > 0
                detail ++= s"rows[$n]"
              }
          }
          // the KIND must state the evidence that actually ran: a
          // golden query at a pinless sf was only row-counted, and a
          // "golden pass" label would overstate it
          val kind =
            if (VerifyChecks.kindOf(name) == "golden" &&
              !sfPins.contains(name)) "rows"
            else VerifyChecks.kindOf(name)
          (kind, passed, detail.toString)
        } catch { case e: Throwable =>
          (VerifyChecks.kindOf(name), false, s"check error: ${e.getMessage}")
        }
        checks(name) = verdict
        if (!verdict._2)
          System.err.println(s"[verify] CHECK FAILED $name: ${verdict._3}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val cpus = spark.sparkContext.defaultParallelism
    val checksJson = (checks.toSeq.sortBy(_._1).map { case (k, (kind, ok, d)) =>
      s"${q(k)}: {${q("check")}: ${q(kind)}, ${q("passed")}: $ok, " +
        s"${q("detail")}: ${q(d)}}"
    } :+ s"${q("_config")}: {${q("sf")}: ${q(sfName)}, ${q("cpus")}: $cpus, " +
      s"${q("shuffle_partitions")}: ${q(
        spark.conf.get("spark.sql.shuffle.partitions"))}}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/checks.json"), checksJson)
    val nFail = checks.count(!_._2._2)
    println(s"[verify] checks: ${checks.size - nFail} pass / $nFail fail " +
      s"(oracle queries: ${oracles.size}, dumped: ${selected.size})")
    spark.stop()
  }
}
