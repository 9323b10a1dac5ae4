package graft

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row}

/** Canonical content hash for a query result, mirroring the driver's
  * oracle compare (sort columns by name, then rows by rendered value) so a
  * pinned hash is a full regression oracle for queries with no DuckDB
  * analog (GoldenHashSpec). Floats render at 6 decimal places: same
  * config + same data is bitwise-deterministic, the rounding only guards
  * against last-ulp noise ever mattering.
  */
object GoldenHash {

  def render(v: Any): String = v match {
    case null => "\\N"
    case d: Double => String.format(Locale.ROOT, "%.6f", Double.box(d))
    case f: Float => String.format(Locale.ROOT, "%.6f", Double.box(f.toDouble))
    case b: Array[Byte] => b.map(x => String.format("%02x", Byte.box(x))).mkString
    case s: scala.collection.Seq[_] => s.map(render).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => render(k) + ":" + render(x) }
        .sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(render).mkString("(", ",", ")")
    case x => x.toString
  }

  def of(df: DataFrame): String = {
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(render).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(cols.mkString("|").getBytes("UTF-8"))
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map(b => String.format("%02x", Byte.box(b))).mkString
  }
}

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
