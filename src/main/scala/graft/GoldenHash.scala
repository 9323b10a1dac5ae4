package graft

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row}

/** Canonical content hash for a query result, mirroring the driver's
  * oracle compare (sort columns by name, then rows by rendered value) so a
  * pinned hash is a full regression oracle for queries with no DuckDB
  * analog (GoldenHashSpec; VerifyChecks). Floats render at 6 decimal
  * places: same config + same data is bitwise-deterministic, the rounding
  * only guards against last-ulp noise ever mattering.
  *
  * Lives in main (not test) scope since round 13: [[Verify]] re-hashes
  * each no-oracle query's dumped output against [[VerifyChecks.pins]] so
  * the driver-facing checks.json carries a real verdict, not "no oracle".
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
