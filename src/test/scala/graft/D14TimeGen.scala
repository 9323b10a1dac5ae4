package graft

/** Ad-hoc sf0.1 timing for the CDC dedup pair (dev tool, not a spec). */
object D14TimeGen {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    for (q <- Seq("d14_cdc_substring_dedup", "d15_cdc_materialize");
        pass <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(s, "/root/testdata/sf0.1").collect()
      println(f"[time] $q pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
