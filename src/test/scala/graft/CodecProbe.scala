package graft
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.{PdfSource, PdfWriter, RealPdfExtractor}
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(600)
    def bench(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"CODEC $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep (600 docs, driver-side single thread)")
      for (cipher <- Seq("aes256", "rc4", "aes128")) {
        var built: Seq[(Long, Array[Byte], Seq[String])] = null
        bench(s"build_$cipher") {
          built = docs.map { case (id, text) =>
            val paras = text.split("\n{2,}").toSeq
              .map(PdfWriter.sanitize).filter(_.trim.nonEmpty)
            val pages = paras.grouped(6).map(ps => PdfWriter.PageSpec(ps)).toSeq
            (id, PdfWriter.buildEncrypted(pages, compress = id % 2 == 0,
              cipher = cipher), paras)
          }.toSeq
        }
        bench(s"extract_$cipher") {
          built.foreach { case (id, bytes, _) =>
            RealPdfExtractor.extract(s"enc/$id.pdf", bytes) }
        }
        bench(s"parse_$cipher") {
          built.foreach { case (id, bytes, _) =>
            PdfSource.parsePdf(s"enc/$id", s"enc/$id.pdf", bytes,
              RealPdfExtractor) }
        }
      }
    }
    spark.stop()
  }
}
