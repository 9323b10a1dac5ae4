package graft

/** Dev instrumentation (Test/runMain graft.HybridLab [n]) — builds a
  * persistent synthetic corpus + lex index under localdata/ and times
  * each lexical serve stage separately with repeats, to attribute the
  * hybrid soak's serve latency. Not part of the test suite.
  */
object HybridLab {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val td = s"localdata/hybridlab$n"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.search.{FusionGate, LexIndex}

    if (!new java.io.File(s"$td/fragments").isDirectory) {
      println(s"[lab] building $n-fragment corpus at $td …")
      val parts = math.max(32, (n / 40000L).toInt)
      val frags = spark.range(0, n, 1, parts)
        .withColumnRenamed("id", "rid")
        .select(
          concat(lit("f"), lpad(col("rid").cast("string"), 9, "0"))
            .as("id"),
          concat(lit("d"), lpad((col("rid") / 10).cast("long")
            .cast("string"), 8, "0")).as("document_id"),
          concat_ws(" ",
            concat_ws(" ", transform(sequence(lit(1), lit(28)), j =>
              concat(lit("w"), pmod(xxhash64(col("rid") * lit(131) + j),
                lit(50000L))))),
            when(pmod(col("rid"), lit(997L)) === 0, lit("needlerare"))
              .otherwise(lit("wfill1")),
            when(pmod(col("rid"), lit(101L)) === 0, lit("needlemid"))
              .otherwise(lit("wfill2")),
            when(pmod(col("rid"), lit(11L)) === 0, lit("needlecommon"))
              .otherwise(lit("wfill3"))).as("content"))
      graft.ingest.IngestPipeline.writeTable(frags, s"$td/fragments")
      println("[lab] building lex index …")
      val t0 = System.nanoTime()
      LexIndex.build(spark, td)
      println(f"[lab] lex build ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val query = spark.read.parquet(s"$td/fragments")
      .filter(col("id") === "f000000042").select(col("content"))
      .head().getString(0)
    val qTerms = query.trim.split("[ \\t\\n\\f\\r]+")
      .filter(_.nonEmpty).distinct.toSeq
    println(s"[lab] |qTerms|=${qTerms.length}")

    def timed(label: String)(f: => Any): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[lab] $label%-28s min=${ts.min}%6.2f s  " +
        f"med=${ts.sorted.apply(reps / 2)}%6.2f s")
    }

    val st = LexIndex.loadStats(td)
    val avgdl = st.sumDl.toDouble / st.n.toDouble
    timed("freshness walk") { LexIndex.requireFresh(st, td) }
    var dfMap: Map[String, Long] = Map.empty
    timed("dfOf") {
      val (m, p) = LexIndex.dfOfPath(spark, td, qTerms)
      dfMap = m
      if (m.isEmpty) sys.error("empty dfMap")
      p
    }
    println(s"[lab] dfOf route=${LexIndex.dfOfPath(spark, td, qTerms)._2}")
    val inC = qTerms.filter(t => dfMap.getOrElse(t, 0L) > 0L)
    val common = inC.filter(t =>
      dfMap(t).toDouble > LexIndex.StopDfFrac * st.n.toDouble)
    val rare = inC.filterNot(common.toSet)
    println(s"[lab] rare=${rare.length} common=${common.length} " +
      common.mkString(","))

    // the bounded route end-to-end
    timed("scoreTopC (path?)") {
      val (r, p) = LexIndex.scoreTopCPath(spark, td, inC, dfMap, st.n,
        avgdl, 30)
      println(s"[lab] scoreTopC route=$p")
      r
    }
    // stage splits: rare-only scoring (the two driver jobs), then the
    // candidate fetch + exact recompute measured as (bounded − rare)
    def rareScoredDf() = {
      val pruned = LexIndex.prunedPostings(spark, td, rare)
      val tfCols = rare.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(0L))
          .as(s"tf_$i")
      }
      val perFrag = pruned.groupBy(col("id"), col("dl"))
        .agg(tfCols.head, tfCols.tail: _*)
      val termScores = rare.zipWithIndex.map { case (t, i) =>
        val idfT = FusionGate.idf(dfMap(t), st.n)
        val tf = col(s"tf_$i").cast("double")
        lit(idfT) * (tf * lit(FusionGate.K1 + 1)) /
          (tf + lit(FusionGate.K1) * (lit(1 - FusionGate.B) +
            lit(FusionGate.B) *
              (col("dl").cast("double") / lit(avgdl))))
      }
      perFrag.select(col("id"), termScores.reduce(_ + _).as("rbm25"))
    }
    var mC = 0.0
    timed("rare top-c job") {
      val topC = rareScoredDf().orderBy(col("rbm25").desc, col("id"))
        .limit(30).as[(String, Double)].collect()
      mC = topC.last._2
      topC
    }
    val ubC = common.map(t => LexIndex.ubOf(dfMap(t), st.n)).sum
    println(f"[lab] mC=$mC%.4f ubC=$ubC%.2e")
    val thr = mC - ubC - LexIndex.BoundSafetyEps
    var candN = 0L
    timed("rare cand-filter job") {
      candN = rareScoredDf().filter(col("rbm25") > thr).select(col("id"))
        .limit(305).as[String].collect().length
    }
    println(s"[lab] cand=$candN (cap 304)")
    // the full fold for contrast (what the bounded route replaced)
    timed("scoreTopC (full fold)") {
      val prunedAll = LexIndex.prunedPostings(spark, td, inC)
      val tfCols = inC.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(0L))
          .as(s"tf_$i")
      }
      val perFrag = prunedAll.groupBy(col("id"), col("dl"))
        .agg(tfCols.head, tfCols.tail: _*)
      val termScores = inC.zipWithIndex.map { case (t, i) =>
        val idfT = FusionGate.idf(dfMap(t), st.n)
        val tf = col(s"tf_$i").cast("double")
        lit(idfT) * (tf * lit(FusionGate.K1 + 1)) /
          (tf + lit(FusionGate.K1) * (lit(1 - FusionGate.B) +
            lit(FusionGate.B) *
              (col("dl").cast("double") / lit(avgdl))))
      }
      perFrag.select(col("id"), termScores.reduce(_ + _).as("bm25"))
        .orderBy(col("bm25").desc, col("id")).limit(30)
        .as[(String, Double)].collect()
    }
    spark.stop()
  }
}
