package graft

import org.apache.spark.sql.functions._

import graft.search.{Hnsw, VectorSearch}

/** Exploratory probe for the v16 score-aware fusion gate (VERDICT r13
  * task 1): per query, prints the lexical-confidence candidates —
  * idf-normalized top-1 BM25 score, idf-weighted term coverage of the
  * top-1 doc, top-list flatness, lex∩dense overlap — against whether the
  * BM25 side actually passes, on BOTH the standard paraphrase corpus
  * (where BM25 is strong) and the hard blended corpus (where it is
  * weak). Output picks the gate signal + floor; not part of `sbt test`.
  */
object FusionGateProbe {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val c = 30

    val (embFull, _) = graft.queries.PipelineQueries.evalTables(spark, dir)
    val emb = embFull.select(col("fragment_id"), col("parent_id"),
      col("content"), col("vector")).cache()
    emb.count()
    val parentOf: Map[String, String] = emb
      .select(col("fragment_id"), col("parent_id"))
      .as[(String, String)].collect().toMap

    val corpus: Seq[(String, Array[String])] = emb
      .select(col("fragment_id"), col("content")).as[(String, String)]
      .collect().toSeq
      .map { case (id, t) =>
        (id, t.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty))
      }
    val nDocs = corpus.size
    val avgLen = corpus.map(_._2.length).sum.toDouble / nDocs
    val dfMap: Map[String, Int] = corpus
      .flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).view.mapValues(_.size).toMap
    def idf(t: String): Double = {
      val df = dfMap.getOrElse(t, 0)
      if (df == 0) 0.0 else math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    }
    def bm25TopScored(qText: String): Seq[(String, Double)] = {
      val qTerms = qText.toLowerCase.split("[^\\p{L}\\p{N}]+")
        .filter(_.nonEmpty).distinct
      corpus.map { case (id, ts) =>
        val len = ts.length
        val tf = ts.groupBy(identity).view.mapValues(_.size)
        val sc = qTerms.map { t =>
          val d = dfMap.getOrElse(t, 0)
          if (d == 0) 0.0
          else {
            val f = tf.getOrElse(t, 0).toDouble
            idf(t) * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * len / avgLen))
          }
        }.sum
        (id, sc)
      }.sortBy { case (id, sc) => (-sc, id) }.take(c)
    }

    val embedder = new graft.embedding.TokenHashEmbedder(256)

    def probe(label: String, queries: Seq[graft.eval.GoldenEval.GoldenQuery])
        : Unit = {
      val qvecs = queries.map(q => (q.queryId, embedder.embedQuery(q.text)))
      val dense: Map[String, Seq[String]] = Hnsw.searchBatch(emb, qvecs,
        c, ef = 64, numShards = 4)
        .orderBy(col("query_id"), col("rank"))
        .select(col("query_id"), col("fragment_id").cast("string"))
        .as[(String, String)].collect().toSeq.groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
      println(s"== $label ==")
      def rrf(a: Seq[String], b: Seq[String], wLex: Double): Seq[String] = {
        val sc = scala.collection.mutable.Map.empty[String, Double]
          .withDefaultValue(0.0)
        a.zipWithIndex.foreach { case (id, r) =>
          sc(id) += wLex / (60 + r + 1) }
        b.zipWithIndex.foreach { case (id, r) => sc(id) += 1.0 / (60 + r + 1) }
        sc.toSeq.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
      }
      queries.foreach { q =>
        val scored = bm25TopScored(q.text)
        val lexIds = scored.map(_._1)
        val qTerms = q.text.toLowerCase.split("[^\\p{L}\\p{N}]+")
          .filter(_.nonEmpty).distinct.filter(t => dfMap.getOrElse(t, 0) > 0)
        val idfSum = qTerms.map(idf).sum
        val top1 = scored.headOption.map(_._2).getOrElse(0.0)
        val norm1 = if (idfSum > 0) top1 / (2.2 * idfSum) else 0.0
        val top1Doc = corpus.find(_._1 == lexIds.head).get._2.toSet
        val cov = if (idfSum > 0)
          qTerms.filter(top1Doc.contains).map(idf).sum / idfSum else 0.0
        val flat = if (top1 > 0) scored.map(_._2).sum / (c * top1) else 1.0
        val ov = lexIds.take(10).toSet
          .intersect(dense.getOrElse(q.queryId, Nil).take(10).toSet).size
        def pass(ids: Seq[String]): Boolean = ids.take(10)
          .exists(id => parentOf.get(id).exists(q.expectParentIds.contains))
        val lexPass = pass(lexIds)
        val densePass = pass(dense.getOrElse(q.queryId, Nil))
        val d = dense.getOrElse(q.queryId, Nil)
        val fusedPasses = Seq(1.0, 0.75, 0.5, 0.25)
          .map(w => pass(rrf(lexIds, d, w))).map(b => if (b) "T" else "F")
          .mkString
        println(f"$label ${q.queryId}%-14s lexPass=$lexPass%-5s " +
          f"densePass=$densePass%-5s fused(1,.75,.5,.25)=$fusedPasses " +
          f"norm1=$norm1%.3f cov=$cov%.3f " +
          f"flat=$flat%.3f ov10=$ov top1=$top1%.2f nq=${qTerms.length}")
      }
    }

    // corpus self-match calibration: what does a TRUE lexical match score
    // in this corpus? Query = each sampled doc's own distinct terms;
    // norm1 of the best candidate bounds what real matches achieve.
    // two variants: corpus-max (top1 over all docs) and SELF-SCORE (the
    // doc scored against its own thinned query — map-side computable at
    // scale, no cross join). If their quantiles agree, ship self-score.
    val (selfNormsMax, selfNormsSelf) = corpus.take(256).map { case (_, ts) =>
      val qTerms = ts.zipWithIndex.collect { case (t, i) if i % 2 == 0 => t }
        .distinct.filter(t => dfMap.getOrElse(t, 0) > 0)
      val idfSum = qTerms.map(idf).sum
      def scoreOf(ds: Array[String]): Double = {
        val len = ds.length
        val tf = ds.groupBy(identity).view.mapValues(_.size)
        qTerms.map { t =>
          val f = tf.getOrElse(t, 0).toDouble
          if (f == 0) 0.0
          else idf(t) * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * len / avgLen))
        }.sum
      }
      val top1 = corpus.map(d => scoreOf(d._2)).max
      val self = scoreOf(ts)
      (if (idfSum > 0) top1 / (2.2 * idfSum) else 0.0,
        if (idfSum > 0) self / (2.2 * idfSum) else 0.0)
    }.unzip
    val selfNorms = selfNormsMax.sorted
    val selfOnly = selfNormsSelf.sorted
    def pctS(p: Double) = selfOnly((p * (selfOnly.size - 1)).round.toInt)
    println(f"SELFSCORE n=${selfOnly.size} min=${selfOnly.head}%.3f " +
      f"med=${pctS(0.5)}%.3f p65=${pctS(0.65)}%.3f p70=${pctS(0.70)}%.3f " +
      f"p75=${pctS(0.75)}%.3f max=${selfOnly.last}%.3f")
    def pct(p: Double) =
      selfNorms((p * (selfNorms.size - 1)).round.toInt)
    println(f"SELFMATCH n=${selfNorms.size} min=${selfNorms.head}%.3f " +
      f"p05=${pct(0.05)}%.3f p10=${pct(0.10)}%.3f p25=${pct(0.25)}%.3f " +
      f"med=${pct(0.5)}%.3f p55=${pct(0.55)}%.3f p60=${pct(0.60)}%.3f " +
      f"p65=${pct(0.65)}%.3f p70=${pct(0.70)}%.3f p75=${pct(0.75)}%.3f " +
      f"p80=${pct(0.80)}%.3f max=${selfNorms.last}%.3f")

    val std = graft.eval.GoldenEval.adversarialCorpus(emb, 45)
    val hard = graft.eval.GoldenEval.hardAdversarialCorpus(emb, 45)
    probe("STD", std)
    probe("HARD", hard)
    emb.unpersist()
    spark.stop()
  }
}
