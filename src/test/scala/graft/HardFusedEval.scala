package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.search.{FusionGate, Hnsw, VectorSearch}

/** The hard-adversarial corpus (p9's 45 target⊕confuser blends) run
  * through the PRODUCTION serving contract (VERDICT r12 task 5): v16's
  * RRF fusion (k0 = 60, top-C candidate lists) of the x22 BM25 lexical
  * retriever with the HNSW dense retriever at the v22 operating knob
  * (ef = 64). Shared by [[HardRecallGen]] (the SCALE.md table) and
  * [[HardFusedRecallSpec]] (the golden-pinned fused pass count).
  *
  * Deterministic end-to-end: the corpus derives from fragment-id order,
  * the embedder is TokenHashEmbedder, HNSW build/walk is seeded, BM25 is
  * exact arithmetic, and every rank tie breaks on id.
  */
object HardFusedEval {

  /** Prints the production-path scores for pin generation / SCALE.md. */
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      Seq("hard", "std").foreach { kind =>
        val r = run(spark, dir, corpusKind = kind)
        println(f"HARDFUSED $dir $kind gated=${r.gated.pass}/${r.gated.n} " +
          f"r10=${r.gated.recall10}%.3f mrr=${r.gated.mrr}%.3f " +
          s"floor=${r.floor} gatedOn=${r.nGatedOn} | " +
          f"fused=${r.fused.pass} " +
          f"r10=${r.fused.recall10}%.3f mrr=${r.fused.mrr}%.3f | " +
          f"hnsw64=${r.hnsw.pass} r10=${r.hnsw.recall10}%.3f " +
          f"mrr=${r.hnsw.mrr}%.3f | bm25=${r.bm25.pass} " +
          f"r10=${r.bm25.recall10}%.3f mrr=${r.bm25.mrr}%.3f | " +
          f"exact=${r.exactPass}")
      }
      graft.queries.StageCache.release(spark)
    }
    spark.stop()
  }

  final case class Scores(pass: Int, n: Int, recall10: Double, mrr: Double)

  /** `fused` is the neutral-weight RRF (the v16 spec semantics);
    * `gated` is the PRODUCTION path — the same fusion behind the
    * [[graft.search.FusionGate]] lexical-confidence gate, degrading to
    * dense-only when a query's BM25 signal sits below the
    * corpus-calibrated floor. */
  final case class Result(fused: Scores, gated: Scores, hnsw: Scores,
    bm25: Scores, exactPass: Int, floor: Double, nGatedOn: Int)

  def run(spark: org.apache.spark.sql.SparkSession, dir: String,
      ef: Int = 64, c: Int = 30, nQueries: Int = 45,
      corpusKind: String = "hard"): Result = {
    import spark.implicits._
    val (embFull, _) = graft.queries.PipelineQueries.evalTables(spark, dir)
    val emb = embFull.select(col("fragment_id"), col("parent_id"),
      col("content"), col("vector")).cache()
    emb.count()
    val queries = corpusKind match {
      case "hard" => graft.eval.GoldenEval.hardAdversarialCorpus(emb, nQueries)
      case "std" => graft.eval.GoldenEval.adversarialCorpus(emb, nQueries)
      case other => sys.error(s"unknown corpusKind $other")
    }
    val embedder = new graft.embedding.TokenHashEmbedder(256)
    val qvecs: Seq[(String, Array[Float], String)] =
      queries.map(q => (q.queryId, embedder.embedQuery(q.text),
        q.expectParentIds.head))

    val parentOf: Map[String, String] = emb
      .select(col("fragment_id"), col("parent_id"))
      .as[(String, String)].collect().toMap

    // exact truth (recall denominator + the exact-path pass baseline)
    val exact: Map[String, Seq[String]] = qvecs.map { case (qid, v, _) =>
      qid -> VectorSearch.knn(emb, v, 10, tieBreak = "fragment_id")
        .select(col("fragment_id").cast("string")).as[String].collect().toSeq
    }.toMap

    // lexical retriever: x22's BM25 scoring (k1 = 1.2, b = 0.75),
    // driver-side over the small eval corpus — rank-identical to the
    // distributed x22 plan, which computes the same closed formula
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
    def dfOf(t: String): Long = dfMap.getOrElse(t, 0).toLong
    def bm25TopScored(qText: String): Seq[(String, Double)] = {
      val qTerms = qText.toLowerCase.split("[^\\p{L}\\p{N}]+")
        .filter(_.nonEmpty).distinct
      corpus.map { case (id, ts) =>
        val tf = ts.groupBy(identity).view.mapValues(_.size)
        val sc = qTerms.map { t =>
          if (dfOf(t) == 0L) 0.0
          else FusionGate.bm25Term(tf.getOrElse(t, 0).toDouble,
            FusionGate.idf(dfOf(t), nDocs.toLong), ts.length.toLong, avgLen)
        }.sum
        (id, sc)
      }.sortBy { case (id, sc) => (-sc, id) }.take(c)
    }
    val bm25Scored: Map[String, Seq[(String, Double)]] =
      queries.map(q => q.queryId -> bm25TopScored(q.text)).toMap
    val bm25Top30: Map[String, Seq[String]] =
      bm25Scored.view.mapValues(_.map(_._1)).toMap

    // corpus-calibrated lexical-confidence floor + per-query confidence
    // (graft.search.FusionGate — the production gate). Sample in
    // md5(id) order, the production recipe (fusionFloorBuild): an
    // id-prefix sample would calibrate on one ingest-order slice.
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val floor = FusionGate.floorOf(
      corpus.sortBy(c => md5hex(c._1)).take(FusionGate.CalibN)
        .map { case (_, ts) =>
          FusionGate.selfNorm(ts.toSeq, dfOf, nDocs.toLong, avgLen)
        })
    val confOf: Map[String, Double] = queries.map { q =>
      val qTerms = q.text.toLowerCase.split("[^\\p{L}\\p{N}]+")
        .filter(_.nonEmpty).distinct.filter(t => dfOf(t) > 0L)
      val idfSum = qTerms.map(t => FusionGate.idf(dfOf(t), nDocs.toLong)).sum
      q.queryId -> FusionGate.confidence(
        bm25Scored(q.queryId).headOption.map(_._2).getOrElse(0.0), idfSum)
    }.toMap

    // dense retriever: HNSW at the v22 serving knob, one batch job
    val hnswTop30: Map[String, Seq[String]] = Hnsw.searchBatch(emb,
      qvecs.map(q => (q._1, q._2)), c, ef, numShards = 4)
      .orderBy(col("query_id"), col("rank"))
      .select(col("query_id"), col("fragment_id").cast("string"))
      .as[(String, String)].collect().toSeq.groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap

    // v16's fusion contract: RRF k0 = 60 over the two top-C lists, with
    // an optional lexical weight (1.0 = the neutral spec semantics)
    def rrf(a: Seq[String], b: Seq[String], wLex: Double = 1.0)
        : Seq[String] = {
      val sc = mutable.Map.empty[String, Double].withDefaultValue(0.0)
      a.zipWithIndex.foreach { case (id, r) =>
        sc(id) += wLex / (60 + r + 1) }
      b.zipWithIndex.foreach { case (id, r) => sc(id) += 1.0 / (60 + r + 1) }
      sc.toSeq.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    }

    def score(top10: Map[String, Seq[String]]): Scores = {
      val rows = qvecs.map { case (qid, _, expectParent) =>
        val top = top10.getOrElse(qid, Nil).take(10)
        val r = top.toSet.intersect(exact(qid).toSet).size / 10.0
        val rank = top.indexWhere(id =>
          parentOf.get(id).contains(expectParent))
        (r, rank >= 0, if (rank >= 0) 1.0 / (rank + 1) else 0.0)
      }
      val (recalls, passes, rrs) = rows.unzip3
      Scores(passes.count(identity), qvecs.size,
        recalls.sum / recalls.size, rrs.sum / rrs.size)
    }

    val fused = score(qvecs.map { case (qid, _, _) =>
      qid -> rrf(bm25Top30(qid), hnswTop30.getOrElse(qid, Nil))
    }.toMap)
    val gated = score(qvecs.map { case (qid, _, _) =>
      qid -> rrf(bm25Top30(qid), hnswTop30.getOrElse(qid, Nil),
        FusionGate.lexWeight(confOf(qid), floor))
    }.toMap)
    val nGatedOn = qvecs.count { case (qid, _, _) =>
      FusionGate.lexWeight(confOf(qid), floor) > 0.0 }
    val hnswOnly = score(hnswTop30.view.mapValues(_.take(10)).toMap)
    val bm25Only = score(bm25Top30.view.mapValues(_.take(10)).toMap)
    val exactPass = score(exact).pass
    emb.unpersist()
    Result(fused, gated, hnswOnly, bm25Only, exactPass, floor, nGatedOn)
  }
}
