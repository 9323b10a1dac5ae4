package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.search.{Ann, Hnsw, Ivf, Pq, Sq, VectorSearch}

/** Generates the SCALE.md "hard-corpus recall" table (VERDICT r7 task #4):
  * every ANN index family answering the SAME 45 hard adversarial queries
  * (p9's corpus — even blends of a target and a wrong-parent confuser)
  * over the real eval embeddings at sf0.01, scored two ways:
  *
  *  - recall@10 vs the exact scan's top-10 fragments (index fidelity);
  *  - eval pass rate — target parent in the top-10 (task quality).
  *
  * The v5–v10 catalog queries self-check recall with an easy in-corpus
  * query; this study is the same machinery under load that actually
  * discriminates (exact itself passes only 25/45 here). Deterministic:
  * seeded planes/k-means, fixed corpus order. Not a spec — numbers land
  * in SCALE.md; the monotonicity facts stay pinned in RecallStudySpec.
  */
object HardRecallGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val (embFull, _) = graft.queries.PipelineQueries.evalTables(spark, dir)
    val emb = embFull.select(col("fragment_id"), col("parent_id"),
      col("content"), col("vector")).cache()
    val n = emb.count()
    val queries = graft.eval.GoldenEval.hardAdversarialCorpus(emb, 45)
    val embedder = new graft.embedding.TokenHashEmbedder(256)
    val qvecs: Seq[(String, Array[Float], String)] =
      queries.map(q => (q.queryId, embedder.embedQuery(q.text),
        q.expectParentIds.head))

    val parentOf: Map[String, String] = emb
      .select(col("fragment_id"), col("parent_id"))
      .as[(String, String)].collect().toMap

    val sample = emb.orderBy(col("fragment_id")).limit(1024)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val dim = sample.head.length

    // indexes, built once each (same configs as the v5-v10 queries)
    val planes = Ann.makePlanes(dim, numPlanes = 6)
    val lshIndex = Ann.buildIndex(emb, planes).cache()
    val ivfQ = Ivf.train(sample, k = 16, iters = 10)
    val ivfIndex = Ivf.buildIndex(emb, ivfQ).cache()
    val pqCb = Pq.train(sample, m = 8, ksub = 16)
    val pqIndex = Pq.encode(emb, pqCb).cache()
    val sqCb = Sq.train(sample)
    val sqIndex = Pq.encode(emb, sqCb).cache()
    val ivfpqIndex = Pq.encode(Ivf.buildIndex(emb, ivfQ), pqCb).cache()
    val ivfR2Index = Ivf.buildIndexMultiAssign(emb, ivfQ, replicas = 2).cache()

    def ids(df: DataFrame): Seq[String] =
      df.select(col("fragment_id").cast("string")).as[String].collect().toSeq

    // exact truth per query
    val exact: Map[String, Seq[String]] = qvecs.map { case (qid, v, _) =>
      qid -> ids(VectorSearch.knn(emb, v, 10, tieBreak = "fragment_id"))
    }.toMap

    final case class Fam(name: String, config: String,
      run: Array[Float] => Seq[String])
    val fams = Seq(
      Fam("exact", "full scan", v =>
        ids(VectorSearch.knn(emb, v, 10, tieBreak = "fragment_id"))),
      Fam("lsh", "6 planes, probe depth 1", v =>
        ids(Ann.search(lshIndex, v, planes, 10, probeDepth = 1))),
      Fam("ivf", "k=16, nprobe 2", v =>
        ids(Ivf.search(ivfIndex, v, ivfQ, 10, nprobe = 2))),
      Fam("ivf", "k=16, nprobe 8 (v22 knob)", v =>
        ids(Ivf.search(ivfIndex, v, ivfQ, 10, nprobe = 8))),
      Fam("ivf-r2", "k=16, nprobe 2, 2-assign", v =>
        ids(Ivf.searchMultiAssign(ivfR2Index, v, ivfQ, 10, nprobe = 2))),
      Fam("pq", "m=8 ksub=16, shortlist 50", v =>
        ids(Pq.searchCosine(pqIndex, v, pqCb, 10, shortlist = 50,
          tieBreak = "fragment_id"))),
      Fam("sq", "256 levels, shortlist 50", v =>
        ids(Pq.searchCosine(sqIndex, v, sqCb, 10, shortlist = 50,
          tieBreak = "fragment_id"))),
      Fam("ivfpq", "k=16 nprobe 4, shortlist 50", v =>
        ids(Pq.searchIvfPq(ivfpqIndex, v, ivfQ, pqCb, 10, nprobe = 4,
          shortlist = 50, tieBreak = "fragment_id"))))

    // scoring: recall@10 vs exact (index fidelity), hits@10 = expected
    // parent in the top-10 (task quality), and MRR of the first hit
    // (the v17 metric) — fusion can lift MRR even where hits@10 ties
    def score(name: String, config: String,
        top10: Map[String, Seq[String]]): Unit = {
      val rows = qvecs.map { case (qid, _, expectParent) =>
        val top = top10.getOrElse(qid, Nil).take(10)
        val r = top.toSet.intersect(exact(qid).toSet).size / 10.0
        val rank = top.indexWhere(id =>
          parentOf.get(id).contains(expectParent))
        (r, rank >= 0, if (rank >= 0) 1.0 / (rank + 1) else 0.0)
      }
      val (recalls, passes, rrs) = rows.unzip3
      println(f"| $name | $config | ${recalls.sum / recalls.size}%.3f " +
        f"| ${passes.count(identity)}/45 | ${rrs.sum / rrs.size}%.3f |")
    }

    println(s"HARD-RECALL corpus=$dir n_fragments=$n dim=$dim queries=45")
    println("| family | config | recall@10 vs exact | hits@10 | MRR |")
    println("|---|---|---|---|---|")
    fams.foreach { f =>
      score(f.name, f.config,
        qvecs.map { case (qid, v, _) => qid -> f.run(v) }.toMap)
    }

    // HNSW via the batch path (one job for all queries per ef); keep
    // the ef=48 top-30 candidates for the r9 fusion rows and the ef=64
    // (v22 serving knob) top-30 for the production-path fusion row
    var hnsw48Top30: Map[String, Seq[String]] = Map.empty
    var hnsw64Top30: Map[String, Seq[String]] = Map.empty
    Seq(16, 48, 64).foreach { ef =>
      val hits = Hnsw.searchBatch(emb,
        qvecs.map(q => (q._1, q._2)), 30, ef, numShards = 4)
        .orderBy(col("query_id"), col("rank"))
        .select(col("query_id"), col("fragment_id").cast("string"))
        .as[(String, String)].collect().toSeq.groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
      if (ef == 48) hnsw48Top30 = hits
      if (ef == 64) hnsw64Top30 = hits
      score("hnsw", s"4 shards, ef=$ef" +
        (if (ef == 64) " (v22 knob)" else ""), hits)
    }

    // ---- retrieval-quality lift study (VERDICT r9 task #7): does the
    // production machinery — v16-style BM25 ⊕ dense fusion, and
    // best-of across index families — lift hits@10 / MRR on the hard
    // corpus past any single family? BM25 here is the x22 scoring
    // (k1 = 1.2, b = 0.75) over fragment content, driver-side on the
    // small eval corpus (a study, not a production path — the
    // production fusion is v16Fused's bounded plan).
    val corpus: Seq[(String, Array[String])] = emb
      .select(col("fragment_id"), col("content")).as[(String, String)]
      .collect().toSeq
      .map { case (id, c) =>
        (id, c.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty))
      }
    val nDocs = corpus.size
    val avgLen = corpus.map(_._2.length).sum.toDouble / nDocs
    val dfMap: Map[String, Int] = corpus
      .flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).view.mapValues(_.size).toMap
    def bm25Top(qText: String, c: Int): Seq[String] = {
      val qTerms = qText.toLowerCase.split("[^\\p{L}\\p{N}]+")
        .filter(_.nonEmpty).distinct
      corpus.map { case (id, ts) =>
        val len = ts.length
        val tf = ts.groupBy(identity).view.mapValues(_.size)
        val s = qTerms.map { t =>
          val df = dfMap.getOrElse(t, 0)
          if (df == 0) 0.0
          else {
            val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
            val f = tf.getOrElse(t, 0).toDouble
            idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * len / avgLen))
          }
        }.sum
        (id, s)
      }.sortBy { case (id, s) => (-s, id) }.take(c).map(_._1)
    }
    val vecOf: Map[String, Array[Float]] = emb
      .select(col("fragment_id"), col("vector"))
      .as[(String, Array[Float])].collect().toMap
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    def rrf(a: Seq[String], b: Seq[String]): Seq[String] = {
      val sc = mutable.Map.empty[String, Double].withDefaultValue(0.0)
      a.zipWithIndex.foreach { case (id, r) => sc(id) += 1.0 / (60 + r + 1) }
      b.zipWithIndex.foreach { case (id, r) => sc(id) += 1.0 / (60 + r + 1) }
      sc.toSeq.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    }
    def bestOf(v: Array[Float], cands: Seq[String]): Seq[String] =
      cands.distinct.map(id => (id, cosine(v, vecOf(id))))
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)

    val bm25Top30: Map[String, Seq[String]] =
      queries.map(q => q.queryId -> bm25Top(q.text, 30)).toMap
    val ivfR2Top30: Map[String, Seq[String]] = qvecs.map { case (qid, v, _) =>
      qid -> ids(Ivf.searchMultiAssign(ivfR2Index, v, ivfQ, 30, nprobe = 2))
    }.toMap

    score("bm25", "x22 scoring, k1=1.2 b=0.75",
      bm25Top30.view.mapValues(_.take(10)).toMap)
    score("fused bm25⊕hnsw", "RRF k0=60 over top-30 each",
      qvecs.map { case (qid, _, _) =>
        qid -> rrf(bm25Top30(qid), hnsw48Top30.getOrElse(qid, Nil))
      }.toMap)
    score("fused bm25⊕exact", "RRF k0=60 over top-30 each",
      qvecs.map { case (qid, v, _) =>
        qid -> rrf(bm25Top30(qid),
          ids(VectorSearch.knn(emb, v, 30, tieBreak = "fragment_id")))
      }.toMap)
    // the PRODUCTION serving path (VERDICT r12 task 5): v16's RRF
    // contract fusing the x22 lexical retriever with the dense side at
    // the v22 approximate knob — the combination a user actually
    // deploys. HardFusedRecallSpec golden-pins this row's pass count.
    score("fused bm25⊕hnsw ef=64", "v16 RRF ⊕ v22 knob (production)",
      qvecs.map { case (qid, _, _) =>
        qid -> rrf(bm25Top30(qid), hnsw64Top30.getOrElse(qid, Nil))
      }.toMap)
    score("ivf-r2⊕hnsw best-of", "exact re-rank of candidate union",
      qvecs.map { case (qid, v, _) =>
        qid -> bestOf(v,
          ivfR2Top30(qid) ++ hnsw48Top30.getOrElse(qid, Nil))
      }.toMap)

    graft.queries.StageCache.release(spark)
    spark.stop()
  }
}
