package graft

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

    println(s"HARD-RECALL corpus=$dir n_fragments=$n dim=$dim queries=45")
    println("| family | config | recall@10 vs exact | eval pass |")
    println("|---|---|---|---|")
    fams.foreach { f =>
      val (recalls, passes) = qvecs.map { case (qid, v, expectParent) =>
        val top = f.run(v)
        val r = top.toSet.intersect(exact(qid).toSet).size / 10.0
        val pass = top.exists(id => parentOf.get(id).contains(expectParent))
        (r, pass)
      }.unzip
      println(f"| ${f.name} | ${f.config} | ${recalls.sum / recalls.size}%.3f " +
        f"| ${passes.count(identity)}/45 |")
    }

    // HNSW via the batch path (one job for all queries per ef)
    Seq(16, 48).foreach { ef =>
      val hits = Hnsw.searchBatch(emb,
        qvecs.map(q => (q._1, q._2)), 10, ef, numShards = 4)
        .select(col("query_id"), col("fragment_id").cast("string"))
        .as[(String, String)].collect().groupBy(_._1)
      val (recalls, passes) = qvecs.map { case (qid, _, expectParent) =>
        val top = hits.getOrElse(qid, Array.empty).map(_._2).toSeq
        (top.toSet.intersect(exact(qid).toSet).size / 10.0,
          top.exists(id => parentOf.get(id).contains(expectParent)))
      }.unzip
      println(f"| hnsw | 4 shards, ef=$ef | ${recalls.sum / recalls.size}%.3f " +
        f"| ${passes.count(identity)}/45 |")
    }

    graft.queries.StageCache.release(spark)
    spark.stop()
  }
}
