package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.search.{Ann, Hnsw, Ivf, VectorSearch}

/** Generates the SCALE.md "filtered ANN" table (VERDICT r8 task #1): each
  * index family answering FILTERED queries (metadata predicate inside the
  * index scan) at selectivities {0.5, 0.1, 0.01}, scored as recall@10 vs
  * the exact filtered scan plus fill (did k fill?) and the scanned-row
  * fraction the probe paid. Same eval corpus and hard adversarial
  * queries as HardRecallGen; eligibility is a deterministic hash bucket
  * of the fragment id (uncorrelated with geometry — the worst case for
  * probe pruning, since eligible rows spread uniformly across lists).
  * Deterministic end to end. Not a spec — numbers land in SCALE.md; the
  * exactness contracts are pinned in FilteredAnnSpec.
  */
object FilteredRecallGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val (embFull, _) = graft.queries.PipelineQueries.evalTables(spark, dir)
    val emb = embFull.select(col("fragment_id"), col("vector")).cache()
    val n = emb.count()
    val queries = graft.eval.GoldenEval.hardAdversarialCorpus(embFull, 15)
    val embedder = new graft.embedding.TokenHashEmbedder(256)
    val qvecs: Seq[(String, Array[Float])] =
      queries.map(q => (q.queryId, embedder.embedQuery(q.text)))

    val sample = emb.orderBy(col("fragment_id")).limit(1024)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val dim = sample.head.length

    val planes = Ann.makePlanes(dim, numPlanes = 6)
    val lshIndex = Ann.buildIndex(emb, planes).cache()
    val ivfQ = Ivf.train(sample, k = 16, iters = 10)
    val ivfIndex = Ivf.buildIndex(emb, ivfQ).cache()
    val adj = Hnsw.buildIndexTable(emb, numShards = 4).cache()

    def ids(df: DataFrame): Seq[String] =
      df.select(col("fragment_id").cast("string")).as[String].collect().toSeq

    // selectivity σ as a deterministic id-hash bucket: pct of 100
    def predOf(pct: Int): Column =
      pmod(hash(col("fragment_id")), lit(100)) < pct

    println(s"FILTERED-ANN corpus=$dir n_fragments=$n dim=$dim queries=15")
    println("| family | config | selectivity | recall@10 vs exact filtered " +
      "| fill | scan fraction |")
    println("|---|---|---|---|---|---|")

    Seq(50, 10, 1).foreach { pct =>
      val pred = predOf(pct)
      val eligibleN = emb.filter(pred).count()
      val exact: Map[String, Seq[String]] = qvecs.map { case (qid, v) =>
        qid -> ids(VectorSearch.knn(emb.filter(pred), v, 10,
          tieBreak = "fragment_id"))
      }.toMap
      val sigma = pct / 100.0

      final case class Fam(name: String, config: String,
        run: Array[Float] => (Seq[String], Double))
      val fams = Seq(
        Fam("exact-prefilter", "pushdown scan", v =>
          (ids(VectorSearch.knn(emb.filter(pred), v, 10,
            tieBreak = "fragment_id")), sigma)),
        Fam("lsh", "6 planes, depth 1", v => {
          val qb = Ann.bucketOf(v, planes)
          val buckets = Ann.probeBuckets(qb, planes, 1)
          val scanned = lshIndex
            .filter(col("bucket").isin(buckets: _*)).count()
          (ids(Ann.search(lshIndex, v, planes, 10, probeDepth = 1,
            predicate = Some(pred))), scanned.toDouble / n)
        }),
        Fam("ivf", "k=16, nprobe 2", v => {
          val lists = Ivf.nearestLists(v, ivfQ, 2)
          val scanned = ivfIndex
            .filter(col("list_id").isin(lists: _*)).count()
          (ids(Ivf.search(ivfIndex, v, ivfQ, 10, nprobe = 2,
            predicate = Some(pred))), scanned.toDouble / n)
        }),
        Fam("ivf-adaptive", "start 1, fill 2k", v => {
          val a = Ivf.searchFilteredAdaptive(ivfIndex, v, ivfQ, 10,
            pred, nprobe = 1, fillFactor = 2)
          val lists = Ivf.nearestLists(v, ivfQ, a.nprobeUsed)
          val scanned = ivfIndex
            .filter(col("list_id").isin(lists: _*)).count()
          (ids(a.hits), scanned.toDouble / n)
        }),
        Fam("post-filter", "overfetch 4x", v =>
          (ids(VectorSearch.postFilterKnn(emb, v, 10, pred,
            overFetch = 4)), 1.0)))

      fams.foreach { f =>
        val (recalls, fills, scans) = qvecs.map { case (qid, v) =>
          val (top, scan) = f.run(v)
          val t = exact(qid)
          val r =
            if (t.isEmpty) 1.0
            else top.toSet.intersect(t.toSet).size.toDouble / t.size
          (r, top.size.toDouble / math.min(10L, math.max(eligibleN, 1L)),
            scan)
        }.unzip3
        println(f"| ${f.name} | ${f.config} | $sigma%.2f " +
          f"| ${recalls.sum / recalls.size}%.3f " +
          f"| ${fills.sum / fills.size}%.2f " +
          f"| ${scans.sum / scans.size}%.3f |")
      }

      // HNSW filtered walk: one distributed batch per (σ, ef)
      val meta = emb.select(col("fragment_id").as("__fid"),
        pred.as("__ok"))
      Seq(48, 128).foreach { ef =>
        val hits = Hnsw.searchIndex(
            adj.join(meta, col("fragment_id") === col("__fid"), "left"),
            qvecs, 10, ef, predicate = Some(col("__ok")))
          .select(col("query_id"), col("fragment_id").cast("string"))
          .as[(String, String)].collect().groupBy(_._1)
        val (recalls, fills) = qvecs.map { case (qid, _) =>
          val top = hits.getOrElse(qid, Array.empty).map(_._2).toSeq
          val t = exact(qid)
          val r =
            if (t.isEmpty) 1.0
            else top.toSet.intersect(t.toSet).size.toDouble / t.size
          (r, top.size.toDouble / math.min(10L, math.max(eligibleN, 1L)))
        }.unzip
        println(f"| hnsw | 4 shards, ef=$ef | $sigma%.2f " +
          f"| ${recalls.sum / recalls.size}%.3f " +
          f"| ${fills.sum / fills.size}%.2f | (graph walk) |")
      }
    }

    graft.queries.StageCache.release(spark)
    spark.stop()
  }
}
