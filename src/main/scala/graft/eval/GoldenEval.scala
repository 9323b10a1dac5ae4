package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.embedding.{Embedder, TokenHashEmbedder}
import graft.search.VectorSearch

/** Golden-query retrieval-quality harness with the reference's match
  * semantics (api/cli/quality.py:34-100): each query runs a top-k search
  * and passes iff some hit's parent_id is in `expect_parent_ids`, or —
  * fallback mode — some expected token appears in a hit's content or its
  * parent context.
  *
  * Where the reference ships a handwritten eval corpus
  * (eval_queries*.jsonl), this repo's corpus is synthetic, so
  * [[adversarialCorpus]] DERIVES a paraphrase query per target fragment:
  * every second token occurrence is dropped and out-of-corpus scaffold
  * tokens are appended, which caps the query↔fragment token-multiset
  * Jaccard at 0.5 by construction. That makes the eval a genuine
  * non-identity retrieval test (VERDICT r5 task #3) — self-retrieval only
  * proves plumbing.
  */
object GoldenEval {

  final case class GoldenQuery(
      queryId: String,
      text: String,
      expectParentIds: Seq[String],
      expectContains: Seq[String],
      /** token-multiset Jaccard between the query and its target fragment */
      tokenJaccard: Double)

  /** Scaffold words appended to every paraphrase — absent from the
    * synthetic corpus vocabulary, so they only ever shrink the overlap.
    */
  private val Scaffold = Seq("explain", "regarding")

  /** Keep every second token occurrence, append scaffold. Deterministic. */
  def paraphrase(content: String): String = {
    val toks = TokenHashEmbedder.tokenize(content)
    (toks.zipWithIndex.collect { case (t, i) if i % 2 == 0 => t } ++ Scaffold)
      .mkString(" ")
  }

  /** Token-multiset Jaccard: |a ∩ b| / |a ∪ b| over occurrence counts. */
  def multisetJaccard(a: String, b: String): Double = {
    val ca = TokenHashEmbedder.tokenize(a).groupBy(identity).map { case (k, v) => k -> v.size }
    val cb = TokenHashEmbedder.tokenize(b).groupBy(identity).map { case (k, v) => k -> v.size }
    val keys = ca.keySet ++ cb.keySet
    val inter = keys.toSeq.map(k => math.min(ca.getOrElse(k, 0), cb.getOrElse(k, 0))).sum
    val union = keys.toSeq.map(k => math.max(ca.getOrElse(k, 0), cb.getOrElse(k, 0))).sum
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** One paraphrase query per target fragment (first `n` by fragment_id —
    * deterministic), expecting the fragment's parent in the top-k.
    * The driver-side collect is `n` rows (the reference's eval corpus is
    * 45 queries; this is eval tooling, not a data-path operator).
    */
  def adversarialCorpus(embeddings: DataFrame, n: Int): Seq[GoldenQuery] =
    embeddings
      .orderBy(col("fragment_id")).limit(n)
      .select(col("fragment_id"), col("parent_id"), col("content"))
      .collect()
      .map { r =>
        val content = r.getString(2)
        val q = paraphrase(content)
        GoldenQuery(s"gq:${r.getString(0)}", q, Seq(r.getString(1)), Nil,
          multisetJaccard(q, content))
      }.toSeq

  /** HARD adversarial corpus (VERDICT r7 task #4): p6's paraphrase eval
    * saturated at 45/45 — every query was a thinned copy of its target
    * with out-of-vocabulary scaffold, so the target was always the
    * nearest bag-of-words neighbor. These queries blend the target with
    * a CONFUSER fragment from a different parent (a shared-vocabulary
    * distractor — the wrong parent's own words pull the query vector
    * toward it): keep every `targetStride`-th target token but every
    * `confuserStride`-th confuser token. With the confuser keeping more
    * tokens than the target, some queries' top-k fills with the
    * confuser's neighborhood and the target's parent drops out — the
    * headroom that lets exact-vs-ANN differences show. The default is
    * the EVEN blend (half of each side's tokens): measured 26/45 at
    * sf0.001 and 25/45 at sf0.01 on the exact path — far from
    * saturation, far from floor. Deterministic: targets are the first
    * `n` fragments by id, confuser i is the first fragment after
    * position n+i (cyclic) under a different parent.
    */
  def hardAdversarialCorpus(embeddings: DataFrame, n: Int,
      targetStride: Int = 2, confuserStride: Int = 2): Seq[GoldenQuery] = {
    val rows = embeddings
      .orderBy(col("fragment_id")).limit(2 * n)
      .select(col("fragment_id"), col("parent_id"), col("content"))
      .collect()
    val targets = rows.take(n)
    targets.zipWithIndex.map { case (r, i) =>
      val content = r.getString(2)
      val confuser = (0 until rows.length).iterator
        .map(j => rows((n + i + j) % rows.length))
        .find(c => c.getString(1) != r.getString(1))
        .getOrElse(rows((n + i) % rows.length))
      def thin(text: String, stride: Int): Seq[String] =
        TokenHashEmbedder.tokenize(text).zipWithIndex
          .collect { case (t, k) if k % stride == 0 => t }
      val q = (thin(content, targetStride) ++
        thin(confuser.getString(2), confuserStride) ++ Scaffold).mkString(" ")
      GoldenQuery(s"hq:${r.getString(0)}", q, Seq(r.getString(1)), Nil,
        multisetJaccard(q, content))
    }.toSeq
  }

  /** A batch searcher: (embeddings, (query_id, query_vector) rows, k) →
    * hits carrying at least (query_id, rank, similarity, parent_id,
    * content). Default = the exact batch KNN; [[hnswSearcher]] runs the
    * same harness through the graph index instead — the reference's own
    * quality CLI goes through its pgvector HNSW (api/cli/quality.py),
    * so the eval must be runnable over the ANN path too.
    */
  type Searcher = (DataFrame, DataFrame, Int) => DataFrame

  val exactSearcher: Searcher = (emb, qvecs, k) =>
    VectorSearch.batchKnn(emb, qvecs, k)

  /** Search through shard-local HNSW graphs ([[graft.search.Hnsw]]) at
    * the given beam width, re-attaching the metadata columns the match
    * rule needs (the graph answers ids + similarity; parent_id/content
    * join back from the embeddings table by id).
    */
  def hnswSearcher(ef: Int, numShards: Int = 0): Searcher = (emb, qvecs, k) => {
    val s = emb.sparkSession
    import s.implicits._
    val queries = qvecs.select(col("query_id"), col("query_vector"))
      .as[(String, Array[Float])].collect().toSeq
    graft.search.Hnsw.searchBatch(emb, queries, k, ef, numShards = numShards)
      .join(emb.select(col("fragment_id"), col("parent_id"), col("content")),
        Seq("fragment_id"))
  }

  /** Run the corpus as ONE batch search job and apply the reference's
    * match rule. Returns one row per query:
    * (query_id, matched, best_rank, top_similarity, token_jaccard).
    */
  def evaluate(embeddings: DataFrame, parents: DataFrame,
      queries: Seq[GoldenQuery], embedder: Embedder, topK: Int = 10,
      searcher: Searcher = exactSearcher): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    val qvecs = queries.map(q => (q.queryId, q.text))
      .map { case (id, t) => (id, embedder.embedQuery(t)) }
      .toDF("query_id", "query_vector")
    val expect = queries
      .map(q => (q.queryId, q.expectParentIds, q.expectContains, q.tokenJaccard))
      .toDF("query_id", "expect_parent_ids", "expect_contains", "token_jaccard")

    val hits = searcher(embeddings, qvecs, topK)
      .select(col("query_id"), col("rank"), col("similarity"),
        col("parent_id"), col("content"))
      // parent context participates in the contains-match, as in the
      // reference (result.parent_content) — broadcast: parents of the
      // top-k hits only after the join, but the parents table itself is
      // the document-scale side, so join on parent_id normally
      .join(parents.select(col("parent_id"),
        col("content").as("parent_content")), Seq("parent_id"), "left")
      .join(broadcast(expect), Seq("query_id"))
      .withColumn("hit_parent",
        array_contains(col("expect_parent_ids"), col("parent_id")))
      .withColumn("hit_contains",
        exists(col("expect_contains"), t =>
          col("content").contains(t) ||
            coalesce(col("parent_content"), lit("")).contains(t)))
      .withColumn("hit", col("hit_parent") || col("hit_contains"))

    val agg = hits.groupBy(col("query_id"))
      .agg(
        max(col("hit")).as("matched"),
        min(when(col("hit"), col("rank"))).as("best_rank"),
        max(col("similarity")).as("top_similarity"))
    // left-join from the query list: a query with ZERO search hits must
    // still report matched=false — dropping it would make the most
    // reportable failure (nothing retrieved at all) invisible to any
    // consumer that doesn't re-count rows
    expect.select(col("query_id"), col("token_jaccard"))
      .join(agg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("matched"), lit(false)).as("matched"),
        col("best_rank"), col("top_similarity"), col("token_jaccard"))
      .orderBy(col("query_id"))
  }
}
