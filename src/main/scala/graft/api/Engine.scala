package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.domain.Model._
import graft.embedding.Embedder
import graft.ingest.IngestPipeline
import graft.ingest.IngestPipeline.DocInput
import graft.search.VectorSearch

/** The user-facing engine — mirrors the reference's use-case layer
  * (api/use_cases/{ingest,search,rag}.py): a reference user's entry points,
  * re-expressed over Spark Datasets.
  *
  * Query lifecycle (§3.1): driver-side query embedding + rule-based filter
  * extraction → ONE distributed job (filter → score → top-k → dedupe →
  * parent broadcast join) → ≤ k rows collected. Ingest lifecycle (§3.2):
  * one narrow stage per document, then idempotent table writes.
  */
final class Engine(
    val spark: SparkSession,
    val embedder: Embedder,
    val selfQuery: SelfQuery = RuleBasedSelfQuery) {

  import spark.implicits._
  import Engine.{GoldenQuery, GoldenResult, IngestResult, Metrics, SearchHitRow}

  // ---- ingest (§3.2) ----


  def ingest(docs: Dataset[DocInput]): IngestResult = {
    val processed = IngestPipeline.process(docs).cache()
    val fragments = IngestPipeline.fragments(processed)
    IngestResult(
      IngestPipeline.documents(processed),
      IngestPipeline.concepts(processed),
      fragments,
      IngestPipeline.parents(processed),
      IngestPipeline.embeddings(fragments, embedder))(
      release = () => { processed.unpersist(); () })
  }

  // ---- search (§3.1) ----

  /** Filtered KNN with over-fetch dedupe and parent-context expansion.
    * `view`/`lang` filters fall back to rule-extracted hints from the
    * query text when not given (the reference's SelfQuery stage, E6).
    */
  def search(embeddings: Dataset[EmbeddingRow], parents: Dataset[ParentRow],
      queryText: String, topK: Int = 10, view: Option[String] = None,
      lang: Option[String] = None, expandContext: Boolean = true,
      applySelfQuery: Boolean = true): Seq[SearchHitRow] = {
    val hints =
      if (applySelfQuery) selfQuery.extract(queryText)
      else SelfQuery.Filters(None, None)
    val qVec = embedder.embedQuery(queryText)
    val hits = VectorSearch.knnDeduped(
      embeddings.toDF(), qVec, topK,
      view = view.orElse(hints.view), lang = lang.orElse(hints.lang))
    val expanded =
      if (expandContext) VectorSearch.expandContext(hits, parents.toDF())
      else hits.withColumn("parent_content", lit(null).cast("string"))
    expanded
      .select(col("fragment_id"), col("parent_id"), col("view"), col("lang"),
        col("content"), col("similarity"), col("parent_content"))
      .as[SearchHitRow]
      .collect().toSeq
  }

  // ---- metrics (A4-A6, storage/metrics.py:38-131) ----


  def metrics(embeddings: Dataset[EmbeddingRow], minLen: Int = 10,
      topK: Int = 10): Metrics = {
    val e = embeddings.cache()
    try metricsImpl(e, minLen, topK)
    finally e.unpersist() // all aggregates collected eagerly — release
  }

  private def metricsImpl(e: Dataset[EmbeddingRow], minLen: Int,
      topK: Int): Metrics = {
    val agg = e.toDF().agg(
      count(lit(1)).as("n"),
      sum(when(col("doc_id").isNull || col("doc_id") === "", 1L).otherwise(0L)).as("m_doc"),
      sum(when(col("parent_id").isNull || col("parent_id") === "", 1L).otherwise(0L)).as("m_parent"),
      sum(when(col("fragment_id").isNull || col("fragment_id") === "", 1L).otherwise(0L)).as("m_frag"),
      sum(when(length(col("content")) < minLen, 1L).otherwise(0L)).as("m_short"))
      .head()
    val dups = e.groupBy("doc_id").count().filter(col("count") > 1).count()
    def dist(c: String) = e.toDF()
      .groupBy(coalesce(col(c), lit("<missing>")).as(c)).count()
      .orderBy(col("count").desc, col(c)).limit(topK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Metrics(agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3),
      agg.getLong(4), dups, dist("view"), dist("lang"))
  }

  // ---- golden-query eval (J5/A9/T3, api/cli/quality.py:34-100) ----



  /** S8 — load a golden-query JSONL corpus (the reference's
    * eval_queries*.jsonl shape: query, view, language, top_k,
    * expect_parent_ids, expect_contains) with an explicit schema — never
    * inferSchema (§1.3).
    */
  def loadGolden(path: String): Seq[GoldenQuery] = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "query STRING, view STRING, language STRING, top_k INT, " +
        "expect_parent_ids ARRAY<STRING>, expect_contains ARRAY<STRING>")
    spark.read.schema(schema).json(path)
      .collect().zipWithIndex.map { case (r, i) =>
        GoldenQuery(
          query_id = s"q$i",
          query = r.getAs[String]("query"),
          view = Option(r.getAs[String]("view")),
          language = Option(r.getAs[String]("language")),
          top_k = Option(r.getAs[Any]("top_k")).map(_.asInstanceOf[Int]).getOrElse(10),
          expect_parent_ids = Option(r.getAs[scala.collection.Seq[String]]("expect_parent_ids"))
            .map(_.toSeq).getOrElse(Nil),
          expect_contains = Option(r.getAs[scala.collection.Seq[String]]("expect_contains"))
            .map(_.toSeq).getOrElse(Nil))
      }.toSeq
  }

  /** All golden queries answered in ONE Spark job (batch KNN + per-query
    * expectation match) instead of the reference's serial per-query loop.
    */
  def evalGolden(embeddings: Dataset[EmbeddingRow],
      parents: Dataset[ParentRow],
      golden: Seq[GoldenQuery]): Seq[GoldenResult] = {
    if (golden.isEmpty) return Nil
    // per-query view/lang filters apply BEFORE ranking (as the reference
    // puts them in the KNN WHERE clause) — filtering after a global top-k
    // would drop constrained queries' relevant hits entirely
    val queries = golden.map(g => (g.query_id, embedder.embedQuery(g.query),
      g.view.orNull, g.language.orNull, VectorSearch.clampTopK(g.top_k),
      g.expect_parent_ids, g.expect_contains))
      .toDF("query_id", "query_vector", "exp_view", "exp_lang", "k",
        "exp_parents", "exp_tokens")
    val scored = embeddings.toDF().join(broadcast(queries))
      .filter(col("exp_view").isNull || col("view") === col("exp_view"))
      .filter(col("exp_lang").isNull || col("lang") === col("exp_lang"))
      .withColumn("similarity",
        VectorSearch.cosine(col("vector"), col("query_vector")))
    // content dedupe per query BEFORE ranking, mirroring the deployed
    // search path (knnDeduped): eval must grade what search returns
    val dedupeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"), col("content"))
      .orderBy(col("similarity").desc, col("fragment_id"))
    val deduped = scored.withColumn("__dup", row_number().over(dedupeW))
      .filter(col("__dup") === 1).drop("__dup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col("fragment_id"))
    val hits = deduped.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= col("k"))
    val expanded = VectorSearch.expandContext(hits, parents.toDF())
    val matched = expanded
      .withColumn("hit_ok",
        array_contains(col("exp_parents"), col("parent_id")) ||
          exists(col("exp_tokens"), t =>
            col("content").contains(t) ||
              coalesce(col("parent_content"), lit("")).contains(t)))
      .groupBy(col("query_id"))
      .agg(max(col("hit_ok")).as("passed"), count(lit(1)).as("n_hits"))
    val byId = matched.collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    golden.map { g =>
      val (p, n) = byId.getOrElse(g.query_id, (false, 0L))
      GoldenResult(g.query_id, p, n)
    }
  }
}

object Engine {
  /** The five entity datasets share one cached fold stage; call [[release]]
    * once they're written/collected to free the executor storage.
    */
  final case class IngestResult(
      documents: Dataset[DocumentRow],
      concepts: Dataset[ConceptRow],
      fragments: Dataset[FragmentRow],
      parents: Dataset[ParentRow],
      embeddings: Dataset[EmbeddingRow])(val release: () => Unit)
  final case class Metrics(
      nEmbeddings: Long, nMissingDocId: Long, nMissingParentId: Long,
      nMissingFragmentId: Long, nShortContent: Long, nDuplicateDocIds: Long,
      viewDistribution: Seq[(String, Long)], langDistribution: Seq[(String, Long)])
  final case class GoldenQuery(query_id: String, query: String,
      view: Option[String], language: Option[String], top_k: Int,
      expect_parent_ids: Seq[String], expect_contains: Seq[String])
  final case class GoldenResult(query_id: String, passed: Boolean,
      n_hits: Long)

  final case class SearchHitRow(
      fragment_id: String, parent_id: String, view: String,
      lang: Option[String], content: String, similarity: Double,
      parent_content: Option[String])
}

/** E6 — query → structured {view, lang} filters. The reference uses an LLM
  * (retrieval/self_query.py); offline builds use this rule-based extractor
  * mirroring its indicator tables (generation/query_optimizer.py:173-236).
  */
trait SelfQuery extends Serializable {
  def extract(query: String): SelfQuery.Filters
}

object SelfQuery {
  final case class Filters(view: Option[String], lang: Option[String])
}

object RuleBasedSelfQuery extends SelfQuery {
  private val codeIndicators = Seq("code", "function", "def ", "클래스",
    "함수", "코드", "method", "snippet", "implementation")
  private val tableIndicators = Seq("table", "표")
  private val imageIndicators = Seq("image", "figure", "diagram", "그림")

  def extract(query: String): SelfQuery.Filters = {
    val q = query.toLowerCase
    val view =
      if (codeIndicators.exists(q.contains)) Some("code")
      else if (tableIndicators.exists(q.contains)) Some("table")
      else if (imageIndicators.exists(q.contains)) Some("image")
      else None
    val lang =
      if (q.contains("python") || q.contains("파이썬")) Some("python")
      else if (q.contains("javascript") || q.contains("js ")) Some("javascript")
      else None
    SelfQuery.Filters(view, lang)
  }
}
