package graft.domain

/** Entity hierarchy of the rebuilt engine.
  *
  * Mirrors the reference's 4-level chain Document → Concept → Fragment →
  * Embedding (reference: domain/entities.py:17-160, docs/DOMAIN_RULES.md:30-56)
  * re-expressed as Spark `Dataset[T]` case classes. All IDs are deterministic
  * md5-derived strings (see [[graft.functions.Hashing]]) so that re-ingest is
  * idempotent and partition-overwrite implements cascade delete
  * (reference: storage/cascade.py:64-160).
  */
object Model {

  /** A parsed block from a source file.
    * Reference: ingestion/models.py:7-21 (RawSegment).
    * kind ∈ {text, code, image, table}; bbox/page only set for PDF blocks.
    */
  final case class RawSegment(
      documentId: String,
      kind: String,
      content: String,
      language: Option[String],
      order: Int,
      page: Option[Int])

  /** A RawSegment with its semantic-unit assignment from the unitizer.
    * Reference: ingestion/models.py:24-37 (UnitizedSegment).
    * role ∈ {pre_text, python, javascript, bridge_text, post_text,
    * text_unit, chunked_text, other}; unitId == None ⇔ role == other.
    */
  final case class UnitizedSegment(
      documentId: String,
      unitId: Option[String],
      role: String,
      kind: String,
      content: String,
      language: Option[String],
      order: Int,
      page: Option[Int])

  /** Reference: domain/entities.py:17-35. id = md5(sourcePath). */
  final case class DocumentRow(
      id: String,
      source_path: String,
      metadata: Map[String, String],
      created_at: java.sql.Timestamp)

  /** Reference: domain/entities.py:38-67. "Semantic Parent" of fragments;
    * id = md5(documentId + "|" + unitId).take(16).
    */
  final case class ConceptRow(
      id: String,
      document_id: String,
      order: Int,
      content: String,
      metadata: Map[String, String])

  /** The search/embedding unit. Reference: domain/entities.py:70-128.
    * view ∈ {text, code, image, table, figure, caption}
    * (domain/value_objects.py:10-22 — an attribute, never an entity,
    * per FRAG-VIEW-001).
    */
  final case class FragmentRow(
      id: String,
      concept_id: String,
      document_id: String,
      content: String,
      view: String,
      language: Option[String],
      order: Int,
      unit_role: String,
      page: Option[Int])

  /** Reference: domain/entities.py:131-160.
    * doc_id = "doc:" + md5(parent_id|view|lang|content)
    * (value_objects.py:35-66, shared/hashing.py:10-25).
    */
  final case class EmbeddingRow(
      doc_id: String,
      fragment_id: String,
      parent_id: String,
      document_id: String,
      view: String,
      lang: Option[String],
      content: String,
      vector: Array[Float])

  /** Synthesized parent context document. Reference:
    * api/use_cases/ingest.py:282-318, storage/parent_store.py:34-63.
    */
  final case class ParentRow(
      parent_id: String,
      document_id: String,
      order: Int,
      content: String)

  /** Query-side: one search hit. Reference: retrieval/search.py:22-42. */
  final case class SearchHit(
      fragment_id: String,
      parent_id: String,
      view: String,
      language: Option[String],
      content: String,
      similarity: Double)
}
