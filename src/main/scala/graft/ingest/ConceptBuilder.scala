package graft.ingest

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

import graft.domain.Model.{ConceptRow, FragmentRow, UnitizedSegment}
import graft.functions.{Chunker, Hashing}

/** G2 — UnitizedSegments → Concepts + Fragments
  * (ingestion/concept_builder.py:26-241).
  *
  * Groups a document's unitized segments by unit_id in first-appearance
  * order; orphan (unit-less) segments form one trailing concept whose text
  * is re-chunked at 1500/0 while non-text orphans stay atomic. All ids are
  * deterministic md5 derivations, so re-running ingest on the same input is
  * a no-op at the storage layer.
  */
object ConceptBuilder {

  final case class Built(concepts: Seq[ConceptRow], fragments: Seq[FragmentRow])

  private val orphanChunker = new Chunker(chunkSize = 1500, chunkOverlap = 0)

  def build(documentId: String, unitized: Seq[UnitizedSegment]): Built = {
    val unitGroups = new LinkedHashMap[String, ArrayBuffer[UnitizedSegment]]
    val orphans = new ArrayBuffer[UnitizedSegment]
    unitized.foreach { u =>
      u.unitId match {
        case Some(id) => unitGroups.getOrElseUpdate(id, new ArrayBuffer) += u
        case None => orphans += u
      }
    }

    val concepts = new ArrayBuffer[ConceptRow]
    val fragments = new ArrayBuffer[FragmentRow]
    var order = 0

    unitGroups.foreach { case (unitId, segs) =>
      // document-scoped concept id (concept_builder.py:92-94)
      val conceptId = Hashing.conceptId(documentId, unitId)
      concepts += ConceptRow(conceptId, documentId, order, "",
        Map("unit_type" -> "semantic_unit", "original_unit_id" -> unitId))
      segs.zipWithIndex.foreach { case (u, idx) =>
        fragments += fragment(conceptId, documentId, u, idx)
      }
      order += 1
    }

    if (orphans.nonEmpty) {
      // orphan concept id from the first-5 orphan content heads (:130-133)
      val orphanContent = orphans.take(5)
        .map(u => Hashing.takeCodePoints(u.content, 100)).mkString
      val conceptId =
        s"${documentId.take(8)}-orphans-${Hashing.md5Hex(orphanContent).take(8)}"
      concepts += ConceptRow(conceptId, documentId, order, "",
        Map("unit_type" -> "orphans"))

      val (textSegs, nonTextSegs) = orphans.partition(_.kind == "text")
      var idx = 0
      if (textSegs.nonEmpty) {
        // chunk text orphans together for embedding quality (:149-177)
        val combined = textSegs.map(_.content).mkString("\n\n")
        val page = textSegs.head.page
        orphanChunker.chunk(combined).foreach { chunk =>
          val synthetic = UnitizedSegment(documentId, None, "chunked_text",
            "text", chunk, None, idx, page)
          fragments += fragment(conceptId, documentId, synthetic, idx)
          idx += 1
        }
      }
      nonTextSegs.foreach { u =>
        fragments += fragment(conceptId, documentId, u, idx)
        idx += 1
      }
    }

    Built(concepts.toSeq, fragments.toSeq)
  }

  private def fragment(conceptId: String, documentId: String,
      u: UnitizedSegment, order: Int): FragmentRow =
    FragmentRow(
      id = Hashing.fragmentId(conceptId, order, u.content),
      concept_id = conceptId,
      document_id = documentId,
      content = u.content,
      view = kindToView(u.kind),
      language = u.language,
      order = order,
      unit_role = u.role,
      page = u.page)

  /** concept_builder.py:233-241 — unknown kinds default to text. */
  def kindToView(kind: String): String = kind match {
    case "text" | "code" | "image" => kind
    case _ => "text"
  }
}
