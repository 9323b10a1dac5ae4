package graft.ingest

import graft.domain.Model.{FragmentRow, ParentRow}

/** G5 — parent-context synthesis (api/use_cases/ingest.py:282-318).
  *
  * Per concept: sort fragments by (view priority, order) with
  * text < code < image < table < figure (T5), wrap code in ``` fences,
  * join with blank lines, truncate to the context limit (default 2000).
  * In the DataFrame pipeline this runs after a `groupBy(concept_id)` +
  * `collect_list` — per-concept data is tiny, so the Scala sort/join is
  * cheap and the agg itself is a partial hash agg.
  */
object ParentSynthesis {

  val DefaultContextLimit = 2000

  private val viewOrder: Map[String, Int] =
    Map("text" -> 0, "code" -> 1, "image" -> 2, "table" -> 3, "figure" -> 4)

  def synthesize(conceptId: String, documentId: String, conceptOrder: Int,
      fragments: Seq[FragmentRow],
      contextLimit: Int = DefaultContextLimit): ParentRow = {
    val content = synthesizeContent(fragments, contextLimit)
    ParentRow(conceptId, documentId, conceptOrder, content)
  }

  def synthesizeContent(fragments: Seq[FragmentRow],
      contextLimit: Int = DefaultContextLimit): String = {
    if (fragments.isEmpty) return ""
    val sorted = fragments.sortBy(f => (viewOrder.getOrElse(f.view, 99), f.order))
    val parts = sorted.map { f =>
      if (f.view == "code") s"```${f.language.getOrElse("")}\n${f.content}\n```"
      else f.content
    }
    // Python's [:limit] slices code points; take() would split a surrogate
    // pair and truncate differently for any supplementary-plane char.
    graft.functions.Hashing.takeCodePoints(parts.mkString("\n\n"), contextLimit)
  }
}
