package graft.api

import graft.api.Engine.SearchHitRow

/** E8/G6 — the RAG generation boundary (generation/{prompts,pipeline,
  * client}.py). Strictly driver-side post-processing over the collected
  * top-k (never distributed — k ≤ 10 rows); the LLM call itself sits
  * behind a trait, with a deterministic offline implementation that
  * assembles the same context structure the reference builds
  * (prompts.py:67-133: [Source i] blocks with parent preview ≤ 800 chars,
  * matched content, view/lang label, then citations).
  */
object Generation {

  final case class Turn(question: String, answer: String)

  /** Rolling ≤5-turn history, last-3 rendered (models.py:90-126). */
  final case class History(turns: Vector[Turn] = Vector.empty, maxTurns: Int = 5) {
    def add(t: Turn): History = copy(turns = (turns :+ t).takeRight(maxTurns))
    def rendered(lastN: Int = 3): String =
      turns.takeRight(lastN).map(t => s"Q: ${t.question}\nA: ${t.answer}")
        .mkString("\n\n")
  }

  final case class GeneratedResponse(query: String, answer: String,
      sources: Seq[String], model: String)

  trait Generator extends Serializable {
    def generate(query: String, hits: Seq[SearchHitRow],
        history: History = History()): GeneratedResponse
  }

  /** Builds the reference's context-block prompt structure
    * (prompts.py:67-133) and, being offline, answers with the top source
    * extract — deterministic and testable; a production impl swaps only
    * the final completion call.
    */
  object OfflineGenerator extends Generator {
    val ParentPreviewLimit = 800

    def buildContext(hits: Seq[SearchHitRow]): String =
      hits.zipWithIndex.map { case (h, i) =>
        val preview = h.parent_content.getOrElse("").take(ParentPreviewLimit)
        val label = h.lang.map(l => s"${h.view}/$l").getOrElse(h.view)
        s"[Source ${i + 1}] ($label)\n$preview\n---\n${h.content}"
      }.mkString("\n\n")

    def generate(query: String, hits: Seq[SearchHitRow],
        history: History = History()): GeneratedResponse = {
      val answer =
        if (hits.isEmpty) "No relevant context found."
        else hits.head.content.take(400)
      val sources = hits.map(h => f"${h.fragment_id} (sim=${h.similarity}%.3f)")
      GeneratedResponse(query, answer, sources, "offline-stub")
    }
  }
}
