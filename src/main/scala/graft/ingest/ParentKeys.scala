package graft.ingest

import java.util.regex.Pattern

import graft.functions.TextUtils
import graft.functions.TextUtils.PyStringOps

/** X11/X12/X13 — page/section parent-key assignment, caption augmentation,
  * and header-based parent synthesis (app/parents.py:11-182).
  *
  * The page/section carry-forward is a stateful scan over ONE document's
  * ordered segments — per-document fold in Spark, same as the unitizer
  * (in SQL terms: `last(marker, ignoreNulls) OVER (PARTITION BY doc ORDER
  * BY order)` — a classic window fill; see w4_carry_forward for the
  * columnar twin on the events table).
  */
object ParentKeys {

  val PageRegexDefault = "(?i)^\\s*(?:page|페이지)\\s*([0-9]{1,5})\\b"
  val SectionRegexDefault =
    "^(?:#{1,3}\\s+.+|Chapter\\s+\\d+\\b|제\\s*\\d+\\s*장\\b|\\d+\\.\\d+\\s+.+)"
  private val PageBreak =
    Pattern.compile("(?im)^\\s*-{3,}\\s*Page Break\\s*-{3,}\\s*$")
  private val CaptionLine =
    Pattern.compile("(?i)^(figure|fig\\.|table|그림)\\s*\\d+[:.]?\\s+.+$")

  final case class Keyed(order: Int, view: String, content: String,
      page: Option[String], section: Option[String], parentId: Option[String])

  /** Carry-forward page/section markers over a document's (order, view)-
    * sorted segments; parent key = {base}-p{page}[-s-{section}] per mode
    * (app/parents.py:47-92).
    */
  def assignParents(segments: Seq[(Int, String, String)], sourceName: String,
      parentMode: String = "page_section",
      pageRegex: String = PageRegexDefault,
      sectionRegex: String = SectionRegexDefault): Seq[Keyed] = {
    val pageP = Pattern.compile("(?m)" + pageRegex)
    val sectionP = Pattern.compile("(?m)" + sectionRegex)
    val base = TextUtils.slugify(
      sourceName.split("/").last.replaceAll("\\.[^.]*$", ""))
    var currentPage: Option[String] = None
    var currentSection: Option[String] = None
    var pageCounter = 0

    segments.sortBy { case (order, view, _) => (order, view) }.map {
      case (order, view, text) =>
        val pm = pageP.matcher(text)
        if (pm.find()) currentPage = Some(pm.group(1))
        else if (PageBreak.matcher(text).find()) {
          pageCounter += 1
          currentPage = Some(pageCounter.toString)
        }
        val sm = sectionP.matcher(text)
        if (sm.find()) currentSection = Some(TextUtils.slugify(sm.group(0)))

        val parentId = parentMode match {
          case "page" => currentPage.map(p => s"$base-p$p")
          case "section" => currentSection.map(s0 => s"$base-s-$s0")
          case "page_section" => (currentPage, currentSection) match {
            case (Some(p), Some(s0)) => Some(s"$base-p$p-s-$s0")
            case (Some(p), None) => Some(s"$base-p$p")
            case (None, Some(s0)) => Some(s"$base-s-$s0")
            case _ => None
          }
          case _ => None
        }
        Keyed(order, view, text, currentPage, currentSection, parentId)
    }
  }

  final case class Caption(view: String, content: String)

  /** X12 — caption extraction from text segments: caption-pattern lines
    * plus a ≤160-char non-code tail line; view = table|figure
    * (app/parents.py:110-135). Derived captions union back into the doc
    * stream (U1).
    */
  def extractCaptions(text: String): Seq[Caption] = {
    val lines = text.split("\n", -1)
    lines.zipWithIndex.flatMap { case (line0, i) =>
      val line = line0.pyStrip
      val m = CaptionLine.matcher(line)
      if (!m.matches()) None
      else {
        val prefix = m.group(1).toLowerCase
        val view = if (prefix.contains("table")) "table" else "figure"
        val tail =
          if (i + 1 < lines.length) {
            val nxt = lines(i + 1).pyStrip
            if (nxt.nonEmpty && graft.functions.Hashing.lengthCodePoints(nxt) <= 160 &&
              !nxt.contains("```") &&
              !TextUtils.hasCodeHint(nxt)) "\n" + nxt
            else ""
          } else ""
        Some(Caption(view, line + tail))
      }
    }.toSeq
  }
}
