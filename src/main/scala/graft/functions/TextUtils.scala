package graft.functions

import java.util.regex.Pattern

/** Text normalization + code-detection heuristics.
  *
  * Pure functions (no Spark types) so they are unit-testable and usable both
  * inside per-document folds and wrapped as columnar expressions. Semantics
  * mirror the reference byte-for-byte:
  *  - normalize:        shared/text_utils.py:73-88
  *  - splitParagraph:   shared/text_utils.py:90-93
  *  - isCodeBlock:      shared/text_utils.py:95-107
  *  - guessCodeLang:    shared/text_utils.py:109-120
  *  - splitCodeSafely:  shared/text_utils.py:122-149
  *  - mergeOcrLines:    ingestion/parsers/ocr.py:15-100
  *  - normLang:         ingestion/parsers/markdown.py:19-28
  *
  * Regexes use (?U) where the Python originals operate on unicode str, so
  * \s/\d/\w match the same character classes on Korean/fullwidth input.
  */
object TextUtils {

  // Ligature + smart-quote map (shared/text_utils.py:9-19), then
  // fullwidth→halfwidth OCR artifact map (:22-47; the ASCII quote entries
  // there are identity no-ops and are omitted).
  private val ReplacePairs: Seq[(String, String)] = Seq(
    "ﬃ" -> "ffi", "ﬁ" -> "fi", "ﬂ" -> "fl",
    "’" -> "'", "‘" -> "'", "“" -> "\"", "”" -> "\"",
    "–" -> "-", "—" -> "-",
    "（" -> "(", "）" -> ")", "，" -> ",", "：" -> ":",
    "；" -> ";", "｛" -> "{", "｝" -> "}", "［" -> "[",
    "］" -> "]", "．" -> ".", "　" -> " ", "！" -> "!",
    "？" -> "?", "＝" -> "=", "＋" -> "+", "－" -> "-",
    "＊" -> "*", "／" -> "/", "＜" -> "<", "＞" -> ">")

  private val Nbsp = Pattern.compile(" ")
  private val TrailingWs = Pattern.compile("[ \t]+\n")
  private val ManyNewlines = Pattern.compile("\n{3,}")

  // OCR error fixes (shared/text_utils.py:51-61), all MULTILINE.
  private val OcrFixes: Seq[(Pattern, String)] = Seq(
    Pattern.compile("(?mU)(from\\s+[\\w_]+),([\\w_]+)") -> "$1.$2",
    Pattern.compile("(?mU)(import\\s+[\\w_]+),([\\w_]+)") -> "$1.$2",
    Pattern.compile("(?mU)(\\w+)\\s+=\\s+'") -> "$1='",
    Pattern.compile("(?mU)\\s+\\d{1,3}\\s*$") -> "")

  /** Python `str.strip()` parity: Python strips every char whose
    * `isspace()` is true — Unicode spaces INCLUDING NBSP (Zs/Zl/Zp) plus
    * `\x85` — while Java's `trim()` only strips chars ≤ U+0020. Reference
    * code that strips (the chunker's strip_whitespace, eligibility trims)
    * must strip the same set or chunk boundaries/emptiness checks diverge
    * on NBSP-adjacent text.
    */
  def pyIsSpace(c: Char): Boolean =
    Character.isWhitespace(c) || Character.isSpaceChar(c) || c == '\u0085'

  def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && pyIsSpace(s.charAt(i))) i += 1
    while (j > i && pyIsSpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** `.pyStrip` as a drop-in replacement for `.trim` at reference-parity
    * sites (everywhere the Python original calls `.strip()`).
    */
  implicit final class PyStringOps(private val s: String) extends AnyVal {
    def pyStrip: String = TextUtils.pyStrip(s)
  }


  /** Python reads source files in text mode, which converts \r\n and lone
    * \r to \n before any parsing (universal newlines). JVM reads preserve
    * \r, which would defeat every \n-based regex downstream (paragraph
    * split, fences, line merges) — convert at the same boundary.
    */
  def universalNewlines(s: String): String =
    if (s.indexOf('\r') < 0) s
    else s.replace("\r\n", "\n").replace('\r', '\n')

  def normalize(text0: String): String = {
    var text = universalNewlines(text0)
    ReplacePairs.foreach { case (src, dst) => text = text.replace(src, dst) }
    text = Nbsp.matcher(text).replaceAll(" ")
    text = TrailingWs.matcher(text).replaceAll("\n")
    text = ManyNewlines.matcher(text).replaceAll("\n\n")
    OcrFixes.foreach { case (p, r) => text = p.matcher(text).replaceAll(r) }
    text.pyStrip
  }

  private val ParaSplit = Pattern.compile("\n{2,}")

  def splitParagraph(text: String): Seq[String] =
    ParaSplit.split(text).iterator.map(_.pyStrip).filter(_.nonEmpty).toSeq

  // shared/text_utils.py:63-71 — the three sign regexes.
  private val CodeHint = Pattern.compile(
    "(?mU)```|코드\\s+\\d+-\\d+|;\\s*$|\\{\\s*$|^\\s*(def|class|import|from|async|await|try|except|with|for|while|return|lambda|console\\.log|function|const|let|var|=>|export\\s+default|import\\s+.+\\s+from)\\b")
  private val PySigns = Pattern.compile(
    "(?mU)^\\s*(def|class|from|import|try|except|with|async|await|lambda)\\b|:\\s*$")
  private val JsSigns = Pattern.compile(
    "(?mU)^\\s*(function|const|let|var|class|export|import)\\b|=>|;\\s*$|\\{\\s*$")
  private val IndentedLine = Pattern.compile("(?m)^\\s{4,}\\S")

  private def countMatches(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Bare CODE_HINT match (used by caption-tail filtering, X12). */
  def hasCodeHint(s: String): Boolean = CodeHint.matcher(s).find()

  def isCodeBlock(paragraph: String): Boolean = {
    if (paragraph.contains("```")) return true
    if (countMatches(CodeHint, paragraph) >= 1) return true
    if (PySigns.matcher(paragraph).find() || JsSigns.matcher(paragraph).find())
      return true
    val symbols = Seq(";", "{", "}", "=>", "()", "[]", "):")
      .map(t => countOccurrences(paragraph, t)).sum
    if (symbols >= 2) return true
    countMatches(IndentedLine, paragraph) >= 2
  }

  private def countOccurrences(s: String, sub: String): Int = {
    var n = 0; var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }

  private val PyDef = Pattern.compile("(?mU)^\\s*def\\s+")
  private val PyClass = Pattern.compile("(?mU)^\\s*class\\s+\\w+:\\s*$")
  private val JsSemi = Pattern.compile("(?mU);\\s*$")

  def guessCodeLang(paragraph: String): Option[String] = {
    val py = countMatches(PySigns, paragraph)
    val js = countMatches(JsSigns, paragraph)
    if (py >= js && py > 0) return Some("python")
    if (js >= py && js > 0) return Some("javascript")
    if (PyDef.matcher(paragraph).find() || PyClass.matcher(paragraph).find())
      return Some("python")
    if (paragraph.contains("console.log") || paragraph.contains("=>") ||
      JsSemi.matcher(paragraph).find()) return Some("javascript")
    None
  }

  /** Normalize fence language tags (markdown.py:19-28). */
  def normLang(tag: String): Option[String] = {
    val t = Option(tag).map(_.pyStrip.toLowerCase).getOrElse("")
    if (t.isEmpty) None
    else if (Set("py", "python", "python3")(t)) Some("python")
    else if (Set("js", "javascript", "node", "jsx", "ts", "tsx", "typescript")(t))
      Some("javascript")
    else Some(t)
  }

  private val DefClassBoundary = Pattern.compile("(?m)^(?=def\\s+\\w+\\(|class\\s+\\w+:)")

  /** Split code at def/class boundaries; oversize blocks line-packed to
    * maxChars with overlapLines of overlap (text_utils.py:122-149).
    */
  def splitCodeSafely(code: String, maxChars: Int = 900,
      overlapLines: Int = 10): Seq[String] = {
    val blocks = DefClassBoundary.split(code)
    val chunks = Seq.newBuilder[String]
    for (block <- blocks) {
      if (Hashing.lengthCodePoints(block) <= maxChars) {
        if (block.pyStrip.nonEmpty) chunks += block
      } else {
        // python splitlines() drops the trailing empty piece; split("\n",-1)
        // keeps it, so mirror splitlines via the default split limit
        val lines = block.split("\n", -1).toIndexedSeq match {
          case ls if ls.nonEmpty && ls.last.isEmpty => ls.init
          case ls => ls
        }
        var start = 0
        while (start < lines.length) {
          var acc = 0
          var i = start
          val current = Seq.newBuilder[String]
          var count = 0
          while (i < lines.length &&
            acc + Hashing.lengthCodePoints(lines(i)) + 1 <= maxChars) {
            current += lines(i)
            acc += Hashing.lengthCodePoints(lines(i)) + 1
            i += 1; count += 1
          }
          val cur =
            if (count == 0) {
              i = start + 1
              Seq(Hashing.takeCodePoints(lines(start), maxChars))
            }
            else current.result()
          val chunk = cur.mkString("\n").pyStrip
          if (chunk.nonEmpty) chunks += chunk
          var nextStart = math.max(0, i - overlapLines)
          if (nextStart <= start) nextStart = i
          start = nextStart
        }
      }
    }
    chunks.result()
  }

  // ---- OCR line merge (ocr.py:15-100) ----

  private val OcrCodePatterns = Seq(
    "^코드\\s+\\d+-\\d+", "^(from|import)\\s+\\w+", "^(def|class|async)\\s+\\w+",
    "^\\s*(if|for|while|try|with)\\s+.*:$", "^(const|let|var|function)\\s+",
    "[{}\\[\\]();]=", "^\\s*#\\s*\\w+").map(p => Pattern.compile("(?U)" + p))

  def looksLikeCode(line: String): Boolean =
    OcrCodePatterns.exists(_.matcher(line).find())

  private val NumberedHeading = Pattern.compile("(?U)^[\\d.]+\\s+\\S")

  def looksLikeHeading(line: String): Boolean = {
    if (NumberedHeading.matcher(line).lookingAt() &&
      Hashing.lengthCodePoints(line) < 100) return true
    // python str.isupper(): at least one cased char and no lowercase
    val hasCased = line.exists(c => c.isUpper || c.isLower)
    if (hasCased && !line.exists(_.isLower) &&
      Hashing.lengthCodePoints(line) < 50) return true
    line.startsWith("#")
  }

  private val AnyNewlines = Pattern.compile("\n+")

  /** Merge short OCR lines into >= minParagraphLen paragraphs; code-ish and
    * heading-ish lines are hard breaks.
    */
  def mergeOcrLines(raw: String, minParagraphLen: Int = 150): String = {
    val lines = AnyNewlines.split(raw)
    val out = Seq.newBuilder[String]
    var buffer = Vector.empty[String]
    for (line0 <- lines) {
      val line = line0.pyStrip
      if (line.nonEmpty) {
        if (looksLikeCode(line) || looksLikeHeading(line)) {
          if (buffer.nonEmpty) { out += buffer.mkString(" "); buffer = Vector.empty }
          out += line
        } else if (Hashing.lengthCodePoints(line) >= minParagraphLen) {
          buffer :+= line
          out += buffer.mkString(" ")
          buffer = Vector.empty
        } else {
          buffer :+= line
          if (Hashing.lengthCodePoints(buffer.mkString(" ")) >= minParagraphLen) {
            out += buffer.mkString(" "); buffer = Vector.empty
          }
        }
      }
    }
    if (buffer.nonEmpty) out += buffer.mkString(" ")
    out.result().mkString("\n\n")
  }

  /** NFKD → ascii → strip non-word → dash-join lowercase
    * (shared/hashing.py:28-39).
    */
  def slugify(s: String): String = {
    val nfkd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
    val ascii = nfkd.filter(_ < 128)
    val cleaned = ascii.replaceAll("[^\\w\\s-]", "").pyStrip.toLowerCase
    // single regex substitution like the reference (re.sub(r"[-\s]+","-")) —
    // keeps boundary hyphen runs (e.g. "- Overview" → "-overview")
    cleaned.replaceAll("[-\\s]+", "-")
  }

  /** Any Hangul syllable present (generation/pipeline.py:118-129). */
  def isKorean(s: String): Boolean = s.exists(c => c >= '가' && c <= '힣')
}
