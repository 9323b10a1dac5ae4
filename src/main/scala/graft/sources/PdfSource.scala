package graft.sources

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.domain.Model.RawSegment
import graft.functions.{Hashing, TextUtils}
import graft.functions.TextUtils.PyStringOps

/** S3/S4/S5/S6 + G4 — the PDF source pipeline
  * (ingestion/parsers/pymupdf_parser.py).
  *
  * The actual PDF byte decoding (PyMuPDF/pdfminer in the reference) sits
  * behind [[PdfExtractor]] with two implementations: [[RealPdfExtractor]]
  * (pure-JVM real-byte codec, PdfCodec.scala) and [[StubPdfExtractor]]
  * (deterministic fake layout format for synthetic corpora). All the
  * logic that MAKES this source a pipeline — per-page block capture,
  * min-length filter (F4), page-bounded adjacent-block merge (G4), code
  * re-detection, the deterministic Vision-OCR invocation policy (S5), and
  * the OCR cache set-difference (S6/U4) — is real and tested.
  *
  * Spark shape: `spark.read.format("binaryFile")` → one extract call per
  * file inside `mapPartitions` (file = unit of parallelism, no shuffle);
  * the OCR cache is a parquet table joined `left_anti` against incoming
  * paths so cached files never re-OCR.
  */
object PdfSource {

  /** One laid-out block from a PDF page (type 0 text / type 1 image). */
  final case class PdfBlock(page: Int, isImage: Boolean, content: String,
      bbox: (Double, Double, Double, Double) = (0, 0, 0, 0))

  trait PdfExtractor extends Serializable {
    def extract(path: String, bytes: Array[Byte]): Seq[PdfBlock]
  }

  /** STUB extractor: bytes are UTF-8 text; pages split on form-feed \f;
    * lines starting "IMG:" are image blocks; other blank-line-separated
    * chunks are text blocks. Replace with a pdfbox/PyMuPDF-backed
    * implementation in a real deployment.
    */
  object StubPdfExtractor extends PdfExtractor {
    def extract(path: String, bytes: Array[Byte]): Seq[PdfBlock] = {
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      text.split("\f", -1).toSeq.zipWithIndex.flatMap { case (pageText, p) =>
        pageText.split("\n{2,}", -1).toSeq.flatMap { chunk =>
          if (chunk.pyStrip.isEmpty) None
          else if (chunk.pyStrip.startsWith("IMG:"))
            Some(PdfBlock(p, isImage = true, chunk.pyStrip.stripPrefix("IMG:").pyStrip))
          else Some(PdfBlock(p, isImage = false, chunk))
        }
      }
    }
  }

  /** S5 — Vision OCR boundary (GeminiVisionOcr in the reference). */
  trait OcrProvider extends Serializable {
    def ocrPage(path: String, page: Int, content: String): Seq[RawSegment]
  }

  val MinTextLength = 10 // F4, pymupdf_parser.py:548

  /** Per-page block capture → RawSegments with the min-length filter (F4)
    * and normalization (pymupdf_parser.py:518-569). Returns segments plus
    * raw text/image block counts (the policy inputs).
    */
  def blocksToSegments(documentId: String, blocks: Seq[PdfBlock])
      : (Seq[RawSegment], Int, Int) = {
    var order = 0
    var nText = 0
    var nImage = 0
    val out = new ArrayBuffer[RawSegment]
    blocks.foreach { b =>
      if (b.isImage) {
        nImage += 1
        out += RawSegment(documentId, "image", b.content, Some("image"),
          order, Some(b.page))
        order += 1
      } else {
        nText += 1
        // code-point length: Python len(text.strip())
        if (Hashing.lengthCodePoints(b.content.pyStrip) >= MinTextLength) {
          val normalized = TextUtils.normalize(b.content)
          out += RawSegment(documentId, "text", normalized, None, order,
            Some(b.page))
          order += 1
        }
      }
    }
    (out.toSeq, nText, nImage)
  }

  /** G4 — page-bounded adjacent text-block merge to ≤ maxMergeChars;
    * code/image blocks are hard boundaries (pymupdf_parser.py:273-389).
    */
  def mergeAdjacentTextBlocks(segments: Seq[RawSegment],
      maxMergeChars: Int = 1500): Seq[RawSegment] = {
    val merged = new ArrayBuffer[RawSegment]
    var buffer = Vector.empty[RawSegment]
    var bufferChars = 0
    var currentPage: Option[Int] = None

    def flush(): Unit = if (buffer.nonEmpty) {
      merged += (if (buffer.length == 1) buffer.head
      else buffer.head.copy(
        content = buffer.map(_.content).mkString("\n\n"), language = None))
      buffer = Vector.empty
      bufferChars = 0
    }

    segments.foreach { seg =>
      if (seg.kind == "text") {
        if (currentPage.isDefined && seg.page != currentPage) flush()
        currentPage = seg.page
        buffer :+= seg
        bufferChars += Hashing.lengthCodePoints(seg.content)
        if (bufferChars >= maxMergeChars) flush()
      } else {
        flush()
        currentPage = None
        merged += seg
      }
    }
    flush()
    merged.toSeq
  }

  /** Code re-detection over merged text blocks
    * (pymupdf_parser.py _detect_code_blocks).
    */
  def detectCodeBlocks(segments: Seq[RawSegment]): Seq[RawSegment] =
    segments.map { s =>
      if (s.kind == "text" && TextUtils.isCodeBlock(s.content))
        s.copy(kind = "code", language = TextUtils.guessCodeLang(s.content))
      else s
    }

  // ---- S5 invocation policy (pymupdf_parser.py:675-759) ----

  def isTextSufficient(segments: Seq[RawSegment], minTotalChars: Int = 100,
      minAlphaRatio: Double = 0.3): Boolean = {
    val totalText = segments.filter(_.kind == "text").map(_.content).mkString
    if (Hashing.lengthCodePoints(totalText.pyStrip) < minTotalChars) false
    else {
      // iterate code points like Python: a supplementary-plane letter is
      // one alnum char there, and len() is code points
      val alpha = totalText.codePoints().filter(
        Character.isLetterOrDigit(_)).count().toInt
      alpha.toDouble /
        math.max(1, Hashing.lengthCodePoints(totalText)) >= minAlphaRatio
    }
  }

  private val codePatterns = Seq(
    "\\bdef\\s+\\w+", "\\bclass\\s+\\w+", "\\bimport\\s+\\w+",
    "\\bfrom\\s+\\w+\\s+import", "\\bfunction\\s+\\w+", "\\bconst\\s+\\w+",
    "\\blet\\s+\\w+", "\\bvar\\s+\\w+", "\\basync\\s+", "\\bawait\\s+")
    .map(p => Pattern.compile("(?U)" + p))

  def hasCodePatterns(segments: Seq[RawSegment], minPatterns: Int = 2): Boolean = {
    val allText = segments.filter(_.kind == "text").map(_.content).mkString(" ")
    codePatterns.count(_.matcher(allText).find()) >= minPatterns
  }

  /** Vision fallback ONLY when text is insufficient AND no code patterns. */
  def shouldFallbackToVision(segments: Seq[RawSegment]): Boolean =
    !isTextSufficient(segments) && !hasCodePatterns(segments)

  /** Full per-file PDF parse with the policy gates; `ocr` optional. */
  def parsePdf(documentId: String, path: String, bytes: Array[Byte],
      extractor: PdfExtractor = StubPdfExtractor,
      ocr: Option[OcrProvider] = None): Seq[RawSegment] = {
    val (segments, nText, _) = blocksToSegments(documentId, extractor.extract(path, bytes))
    val mergedSegs = mergeAdjacentTextBlocks(segments)
    if (nText == 0 || (shouldFallbackToVision(mergedSegs) && ocr.isDefined))
      ocr.map(o => o.ocrPage(path, 0, new String(bytes,
        java.nio.charset.StandardCharsets.UTF_8)))
        .getOrElse(detectCodeBlocks(mergedSegs))
    else detectCodeBlocks(mergedSegs)
  }

  /** [[parsePdf]] over PRE-EXTRACTED blocks (no OCR hook): callers that
    * already ran extract() on the same bytes — every p-family query
    * computes its `lossless` witness from one extract and its segments
    * from another — must not decode the file twice (r16: at sf1 the
    * double decode was half the read-side cost of the codec queries;
    * for AES-256 docs it re-ran the deliberately-expensive V5 KDF).
    * Identical output to `parsePdf(…, ocr = None)` by construction:
    * with no OCR provider both nText = 0 and the vision-fallback branch
    * degrade to `detectCodeBlocks(merged)`. */
  def parseBlocks(documentId: String, blocks: Seq[PdfBlock])
      : Seq[RawSegment] = {
    val (segments, _, _) = blocksToSegments(documentId, blocks)
    detectCodeBlocks(mergeAdjacentTextBlocks(segments))
  }

  // ---- S7 — distributed directory scan ----

  /** Read a directory/glob of source files as [[DocInput]]s via Spark's
    * `binaryFile` source: one row per file, file = unit of parallelism,
    * no shuffle — the S3 scan shape at cluster scale. `.pdf` bytes ride
    * the Latin-1 carrier (see [[graft.ingest.IngestPipeline.DocInput]])
    * and decode through [[RealPdfExtractor]] inside the ingest fold;
    * everything else is UTF-8 text. Feed straight into
    * `IngestPipeline.process`.
    */
  def readDocuments(spark: org.apache.spark.sql.SparkSession,
      pathGlob: String): Dataset[graft.ingest.IngestPipeline.DocInput] = {
    import spark.implicits._
    import java.nio.charset.StandardCharsets
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val text =
          if (path.endsWith(".pdf")) new String(bytes, StandardCharsets.ISO_8859_1)
          else new String(bytes, StandardCharsets.UTF_8)
        graft.ingest.IngestPipeline.DocInput(path, text, isOcr = false)
      }
  }

  // ---- S6/U4 — OCR cache as a table + left-anti join ----

  /** Split incoming file paths into (cached hits, misses) against an OCR
    * cache table keyed by `source_path` — misses run OCR, hits reuse
    * cached segments; new results union back into the cache
    * (pymupdf_parser.py:407-421, 825-878, re-expressed as set algebra).
    */
  def splitByCache(incoming: DataFrame, cache: DataFrame)
      : (DataFrame, DataFrame) = {
    val hits = incoming.join(cache.select("source_path").distinct(),
      Seq("source_path"), "left_semi")
    val misses = incoming.join(cache.select("source_path").distinct(),
      Seq("source_path"), "left_anti")
    (hits, misses)
  }
}
