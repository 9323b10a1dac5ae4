package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.embedding.OfflineEmbedder
import graft.ingest.IngestPipeline
import graft.ingest.IngestPipeline.DocInput

/** The document-intelligence pipeline (SURVEY.md §2.1/§2.8/§2.9) run as
  * catalog queries over the `documents` testdata table, treating each row's
  * text as one source file.
  *
  * These stages (parse → unitize → concepts/fragments → parents → embed)
  * are order-sensitive per-document folds, not SQL — so they carry no
  * DuckDB oracle; the driver records rows>0 and the ScalaTest suite pins
  * their semantics against reference-generated fixtures. The fold lineage
  * itself is narrow (no data-dependent shuffle); the only exchange these
  * catalog queries add is ONE round-robin redistribution of the
  * single-split local parquet input — real corpora arrive as many files
  * and skip it.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private def inputs(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.spread(s, Tables.documents(s, dir)
        .select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .map { case (id, text) => DocInput(s"synthetic/$id.txt", text, isOcr = false) }
  }

  /** One shared ingest fold for p1/p2/p3 (StageCache like the sketch/token
    * stages — at scale the processed entities are written tables, and each
    * downstream query reads them instead of re-running the fold).
    */
  private def processedStage(s: SparkSession, dir: String) = {
    import s.implicits._
    StageCache.getOrCache(s, s"p_processed:$dir") {
      IngestPipeline.process(inputs(s, dir)).toDF()
    }.as[IngestPipeline.ProcessedDoc]
  }

  /** G1+G2 — fragments with hierarchy ids, views, roles. */
  private val p1Fragments: Q = (s, dir) => {
    val processed = processedStage(s, dir)
    IngestPipeline.fragments(processed).toDF()
      .select(col("document_id"), col("id").as("fragment_id"),
        col("concept_id"), col("view"), col("order"), col("unit_role"),
        length(col("content")).as("content_len"))
      .orderBy(col("document_id"), col("concept_id"), col("order"))
  }

  /** G5 — synthesized parent contexts. */
  private val p2Parents: Q = (s, dir) => {
    val processed = processedStage(s, dir)
    IngestPipeline.parents(processed).toDF()
      .select(col("parent_id"), col("document_id"), col("order"),
        length(col("content")).as("content_len"))
      .orderBy(col("document_id"), col("order"))
  }

  /** F3+E1 — eligibility-filtered, batch-embedded, doc_id-deduped. */
  private val p3Embeddings: Q = (s, dir) => {
    val processed = processedStage(s, dir)
    val frags = IngestPipeline.fragments(processed)
    IngestPipeline.embeddings(frags, new OfflineEmbedder(64)).toDF()
      .select(col("doc_id"), col("fragment_id"), col("parent_id"),
        col("document_id"), col("view"), size(col("vector")).as("dim"))
      .orderBy(col("doc_id"))
  }

  /** S3/S4/G4 — PDF source pipeline over documents-as-stub-PDF bytes:
    * block extraction → F4 min-length filter → page-bounded merge → code
    * re-detection, with the S5 policy decision surfaced per document.
    */
  private val p4Pdf: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.PdfSource
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val segs = PdfSource.parsePdf(s"pdf/$id", s"pdf/$id.pdf",
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val wouldOcr = PdfSource.shouldFallbackToVision(segs)
        (id, segs.length, segs.count(_.kind == "code"),
          segs.map(_.content.length).sum, wouldOcr)
      })
      .toDF("doc_id", "n_segments", "n_code", "total_chars", "would_ocr")
      .orderBy(col("doc_id"))
  }

  /** The BASELINE.md headline shape: end-to-end ingest + 45-query batch
    * KNN in one lineage (the reference runs 45 serial KNN round-trips;
    * here the whole golden eval is ONE job over the freshly-built
    * embeddings — self-retrieval: each query is a fragment's own content,
    * pass ⇔ the fragment ranks #1 for itself).
    */
  private val p5E2eGolden: Q = (s, dir) => {
    import graft.search.VectorSearch
    val embedder = new OfflineEmbedder(64)
    // StageCache (not bare .cache()): the returned plan references this
    // stage, so it can only be unpersisted when the session is done with it
    val emb = StageCache.getOrCache(s, s"p5_embeddings:$dir") {
      IngestPipeline
        .embeddings(IngestPipeline.fragments(processedStage(s, dir)), embedder)
        .toDF()
    }
    val queries = emb
      .orderBy(col("fragment_id")).limit(45)
      .select(col("fragment_id").as("golden_id"), col("content"))
      .collect()
      .map(r => (r.getString(0), embedder.embedQuery(r.getString(1))))
      .toSeq
    val spark2 = s
    import spark2.implicits._
    val qdf = queries.toDF("query_id", "query_vector")
    VectorSearch.batchKnn(emb, qdf, topK = 10)
      .filter(col("rank") === 1)
      .select(col("query_id"),
        (col("fragment_id") === col("query_id")).as("self_retrieved"),
        col("similarity"))
      .orderBy(col("query_id"))
  }

  /** The BASELINE.md:44 quality gate shape: 45 PARAPHRASE queries (every
    * second token dropped, out-of-corpus scaffold appended — token-multiset
    * Jaccard ≤ 0.5 vs the target by construction), pass ⇔ the target's
    * parent_id appears in the top-10, exactly the reference harness rule
    * (api/cli/quality.py:68-88). Needs the compositional TokenHashEmbedder:
    * the whole-text-hash embedder can only self-retrieve. dim 256: 45/45 at
    * sf0.001 and sf0.01 (128 loses two at sf0.01 to projection noise;
    * sf0.1 sits at 43/45 regardless of dim — the two misses are near-
    * duplicate token bags under other parents, the model-class ceiling of
    * a tf bag-of-words embedding; a real API embedder behind the same
    * trait is the deployment answer).
    */
  private val p6Adversarial: Q = (s, dir) => {
    import graft.embedding.TokenHashEmbedder
    import graft.eval.GoldenEval
    val (emb, parents) = evalTables(s, dir)
    GoldenEval.evaluate(emb, parents,
      GoldenEval.adversarialCorpus(emb, 45), new TokenHashEmbedder(256))
  }

  /** S3/S4 on REAL bytes: each document renders to an actual PDF 1.4 file
    * (xref, page tree, FlateDecode for even ids, an image XObject every
    * third doc), [[graft.sources.RealPdfExtractor]] decodes the bytes
    * back, and the same F4/G4/S5 pipeline as p4 runs downstream.
    * `lossless` pins the decode claim row-by-row: the extracted text
    * blocks must equal the sanitized source paragraphs exactly. Per-file
    * map work inside one `mapPartitions` — file is the unit of
    * parallelism, no shuffle (same scale shape as the binaryFile source).
    */
  private val p7RealPdf: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfSource, PdfWriter, RealPdfExtractor}
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val paras = text.split("\n{2,}").toSeq
          .map(PdfWriter.sanitize).filter(_.trim.nonEmpty)
        val images: Map[Int, Int] = if (id % 3 == 0) Map(0 -> 1) else Map.empty
        val pages = paras.grouped(6).zipWithIndex
          .map { case (ps, i) =>
            PdfWriter.PageSpec(ps, if (i == 0) images else Map.empty)
          }.toSeq
        val bytes = PdfWriter.build(pages, compress = id % 2 == 0)
        val blocks = RealPdfExtractor.extract(s"pdf/$id.pdf", bytes)
        val lossless = blocks.filter(!_.isImage).map(_.content) == paras
        val segs = PdfSource.parseBlocks(s"pdf/$id", blocks)
        (id, pages.length, blocks.length, segs.length,
          segs.count(_.kind == "code"), segs.map(_.content.length).sum,
          lossless, bytes.length)
      })
      .toDF("doc_id", "n_pages", "n_blocks", "n_segments", "n_code",
        "total_chars", "lossless", "pdf_bytes")
      .orderBy(col("doc_id"))
  }

  /** S3/S4 on composite-font bytes: the p7 round-trip again, but through
    * an /Identity-H /Type0 font with a generated /ToUnicode CMap — the
    * modern-producer encoding a simple one-byte font can't represent, and
    * the case the reference's PyMuPDF handles natively
    * (pymupdf_parser.py:180-271). Each document's paragraphs get a
    * deterministic multilingual tail (Korean + CJK + accented Latin — the
    * reference corpus is Korean-heavy) so the CID alphabet genuinely
    * leaves ASCII; `lossless` pins the CMap decode row-by-row. Same scale
    * shape as p7: per-file map work in one `mapPartitions`, no shuffle.
    */
  private val p8CidPdf: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfSource, PdfWriter, RealPdfExtractor}
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val tail = s"문서 $id 한글 꼬리표 — résumé 中文測試 " +
          ('가' + (id % 100).toInt).toChar
        val paras = (text.split("\n{2,}").toSeq :+ tail)
          .map(PdfWriter.sanitizeCid).filter(_.trim.nonEmpty)
        val pages = paras.grouped(6)
          .map(ps => PdfWriter.PageSpec(ps)).toSeq
        val bytes = PdfWriter.buildCid(pages, compress = id % 2 == 0)
        val blocks = RealPdfExtractor.extract(s"cid/$id.pdf", bytes)
        val lossless = blocks.filter(!_.isImage).map(_.content) == paras
        val segs = PdfSource.parseBlocks(s"cid/$id", blocks)
        (id, pages.length, blocks.length, segs.length,
          segs.map(_.content.length).sum, lossless, bytes.length)
      })
      .toDF("doc_id", "n_pages", "n_blocks", "n_segments",
        "total_chars", "lossless", "pdf_bytes")
      .orderBy(col("doc_id"))
  }

  /** The p6 harness on the HARD corpus ([[graft.eval.GoldenEval
    * .hardAdversarialCorpus]] — shared-vocabulary distractors from wrong
    * parents blended into every query). p6 saturated at 45/45 at both
    * scale factors and stopped discriminating; this one scores below
    * 100% on the exact path BY DESIGN, so index-family recall measured
    * against it (HardRecallGen → SCALE.md) has headroom to differ.
    * Per-query rows, deterministic ⇒ golden-pinned.
    */
  /** The (embeddings, parents) pair the retrieval evals run over — shared
    * by p6/p9 and the HardRecallGen study tool so every consumer scores
    * against the identical tables.
    */
  private[graft] def evalTables(s: SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import graft.embedding.TokenHashEmbedder
    val embedder = new TokenHashEmbedder(256)
    val processed = processedStage(s, dir)
    val emb = StageCache.getOrCache(s, s"p6_embeddings:$dir") {
      IngestPipeline
        .embeddings(IngestPipeline.fragments(processed), embedder).toDF()
    }
    (emb, IngestPipeline.parents(processed).toDF())
  }

  private val p9HardEval: Q = (s, dir) => {
    import graft.embedding.TokenHashEmbedder
    import graft.eval.GoldenEval
    val (emb, parents) = evalTables(s, dir)
    GoldenEval.evaluate(emb, parents,
      GoldenEval.hardAdversarialCorpus(emb, 45), new TokenHashEmbedder(256))
  }

  /** S3/S4 on SUBSET-font bytes: the p8 round-trip with the /ToUnicode
    * CMap DELETED — the only route back to text is the embedded
    * /FontFile2's own `cmap` table, which the codec inverts the way the
    * reference's PyMuPDF introspects glyphs (pymupdf_parser.py:180-271).
    * CIDs are still alphabet ranks (≠ codepoints), so `lossless` here
    * pins genuine font-program introspection: an extractor that only
    * reads /ToUnicode cannot pass. Same multilingual tail and scale shape
    * as p8.
    */
  private val p10SubsetFont: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfSource, PdfWriter, RealPdfExtractor}
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val tail = s"문서 $id 한글 꼬리표 — résumé 中文測試 " +
          ('가' + (id % 100).toInt).toChar
        val paras = (text.split("\n{2,}").toSeq :+ tail)
          .map(PdfWriter.sanitizeCid).filter(_.trim.nonEmpty)
        val pages = paras.grouped(6)
          .map(ps => PdfWriter.PageSpec(ps)).toSeq
        // every third doc embeds a /CIDToGIDMap STREAM with a reversed
        // glyph order — the subsetter-ordered shape; the rest are
        // /Identity. Both must round-trip losslessly.
        val bytes =
          if (id % 3 == 0) PdfWriter.buildCidGidStream(pages, compress = id % 2 == 0)
          else PdfWriter.buildCidNoToUni(pages, compress = id % 2 == 0)
        val blocks = RealPdfExtractor.extract(s"subset/$id.pdf", bytes)
        val lossless = blocks.filter(!_.isImage).map(_.content) == paras
        val segs = PdfSource.parseBlocks(s"subset/$id", blocks)
        (id, pages.length, blocks.length, segs.length,
          segs.map(_.content.length).sum, lossless, bytes.length)
      })
      .toDF("doc_id", "n_pages", "n_blocks", "n_segments",
        "total_chars", "lossless", "pdf_bytes")
      .orderBy(col("doc_id"))
  }

  /** S3/S4 on bare-CFF font bytes: the p10 round-trip with the descendant
    * switched to /CIDFontType0 + /FontFile3 (/CIDFontType0C) — no
    * /ToUnicode and no sfnt `cmap` anywhere; the only route back to text
    * is the CFF charset's glyph names, resolved through the AGL
    * conventions ([[graft.sources.CffCharset]]; reference analog:
    * PyMuPDF's font introspection, pymupdf_parser.py:180-271). CIDs are
    * alphabet ranks (≠ codepoints), so `lossless` pins genuine CFF
    * introspection — an extractor handling only FontFile2 degrades to
    * garbage here. Same multilingual tail and shuffle-free per-document
    * scale shape as p10.
    */
  private val p12CffFont: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfSource, PdfWriter, RealPdfExtractor}
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val tail = s"문서 $id 한글 꼬리표 — résumé 中文測試 " +
          ('가' + (id % 100).toInt).toChar
        val paras = (text.split("\n{2,}").toSeq :+ tail)
          .map(PdfWriter.sanitizeCid).filter(_.trim.nonEmpty)
        val pages = paras.grouped(6)
          .map(ps => PdfWriter.PageSpec(ps)).toSeq
        val bytes = PdfWriter.buildCidCff(pages, compress = id % 2 == 0)
        val blocks = RealPdfExtractor.extract(s"cff/$id.pdf", bytes)
        val lossless = blocks.filter(!_.isImage).map(_.content) == paras
        val segs = PdfSource.parseBlocks(s"cff/$id", blocks)
        (id, pages.length, blocks.length, segs.length,
          segs.map(_.content.length).sum, lossless, bytes.length)
      })
      .toDF("doc_id", "n_pages", "n_blocks", "n_segments",
        "total_chars", "lossless", "pdf_bytes")
      .orderBy(col("doc_id"))
  }

  /** S3/S4 on ENCRYPTED bytes: the owner-restricted corpus shape — every
    * stream encrypted under the standard security handler (empty user
    * password; doc_id rotates RC4-128 / AES-128 / AES-256 so all three
    * handler generations stay exercised at every scale — /V 5 /R 6
    * AES-256 has been the Acrobat default since PDF 2.0, so a modern
    * encrypted corpus is mostly that). The extractor must authenticate
    * the empty password (SHA-2 Algorithm 2.B hashes for V5, MD5
    * Algorithm 2 for the legacy handlers) and decrypt per object
    * ([[graft.sources.PdfCrypt]]; reference analog: PyMuPDF opens
    * owner-restricted files transparently). The plaintext never appears
    * in the file, so `lossless` pins genuine decryption — skipping the
    * handler recovers nothing. Same shuffle-free per-document scale
    * shape as p7/p10.
    */
  private val p13EncryptedPdf: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfSource, PdfWriter, RealPdfExtractor}
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val paras = text.split("\n{2,}").toSeq
          .map(PdfWriter.sanitize).filter(_.trim.nonEmpty)
        val pages = paras.grouped(6)
          .map(ps => PdfWriter.PageSpec(ps)).toSeq
        val cipher = (id % 3) match {
          case 0 => "aes256"
          case 1 => "rc4"
          case _ => "aes128"
        }
        val bytes = PdfWriter.buildEncrypted(pages,
          compress = id % 2 == 0, cipher = cipher)
        val blocks = RealPdfExtractor.extract(s"enc/$id.pdf", bytes)
        val lossless = blocks.filter(!_.isImage).map(_.content) == paras
        val segs = PdfSource.parseBlocks(s"enc/$id", blocks)
        (id, cipher, pages.length, blocks.length,
          segs.length, segs.map(_.content.length).sum, lossless,
          bytes.length)
      })
      .toDF("doc_id", "cipher", "n_pages", "n_blocks", "n_segments",
        "total_chars", "lossless", "pdf_bytes")
      .orderBy(col("doc_id"))
  }

  /** S4 on the SCANNED-document image shape (the reference's actual
    * domain — its corpus is OCR of scans, and scanned PDFs
    * overwhelmingly carry CCITT G4 bilevel XObjects;
    * pymupdf_parser.py:773-823 gets their pixels via rendering): each
    * document renders to a PDF with three image XObjects — a CCITT G4
    * image whose dict /Width /Height LIE by one and whose /DecodeParms
    * has /Columns but no /Rows (height and ink are recoverable ONLY by
    * running the G4 decoder, [[graft.sources.CcittG4]] — the p11 trick),
    * plus one JBIG2 and one JPX stub the extractor must detect and label
    * `undecoded` with dict dims, never guess at. The DuckDB oracle
    * recomputes the G4 geometry AND black-pixel count from doc_id
    * arithmetic over the pixel formula, so a hash match proves a true
    * bit-level G4 decode end-to-end. Shuffle-free per-document map work,
    * the p7/p11 scale shape.
    */
  private val p14ScannedPdf: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfWriter, RealPdfExtractor}
    val g4Re = """Im0 (\d+)x(\d+) g4 b(\d+)""".r
    val jbRe = """Im1 (\d+)x(\d+) jbig2 undecoded""".r
    val jpRe = """Im2 (\d+)x(\d+) jpx undecoded""".r
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val paras = text.split("\n{2,}").toSeq
          .map(PdfWriter.sanitize).filter(_.trim.nonEmpty).take(2)
        val m = (id % 30).toInt
        val pages = Seq(PdfWriter.PageSpec(paras, Map(0 -> 3)))
        val bytes = PdfWriter.buildScan(pages, compress = id % 2 == 0,
          seed = m)
        val imgs = RealPdfExtractor.extract(s"scan/$id.pdf", bytes)
          .filter(_.isImage).map(_.content)
        val (gw, gh, gb) = imgs.collectFirst {
          case g4Re(w, h, b) => (w.toLong, h.toLong, b.toLong)
        }.getOrElse((-1L, -1L, -1L))
        val (jw, jh) = imgs.collectFirst {
          case jbRe(w, h) => (w.toLong, h.toLong)
        }.getOrElse((-1L, -1L))
        val (xw, xh) = imgs.collectFirst {
          case jpRe(w, h) => (w.toLong, h.toLong)
        }.getOrElse((-1L, -1L))
        (id, gw, gh, gb, jw, jh, xw, xh)
      })
      .toDF("doc_id", "g4_w", "g4_h", "g4_black", "jbig2_w", "jbig2_h",
        "jpx_w", "jpx_h")
      .orderBy(col("doc_id"))
  }

  /** S4 on the ARITHMETIC-CODED scanned shape: like p14 but the image
    * XObjects are real embedded JBIG2 ([[graft.sources.Jbig2]] — segment
    * stream, MQ arithmetic coder, generic region template 0). The dict
    * /Width /Height LIE by one and JBIG2 carries its own geometry inside
    * the region segment, so BOTH dimensions AND the black-pixel count are
    * recoverable only by a true bit-level MQ decode; a sibling XObject
    * with an undecodable payload pins the honest `undecoded` degrade
    * path in the same row. The DuckDB oracle recomputes everything from
    * doc_id arithmetic over the pixel formula. Shuffle-free per-document
    * map work, the p14 scale shape.
    */
  private val p15Jbig2Pdf: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfWriter, RealPdfExtractor}
    val jbRe = """Im0 (\d+)x(\d+) jbig2 b(\d+)""".r
    val stubRe = """Im1 (\d+)x(\d+) jbig2 undecoded""".r
    val jpRe = """Im2 (\d+)x(\d+) jpx undecoded""".r
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val paras = text.split("\n{2,}").toSeq
          .map(PdfWriter.sanitize).filter(_.trim.nonEmpty).take(2)
        val m = (id % 30).toInt
        val pages = Seq(PdfWriter.PageSpec(paras, Map(0 -> 3)))
        val bytes = PdfWriter.buildJbig2Scan(pages, compress = id % 2 == 0,
          seed = m)
        val imgs = RealPdfExtractor.extract(s"jb2/$id.pdf", bytes)
          .filter(_.isImage).map(_.content)
        val (jw, jh, jb) = imgs.collectFirst {
          case jbRe(w, h, b) => (w.toLong, h.toLong, b.toLong)
        }.getOrElse((-1L, -1L, -1L))
        val (sw, sh) = imgs.collectFirst {
          case stubRe(w, h) => (w.toLong, h.toLong)
        }.getOrElse((-1L, -1L))
        val (xw, xh) = imgs.collectFirst {
          case jpRe(w, h) => (w.toLong, h.toLong)
        }.getOrElse((-1L, -1L))
        (id, jw, jh, jb, sw, sh, xw, xh)
      })
      .toDF("doc_id", "jb2_w", "jb2_h", "jb2_black", "stub_w", "stub_h",
        "jpx_w", "jpx_h")
      .orderBy(col("doc_id"))
  }

  /** S4 on the WAVELET-CODED scanned shape: like p15 but the image
    * XObjects are real JPEG 2000 ([[graft.sources.Jpx]] — EBCOT Tier-1
    * over the MQ coder, tag-tree packet headers) in the SIX forms
    * /JPXDecode meets in the wild: a raw 5/3 lossless codestream (Im0,
    * rotating layers/progressions/tiling and every fifth seed a POC),
    * a JP2-box-wrapped one (Im1), a QUANTIZED 9/7 irreversible stream
    * (Im3 — the dominant archival-scan form: dead-zone scalar
    * quantization, 9/7 synthesis), and two SUBSAMPLED YCbCr color
    * scans — 4:2:0 (Im4) and factor-4 4:1:1 (Im5) — whose exact
    * replicated ink sums only a per-component-geometry decode
    * reaches. Dict /Width /Height LIE by one and the geometry lives
    * in the SIZ marker, so dimensions are recoverable only by a true
    * wavelet decode; the lossless sums are exact, the 9/7 ink is
    * pinned as a band around the source sum (within it only for a
    * correct dequantize + synthesis). Im2's undecodable payload pins
    * the honest `undecoded` degrade path in the same 18-column row.
    * The DuckDB oracle recomputes everything from doc_id arithmetic.
    * Shuffle-free per-document map work, the p14/p15 scale shape.
    */
  private val p16Jpeg2000Pdf: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfWriter, RealPdfExtractor}
    val rawRe = """Im0 (\d+)x(\d+) jpx s(\d+)""".r
    val jp2Re = """Im1 (\d+)x(\d+) jpx s(\d+)""".r
    val stubRe = """Im2 (\d+)x(\d+) jpx undecoded""".r
    val i97Re = """Im3 (\d+)x(\d+) jpx s(\d+)""".r
    val y420Re = """Im4 (\d+)x(\d+) jpx c3 s(\d+)""".r
    val y411Re = """Im5 (\d+)x(\d+) jpx c3 s(\d+)""".r
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val paras = text.split("\n{2,}").toSeq
          .map(PdfWriter.sanitize).filter(_.trim.nonEmpty).take(2)
        val m = (id % 30).toInt
        val pages = Seq(PdfWriter.PageSpec(paras, Map(0 -> 6)))
        val bytes = PdfWriter.buildJpxScan(pages, compress = id % 2 == 0,
          seed = m)
        val imgs = RealPdfExtractor.extract(s"jpx/$id.pdf", bytes)
          .filter(_.isImage).map(_.content)
        val (rw, rh, rs) = imgs.collectFirst {
          case rawRe(w, h, v) => (w.toLong, h.toLong, v.toLong)
        }.getOrElse((-1L, -1L, -1L))
        val (jw, jh, js) = imgs.collectFirst {
          case jp2Re(w, h, v) => (w.toLong, h.toLong, v.toLong)
        }.getOrElse((-1L, -1L, -1L))
        val (sw, sh) = imgs.collectFirst {
          case stubRe(w, h) => (w.toLong, h.toLong)
        }.getOrElse((-1L, -1L))
        // the quantized-9/7 form: dims are decode-only truth (dict
        // lies), ink is LOSSY — pinned as a band around the source sum
        // (measured max deviation 69 at step 2.0; band 300). A wrong
        // dequantizer or synthesis kernel lands far outside it.
        val (xw, xh, xok) = imgs.collectFirst {
          case i97Re(w, h, v) =>
            val (tw, th) = PdfWriter.i97Dims(m)
            val trueSum = (for (y <- 0 until th; x <- 0 until tw)
              yield PdfWriter.jpxPixel(m + 7, x, y).toLong).sum
            (w.toLong, h.toLong,
              w.toInt == tw && h.toInt == th &&
                math.abs(v.toLong - trueSum) <= 300L)
        }.getOrElse((-1L, -1L, false))
        // the 4:2:0 form is LOSSLESS (5/3 per component), so the
        // replicated ink sum is exact — the oracle recomputes it from
        // the pixel rule, no band needed
        val (yw, yh, ys) = imgs.collectFirst {
          case y420Re(w, h, v) => (w.toLong, h.toLong, v.toLong)
        }.getOrElse((-1L, -1L, -1L))
        // the 4:1:1 form (r11: factor-4 subsampling): same exact
        // replicated-sum contract as 4:2:0 — each quarter-width chroma
        // sample covers 4 reference columns (width a multiple of 4)
        val (qw, qh, qs) = imgs.collectFirst {
          case y411Re(w, h, v) => (w.toLong, h.toLong, v.toLong)
        }.getOrElse((-1L, -1L, -1L))
        (id, rw, rh, rs, jw, jh, js, sw, sh, xw, xh, xok, yw, yh, ys,
          qw, qh, qs)
      })
      .toDF("doc_id", "jpx_w", "jpx_h", "jpx_sum", "jp2_w", "jp2_h",
        "jp2_sum", "stub_w", "stub_h", "i97_w", "i97_h", "i97_ok",
        "y420_w", "y420_h", "y420_sum", "y411_w", "y411_h", "y411_sum")
      .orderBy(col("doc_id"))
  }

  // grid bounds = the max of jpxRawDims/y420Dims/y411Dims over m
  // (w ≤ 28, h ≤ 18); the y420 chroma conditions use 2x < w (= x < w/2,
  // dims even), the y411 conditions 4x < w (w a multiple of 4)
  private val p16Sql =
    """WITH d AS (SELECT doc_id, doc_id % 30 AS m,
      |  17 + 2*((doc_id % 30) % 6) AS w0, 11 + (doc_id % 30) % 7 AS h0,
      |  12 + (doc_id % 30) % 9 AS w1, 8 + (doc_id % 30) % 6 AS h1,
      |  16 + 2*((doc_id % 30) % 6) AS w4, 10 + 2*((doc_id % 30) % 5) AS h4,
      |  16 + 4*((doc_id % 30) % 4) AS w5, 9 + (doc_id % 30) % 6 AS h5
      |  FROM documents)
      |SELECT d.doc_id,
      |  CAST(MAX(w0) AS BIGINT) AS jpx_w,
      |  CAST(MAX(h0) AS BIGINT) AS jpx_h,
      |  CAST(SUM(CASE WHEN x < w0 AND y < h0
      |    THEN (x*7 + y*11 + 3*m) % 256 ELSE 0 END) AS BIGINT) AS jpx_sum,
      |  CAST(MAX(w1) AS BIGINT) AS jp2_w,
      |  CAST(MAX(h1) AS BIGINT) AS jp2_h,
      |  CAST(SUM(CASE WHEN x < w1 AND y < h1
      |    THEN (x*7 + y*11 + 3*(m+3)) % 256 ELSE 0 END) AS BIGINT) AS jp2_sum,
      |  CAST(MAX(18 + m % 5) AS BIGINT) AS stub_w,
      |  CAST(MAX(12 + m % 6) AS BIGINT) AS stub_h,
      |  CAST(MAX(19 + m % 7) AS BIGINT) AS i97_w,
      |  CAST(MAX(13 + m % 5) AS BIGINT) AS i97_h,
      |  true AS i97_ok,
      |  CAST(MAX(w4) AS BIGINT) AS y420_w,
      |  CAST(MAX(h4) AS BIGINT) AS y420_h,
      |  CAST(SUM(CASE WHEN x < w4 AND y < h4
      |      THEN (x*7 + y*11 + 3*(m+11)) % 256 ELSE 0 END)
      |    + 4*SUM(CASE WHEN 2*x < w4 AND 2*y < h4
      |      THEN (x*7 + y*11 + 3*(m+13)) % 256 ELSE 0 END)
      |    + 4*SUM(CASE WHEN 2*x < w4 AND 2*y < h4
      |      THEN (x*7 + y*11 + 3*(m+17)) % 256 ELSE 0 END)
      |    AS BIGINT) AS y420_sum,
      |  CAST(MAX(w5) AS BIGINT) AS y411_w,
      |  CAST(MAX(h5) AS BIGINT) AS y411_h,
      |  CAST(SUM(CASE WHEN x < w5 AND y < h5
      |      THEN (x*7 + y*11 + 3*(m+19)) % 256 ELSE 0 END)
      |    + 4*SUM(CASE WHEN 4*x < w5 AND y < h5
      |      THEN (x*7 + y*11 + 3*(m+23)) % 256 ELSE 0 END)
      |    + 4*SUM(CASE WHEN 4*x < w5 AND y < h5
      |      THEN (x*7 + y*11 + 3*(m+29)) % 256 ELSE 0 END)
      |    AS BIGINT) AS y411_sum
      |FROM d CROSS JOIN range(28) t1(x) CROSS JOIN range(18) t2(y)
      |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin

  /** S4 on the SYMBOL-CODED JBIG2 shape — the dominant wild form of
    * scanned text (scanner firmware builds a glyph dictionary and
    * places instances): Im0 carries an arithmetic symbol dictionary +
    * text region ([[graft.sources.Jbig2.encodeTextDocument]]); its dict
    * /Width /Height LIE by one, and the ink is recoverable only by
    * running the full Annex-A integer decoding + dictionary + text
    * region pipeline (glyph bitmaps × placements). The DuckDB oracle
    * recomputes page dims and additive ink from doc_id arithmetic over
    * the glyph pixel formula and the placement rule. Same shuffle-free
    * per-document map shape as p14–p16.
    */
  private val p17Jbig2Text: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfWriter, RealPdfExtractor}
    val docRe = """Im0 (\d+)x(\d+) jbig2 b(\d+)""".r
    val stubRe = """Im1 (\d+)x(\d+) jbig2 undecoded""".r
    val hufRe = """Im3 (\d+)x(\d+) jbig2 b(\d+)""".r
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val paras = text.split("\n{2,}").toSeq
          .map(PdfWriter.sanitize).filter(_.trim.nonEmpty).take(2)
        val m = (id % 30).toInt
        val pages = Seq(PdfWriter.PageSpec(paras, Map(0 -> 4)))
        val bytes = PdfWriter.buildJbig2TextScan(pages,
          compress = id % 2 == 0, seed = m)
        val imgs = RealPdfExtractor.extract(s"jb2t/$id.pdf", bytes)
          .filter(_.isImage).map(_.content)
        val (pw, ph, ink) = imgs.collectFirst {
          case docRe(w, h, b) => (w.toLong, h.toLong, b.toLong)
        }.getOrElse((-1L, -1L, -1L))
        val (sw, sh) = imgs.collectFirst {
          case stubRe(w, h) => (w.toLong, h.toLong)
        }.getOrElse((-1L, -1L))
        // Im3: the HUFFMAN-dictionary organization (SDHUFF, Annex-B
        // prefix codes + collective bitmaps) at seed (m+7)%30 — ink is
        // recoverable only by a true Huffman + collective-bitmap decode
        val (hw, hh, hink) = imgs.collectFirst {
          case hufRe(w, h, b) => (w.toLong, h.toLong, b.toLong)
        }.getOrElse((-1L, -1L, -1L))
        (id, pw, ph, ink, sw, sh, hw, hh, hink)
      })
      .toDF("doc_id", "page_w", "page_h", "ink", "stub_w", "stub_h",
        "huf_w", "huf_h", "huf_ink")
      .orderBy(col("doc_id"))
  }

  /** Per-seed p17 CTE block: instance j uses glyph k = (2j+m) mod
    * numsyms; glyph k is (4+k%4)×(5+k//2) with pixel rule
    * (3x+5y+2k)%7<3; placements never overlap, so ink is the sum over
    * instances of the glyph census. `seedExpr` selects the document's
    * seed (m for the arithmetic Im0, (m+7)%30 for the Huffman Im3). */
  private def p17Cte(p: String, seedExpr: String): String =
    s"""${p}d AS (SELECT doc_id, $seedExpr AS m,
       |    3 + ($seedExpr) % 3 AS numsyms, 6 + ($seedExpr) % 5 AS ninst
       |  FROM documents),
       |  ${p}inst AS (SELECT d.doc_id, d.m, d.ninst,
       |      (2*j + m) % numsyms AS k
       |    FROM ${p}d d CROSS JOIN range(11) t(j) WHERE j < ninst),
       |  ${p}agg AS (SELECT doc_id,
       |    CAST(MAX(11*(ninst-1) + 8) AS BIGINT) AS page_w,
       |    CAST(12 AS BIGINT) AS page_h,
       |    CAST(SUM(CASE WHEN x < 4 + k % 4 AND y < 5 + k // 2
       |      AND (3*x + 5*y + 2*k) % 7 < 3 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ink
       |    FROM (SELECT i.doc_id, i.ninst, i.k, x, y FROM ${p}inst i
       |      CROSS JOIN range(8) t1(x) CROSS JOIN range(8) t2(y))
       |    GROUP BY doc_id)""".stripMargin

  private val p17Sql =
    s"""WITH ${p17Cte("a_", "doc_id % 30")},
       |  ${p17Cte("h_", "(doc_id % 30 + 7) % 30")}
       |SELECT a_agg.doc_id, a_agg.page_w, a_agg.page_h, a_agg.ink,
       |  CAST(16 + a_agg.doc_id % 30 % 8 AS BIGINT) AS stub_w,
       |  CAST(10 + a_agg.doc_id % 30 % 4 AS BIGINT) AS stub_h,
       |  h_agg.page_w AS huf_w, h_agg.page_h AS huf_h,
       |  h_agg.ink AS huf_ink
       |FROM a_agg JOIN h_agg ON a_agg.doc_id = h_agg.doc_id
       |ORDER BY a_agg.doc_id""".stripMargin

  // grid bounds = the max of jb2Dims over m (w ≤ 32, h ≤ 17)
  private val p15Sql =
    """WITH d AS (SELECT doc_id, doc_id % 30 AS m,
      |  14 + 3*((doc_id % 30) % 7) AS w, 9 + 2*((doc_id % 30) % 5) AS h
      |  FROM documents)
      |SELECT d.doc_id,
      |  CAST(MAX(w) AS BIGINT) AS jb2_w,
      |  CAST(MAX(h) AS BIGINT) AS jb2_h,
      |  CAST(SUM(CASE WHEN x < w AND y < h AND (x*5 + y*3 + m) % 13 < 5
      |    THEN 1 ELSE 0 END) AS BIGINT) AS jb2_black,
      |  CAST(MAX(16 + m % 8) AS BIGINT) AS stub_w,
      |  CAST(MAX(10 + m % 4) AS BIGINT) AS stub_h,
      |  CAST(MAX(18 + m % 5) AS BIGINT) AS jpx_w,
      |  CAST(MAX(12 + m % 6) AS BIGINT) AS jpx_h
      |FROM d CROSS JOIN range(32) t1(x) CROSS JOIN range(17) t2(y)
      |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin

  // grid bounds = the max of g4Dims over m (w ≤ 32, h ≤ 20); DuckDB's
  // range() takes no correlated args, so the pixel census runs over the
  // fixed grid with the per-doc bound as a filter
  private val p14Sql =
    """WITH d AS (SELECT doc_id, doc_id % 30 AS m,
      |  12 + 4*((doc_id % 30) % 6) AS w, 8 + 3*((doc_id % 30) % 5) AS h
      |  FROM documents)
      |SELECT d.doc_id,
      |  CAST(MAX(w) AS BIGINT) AS g4_w,
      |  CAST(MAX(h) AS BIGINT) AS g4_h,
      |  CAST(SUM(CASE WHEN x < w AND y < h AND (x*3 + y*7 + m) % 11 < 4
      |    THEN 1 ELSE 0 END) AS BIGINT) AS g4_black,
      |  CAST(MAX(16 + m % 8) AS BIGINT) AS jbig2_w,
      |  CAST(MAX(10 + m % 4) AS BIGINT) AS jbig2_h,
      |  CAST(MAX(18 + m % 5) AS BIGINT) AS jpx_w,
      |  CAST(MAX(12 + m % 6) AS BIGINT) AS jpx_h
      |FROM d CROSS JOIN range(32) t1(x) CROSS JOIN range(20) t2(y)
      |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin

  /** S4 image metadata on REAL pixels: each document renders to a PDF
    * whose image XObjects are actual baseline JPEGs (/DCTDecode), with the
    * object dict's /Width /Height deliberately off by one — the extractor
    * can only label images correctly by decoding the raster
    * ([[graft.media.ImageCodec]]; reference sees rendered pixels via
    * PyMuPDF, pymupdf_parser.py:675-759). The output's width/height sums
    * are parsed back OUT of the decoded block labels, and the DuckDB
    * oracle recomputes them from doc_id arithmetic — a hash match proves
    * pixel-true decode end-to-end. `decoded_ok` additionally pins the
    * channel count (c3) per image.
    */
  private val p11JpegXobject: Q = (s, dir) => {
    import s.implicits._
    import graft.sources.{PdfWriter, RealPdfExtractor}
    val labelRe = """Im\d+ (\d+)x(\d+) jpeg c(\d+)""".r
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val paras = text.split("\n{2,}").toSeq
          .map(PdfWriter.sanitize).filter(_.trim.nonEmpty).take(2)
        val nImgs = 1 + (id % 3).toInt
        val pages = Seq(PdfWriter.PageSpec(paras, Map(0 -> nImgs)))
        val bytes = PdfWriter.buildJpeg(pages, compress = id % 2 == 0)
        val imgs = RealPdfExtractor.extract(s"jpeg/$id.pdf", bytes)
          .filter(_.isImage).map(_.content)
        val parsed = imgs.flatMap(labelRe.findFirstMatchIn(_).map(m =>
          (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong)))
        (id, nImgs.toLong, imgs.length.toLong,
          parsed.map(_._1).sum, parsed.map(_._2).sum,
          parsed.length == nImgs && parsed.forall(_._3 == 3L))
      })
      .toDF("doc_id", "n_images", "n_image_blocks", "sum_w", "sum_h",
        "decoded_ok")
      .orderBy(col("doc_id"))
  }

  private val p11Sql =
    """WITH d AS (SELECT doc_id, 1 + doc_id % 3 AS n_imgs FROM documents),
      |i AS (SELECT doc_id, n_imgs, unnest(range(0, n_imgs)) AS k FROM d)
      |SELECT doc_id, CAST(n_imgs AS BIGINT) AS n_images,
      |  CAST(n_imgs AS BIGINT) AS n_image_blocks,
      |  CAST(SUM(16 + 8 * (k % 5)) AS BIGINT) AS sum_w,
      |  CAST(SUM(12 + 4 * (k % 7)) AS BIGINT) AS sum_h,
      |  TRUE AS decoded_ok
      |FROM i GROUP BY doc_id, n_imgs ORDER BY doc_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "p1_ingest_fragments" -> p1Fragments,
    "p2_parent_synthesis" -> p2Parents,
    "p3_embed_fragments" -> p3Embeddings,
    "p4_pdf_segments" -> p4Pdf,
    "p5_e2e_golden45" -> p5E2eGolden,
    "p6_adversarial_recall" -> p6Adversarial,
    "p7_real_pdf" -> p7RealPdf,
    "p8_cid_pdf" -> p8CidPdf,
    "p9_hard_eval" -> p9HardEval,
    "p10_subset_font" -> p10SubsetFont,
    "p11_jpeg_xobject" -> p11JpegXobject,
    "p12_cff_font" -> p12CffFont,
    "p13_encrypted_pdf" -> p13EncryptedPdf,
    "p14_scanned_pdf" -> p14ScannedPdf,
    "p15_jbig2_pdf" -> p15Jbig2Pdf,
    "p16_jpeg2000_pdf" -> p16Jpeg2000Pdf,
    "p17_jbig2_text" -> p17Jbig2Text)

  /** Stateful per-document folds are not SQL-expressible (golden-pinned
    * instead); p11 and p14–p16 ARE oracled — their expected dims/ink are
    * pure arithmetic. */
  val oracles: Map[String, String] = Map(
    "p11_jpeg_xobject" -> p11Sql,
    "p14_scanned_pdf" -> p14Sql,
    "p15_jbig2_pdf" -> p15Sql,
    "p16_jpeg2000_pdf" -> p16Sql,
    "p17_jbig2_text" -> p17Sql)
}
