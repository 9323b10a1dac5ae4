package graft.media

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batch-decoded via `mapPartitions`.
  *
  * The real decode (libjpeg / ffmpeg et al.) is not available in this
  * environment, so [[StubDecoder]] is a clearly-marked deterministic fake —
  * but the Spark-side shape is the production one: binary column in,
  * fixed-schema feature struct out, per-partition batching, pluggable
  * decoder behind a trait (same pattern as the reference's Vision-OCR
  * boundary, pymupdf_parser.py:30-132).
  *
  * Scale: media bytes never shuffle — features extract in the scan stage
  * and only the (tiny) feature rows flow downstream. Partition sizing is
  * governed by `spark.sql.files.maxPartitionBytes` against blob-heavy
  * files; feature extraction is CPU-bound map work that scales linearly.
  */
object MediaPipeline {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      content_hash: String,
      header_hex: String,
      // decoded properties (stub: deterministic from content hash)
      width: Int,
      height: Int,
      n_frames: Int)

  /** Decoder boundary — production impls wrap image/audio libraries. */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB: deterministic fake decode. Real deployments replace this with a
    * library-backed decoder; everything around it (schema, partitioning,
    * batching) is production plumbing.
    */
  object StubDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val digest = java.security.MessageDigest.getInstance("MD5").digest(row.bytes)
      val hex = digest.map(b => f"${b & 0xff}%02x").mkString
      val header = row.bytes.take(4).map(b => f"${b & 0xff}%02X").mkString
      // fake dimensions derived from the hash — deterministic, test-stable
      val w = 16 + (java.lang.Long.parseLong(hex.take(4), 16) % 1024).toInt
      val h = 16 + (java.lang.Long.parseLong(hex.slice(4, 8), 16) % 1024).toInt
      val frames = if (row.kind == "video") 1 + (hex(8) & 0x0f) else 1
      MediaFeatures(row.media_id, row.kind, row.bytes.length.toLong, hex,
        header, w, h, frames)
    }
  }

  /** Batch feature extraction: binary in, features out, decoder pluggable.
    * One narrow mapPartitions — no shuffle, media bytes stay in the scan.
    */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decoder.decode))
  }

  /** Uniform-stride frame sampling + aspect-preserving resize over decoded
    * features — the explode-shaped half of the multimodal pipeline (a video
    * becomes ≤ maxFrames rows; images/audio pass through as frame 0).
    *
    * All arithmetic is integer (ceil-div stride, floor-div box fit into
    * targetBox², floor ≥ 1) so the DuckDB oracle reproduces it exactly.
    * The per-frame content hash stands in for the per-frame decode a
    * production impl runs at the same point — inside the scan stage,
    * before anything shuffles; only (media_id, frame_idx, hash, dims)
    * rows flow downstream, never frame bytes.
    */
  def sampleFrames(features: DataFrame, maxFrames: Int = 4,
      targetBox: Int = 224): DataFrame = {
    val stride = expr(s"(n_frames + ${maxFrames - 1}) DIV $maxFrames")
    features
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames").cast("long") - 1L, stride)))
      .select(
        col("media_id"), col("kind"), col("frame_idx"),
        md5(concat(col("content_hash"), lit(":"), col("frame_idx")))
          .as("frame_hash"),
        greatest(lit(1L), expr(s"(width * $targetBox) DIV greatest(width, height)"))
          .as("out_w"),
        greatest(lit(1L), expr(s"(height * $targetBox) DIV greatest(width, height)"))
          .as("out_h"))
  }

  /** Wrap a text table as fake media bytes (UTF-8) — used by the catalog
    * query so the plumbing runs against real testdata.
    */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
