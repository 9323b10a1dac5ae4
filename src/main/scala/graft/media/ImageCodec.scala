package graft.media

import java.awt.image.{BufferedImage, DataBufferInt}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{ImageIO, ImageReader, ImageWriter}

/** Real raster decode via `javax.imageio` — the piece that makes media
  * features and the PDF Vision-OCR policy operate on actual pixels instead
  * of byte-length stubs (VERDICT r7 task #3; reference renders pages via
  * PyMuPDF, pymupdf_parser.py:675-759).
  *
  * Baseline JPEG (a PDF /DCTDecode payload IS a bare JPEG stream) and PNG
  * decode in-JVM with zero added dependencies. What's still stubbed is
  * only what the environment can't host (the OCR model call itself);
  * width/height/channels here come from the decoded raster, not a hash.
  *
  * Scale shape: decode runs inside the scan-stage `mapPartitions` next to
  * where the bytes were read — pixel buffers live for one row and are
  * never shuffled or collected.
  *
  * r16 per-task tuning (guide §1.2 step 2 — the distributed shape was
  * already right): `ImageIO.read`/`write` run a plugin-registry scan and
  * construct a fresh reader/writer PER CALL, which dominated the
  * per-document decode of small rasters (m3's ~50×50 JPEGs). Readers and
  * the JPEG writer are now thread-local and reused across a task's rows;
  * the format is sniffed from magic bytes (JPEG/PNG/GIF/BMP — exactly
  * the ImageIO-supported set the scaladoc promises), with unknown magic
  * falling back to stock `ImageIO.read`. Same plugin classes, default
  * params — decoded rasters and encoded bytes are identical.
  */
object ImageCodec {

  // ImageIO's default stream cache spools every read/write through a temp
  // FILE — per-row disk I/O inside the scan-stage mapPartitions. All
  // payloads here are in-memory byte arrays; cache in memory.
  ImageIO.setUseCache(false)

  final case class Decoded(width: Int, height: Int, channels: Int)

  private val jpgWriter = new ThreadLocal[ImageWriter] {
    override def initialValue(): ImageWriter =
      ImageIO.getImageWritersByFormatName("jpg").next()
  }

  private val readerCache =
    new ThreadLocal[java.util.HashMap[String, ImageReader]] {
      override def initialValue(): java.util.HashMap[String, ImageReader] =
        new java.util.HashMap[String, ImageReader]
    }

  /** Format name from the payload's magic bytes; null = let stock
    * ImageIO auto-detection handle it. */
  private def sniff(b: Array[Byte]): String =
    if (b.length < 8) null
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpg"
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') "png"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else null

  /** Decode any ImageIO-supported payload (JPEG/PNG/GIF/BMP). None —
    * never an exception — when the bytes aren't a decodable image.
    * NonFatal only: an OOM from a hostile header's giant raster
    * allocation must propagate (a task in a blown-heap JVM limping on as
    * "not an image" is worse than failing it).
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try {
      val fmt = sniff(bytes)
      val img =
        if (fmt == null) ImageIO.read(new ByteArrayInputStream(bytes))
        else {
          var reader = readerCache.get().get(fmt)
          if (reader == null) {
            val it = ImageIO.getImageReadersByFormatName(fmt)
            if (!it.hasNext) null else {
              reader = it.next()
              readerCache.get().put(fmt, reader)
            }
          }
          if (reader == null)
            ImageIO.read(new ByteArrayInputStream(bytes))
          else {
            val iis = ImageIO.createImageInputStream(
              new ByteArrayInputStream(bytes))
            try {
              // same call shape as ImageIO.read: forward-only, metadata
              // ignored, default read param
              reader.setInput(iis, true, true)
              reader.read(0, reader.getDefaultReadParam)
            } finally {
              try reader.reset() catch {
                case scala.util.control.NonFatal(_) => ()
              }
              iis.close()
            }
          }
        }
      Option(img).map { i =>
        Decoded(i.getWidth, i.getHeight, i.getRaster.getNumBands)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic synthetic RGB image: a gradient keyed by `seed`, JPEG
    * baseline encoded. Pixel VALUES are lossy and encoder-dependent —
    * fixtures must assert on decoded dimensions/channels (exact through
    * any JPEG round-trip), never on byte hashes.
    */
  def syntheticJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    // direct data-buffer fill: setRGB's per-pixel ColorModel dispatch
    // was most of the synthesis cost; TYPE_INT_RGB stores the same
    // packed 0xRRGGBB int, so the raster (and the encoded bytes) are
    // identical
    val px = img.getRaster.getDataBuffer.asInstanceOf[DataBufferInt]
      .getData
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (x * 255 / math.max(1, width - 1) + seed) & 0xff
        val g = (y * 255 / math.max(1, height - 1) + seed * 7) & 0xff
        val b = ((x + y + seed * 13) * 5) & 0xff
        px(y * width + x) = ((r << 16) | (g << 8) | b).toInt
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream
    val ios = ImageIO.createImageOutputStream(out)
    val w = jpgWriter.get()
    try {
      w.setOutput(ios)
      // ImageWriter.write(img) == ImageIO.write's
      // write(null, IIOImage, null) — default param, same bytes
      w.write(img)
    } finally {
      try w.reset() catch { case scala.util.control.NonFatal(_) => () }
      ios.flush()
      ios.close()
    }
    out.toByteArray
  }
}
