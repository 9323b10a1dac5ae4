package graft.media

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

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
  */
object ImageCodec {

  // ImageIO's default stream cache spools every read/write through a temp
  // FILE — per-row disk I/O inside the scan-stage mapPartitions. All
  // payloads here are in-memory byte arrays; cache in memory.
  ImageIO.setUseCache(false)

  final case class Decoded(width: Int, height: Int, channels: Int)

  /** Decode any ImageIO-supported payload (JPEG/PNG/GIF/BMP). None —
    * never an exception — when the bytes aren't a decodable image.
    * NonFatal only: an OOM from a hostile header's giant raster
    * allocation must propagate (a task in a blown-heap JVM limping on as
    * "not an image" is worse than failing it).
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        Decoded(img.getWidth, img.getHeight, img.getRaster.getNumBands)
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
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (x * 255 / math.max(1, width - 1) + seed) & 0xff
        val g = (y * 255 / math.max(1, height - 1) + seed * 7) & 0xff
        val b = ((x + y + seed * 13) * 5) & 0xff
        img.setRGB(x, y, ((r << 16) | (g << 8) | b).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream
    val ok = ImageIO.write(img, "jpg", out)
    require(ok, "no JPEG writer available in this JVM")
    out.toByteArray
  }
}
