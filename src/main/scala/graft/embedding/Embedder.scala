package graft.embedding

import graft.functions.Hashing

/** E1/E2 — the embedding boundary behind a trait
  * (embedding/provider.py:36-99).
  *
  * Real deployments plug an API-backed implementation; this repo is
  * zero-egress, so [[OfflineEmbedder]] supplies deterministic hash-seeded
  * unit vectors: same text → same vector on every JVM, which makes every
  * downstream similarity result reproducible and oracle-checkable.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embedDocuments(texts: Seq[String]): Seq[Array[Float]]
  def embedQuery(text: String): Array[Float] = embedDocuments(Seq(text)).head
}

/** Deterministic offline embedder. Vector components derive from
  * md5(text + ":" + blockIndex) — 16 bytes → 4 floats per block — then the
  * vector is L2-normalized, so cosine similarity degenerates to a dot
  * product. Texts sharing long prefixes still hash apart (full content in
  * every block hash).
  */
final class OfflineEmbedder(val dim: Int = 64) extends Embedder {

  def embedDocuments(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => HashVec.normalized(HashVec.raw(t, dim)))
}

/** md5-block hash → pseudo-random vector, shared by the offline embedders. */
private[embedding] object HashVec {

  /** Unnormalized components: md5(text + ":" + blockIndex) — 16 bytes →
    * 4 floats per block, each in [-1, 1).
    */
  def raw(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var block = 0
    var i = 0
    while (i < dim) {
      val bytes = java.security.MessageDigest.getInstance("MD5")
        .digest((text + ":" + block).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 4 && i < dim) {
        // 4 bytes → int → [-1, 1)
        val x = ((bytes(4 * j) & 0xff) << 24) | ((bytes(4 * j + 1) & 0xff) << 16) |
          ((bytes(4 * j + 2) & 0xff) << 8) | (bytes(4 * j + 3) & 0xff)
        v(i) = (x / 2147483648.0).toFloat
        i += 1; j += 1
      }
      block += 1
    }
    v
  }

  def normalized(v: Array[Float]): Array[Float] = {
    var norm = 0.0
    v.foreach(x => norm += x.toDouble * x.toDouble)
    val inv = if (norm == 0) 0f else (1.0 / math.sqrt(norm)).toFloat
    v.map(_ * inv)
  }
}

/** Compositional offline embedder: the text embeds as the tf-weighted sum
  * of per-token hash unit vectors, L2-normalized — a deterministic random
  * projection of the token-frequency vector. Unlike [[OfflineEmbedder]]
  * (whole-text hash ⇒ any edit is an orthogonal vector, so only identity
  * retrieval works), this preserves bag-of-words geometry: a paraphrase
  * sharing part of the token multiset lands NEAR the source document, which
  * is what the adversarial golden-query eval (GoldenEval) needs from an
  * embedding model. Stands in for the reference's API embedder
  * (embedding/provider.py:36-99) in zero-egress runs.
  */
final class TokenHashEmbedder(val dim: Int = 128) extends Embedder {

  def embedDocuments(texts: Seq[String]): Seq[Array[Float]] = {
    // token vectors memoized per batch (corpora here have small vocabularies;
    // the map is bounded by distinct tokens in the batch)
    val cache = scala.collection.mutable.HashMap.empty[String, Array[Float]]
    texts.map { t =>
      val v = new Array[Float](dim)
      TokenHashEmbedder.tokenize(t).foreach { tok =>
        val tv = cache.getOrElseUpdate(tok, HashVec.normalized(HashVec.raw(tok, dim)))
        var i = 0
        while (i < dim) { v(i) += tv(i); i += 1 }
      }
      HashVec.normalized(v)
    }
  }
}

object TokenHashEmbedder {
  /** Lowercased letter/digit runs (Unicode classes — Korean included). */
  def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)
}

/** E3 — greedy char-budget batching (shared/batching.py:12-66). Runs inside
  * the embed `mapPartitions`, grouping an iterator into API-shaped batches
  * without materializing the partition.
  */
object Batching {
  def byCharBudget[T](items: Iterator[T], charBudget: Int, maxBatchSize: Int,
      maxItemsPerRequest: Int = 0)(content: T => String): Iterator[Seq[T]] =
    new Iterator[Seq[T]] {
      private val itemLimit = math.min(
        if (maxItemsPerRequest > 0) maxItemsPerRequest else maxBatchSize,
        maxBatchSize)
      private val in = items.buffered
      def hasNext: Boolean = in.hasNext
      def next(): Seq[T] = {
        val batch = Seq.newBuilder[T]
        var batchChars = 0
        var n = 0
        var done = false
        while (!done && in.hasNext) {
          // Python len() = code points (batching.py char budget)
          val itemChars = graft.functions.Hashing.lengthCodePoints(content(in.head))
          val exceedChars = charBudget > 0 && batchChars + itemChars > charBudget
          if (n > 0 && (exceedChars || n >= itemLimit)) done = true
          else {
            batch += in.next()
            batchChars += itemChars
            n += 1
          }
        }
        batch.result()
      }
    }

  /** Convenience: embed an iterator of texts in batches; keys travel along. */
  def embedBatched[K](rows: Iterator[(K, String)], embedder: Embedder,
      charBudget: Int = 20000, maxBatchSize: Int = 64): Iterator[(K, Array[Float])] =
    byCharBudget(rows, charBudget, maxBatchSize)(_._2).flatMap { batch =>
      val vecs = embedder.embedDocuments(batch.map(_._2))
      batch.map(_._1).zip(vecs)
    }
}

/** Deterministic id helpers specific to the embedding table. */
object EmbeddingIds {
  /** doc_id = "doc:" + md5(parent|view|lang|content) — the upsert/dedupe key
    * (domain/value_objects.py:35-66).
    */
  def docId(parentId: String, view: String, lang: Option[String],
      content: String): String = Hashing.docId(parentId, view, lang, content)
}
