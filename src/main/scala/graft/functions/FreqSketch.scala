package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Spark [[Aggregator]] —
  * the mergeable, bounded-state alternative to an exact n-gram census
  * (x9) at 100 TB.
  *
  * The exact census shuffles the full distinct vocabulary; at web scale
  * the n-gram vocabulary is itself corpus-sized, so the "diagnose
  * boilerplate with a top-k table" job pays a vocabulary-sized shuffle
  * for a 100-row answer. Misra–Gries keeps at most `k` counters per
  * partial aggregate: every partition reduces its stream locally, the
  * merge is the standard counter-sum + (k+1)-th-count subtraction, and
  * only k-counter maps cross the wire — state and shuffle bounded by k,
  * independent of vocabulary or corpus size.
  *
  * Guarantees (classic MG, preserved by the merge): for a stream of n
  * items, every item with true count > n/(k+1) is present in the sketch,
  * and each reported count lower-bounds the true count by at most
  * n/(k+1). Both properties are spec-checked (`FreqSketchSpec`), and the
  * catalog query (x14) reports the bound next to exact counts so the
  * claim is auditable per run.
  *
  * The reduce/merge cores are pure Map functions (testable without
  * Spark); the Aggregator wraps them with Kryo-encoded state.
  */
object FreqSketch {

  /** One MG reduce step: count `item`, evicting by global decrement when
    * the counter table is full.
    */
  def mgAdd(counters: Map[String, Long], item: String, k: Int): Map[String, Long] =
    counters.get(item) match {
      case Some(c) => counters.updated(item, c + 1)
      case None if counters.size < k => counters.updated(item, 1L)
      case None =>
        // decrement-all: drop zeroed counters (amortized O(1) per item
        // over the stream; Map ops keep this simple and correct)
        counters.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }

  /** Mergeable-summaries combine (Agarwal et al.): sum counts, then if
    * more than k counters survive, subtract the (k+1)-th largest count
    * from all and keep the strictly-positive ones.
    */
  def mgMerge(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (key, c) =>
        if (c > kth) Some(key -> (c - kth)) else None
      }
    }
  }

  /** Typed aggregator: `ds.select(FreqSketch.topK(k).toColumn)` yields
    * the (item, lower-bound count) table sorted by count desc, item asc.
    */
  def topK(k: Int): Aggregator[String, Map[String, Long], Seq[(String, Long)]] =
    new Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
      override def zero: Map[String, Long] = Map.empty
      override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
        mgAdd(b, item, k)
      override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
        mgMerge(a, b, k)
      override def finish(b: Map[String, Long]): Seq[(String, Long)] =
        b.toSeq.sortBy { case (item, c) => (-c, item) }
      override def bufferEncoder: Encoder[Map[String, Long]] =
        Encoders.kryo[Map[String, Long]]
      override def outputEncoder: Encoder[Seq[(String, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
    }
}
