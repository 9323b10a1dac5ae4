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

  type Counters = scala.collection.mutable.HashMap[String, Long]

  /** One MG reduce step IN PLACE: count `item`, evicting by global
    * decrement when the counter table is full. Mutable because the
    * aggregator buffer is touched once per stream item — immutable-Map
    * churn here measurably dominates the whole query (~2× end-to-end).
    */
  def mgAddMut(counters: Counters, item: String, k: Int): Unit =
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None if counters.size < k => counters.update(item, 1L)
      case None =>
        // decrement-all, dropping zeroed counters (amortized O(1) per
        // stream item: each decrement pass pays for a prior insertion)
        val dead = List.newBuilder[String]
        counters.foreachEntry { (key, c) =>
          if (c > 1) counters.update(key, c - 1) else dead += key
        }
        dead.result().foreach(counters.remove)
    }

  /** Mergeable-summaries combine (Agarwal et al.), folding `b` into `a`:
    * sum counts, then if more than k counters survive, subtract the
    * (k+1)-th largest count from all and keep the strictly-positive ones.
    */
  def mgMergeMut(a: Counters, b: Counters, k: Int): Unit = {
    b.foreachEntry((key, c) => a.update(key, a.getOrElse(key, 0L) + c))
    if (a.size > k) {
      val kth = a.values.toArray.sorted(Ordering[Long].reverse)(k)
      val dead = List.newBuilder[String]
      a.foreachEntry { (key, c) =>
        if (c > kth) a.update(key, c - kth) else dead += key
      }
      dead.result().foreach(a.remove)
    }
  }

  /** Pure forms (spec surface — the properties are easiest to state on
    * immutable maps); delegate to the in-place cores.
    */
  def mgAdd(counters: Map[String, Long], item: String, k: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.from(counters)
    mgAddMut(m, item, k)
    m.toMap
  }

  def mgMerge(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.from(a)
    mgMergeMut(m, scala.collection.mutable.HashMap.from(b), k)
    m.toMap
  }

  /** Typed aggregator: `ds.select(FreqSketch.topK(k).toColumn)` yields
    * the (item, lower-bound count) table sorted by count desc, item asc.
    */
  def topK(k: Int): Aggregator[String, Counters, Seq[(String, Long)]] =
    new Aggregator[String, Counters, Seq[(String, Long)]] {
      override def zero: Counters = scala.collection.mutable.HashMap.empty
      override def reduce(b: Counters, item: String): Counters = {
        mgAddMut(b, item, k); b
      }
      override def merge(a: Counters, b: Counters): Counters = {
        mgMergeMut(a, b, k); a
      }
      override def finish(b: Counters): Seq[(String, Long)] =
        b.toSeq.sortBy { case (item, c) => (-c, item) }
      override def bufferEncoder: Encoder[Counters] =
        Encoders.kryo[Counters]
      override def outputEncoder: Encoder[Seq[(String, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
    }
}
