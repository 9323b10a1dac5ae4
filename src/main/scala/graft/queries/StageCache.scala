package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for cache()'d shared query stages.
  *
  * Catalog queries materialize expensive sketch stages with `.cache()` (the
  * local stand-in for a write-time table column) and share them across
  * queries (d2/d3 share one MinHash pass). A bare process-global map would
  * pin executor storage and retain stopped SparkSessions for the JVM
  * lifetime; this registry instead:
  *
  *  - keys by (session, stage key) and evicts+unpersists everything for a
  *    session via [[release]] (called by Verify / Bench / Cli when done);
  *  - drops a session's entries automatically once its context ends, so
  *    long-lived multi-session JVMs don't accumulate dead references.
  */
object StageCache {

  private val stages =
    new ConcurrentHashMap[(SparkSession, String), DataFrame]

  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrCache(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          release(s)
      })
    }
    val k = (s, key)
    val existing = stages.get(k)
    if (existing != null) existing
    else {
      // build OUTSIDE the map update: stage builders recursively call
      // getOrCache for their dependency stages (doc_bigrams → doc_words,
      // lang_votes → doc_words), and ConcurrentHashMap forbids reentrant
      // modification from inside computeIfAbsent — the JDK throws
      // IllegalStateException("Recursive update") when the two keys land
      // in the same bin, a nondeterministic (identity-hash-dependent)
      // crash. get-then-putIfAbsent allows the nesting; on the (benign)
      // race a loser's cache mark is unpersisted before anything
      // materializes it.
      val built = build.cache()
      val prev = stages.putIfAbsent(k, built)
      if (prev != null) {
        try built.unpersist() catch { case _: Throwable => () }
        prev
      } else built
    }
  }

  /** Unpersist and forget every cached stage owned by `s`. */
  def release(s: SparkSession): Unit = {
    val it = stages.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        try e.getValue.unpersist() catch { case _: Throwable => () }
        it.remove()
      }
    }
    hooked.remove(s)
  }
}
