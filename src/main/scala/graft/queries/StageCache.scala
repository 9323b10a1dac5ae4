package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

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
  *
  * Storage level is conf-gated: `spark.graft.stageCache.storageLevel`
  * (default MEMORY_AND_DISK — Dataset.cache()'s level). A 126-query
  * catalog's resident set is whatever the catalog touched; setting
  * MEMORY_AND_DISK_SER trades CPU (serde on re-read) for a several-×
  * smaller deserialized footprint, the standard lever when cached stages
  * start evicting each other. Any `StorageLevel.fromString` name is
  * accepted.
  */
object StageCache {

  private val stages =
    new ConcurrentHashMap[(SparkSession, String), DataFrame]

  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  /** Conf key for the persist level of every cached stage. */
  val StorageLevelConf = "spark.graft.stageCache.storageLevel"

  private def levelOf(s: SparkSession): StorageLevel = {
    val name = s.conf.get(StorageLevelConf, "MEMORY_AND_DISK")
    try StorageLevel.fromString(name)
    catch { case _: IllegalArgumentException => StorageLevel.MEMORY_AND_DISK }
  }

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
      val built = build.persist(levelOf(s))
      val prev = stages.putIfAbsent(k, built)
      if (prev != null) {
        try built.unpersist() catch { case _: Throwable => () }
        prev
      } else built
    }
  }

  /** Bytes (memory + disk) currently held by cached RDDs in `s`'s
    * context — the stage cache's residency plus any other caching the
    * session did. Feeds the bench record's peak-storage stamp and the
    * release log line.
    */
  def storageBytes(s: SparkSession): Long =
    try s.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
    catch { case _: Throwable => -1L }

  /** Unpersist and forget every cached stage owned by `s`. Logs the
    * released residency so a long-lived JVM's cache growth is observable
    * instead of inferred (the r7 bench-inflation question).
    */
  def release(s: SparkSession): Unit = {
    val before = storageBytes(s)
    var n = 0
    val it = stages.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        try e.getValue.unpersist() catch { case _: Throwable => () }
        it.remove()
        n += 1
      }
    }
    hooked.remove(s)
    if (n > 0) {
      // -1 = sample unavailable (release() via the application-end
      // listener runs while the context is tearing down)
      val bytes = if (before < 0) "n/a (context stopping)" else s"$before bytes"
      // scalastyle:off println
      println(s"[StageCache] released $n stages, storage before release: $bytes")
      // scalastyle:on println
    }
  }
}
