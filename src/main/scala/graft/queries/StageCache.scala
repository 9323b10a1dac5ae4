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

  /** Conf key for the write-time table root. When set and
    * `<root>/<sanitized key>` holds a committed parquet table (the
    * `index-sketches` CLI verb writes them), [[getOrCache]] and
    * [[readThroughOrBuild]] READ it instead of recomputing the stage —
    * the local realization of "at 100 TB this is a write-time column":
    * sketches/grams are computed once when the corpus is written, and
    * every query against them is a parquet scan with pushdown, not a
    * recompute. Only stages whose values are partitioning-independent
    * may be persisted (sketch signatures, digest splits, gram pairs —
    * NOT the Misra-Gries input stages, whose merge order is part of the
    * pinned result).
    */
  val PathConf = "spark.graft.stageCache.path"

  private def sanitize(key: String): String =
    key.replaceAll("[^A-Za-z0-9._-]", "_")

  /** A fingerprint of a source table directory: sorted (name, size) of
    * its data files. Cheap (pure filesystem stat) and catches the
    * driver's between-round testdata regeneration — the trap that
    * silently served stale events encodings before EventsEncodingSpec.
    * Callers include their derivation constants (shingle n, k, …) so a
    * parameter change also invalidates.
    */
  def sourceFingerprint(dirs: Seq[String], params: String): String = {
    val files = dirs.flatMap { d =>
      val f = new java.io.File(d)
      val children =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.toSeq
        else if (f.isFile) Seq(f)
        else Nil
      children.filterNot(_.getName.startsWith("_"))
        .map(c => s"${c.getName}:${c.length}")
    }.sorted
    s"$params|${files.mkString(",")}"
  }

  /** Like [[sourceFingerprint]] but RECURSIVE (relative-path:length over
    * the whole tree): required for doc_bucket/term_bucket-partitioned
    * tables, where a flat listing sees only the partition DIRECTORIES
    * and is blind to rewrites inside them. Metadata-only — a file-tree
    * walk, zero data read. */
  def treeFingerprint(dir: String, params: String): String = {
    def walk(f: java.io.File, rel: String): Seq[String] =
      if (f.isFile) Seq(s"$rel:${f.length}")
      else Option(f.listFiles()).toSeq.flatten
        .filterNot(_.getName.startsWith("_"))
        .flatMap(c => walk(c, if (rel.isEmpty) c.getName
                              else s"$rel/${c.getName}"))
    s"$params|${walk(new java.io.File(dir), "").sorted.mkString(",")}"
  }

  private def metaFile(dir: java.io.File) =
    new java.io.File(dir, "_graft_fingerprint")

  /** The ONE reader of the freshness protocol (committed marker +
    * recorded fingerprint): every staleness decision — tables or
    * artifacts — goes through this, so the contract cannot diverge. */
  private def recordedFingerprint(dir: java.io.File): Option[String] =
    if (!new java.io.File(dir, "_SUCCESS").isFile) None
    else {
      try Some(new String(java.nio.file.Files.readAllBytes(
        metaFile(dir).toPath), "UTF-8"))
      catch { case _: Throwable => None }
    }

  /** The persisted table for `key` — ONLY if it is committed AND its
    * recorded fingerprint matches the caller's expectation. A stale
    * table (source regenerated, constants changed) is ignored with a
    * log line rather than silently served: golden-pinned consumers
    * (d13) and bench runs have no oracle to catch it downstream.
    */
  private def persistedTable(s: SparkSession, key: String,
      fingerprint: Option[String]): Option[DataFrame] =
    s.conf.getOption(PathConf).flatMap { root =>
      val dir = new java.io.File(root, sanitize(key))
      recordedFingerprint(dir) match {
        case None => None
        case Some(have) =>
          fingerprint match {
            case Some(want) if want != have =>
              // scalastyle:off println
              println(s"[StageCache] persisted stage '$key' is STALE " +
                "(source fingerprint changed) — recomputing")
              // scalastyle:on println
              None
            case _ => Some(s.read.parquet(dir.toString))
          }
      }
    }

  /** True iff a committed persisted table for `key` exists under `root`
    * AND its recorded fingerprint matches — i.e. [[getOrCache]] with
    * `PathConf = root` would serve it. Lets batch builders
    * ([[WriteTimeTables.persistAll]]) skip stages that are already
    * current instead of rewriting identical bytes.
    */
  def isFresh(key: String, root: String,
      fingerprint: Option[String]): Boolean = {
    val dir = new java.io.File(root, sanitize(key))
    (fingerprint, recordedFingerprint(dir)) match {
      case (_, None) => false
      case (Some(want), Some(have)) => want == have
      case (None, Some(_)) => true
    }
  }

  /** Write a stage's rows as the persisted table [[getOrCache]] will
    * read through to, alongside the source fingerprint that guards
    * against serving it stale. Returns the table path.
    */
  /** Stage columns that are partition LAYOUT, not data: a stage carrying
    * one persists as a partitioned table, so read-through consumers get
    * PartitionFilters pruning on it (the lex_inverted postings read only
    * the query terms' term_bucket cells). */
  val PartitionColumns: Seq[String] = Seq("term_bucket")

  def persistStage(s: SparkSession, key: String, df: DataFrame,
      root: String, fingerprint: Option[String] = None): String = {
    val dir = new java.io.File(root, sanitize(key))
    val partCols = PartitionColumns.filter(df.columns.contains)
    val w = df.write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(dir.toString)
    fingerprint.foreach { fp =>
      java.nio.file.Files.write(metaFile(dir).toPath, fp.getBytes("UTF-8"))
    }
    dir.toString
  }

  /** Freshness check for a NON-TABULAR write-time artifact (a
    * persisted ANN index directory, not a parquet table): committed
    * and fingerprint-matched, the same contract [[isFresh]] gives
    * tables. The artifact's own writer calls [[commitArtifact]]. */
  def artifactFresh(dir: java.io.File, fingerprint: String): Boolean =
    recordedFingerprint(dir).contains(fingerprint)

  /** Commit a non-tabular artifact directory: record the fingerprint,
    * then the _SUCCESS marker LAST so a crash mid-write never leaves a
    * committed-looking stale artifact. */
  def commitArtifact(dir: java.io.File, fingerprint: String): Unit = {
    java.nio.file.Files.write(metaFile(dir).toPath,
      fingerprint.getBytes("UTF-8"))
    java.nio.file.Files.write(
      new java.io.File(dir, "_SUCCESS").toPath, Array.empty[Byte])
  }

  /** Read-through WITHOUT in-memory caching: the persisted table if one
    * exists (and matches `fingerprint`), else the built plan as-is. For
    * stages measured to be cheaper recomputed than cached (d9/d12's
    * gram pairs — a columnar cache of ~n_grams rows costs more than the
    * second computation), but which still profit from a write-time
    * table when one was persisted.
    */
  def readThroughOrBuild(s: SparkSession, key: String,
      fingerprint: Option[String] = None)(build: => DataFrame): DataFrame =
    persistedTable(s, key, fingerprint).getOrElse(build)

  private def levelOf(s: SparkSession): StorageLevel = {
    val name = s.conf.get(StorageLevelConf, "MEMORY_AND_DISK")
    try StorageLevel.fromString(name)
    catch { case _: IllegalArgumentException => StorageLevel.MEMORY_AND_DISK }
  }

  def getOrCache(s: SparkSession, key: String,
      fingerprint: Option[String] = None)(build: => DataFrame): DataFrame = {
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
      // Write-time table read-through: a persisted copy of this stage
      // replaces the compute plan (the scan is still persisted at the
      // session level so the many consumer actions share one IO pass).
      val built = persistedTable(s, key, fingerprint).getOrElse(build)
        .persist(levelOf(s))
      val prev = stages.putIfAbsent(k, built)
      if (prev != null) {
        try built.unpersist() catch { case _: Throwable => () }
        prev
      } else built
    }
  }

  /** True iff `key` is already registered for `s` — i.e. some consumer
    * already built (and, in the action-follows-build pattern every
    * catalog query has, materialized) the cached stage. Overlapped legs
    * use this to decide whether a shared dependency needs one
    * materializing pass BEFORE they fork — two concurrent jobs over an
    * unmaterialized cached stage otherwise both compute its blocks and
    * scan the source twice (r16: the VolumeEnvelopeGen cold measure of
    * v16 read 1012 corpus rows instead of 516 without this).
    */
  def contains(s: SparkSession, key: String): Boolean =
    stages.containsKey((s, key))

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
