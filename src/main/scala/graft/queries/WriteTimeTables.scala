package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One place that knows EVERY write-time table the query families
  * promise (dedup sketch/gram stages, BM25 posting + stats, hybrid
  * cosine side) — the tables `Cli index-sketches` persists and
  * [[StageCache]] reads through to. Centralised so the CLI verb and the
  * bench's read-through mode build exactly the same set: "at 100 TB
  * this is a parquet scan" is only a credible claim when the artifact
  * of record exercises the same tables production would.
  */
object WriteTimeTables {

  /** (fingerprint, stages) per owning family. Computing a stage plan is
    * lazy; nothing here runs a job.
    */
  def stageSets(s: SparkSession, sfDir: String)
      : Seq[(Option[String], Map[String, DataFrame])] = Seq(
    (DedupQueries.writeTimeFingerprint(sfDir),
      DedupQueries.writeTimeStages(s, sfDir)),
    (TextAnalysisQueries.writeTimeFingerprint(sfDir),
      TextAnalysisQueries.writeTimeStages(s, sfDir)),
    (VectorQueries.writeTimeFingerprint(sfDir),
      VectorQueries.writeTimeStages(s, sfDir)))

  /** Build + persist every write-time table for `sfDir` under `root`,
    * skipping tables that are already committed with a matching source
    * fingerprint. MUST run with [[StageCache.PathConf]] unset (a
    * read-through build would scan the very paths it is about to
    * overwrite); the caller owns conf hygiene. Returns
    * (persisted, skipped-fresh) counts.
    */
  def persistAll(s: SparkSession, sfDir: String, root: String,
      log: String => Unit = _ => ()): (Int, Int) = {
    require(s.conf.getOption(StageCache.PathConf).isEmpty,
      s"unset ${StageCache.PathConf} before building write-time tables")
    var persisted = 0
    var skipped = 0
    stageSets(s, sfDir).foreach { case (fp, stages) =>
      stages.toSeq.sortBy(_._1).foreach { case (key, df) =>
        if (StageCache.isFresh(key, root, fp)) {
          skipped += 1
          log(s"[index-sketches] $key fresh, skipped")
        } else {
          val path = StageCache.persistStage(s, key, df, root, fp)
          val n = s.read.parquet(path).count()
          persisted += 1
          log(s"[index-sketches] $key -> $path ($n rows)")
        }
      }
    }
    // ANN index TABLES (r11): IVF / PQ / SQ / IVFPQ / HNSW-adjacency —
    // deferred builders, because constructing the plan trains a
    // quantizer (a sample collect) that a freshness-skip must not pay.
    // One shared builder per table (MediaQueries) keeps the persisted
    // copy and the queries' recompute from drifting.
    val annFp = MediaQueries.annIndexFingerprint(sfDir)
    MediaQueries.annIndexStages(sfDir).foreach { case (key, build) =>
      if (StageCache.isFresh(key, root, annFp)) {
        skipped += 1
        log(s"[index-sketches] $key fresh, skipped")
      } else {
        val path = StageCache.persistStage(s, key, build(s), root, annFp)
        val n = s.read.parquet(path).count()
        persisted += 1
        log(s"[index-sketches] $key -> $path ($n rows)")
      }
    }
    // the v24 fusion floor (r16): a DEFERRED 1-row table — constructing
    // its plan runs the calibration jobs (sample collect + vocabulary
    // census), so a freshness-skip must not build the DataFrame (the
    // ANN-stage rule). The builder also refreshes the oracle-read
    // localdata floor artifact as a side effect, so the persisted table
    // and the artifact can never disagree.
    val floorKey = s"fusion_floor:$sfDir"
    val floorFp = Some(VectorQueries.fusionFloorFingerprint(sfDir))
    if (StageCache.isFresh(floorKey, root, floorFp)) {
      skipped += 1
      log(s"[index-sketches] $floorKey fresh, skipped")
    } else {
      val path = StageCache.persistStage(s, floorKey,
        VectorQueries.fusionFloorBuild(s, sfDir), root, floorFp)
      persisted += 1
      log(s"[index-sketches] $floorKey -> $path")
    }
    // the SQL serving indexes are write-time ARTIFACTS (directories,
    // not single parquet tables): the v18/v19 HNSW graph and the v20
    // IVF table+quantizer build here so their cost lands in the
    // one-time build second, and the read-through catalog pays only
    // the walk/probe. Fingerprints and builders are VectorQueries'
    // own — one source of truth, or a constant drift would hand the
    // timed pass a rebuild.
    val artifacts: Seq[(String, String, String => Unit)] = Seq(
      ("v18_hnsw", VectorQueries.v18IndexFingerprint(sfDir),
        VectorQueries.buildV18Index(s, sfDir, _)),
      ("v20_ivf", VectorQueries.v20IndexFingerprint(sfDir),
        VectorQueries.buildV20Index(s, sfDir, _)),
      // the maintained artifact (v21): base build + one delta batch —
      // write-time here means the read-through pass times the SERVE of
      // a reingest, the cost profile a maintained production index has
      ("v21_hnsw_maint", VectorQueries.v21IndexFingerprint(sfDir),
        VectorQueries.buildV21Index(s, sfDir, _)),
      // the ROUTED maintained artifact (v25): routed base build + one
      // routed delta — the serving pass pays only the pruned walk
      ("v25_hnsw_routed_maint", VectorQueries.v25IndexFingerprint(sfDir),
        VectorQueries.buildV25RoutedIndex(s, sfDir, _)))
    artifacts.foreach { case (name, fp, build) =>
      val d = new java.io.File(root, name)
      if (StageCache.artifactFresh(d, fp)) {
        skipped += 1
        log(s"[index-sketches] $name fresh, skipped")
      } else {
        graft.ingest.TableSwap.rmTreeAt(d.toString)
        build(d.toString)
        StageCache.commitArtifact(d, fp)
        persisted += 1
        log(s"[index-sketches] $name -> $d")
      }
    }
    (persisted, skipped)
  }
}
