package graft.search

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The gated-fusion floor as a MAINTAINED write-time artifact of a
  * tables directory (VERDICT r14 task 8): [[FusionGate]]'s corpus-
  * calibrated confidence floor, persisted beside the entity tables and
  * kept consistent with them by `Cli reingest` — the same lifecycle as
  * the ANN index artifacts (ivf_quantizer / pq_codebook sidecars).
  *
  * The artifact is keyed by an exact integer corpus fingerprint
  * (`n · 1000000007 + Σ doc_len`, the v24 convention): serving loads
  * the sidecar, recomputes the fingerprint of the corpus it is about
  * to retrieve from, and HARD-ERRORS on a mismatch — a floor calibrated
  * on yesterday's corpus silently mis-gates today's queries, which is
  * the same failure class as serving from a stale index (the ivf_q_hash
  * lesson applied to a scalar artifact).
  *
  * Calibration is the production recipe of
  * [[graft.queries.VectorQueries]]'s v24 floor build: CalibN documents
  * first in md5(id) order (deterministic, uncorrelated with ingest
  * order), each self-matched against its own thinned tokens under the
  * corpus df census, floor = p75 of that distribution. One bounded
  * sample + one census scan — map-side at 100 TB.
  */
object FusionFloor {

  /** `corpusFp` is the exact content fingerprint (n·1000000007 + Σdl —
    * what the v24 oracle keys on); `tableFp` is a METADATA-ONLY
    * fingerprint of the fragments table's RECURSIVE file listing
    * (relative-path:length — Spark part names carry write-UUIDs, so any
    * rewrite changes it; recursion matters because writeTable partitions
    * by doc_bucket, and a top-level listing of partition DIRECTORIES is
    * blind to rewrites inside them). Serving checks `tableFp`: freshness
    * costs a file-tree walk, never a corpus scan — at 100 TB a per-query
    * O(corpus) tokenize pass just to validate a scalar would dwarf the
    * query itself. Legacy sidecars without the line fall back to the
    * exact scan. */
  final case class Artifact(corpusFp: Long, floor: Double,
      tableFp: String = "")

  /** Exact integer corpus fingerprint — both engines and the sidecar
    * agree on BIGINT arithmetic (no float drift possible). */
  def corpusFp(n: Long, sumDl: Long): Long = n * 1000000007L + sumDl

  private def tokensOf(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).cast("string").as("__id"),
      graft.functions.TextSketch.words(col(textCol)).as("__w"))

  /** The corpus fingerprint of a (id, text) table — one aggregate scan. */
  def currentFp(df: DataFrame, idCol: String = "id",
      textCol: String = "content"): Long = {
    val r = tokensOf(df, idCol, textCol)
      .agg(count(lit(1)).as("n"), sum(size(col("__w"))).as("sum_dl"))
      .head()
    corpusFp(r.getLong(0), r.getLong(1))
  }

  /** Metadata-only fingerprint of a table directory (see [[Artifact]]):
    * every data file under the tree as relative-path:length, sorted.
    * Recursive (via [[graft.queries.StageCache.treeFingerprint]]) because
    * writeTable partitions by doc_bucket and a flat listing of partition
    * directories is blind to rewrites inside them. */
  def tableFingerprint(tableDir: String): String =
    graft.queries.StageCache.treeFingerprint(tableDir, "fusion_floor")

  /** Distributed calibration over a (id, text) table: md5-ordered
    * CalibN sample, census df semi-joined to the sample's vocabulary,
    * p75 thinned self-match floor. Pass `tableDir` so the artifact
    * records the cheap serving-time freshness witness. */
  def calibrate(df: DataFrame, idCol: String = "id",
      textCol: String = "content", tableDir: Option[String] = None)
      : Artifact = {
    val s = df.sparkSession
    import s.implicits._
    val toks = tokensOf(df, idCol, textCol)
    val stats = toks
      .agg(count(lit(1)).as("n"), sum(size(col("__w"))).as("sum_dl"))
      .head()
    val n = stats.getLong(0)
    val sumDl = stats.getLong(1)
    require(n > 0, "fusion floor calibration over an empty corpus")
    val avgdl = sumDl.toDouble / n.toDouble
    val sample = toks.orderBy(md5(col("__id"))).limit(FusionGate.CalibN)
      .as[(String, Seq[String])].collect()
    val vocab = sample.flatMap(_._2).distinct
    val dfMap: Map[String, Long] = toks
      .select(explode(array_distinct(col("__w"))).as("t"))
      .join(broadcast(vocab.toSeq.toDF("t")), Seq("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    val floor = FusionGate.floorOf(sample.toSeq.map { case (_, ts) =>
      FusionGate.selfNorm(ts, t => dfMap.getOrElse(t, 0L), n, avgdl)
    })
    Artifact(corpusFp(n, sumDl), floor,
      tableDir.map(tableFingerprint).getOrElse(""))
  }

  /** Sidecar text form: `<corpus_fp> <floor>` on line 1 (Double.toString
    * round-trips the exact bits, the [[Ivf.save]] convention), the
    * metadata table fingerprint on line 2 (absent for legacy sidecars). */
  def save(a: Artifact, path: String): Unit =
    Files.write(Paths.get(path),
      (s"${a.corpusFp} ${a.floor}\n" +
        (if (a.tableFp.nonEmpty) s"${a.tableFp}\n" else ""))
        .getBytes(StandardCharsets.UTF_8))

  def load(path: String): Artifact = {
    val lines = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8).linesIterator.toSeq
    val parts = lines.head.trim.split(" ")
    Artifact(parts(0).toLong, parts(1).toDouble,
      lines.lift(1).map(_.trim).getOrElse(""))
  }

  def exists(path: String): Boolean = Files.exists(Paths.get(path))

  /** The serving-time freshness guard: refuse to gate with a floor
    * calibrated on a different corpus. */
  def requireFresh(a: Artifact, current: Long, path: String): Unit =
    require(a.corpusFp == current,
      s"fusion floor at $path is STALE (calibrated on corpus_fp=" +
        s"${a.corpusFp}, current corpus_fp=$current) — the corpus " +
        "changed without a floor refresh; re-run fusion-calibrate " +
        "(Cli reingest refreshes it automatically)")

  /** The guard at its serving cost: a stamped sidecar validates against
    * the table's FILE LISTING (one directory list — O(files), zero
    * data read); a legacy sidecar falls back to the exact corpus-scan
    * fingerprint via `exactFp`. */
  def requireFreshAt(a: Artifact, tableDir: String, path: String)(
      exactFp: => Long): Unit =
    if (a.tableFp.nonEmpty)
      require(a.tableFp == tableFingerprint(tableDir),
        s"fusion floor at $path is STALE (the table at $tableDir was " +
          "rewritten since calibration) — re-run fusion-calibrate " +
          "(Cli reingest refreshes it automatically)")
    else requireFresh(a, exactFp, path)
}
