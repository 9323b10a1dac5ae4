package graft.search

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.TableSwap
import graft.queries.StageCache

/** A term-partitioned inverted postings index for the lexical (BM25)
  * channel of hybrid serving — the write-time artifact that makes
  * `Cli hybrid-search` a PRUNED read instead of a corpus scan.
  *
  * Without it, every hybrid query re-tokenizes the whole fragments
  * table three times (corpus stats, df census, scoring scan): O(corpus)
  * per query, which at 100 TB dwarfs the query itself. The reference
  * sidesteps the problem by delegating lexical retrieval to an LLM
  * keyword stage (retrieval/pipeline.py:155 — the X16 fallback this
  * engine already mirrors rule-based); a Spark-native engine's answer is
  * the classic IR one: an inverted index, laid out for partition
  * pruning.
  *
  * Layout (all under the tables dir, same lifecycle as the ANN
  * indexes):
  *
  *  - `lex_postings/` — one row per (term, fragment): `(term, id,
  *    doc_id, tf, dl)`, partitioned by `term_bucket` = "b" +
  *    md5(term)[0,2) (256 cells; the "b" prefix keeps partition-value
  *    type inference from ever reading an all-digit sample as INT).
  *    A query's terms hit ≤|q| buckets: the scan is partition-pruned to
  *    ~|q|/256 of the index, and rows are sorted by term within each
  *    partition so parquet row-group stats prune further.
  *  - `lex_postings.delta/batch=<k>/` — reingest deltas, applied in
  *    batch order at read time: `del` rows carry the replaced doc_ids
  *    (removal needs no term knowledge — an anti-join on doc_id), `ins`
  *    rows are the new fragments' postings. Lucene-segment shape:
  *    maintenance writes one bounded batch, never rewrites the base;
  *    [[compact]] folds batches back in.
  *  - `lex_stats.txt` — `n sum_dl` (exact longs; avgdl = sum_dl/n is
  *    then bit-identical to the scan path's aggregate) plus the
  *    fragments table's metadata fingerprint. Serving REFUSES a stale
  *    sidecar — a reingest that skipped the lex step must be loud, not
  *    a silent mis-rank (the ivf_q_hash contract). The check is a
  *    file-tree walk, never a data read.
  *
  * The pruned path is bit-for-bit the scan path: integer tf/df/dl/n
  * facts are identical by construction, and the per-document score sums
  * term contributions in the same fixed query-term order with the same
  * literal-idf expression shape, so the doubles agree exactly
  * (LexIndexSpec pins serve-path equality; x25 oracles the pruned
  * scoring against DuckDB's full-scan replay).
  */
object LexIndex {

  /** Number of term_bucket partition cells (two hex digits). */
  val Buckets = 256

  final case class Stats(n: Long, sumDl: Long, tableFp: String)

  def indexPath(tablesDir: String): String = s"$tablesDir/lex_postings"
  def deltaPath(tablesDir: String): String = s"$tablesDir/lex_postings.delta"
  def statsPath(tablesDir: String): String = s"$tablesDir/lex_stats.txt"

  def exists(tablesDir: String): Boolean =
    Files.isDirectory(Paths.get(indexPath(tablesDir))) &&
      Files.exists(Paths.get(statsPath(tablesDir)))

  /** The partition cell of a term — column form. */
  def bucketCol(term: Column): Column =
    concat(lit("b"), substring(md5(term), 1, 2))

  /** The partition cell of a term — driver form (must equal
    * [[bucketCol]]'s md5 hex exactly; both are lowercase hex of the
    * UTF-8 bytes). */
  def bucketOf(term: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes(StandardCharsets.UTF_8))
    f"b${d(0)}%02x"
  }

  /** Postings rows of a (id, doc_id, text) table: one row per distinct
    * (term, fragment) with its exact tf, the fragment's dl carried
    * denormalized (BM25 needs it next to tf; one long per row). Same
    * tokenizer as calibration/scan ([[graft.functions.TextSketch.words]]).
    */
  def postingsOf(frags: DataFrame, idCol: String = "id",
      docIdCol: String = "document_id", textCol: String = "content")
      : DataFrame =
    postingsOfTokens(frags.select(
      col(idCol).cast("string").as("id"),
      col(docIdCol).cast("string").as("doc_id"),
      graft.functions.TextSketch.words(col(textCol)).as("__w")),
      "id", "doc_id", "__w")

  /** [[postingsOf]] over an already-tokenized table — lets a caller
    * reuse a shared words stage so the postings agree token-for-token
    * with every other consumer of that stage (x25's contract with
    * x22). Id column types pass through unchanged (the catalog's long
    * doc_ids must stay long — a string cast would silently change
    * tie-break ordering). */
  def postingsOfTokens(toks: DataFrame, idCol: String,
      docIdCol: String, tokensCol: String): DataFrame =
    toks
      .select(col(idCol).as("id"), col(docIdCol).as("doc_id"),
        size(col(tokensCol)).cast("long").as("dl"),
        explode(col(tokensCol)).as("term"))
      .groupBy(col("term"), col("id"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("term_bucket", bucketCol(col("term")))

  /** Exact corpus stats of a fragments table — the same two longs the
    * scan path aggregates (n = fragment rows, sum_dl = Σ token counts). */
  def statsOf(frags: DataFrame, textCol: String = "content")
      : (Long, Long) = {
    val r = frags
      .agg(count(lit(1)).as("n"),
        sum(size(graft.functions.TextSketch.words(col(textCol))))
          .cast("long").as("sum_dl"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private def saveStats(tablesDir: String, n: Long, sumDl: Long): Unit =
    Files.write(Paths.get(statsPath(tablesDir)),
      (s"$n $sumDl\n" +
        s"${FusionFloor.tableFingerprint(s"$tablesDir/fragments")}\n")
        .getBytes(StandardCharsets.UTF_8))

  def loadStats(tablesDir: String): Stats = {
    val lines = new String(
      Files.readAllBytes(Paths.get(statsPath(tablesDir))),
      StandardCharsets.UTF_8).linesIterator.toSeq
    val parts = lines.head.trim.split(" ")
    Stats(parts(0).toLong, parts(1).toLong,
      lines.lift(1).map(_.trim).getOrElse(""))
  }

  /** Staleness guard: the stamped fragments fingerprint must match the
    * live table's tree listing. Metadata-only (the fusion-floor
    * contract). */
  def requireFresh(st: Stats, tablesDir: String): Unit =
    require(st.tableFp ==
        FusionFloor.tableFingerprint(s"$tablesDir/fragments"),
      s"lex index at ${indexPath(tablesDir)} is STALE (the fragments " +
        "table was rewritten since the index was built/maintained) — " +
        "re-run lex-index (Cli reingest maintains it automatically)")

  /** Full build from the live fragments table: stage-then-swap the base
    * postings (partitioned by term_bucket, term-sorted within each
    * partition for row-group pruning), drop any deltas (they described
    * the OLD base), stats sidecar LAST so a crash anywhere before it
    * leaves a loudly-stale index, never a silently-wrong one. */
  def build(spark: SparkSession, tablesDir: String): Stats = {
    val frags = spark.read.parquet(s"$tablesDir/fragments")
    val base = indexPath(tablesDir)
    TableSwap.recoverSwap(base)
    def writeStaging(staging: String): Unit =
      postingsOf(frags)
        .repartition(col("term_bucket"))
        .sortWithinPartitions("term", "id")
        .write.partitionBy("term_bucket").parquet(staging)
    if (Files.isDirectory(Paths.get(base))) TableSwap.swap(base)(writeStaging)
    else {
      // first build: no live table to roll — stage then move, so a
      // crash mid-write leaves only a .staging that recoverSwap drops
      TableSwap.rmTreeAt(s"$base.staging")
      writeStaging(s"$base.staging")
      Files.move(Paths.get(s"$base.staging"), Paths.get(base))
    }
    TableSwap.rmTreeAt(deltaPath(tablesDir))
    val (n, sumDl) = statsOf(frags)
    saveStats(tablesDir, n, sumDl)
    loadStats(tablesDir)
  }

  private def allBatchDirs(tablesDir: String): Seq[(Int, java.io.File)] = {
    val root = new java.io.File(deltaPath(tablesDir))
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(f => f.getName.stripPrefix("batch=").toInt -> f)
      .sortBy(_._1)
  }

  // only committed batches participate in reads — a torn delta write
  // has no _SUCCESS and is invisible (and the sidecar it never
  // restamped keeps serving hard-erroring until maintenance reruns)
  private def batchDirs(tablesDir: String): Seq[(Int, String)] =
    allBatchDirs(tablesDir).collect {
      case (k, f) if new java.io.File(f, "_SUCCESS").isFile =>
        k -> f.getPath
    }

  /** One reingest maintenance step: append a delta batch (del rows for
    * the replaced documents, ins postings for their new fragments),
    * then restamp the stats sidecar from the live (post-swap) fragments
    * table. The base never rewrites. Crash order: batch dir commits via
    * its _SUCCESS, sidecar last — any tear degrades to the staleness
    * hard error. */
  def appendDelta(spark: SparkSession, tablesDir: String,
      replacedDocIds: Seq[String], newFrags: DataFrame): Int = {
    import spark.implicits._
    // number past EVERY batch dir, committed or torn — a crashed write
    // left an uncommitted (read-invisible) batch=k that must not block
    // the retry's errorifexists; the dead dir is swept at compaction
    val k = allBatchDirs(tablesDir).lastOption.map(_._1 + 1).getOrElse(0)
    val ins = postingsOf(newFrags).withColumn("op", lit("ins"))
    val del = replacedDocIds.toDF("doc_id")
      .select(lit(null).cast("string").as("term"),
        lit(null).cast("string").as("id"), col("doc_id"),
        lit(null).cast("long").as("dl"), lit(null).cast("long").as("tf"),
        lit("_del").as("term_bucket"), lit("del").as("op"))
    ins.unionByName(del)
      // bucket-grouped, term-sorted files: bounded file count per batch
      // and row-group stats that prune delta reads the way the base's do
      .repartition(col("term_bucket"))
      .sortWithinPartitions("term", "id")
      .write.mode("errorifexists")
      .parquet(s"${deltaPath(tablesDir)}/batch=$k")
    val (n, sumDl) = statsOf(spark.read.parquet(s"$tablesDir/fragments"))
    saveStats(tablesDir, n, sumDl)
    k
  }

  /** The merged postings restricted to `qTerms`: base pruned to the
    * terms' partition cells (PartitionFilters — ~|q|/256 of the index
    * reads), then each committed delta batch applied in order (del =
    * broadcast anti-join on doc_id, ins = pruned union). With no terms
    * given, no term pruning (compaction's full merge). */
  def prunedPostings(spark: SparkSession, tablesDir: String,
      qTerms: Seq[String]): DataFrame = {
    def prune(df: DataFrame): DataFrame =
      if (qTerms.isEmpty) df
      else df
        .filter(col("term_bucket").isin(qTerms.map(bucketOf).distinct: _*))
        .filter(col("term").isin(qTerms: _*))
    val cols = Seq("term", "id", "doc_id", "dl", "tf", "term_bucket")
      .map(col)
    var cur = prune(spark.read.parquet(indexPath(tablesDir)))
      .select(cols: _*)
    batchDirs(tablesDir).foreach { case (_, dir) =>
      val b = spark.read.parquet(dir)
      val dels = b.filter(col("op") === "del").select(col("doc_id"))
      val ins = prune(b.filter(col("op") === "ins")).select(cols: _*)
      cur = cur.join(broadcast(dels), Seq("doc_id"), "left_anti")
        .unionByName(ins)
    }
    cur
  }

  /** Fold every delta batch into the base and drop them. Idempotent
    * against any crash point: re-applying a batch over an already-
    * compacted base anti-joins away exactly the rows its own ins set
    * re-adds, so recovery is just "run compact again". Batches delete
    * oldest-first for the same reason. */
  def compact(spark: SparkSession, tablesDir: String): Int = {
    val batches = batchDirs(tablesDir)
    if (batches.isEmpty) return 0
    val merged = prunedPostings(spark, tablesDir, Nil)
    val base = indexPath(tablesDir)
    TableSwap.recoverSwap(base)
    TableSwap.swap(base) { staging =>
      merged
        .repartition(col("term_bucket"))
        .sortWithinPartitions("term", "id")
        .write.partitionBy("term_bucket").parquet(staging)
    }
    batches.foreach { case (_, dir) => TableSwap.rmTreeAt(dir) }
    TableSwap.rmTreeAt(deltaPath(tablesDir))
    batches.size
  }

  /** Delta-batch count past which maintenance folds the segments back
    * into the base: each batch adds one anti-join to every serve plan,
    * so an unbounded tail would make reads degrade linearly with
    * maintenance history (the LSM compaction argument). */
  val MaxBatches = 8

  /** [[compact]] iff the committed batch count exceeds `maxBatches` —
    * the reingest step's self-limiting call. Returns folded count (0 =
    * left alone). */
  def maybeCompact(spark: SparkSession, tablesDir: String,
      maxBatches: Int = MaxBatches): Int =
    if (batchDirs(tablesDir).size > maxBatches) compact(spark, tablesDir)
    else 0

  /** Document frequencies of `qTerms` over the merged pruned postings:
    * ≤|q| rows back to the driver. */
  def dfOf(spark: SparkSession, tablesDir: String, qTerms: Seq[String])
      : Map[String, Long] = {
    import spark.implicits._
    if (qTerms.isEmpty) Map.empty
    else prunedPostings(spark, tablesDir, qTerms)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
  }

  /** BM25 top-`c` over the pruned postings — bit-for-bit the scan
    * path's scores: per-fragment term contributions pivot out of the
    * postings (`sum(when(term = t, tf) else 0)` is the exact integer
    * the scan path's array filter counts) and fold in the caller's
    * fixed `inCorpus` term order with the same literal-idf expression.
    * Only fragments containing ≥1 query term can appear (score > 0
    * strictly — idf > 0 always holds for Okapi's +1 form). */
  def scoreTopC(spark: SparkSession, tablesDir: String,
      inCorpus: Seq[String], dfMap: Map[String, Long], n: Long,
      avgdl: Double, c: Int,
      eligible: Option[DataFrame] = None): Seq[(String, Double)] = {
    import spark.implicits._
    if (inCorpus.isEmpty) return Nil
    // metadata scoping is FILTER-BEFORE-RANK (the F1/F2 contract):
    // `eligible` (a one-column "id" set, e.g. fragments of one view)
    // semi-joins into the pruned postings before any score or limit.
    // Corpus statistics (df/n/avgdl) stay GLOBAL — the Postgres
    // FTS-with-WHERE semantics the reference pairs pgvector with: the
    // predicate restricts candidates, not the language model.
    val pruned0 = prunedPostings(spark, tablesDir, inCorpus)
    val pruned = eligible.fold(pruned0)(e =>
      pruned0.join(e.select(col("id")), Seq("id"), "left_semi"))
    val tfCols: Seq[Column] = inCorpus.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"tf_$i")
    }
    val perFrag = pruned.groupBy(col("id"), col("dl")).agg(
      tfCols.head, tfCols.tail: _*)
    val termScores: Seq[Column] = inCorpus.zipWithIndex.map {
      case (t, i) =>
        val idfT = FusionGate.idf(dfMap(t), n)
        val tf = col(s"tf_$i").cast("double")
        lit(idfT) * (tf * lit(FusionGate.K1 + 1)) /
          (tf + lit(FusionGate.K1) * (lit(1 - FusionGate.B) +
            lit(FusionGate.B) *
              (col("dl").cast("double") / lit(avgdl))))
    }
    perFrag.select(col("id"), termScores.reduce(_ + _).as("bm25"))
      .orderBy(col("bm25").desc, col("id")).limit(c)
      .as[(String, Double)].collect().toSeq
  }
}
