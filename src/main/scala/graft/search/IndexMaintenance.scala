package graft.search

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

import graft.ingest.TableSwap

/** Incremental maintenance of a persisted list-partitioned ANN index
  * (`embeddings_ivf` / `embeddings_ivfpq` / `embeddings_ivfsq`).
  *
  * A re-ingest replaces the entity tables document-by-document
  * ([[graft.ingest.IngestPipeline.replaceDocuments]]), but the ANN index is
  * partitioned by `list_id`, not by document — so the reference's
  * cascade-then-rewrite recipe (storage/cascade.py:64-160) cannot simply
  * overwrite a document partition, and a full index rebuild after every
  * incremental batch is the 100 TB anti-pattern (rebuilding a corpus-sized
  * index to absorb a 0.01% delta).
  *
  * The scalable operation, implemented here:
  *
  *  1. encode ONLY the incoming rows with the FROZEN quantizer/codebook —
  *     assignment is pure per-row map work, so a delta batch costs
  *     O(delta), never O(corpus);
  *  2. compute the affected list set = lists holding any replaced
  *     document's rows ∪ lists receiving new rows (bounded by k, collected
  *     to the driver as ints);
  *  3. rebuild just those partitions (partition-pruned scan of the
  *     affected lists, anti-join out the replaced documents, union the
  *     freshly encoded rows);
  *  4. swap each rebuilt partition directory into place with the same
  *     crash-recoverable stage-then-swap protocol the entity tables use
  *     ([[graft.ingest.TableSwap]]) — every crash point rolls forward or
  *     back per list, and [[recover]] heals a torn update on next access.
  *
  * Freezing the quantizer is the standard IVF maintenance contract (FAISS
  * `add` after `train`): centroids drift only with major distribution
  * shift, at which point a full retrain/rebuild is an explicit operation.
  * Untouched lists are not read, not rewritten, and their files are left
  * byte-identical (spec-asserted) — at 100 TB that is the difference
  * between rewriting ~nprobe-sized slices and rewriting the corpus.
  */
object IndexMaintenance {

  final case class UpdateStats(
      affectedLists: Seq[Int],
      rewrittenRows: Long,
      incomingRows: Long)

  /** Update a list-partitioned index in place for a replaced/added document
    * batch. `incoming` holds the batch's NEW embedding rows (same schema
    * the index was built from, without `list_id`); every document appearing
    * in `incoming` has ALL its index rows replaced (cascade semantics) —
    * deleted documents can be passed as zero-row documents via `dropDocs`.
    *
    * @param encode turns incoming rows into index rows (must add `list_id`
    *               and any code columns the index carries — pass
    *               `Ivf.buildIndex(_, q)` for a plain IVF index, compose
    *               with `Pq.encode` for IVFPQ/IVFSQ).
    */
  def updateIndex(spark: SparkSession, indexPath: String,
      incoming: DataFrame, encode: DataFrame => DataFrame,
      docKey: String = "document_id", sortCol: String = "fragment_id",
      dropDocs: Seq[String] = Nil): UpdateStats = {
    recover(indexPath)
    val encoded = encode(incoming)
    require(encoded.schema.fieldNames.contains("list_id"),
      "encode must add the list_id partition column")

    import spark.implicits._
    val replacedDocs =
      (incoming.select(col(docKey).cast("string")).distinct()
        .as[String].collect().toSeq ++ dropDocs).distinct
    val docsDf = replacedDocs.toDF(docKey)

    // affected lists: where the replaced docs' rows live now, plus where
    // the re-encoded rows land. Both sides are delta-sized scans — the
    // existing-side lookup reads only the docKey/list_id columns.
    val existing = spark.read.parquet(indexPath)
    val oldLists = existing.join(broadcast(docsDf), Seq(docKey), "left_semi")
      .select(col("list_id").cast("int")).distinct().as[Int].collect()
    val newLists = encoded
      .select(col("list_id").cast("int")).distinct().as[Int].collect()
    val affected = (oldLists ++ newLists).distinct.sorted.toSeq
    if (affected.isEmpty)
      return UpdateStats(Nil, 0L, 0L)

    // schema contract: the frozen encoder must reproduce every index
    // column (a stray source-layout column baked into an old index, e.g.
    // doc_bucket, means the index predates the layout-column drop at
    // build time — rebuild it rather than fabricate values here)
    val missing = existing.columns.toSet -- encoded.columns.toSet
    require(missing.isEmpty,
      s"index at $indexPath carries columns the encoder does not produce " +
        s"(${missing.mkString(", ")}); rebuild the index")

    // rebuild ONLY the affected partitions: partition-pruned scan →
    // anti-join out every replaced document → union the new rows
    val rebuilt = existing
      .filter(col("list_id").isin(affected.map(Integer.valueOf): _*))
      .join(broadcast(docsDf), Seq(docKey), "left_anti")
      .unionByName(encoded.select(existing.columns.map(col): _*))

    // stage the rebuilt partitions as one parquet write, then swap each
    // partition directory with TableSwap's recoverable protocol
    val staging = s"$indexPath.update-staging"
    TableSwap.rmTreeAt(staging)
    rebuilt.repartition(col("list_id"))
      .sortWithinPartitions(sortCol)
      .write.partitionBy("list_id").parquet(staging)
    // explicit schema: a pure deletion can stage ZERO rows (every affected
    // list emptied), and a schema-less read of a file-less staging dir
    // fails with UNABLE_TO_INFER_SCHEMA
    val nRewritten =
      spark.read.schema(rebuilt.schema).parquet(staging).count()

    affected.foreach { list =>
      val stagedDir = Paths.get(staging, s"list_id=$list")
      // a list can end up empty (its only doc was replaced away): swap in
      // an empty directory so the partition disappears cleanly; a BRAND-NEW
      // list has no live directory yet — create one so the swap protocol
      // (which moves live aside first) applies uniformly
      if (!Files.exists(stagedDir)) Files.createDirectories(stagedDir)
      val liveDir = Paths.get(s"$indexPath/list_id=$list")
      if (!Files.exists(liveDir)) Files.createDirectories(liveDir)
      TableSwap.swap(s"$indexPath/list_id=$list") { partStaging =>
        Files.move(stagedDir, Paths.get(partStaging))
      }
    }
    TableSwap.rmTreeAt(staging)
    UpdateStats(affected, nRewritten, encoded.count())
  }

  /** Heal any torn partition swap left by a crash mid-[[updateIndex]]:
    * run TableSwap recovery for every partition directory that has swap
    * leftovers, and drop a stale staging table. Called automatically at
    * the start of every update; index readers should call it after an
    * unclean shutdown.
    */
  def recover(indexPath: String): Seq[String] = {
    val root = Paths.get(indexPath)
    if (!Files.exists(root)) return Nil
    import scala.jdk.CollectionConverters._
    val actions = Files.list(root).iterator().asScala.toSeq
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("list_id=") &&
        (n.endsWith(".staging") || n.endsWith(".old")))
      .map(n => n.stripSuffix(".staging").stripSuffix(".old"))
      .distinct.sorted
      .flatMap { base =>
        TableSwap.recoverSwap(s"$indexPath/$base").map(a => s"$base: $a")
      }
    TableSwap.rmTreeAt(s"$indexPath.update-staging")
    actions
  }
}
