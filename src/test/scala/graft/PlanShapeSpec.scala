package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLayout

/** Physical-plan regression guards: the scale properties argued in the
  * scaladocs must be visible in the executed plans, not just intended.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    // stale warehouse files from a previous JVM break saveAsTable
    val wh = java.nio.file.Paths.get("/tmp/graft-warehouse")
    if (java.nio.file.Files.exists(wh)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(wh).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    spark = GraftSession.builder("local[2]", "4")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("f1: filters reach the parquet scan, schema pruned") {
    val p = plan("f1_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull"))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"))
  }

  test("t1/v1: top-k plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("t1_topk").contains("TakeOrderedAndProject"))
    val v1 = plan("v1_knn_exact")
    assert(v1.contains("TakeOrderedAndProject"))
    assert(!v1.contains("Exchange rangepartitioning")) // no sort shuffle
  }

  test("hnsw batch search: shard graphs feed ONE query_id shuffle, no join, no cartesian") {
    import graft.search.Hnsw
    val s = spark
    import s.implicits._
    val df = (0 until 64)
      .map(i => (f"f$i%04d", Array.fill(8)((i % 7).toFloat + 1)))
      .toDF("fragment_id", "vector")
    val res = Hnsw.searchBatch(df, Seq(("q0", Array.fill(8)(1f))), 5,
      ef = 16, numShards = 4)
    val p = res.queryExecution.executedPlan.toString
    // per-shard results merge through exactly one hash exchange (the
    // query_id window) — the graph answers locally; nothing joins,
    // nothing goes quadratic
    assert(p.contains("Window"))
    assert(!p.contains("Join"), "merge must not plan a join")
    assert(!p.contains("Cartesian"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, // repartition to shards + window merge
      s"expected shard + merge exchanges only, got $exchanges:\n$p")
  }

  test("training-mix ops: equi-joins only; bounded builds are the only nested loops") {
    // d10: digest semi-join + new×history band join are pure equi-joins
    val d10 = plan("d10_incremental_dedup")
    assert(!d10.contains("CartesianProduct"))
    assert(!d10.contains("BroadcastNestedLoopJoin"))
    // v11: nothing quadratic survives to the plan — the pair join keys on
    // cluster_id (the K-seed scoring cross-join is bounded and hides
    // inside the cached assignment stage)
    val v11 = plan("v11_semdedup")
    assert(!v11.contains("CartesianProduct"))
    // x16: the rare set joins back as a broadcast hash probe (the only
    // nested loop is the 1-row corpus-total broadcast)
    val x16 = plan("x16_rare_tokens")
    assert(x16.contains("BroadcastHashJoin"))
    assert(!x16.contains("CartesianProduct"))
    // g5: the count window and the census agg share ONE lang exchange
    val g5 = plan("g5_unimax_sample")
    val ex = "Exchange hashpartitioning".r.findAllIn(g5).length
    assert(ex == 1, s"g5 should shuffle once on lang, got $ex:\n$g5")
    // x17: encode runs over the cached vocabulary census, never the
    // corpus — the final plan is census → UDF → one lang agg, join-free
    val x17 = plan("x17_bpe_encode")
    assert(!x17.contains("Join"), s"x17 must not plan a join:\n$x17")
    assert(x17.contains("InMemoryTableScan"),
      s"x17 should encode off the cached vocab census:\n$x17")
    // x18: held-out scoring joins occurrences to the train census on the
    // bigram KEY — an equi-join, never an all-pairs comparison
    val x18 = plan("x18_heldout_lm")
    assert(!x18.contains("CartesianProduct") &&
      !x18.contains("BroadcastNestedLoopJoin"),
      s"x18 plans an all-pairs join:\n$x18")
    // d11: keep-first-occurrence runs as a census AGGREGATE (min packed)
    // joined back on the segment key — no window over segment partitions
    // (a hot boilerplate segment would serialize one), no all-pairs
    val d11 = plan("d11_segment_dedup")
    assert(!d11.contains("Window"),
      s"d11 must not rank segments with a window:\n$d11")
    assert(!d11.contains("CartesianProduct") &&
      !d11.contains("BroadcastNestedLoopJoin"),
      s"d11 plans an all-pairs join:\n$d11")
  }

  test("g6: the per-vector argmax is map-only (codegen'd cosine_argmax; " +
      "no n*K rows, no argmax exchange)") {
    val p = plan("g6_cluster_balance")
    assert(p.contains("cosine_argmax"),
      s"assignment must be the one-pass native argmax:\n$p")
    assert(!p.contains("max_by"),
      s"the old crossJoin+max_by argmax is back:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"nothing here may plan a cartesian product:\n$p")
  }

  test("j1: dimension joins broadcast, never sort-merge") {
    val p = plan("j1_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("candidate generation never degenerates to a cross join") {
    // d3 (band join), d5's verified subset aside, v4 (blocked pair join):
    // the scalable dedup property is equi-join keys, not O(n²) pairing
    for (q <- Seq("d3_minhash_lsh_pairs", "v4_embed_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q plans an all-pairs join:\n$p")
    }
  }

  test("j6 as-of join: exactly one hash shuffle, no join operator at all") {
    // the union–sort–carry formulation must not plan any join: one hash
    // exchange on the key for the window, plus the presentation orderBy
    val p = plan("j6_asof_join")
    assert(!p.contains("Join"), s"as-of should be join-free:\n$p")
    val hashExchanges = "hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange, got $hashExchanges:\n$p")
  }

  test("q4 exists decorrelates to a left-semi join — no fan-out, no dedup") {
    val p = plan("q4_exists_subquery")
    assert(p.contains("LeftSemi"), s"EXISTS should plan as LeftSemi:\n$p")
    // semi join already returns ≤1 row per order: a Distinct/dropDuplicates
    // in the plan would mean we paid an extra shuffle for nothing
    assert(!p.contains("Deduplicate"), s"unexpected dedup pass:\n$p")
  }

  test("q14: part dimension broadcasts, CASE folds into the partial agg") {
    val p = plan("q14_promo_ratio")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"part should broadcast:\n$p")
    assert(p.contains("partial_"), s"no map-side aggregation:\n$p")
  }

  test("a13: multi-column DISTINCT aggregation plans through Expand") {
    val p = plan("a13_distinct_agg")
    assert(p.contains("Expand"),
      s"two distinct key sets should use the Expand strategy:\n$p")
  }

  test("x10: benchmark grams broadcast; corpus side never cross-joins") {
    val p = plan("x10_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark gram set should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"decontamination degenerated to an all-pairs join:\n$p")
  }

  test("w8/w9: the whole window family runs off one user_id shuffle") {
    for (q <- Seq("w8_rank_navigation", "w9_value_windows")) {
      val p = plan(q)
      val hashExchanges = "hashpartitioning".r.findAllIn(p).size
      assert(hashExchanges == 1,
        s"$q: expected exactly 1 hash exchange, got $hashExchanges:\n$p")
    }
  }

  test("pq: the ADC shortlist scan never reads vector bytes") {
    val s = spark
    import s.implicits._
    import graft.search.Pq
    val rnd = new scala.util.Random(5)
    val vecs = Array.fill(64)(Array.fill(16)(rnd.nextFloat()))
    val cb = Pq.train(vecs, m = 4, ksub = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq_plan").toString
    Pq.encode(vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "vector"), cb)
      .write.mode("overwrite").parquet(dir)
    val index = s.read.parquet(dir)
    val p = Pq.searchCosine(index, vecs(0), cb, 5, shortlist = 10)
      .queryExecution.executedPlan.toString
    // two scans of the index: the ADC phase must project only
    // (vec_id, pq_code) — columnar readers then skip the vector column
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.exists(l => l.contains("pq_code") && !l.contains("vector")),
      s"no vector-free ADC scan found:\n$p")
  }

  test("j7 range join: equi-join on (key, band), never nested-loop") {
    val p = plan("j7_range_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to an all-pairs join:\n$p")
  }

  test("metrics aggregate map-side before the shuffle") {
    val p = plan("q1_agg")
    assert(p.contains("partial_"), s"no partial aggregation in q1:\n$p")
  }

  test("p1 ingest lineage has no data-dependent shuffle") {
    val df = SparkEntry.queries("p1_ingest_fragments")(spark, dir)
    // allowed exchanges: the final presentation orderBy (range) and ONE
    // round-robin redistribution of the single-split local input; the
    // per-document folds themselves must never hash-shuffle. NOTE plan
    // text prints root-first and Spark capitalizes RoundRobinPartitioning
    // but lower-cases range/hashpartitioning — match the real spellings
    // over the WHOLE plan.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"), "sanity: orderBy present")
    assert(plan.contains("Exchange RoundRobinPartitioning"), "sanity: input spread present")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"ingest fold must not hash-shuffle:\n$plan")
    assert(plan.split("Exchange RoundRobinPartitioning").length <= 2,
      "more than one round-robin redistribution")
  }

  test("v5 ann recall rises with probe depth, scan fraction monotone") {
    val rows = SparkEntry.queries("v5_ann_recall")(spark, dir)
      .orderBy(col("probe_depth")).collect()
    assert(rows.length == 3)
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    val scans = rows.map(_.getAs[Double]("scan_fraction"))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"recall not monotone: ${recalls.toSeq}")
    assert(scans.sliding(2).forall(p => p(0) < p(1)),
      s"scan fraction not increasing: ${scans.toSeq}")
    assert(recalls.last > 0.0)
  }

  test("persisted IVF index prunes list partitions at the file source") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("vector"))
    val sample = e.orderBy(col("vec_id")).limit(200)
      .select(col("vector")).as[Seq[Float]].collect().map(_.toArray)
    val q = graft.search.Ivf.train(sample, k = 8, iters = 5)
    val path = "/tmp/graft-warehouse/ivf_index"
    TableLayout.writePartitionedSorted(
      graft.search.Ivf.buildIndex(e, q), path, "list_id", Seq("vec_id"))

    val query = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val lists = graft.search.Ivf.nearestLists(query, q, nprobe = 2)
    val probed = s.read.parquet(path).filter(col("list_id").isin(lists: _*))

    // the probe is partition pruning at the source, not a post-scan filter
    val planStr = probed.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [") &&
      !planStr.replaceAll("\\s", "").contains("PartitionFilters:[]"),
      s"probe did not reach PartitionFilters:\n$planStr")
    val scan = probed.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // drive THIS Dataset's QueryExecution (count() would build a fresh one
    // whose metrics never touch `scan`)
    probed.collect()
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead > 0, "scan metric never populated — assertion is vacuous")
    val totalFiles = s.read.parquet(path).inputFiles.length
    assert(filesRead < totalFiles,
      s"no pruning: read $filesRead of $totalFiles files")
  }

  test("q7: all five dimension sides broadcast; one agg shuffle remains") {
    val p = plan("q7_nation_volume")
    assert(!p.contains("SortMergeJoin"), s"q7 fell back to sort-merge:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 5,
      s"expected 5 broadcast joins:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"only the final aggregation may shuffle:\n$p")
  }

  test("q17: correlated-average decorrelation stays broadcast-only") {
    val p = plan("q17_small_qty")
    assert(!p.contains("SortMergeJoin"), s"q17 fell back to sort-merge:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"only the per-part aggregation may shuffle:\n$p")
  }

  test("q19: the quantity envelope reaches the parquet scan") {
    val p = plan("q19_disjunctive")
    val scanLines = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(scanLines.exists(l => l.contains("GreaterThanOrEqual(l_quantity") &&
      l.contains("LessThanOrEqual(l_quantity")),
      s"l_quantity envelope not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
  }

  test("q22: anti join present; the only nested-loop is the 1-row stats cross") {
    val p = plan("q22_idle_rich")
    assert(p.contains("LeftAnti"), s"NOT EXISTS should plan as LeftAnti:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"unexpected extra nested-loop join:\n$p")
  }

  test("x11 fuzzy probe: top-k by edit distance, no global sort") {
    val p = plan("x11_fuzzy_probe")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
    assert(!p.contains("Exchange rangepartitioning"))
  }

  test("x12/w10: blocked pair join and gap-fill never go all-pairs") {
    for (q <- Seq("x12_fuzzy_pairs", "w10_gapfill")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q plans an all-pairs join:\n$p")
    }
  }

  test("a18/a19: mode and histogram aggregate map-side before the shuffle") {
    for (q <- Seq("a18_mode_exact", "a19_histogram")) {
      val p = plan(q)
      assert(p.contains("partial_"), s"$q has no partial aggregation:\n$p")
    }
  }

  test("f2: higher-order array stats stay in one scan-side codegen stage") {
    val p = plan("f2_array_stats")
    assert(!p.contains("Exchange hashpartitioning"),
      s"f2 is map-only plus presentation sort; no hash shuffle expected:\n$p")
  }

  test("q2: correlated per-part min is a window, not a join-back") {
    val p = plan("q2_min_cost_supplier")
    assert(!p.contains("SortMergeJoin"), s"q2 fell back to sort-merge:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q2 top-100 should TopK:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"pair agg + window: exactly 2 hash exchanges expected:\n$p")
  }

  test("q8/q9/q10: dimension reductions broadcast; one agg shuffle each") {
    for (q <- Seq("q8_market_share", "q9_profit", "q10_returned")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q fell back to sort-merge:\n$p")
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"$q: only the aggregation may hash-shuffle:\n$p")
    }
  }

  test("q16: distinct supplier count pre-dedupes map-side") {
    val p = plan("q16_supplier_cnt")
    // two-phase distinct: a partial agg keyed on (group keys, suppkey)
    // must appear below the shuffle
    assert(p.contains("partial_"), s"no map-side phase:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("x20: PII redaction is a narrow scan stage — no hash shuffle") {
    val p = plan("x20_pii_redact")
    assert(!p.contains("Exchange hashpartitioning"),
      s"x20 is per-row regexp map work plus presentation sort:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython"),
      s"x20 must stay codegen'd builtins:\n$p")
  }

  test("x22/v14: BM25 plans as scan + TopK; hybrid fusion stays cartesian-free") {
    val x22 = plan("x22_bm25")
    // corpus stats are construction-time literals: the per-doc side is a
    // single scan into a top-k heap, no join, no agg shuffle
    assert(x22.contains("TakeOrderedAndProject"), s"x22 should TopK:\n$x22")
    assert(!x22.contains("Join"), s"x22 must not join at runtime:\n$x22")
    // r16: v14 computes the corpus-wide-rank SPEC with no window node of
    // any kind — bounded top-C candidates (TakeOrderedAndProject in the
    // construction-time actions; the v16 test below pins that shape on
    // the shared candidate stages) + RankBucket histogram ranks; the
    // returned plan is the ≤ 2C-row driver-fused table. Nothing may
    // sort, window or cross-join the corpus.
    val v14 = plan("v14_hybrid_rrf")
    assert(!v14.contains("Window"),
      s"v14 must not rank with a window (single-partition sort):\n$v14")
    assert(!v14.contains("CartesianProduct"),
      s"v14 fused an all-pairs join:\n$v14")
    assert(v14.contains("LocalTableScan"),
      s"v14's fused output should be the bounded driver table:\n$v14")
  }

  test("d14: CDC dedup shuffles digests and doc ids, never text") {
    val p = plan("d14_cdc_substring_dedup")
    // chunking/digesting happen inside the scan's projections; the only
    // exchanges key on the 32-char digest (census + join-back) and on
    // doc_id (span window + final agg)
    assert(p.contains("hashpartitioning(digest"),
      s"census must shuffle on chunk digests:\n$p")
    assert(p.contains("windowspecdefinition(doc_id"),
      s"span runs must window per doc:\n$p")
    assert(!p.contains("hashpartitioning(text"),
      s"document text must never be a shuffle key:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      s"no all-pairs anywhere:\n$p")
  }

  test("v17: metrics rank window is query-partitioned; dims broadcast") {
    val p = plan("v17_retrieval_metrics")
    // the per-query rank must be a PARTITIONED window (the v2 batch-KNN
    // shape) — a corpus-wide Window.orderBy would be the one-task sort
    // this suite exists to ban
    assert(p.contains("windowspecdefinition(query_id"),
      s"rank window must partition by query_id:\n$p")
    // BOTH small sides broadcast: the query set rides the cross join
    // (BroadcastNestedLoopJoin), the 10-row class counts the equi-join
    // (BroadcastHashJoin); neither corpus-sized shuffle-join form may
    // appear
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query set must broadcast into the scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"class counts must broadcast into the per-query rows:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"nothing corpus-sized may shuffle-join:\n$p")
  }

  test("x24: threshold bucketing has NO window — no per-language sort") {
    // x23's production variant exists to remove the per-language NTILE
    // sort; its plan must contain no window node of any kind (the
    // percentile sketch is a partial-aggregable agg, the thresholds an
    // L-row broadcast) and the only sort is the final ≤3L-row output
    // ordering
    val p = plan("x24_perplexity_thresholds")
    assert(!p.toLowerCase.contains("window"),
      s"x24 must not contain a window node:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"thresholds must broadcast back into the scored rows:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing corpus-sized may sort-merge-join:\n$p")
  }

  test("v16: both hybrid candidate plans are window-free top-k scans") {
    // the production fusion's corpus-sized stages — each a per-partition
    // top-C heap + driver merge; NO window node of any kind (v14's
    // corpus-wide non-partitioned rank windows are the oracle artifact
    // this plan exists to replace), no join, no agg exchange beyond the
    // scan
    val (lex, vec) = graft.queries.VectorQueries
      .hybridCandidateStages(spark, dir)
    Seq("lex" -> lex, "vec" -> vec).foreach { case (side, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"),
        s"v16 $side candidates should TopK:\n$p")
      assert(!p.contains("Window"),
        s"v16 $side candidates must not use a window:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"v16 $side candidates fused an all-pairs join:\n$p")
    }
  }

  test("q12: mode census hash-shuffles once; lateness predicate on the join") {
    val p = plan("q12_shipmode")
    assert(!p.contains("SortMergeJoin"), s"q12 fell back to sort-merge:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"q12: only the per-mode agg may hash-shuffle:\n$p")
    // the shipdate window must reach the parquet reader
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"no pushdown:\n$p")
  }

  test("q20: one-pass pair agg + dedup; qualifying set broadcasts as semi") {
    val p = plan("q20_promo_suppliers")
    assert(!p.contains("SortMergeJoin"), s"q20 fell back to sort-merge:\n$p")
    assert(p.contains("LeftSemi"), s"q20: nested-IN must be a semi join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"q20: pair agg + suppkey dedup only:\n$p")
  }

  test("q21: double-EXISTS census runs join-back-free") {
    val p = plan("q21_waiting_supplier")
    assert(!p.contains("SortMergeJoin"), s"q21 fell back to sort-merge:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      s"pair agg + window + supplier agg: ≤3 hash exchanges expected:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("w11/w12: cohort and funnel stay vocabulary-shuffled, no cartesian") {
    val p11 = plan("w11_cohort_retention")
    assert("Exchange hashpartitioning".r.findAllIn(p11).size <= 3,
      s"cohort: dedup + window + agg only:\n$p11")
    val p12 = plan("w12_funnel")
    assert(!p12.contains("CartesianProduct"))
    // the only nested-loops are the two 1-row count crossJoins
    assert("BroadcastNestedLoopJoin".r.findAllIn(p12).size <= 2,
      s"funnel: unexpected all-pairs join:\n$p12")
  }

  test("w13/w14: sliding-active and transitions avoid expand and self-join") {
    // w13's whole point is NO COUNT(DISTINCT): the per-(window, user) agg
    // dedups, so no Expand node and no range self-join may appear
    val p13 = plan("w13_sliding_active")
    assert(!p13.contains("Expand"),
      s"w13 must not plan a distinct-agg Expand:\n$p13")
    assert(!p13.contains("CartesianProduct") &&
      !p13.contains("BroadcastNestedLoopJoin"),
      s"w13 must not plan a range self-join:\n$p13")
    // w14: one user_id hash shuffle feeds the lead window; the edge census
    // and normalization live on the tiny edge vocabulary
    val p14 = plan("w14_transitions")
    assert(!p14.contains("Join"), s"w14 should be join-free:\n$p14")
    assert(p14.contains("partial"), // census aggregates map-side
      s"w14 census should partial-aggregate before its shuffle:\n$p14")
  }

  test("d9: corpus-wide gram census joins on gram keys, never all-pairs") {
    val p = plan("d9_crossdoc_grams")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"cross-doc census degenerated to an all-pairs join:\n$p")
  }

  test("d12: novelty census joins on gram keys, never all-pairs") {
    val p = plan("d12_novelty")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"novelty census degenerated to an all-pairs join:\n$p")
    // first-seen must be an aggregate (partial-agg'd map-side), not a
    // window over gram partitions (hot boilerplate grams would serialize
    // their whole partition onto one task)
    assert(p.contains("partial_min") || p.contains("min("),
      s"first-seen should be a min() aggregate:\n$p")
    assert(!p.contains("RunningWindowFunction"),
      s"first-seen must not be a window over gram partitions:\n$p")
  }

  test("v12: MMR pool stage is a top-k scan — broadcast join, no shuffle, no global sort") {
    // the corpus-sized work lives in the pool stage (the query function's
    // own output is a driver-local k-row table by construction, which
    // proves nothing) — assert the pool plan directly
    val p = graft.queries.VectorQueries.mmrPool(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"pool should top-k, not globally sort:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"query vector should broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"pool must not shuffle the embeddings table:\n$p")
  }

  test("v13: filter sits under the top-k scan — pushed filter, no shuffle") {
    val p = plan("v13_filtered_knn")
    assert(p.contains("TakeOrderedAndProject"),
      s"filtered KNN should top-k, not globally sort:\n$p")
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(label,2)"),
      s"label predicate should reach the parquet scan:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"filtered KNN must not shuffle:\n$p")
  }

  test("p8: CID round-trip is one mapPartitions pass, no shuffle") {
    val p = plan("p8_cid_pdf")
    assert(!p.contains("Exchange hashpartitioning") ||
      p.indexOf("Exchange hashpartitioning") ==
        p.lastIndexOf("Exchange hashpartitioning"),
      s"per-file map work should not shuffle (one presentation sort max):\n$p")
  }

  test("g4: sequence packing runs on one shard partitioning, no global sort") {
    val p = plan("g4_sequence_packing")
    // the cumsum window and both aggs all key on shard: exactly one hash
    // exchange (plus the 8-row presentation sort)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"packing should reuse one shard partitioning, got $hashExchanges:\n$p")
  }

  test("x13: tf/df keyword extraction joins on the term key, never all-pairs") {
    val p = plan("x13_tfidf_terms")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"tf/df join degenerated to an all-pairs join:\n$p")
    assert(p.contains("partial_count"),
      s"tf census should partial-aggregate before its shuffle:\n$p")
  }

  test("r8 per-document codecs (p10/p11/p12/m3) never hash-shuffle document bytes") {
    // each is a scan-stage mapPartitions pipeline: PDF/JPEG bytes live
    // and die inside the partition iterator; the only exchanges are the
    // presentation orderBy (range) and the input spread (round-robin)
    Seq("p10_subset_font", "p11_jpeg_xobject", "m3_jpeg_decode",
      "p12_cff_font", "p13_encrypted_pdf", "p14_scanned_pdf").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not hash-shuffle:\n$p")
      assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
        s"$q should be an object-pipeline map:\n$p")
    }
  }

  test("p9 hard eval keeps the p6 shape: one batch KNN, broadcast expectations") {
    val p = plan("p9_hard_eval")
    assert(p.contains("TakeOrderedAndProject") || p.contains("WindowGroupLimit"),
      s"per-query top-k should not global-sort:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the 45-row expectation table should broadcast:\n$p")
  }

  test("bucketed co-located join plans without a shuffle") {
    val s = spark
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    TableLayout.writeBucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", 4)
    TableLayout.writeBucketed(c.select("c_custkey", "c_name"),
      "customer_b", "c_custkey", 4)
    val joined = s.table("orders_b")
      .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
    assert(TableLayout.isShuffleFree(joined),
      "bucketed join should not shuffle:\n" +
        joined.queryExecution.executedPlan)
  }
}
