package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Batch/stream agreement on REAL testdata: the streaming tumbling-window
  * operator over a file-source stream of the events table must produce
  * exactly the closed windows the batch twin (w2_tumbling_window) computes.
  */
class StreamBatchEquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("file-source stream of events.parquet matches batch windows") {
    val s = spark
    val batchEvents = Tables.events(s, dir)
    val schema = batchEvents.schema

    // file-source streams need a directory: stage the single parquet file
    val stage = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))

    // stream the same parquet through the SAME logical operator; nanos
    // conversion must be the SAME floor division Tables.events uses
    val streamRaw = s.readStream.schema(
      s.read.parquet(s"$dir/events.parquet").schema)
      .parquet(stage.toString)
    val streamEvents = Tables.normalizeEventTs(streamRaw)

    val agg = EventStreams.tumblingCounts(streamEvents, watermark = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("stream_win")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    val maxTs = batchEvents.agg(max(col("ts"))).head().getTimestamp(0)
    val lastOpenWindow = java.sql.Timestamp.valueOf(
      maxTs.toLocalDateTime.withMinute(0).withSecond(0).withNano(0))

    // batch twin restricted to windows the stream could close (watermark
    // cannot pass the final event, so its window never emits)
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .filter(col("window_start") < lastOpenWindow)
      .collect().map(_.toSeq).toSet

    val streamed = s.sql("SELECT * FROM stream_win")
      .filter(col("window_start") < lastOpenWindow)
      .collect().map(_.toSeq).toSet

    assert(streamed.nonEmpty, "stream emitted no closed windows")
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("sliding active-user windows: stream matches batch and w13") {
    val s = spark
    val batchEvents = Tables.events(s, dir).filter(col("ts").isNotNull)

    val stage = java.nio.file.Files.createTempDirectory("events_slide")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val streamRaw = s.readStream.schema(
      s.read.parquet(s"$dir/events.parquet").schema)
      .parquet(stage.toString)
    val streamEvents = Tables.normalizeEventTs(streamRaw)

    val q = EventStreams.slidingActive(streamEvents, watermark = "0 seconds")
      .writeStream.format("memory").queryName("stream_slide")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    // windows ending on/before the start of the max event's day are
    // definitely closed (the final watermark = max event time passed them)
    val maxTs = batchEvents.agg(max(col("ts"))).head().getTimestamp(0)
    val closedBound = java.sql.Timestamp.valueOf(
      maxTs.toLocalDateTime.toLocalDate.atStartOfDay)

    // batch reference: the same sliding-window dedup + count, batch mode
    val batch = batchEvents
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("wau"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("wau"))
      .filter(col("window_end") <= closedBound)
      .collect().map(_.toSeq).toSet

    val streamed = s.sql("SELECT * FROM stream_slide")
      .filter(col("window_end") <= closedBound)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty, "stream emitted no closed windows")
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")

    // and the batch catalog query agrees: w13's trailing window ending on
    // activity day D is the sliding window with end = D+1
    val w13 = SparkEntry.queries("w13_sliding_active")(s, dir)
      .select(col("wday"), col("wau7")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val streamByEndDay = s.sql("SELECT * FROM stream_slide").collect()
      .map(r => (r.getTimestamp(1).toLocalDateTime.toLocalDate, r.getLong(2)))
      .toMap
    val checked = w13.keys.filter(d =>
      !d.plusDays(1).atStartOfDay.isAfter(closedBound.toLocalDateTime))
    assert(checked.nonEmpty)
    checked.foreach { d =>
      assert(streamByEndDay.get(d.plusDays(1)).contains(w13(d)),
        s"w13($d)=${w13(d)} but stream window ending ${d.plusDays(1)} " +
          s"has ${streamByEndDay.get(d.plusDays(1))}")
    }
  }

  test("native session_window agg matches lag+cumsum sessionization") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, dir)
    // native session windows (30-min gap): per-session event counts
    val native = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toSeq.sorted
    // hand-rolled w3-style assignment (strict > gap marker)
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Long.MinValue, 0)
    val manual = ev
      .withColumn("new_session",
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
          > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(native.nonEmpty && native == manual,
      s"session_window vs manual divergence: ${native.diff(manual).take(3)} / ${manual.diff(native).take(3)}")
  }

  test("streaming as-of enrichment matches the batch as-of join") {
    val s = spark
    import s.implicits._
    import graft.streaming.EventStreams.AsOfEvent

    // batch truth: j6's exact shape (clicks enriched with the most recent
    // purchase, inclusive, greatest-event-id tiebreak)
    val batch = SparkEntry.queries("j6_asof_join")(s, dir)
      .collect().map(_.toSeq).toSet

    // replay the event log in event-time order as FOUR sequential files,
    // one per trigger — the carry must survive across micro-batches, so a
    // single-batch replay would not exercise the state store at all.
    // Sort key (ts, side, event_id) keeps equal-ts rights ahead of lefts
    // even across a file boundary.
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("side"),
        col("value"))
      .as[AsOfEvent]
      .collect()
      // null-ts rows would break the replay's event-time sort; their
      // semantics are pinned by the dedicated MemoryStream test below
      .filter(_.ts != null)
      .sortBy(r => (EventStreams.eventTimeMicros(r.ts), r.side, r.event_id))
    val stage = java.nio.file.Files.createTempDirectory("asof_stream")
    val slice = (ev.length + 3) / 4
    ev.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF().coalesce(1).write.mode("overwrite")
        .parquet(f.toString)
      // file source orders by modification time: force ascending
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }

    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
      .as[AsOfEvent]
    val q = graft.streaming.EventStreams.asOfEnrich(stream)
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    val streamed = s.sql(
      """SELECT event_id, user_id, right_event_id AS purchase_event_id,
        |  right_value AS purchase_value FROM asof_stream""".stripMargin)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty, "stream emitted no enriched rows")
    assert(streamed == batch,
      s"stream/batch as-of divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("streaming as-of enrichment handles null timestamps like batch") {
    val s = spark
    import s.implicits._
    import graft.streaming.EventStreams.AsOfEvent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[AsOfEvent]
    val q = graft.streaming.EventStreams.asOfEnrich(mem.toDS())
      .writeStream.format("memory").queryName("asof_null")
      .outputMode("append").start()
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    try {
      mem.addData(
        AsOfEvent(1L, ts(100), 10L, 0, 5.0),  // right
        AsOfEvent(1L, null, 11L, 0, 9.0),     // null-ts right: never matches
        AsOfEvent(1L, ts(200), 12L, 1, 0.0),  // left → carries right 10
        AsOfEvent(1L, null, 13L, 1, 0.0))     // null-ts left → null payload
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql(
      "SELECT event_id, right_event_id, right_value FROM asof_null")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(rows == Set(
      (12L, Some(10L), Some(5.0)),
      (13L, None, None)),
      s"unexpected null-ts semantics: $rows")
  }

  test("streaming CDC dedup keeps exactly the distinct chunk digests") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).take(200)
    // batch truth: the distinct chunk-digest set (what d15's rank-1
    // filter keeps, digest-wise), via the same expression batch-side
    val batchDistinct = docs.toSeq.toDF("doc_id", "text")
      .select(explode(org.apache.spark.sql.graft.CdcExpressions
        .cdcChunks(col("text"), graft.queries.DedupQueries.CdcW,
          graft.queries.DedupQueries.CdcMod, 32, withDigest = false))
        .as("chunk"))
      .select(md5(col("chunk"))).as[String].collect().toSet

    val mem = MemoryStream[(Long, String)]
    val input = mem.toDF().toDF("doc_id", "text")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
    val q = graft.streaming.EventStreams.cdcDedupStream(input)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_digest"))
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        out.synchronized {
          out ++= df.collect().map(r =>
            (r.getLong(0), r.getInt(1), r.getString(2)))
        }
        ()
      }.start()
    try {
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()

    // every distinct digest emitted exactly once; none invented
    assert(out.map(_._3).toSet == batchDistinct, "digest sets differ")
    assert(out.size == batchDistinct.size,
      s"${out.size} emissions for ${batchDistinct.size} distinct chunks — " +
        "a duplicate survived across micro-batches")
  }

  test("streaming trending terms keep the MG guarantees across batches") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val texts = Tables.documents(s, dir)
      .select(col("text")).as[String].collect()
    val (b1, b2) = texts.splitAt(texts.length / 2)
    val k = 30 // far below the corpus vocabulary: eviction really happens

    val mem = MemoryStream[String]
    @volatile var last: Seq[(String, Long)] = Nil
    val q = graft.streaming.EventStreams
      .trendingTerms(mem.toDF().withColumnRenamed("value", "text"), k)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        if (rows.nonEmpty) last = rows
      }.start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    assert(last.nonEmpty && last.size <= k, s"state must stay ≤ k: ${last.size}")
    // exact ground truth over the full stream
    val exact = texts.flatMap(_.trim.split("[ \\t\\n\\f\\r]+"))
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = exact.values.sum
    val sketch = last.toMap
    exact.foreach { case (term, c) =>
      if (c * (k + 1) > n)
        assert(sketch.contains(term),
          s"heavy term $term (count $c, n=$n) missing from the final snapshot")
      sketch.get(term).foreach { est =>
        assert(est <= c && (c - est) * (k + 1) <= n,
          s"estimate $est out of bounds for $term (true $c, n=$n)")
      }
    }
  }

  test("streaming transitions match the batch w14 edge census") {
    val s = spark
    import s.implicits._
    import graft.streaming.EventStreams.TransEvent

    // batch truth: w14's (from, to, n) census
    val batch = SparkEntry.queries("w14_transitions")(s, dir)
      .select(col("from_type"), col("to_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

    // replay the full event log in event-time order as four sequential
    // files — the per-user last-type carry must survive micro-batches
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[TransEvent]
      .collect()
      .filter(_.ts != null)
      .sortBy(r => (EventStreams.eventTimeMicros(r.ts), r.event_id))
    val stage = java.nio.file.Files.createTempDirectory("trans_stream")
    val slice = (ev.length + 3) / 4
    ev.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF().coalesce(1).write.mode("overwrite")
        .parquet(f.toString)
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }

    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
      .as[TransEvent]
    val q = graft.streaming.EventStreams.transitions(stream)
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    val streamed = s.sql(
      """SELECT from_type, to_type, COUNT(*) AS n
        |FROM trans_stream GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed.nonEmpty, "stream emitted no transition edges")
    assert(streamed == batch,
      s"stream/batch transition divergence: " +
        s"${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("stream-stream interval join matches the batch banded range join") {
    val s = spark
    import graft.operators.RangeJoin
    // stage events.parquet for two independent file-source streams
    val stage = java.nio.file.Files.createTempDirectory("events_ij")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    def streamEvents() = {
      val raw = s.readStream
        .schema(s.read.parquet(s"$dir/events.parquet").schema)
        .parquet(stage.toString)
      Tables.normalizeEventTs(raw)
    }
    val errS = streamEvents().filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val folS = streamEvents()
      .select(col("user_id"), col("ts").as("f_ts"),
        col("event_id").as("f_event_id"))
    val joined = EventStreams.intervalJoin(errS, folS, Seq("user_id"),
      leftTime = "ts", rightTime = "f_ts", upperInclusive = "12 hours")
    val q = joined.select(col("event_id"), col("f_event_id"))
      .writeStream.format("memory").queryName("stream_ij")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val streamed = s.sql("SELECT * FROM stream_ij")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = Tables.events(s, dir)
    val batch = RangeJoin.timeBand(
        ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.select(col("user_id"), col("ts").as("f_ts"),
          col("event_id").as("f_event_id")),
        Seq("user_id"), "ts", "f_ts",
        0L, 12L * 3600L * 1000000L)
      .select(col("event_id"), col("f_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed.nonEmpty, "interval join emitted no pairs")
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("streaming funnel matches the batch funnel counts") {
    val s = spark
    import s.implicits._
    import graft.streaming.EventStreams.FunnelEvent

    // batch truth: w12's one-row (n_view, n_click, n_purchase)
    val b = SparkEntry.queries("w12_funnel")(s, dir).head()
    val batchCounts = Seq(b.getLong(0), b.getLong(1), b.getLong(2))

    // event-time-ordered replay in 4 slices (state must survive batches)
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelEvent]
      .collect()
      .filter(_.ts != null) // null-ts events never enter a funnel
      .sortBy(r => EventStreams.eventTimeMicros(r.ts))
    val stage = java.nio.file.Files.createTempDirectory("funnel_stream")
    val slice = (ev.length + 3) / 4
    ev.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF().coalesce(1).write.mode("overwrite").parquet(f.toString)
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }

    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
      .as[FunnelEvent]
    val q = graft.streaming.EventStreams.funnel(stream)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    // one advance row per (user, stage) ⇒ count per stage = batch counts
    val streamed = s.sql(
      "SELECT stage, COUNT(*) AS n FROM funnel_stream GROUP BY stage")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val streamCounts = (1 to 3).map(streamed.getOrElse(_, 0L))
    assert(streamCounts == batchCounts,
      s"stream/batch funnel divergence: $streamCounts vs $batchCounts")
  }

  test("streaming funnel drops null-ts events like the batch twin") {
    val s = spark
    import s.implicits._
    import graft.streaming.EventStreams.FunnelEvent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = graft.streaming.EventStreams.funnel(mem.toDS())
      .writeStream.format("memory").queryName("funnel_null")
      .outputMode("append").start()
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    try {
      mem.addData(
        FunnelEvent(1L, null, "view"),     // null-ts: never enters
        FunnelEvent(2L, ts(100), "view"),  // advances to stage 1
        FunnelEvent(2L, ts(200), "click")) // advances to stage 2
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql("SELECT user_id, stage FROM funnel_null")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows == Set((2L, 1), (2L, 2)),
      s"null-ts funnel semantics diverged: $rows")
  }

  test("quality gate streams over documents.parquet identically to batch") {
    val s = spark
    import graft.functions.TextSketch
    import graft.queries.TextAnalysisQueries
    // the per-document gate is a stateless projection — it must run
    // unchanged in a readStream append pipeline (an in-stream corpus
    // filter), producing exactly the batch decisions
    def gated(df: org.apache.spark.sql.DataFrame) = {
      val w = TextSketch.words(col("text"))
      val nPunct = length(col("text")) -
        length(regexp_replace(col("text"), "[.,;:!?]", ""))
      val flags = TextAnalysisQueries.qualityFlags(w, nPunct, col("lang"))
      df.select(col("doc_id") +: flags.map { case (n, c) => c.as(n) }: _*)
    }
    val stage = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      stage.resolve("documents.parquet"))
    val stream = s.readStream
      .schema(s.read.parquet(s"$dir/documents.parquet").schema)
      .parquet(stage.toString)
    val q = gated(stream).writeStream.format("memory")
      .queryName("stream_gate").outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val streamed = s.sql("SELECT * FROM stream_gate")
      .collect().map(_.toSeq).toSet
    val batch = gated(s.read.parquet(s"$dir/documents.parquet"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming bloom-prefiltered dedup passes exactly the non-duplicates") {
    import org.apache.spark.sql.graft.BloomProbe
    val s = spark
    val docs = s.read.parquet(s"$dir/documents.parquet")
    // history = the first 100 docs' digests → the stream carries 100
    // planted exact duplicates plus the rest as clean rows
    val history = docs.filter(col("doc_id") < 100)
      .select(md5(col("text")).as("content_digest"))
    val bloom = history
      .select(BloomProbe.bloomAgg(col("content_digest"), 1L << 12, 1L << 15))
      .head.getAs[Array[Byte]](0)

    val stage = java.nio.file.Files.createTempDirectory("docs_bloom")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      stage.resolve("documents.parquet"))
    val stream = s.readStream.schema(docs.schema).parquet(stage.toString)
    val q = EventStreams.bloomDedupStream(stream, history, bloom)
      .writeStream.format("memory").queryName("stream_bloom")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    val streamed = s.sql("SELECT doc_id FROM stream_bloom")
      .collect().map(_.getLong(0)).toSet
    val expected = docs
      .join(history.distinct(), md5(col("text")) === col("content_digest"),
        "left_anti")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(streamed == expected, "stream must pass exactly the non-duplicates")
    assert(expected.nonEmpty && !expected.exists(_ < 100),
      "the planted duplicates must all be removed")
  }

  test("streaming anomaly gate: exact sums and scores match an independent fold") {
    val s = spark
    import s.implicits._
    import EventStreams.ScoredEvent

    // the same cents the operator computes, via the same Spark cast
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .as[(String, java.sql.Timestamp, Long)]
      .collect()
      .sortBy(r => Option(r._2).map(EventStreams.eventTimeMicros)
        .getOrElse(Long.MinValue))

    // independent oracle fold over the identical order
    val sums = scala.collection.mutable.Map
      .empty[String, (Long, Long, BigInt)]
    val expected = ev.map { case (tpe, ts, v) =>
      val (n0, s10, s20) = sums.getOrElse(tpe, (0L, 0L, BigInt(0)))
      val (n, s1, s2) = (n0 + 1, s10 + v, s20 + BigInt(v) * BigInt(v))
      sums(tpe) = (n, s1, s2)
      val disc = n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble
      val z =
        if (disc <= 0.0) 0.0
        else (n.toDouble * v.toDouble - s1.toDouble) / math.sqrt(disc)
      ScoredEvent(tpe,
        Option(ts).map(EventStreams.eventTimeMicros).getOrElse(Long.MinValue),
        v, z, math.abs(z) > 3.0)
    }.toSeq

    // final streaming sums must equal the BATCH power sums exactly
    // (order-free integer arithmetic — the w15 stats aggregate)
    val batchStats = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
        sum(col("v").cast("decimal(30,0)") * col("v")).as("s2"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), BigInt(r.getDecimal(3).toBigInteger))))
      .toMap
    assert(sums.toMap == batchStats,
      "prefix-fold final sums diverged from the batch aggregate")

    // 3-slice replay: per-key event-time order across batches
    val stage = java.nio.file.Files.createTempDirectory("anomaly_stream")
    val slice = (ev.length + 2) / 3
    ev.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF("event_type", "ts", "value").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }
    // the staged `value` column already holds cents as LONG; feed dollars
    // back so the operator's own cast path runs: cents/100 as decimal
    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
      .withColumn("value",
        (col("value").cast("decimal(20,2)") / 100).cast("decimal(18,2)"))
    val q = EventStreams.anomalyStream(stream)
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    val streamed = s.sql("SELECT * FROM anomaly_stream")
      .as[ScoredEvent].collect()
    assert(streamed.length == expected.length,
      s"${streamed.length} scored vs ${expected.length} expected")
    // multiset equality (z doubles must be BIT-exact: same arithmetic)
    val key = (e: ScoredEvent) =>
      (e.event_type, e.ts_us, e.v, java.lang.Double.doubleToLongBits(e.z),
        e.flagged)
    assert(streamed.map(key).sorted.toSeq == expected.map(key).sorted,
      "streaming scores diverged from the independent fold")
    assert(streamed.exists(_.flagged) || expected.forall(!_.flagged),
      "sanity: flag parity")
  }

  test("streaming cohort retention matches w11 on multi-batch replay") {
    val s = spark
    import s.implicits._

    // batch truth: w11's retention grid over the non-null-ts universe
    // (null-ts events surface as null-offset rows there; the stream twin
    // states they never enter — filter both sides to the shared universe)
    val batch = SparkEntry.queries("w11_cohort_retention")(s, dir)
      .filter(col("cohort_day").isNotNull && col("offset_days").isNotNull)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet

    // event-time-ordered replay in 4 slices: per-user state (cohort day +
    // seen days) must survive micro-batch boundaries
    val ev = Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .collect()
      .sortBy(r => EventStreams.eventTimeMicros(r._2))
    val stage = java.nio.file.Files.createTempDirectory("cohort_stream")
    val slice = (ev.length + 3) / 4
    ev.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }

    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
    val q = EventStreams.cohortRetention(stream)
      .writeStream.format("memory").queryName("cohort_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    // one advance row per (user, day) ⇒ COUNT(*) per (cohort, offset)
    // IS the batch grid's n_users
    val streamed = s.sql(
      """SELECT cohort_day, offset_days, COUNT(*) AS n
        |FROM cohort_stream GROUP BY 1, 2""".stripMargin)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "cohort stream emitted nothing")
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("streaming carry-forward matches w4 on multi-batch replay") {
    val s = spark
    import s.implicits._

    val batch = SparkEntry.queries("w4_carry_forward")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    // event-time-ordered replay in 4 slices: the one-long carry must
    // survive micro-batch boundaries
    val ev = Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .collect()
      .sortBy(r => (EventStreams.eventTimeMicros(r._2), r._3))
    val stage = java.nio.file.Files.createTempDirectory("carry_stream")
    val slice = (ev.length + 3) / 4
    ev.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF("user_id", "ts", "event_id", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }

    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
      .as[EventStreams.CarryEvent]
    val q = EventStreams.carryForwardStream(stream)
      .writeStream.format("memory").queryName("carry_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    val streamed = s.sql("SELECT * FROM carry_stream")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(streamed.nonEmpty, "carry stream emitted nothing")
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("streaming moving sum matches w5 on multi-batch replay") {
    val s = spark
    import s.implicits._

    // the streaming universe is the non-null-ts one (stated on the
    // operator); restrict the batch grid identically
    val nonNullIds = Tables.events(s, dir).filter(col("ts").isNotNull)
      .select(col("event_id")).as[Long].collect().toSet
    val batch = SparkEntry.queries("w5_moving_sum")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .filter(t => nonNullIds.contains(t._1)).toSet

    val ev = Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .collect()
      .sortBy(r => (EventStreams.eventTimeMicros(r._2), r._3))
    val stage = java.nio.file.Files.createTempDirectory("roll_stream")
    val slice = (ev.length + 3) / 4
    ev.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF("user_id", "ts", "event_id", "value").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }

    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
      .as[EventStreams.RollEvent]
    val q = EventStreams.movingSumStream(stream)
      .writeStream.format("memory").queryName("roll_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    // bit-exact compare: the frame sum is exact cents, the division is
    // one correctly-rounded IEEE op on both sides
    val streamed = s.sql("SELECT * FROM roll_stream")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "rolling stream emitted nothing")
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("streaming range frame matches w6 on multi-batch replay (closed groups)") {
    val s = spark
    import s.implicits._

    // closed = the user has a strictly later event (RANGE frames are
    // peer-inclusive, so a timestamp's peer group only emits once a
    // later event proves it complete; the final group stays open)
    val ev = Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .collect()
    val maxTsByUser = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(r => EventStreams.eventTimeMicros(r._2)).max
    }
    val closedIds = ev.filter(r =>
      EventStreams.eventTimeMicros(r._2) < maxTsByUser(r._1))
      .map(_._3).toSet

    val batch = SparkEntry.queries("w6_range_frame")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .filter(t => closedIds.contains(t._1)).toSet

    val sortedEv = ev.sortBy(r => (EventStreams.eventTimeMicros(r._2), r._3))
    val stage = java.nio.file.Files.createTempDirectory("range_stream")
    val slice = (sortedEv.length + 3) / 4
    sortedEv.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF("user_id", "ts", "event_id", "value").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }

    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
      .as[EventStreams.RangeEvent]
    val q = EventStreams.rangeFrameStream(stream)
      .writeStream.format("memory").queryName("range_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    val streamed = s.sql("SELECT * FROM range_stream")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "range stream emitted nothing")
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("streaming gap-fill matches w10 on multi-batch replay (closed days)") {
    val s = spark
    import s.implicits._

    // batch truth restricted to CLOSED days: the streaming operator can
    // only close a day once a later one arrives, so each user's final
    // day stays open (append-mode semantics, stated on the operator)
    val batchAll = SparkEntry.queries("w10_gapfill")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val lastDay = batchAll.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._2).max
    }
    val batch = batchAll.filter { case (u, d, _) => d < lastDay(u) }.toSet

    val ev = Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .collect()
      .sortBy(r => EventStreams.eventTimeMicros(r._2))
    val stage = java.nio.file.Files.createTempDirectory("gap_stream")
    val slice = (ev.length + 3) / 4
    ev.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }

    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
    val q = EventStreams.gapfillStream(stream)
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    val streamed = s.sql("SELECT * FROM gap_stream")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2))).toSet
    assert(streamed.nonEmpty, "gap-fill stream emitted nothing")
    assert(streamed.exists(_._3 == 0L), "no zero-filled day was exercised")
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("streaming sliding-active matches w13 on multi-batch replay") {
    val s = spark
    import s.implicits._

    // batch truth: the full (wday, dau1, wau7) grid
    val batch = SparkEntry.queries("w13_sliding_active")(s, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet

    // event-time-ordered replay in 4 slices: one-long-per-user state must
    // survive micro-batch boundaries
    val ev = Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .collect()
      .sortBy(r => EventStreams.eventTimeMicros(r._2))
    val stage = java.nio.file.Files.createTempDirectory("slide_stream")
    val slice = (ev.length + 3) / 4
    ev.grouped(slice).zipWithIndex.foreach { case (rows, i) =>
      val f = stage.resolve(f"slice_$i%03d.parquet")
      rows.toSeq.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      java.nio.file.Files.walk(f).iterator()
        .forEachRemaining(_.toFile.setLastModified(1000000L * (i + 1)))
    }

    val stream = s.readStream
      .schema(s.read.parquet(stage.resolve("slice_000.parquet").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString + "/*/")
    val q = EventStreams.slidingActiveAdvances(stream)
      .writeStream.format("memory").queryName("slide_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    // the read-time aggregation the operator documents: dau = advances per
    // day, wau = first-coverages per window-end, both restricted to the
    // observed-day census (the batch twin's broadcast semi-join)
    val streamed = s.sql(
      """WITH obs AS (SELECT DISTINCT day FROM slide_stream),
        |wau AS (
        |  SELECT w AS wday, COUNT(*) AS wau7
        |  FROM (SELECT explode(new_windows) AS w FROM slide_stream)
        |  WHERE w IN (SELECT day FROM obs) GROUP BY 1),
        |dau AS (SELECT day AS wday, COUNT(*) AS dau1
        |  FROM slide_stream GROUP BY 1)
        |SELECT w.wday, d.dau1, w.wau7
        |FROM wau w JOIN dau d ON w.wday = d.wday""".stripMargin)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "sliding-active stream emitted nothing")
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }
}
