package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.embedding.OfflineEmbedder
import graft.media.MediaPipeline
import graft.media.MediaPipeline.MediaRow
import graft.search.{Ann, Ivf, VectorSearch}
import graft.streaming.EventStreams
import graft.streaming.EventStreams.SessionInput

class AnnStreamingMediaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ann: bucketed index prunes the scan and keeps useful recall") {
    val s = spark
    import s.implicits._
    val embedder = new OfflineEmbedder(32)
    val rows = (0 until 400).map(i => (i.toLong, embedder.embedQuery(s"doc $i")))
    val e = rows.toDF("vec_id", "vector")
    val planes = Ann.makePlanes(32, numPlanes = 5)
    val index = Ann.buildIndex(e, planes).cache()

    // bucket assignment is total and deterministic
    assert(index.filter(col("bucket").isNull).count() == 0)
    assert(index.select("bucket").distinct().count() > 1)

    val query = embedder.embedQuery("doc 123")
    val exact = VectorSearch.knn(e, query, 10, tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().toSet
    val approx = Ann.search(index, query, planes, 10, probeDepth = 1,
      tieBreak = "vec_id").select("vec_id").as[Long].collect().toSet

    // the query vector itself lives in its own bucket → always found
    assert(approx.contains(123L))
    // multi-probe recall on random data: generous deterministic bound
    assert(exact.intersect(approx).size >= 3,
      s"recall too low: ${exact.intersect(approx).size}/10")

    // pruning actually reduces the scan
    val probed = Ann.probeBuckets(Ann.bucketOf(query, planes), planes)
    val scanned = index.filter(col("bucket").isin(probed: _*)).count()
    assert(scanned < 400, s"no pruning: $scanned")
    index.unpersist()
  }

  test("ivf: coarse quantizer partitions totally; full probe is exact") {
    val s = spark
    import s.implicits._
    val embedder = new OfflineEmbedder(32)
    val rows = (0 until 400).map(i => (i.toLong, embedder.embedQuery(s"doc $i")))
    val e = rows.toDF("vec_id", "vector")

    val sample = rows.sortBy(_._1).map(_._2).take(256).toArray
    val q = Ivf.train(sample, k = 8, iters = 5)
    // deterministic training: same sample → same centroids
    assert(q.centroidsFlat.sameElements(
      Ivf.train(sample, k = 8, iters = 5).centroidsFlat))

    val index = Ivf.buildIndex(e, q).cache()
    // assignment is total: every row in exactly one list in [0, k)
    assert(index.filter(col("list_id").isNull ||
      col("list_id") < 0 || col("list_id") >= q.k).count() == 0)
    assert(index.select("list_id").distinct().count() > 1)

    val query = embedder.embedQuery("doc 123")
    val exact = VectorSearch.knn(e, query, 10, tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().toSet

    // recall never decreases with nprobe; probing every list IS exact
    val recalls = Seq(1, 2, 4, q.k).map { nprobe =>
      val approx = Ivf.search(index, query, q, 10, nprobe, tieBreak = "vec_id")
        .select("vec_id").as[Long].collect().toSet
      exact.intersect(approx).size
    }
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(recalls.last == 10, s"full probe must be exact: ${recalls.last}")

    // the query's own vector sits in the first probed list
    assert(Ivf.search(index, query, q, 10, nprobe = 1, tieBreak = "vec_id")
      .select("vec_id").as[Long].collect().contains(123L))

    // nprobe=1 prunes the scan
    val scanned = index.filter(
      col("list_id").isin(Ivf.nearestLists(query, q, 1): _*)).count()
    assert(scanned < 400, s"no pruning: $scanned")
    index.unpersist()
  }

  test("streaming: watermarked tumbling window matches batch aggregation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventStreams.tumblingCounts(events, watermark = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode("append").start()

    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    mem.addData((t(0), "click", 1.0), (t(10), "click", 2.0), (t(20), "error", 3.0))
    q.processAllAvailable()
    // advance watermark past hour 10 so its windows close
    mem.addData((t(150), "click", 9.0))
    q.processAllAvailable()
    val out = s.sql("SELECT * FROM win").collect()
    q.stop()

    val clicks = out.find(r => r.getAs[String]("event_type") == "click" &&
      r.getAs[java.sql.Timestamp]("window_start").toString.startsWith("2024-01-01 10"))
    assert(clicks.isDefined, s"closed click window missing: ${out.mkString(";")}")
    assert(clicks.get.getAs[Long]("n_events") == 2)
    assert(clicks.get.getAs[Double]("total_value") == 3.0)
  }

  test("streaming: gap sessionization emits closed sessions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[SessionInput]
    val sessions = EventStreams.sessionize(mem.toDS(), gapSec = 600,
      watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()

    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    // user 1: two events 5 min apart (one session), then 30-min gap → new
    mem.addData(SessionInput(1, ts(0), 1), SessionInput(1, ts(5), 2))
    q.processAllAvailable()
    mem.addData(SessionInput(1, ts(40), 3)) // closes session 1 inline
    q.processAllAvailable()
    mem.addData(SessionInput(1, ts(120), 4)) // closes session 2 inline (gap)
    q.processAllAvailable()
    // a LATER event from a DIFFERENT user advances the watermark past
    // user 1's timeout → exercises the hasTimedOut/EventTimeTimeout branch
    mem.addData(SessionInput(2, ts(400), 5))
    q.processAllAvailable()
    val out = s.sql("SELECT * FROM sess WHERE user_id = 1 ORDER BY session_start_us")
      .collect()
    q.stop()

    assert(out.length == 3, s"expected 3 closed sessions for user 1: ${out.mkString(";")}")
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Long]("duration_sec") == 300)
    assert(out(1).getAs[Long]("n_events") == 1)
    // session 3 (the lone ts(120) event) closed by event-time TIMEOUT
    assert(out(2).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("duration_sec") == 0)
  }

  test("streaming: watermarked dedup drops repeats, bounded by digest state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val out = EventStreams.dedupStream(docs, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()

    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    mem.addData(
      (t(0), 1L, "the same document body"),
      (t(1), 2L, "a different document"),
      (t(2), 3L, "the same document body")) // dup of doc 1 within watermark
    q.processAllAvailable()
    mem.addData((t(5), 4L, "the same document body")) // still within horizon
    q.processAllAvailable()
    val rows = s.sql("SELECT doc_id FROM dedup ORDER BY doc_id")
      .collect().map(_.getLong(0))
    q.stop()

    // first occurrence of each digest survives; repeats within the
    // watermark horizon drop regardless of micro-batch boundaries
    assert(rows.toSeq == Seq(1L, 2L),
      s"expected only first occurrences, got ${rows.mkString(",")}")
  }

  test("streaming ingest produces identical fragments to batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val doc = graft.ingest.IngestPipeline.DocInput(
      "docs/stream.md", "A paragraph of text that is long enough to matter.\n\n```python\nx = 1\n```", isOcr = false)

    val mem = MemoryStream[graft.ingest.IngestPipeline.DocInput]
    val frags = EventStreams.ingestStream(mem.toDS())
    val q = frags.writeStream.format("memory").queryName("frags")
      .outputMode("append").start()
    mem.addData(doc)
    q.processAllAvailable()
    val streamed = s.sql("SELECT id FROM frags").as[String].collect().sorted.toSeq
    q.stop()

    val batch = graft.ingest.IngestPipeline.processDocument(doc)
      .fragments.map(_.id).sorted
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("media: stub decode features are deterministic and schema-complete") {
    val s = spark
    import s.implicits._
    val media = Seq(
      MediaRow(1, "image", "fake png bytes here".getBytes("UTF-8")),
      MediaRow(2, "video", Array[Byte](0, 0, 0, 24, 102, 116, 121, 112))).toDS()
    val f = MediaPipeline.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f(0).byte_len == 19)
    assert(f(0).content_hash.length == 32)
    assert(f(0).header_hex == "66616B65") // "fake"
    assert(f(0).n_frames == 1)
    assert(f(1).header_hex == "00000018")
    assert(f(1).n_frames >= 1 && f(1).n_frames <= 16)
    assert(f(0).width >= 16 && f(0).width < 16 + 1024)
    // determinism
    val f2 = MediaPipeline.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f.toSeq == f2.toSeq)
  }
}
