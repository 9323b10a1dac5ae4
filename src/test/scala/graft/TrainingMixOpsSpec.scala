package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Independent single-node oracles for the round's training-mix operators:
  * v11 SemDeDup (nearest-seed clustering + within-cluster cosine prune),
  * g5 UniMax language balancing, x16 rare-token fraction. Each test
  * recomputes the operator from first principles on collected sf0.001 rows
  * and asserts set-equality with the catalog query — a second oracle on top
  * of the driver's DuckDB hash gate, plus the structural invariants the
  * census output alone cannot show (kept-set pairwise bound, repartition
  * invariance).
  */
class TrainingMixOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Same operation order as [[graft.search.VectorSearch.cosine]]: per-term
    * float→double multiply, strict left-to-right accumulation, zero-norm
    * guard — so argmax/threshold decisions agree bit-for-bit.
    */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("v11 census matches a from-scratch SemDeDup; kept set is pairwise <= tau") {
    val tau = 0.3
    val rows = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    val seeds = rows.filter(_._1 < 8)
    def assign(v: Array[Float]): Long =
      seeds.map { case (sid, sv) => (-cos(v, sv), sid) }.min._2
    val byCluster = rows.groupBy { case (_, v) => assign(v) }
    val discarded = scala.collection.mutable.Set[Long]()
    for {
      (_, members) <- byCluster
      pair <- members.sortBy(_._1).combinations(2)
    } if (cos(pair(0)._2, pair(1)._2) > tau) discarded += pair(1)._1
    // the prune rule's guarantee: survivors are pairwise <= tau
    for ((_, members) <- byCluster) {
      val kept = members.filterNot(m => discarded(m._1))
      for (pair <- kept.combinations(2))
        assert(cos(pair(0)._2, pair(1)._2) <= tau,
          s"kept pair ${pair(0)._1},${pair(1)._1} above tau")
    }
    val expected = byCluster.map { case (c, ms) =>
      (c, ms.length.toLong, ms.count(m => discarded(m._1)).toLong)
    }.toSet
    val got = SparkEntry.queries("v11_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.map(_._2).sum == rows.length)
  }

  test("g5 caps over-budget languages, keeps the rest whole, and is partitioning-invariant") {
    def run(): Set[(String, Long, Long, Long)] =
      SparkEntry.queries("g5_unimax_sample")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val out = run()
    assert(out.nonEmpty)
    out.foreach { case (lang, n, k, chars) =>
      assert(k <= n, s"$lang kept more than it has")
      assert(chars >= 0L)
      if (n <= 60) assert(k == n, s"under-budget $lang was thinned")
      // hash-thinning keeps ~B docs; allow generous Bernoulli slack
      else assert(k >= 30 && k <= 90, s"$lang kept $k of $n, budget 60")
    }
    // the keep decision is a pure function of the row: a different shuffle
    // layout must reproduce the census exactly
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      assert(run() == out)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("d10 flags exact cross-shard duplicates and never pairs new with new") {
    val s = spark
    import s.implicits._
    // salted doc_id hash buckets (md5("d10:"+id) % 100): 0,10,22,37 land
    // in the >=90 "new" slice; 1..8 in history (verified against the same
    // md5 recipe the query and oracle share).
    val mk = (id: Long, text: String, lang: String) =>
      (id, text, lang, s"src$id", text.length.toLong)
    val docs = Seq(
      mk(0L, "alpha beta gamma delta epsilon zeta eta theta", "a"), // new, = doc 1
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta", "a"), // history
      mk(10L, "one two three four five six seven eight nine", "c"), // new, unique
      mk(22L, "red orange yellow green blue indigo violet ultra", "d"), // new, = 37
      mk(37L, "red orange yellow green blue indigo violet ultra", "d"), // new, = 22
      mk(2L, "history only language e sits outside the new slice", "e"))
    val dir = java.nio.file.Files.createTempDirectory("d10spec").toString
    try {
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("d10_incremental_dedup")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(got == Set(
        // identical text across the shard boundary: exact AND near (same
        // digest, same signature)
        ("a", 1L, 1L, 1L, 0L),
        // unique new doc: clean
        ("c", 1L, 0L, 0L, 1L),
        // two identical NEW docs with no history twin: both clean — the
        // incremental pass must not dedup the shard against itself
        ("d", 2L, 0L, 0L, 2L)))
      // history-only language produced no census row
      assert(!got.exists(_._1 == "e"))
    } finally deleteRecursively(dir)
  }

  test("d10 hot-band members are near-dups of history, not clean") {
    val s = spark
    import s.implicits._
    // 120 identical-text docs (> BandSizeCap 100 per band bucket): 119 in
    // history plus new doc 0. Every band bucket doc 0 lands in is hot, so
    // the capped PAIR join sees none of its rows — the hot-band path must
    // still classify it near-dup (it IS a duplicate of the hot history
    // cluster). Exact stays flagged too (identical digest). A hot
    // all-new bucket cannot arise here (only one new doc), so the
    // has-history guard is exercised on the flagged side.
    assert(slice(0L) >= 90, "doc 0 must sit in the new slice")
    val histIds = Iterator.from(1).map(_.toLong).filter(slice(_) < 90)
      .take(119).toSeq
    val hist = histIds.map(i =>
      (i, "mass produced boilerplate header text block repeated",
        "h", s"src$i", 50L))
    val docs = (0L, "mass produced boilerplate header text block repeated",
      "h", "src0", 50L) +: hist
    val dir = java.nio.file.Files.createTempDirectory("d10hot").toString
    try {
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("d10_incremental_dedup")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      // doc 0 is the only new doc; it must be exact AND near, never clean
      assert(got.toSeq == Seq(("h", 1L, 1L, 1L, 0L)))
    } finally deleteRecursively(dir)
  }

  test("x17 BPE-encode census matches a single-node recomputation") {
    import graft.functions.Bpe
    val docs = Tables.documents(spark, dir).select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val words = docs.map { case (l, t) =>
      l -> t.trim.split("[ \t\n\f\r]+").toSeq
    }
    val corpusVocab = words.flatMap(_._2).groupBy(identity)
      .map { case (w, occ) => w -> occ.length.toLong }
    val merges = Bpe.trainLocal(corpusVocab, 24).map(_._1)
    val encLen = corpusVocab.keys
      .map(w => w -> Bpe.encode(w, merges).length.toLong).toMap
    val expected = words.groupBy(_._1).map { case (l, ws) =>
      val toks = ws.flatMap(_._2)
      val nChars = toks.map(_.length.toLong).sum
      val nBpe = toks.map(encLen).sum
      (l, toks.length.toLong, nChars, nBpe, nChars.toDouble / nBpe)
    }.toSet
    val got = SparkEntry.queries("x17_bpe_encode")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected)
  }

  /** The query's salted shard hash, recomputed independently:
    * md5("d10:" + id) 15-hex-digit prefix mod 100.
    */
  private def slice(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"d10:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
  }

  private def deleteRecursively(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("x16 rare-token census matches brute force") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("[ \t\n\f\r]+").toSeq
    }
    val total = toks.map(_._2.length.toLong).sum
    val tf = toks.flatMap(_._2).groupBy(identity)
      .map { case (w, occ) => w -> occ.length.toLong }
    val expected = toks.map { case (id, ws) =>
      val rare = ws.count(w => tf(w) * 1000L < total)
      (id, ws.length.toLong, rare.toLong, rare.toDouble / ws.length)
    }.toSet
    val got = SparkEntry.queries("x16_rare_tokens")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
  }
}
