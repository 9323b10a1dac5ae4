package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe
import graft.functions.Bpe.Merge

/** BPE induction: the textbook example must come out exactly, encode must
  * respect merge order, and the distributed trainer must equal the
  * single-node reference on real corpus data (same argmax, same
  * tie-break — the property that makes the rows-only driver check safe).
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("textbook vocabulary learns the expected first merges") {
    // Sennrich et al.'s shape: 'es' dominates, then 'est', then 'l o'
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.trainLocal(vocab, 4).map(_._1)
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, ... —
    // tie (e,s)/(s,t) breaks lexicographically to (e,s)
    assert(merges.head == Merge("e", "s"))
    assert(merges(1) == Merge("es", "t")) // es+t = 9 now the unique max
    assert(merges(2) == Merge("l", "o"))  // (l,o)=7 ties (o,w)=7 → lex
    assert(merges(3) == Merge("lo", "w"))
  }

  test("charSymbols splits by codepoint: a surrogate pair is ONE symbol") {
    // the base alphabet must match the DuckDB oracle's codepoint indexing
    // (a lone surrogate is unrepresentable in SQL) — and is the right
    // tokenizer alphabet besides
    assert(Bpe.charSymbols("a😀b") == List("a", "😀", "b"))
    assert(Bpe.charSymbols("𝒜😀") == List("𝒜", "😀"))
    assert(Bpe.charSymbols("한글") == List("한", "글"))
    // training over emoji-bearing words never yields half-surrogate merges
    val merges = Bpe.trainLocal(Map("😀x" -> 3L, "😀y" -> 2L), 2).map(_._1)
    assert(merges.head == Merge("😀", "x"))
    // no lone surrogates anywhere: every merge side survives a UTF-8
    // round-trip (a half-surrogate would become U+FFFD)
    def wellFormed(s: String) = new String(s.getBytes("UTF-8"), "UTF-8") == s
    assert(merges.forall(m => wellFormed(m.left) && wellFormed(m.right)))
  }

  test("encode applies merges in learning order, non-overlapping") {
    val merges = List(Merge("a", "a"), Merge("aa", "aa"))
    // greedy left-to-right: aaaa -> aa aa -> aaaa; aaaaa keeps a tail 'a'
    assert(Bpe.encode("aaaa", merges) == List("aaaa"))
    assert(Bpe.encode("aaaaa", merges) == List("aaaa", "a"))
    assert(Bpe.encode("ab", merges) == List("a", "b"))
  }

  test("distributed trainer equals the single-node reference on testdata") {
    val s = spark
    import s.implicits._
    val words = Tables.documents(s, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextSketch.words(
          org.apache.spark.sql.functions.col("text"))).as("word"))
    val vocabDf = words.groupBy("word")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("freq"))
      .as[(String, Long)]
    val localVocab = vocabDf.collect().toMap

    // localThreshold = 0 forces the distributed rounds — the
    // strategy equality IS the thing under test
    val distributed = Bpe.train(vocabDf, 16, localThreshold = 0L).map(_._1)
    val reference = Bpe.trainLocal(localVocab, 16).map(_._1)
    assert(distributed == reference,
      s"distributed/local divergence:\n$distributed\n$reference")
    assert(distributed.nonEmpty)
    // and the auto-strategy (local fast path here) agrees too
    assert(Bpe.train(vocabDf, 16).map(_._1) == reference)
  }

  test("duplicate word rows SUM on the local fast path (never last-wins)") {
    val s = spark
    import s.implicits._
    // "low" appears as two rows; its total freq (7) should dominate "new"
    // (6). A .toMap collect would keep only the last row (freq 2) and
    // learn "new"'s pairs first — diverging from the distributed path.
    val dup = Seq(("low", 5L), ("new", 6L), ("low", 2L)).toDS()
    val merged = Seq(("low", 7L), ("new", 6L)).toDS()
    val viaDup = Bpe.train(dup, 4)
    assert(viaDup == Bpe.train(merged, 4),
      "local path must aggregate duplicate vocab rows")
    // same counts as the distributed path on the duplicated input
    assert(viaDup == Bpe.train(dup, 4, localThreshold = 0L))
  }

  test("strategy cutoff is session-conf tunable (spark.graft.bpe.localThreshold)") {
    val s = spark
    import s.implicits._
    val vocab = Seq(("lower", 5L), ("newest", 6L), ("widest", 3L)).toDS()
    val default = Bpe.train(vocab, 6)
    s.conf.set(Bpe.LocalThresholdKey, "0") // force the distributed rounds
    try assert(Bpe.train(vocab, 6) == default)
    finally s.conf.unset(Bpe.LocalThresholdKey)
  }
}
