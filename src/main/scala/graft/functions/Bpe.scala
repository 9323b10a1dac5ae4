package graft.functions

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction — the vocabulary-learning job a
  * training-data pipeline runs before tokenizing a corpus (Sennrich et al.
  * 2016; the SentencePiece/GPT recipe).
  *
  * The 100 TB shape: BPE never iterates over the corpus — it iterates over
  * the WORD-FREQUENCY table (one corpus shuffle builds it, the x3 census
  * shape; ~10⁸ rows at web scale vs ~10¹² corpus tokens). Each round is a
  * vocabulary-sized adjacent-pair census (map-side partial agg on the
  * symbolized vocab) plus a 1-row argmax (`TakeOrderedAndProject`), with
  * the merges-so-far shipped in the task closure — the same
  * driver-coordinated iterative profile as
  * [[graft.dedup.ConnectedComponents]]. Rounds re-symbolize from the
  * cached base vocabulary (O(J²) symbol work on vocab rows) instead of
  * carrying an ever-longer iterative lineage — at J ≤ a few thousand
  * merges the re-apply is cheap map work and the plan stays flat.
  *
  * Determinism: the argmax tie-breaks on (count desc, left asc, right
  * asc), so the learned merge table is a pure function of the vocabulary.
  * The single-node reference trainer ([[trainLocal]]) implements the
  * identical rule and the spec pins distributed ≡ local on real data.
  */
object Bpe {

  /** Conf key for the local-training vocabulary cutoff (vocabularies at or
    * below it collect and train on the driver; above it each round runs as
    * a distributed pair census). An explicit `localThreshold` argument
    * overrides the conf.
    */
  val LocalThresholdKey = "spark.graft.bpe.localThreshold"

  /** One learned merge; the new symbol is `left + right`. */
  final case class Merge(left: String, right: String)

  /** Split a word into initial character symbols — by Unicode CODEPOINT,
    * not UTF-16 code unit: a surrogate pair is one symbol. This is both
    * the semantically right base alphabet for a tokenizer (a lone
    * surrogate is not text) and the only choice the DuckDB oracle can
    * mirror (SQL string indexing is codepoint-based; a half-surrogate is
    * unrepresentable there).
    */
  def charSymbols(word: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Apply one merge left-to-right, non-overlapping (the standard BPE
    * apply pass).
    */
  def applyMerge(syms: List[String], m: Merge): List[String] = {
    val a = syms.toArray
    val out = List.newBuilder[String]
    var i = 0
    while (i < a.length) {
      if (i + 1 < a.length && a(i) == m.left && a(i + 1) == m.right) {
        out += m.left + m.right
        i += 2
      } else {
        out += a(i)
        i += 1
      }
    }
    out.result()
  }

  /** Apply a merge list in learning order. */
  def applyMerges(syms: List[String], merges: List[Merge]): List[String] =
    merges.foldLeft(syms)(applyMerge)

  /** Tokenize a word with a learned merge table (the serving-side encode). */
  def encode(word: String, merges: List[Merge]): List[String] =
    applyMerges(charSymbols(word), merges)

  private def pairs(syms: List[String]): Iterator[(String, String)] =
    if (syms.lengthCompare(2) < 0) Iterator.empty
    else syms.iterator.zip(syms.iterator.drop(1))

  /** Spark compares strings as UTF-8 BYTES (UTF8String binary order);
    * Java's compareTo compares UTF-16 code units. They disagree exactly
    * when one side contains a supplementary character (surrogate pair vs
    * U+E000..U+FFFF), so the local tie-break must use the UTF-8 order or
    * the two trainers could pick different merges on emoji-bearing text.
    */
  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    var cmp = 0
    while (cmp == 0 && i < n) {
      cmp = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      i += 1
    }
    if (cmp != 0) cmp else java.lang.Integer.compare(x.length, y.length)
  }

  /** Single-node reference trainer over a word-frequency map (identical
    * argmax + tie-break to the distributed rounds, including the UTF-8
    * string order): the spec's oracle AND the small-vocabulary fast path
    * of [[train]]. Returns each merge with its selection-time pair count.
    */
  def trainLocal(vocab: Map[String, Long], nMerges: Int): List[(Merge, Long)] = {
    val so = utf8Order
    var merges = List.empty[Merge]
    val out = List.newBuilder[(Merge, Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val ms = merges.reverse // hoisted: O(J) once per round, not per word
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, f) =>
        pairs(applyMerges(charSymbols(w), ms))
          .foreach(p => counts.update(p, counts.getOrElse(p, 0L) + f))
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((pl, pr), pc) =>
          (-pc, pl, pr)
        }(Ordering.Tuple3(Ordering[Long], so, so))
        merges = Merge(l, r) :: merges
        out += ((Merge(l, r), c))
        round += 1
      }
    }
    out.result()
  }

  /** Trainer over a (word, freq) Dataset. Strategy picks by size, like
    * [[graft.dedup.ConnectedComponents]] and a broadcast join: a
    * vocabulary under `localThreshold` rows collects once and trains on
    * the driver (the SentencePiece recipe — the corpus-sized work was the
    * census that BUILT the vocab; J driver-coordinated Spark jobs over a
    * small table would be pure scheduling overhead, measured 10× slower
    * locally), while a web-scale vocabulary runs each round as a
    * distributed pair census + 1-row argmax. Both paths share the same
    * argmax/tie-break rule and the spec pins them equal.
    */
  def train(vocab: Dataset[(String, Long)], nMerges: Int,
      localThreshold: Long = -1L): List[(Merge, Long)] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    // deploy-tunable strategy cutoff (an explicit argument wins; -1 reads
    // the session conf) — same contract as ConnectedComponents.label
    val threshold =
      if (localThreshold >= 0) localThreshold
      else spark.conf.get(Bpe.LocalThresholdKey, (1L << 20).toString).toLong
    val base = vocab.cache()
    try {
      if (base.count() <= threshold) {
        // merge duplicate word rows by SUMMING freqs — .toMap would keep
        // only the last row, diverging from the distributed path (which
        // counts every row's pairs)
        val merged = scala.collection.mutable.HashMap.empty[String, Long]
        base.collect().foreach { case (w, f) =>
          merged.update(w, merged.getOrElse(w, 0L) + f)
        }
        return trainLocal(merged.toMap, nMerges)
      }
      val out = List.newBuilder[(Merge, Long)]
      var merges = List.empty[Merge] // reverse learning order
      var round = 0
      var done = false
      while (round < nMerges && !done) {
        val ms = merges.reverse
        val top = base
          .flatMap { case (w, f) =>
            pairs(applyMerges(charSymbols(w), ms)).map(p => (p._1, p._2, f))
          }
          .toDF("l", "r", "f")
          .groupBy(col("l"), col("r")).agg(sum(col("f")).as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val m = Merge(top(0).getString(0), top(0).getString(1))
          merges = m :: merges
          out += ((m, top(0).getLong(2)))
          round += 1
        }
      }
      out.result()
    } finally { base.unpersist(); () }
  }
}
