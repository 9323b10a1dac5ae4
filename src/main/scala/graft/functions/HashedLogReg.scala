package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training over hashed bag-of-words
  * features — the fasttext-style quality/language classifier every
  * large-corpus pipeline trains (CCNet filters on a fasttext LM,
  * LLaMA-class corpora on quality classifiers; the reference's analog is
  * its rule-based eligibility gating, validators.py, which such a
  * classifier replaces at scale).
  *
  * Spark-first shape, and bit-DETERMINISTIC under any partitioning:
  *
  *   - Features are one row per doc: `(doc_id, y, f: array<long>[dim])`
  *     — token counts hashed into `dim` buckets (one explode + one
  *     partial-agg shuffle to build; at 100 TB this is a write-time
  *     table, and StageCache stands in locally as for the sketch
  *     stages).
  *   - The margin folds `zip_with(f, w, multiply)` in FIXED index order
  *     per row (codegen'd higher-order functions, no UDF), so the dot
  *     product is one identical IEEE sequence per doc — never an
  *     order-dependent shuffle sum of doubles.
  *   - The logistic residual is ROUNDED onto a 1e-6 integer grid;
  *     gradient components are then `Σ f_j · residual_µ` — exact BIGINT
  *     sums, order-free, so the trained weights do not depend on
  *     partitioning or merge order (the a17/w15 exact-power-sum trick
  *     applied to gradient descent). Each iteration is ONE posexplode +
  *     hash-agg shuffle whose output is `dim+1` rows.
  *   - The driver holds only the `dim+1` weight vector; iterations are
  *     O(T) Spark jobs over one cached stage.
  */
object HashedLogReg {

  /** The x21 benchmark corpus: tokenized documents with the LINEAR
    * TEACHER label (2·spark + stream + vector > batch + customer) whose
    * learnability is known by construction. ONE definition serves the
    * catalog query, the CLI train/score verbs, and the specs — editing
    * the teacher anywhere edits it everywhere.
    */
  def teacherDocs(documents: DataFrame): DataFrame = {
    def cnt(t: String) =
      size(filter(col("w"), x => x === t)).cast("long")
    documents
      .select(col("doc_id"), graft.functions.TextSketch.words(col("text")).as("w"))
      .withColumn("y",
        (cnt("spark") * 2 + cnt("stream") + cnt("vector") >
          cnt("batch") + cnt("customer")).cast("long"))
  }

  /** Hashed dense features: one row per doc, `f[j]` = count of tokens
    * hashing to bucket j (non-negative Murmur3 mod dim — Spark's
    * codegen'd `hash`). `labels` rows with no tokens get a zero vector.
    */
  def hashedFeatures(docs: DataFrame, docId: Column, label: Column,
      tokens: Column, dim: Int): DataFrame = {
    val sparse = docs
      .select(docId.as("doc_id"), explode(tokens).as("tok"))
      .groupBy(col("doc_id"),
        pmod(hash(col("tok")), lit(dim)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id").as("fd"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("cnt"))))
        .as("m"))
    docs.select(docId.as("doc_id"), label.cast("long").as("y")).distinct()
      .join(sparse, col("doc_id") === col("fd"), "left")
      .select(col("doc_id"), col("y"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => coalesce(element_at(col("m"), j.cast("int")), lit(0L)))
          .as("f"))
  }

  /** w·x + bias as one fixed-order fold per row. The weight vector rides
    * a broadcast ONE-ROW table (`wv`, `wb` columns) rather than literals:
    * with literals every GD iteration would bake new constants into the
    * plan and pay a fresh whole-stage-codegen COMPILE (~300 ms/step — it
    * dominated training); as data, the generated code is byte-identical
    * across iterations and the codegen cache serves every step.
    */
  private def withWeights(features: DataFrame, w: Array[Double],
      bias: Double): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.crossJoin(
      broadcast(Seq((w.toSeq, bias)).toDF("wv", "wb")))
  }

  private def marginCol: Column =
    aggregate(
      zip_with(col("f"), col("wv"), (c, wv) => c.cast("double") * wv),
      lit(0.0), (acc, x) => acc + x) + col("wb")

  def sigmoid(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))

  /** `iters` full-batch GD steps with 1/(1+t·decay) learning-rate decay
    * (decay 0 = constant rate); returns (weights, bias). */
  def train(features: DataFrame, dim: Int, iters: Int, lr: Double,
      decay: Double = 0.0): (Array[Double], Double) = {
    val n = features.count().toDouble
    require(n > 0, "cannot train on an empty features table")
    val w = new Array[Double](dim)
    var bias = 0.0
    var t = 0
    while (t < iters) {
      val lrT = lr / (1.0 + t * decay)
      // residual on the 1e-6 grid, then Σ f_j · residual — exact longs
      val g = withWeights(features, w, bias)
        .select(round((sigmoid(marginCol) - col("y")) * 1e6)
          .cast("long").as("d"), col("f"))
        .select(col("d"), posexplode(col("f")).as(Seq("j", "cnt")))
        .groupBy(col("j"))
        .agg(sum(col("cnt") * col("d")).as("g"),
          // bucket 0 also carries the bias gradient Σ d (count-free)
          sum(col("d")).as("db"))
        .collect()
      val byJ = g.map(r => r.getInt(0) -> r.getLong(1)).toMap
      val gBias = g.find(_.getInt(0) == 0).map(_.getLong(2)).getOrElse(0L)
      var j = 0
      while (j < dim) {
        w(j) -= lrT * byJ.getOrElse(j, 0L).toDouble / (1e6 * n)
        j += 1
      }
      bias -= lrT * gBias.toDouble / (1e6 * n)
      t += 1
    }
    (w, bias)
  }

  /** Per-doc scores under fixed weights: (doc_id, y, margin, p,
    * predicted, correct). */
  def score(features: DataFrame, w: Array[Double], bias: Double)
      : DataFrame =
    withWeights(features, w, bias)
      .select(col("doc_id"), col("y"), marginCol.as("margin"))
      .select(col("doc_id"), col("y"), col("margin"),
        sigmoid(col("margin")).as("p"),
        (col("margin") > 0).cast("long").as("predicted"))
      .withColumn("correct", (col("predicted") === col("y")).cast("long"))
}
