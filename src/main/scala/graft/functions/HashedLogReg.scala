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
    * (decay 0 = constant rate); returns (weights, bias). First-order
    * training is kept as the simple reference schedule; production
    * callers (x21, classify-train) use [[trainNewton]] — measured 20×
    * faster AND more accurate on the count-feature conditioning
    * (momentum/Adagrad variants were swept in round 9 and rejected:
    * none reached the 40-step GD accuracy under the latency budget).
    */
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

  /** IRLS / Newton training: `iters` second-order steps, each ONE Spark
    * job that returns the gradient AND the full Hessian as dim+1 scaled
    * exact-long sums (the "accumulated curvature" answer to 40 GD jobs:
    * logistic regression on count features is badly conditioned, so
    * first-order steps need a long schedule — the Newton direction
    * removes the conditioning and converges in ~5 steps to the actual
    * penalized MLE, no oscillation, no tuning).
    *
    * Determinism is the same grid trick as [[train]], applied to the
    * Hessian too: per doc, the residual d = ⌊(p−y)·1e6⌉ and the IRLS
    * weight µ = ⌊p(1−p)·1e6⌉ are exact longs; every Hessian entry
    * Σ f_j·f_k·µ and gradient entry Σ f_j·d is an exact long sum —
    * order-free under any partitioning. The accumulation is one tight
    * mapPartitions pass over NONZERO feature pairs into a single long
    * array per partition (upper triangle + gradient tail — the
    * treeAggregate shape; a million times fewer rows than exploding the
    * pair products through a shuffle), element-added on the driver; the
    * (dim+1)×(dim+1) solve (Gaussian elimination with partial pivoting,
    * fixed pivot order) runs on the driver. `ridge` (per-doc λ) keeps
    * the system regular on separable data. Long-sum headroom:
    * f_j·f_k·µ ≤ len²·2.5e5 per doc — overflows only past ~10¹² docs
    * per partition-sum at len 200; at that scale the grid coarsens to
    * 1e-4 (same trade the GD path documents).
    */
  def trainNewton(features: DataFrame, dim: Int, iters: Int = 5,
      ridge: Double = 1e-3): (Array[Double], Double) = {
    val spark = features.sparkSession
    import spark.implicits._
    val d1 = dim + 1 // bias = constant-1 feature at index dim
    val nTri = d1 * (d1 + 1) / 2
    def tri(j: Int, k: Int): Int = j * d1 - j * (j - 1) / 2 + (k - j)
    val rows = features.select(col("y").cast("long"), col("f"))
      .as[(Long, Array[Long])]
    val n = rows.count().toDouble
    require(n > 0, "cannot train on an empty features table")
    val w = new Array[Double](d1)
    var t = 0
    while (t < iters) {
      val wB = spark.sparkContext.broadcast(w.clone())
      // one tight pass per partition: margin → grid residual/IRLS weight
      // → nonzero-only outer-product accumulation into ONE long array
      // (upper triangle + gradient tail); partition arrays element-add
      // on the driver — exact longs, order-free
      val sums = rows.mapPartitions { it =>
        val wv = wB.value
        val acc = new Array[Long](nTri + d1)
        val nz = new Array[Int](d1)
        it.foreach { case (y, f) =>
          var m = 0.0
          var j = 0
          while (j < dim) { m += f(j).toDouble * wv(j); j += 1 }
          m += wv(dim)
          val p = 1.0 / (1.0 + StrictMath.exp(-m))
          def grid(x: Double): Long =
            (if (x >= 0) math.floor(x * 1e6 + 0.5)
             else math.ceil(x * 1e6 - 0.5)).toLong
          val d = grid(p - y.toDouble)
          val mu = grid(p * (1.0 - p))
          var nnz = 0
          j = 0
          while (j < dim) {
            if (f(j) != 0L) { nz(nnz) = j; nnz += 1 }
            j += 1
          }
          nz(nnz) = dim // the constant-1 bias slot
          nnz += 1
          var a = 0
          while (a < nnz) {
            val ja = nz(a)
            val fa = if (ja == dim) 1L else f(ja)
            acc(nTri + ja) += fa * d
            var b = a
            while (b < nnz) {
              val jb = nz(b)
              val fb = if (jb == dim) 1L else f(jb)
              acc(ja * d1 - ja * (ja - 1) / 2 + (jb - ja)) += fa * fb * mu
              b += 1
            }
            a += 1
          }
        }
        Iterator.single(acc)
      }.reduce { (x, y) =>
        var i = 0
        while (i < x.length) { x(i) += y(i); i += 1 }
        x
      }
      wB.destroy()
      // assemble the PENALIZED Newton system — the objective is
      // L(w) + (ridge·n/2)·|w|² (bias included), so BOTH sides carry the
      // penalty: ∇ = g + ridge·n·w, ∇² = H + ridge·n·I. With the
      // gradient term the iteration converges to the penalized MLE and
      // stays bounded on separable data (Hessian-only ridge would be
      // damped Newton toward the UNPENALIZED optimum at infinity).
      val a = Array.ofDim[Double](d1, d1 + 1)
      var j = 0
      while (j < d1) {
        var k = 0
        while (k < d1) {
          val v = sums(tri(math.min(j, k), math.max(j, k)))
          a(j)(k) = v.toDouble / 1e6 + (if (j == k) ridge * n else 0.0)
          k += 1
        }
        a(j)(d1) = sums(nTri + j).toDouble / 1e6 + ridge * n * w(j)
        j += 1
      }
      // Gaussian elimination, partial pivoting, fixed tie order
      var col0 = 0
      while (col0 < d1) {
        var piv = col0
        var r = col0 + 1
        while (r < d1) {
          if (math.abs(a(r)(col0)) > math.abs(a(piv)(col0))) piv = r
          r += 1
        }
        val tmp = a(col0); a(col0) = a(piv); a(piv) = tmp
        val pv = a(col0)(col0)
        if (pv != 0.0) {
          r = col0 + 1
          while (r < d1) {
            val m = a(r)(col0) / pv
            var c = col0
            while (c <= d1) { a(r)(c) -= m * a(col0)(c); c += 1 }
            r += 1
          }
        }
        col0 += 1
      }
      val delta = new Array[Double](d1)
      var rr = d1 - 1
      while (rr >= 0) {
        var s = a(rr)(d1)
        var c = rr + 1
        while (c < d1) { s -= a(rr)(c) * delta(c); c += 1 }
        delta(rr) = if (a(rr)(rr) == 0.0) 0.0 else s / a(rr)(rr)
        rr -= 1
      }
      j = 0
      while (j < d1) { w(j) -= delta(j); j += 1 }
      t += 1
    }
    (w.take(dim), w(dim))
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
