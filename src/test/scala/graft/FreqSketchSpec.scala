package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqSketch

/** Misra–Gries sketch: the classic guarantees must hold under arbitrary
  * chunking and merge shapes (that is what makes it safe as a partial
  * aggregate), and the catalog query's self-audit must pass on real data.
  */
class FreqSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("guarantees hold under random chunking and merge order (seeded)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val k = 8 + rnd.nextInt(24)
      // skewed stream: min of two uniforms concentrates low ids
      val items = (1 to 3000).map(_ =>
        s"w${math.min(rnd.nextInt(60), rnd.nextInt(60))}")
      val n = items.size
      val exact = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }

      // random partitioning into partial aggregates, then a random-order
      // fold of merges (any merge tree must preserve the bounds)
      val partials = rnd.shuffle(
        items.grouped(1 + rnd.nextInt(300)).toSeq.map(_.foldLeft(
          Map.empty[String, Long])((b, i) => FreqSketch.mgAdd(b, i, k))))
      val sketch = partials.reduce((a, b) => FreqSketch.mgMerge(a, b, k))

      assert(sketch.size <= k, s"trial $trial: state exceeded k")
      exact.foreach { case (item, c) =>
        if (c * (k + 1) > n)
          assert(sketch.contains(item),
            s"trial $trial: heavy item $item (count $c, n=$n, k=$k) missing")
        sketch.get(item).foreach { est =>
          assert(est <= c,
            s"trial $trial: estimate $est exceeds true count $c for $item")
          assert((c - est) * (k + 1) <= n,
            s"trial $trial: underestimate ${c - est} beyond n/(k+1) for $item")
        }
      }
      // sketch keys are always real stream items (no phantom counters)
      assert(sketch.keySet.subsetOf(exact.keySet))
    }
  }

  test("x14 self-audit: every guaranteed-heavy bigram surfaces in bound") {
    val rows = SparkEntry.queries("x14_approx_topk")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "no guaranteed-heavy bigrams on testdata")
    assert(rows.forall(_.getAs[Boolean]("bound_ok")),
      s"MG bound violated: ${rows.filterNot(_.getAs[Boolean]("bound_ok")).take(3).mkString(";")}")
  }
}
