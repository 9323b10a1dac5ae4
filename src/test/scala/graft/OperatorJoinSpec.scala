package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, RangeJoin}

/** Edge semantics of the custom join operators that the oracle data never
  * exercises: timestamp ties, strict mode, keys with no right rows, null
  * payload fields, and band-boundary hits in the range join. A brute-force
  * reference join (tiny data) is the ground truth for the randomized case.
  */
class OperatorJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[2]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // ---------------- AsOfJoin ----------------

  private def asofFixture = {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "u1", ts(100)), // before any right row
      (2L, "u1", ts(200)), // exact tie with right @200
      (3L, "u1", ts(350)), // between rights
      (4L, "u2", ts(500)), // key with no right rows
      (5L, "u3", ts(999))  // tie among TWO right rows at the same time
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts(200), 10L, Some("a")),
      ("u1", ts(300), 11L, None), // null payload field must still carry
      ("u3", ts(999), 20L, Some("x")),
      ("u3", ts(999), 21L, Some("y"))
    ).toDF("k", "rt", "rid", "tag")
    (left, right)
  }

  test("as-of backward: inclusive match, carry, missing key, tie-break") {
    val (left, right) = asofFixture
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
        payload = Seq("rid", "tag"), rightTiebreak = Some("rid"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getAs[String]("tag"))))
    assert(got(0) == ((1L, None, None)))            // nothing at-or-before
    assert(got(1) == ((2L, Some(10L), Some("a"))))  // equal ts matches
    assert(got(2) == ((3L, Some(11L), None)))       // null payload carried
    assert(got(3) == ((4L, None, None)))            // key absent on right
    assert(got(4) == ((5L, Some(21L), Some("y")))) // greatest tiebreak wins
  }

  test("as-of strict: equal timestamps do NOT match") {
    val (left, right) = asofFixture
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
        payload = Seq("rid"), rightTiebreak = Some("rid"), strict = true)
      .orderBy("id")
      .collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    // id=2 @200 no longer matches the right row @200; id=3 @350 still
    // takes the latest strictly-earlier row (rid=11 @300)
    assert(got.toSeq == Seq(None, None, Some(11L), None, None))
  }

  test("as-of forward: earliest at-or-after, strict, least-tiebreak wins") {
    val (left, right) = asofFixture
    // fixture recap — u1 rights @200 (rid 10), @300 (rid 11);
    // u3 rights @999 (rids 20, 21); lefts: 1@100 2@200 3@350 4@500(u2) 5@999(u3)
    val incl = AsOfJoin.forward(left, right, Seq("k"), "t", "rt",
        payload = Seq("rid"), rightTiebreak = Some("rid"))
      .orderBy("id").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    assert(incl.toSeq == Seq(
      Some(10L), // @100 → earliest at-or-after is @200
      Some(10L), // @200 → equal ts matches inclusively
      None,      // @350 → nothing after
      None,      // u2 has no rights
      Some(20L)  // @999 tie → LEAST tiebreak wins in forward mode
    ))
    val strict = AsOfJoin.forward(left, right, Seq("k"), "t", "rt",
        payload = Seq("rid"), rightTiebreak = Some("rid"), strict = true)
      .orderBy("id").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    assert(strict.toSeq == Seq(
      Some(10L), // @100 unchanged
      Some(11L), // @200 → the @200 right no longer matches; next is @300
      None, None,
      None       // @999 tie excluded in strict mode
    ))
  }

  test("as-of: NULL keys never match (equi-join semantics)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, Option("u1"), ts(300)), (2L, Option.empty[String], ts(300)))
      .toDF("id", "k", "t")
    val right = Seq((Option("u1"), ts(100), 10L), (Option.empty[String], ts(100), 99L))
      .toDF("k", "rt", "rid")
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rid"))
      .orderBy("id").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    // null-key left row must NOT pick up the null-key right payload
    assert(got.toSeq == Seq(Some(10L), None))
  }

  test("as-of: NULL timestamps never match on either side") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "u1", Option(ts(300))),     // real time → matches normally
      (2L, "u1", Option.empty[Timestamp]), // null left time → null payload
      (3L, "u2", Option(ts(300)))      // only a null-time right exists
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", Option(ts(100)), 10L),
      ("u1", Option.empty[Timestamp], 99L), // must never seed a carry
      ("u2", Option.empty[Timestamp], 98L)
    ).toDF("k", "rt", "rid")
    for (forward <- Seq(false, true)) {
      val got = (if (forward)
          AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("rid"))
        else
          AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rid")))
        .orderBy("id").collect()
        .map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
      val want =
        if (forward) Seq(None, None, None) // @300 has no right at-or-after
        else Seq(Some(10L), None, None)
      assert(got.toSeq == want, s"forward=$forward")
    }
  }

  test("as-of rejects payload names colliding with left columns") {
    val (left, right) = asofFixture
    val collide = right.withColumnRenamed("rid", "id")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, collide, Seq("k"), "t", "rt", Seq("id"))
    }
  }

  test("as-of matches brute force on random tied data, all four variants") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // small ts range + few keys → plenty of exact-tie collisions
    val leftRows = (1 to 120).map(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(20).toLong))
    val rightRows = (1 to 120).map(i =>
      (i + 1000L, s"k${rnd.nextInt(4)}", rnd.nextInt(20).toLong))
    val left = leftRows.map { case (id, k, t) => (id, k, ts(t)) }
      .toDF("id", "k", "t")
    val right = rightRows.map { case (id, k, t) => (k, ts(t), id) }
      .toDF("k", "rt", "rid")

    for (forward <- Seq(false, true); strict <- Seq(false, true)) {
      val got = (if (forward)
          AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("rid"),
            rightTiebreak = Some("rid"), strict = strict)
        else
          AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rid"),
            rightTiebreak = Some("rid"), strict = strict))
        .select($"id", $"rid").as[(Long, Option[Long])]
        .collect().toMap

      val expect = leftRows.map { case (id, k, t) =>
        val admissible = rightRows.filter { case (_, rk, rt) =>
          rk == k && ((forward, strict) match {
            case (false, false) => rt <= t
            case (false, true)  => rt < t
            case (true, false)  => rt >= t
            case (true, true)   => rt > t
          })
        }
        val winner =
          if (admissible.isEmpty) None
          else if (forward) Some(admissible.minBy(r => (r._3, r._1))._1)
          else Some(admissible.maxBy(r => (r._3, r._1))._1)
        id -> winner
      }.toMap

      assert(got == expect, s"forward=$forward strict=$strict: " +
        expect.keys.filter(k => got(k) != expect(k)).take(3)
          .map(k => s"id=$k got=${got(k)} want=${expect(k)}").mkString(", "))
    }
  }

  // ---------------- RangeJoin ----------------

  test("range join: boundary semantics (lower exclusive, upper inclusive)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k", ts(1000))).toDF("id", "k", "t")
    val right = Seq(
      ("k", ts(1000), "at-left"),     // == t: excluded (lower exclusive)
      ("k", ts(1001), "just-after"),  // included
      ("k", ts(1060), "at-upper"),    // == t+60s: included (inclusive)
      ("k", ts(1061), "past-upper"),  // excluded
      ("k", ts(999), "before")        // excluded
    ).toDF("k", "rt", "name")
    val got = RangeJoin.timeBand(left, right, Seq("k"), "t", "rt",
        lowerExclusiveMicros = 0L, upperInclusiveMicros = 60L * 1000000L)
      .select("name").as[String].collect().toSet
    assert(got == Set("just-after", "at-upper"))
  }

  test("range join matches brute-force inequality join on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts(rnd.nextInt(5000).toLong))
    }
    val left = rows.toDF("id", "k", "t")
    val right = rows.map { case (i, k, t) => (i + 1000L, k, t) }
      .toDF("rid", "k", "rt")
    val lo = 0L
    val hi = 300L * 1000000L // 5 minutes

    val banded = RangeJoin.timeBand(left, right, Seq("k"), "t", "rt", lo, hi)
      .select($"id", $"rid").as[(Long, Long)].collect().toSet
    val brute = left.join(right, Seq("k"))
      .filter(unix_micros($"rt") > unix_micros($"t") + lo &&
        unix_micros($"rt") <= unix_micros($"t") + hi)
      .select($"id", $"rid").as[(Long, Long)].collect().toSet
    assert(banded == brute)
    assert(banded.nonEmpty)
    // no duplicate pairs: every right row lives in exactly one band
    val asList = RangeJoin.timeBand(left, right, Seq("k"), "t", "rt", lo, hi)
      .select($"id", $"rid").as[(Long, Long)].collect()
    assert(asList.length == asList.toSet.size)
  }

  test("range join handles pre-epoch (negative micros) floor division") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k", ts(-100))).toDF("id", "k", "t")
    val right = Seq(("k", ts(-70), "in"), ("k", ts(-101), "out"))
      .toDF("k", "rt", "name")
    val got = RangeJoin.timeBand(left, right, Seq("k"), "t", "rt",
        0L, 60L * 1000000L)
      .select("name").as[String].collect().toSet
    assert(got == Set("in"))
  }
}
