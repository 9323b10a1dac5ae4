package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.domain.Model.RawSegment
import graft.embedding.{Batching, OfflineEmbedder}
import graft.functions.{Chunker, Hashing, TextUtils}
import graft.ingest.{ConceptBuilder, Unitizer}

/** Property-based invariants (SURVEY.md §5 rebuild strategy): determinism,
  * chunk-size bounds, hierarchy rules, batching limits. Uses seeded
  * ScalaCheck generators directly (fixed seeds → reproducible failures).
  */
class PropertySpec extends AnyFunSuite {

  private val Cases = 100

  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    var executed = 0
    (0 until Cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { a =>
        executed += 1; f(a)
      }
    }
    // guard against vacuous passes if a generator starts failing
    assert(executed > Cases / 2, s"only $executed/$Cases cases generated")
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    var executed = 0
    (0 until Cases).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } { executed += 1; f(a, b) }
    }
    assert(executed > Cases / 2, s"only $executed/$Cases cases generated")
  }

  private val textGen: Gen[String] = Gen.chooseNum(0, 400).flatMap { n =>
    Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\n', '.', ',', ';')))
      .map(_.mkString)
  }

  test("hashing is deterministic and shape-stable") {
    forAll(textGen, textGen) { (a, b) =>
      assert(Hashing.md5Hex(a) == Hashing.md5Hex(a))
      assert(Hashing.md5Hex(a).length == 32)
      assert(Hashing.conceptId(a, b).length == 16)
      assert(Hashing.docId(a, "text", None, b).startsWith("doc:"))
    }
  }

  test("chunker: bounded chunks, deterministic, word coverage") {
    val chunker = new Chunker(chunkSize = 120, chunkOverlap = 30)
    forAll(textGen) { t =>
      val chunks = chunker.chunk(t)
      assert(chunks == chunker.chunk(t))
      // every chunk within size bound unless a single unbreakable run
      chunks.foreach(c => assert(c.length <= 120 || !c.exists(_.isWhitespace)))
      // no chunk is blank
      chunks.foreach(c => assert(c.trim.nonEmpty))
    }
  }

  test("code-point parity: budgets and slices count like Python len/[:n]") {
    // Python len()/[:n] count code points; a single emoji is 1 there but 2
    // UTF-16 units. These pins guard the reference-parity boundaries
    // (unitizer buffer, chunk sizes, parent context truncation).
    val emoji = "😀" // 😀, U+1F600
    assert(Hashing.lengthCodePoints(emoji * 5) == 5)
    assert(Hashing.takeCodePoints(emoji * 5, 3) == emoji * 3)
    // never split a surrogate pair
    assert(Hashing.takeCodePoints("a" + emoji, 2) == "a" + emoji)

    // ParentSynthesis truncation: ≤ limit code points, no lone surrogate
    import graft.domain.Model.FragmentRow
    import graft.ingest.ParentSynthesis
    val frag = FragmentRow("f1", "c1", "d1", emoji * 50, "text", None, 0,
      "text_unit", None)
    val content = ParentSynthesis.synthesizeContent(Seq(frag), contextLimit = 21)
    assert(Hashing.lengthCodePoints(content) == 21)
    assert(!Character.isHighSurrogate(content.last))

    // Chunker: emoji-dense text chunks bound by CODE POINTS and never
    // start/end mid-pair (the "" separator fallback splits per code point)
    val chunker = new Chunker(chunkSize = 40, chunkOverlap = 10)
    val dense = (emoji * 30 + " ") * 8 // unbreakable 30-cp runs
    chunker.chunk(dense).foreach { c =>
      assert(Hashing.lengthCodePoints(c) <= 40)
      assert(!Character.isHighSurrogate(c.last) &&
        !Character.isLowSurrogate(c.head))
    }

    // Unitizer buffers by code points: two 400-emoji segments fit a
    // 700-cp budget one at a time (UTF-16 counting would see 800 units
    // and flush the first segment alone, splitting the unit)
    val u = new Unitizer(maxPreTextChars = 700, textUnitThreshold = 500)
    def seg(order: Int) = RawSegment("d1", "text", emoji * 400, None, order, None)
    val out = u.unitize(IndexedSeq(seg(0), seg(1)))
    val unitIds = out.map(_.unitId).distinct
    assert(out.length == 2 && unitIds.length == 1 && unitIds.head.isDefined,
      s"both segments must land in ONE text unit: $out")
  }

  test("unitizer: role=other ⇔ no unit id; order preserved; deterministic") {
    val segGen: Gen[RawSegment] = for {
      kind <- Gen.frequency(5 -> Gen.const("text"), 3 -> Gen.const("code"),
        1 -> Gen.const("image"))
      lang <- if (kind == "code") Gen.oneOf(Some("python"), Some("javascript"), None)
        else Gen.const(None)
      content <- Gen.chooseNum(1, 300).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    } yield RawSegment("d", kind, content, lang, 0, None)

    forAll(Gen.listOf(segGen)) { segs0 =>
      val segs = segs0.zipWithIndex
        .map { case (s, i) => s.copy(order = i) }.toIndexedSeq
      val out = new Unitizer().unitize(segs)
      assert(out == new Unitizer().unitize(segs))
      // same multiset of orders — nothing lost or duplicated
      assert(out.map(_.order).sorted == segs.map(_.order).sorted)
      // role=other ⇔ unitId empty
      out.foreach(u => assert(u.unitId.isEmpty == (u.role == "other")))
      // python segments always carry a unit id
      out.filter(u => u.kind == "code" && u.language.contains("python"))
        .foreach(u => assert(u.unitId.nonEmpty))
    }
  }

  test("concept builder: no orphan fragments, ids well-formed (HIER-002/003)") {
    val segGen: Gen[RawSegment] = for {
      kind <- Gen.oneOf("text", "code", "image")
      lang <- if (kind == "code") Gen.oneOf(Some("python"), None) else Gen.const(None)
      content <- Gen.chooseNum(1, 120).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    } yield RawSegment("d", kind, content, lang, 0, None)

    forAll(Gen.listOf(segGen)) { segs0 =>
      val segs = segs0.zipWithIndex
        .map { case (s, i) => s.copy(order = i) }.toIndexedSeq
      val docId = Hashing.documentId("gen/doc.txt")
      val built = ConceptBuilder.build(docId, new Unitizer().unitize(segs))
      val conceptIds = built.concepts.map(_.id).toSet
      assert(built.fragments.forall(f => conceptIds.contains(f.concept_id)))
      assert(built.concepts.map(_.order) == built.concepts.indices.toSeq)
      built.concepts.foreach(c => assert(c.document_id == docId))
    }
  }

  test("offline embedder: unit vectors, deterministic, text-sensitive") {
    val e = new OfflineEmbedder(48)
    forAll(textGen, textGen) { (a, b) =>
      val va = e.embedQuery(a)
      assert(va.length == 48)
      assert(va.sameElements(e.embedQuery(a)))
      val norm = math.sqrt(va.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3)
      if (a != b) assert(!e.embedQuery(b).sameElements(va))
    }
  }

  test("char-budget batching counts code points, not UTF-16 units") {
    // "🦄" is one Python character but two UTF-16 units; a budget of 4
    // must fit four of them per batch (unit counting would fit only two)
    val texts = Seq.fill(8)("🦄")
    val batches = Batching.byCharBudget(texts.iterator, 4, 16)(identity).toList
    assert(batches.map(_.size) == Seq(4, 4))
  }

  test("char-budget batching: respects budget and item caps, loses nothing") {
    forAll(Gen.listOf(Gen.chooseNum(0, 500)
      .flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString)))) {
      texts =>
        val batches = Batching.byCharBudget(texts.iterator, 1000, 16)(identity).toList
        assert(batches.flatten == texts)
        batches.foreach { b =>
          assert(b.length <= 16)
          // budget respected unless a single oversize item
          assert(b.map(_.length).sum <= 1000 || b.length == 1)
        }
    }
  }

  test("normalize and slugify are idempotent-ish and total") {
    forAll(textGen) { t =>
      val n1 = TextUtils.normalize(t)
      // normalize is not strictly idempotent (page-number regex can chain)
      // but must be total and trim-stable
      assert(n1 == n1.trim)
      val s1 = TextUtils.slugify(t)
      assert(TextUtils.slugify(s1) == s1)
      assert(!s1.exists(_.isUpper))
    }
  }

  test("ivf quantizer: deterministic, bounded, and assignment-consistent") {
    import graft.search.Ivf
    val genSample: Gen[Array[Array[Float]]] = for {
      n <- Gen.choose(1, 60)
      dim <- Gen.choose(2, 16)
      flat <- Gen.listOfN(n * dim, Gen.choose(-100, 100).map(_ / 7.0f))
    } yield flat.toArray.grouped(dim).toArray
    forAll(genSample, Gen.choose(1, 12)) { (sample, k) =>
      val q1 = Ivf.train(sample, k, iters = 4)
      val q2 = Ivf.train(sample, k, iters = 4)
      // deterministic: no RNG anywhere in training
      assert(q1.centroidsFlat.sameElements(q2.centroidsFlat))
      // never more centroids than sample points, never zero
      assert(q1.k >= 1 && q1.k <= math.min(k, sample.length))
      assert(q1.centroidsFlat.length == q1.k * q1.dim)
      // driver-side nearestLists is a permutation prefix of [0, k)
      val lists = Ivf.nearestLists(sample(0), q1, nprobe = q1.k)
      assert(lists.sorted == (0 until q1.k))
      // probing more lists never probes fewer
      assert(Ivf.nearestLists(sample(0), q1, 1).size <= lists.size)
    }
  }

  test("funnel fold: batch-split invariance + naive-oracle agreement") {
    import graft.streaming.EventStreams.funnelFold
    val stages = Seq("view", "click", "purchase")
    val windowUs = 100L
    // small time domain forces ties; random types include non-stage noise
    val evGen: Gen[List[(Long, String)]] = Gen.chooseNum(0, 40).flatMap { n =>
      Gen.listOfN(n, for {
        t <- Gen.chooseNum(0L, 300L)
        tpe <- Gen.oneOf("view", "click", "purchase", "error", "signup")
      } yield (t, tpe))
    }.map(_.sortBy(_._1))

    // independent naive semantics (the batch CTE chain, computed directly):
    // t1 = min view; t2 = min click in (t1, t1+w]; t3 = min purchase in
    // (t2, t1+w]
    def naive(ev: List[(Long, String)]): List[Long] = {
      def minOf(tpe: String, p: Long => Boolean): Option[Long] =
        ev.collect { case (t, `tpe`) if p(t) => t }.minOption
      val t1 = minOf("view", _ => true)
      val t2 = t1.flatMap(a => minOf("click", t => t > a && t <= a + windowUs))
      val t3 = for {
        a <- t1; b <- t2
        c <- minOf("purchase", t => t > b && t <= a + windowUs)
      } yield c
      List(t1, t2, t3).flatten
    }

    forAll(evGen, Gen.chooseNum(1, 5)) { (ev, nSplits) =>
      // one-shot fold == naive reference
      val (oneShot, advances) = funnelFold(Nil, ev, stages, windowUs)
      assert(oneShot == naive(ev), s"fold vs naive on $ev")
      // advances replay the state transitions exactly
      assert(advances.map(_._2).toList == oneShot)
      assert(advances.map(_._1).toList == (1 to oneShot.length).toList)
      // arbitrary event-time-ordered batch splits reach the same state
      // with the same total advances (the streaming replay property)
      val slice = math.max(1, (ev.length + nSplits - 1) / nSplits)
      val (split, splitAdv) = ev.grouped(slice)
        .foldLeft((List.empty[Long], Seq.empty[(Int, Long)])) {
          case ((st, acc), batch) =>
            val (st2, adv) = funnelFold(st, batch, stages, windowUs)
            (st2, acc ++ adv)
        }
      assert(split == oneShot && splitAdv == advances,
        s"batch-split divergence on $ev with $nSplits splits")
    }
  }
}
