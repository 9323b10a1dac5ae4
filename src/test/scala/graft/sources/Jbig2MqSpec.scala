package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** MQ arithmetic coder layer in isolation: encode a deterministic
  * decision sequence, decode it back bit-for-bit. Separating this from
  * the template/segment layer pins the Annex E procedures themselves. */
class Jbig2MqSpec extends AnyFunSuite {

  private def roundTrip(bits: Array[Int], labels: Array[Int]): Unit = {
    val enc = new Jbig2.MqEncoder
    val cxE = new Jbig2.CxStore
    var i = 0
    while (i < bits.length) { enc.encode(cxE, labels(i), bits(i)); i += 1 }
    val data = enc.flush()
    val dec = new Jbig2.MqDecoder(data, 0, data.length)
    val cxD = new Jbig2.CxStore
    i = 0
    while (i < bits.length) {
      val got = dec.decode(cxD, labels(i))
      assert(got == bits(i), s"bit $i of ${bits.length}: got $got")
      i += 1
    }
  }

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)

  test("single-context uniform random bits") {
    for (n <- Seq(1, 2, 7, 64, 257, 1000)) {
      val bits = lcg(n).map(s => ((s >>> 33) & 1).toInt).take(n).toArray
      roundTrip(bits, Array.fill(n)(0))
    }
  }

  test("single-context skewed bits (deep MPS adaptation)") {
    for ((n, p) <- Seq((500, 20), (500, 3), (2000, 50))) {
      val bits = lcg(n * 31 + p).map(s =>
        if (((s >>> 33) % 100) < p) 1 else 0).take(n).toArray
      roundTrip(bits, Array.fill(n)(0))
    }
  }

  test("many contexts with independent adaptation") {
    val n = 3000
    val rng = lcg(42).drop(1).take(n).toArray
    val bits = rng.map(s => ((s >>> 33) & 1).toInt)
    val labels = rng.map(s => ((s >>> 17) & 0xFFFF).toInt)
    roundTrip(bits, labels)
  }

  test("degenerate: all zeros, all ones, alternating") {
    for (n <- Seq(1, 8, 100, 1024)) {
      roundTrip(Array.fill(n)(0), Array.fill(n)(0))
      roundTrip(Array.fill(n)(1), Array.fill(n)(0))
      roundTrip(Array.tabulate(n)(_ % 2), Array.fill(n)(0))
    }
  }
}
