package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Throughput probe (not a regression gate): codec cost per image at the
  * p16 fixture shape. Env-gated like ScaleSoakSpec so plain `sbt test`
  * does not pay for it: `GRAFT_PROBE=1 sbt "testOnly *JpxPerfProbe"`. */
class JpxPerfProbe extends AnyFunSuite {
  test("encode+decode throughput") {
    assume(sys.env.get("GRAFT_PROBE").contains("1"),
      "set GRAFT_PROBE=1 to run the throughput probe")
    val img = Array.tabulate(24, 24)((y, x) => (x * 7 + y * 11) % 256)
    // warmup
    (0 until 50).foreach(_ => Jpx.decode(Jpx.encode(img)))
    val t0 = System.nanoTime()
    (0 until 200).foreach(_ => Jpx.decode(Jpx.encode(img)))
    val ms = (System.nanoTime() - t0) / 1e6
    info(f"200 enc+dec of 24x24: $ms%.0f ms (${ms * 5}%.0f ms/1000)")
    val rgb = Array.fill(3)(img)
    val t1 = System.nanoTime()
    (0 until 100).foreach(_ =>
      Jpx.decode(Jpx.encodeMulti(rgb.toSeq, 2, rct = true)))
    val ms2 = (System.nanoTime() - t1) / 1e6
    info(f"100 RGB enc+dec of 24x24: $ms2%.0f ms")
  }
}
