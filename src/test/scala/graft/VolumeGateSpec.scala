package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-round volume gate's pure logic (VERDICT r13 task 6), plus
  * the contract with the real committed artifact: the parser must read
  * the previous round's record, and the previous record must pass the
  * gate against itself (self-comparison flags nothing — the envelope is
  * growth-only).
  */
class VolumeGateSpec extends AnyFunSuite {

  test("parses the committed previous-round artifact's compute volumes") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(VolumeGate.PrevArtifact)),
      java.nio.charset.StandardCharsets.UTF_8)
    val vols = VolumeGate.parseVolumes(text)
    assert(vols.size >= 150, s"expected the full r13 catalog, got ${vols.size}")
    assert(vols.contains("q1_agg") && vols.contains("x23_perplexity_buckets"))
    // self-comparison: a record is always inside its own growth envelope
    assert(VolumeGate.flag(vols, vols).isEmpty)
  }

  test("parseVolumes takes the LAST volumes object (the compute pass), " +
      "not the readthrough block's") {
    val json = """{"metric":"total","readthrough":{"queries":{},
      |"volumes":{"q":{"sh":999,"rows":999,"in":999}}},
      |"volumes":{"q":{"sh":1,"rows":2,"in":3}},"volumes_stat":"min_warm"}"""
      .stripMargin.replace("\n", "")
    assert(VolumeGate.parseVolumes(json) == Map("q" -> ((1L, 2L, 3L))))
  }

  test("flags growth past the envelope; ignores new/removed queries and " +
      "volume drops") {
    val prev = Map(
      "stable" -> ((1000000L, 10000L, 1L)),
      "grew_sh" -> ((1000000L, 10000L, 1L)),
      "grew_rows" -> ((1000000L, 10000L, 1L)),
      "tiny" -> ((10L, 5L, 1L)),
      "removed" -> ((1L, 1L, 1L)))
    val cur = Map(
      "stable" -> ((1400000L, 12000L, 1L)),      // inside ×1.5 / ×1.25
      "grew_sh" -> ((1600001L, 10000L, 1L)),     // > ×1.5 + slack
      "grew_rows" -> ((1000000L, 12501L, 1L)),   // > ×1.25 + slack
      "tiny" -> ((60000L, 900L, 1L)),            // inside absolute slacks
      "shrunk" -> ((1L, 1L, 1L)),                // improvement, not a flag
      "brand_new" -> ((99999999L, 99999999L, 1L))) // no baseline: skip
    val flags = VolumeGate.flag(prev, cur)
    assert(flags.map(_.name) == Seq("grew_rows", "grew_sh"))
    val sh = flags.find(_.name == "grew_sh").get
    assert(sh.reasons.exists(_.startsWith("shuffle")))
    val rw = flags.find(_.name == "grew_rows").get
    assert(rw.reasons.exists(_.startsWith("rows")))
  }
}
