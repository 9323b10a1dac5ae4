package graft

/** Cross-round per-query VOLUME gate (VERDICT r13 task 6). The bench
  * artifact has carried shuffle/scan volume witnesses since r13
  * ([[org.apache.spark.sql.graft.VolumeWitness]]); comparing them across
  * rounds was a manual `tools/volume_diff.py` invocation. This wires the
  * comparison into the bench itself: every run loads the committed
  * previous-round artifact (`SPARK_GRAFT_PREV_BENCH`, default
  * [[PrevArtifact]]), joins the shared query names, and LEDGER-FLAGS any
  * query whose volumes grew past the envelope — ×1.5 shuffle bytes /
  * ×1.25 rows scanned, the [[VolumeEnvelopeSpec]] headroom — directly in
  * the record (`volume_gate` field) and on stderr. Volumes are plan+data
  * facts: a flagged query is a plan regression (or an intended change
  * that must re-pin), never host noise, so the flag list is the entire
  * round-over-round adjudication.
  *
  * The gate flags rather than fails: the bench's job is to RECORD; the
  * committed spec gate at sf0.001 (VolumeEnvelopeSpec) is what fails
  * `sbt test` on a regression before any bench runs.
  *
  * Comparing stats of different provenance is sound for the GROWTH
  * direction: r13 recorded min over all passes (cold pass included),
  * r14+ records the warm-pass min — warm ≤ cold, so a warm number
  * exceeding the old (possibly cold) envelope is a fortiori a growth.
  */
object VolumeGate {

  /** Previous round's committed FULL bench record (the driver's
    * `BENCH_r{N}.json` is a truncated wrapper; the full record with the
    * volume witnesses is `bench_out.json` at the round's HEAD commit,
    * snapshotted to this stable name at round start — update each
    * round: `git show <prev-round-head>:bench_out.json >
    * BENCH_r{N}_full.json`. The r14 round committed no quiet full
    * record, so BENCH_r14_full.json was snapshotted from a quiet-host
    * run at r15 start — volumes are plan facts, unaffected by the
    * r14 record's host contamination.) */
  val PrevArtifact = "BENCH_r14_full.json"

  val ShuffleX = 1.5
  val RowsX = 1.25
  /** Absolute slacks mirroring VolumeEnvelopeSpec (tiny pins would
    * otherwise flag on byte-level jitter). */
  val ShuffleSlack: Long = 64L * 1024
  val RowsSlack: Long = 1000L

  final case class Flagged(name: String, prevSh: Long, curSh: Long,
      prevRows: Long, curRows: Long, reasons: Seq[String])

  private val EntryRe =
    """"([^"]+)":\{"sh":(-?\d+),"rows":(-?\d+),"in":(-?\d+)\}""".r

  /** Extract the compute-pass per-query volume map from a bench record's
    * JSON text (the exact shape [[Bench]] emits). Hand-rolled on purpose:
    * the format is ours, and the readthrough block's own `volumes` field
    * is excluded by slicing the top-level `"volumes":{...}` object that
    * follows the readthrough section (the top-level field is emitted
    * after `rtJson`, so it is the LAST `"volumes":` in the line). */
  def parseVolumes(json: String): Map[String, (Long, Long, Long)] = {
    val key = "\"volumes\":{"
    val at = json.lastIndexOf(key)
    if (at < 0) return Map.empty
    var i = at + key.length
    var depth = 1
    while (i < json.length && depth > 0) {
      json.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1
        case _ =>
      }
      i += 1
    }
    EntryRe.findAllMatchIn(json.substring(at, i)).map { m =>
      m.group(1) -> ((m.group(2).toLong, m.group(3).toLong,
        m.group(4).toLong))
    }.toMap
  }

  /** Queries present in BOTH records whose current volumes exceed the
    * growth envelope over the previous record's. */
  def flag(prev: Map[String, (Long, Long, Long)],
      cur: Map[String, (Long, Long, Long)]): Seq[Flagged] =
    cur.toSeq.sortBy(_._1).flatMap { case (name, (sh, rows, _)) =>
      prev.get(name).flatMap { case (pSh, pRows, _) =>
        val shMax = (pSh * ShuffleX).toLong max (pSh + ShuffleSlack)
        val rowsMax = (pRows * RowsX).toLong max (pRows + RowsSlack)
        val reasons =
          (if (sh > shMax) Seq(s"shuffle $sh > envelope $shMax") else Nil) ++
          (if (rows > rowsMax) Seq(s"rows $rows > envelope $rowsMax")
           else Nil)
        if (reasons.isEmpty) None
        else Some(Flagged(name, pSh, sh, pRows, rows, reasons))
      }
    }

  private val SfRe = """"sf":"([^"]*)"""".r

  /** Run the gate against the previous-round artifact; returns the JSON
    * fragment for the bench record (a skipped marker when no previous
    * artifact is readable or it was measured at a DIFFERENT scale
    * factor — volumes are data facts, so cross-sf growth is expected,
    * not a regression) and prints the ledger table to stderr. */
  def gateJson(cur: Map[String, (Long, Long, Long)],
      sfDir: String): String = {
    val path = sys.env.getOrElse("SPARK_GRAFT_PREV_BENCH", PrevArtifact)
    val prevText =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: java.io.IOException => None }
    val sfOk = prevText.forall { t =>
      SfRe.findFirstMatchIn(t).forall(m =>
        new java.io.File(m.group(1)).getName ==
          new java.io.File(sfDir).getName)
    }
    prevText.filter(_ => sfOk).map(parseVolumes).filter(_.nonEmpty) match {
      case None =>
        System.err.println(if (sfOk)
          s"[volume-gate] no previous volumes at $path — gate skipped"
        else s"[volume-gate] $path was measured at a different sf than " +
          s"$sfDir — gate skipped")
        s""","volume_gate":{"prev":"$path","skipped":true}"""
      case Some(prev) =>
        val flags = flag(prev, cur)
        val shared = cur.keySet.intersect(prev.keySet).size
        if (flags.isEmpty)
          System.err.println(s"[volume-gate] $shared shared queries vs " +
            s"$path: all inside the growth envelope")
        else flags.foreach { f =>
          System.err.println(f"[volume-gate] FLAG ${f.name}: " +
            f"sh ${f.prevSh}→${f.curSh}, rows ${f.prevRows}→${f.curRows} " +
            f"(${f.reasons.mkString("; ")})")
        }
        val fj = flags.map { f =>
          s""""${f.name}":{"sh_prev":${f.prevSh},"sh":${f.curSh},""" +
            s""""rows_prev":${f.prevRows},"rows":${f.curRows}}"""
        }.mkString("{", ",", "}")
        s""","volume_gate":{"prev":"$path","shared":$shared,""" +
          s""""flagged":$fj}"""
    }
  }
}
