package graft.ingest

import java.nio.file.{Files, Path, Paths}

/** Crash-safe stage-then-swap for table directories (used by `Cli
  * reingest`): write the merged table to `<path>.staging`, move live →
  * `.old`, staging → live, drop `.old`. The two moves are not atomic
  * together, so [[recoverSwap]] must run BEFORE reading a table — every
  * crash point leaves a state it rolls forward or back:
  *
  *  - live present + leftover `.staging`/`.old` → drop the leftovers
  *    (the prior swap either completed or never started);
  *  - live missing + `.staging` + `.old` → the staging write completed
  *    (move 1 runs only after it returns) → roll FORWARD: staging → live;
  *  - live missing + `.old` only → roll BACK: old → live.
  */
object TableSwap {

  private def rmTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
  }

  /** Recursive delete (no-op when absent) — shared with the partition-level
    * swaps in [[graft.search.IndexMaintenance]].
    */
  def rmTreeAt(path: String): Unit = rmTree(Paths.get(path))

  /** Roll a table out of any half-finished prior swap. Returns a human-
    * readable action description for logging, None when nothing to do.
    */
  def recoverSwap(path: String): Option[String] = {
    val (live, staging, old) =
      (Paths.get(path), Paths.get(s"$path.staging"), Paths.get(s"$path.old"))
    if (Files.exists(live)) {
      val dropped = Seq(
        if (Files.exists(staging)) { rmTree(staging); Some("stale .staging") }
        else None,
        if (Files.exists(old)) { rmTree(old); Some("leftover .old") }
        else None).flatten
      if (dropped.isEmpty) None else Some(s"dropped ${dropped.mkString(", ")}")
    } else if (Files.exists(staging) && Files.exists(old)) {
      Files.move(staging, live)
      rmTree(old)
      Some("completed interrupted swap (staging -> live)")
    } else if (Files.exists(old)) {
      Files.move(old, live)
      Some("restored from .old")
    } else None
  }

  /** Stage-then-swap: `writeStaging` produces the new table at the staging
    * path; then live → .old, staging → live, drop .old.
    */
  def swap(path: String)(writeStaging: String => Unit): Unit = {
    recoverSwap(path).foreach(a => System.err.println(s"[swap] $path: $a"))
    val staging = s"$path.staging"
    val old = s"$path.old"
    writeStaging(staging)
    Files.move(Paths.get(path), Paths.get(old))
    Files.move(Paths.get(staging), Paths.get(path))
    rmTree(Paths.get(old))
  }
}
