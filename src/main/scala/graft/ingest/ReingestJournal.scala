package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Cross-step journal for a multi-table re-ingest batch.
  *
  * Each table merge is individually crash-safe ([[TableSwap]]), but a
  * re-ingest swaps SIX artifacts in sequence (five entity tables + the ANN
  * indexes) — a crash between swaps leaves the tables mutually
  * inconsistent (documents updated, fragments not), and nothing at the
  * next startup knew a batch was half-applied. The journal closes that
  * gap: it records the batch's input files before the first swap and each
  * completed step after its swap, and is removed only when the whole
  * batch is through. A startup that finds a journal re-runs the recorded
  * batch (per-table merges are idempotent by document key, so re-applying
  * completed steps is safe and already-done steps can be skipped).
  *
  * Plain-text format, atomically replaced on every update:
  * `[files]` lines, then `[done]` lines.
  */
object ReingestJournal {

  final case class State(files: Seq[String], done: Seq[String])

  private def pathOf(tablesDir: String) =
    Paths.get(tablesDir, "_reingest_journal")

  def read(tablesDir: String): Option[State] = {
    val p = pathOf(tablesDir)
    if (!Files.exists(p)) return None
    val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
    val filesIdx = lines.indexOf("[files]")
    val doneIdx = lines.indexOf("[done]")
    if (filesIdx < 0 || doneIdx < filesIdx) return None // torn/foreign file
    Some(State(
      lines.slice(filesIdx + 1, doneIdx).filter(_.nonEmpty),
      lines.drop(doneIdx + 1).filter(_.nonEmpty)))
  }

  private def write(tablesDir: String, st: State): Unit = {
    val p = pathOf(tablesDir)
    Files.createDirectories(p.getParent)
    val tmp = Paths.get(p.toString + ".tmp")
    val body = ("[files]" +: st.files) ++ ("[done]" +: st.done)
    Files.write(tmp, body.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Declare a batch before its first swap. */
  def start(tablesDir: String, files: Seq[String]): Unit =
    write(tablesDir, State(files, Nil))

  /** Record a completed step (after its swap finished). */
  def markDone(tablesDir: String, step: String): Unit = {
    val st = read(tablesDir).getOrElse(State(Nil, Nil))
    if (!st.done.contains(step)) write(tablesDir, st.copy(done = st.done :+ step))
  }

  /** The batch is fully applied — forget it. */
  def clear(tablesDir: String): Unit = {
    Files.deleteIfExists(pathOf(tablesDir))
    ()
  }
}
