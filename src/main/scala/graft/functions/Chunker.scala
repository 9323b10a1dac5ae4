package graft.functions

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Recursive character text splitter.
  *
  * Re-implements the published recursive-split-with-overlap algorithm the
  * reference uses via langchain (ingestion/chunking.py:12-62,
  * RecursiveCharacterTextSplitter semantics with keep_separator=true,
  * strip_whitespace=true): pick the first separator present in the text,
  * split keeping the separator attached to the following piece, recurse into
  * oversize pieces with the remaining separators, then greedily re-merge
  * adjacent pieces into chunks of at most `chunkSize` chars carrying
  * `chunkOverlap` chars of trailing context into the next chunk.
  *
  * Pure function — used inside per-document ingest folds and exploded into
  * fragment rows; chunk boundaries depend only on the input string, so the
  * operator is deterministic under any partitioning.
  */
final class Chunker(
    chunkSize: Int = 600,
    chunkOverlap: Int = 100,
    separators: Seq[String] = Seq("\n\n", "\n", " ", "")) {

  def chunk(text: String): Seq[String] =
    if (text == null || TextUtils.pyStrip(text).isEmpty) Nil
    else splitText(text, separators).filter(TextUtils.pyStrip(_).nonEmpty)

  private def splitText(text: String, seps: Seq[String]): Seq[String] = {
    val finalChunks = new ArrayBuffer[String]
    var separator = seps.last
    var newSeparators: Seq[String] = Nil
    val it = seps.iterator.zipWithIndex
    var done = false
    while (it.hasNext && !done) {
      val (s, i) = it.next()
      if (s.isEmpty) { separator = s; done = true }
      else if (text.contains(s)) {
        separator = s; newSeparators = seps.drop(i + 1); done = true
      }
    }

    val splits = splitKeepingSeparator(text, separator)
    val goodSplits = new ArrayBuffer[String]
    for (s <- splits) {
      // Python len() counts code points, not UTF-16 units
      if (Hashing.lengthCodePoints(s) < chunkSize) goodSplits += s
      else {
        if (goodSplits.nonEmpty) {
          finalChunks ++= mergeSplits(goodSplits.toSeq); goodSplits.clear()
        }
        if (newSeparators.isEmpty) finalChunks += s
        else finalChunks ++= splitText(s, newSeparators)
      }
    }
    if (goodSplits.nonEmpty) finalChunks ++= mergeSplits(goodSplits.toSeq)
    finalChunks.toSeq
  }

  /** Split on `sep`, attaching each separator occurrence as a prefix of the
    * following piece (keep_separator="start" semantics); empty pieces drop.
    */
  private def splitKeepingSeparator(text: String, sep: String): Seq[String] = {
    if (sep.isEmpty) {
      // per-character split = per CODE POINT (Python iterates code points;
      // mapping UTF-16 units would emit lone surrogate halves)
      val out = new ArrayBuffer[String](text.length)
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      return out.toSeq
    }
    val parts = Pattern.compile(sep, Pattern.LITERAL).split(text, -1)
    val out = new ArrayBuffer[String](parts.length)
    var i = 0
    for (p <- parts) {
      val piece = if (i == 0) p else sep + p
      if (piece.nonEmpty) out += piece
      i += 1
    }
    out.toSeq
  }

  /** Greedy window merge with overlap carry (separator is "" because the
    * separators stay attached to the pieces).
    */
  private def mergeSplits(splits: Seq[String]): Seq[String] = {
    val docs = new ArrayBuffer[String]
    // carry (piece, code-point length) so overlap eviction doesn't rescan
    var current = Vector.empty[(String, Int)]
    var total = 0
    for (d <- splits) {
      val len = Hashing.lengthCodePoints(d)
      if (total + len > chunkSize && current.nonEmpty) {
        // Python-parity strip (langchain strip_whitespace = str.strip())
        val joined = TextUtils.pyStrip(current.map(_._1).mkString)
        if (joined.nonEmpty) docs += joined
        while (total > chunkOverlap ||
          (total + len > chunkSize && total > 0)) {
          total -= current.head._2
          current = current.tail
        }
      }
      current :+= (d -> len)
      total += len
    }
    val joined = TextUtils.pyStrip(current.map(_._1).mkString)
    if (joined.nonEmpty) docs += joined
    docs.toSeq
  }
}
