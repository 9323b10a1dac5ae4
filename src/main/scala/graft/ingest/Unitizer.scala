package graft.ingest

import scala.collection.mutable.ArrayBuffer

import graft.domain.Model.{RawSegment, UnitizedSegment}
import graft.functions.Hashing

/** G1 — the semantic-unit state machine (ingestion/segmentation.py:40-146).
  *
  * Single-pass fold over ONE document's order-sorted segments: buffer text
  * (≤ maxPreTextChars); on Python code attach the buffered pre_text +
  * consecutive python segments to one unit; optionally bridge text then
  * absorb following javascript; flush text-only units when the buffer holds
  * ≥ textUnitThreshold chars; everything else gets role=other, unitId=None.
  *
  * Unit boundaries never cross documents, so the Spark pipeline runs this
  * per document inside the parse task (no shuffle) — embarrassingly
  * parallel at any scale.
  */
final class Unitizer(
    attachPreText: Boolean = true,
    attachPostText: Boolean = false,
    bridgeTextMax: Int = 0,
    maxPreTextChars: Int = 4000,
    textUnitThreshold: Int = 500) {

  /** Deterministic unit id from the code head + last-2 pre-text heads
    * (segmentation.py:148-168).
    */
  private def codeUnitId(code: RawSegment, preText: Seq[RawSegment]): String = {
    val pre = preText.takeRight(2)
      .map(s => Hashing.takeCodePoints(s.content, 100)).mkString
    Hashing.md5Hex(pre + "|" + Hashing.takeCodePoints(code.content, 500)).take(16)
  }

  /** "txt-" + md5 of the first-5 segment heads (segmentation.py:170-182). */
  private def textUnitId(segs: Seq[RawSegment]): String =
    "txt-" + Hashing.md5Hex(
      segs.take(5).map(s => Hashing.takeCodePoints(s.content, 200)).mkString).take(12)

  def unitize(segments: IndexedSeq[RawSegment]): Seq[UnitizedSegment] = {
    val output = new ArrayBuffer[UnitizedSegment]
    var textBuffer = Vector.empty[RawSegment]
    var textBufferChars = 0
    val total = segments.length
    var i = 0

    def emit(unitId: Option[String], role: String, s: RawSegment): Unit =
      output += UnitizedSegment(s.documentId, unitId, role, s.kind, s.content,
        s.language, s.order, s.page)

    def drainBufferAsOther(): Unit = {
      textBuffer.foreach(emit(None, "other", _))
      textBuffer = Vector.empty
      textBufferChars = 0
    }

    while (i < total) {
      val segment = segments(i)
      if (segment.kind == "text") {
        textBuffer :+= segment
        // code-point counts: the reference buffers by Python len()
        textBufferChars += Hashing.lengthCodePoints(segment.content)
        // overflow: flush as one text-only unit when big enough, else shed
        // the oldest buffered segment as an orphan (segmentation.py:61-72)
        var continueFlush = true
        while (textBufferChars > maxPreTextChars && textBuffer.nonEmpty && continueFlush) {
          if (textBufferChars >= textUnitThreshold) {
            val id = textUnitId(textBuffer)
            textBuffer.foreach(emit(Some(id), "text_unit", _))
            textBuffer = Vector.empty
            textBufferChars = 0
            continueFlush = false
          } else {
            val old = textBuffer.head
            textBuffer = textBuffer.tail
            textBufferChars -= Hashing.lengthCodePoints(old.content)
            emit(None, "other", old)
          }
        }
        i += 1
      } else if (segment.kind == "code" && segment.language.contains("python")) {
        val unitId = codeUnitId(segment, if (attachPreText) textBuffer else Nil)
        if (attachPreText && textBuffer.nonEmpty) {
          textBuffer.foreach(emit(Some(unitId), "pre_text", _))
          textBuffer = Vector.empty
          textBufferChars = 0
        } else drainBufferAsOther()

        while (i < total && segments(i).kind == "code" &&
          segments(i).language.contains("python")) {
          emit(Some(unitId), "python", segments(i)); i += 1
        }

        var bridged = 0
        while (bridged < bridgeTextMax && i < total && segments(i).kind == "text") {
          emit(Some(unitId), "bridge_text", segments(i)); i += 1; bridged += 1
        }

        if (i < total && segments(i).kind == "code" &&
          segments(i).language.contains("javascript")) {
          while (i < total && segments(i).kind == "code" &&
            segments(i).language.contains("javascript")) {
            emit(Some(unitId), "javascript", segments(i)); i += 1
          }
          if (attachPostText) {
            var stop = false
            while (!stop && i < total && segments(i).kind == "text") {
              if (i + 1 < total && segments(i + 1).kind == "code" &&
                segments(i + 1).language.contains("python")) {
                textBuffer :+= segments(i)
                textBufferChars += Hashing.lengthCodePoints(segments(i).content)
                i += 1
                stop = true
              } else { emit(Some(unitId), "post_text", segments(i)); i += 1 }
            }
          }
        }
      } else if (segment.kind == "code" && segment.language.contains("javascript")) {
        // JS without a preceding python unit is not a unit on its own
        drainBufferAsOther()
        emit(None, "other", segment)
        i += 1
      } else {
        drainBufferAsOther()
        emit(None, "other", segment)
        i += 1
      }
    }

    if (textBuffer.nonEmpty) {
      if (textBufferChars >= textUnitThreshold) {
        val id = textUnitId(textBuffer)
        textBuffer.foreach(emit(Some(id), "text_unit", _))
      } else textBuffer.foreach(emit(None, "other", _))
    }
    output.toSeq
  }
}
