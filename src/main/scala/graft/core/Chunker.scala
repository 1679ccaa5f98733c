package graft.core

import scala.collection.mutable.ArrayBuffer

/** A chunk of a document: one line (line mode) or one org element (org mode).
  *
  * Offsets follow the reference chunk payload (reference: fts-lmdb.go:586-592):
  * `line` is 1-based; `runeOff`/`runeLen` count Unicode code points;
  * `byteStart`/`byteLen` count UTF-8 bytes. `text` retains any trailing
  * newline in line mode (grams input includes it; display trims it).
  */
final case class Chunk(line: Int, runeOff: Long, runeLen: Long,
                       byteStart: Long, byteLen: Long, text: String)

object Chunker {

  @inline private def codePoints(s: String): Int = s.codePointCount(0, s.length)
  @inline private def utf8Len(s: String): Int =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length

  /** Line chunker, matching the reference's `indexLines`
    * (fts-lmdb.go:578-603 + readLine 605-610): one chunk per line INCLUDING
    * its trailing '\n'; a final fragment with no trailing newline is dropped
    * (readLine returns EOF for it); blank lines still produce (0-gram)
    * chunks. Every produced chunk's text concatenated == the input prefix up
    * to the last newline, byte-identically.
    */
  def lines(text: String): IndexedSeq[Chunk] = {
    val out = ArrayBuffer.empty[Chunk]
    var pos = 0 // byte offset
    var runeOff = 0L
    var lineNo = 1
    var i = 0
    val n = text.length
    var lineStart = 0
    while (i < n) {
      if (text.charAt(i) == '\n') {
        val line = text.substring(lineStart, i + 1)
        val rl = codePoints(line)
        val bl = utf8Len(line)
        out += Chunk(lineNo, runeOff, rl.toLong, pos.toLong, bl.toLong, line)
        runeOff += rl
        pos += bl
        lineNo += 1
        lineStart = i + 1
      }
      i += 1
    }
    // trailing fragment without '\n' is intentionally dropped (reference quirk)
    out.toIndexedSeq
  }

  /** Line chunker for engine use: like [[lines]] but also keeps a final
    * unterminated line, so no input text is ever silently unindexed. The
    * strict reference behavior stays available via [[lines]] for parity
    * tests.
    */
  def linesLenient(text: String): IndexedSeq[Chunk] = {
    val strict = lines(text)
    val consumed = strict.map(_.text.length).sum
    if (consumed >= text.length) strict
    else {
      val tail = text.substring(consumed)
      val runeOff = strict.lastOption.map(c => c.runeOff + c.runeLen).getOrElse(0L)
      val byteStart = strict.lastOption.map(c => c.byteStart + c.byteLen).getOrElse(0L)
      strict :+ Chunk(strict.length + 1, runeOff, codePoints(tail).toLong,
        byteStart, utf8Len(tail).toLong, tail)
    }
  }
}
