package graft.core

import scala.collection.mutable

/** Word tokenizer for BM25: a term is a maximal run of the reference's
  * gram-char class (ASCII alphanumerics, fts-lmdb.go:1428-1430), case-folded
  * to lowercase. This is the word-boundary definition the reference's exact
  * verifier uses, promoted to a tokenizer for term-level indexing.
  */
object Tokenizer {

  /** Lowercased terms in document order (with duplicates — tf source). */
  def terms(text: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && !Gram.isGramChar(text.charAt(i))) i += 1
      val start = i
      while (i < n && Gram.isGramChar(text.charAt(i))) i += 1
      if (i > start) {
        val sb = new java.lang.StringBuilder(i - start)
        var j = start
        while (j < i) {
          val c = text.charAt(j)
          sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
          j += 1
        }
        out += sb.toString
      }
    }
    out.toArray
  }

  /** (term, tf) pairs, terms unique, deterministic order (sorted).
    * Sort + run-length instead of a HashMap: less allocation on the index
    * build's hot path.
    */
  def termFreqs(text: String): Array[(String, Int)] = {
    val ts = terms(text)
    if (ts.isEmpty) return Array.empty
    java.util.Arrays.sort(ts.asInstanceOf[Array[AnyRef]])
    val out = mutable.ArrayBuffer.empty[(String, Int)]
    var i = 0
    while (i < ts.length) {
      var j = i + 1
      while (j < ts.length && ts(j) == ts(i)) j += 1
      out += ((ts(i), j - i))
      i = j
    }
    out.toArray
  }

  /** Document length = total term count (BM25 `dl`). Pure run-count scan —
    * a term is a maximal gram-char run, so the count needs no string
    * allocation at all (the previous `terms(text).length` built every term
    * string just to count them; this is the index build's per-chunk stats
    * pass, so the allocation was pure overhead).
    */
  def docLength(text: String): Int = {
    val n = text.length
    var i = 0
    var count = 0
    while (i < n) {
      while (i < n && !Gram.isGramChar(text.charAt(i))) i += 1
      if (i < n) {
        count += 1
        while (i < n && Gram.isGramChar(text.charAt(i))) i += 1
      }
    }
    count
  }

  /** The reference's exact-match verifier (fts-lmdb.go:1299-1311):
    * case-insensitive substring scan with word-boundary checks on both ends
    * (skipped when `partial`). Returns the char offset of the first
    * whole-word occurrence, or -1.
    */
  /** ASCII-only case fold — length-preserving, matching the reference's
    * byte-level two-case scanner (fts-lmdb.go:1232-1240, 1168-1188). A
    * locale-aware toLowerCase could change string length (e.g. 'İ').
    */
  private def asciiLower(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    b.toString
  }

  def firstWordBoundaryMatch(chunk: String, arg: String, partial: Boolean): Int = {
    if (arg.isEmpty) return -1
    val lc = asciiLower(chunk)
    val la = asciiLower(arg)
    // `winStart` mirrors the reference's suffix slicing (hasArg
    // fts-lmdb.go:1299-1311): after a failed boundary match the scan resumes
    // on the suffix, so a match at the suffix START counts as word-start even
    // when the preceding char in the full string is a gram char — e.g.
    // "twotwo" whole-word-matches "two" at offset 3.
    var winStart = 0
    while (winStart <= lc.length - la.length) {
      val i = lc.indexOf(la, winStart)
      if (i < 0) return -1
      val startOk = i == winStart || !Gram.isGramChar(chunk.charAt(i - 1))
      val endOk = i + la.length == chunk.length || !Gram.isGramChar(chunk.charAt(i + la.length))
      if (partial || (startOk && endOk)) return i
      winStart = i + la.length
    }
    -1
  }

  /** AND across args — the reference's per-chunk verify loop
    * (fts-lmdb.go:1282-1291). Returns offset of the first match of any arg
    * encountered in arg order, or -1 when some arg is absent.
    */
  def verifyAll(chunk: String, args: Seq[String], partial: Boolean): Int = {
    var first = -1
    args.foreach { a =>
      val i = firstWordBoundaryMatch(chunk, a, partial)
      if (i == -1) return -1
      if (first == -1) first = i
    }
    first
  }
}
