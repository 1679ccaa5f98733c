package graft.core

import scala.collection.mutable.ArrayBuffer

/** Org-mode element chunker — behavioral rebuild of the reference's
  * recursive-descent line classifier + element coalescer (reference:
  * forParts fulltext.go:105-113, orgPart 114-170, classify 172-201,
  * element types 41-54, regexes 82-92). Elements: a paragraph runs until a
  * blank-blank break or a non-paragraph line; blocks/drawers/dynblocks
  * swallow lines until their terminator; list items absorb blank lines and
  * deeper-indented paragraph continuations.
  *
  * Known reference quirks handled deliberately:
  *  - LATEXT_ENV can never fire (its regex requires a '\n' but classify
  *    sees single lines) — we keep that behavior;
  *  - the reference builds a block terminator "#+end__src" (doubled
  *    underscore, fulltext.go:188) which can never match a real
  *    "#+end_src" line, so blocks swallow to EOF; we use the correct
  *    "#+end_src" terminator and document the deviation;
  *  - the empty-digits alternative of the list-item regex makes ". foo" a
  *    list item — kept;
  *  - the reference's list-item alternative "[ \t]+\*" (fulltext.go:88) is
  *    dead code: classify applies listItemPat to the LEFT-TRIMMED line
  *    (fulltext.go:173,196), which can never start with whitespace, so
  *    indented "*" bullets classify as PARAGRAPH in the reference too — we
  *    match that behavior (covered by OrgChunkerSpec).
  */
object OrgChunker {

  // element types (fulltext.go:41-54)
  final val PARAGRAPH = 0
  final val HEADLINE = 1
  final val BLOCK = 2
  final val DYNBLOCK = 3
  final val KEYWORD = 4
  final val DRAWER = 5
  final val FOOTNOTE = 6
  final val LIST_ITEM = 7
  final val TABLE_LINE = 8
  final val HR = 9
  final val LATEXT_ENV = 10
  final val BLANK = 11

  val TypeNames: IndexedSeq[String] = IndexedSeq("PARAGRAPH", "HEADLINE",
    "BLOCK", "DYNBLOCK", "KEYWORD", "DRAWER", "FOOTNOTE", "LIST_ITEM",
    "TABLE_LINE", "HR", "LATEXT_ENV", "BLANK")

  // (?i) matches the reference (fulltext.go:87): '[FN:' is a footnote too
  private val footnotePat = "(?i)^\\[fn:[^\\]]".r
  private val drawerPat = "(?i)^:[a-z0-9_]+[ \\t]*:".r
  private val blockPat = "(?i)^#\\+begin(_[a-z0-9_]+)".r
  private val dynblockPat = "(?i)^#\\+begin:".r
  private val keywordPat = "^#\\+[a-zA-Z0-9_]+:".r
  private val listItemPat = "(?i)^([+-]|([0-9]*|[a-z])\\.)([ \\t]|$)".r
  private val tableLinePat = "^(\\||\\+-)".r

  private def trimLeftWs(s: String): String = {
    var i = 0
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    s.substring(i)
  }
  private def trimRightWs(s: String): String = {
    var i = s.length
    while (i > 0 && " \t\n".indexOf(s.charAt(i - 1)) >= 0) i -= 1
    s.substring(0, i)
  }

  /** Classify one line (no newline): (type, blockTerminator or ""). The
    * patterns apply to the left-trimmed line, mirroring the reference.
    */
  def classify(line: String): (Int, String) = {
    val trimmed = trimLeftWs(line)
    if (trimmed.isEmpty) (BLANK, "")
    else if (line.charAt(0) == '*') (HEADLINE, "")
    else if (trimmed.charAt(0) == '[' && footnotePat.findFirstIn(trimmed).isDefined)
      (FOOTNOTE, "")
    else if (trimmed.length > 4 && trimmed.startsWith("-----")) (HR, "")
    else if (trimmed.charAt(0) == ':' && drawerPat.findFirstIn(trimmed).isDefined)
      (DRAWER, ":end:")
    else if (trimmed.length > 2 && trimmed.startsWith("#+")) {
      blockPat.findFirstMatchIn(trimmed) match {
        case Some(m) => (BLOCK, "#+end" + m.group(1).toLowerCase)
        case None =>
          if (dynblockPat.findFirstIn(trimmed).isDefined) (DYNBLOCK, "#+end:")
          else if (keywordPat.findFirstIn(trimmed).isDefined) (KEYWORD, "")
          else (PARAGRAPH, "")
      }
    }
    else if (listItemPat.findFirstIn(trimmed).isDefined) (LIST_ITEM, "")
    else if (tableLinePat.findFirstIn(trimmed).isDefined) (TABLE_LINE, "")
    else (PARAGRAPH, "")
  }

  /** One parsed element: char offsets into the input; `end` excludes
    * trailing whitespace (fulltext.go:110). `line` is 1-based.
    */
  final case class Element(line: Int, typ: Int, start: Int, end: Int)

  /** Parse the whole text into elements (reference forParts/orgPart). */
  def elements(str: String): IndexedSeq[Element] = {
    val out = ArrayBuffer.empty[Element]
    var pos = 0
    var line = 1
    var prev = 0
    while (pos < str.length) {
      val (typ, start, end) = nextPart(pos, str)
      line += str.substring(prev, start).count(_ == '\n')
      val trimmedEnd = start + trimRightWs(str.substring(start, end)).length
      out += Element(line, typ, start, trimmedEnd)
      prev = start
      pos = end
    }
    out.toIndexedSeq
  }

  /** Find the next element at/after `pos`: (type, start, end). Paragraph
    * accumulation: consecutive PARAGRAPH lines group until a double newline
    * or a non-paragraph line; BLANK lines flush a pending paragraph.
    */
  private def nextPart(startPos: Int, str: String): (Int, Int, Int) = {
    var pos = startPos
    var para = startPos
    while (pos < str.length) {
      var lineEnd = str.indexOf('\n', pos)
      if (lineEnd < 0) lineEnd = str.length
      var len = lineEnd - pos // line length excluding '\n'
      val lineStr = str.substring(pos, lineEnd)
      val (typ, blockEnd) = classify(lineStr)

      if (typ == LIST_ITEM) {
        // absorb following blank lines and deeper-indented paragraph lines
        val offset = lineStr.length - trimLeftWs(lineStr).length
        var cont = lineEnd
        var go = true
        while (go && cont < str.length) {
          var nEnd = str.indexOf('\n', cont + 1)
          if (nEnd < 0) nEnd = str.length
          val nextLine = str.substring(math.min(cont + 1, str.length), nEnd)
          val (nTyp, _) = classify(nextLine)
          val absorb = nTyp == BLANK ||
            (nTyp == PARAGRAPH &&
              nextLine.length - trimLeftWs(nextLine).length > offset)
          if (absorb) cont = nEnd else go = false
        }
        len = cont - pos
      } else if (blockEnd.nonEmpty) {
        // swallow lines until the terminator line (trimmed, lowercased)
        var cont = lineEnd
        var found = false
        while (!found && cont < str.length) {
          var nEnd = str.indexOf('\n', cont + 1)
          if (nEnd < 0) nEnd = str.length
          val nextLine = str.substring(math.min(cont + 1, str.length), nEnd)
          cont = nEnd
          if (trimLeftWs(trimRightWs(nextLine)).toLowerCase == blockEnd) found = true
        }
        len = cont - pos
      }

      if (typ != PARAGRAPH) {
        if (para < pos) return (PARAGRAPH, para, pos)
        if (typ != BLANK) return (typ, pos, pos + len)
        para = pos + len + 1 // skip the blank; paragraph restarts after it
      } else if (pos - para > 1 && pos >= 2 && str.substring(pos - 2, pos) == "\n\n") {
        return (PARAGRAPH, para, pos)
      }
      pos = pos + len + 1
    }
    if (para < str.length) (PARAGRAPH, para, str.length)
    else (BLANK, str.length, str.length)
  }

  /** Org chunks with the reference chunk payload (indexOrg,
    * fts-lmdb.go:546-576): gram-less elements are skipped; offsets count
    * code points cumulatively over emitted elements.
    */
  def chunks(text: String): IndexedSeq[Chunk] = {
    val out = ArrayBuffer.empty[Chunk]
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    var runeOff = 0L
    var byteOff = 0L // utf-8 bytes of text[0, prev)
    var prev = 0
    elements(text).foreach { e =>
      val body = text.substring(e.start, e.end)
      if (Gram.grams(body).nonEmpty) {
        runeOff += text.codePointCount(prev, e.start)
        byteOff += text.substring(prev, e.start).getBytes(utf8).length
        val runeLen = text.codePointCount(e.start, e.end)
        val byteLen = body.getBytes(utf8).length
        out += Chunk(e.line, runeOff, runeLen.toLong, byteOff, byteLen.toLong, body)
        runeOff += runeLen
        byteOff += byteLen
        prev = e.end
      }
    }
    out.toIndexedSeq
  }
}
