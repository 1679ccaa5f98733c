package graft.core

import org.scalatest.funsuite.AnyFunSuite
import OrgChunker._

class OrgChunkerSpec extends AnyFunSuite {

  private def types(s: String): Seq[(String, String)] =
    elements(s).map(e => (TypeNames(e.typ), s.substring(e.start, e.end)))

  test("classify covers every element class (fulltext.go:172-201)") {
    assert(classify("* headline")._1 == HEADLINE)
    assert(classify("** deep headline")._1 == HEADLINE)
    assert(classify("  ")._1 == BLANK)
    assert(classify("[fn:1] a footnote")._1 == FOOTNOTE)
    assert(classify("[FN:1] case-insensitive footnote")._1 == FOOTNOTE) // (?i) fulltext.go:87
    assert(classify("------")._1 == HR)
    assert(classify("  :drawer: x")._1 == DRAWER)
    assert(classify("#+begin_src scala") == (BLOCK, "#+end_src"))
    assert(classify("#+begin: dyn") == (DYNBLOCK, "#+end:"))
    assert(classify("#+title: hello")._1 == KEYWORD)
    assert(classify("#+?") == (PARAGRAPH, ""))
    assert(classify("- item")._1 == LIST_ITEM)
    assert(classify("+ item")._1 == LIST_ITEM)
    assert(classify("3. item")._1 == LIST_ITEM)
    assert(classify("b. item")._1 == LIST_ITEM)
    assert(classify(". quirk item")._1 == LIST_ITEM) // empty-digits quirk
    assert(classify("| a | b |")._1 == TABLE_LINE)
    assert(classify("+--+--+")._1 == TABLE_LINE)
    assert(classify("plain text")._1 == PARAGRAPH)
    // indented '*' is NOT a headline (headline checks untrimmed col 0)
    assert(classify("  * not headline")._1 == PARAGRAPH)
  }

  test("paragraphs split on double newline, flush before non-paragraph") {
    val s = "para one line a\npara one line b\n\npara two\n* head\npara three\n"
    assert(types(s) == Seq(
      "PARAGRAPH" -> "para one line a\npara one line b",
      "PARAGRAPH" -> "para two",
      "HEADLINE" -> "* head",
      "PARAGRAPH" -> "para three"))
  }

  test("block swallows until terminator; trailing ws trimmed (fulltext.go:110)") {
    val s = "#+begin_src scala\nval x = 1\n#+END_SRC  \nafter\n"
    assert(types(s) == Seq(
      "BLOCK" -> "#+begin_src scala\nval x = 1\n#+END_SRC",
      "PARAGRAPH" -> "after"))
  }

  test("drawer swallows until :end:") {
    val s = ":properties:\n:id: 42\n:end:\ntail\n"
    assert(types(s) == Seq(
      "DRAWER" -> ":properties:\n:id: 42\n:end:",
      "PARAGRAPH" -> "tail"))
  }

  test("list item absorbs blanks and deeper-indented continuations") {
    val s = "- item one\n  continued deeper\n\n  still item\nnot item\n"
    assert(types(s) == Seq(
      "LIST_ITEM" -> "- item one\n  continued deeper\n\n  still item",
      "PARAGRAPH" -> "not item"))
  }

  test("1-based line numbers track element starts") {
    val s = "alpha\n\n* head\n- li\n"
    val es = elements(s)
    assert(es.map(e => (TypeNames(e.typ), e.line)) ==
      Seq(("PARAGRAPH", 1), ("HEADLINE", 3), ("LIST_ITEM", 4)))
  }

  test("chunks skip gram-less elements and carry rune/byte offsets") {
    val s = "añ b\n\n-----\n* héad\n"
    // HR has no grams -> skipped
    val cs = OrgChunker.chunks(s)
    assert(cs.map(_.text) == Seq("añ b", "* héad"))
    val bytes = s.getBytes("UTF-8")
    cs.foreach { c =>
      val slice = new String(bytes, c.byteStart.toInt, c.byteLen.toInt, "UTF-8")
      assert(slice == c.text)
    }
    assert(cs(0).runeOff == 0 && cs(0).runeLen == 4)
    assert(cs(1).line == 4)
  }

  test("keyword and table lines are single-line elements (+ terminal BLANK)") {
    val s = "#+title: t\n| a | b |\n| c | d |\n"
    // the reference's forParts also emits a terminal (BLANK, len, len)
    // pseudo-element (orgPart fulltext.go:169) — indexOrg skips it
    assert(types(s) == Seq(
      "KEYWORD" -> "#+title: t",
      "TABLE_LINE" -> "| a | b |",
      "TABLE_LINE" -> "| c | d |",
      "BLANK" -> ""))
    assert(OrgChunker.chunks(s).map(_.text) ==
      Seq("#+title: t", "| a | b |", "| c | d |"))
  }

  test("unterminated block swallows to EOF") {
    val s = "#+begin_src\ncode\n"
    assert(types(s) == Seq("BLOCK" -> "#+begin_src\ncode"))
  }
}
