package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.GoFormat

/** F3/F4 goldens. escape == Go strconv.Quote minus outer quotes
  * (fts-lmdb.go:1423-1426); printfGuarded replicates the reference's
  * slicing printf (fts-lmdb.go:1410-1421) including its %% prefix-dropping
  * quirk; format interprets the reference's own format constants
  * (fts-lmdb.go:56-62).
  */
class GoFormatSpec extends AnyFunSuite {

  test("escape: ASCII byte-exact vs strconv.Quote") {
    assert(GoFormat.escape("plain text") == "plain text")
    assert(GoFormat.escape("a\"b") == "a\\\"b")
    assert(GoFormat.escape("a\\b") == "a\\\\b")
    assert(GoFormat.escape("line\n\ttab") == "line\\n\\ttab")
    assert(GoFormat.escape("\r\u0007\b\u000B\f") == "\\r\\a\\b\\v\\f")
    assert(GoFormat.escape("\u0000\u001F\u007F") == "\\x00\\x1f\\x7f")
  }

  test("escape: unicode printability") {
    assert(GoFormat.escape("héllo 漢字 Ω") == "héllo 漢字 Ω") // letters print raw
    assert(GoFormat.escape("\u00A0") == "\\u00a0") // NBSP: space class, not printable in Go
    assert(GoFormat.escape("\u200B") == "\\u200b") // zero-width space
    assert(GoFormat.escape(new String(Character.toChars(0x1F600))) ==
      new String(Character.toChars(0x1F600))) // emoji = So, printable
  }

  test("format: the reference's default line format") {
    // lineFormat = "%[6]s:%[2]d:%[5]s\n" args POSITION LINE OFFSET PERCENT CHUNK FILE
    val out = GoFormat.format("%[6]s:%[2]d:%[5]s\n",
      7L, 5, 0, 0.0, "one two three", "f.org")
    assert(out == "f.org:5:one two three\n")
  }

  test("format: the reference's sexp format") {
    val out = GoFormat.format(
      "(:filename \"%[6]s\" :line %[2]d :offset %[3]d :text \"%[5]s\" :char-offset %[1]d :percent %[4]f)\n",
      7L, 5, 4, 62.5, "one two", "f.org")
    assert(out ==
      "(:filename \"f.org\" :line 5 :offset 4 :text \"one two\" :char-offset 7 :percent 62.500000)\n")
  }

  test("format: the reference's fuzzy line format (%4.1[4]f index after width)") {
    // fuzzyLineFormat = "%[6]s:%[2]d:%4.1[4]f%%:%[5]s\n" (fts-lmdb.go:58) —
    // Go's explicit index sits AFTER width/precision, before the verb
    val fmt = "%[6]s:%[2]d:%4.1[4]f%%:%[5]s\n"
    assert(GoFormat.format(fmt, 7L, 5, 0, 100.0, "one two three", "f.org") ==
      "f.org:5:100.0%:one two three\n")
    // width 4 pads short percents like Go's %4.1f
    assert(GoFormat.format(fmt, 7L, 5, 0, 5.0, "x", "f.org") ==
      "f.org:5: 5.0%:x\n")
    assert(GoFormat.format("%4.1[4]f", 1, 2, 3, 80.0) == "80.0")
    // Go also accepts the index BEFORE the width (fmt tries argNumber both
    // after the flag scan and before the verb): %[2]5d == %5[2]d
    assert(GoFormat.format("%[2]5d", 1, 42) == "   42")
    assert(GoFormat.format("%5[2]d", 1, 42) == "   42")
  }

  test("format: strict Go scan order rejects what Go rejects") {
    // Go scans flags, [N], width, '.', [N], precision, [N], verb — after a
    // post-width [N] a '.' IS the verb, so %4[2].1f renders a bad-verb
    // marker (Go: "%!.(float64=2.5)1f"; we render values without the type
    // prefix) instead of silently parsing width 4 precision 1
    assert(GoFormat.format("%4[2].1f", 1.5, 2.5) == "%!.(2.5)1f")
    // '.' with no digits = precision 0 (Go %.f)
    assert(GoFormat.format("%.f", 1.567) == "2")
    assert(GoFormat.format("%6.f", 1.567) == "     2")
  }

  test("format: explicit [N] re-seats the implicit cursor (Go semantics)") {
    assert(GoFormat.format("%[2]s %s", "a", "b", "c") == "b c")
    assert(GoFormat.format("%s %s", "a", "b") == "a b")
    assert(GoFormat.format("%%d %d", 42) == "%d 42")
  }

  test("format: out-of-range argument index prints Go's MISSING marker") {
    // Go: fmt.Sprintf("%s %s", "a") == "a %!s(MISSING)"
    assert(GoFormat.format("%s %s", "a") == "a %!s(MISSING)")
    assert(GoFormat.format("%d", Seq.empty: _*) == "%!d(MISSING)")
    assert(GoFormat.format("%[9]s", "a") == "%!s(BADINDEX)")
    // a bad explicit index does NOT move the cursor (Go keeps argNum)
    assert(GoFormat.format("%[5]d %d", 1, 2) == "%!d(BADINDEX) 1")
  }

  test("printfGuarded: literal-only formats print as-is") {
    assert(GoFormat.printfGuarded("plain") == "plain")
    assert(GoFormat.printfGuarded("", "arg") == "")
    assert(GoFormat.printfGuarded("trailing%") == "trailing%")
  }

  test("printfGuarded: real verb formats") {
    assert(GoFormat.printfGuarded("file=%s\n", "f.org") == "file=f.org\n")
  }

  test("printfGuarded: the reference's %% slicing quirk, replicated") {
    // literal-only with %%: prints only the tail after the last %%
    // (fts-lmdb.go: str = str[i+2:] then fmt.Print(str))
    assert(GoFormat.printfGuarded("a%%b") == "b")
    assert(GoFormat.printfGuarded("100%%") == "")
    // real verb after %%: the scanned prefix is dropped from the Printf
    assert(GoFormat.printfGuarded("a%%b%s!", "X") == "bX!")
  }
}
