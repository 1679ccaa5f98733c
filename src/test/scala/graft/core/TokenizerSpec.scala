package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {

  test("terms are maximal alnum runs, lowercased") {
    assert(Tokenizer.terms("Hello, World2-x").toSeq == Seq("hello", "world2", "x"))
    assert(Tokenizer.terms("  ").isEmpty)
    assert(Tokenizer.terms("añb").toSeq == Seq("a", "b"))
  }

  test("termFreqs counts duplicates; docLength is total tokens") {
    assert(Tokenizer.termFreqs("a b a B c").toSeq == Seq("a" -> 2, "b" -> 2, "c" -> 1))
    assert(Tokenizer.docLength("a b a B c") == 5)
  }

  test("property: run-count docLength == terms(text).length") {
    val r = new java.util.Random(41)
    val alphabet = "ab1 .,-\nXñ😀"
    (1 to 300).foreach { _ =>
      val s = (0 until r.nextInt(40))
        .map(_ => alphabet.charAt(r.nextInt(alphabet.length))).mkString
      assert(Tokenizer.docLength(s) == Tokenizer.terms(s).length, s"s='$s'")
    }
    assert(Tokenizer.docLength("") == 0)
    assert(Tokenizer.docLength("...") == 0)
    assert(Tokenizer.docLength("a") == 1)
  }

  test("firstWordBoundaryMatch: whole-word semantics (fts-lmdb.go:1299-1311)") {
    assert(Tokenizer.firstWordBoundaryMatch("one two three", "two", partial = false) == 4)
    assert(Tokenizer.firstWordBoundaryMatch("onetwo three", "two", partial = false) == -1)
    assert(Tokenizer.firstWordBoundaryMatch("onetwo three", "two", partial = true) == 3)
    // case-insensitive
    assert(Tokenizer.firstWordBoundaryMatch("One TWO", "two", partial = false) == 4)
    // boundary at string edges
    assert(Tokenizer.firstWordBoundaryMatch("two", "two", partial = false) == 0)
    assert(Tokenizer.firstWordBoundaryMatch("x.two", "two", partial = false) == 2)
    // skips embedded occurrence, finds later whole word
    assert(Tokenizer.firstWordBoundaryMatch("atwo two", "two", partial = false) == 5)
  }

  test("suffix-resume quirk: scan re-anchors after a failed match (hasArg fts-lmdb.go:1299-1311)") {
    // reference slices the string after each failed boundary match, so the
    // position right after the previous match end counts as a word start
    assert(Tokenizer.firstWordBoundaryMatch("twotwo", "two", partial = false) == 3)
    assert(Tokenizer.firstWordBoundaryMatch("xtwotwo", "two", partial = false) == 4)
    // but an occurrence that overlaps INTO gram chars on the right still fails
    assert(Tokenizer.firstWordBoundaryMatch("twotwox", "two", partial = false) == -1)
    // and a whole-word occurrence later still wins normally
    assert(Tokenizer.firstWordBoundaryMatch("twotwox two", "two", partial = false) == 8)
  }

  test("verifyAll ANDs args and returns first found offset (fts-lmdb.go:1282-1291)") {
    assert(Tokenizer.verifyAll("one two three", Seq("two", "one"), partial = false) == 4)
    assert(Tokenizer.verifyAll("one two three", Seq("two", "four"), partial = false) == -1)
  }
}
