package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class GramSpec extends AnyFunSuite {

  private def randWord(r: Random): String = {
    val chars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    (1 to (1 + r.nextInt(8))).map(_ => chars(r.nextInt(chars.length))).mkString
  }
  private def randText(r: Random): String = {
    val seps = " \t\n.,;-€ñ😀"
    (0 to r.nextInt(12)).map { _ =>
      if (r.nextBoolean()) randWord(r) else seps(r.nextInt(seps.length)).toString
    }.mkString
  }

  // reference golden: test.go:48 roundtrip set
  test("gram string<->code roundtrip (reference test.go:47-55)") {
    val golden = ".th,thi,his,hi.,.is,is.,.a.,.te,tes,est,st.".split(",")
    golden.foreach { k =>
      assert(Gram.gramString(Gram.gramForString(k)) == k.toUpperCase)
    }
  }

  test("gram codes match the base-37 packing (fulltext.go:58-64)") {
    assert(Gram.gramForString(".TH") == (0 * 37 + 30) * 37 + 18)
    assert(Gram.gramForString("ABC") == (11 * 37 + 12) * 37 + 13)
    assert(Gram.gramForString("999") == (10 * 37 + 10) * 37 + 10)
  }

  test("whole-word grams of 'this is a test' (simulated reference golden)") {
    val got = Gram.grams(partial = false, Seq("this is a test")).map(Gram.gramString)
    val want = Set(".TH", "THI", "HIS", ".IS", "IS.", ".A.", ".TE", "TES", "EST", "ST.")
    assert(got == want)
  }

  test("partial grams keep only interior trigrams (fulltext.go:233)") {
    val got = Gram.grams(partial = true, Seq("this")).map(Gram.gramString)
    assert(got == Set("THI", "HIS"))
    assert(Gram.grams(partial = true, Seq("ab")).isEmpty)
  }

  test("multiple args joined with single spaces; separator runs collapse") {
    val a = Gram.grams(partial = false, Seq("one", "two"))
    val b = Gram.grams(partial = false, Seq("one two"))
    val c = Gram.grams(partial = false, Seq("one \t ,, two"))
    assert(a == b && b == c)
  }

  test("grams of blank / separator-only text are empty") {
    assert(Gram.grams(partial = false, Seq("")).isEmpty)
    assert(Gram.grams(partial = false, Seq(" \n\t .")).isEmpty)
  }

  test("property: grams(words) == union of trigrams of '.'+word+'.'") {
    val r = new Random(42)
    (1 to 500).foreach { _ =>
      val words = (0 to r.nextInt(6)).map(_ => randWord(r))
      val viaEngine = Gram.grams(partial = false, Seq(words.mkString(" ")))
      val viaWindows = words.flatMap { w =>
        val padded = "." + w.toUpperCase + "."
        (0 to padded.length - 3).map(i => padded.substring(i, i + 3))
      }.map(Gram.gramForString).toSet
      assert(viaEngine == viaWindows, s"words=$words")
    }
  }

  test("property: emitted grams >= 37; partial subset of whole; interior-only") {
    val r = new Random(7)
    (1 to 500).foreach { _ =>
      val s = randText(r)
      val whole = Gram.grams(partial = false, Seq(s))
      val part = Gram.grams(partial = true, Seq(s))
      assert(whole.forall(_ >= 37), s"s=$s")
      assert(part.forall { g =>
        g / Gram.Base2 != 0 && (g / Gram.Base) % Gram.Base != 0 && g % Gram.Base != 0
      }, s"s=$s")
      assert(part.subsetOf(whole), s"s=$s")
    }
  }

  test("property: gramsSorted (bitset path) == grams (set path), sorted") {
    val r = new Random(13)
    (1 to 300).foreach { _ =>
      val s = randText(r)
      for (partial <- Seq(false, true)) {
        val viaBits = Gram.gramsSorted(partial, Seq(s)).toSeq
        val viaSet = Gram.grams(partial, Seq(s)).toSeq.sorted
        assert(viaBits == viaSet, s"partial=$partial s='$s'")
      }
    }
    // multi-arg whole-word join semantics too
    assert(Gram.gramsSorted(partial = false, Seq("one", "two")).toSeq ==
      Gram.grams(partial = false, Seq("one", "two")).toSeq.sorted)
  }

  test("property: gramCount == gramsSorted.length (count-only stats path)") {
    val r = new Random(29)
    (1 to 300).foreach { _ =>
      val s = randText(r)
      for (partial <- Seq(false, true)) {
        assert(Gram.gramCount(partial, Seq(s)) ==
          Gram.gramsSorted(partial, Seq(s)).length, s"partial=$partial s='$s'")
        // workspace must come back clean: a second call on the same thread
        // sees the same counts
        assert(Gram.gramCount(partial, Seq(s)) ==
          Gram.gramsSorted(partial, Seq(s)).length, s"repeat s='$s'")
      }
    }
    assert(Gram.gramCount(partial = false, Seq("one", "two")) ==
      Gram.gramsSorted(partial = false, Seq("one", "two")).length)
    assert(Gram.gramCount(partial = false, Seq("")) == 0)
  }

  test("non-ASCII code points act as separators") {
    assert(Gram.grams(partial = false, Seq("añb")) ==
      Gram.grams(partial = false, Seq("a b")))
    assert(Gram.grams(partial = false, Seq("ab😀cd")) ==
      Gram.grams(partial = false, Seq("ab cd")))
  }
}
