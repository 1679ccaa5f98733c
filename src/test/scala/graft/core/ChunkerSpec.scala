package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import java.nio.charset.StandardCharsets.UTF_8

class ChunkerSpec extends AnyFunSuite {

  private val corpus = "one\ntwo three\nfour\nfour five\none two three\none three two\n"

  test("README corpus: 6 line chunks with 1-based line numbers") {
    val cs = Chunker.lines(corpus)
    assert(cs.map(_.text) == Seq("one\n", "two three\n", "four\n",
      "four five\n", "one two three\n", "one three two\n"))
    assert(cs.map(_.line) == Seq(1, 2, 3, 4, 5, 6))
  }

  test("chunks reassemble the input byte-identically (per-url invariant)") {
    val r = new Random(3)
    (1 to 200).foreach { _ =>
      val parts = (0 to r.nextInt(10)).map { _ =>
        val alphabet = "ab €ñ😀\tz"
        (0 to r.nextInt(20)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
      }
      val text = parts.mkString("\n") + (if (r.nextBoolean()) "\n" else "")
      val strict = Chunker.lines(text)
      val upToLastNl = text.lastIndexOf('\n') match {
        case -1 => ""
        case i => text.substring(0, i + 1)
      }
      assert(strict.map(_.text).mkString == upToLastNl)
      // lenient keeps the unterminated tail: full reassembly
      assert(Chunker.linesLenient(text).map(_.text).mkString == text)
    }
  }

  test("rune vs byte offsets on multi-byte UTF-8 (fts-lmdb.go:586-592)") {
    val text = "añb\n€x😀\nplain\n"
    val cs = Chunker.lines(text)
    val c0 = cs(0) // "añb\n": 4 code points, 5 utf-8 bytes (ñ=2)
    assert(c0.runeOff == 0 && c0.runeLen == 4 && c0.byteStart == 0 && c0.byteLen == 5)
    val c1 = cs(1) // "€x😀\n": 4 code points (😀 is one cp), 3+1+4+1=9 bytes
    assert(c1.runeOff == 4 && c1.runeLen == 4 && c1.byteStart == 5 && c1.byteLen == 9)
    val c2 = cs(2)
    assert(c2.runeOff == 8 && c2.byteStart == 14 && c2.byteLen == 6)
    // offsets slice the original byte array back to each chunk
    val bytes = text.getBytes(UTF_8)
    cs.foreach { c =>
      val slice = new String(bytes, c.byteStart.toInt, c.byteLen.toInt, UTF_8)
      assert(slice == c.text)
    }
  }

  test("blank lines become chunks (indexLines keeps 0-gram lines)") {
    val cs = Chunker.lines("a\n\n\nb\n")
    assert(cs.map(_.text) == Seq("a\n", "\n", "\n", "b\n"))
    assert(cs.map(_.line) == Seq(1, 2, 3, 4))
  }

  test("unterminated final line dropped by strict chunker (readLine EOF quirk)") {
    assert(Chunker.lines("a\nb").map(_.text) == Seq("a\n"))
    assert(Chunker.linesLenient("a\nb").map(_.text) == Seq("a\n", "b"))
  }
}
