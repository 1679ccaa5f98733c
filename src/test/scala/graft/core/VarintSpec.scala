package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class VarintSpec extends AnyFunSuite {

  // reference golden boundaries, test.go:10-29: pairs share an encoded width 1..9
  private val goldens: Seq[java.math.BigInteger] = Seq(
    "0", "127", "128", "4095", "4096", "1048575", "1048576", "268435455",
    "268435456", "68719476735", "68719476736", "17592186044415",
    "17592186044416", "4503599627370495", "4503599627370496",
    "1152921504606846975", "1152921504606846976", "18446744073709551615"
  ).map(new java.math.BigInteger(_))

  private def toLongU(b: java.math.BigInteger): Long = b.longValue()

  test("reference boundary goldens roundtrip with exact widths (test.go:10-29)") {
    goldens.zipWithIndex.foreach { case (big, idx) =>
      val n = toLongU(big)
      val buf = new Array[Byte](9)
      val end = Varint.put(n, buf, 0)
      assert(end == idx / 2 + 1, s"width of $big")
      assert(Varint.size(n) == end, s"numSize of $big")
      val (v, o) = Varint.get(buf, 0)
      assert(v == n && o == end, s"roundtrip of $big")
    }
  }

  test("lexicographic byte order preserves numeric (unsigned) order") {
    val r = new Random(1)
    val samples = (goldens.map(toLongU) ++
      (1 to 2000).map(_ => r.nextLong())).distinct
    val encoded = samples.map { n =>
      val buf = new Array[Byte](9)
      val end = Varint.put(n, buf, 0)
      (n, java.util.Arrays.copyOf(buf, end))
    }
    def byteCompare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xFF) - (b(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
    val byNum = encoded.sortWith((x, y) => java.lang.Long.compareUnsigned(x._1, y._1) < 0)
    val byBytes = encoded.sortWith((x, y) => byteCompare(x._2, y._2) < 0)
    assert(byNum.map(_._1) == byBytes.map(_._1))
  }

  test("property: roundtrip for random unsigned 64-bit values") {
    val r = new Random(99)
    (1 to 5000).foreach { _ =>
      val n = r.nextLong() >>> r.nextInt(64)
      val buf = new Array[Byte](9)
      val end = Varint.put(n, buf, 0)
      val (v, o) = Varint.get(buf, 0)
      assert(v == n && o == end && Varint.size(n) == end, s"n=$n")
    }
  }

  test("writer/reader stream roundtrip incl. counted bytes") {
    val w = new Varint.Writer()
    val r = new Random(5)
    val nums = (1 to 300).map(_ => r.nextLong() >>> r.nextInt(64))
    nums.foreach(w.putNum)
    val payload = Array.tabulate[Byte](37)(_.toByte)
    w.putCountedBytes(payload)
    w.putIntBE(0xDEADBEEF)
    val rd = new Varint.Reader(w.result())
    nums.foreach(n => assert(rd.getNum() == n))
    assert(rd.getCountedBytes().toSeq == payload.toSeq)
    assert(rd.getIntBE() == 0xDEADBEEF)
    assert(!rd.hasMore)
  }
}
