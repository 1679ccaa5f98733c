package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class PostingsSpec extends AnyFunSuite {
  private val (k1, b, avgdl) = (1.2, 0.75, 20.0)

  private def build(docs: Seq[(Long, Int, Long)], blockSize: Int = 128): Array[Byte] = {
    val sb = new Postings.SegmentBuilder(k1, b, avgdl, blockSize)
    docs.foreach { case (d, tf, dl) => sb.add(d, tf, dl) }
    sb.result()
  }

  private def randPostings(r: Random, n: Int): IndexedSeq[(Long, Int, Long)] = {
    var doc = -1L
    (1 to n).map { _ =>
      doc += 1 + r.nextInt(1000)
      (doc, 1 + r.nextInt(50), 1 + r.nextInt(500).toLong)
    }
  }

  test("roundtrip: encode/decode random posting lists across block sizes") {
    val r = new Random(11)
    for (n <- Seq(0, 1, 5, 127, 128, 129, 1000); bs <- Seq(4, 128)) {
      val ps = randPostings(r, n)
      val bytes = build(ps, bs)
      val (ds, ts, ls) = Postings.decodeAllWithDl(bytes)
      assert(ds.toSeq == ps.map(_._1) && ts.toSeq == ps.map(_._2) &&
        ls.toSeq == ps.map(_._3), s"n=$n bs=$bs")
    }
  }

  test("block-max metadata is a valid upper bound of per-doc tf saturation") {
    val r = new Random(23)
    val ps = randPostings(r, 700)
    val it = new Postings.SegmentIterator(build(ps, 64))
    var i = 0
    while (it.next()) {
      val (_, tf, dl) = ps(i)
      val s = Postings.tfSaturation(tf, dl, k1, b, avgdl)
      assert(it.blockMaxScore(it.currentBlock) >= s)
      assert(it.blockMaxTf(it.currentBlock) >= tf)
      i += 1
    }
    assert(i == 700)
  }

  test("skipTo positions at first docId >= target, never backwards") {
    val r = new Random(31)
    val ps = randPostings(r, 800)
    val docs = ps.map(_._1)
    for (bs <- Seq(16, 128)) {
      val it = new Postings.SegmentIterator(build(ps, bs))
      var target = 0L
      val probe = new Random(7)
      while (target <= docs.last) {
        val expected = docs.find(_ >= target)
        val ok = it.skipTo(target)
        assert(ok == expected.isDefined, s"target=$target bs=$bs")
        expected.foreach(e => assert(it.docId == e, s"target=$target bs=$bs"))
        target += 1 + probe.nextInt(5000)
      }
      assert(!it.skipTo(docs.last + 1))
    }
  }

  test("spliceShards == single-segment encoding, byte-identical") {
    val r = new Random(47)
    val ps = randPostings(r, 1000)
    val whole = build(ps, 128)
    // range-salt: split at block boundaries (128) so blocks line up
    val shards = ps.grouped(256).map(g => build(g, 128)).toSeq
    val spliced = Postings.spliceShards(shards)
    assert(spliced.toSeq == whole.toSeq)
    val (ds, ts) = Postings.decodeAll(spliced)
    assert(ds.toSeq == ps.map(_._1) && ts.toSeq == ps.map(_._2))
  }

  test("spliceShards with non-block-aligned shards decodes correctly") {
    val r = new Random(53)
    val ps = randPostings(r, 500)
    val shards = ps.grouped(77).map(g => build(g, 128)).toSeq
    val (ds, ts) = Postings.decodeAll(Postings.spliceShards(shards))
    assert(ds.toSeq == ps.map(_._1) && ts.toSeq == ps.map(_._2))
  }

  test("membership-only layout (hasTfDl=false): smaller, decodes tf/dl as 1") {
    val r = new Random(61)
    val ps = randPostings(r, 600)
    val slim = {
      val sb = new Postings.SegmentBuilder(k1, b, avgdl, 128, hasTfDl = false)
      ps.foreach { case (d, _, _) => sb.add(d, 1, 1L) }
      sb.result()
    }
    val fat = {
      val sb = new Postings.SegmentBuilder(k1, b, avgdl, 128)
      ps.foreach { case (d, _, _) => sb.add(d, 1, 1L) }
      sb.result()
    }
    assert(slim.length < fat.length - 600, // >= 2 varint bytes/posting saved
      s"slim=${slim.length} fat=${fat.length}")
    val (ds, ts, ls) = Postings.decodeAllWithDl(slim)
    assert(ds.toSeq == ps.map(_._1) && ts.forall(_ == 1) && ls.forall(_ == 1L))
    // skipTo works identically on the slim layout
    val it = new Postings.SegmentIterator(slim)
    assert(it.skipTo(ps(300)._1) && it.docId == ps(300)._1 && it.tf == 1)
    // splicing slim shards keeps the layout
    val shards = ps.grouped(128).map { g =>
      val sb = new Postings.SegmentBuilder(k1, b, avgdl, 128, hasTfDl = false)
      g.foreach { case (d, _, _) => sb.add(d, 1, 1L) }
      sb.result()
    }.toSeq
    assert(Postings.spliceShards(shards).toSeq == slim.toSeq)
    // mixing layouts is rejected
    intercept[IllegalArgumentException](Postings.spliceShards(Seq(slim, fat)))
  }

  test("strictly-increasing docId is enforced") {
    val sb = new Postings.SegmentBuilder(k1, b, avgdl)
    sb.add(5, 1, 10)
    intercept[IllegalArgumentException](sb.add(5, 1, 10))
  }
}
