package graft.core

/** Production posting-list codec: doc-id-sorted, delta+varint compressed,
  * block-structured with skip + block-max metadata for Block-Max WAND
  * (Ding & Suel, SIGIR 2011).
  *
  * Same design role as the reference's width-bucketed oidList
  * (reference: fts-lmdb.go:75, 704-739) — an opaque binary posting payload
  * keyed by term — but rebuilt per the north rule as delta+varint blocks.
  * Uses the reference-compatible varint ([[Varint]], fts-lmdb.go:1733-1780).
  *
  * Layout (all ints are [[Varint]] unless noted):
  * {{{
  *   [numDocs] [numBlocks] [flags] [dirByteLen]
  *   flags bit 0: hasTfDl — membership-only segments (the trigram candidate
  *     index, which never scores) omit the tf/dl sections entirely: ~2
  *     bytes/posting smaller and nothing to decode on the intersection path
  *   directory, per block (self-contained — enables O(1) block skip and
  *   byte-splice merging of range-salted shards):
  *     [docCount] [firstDocId abs] [lastDocId abs] [maxTf]
  *     [blockMaxScoreBits: 4-byte BE float] [payloadByteLen]
  *   payloads, per block:
  *     [docId deltas x (docCount-1)]  (first doc comes from the directory)
  *     if hasTfDl:
  *       [tf x docCount]
  *       [dl x docCount] (exact doc length — scoring needs it at the cursor;
  *                        a 10^12-row doc-stats join per query would not scale)
  * }}}
  *
  * tf/dl decoding is LAZY per block: leapfrog intersection and WAND block
  * skipping decode only doc-id deltas; the tf/dl arrays of a block are
  * decoded on first access (i.e. only for blocks that actually score).
  *
  * blockMaxScore is the block's max of the BM25 tf-saturation factor
  * `tf / (tf + k1*(1 - b + b*dl/avgdl))`, rounded UP so
  * `idf * (k1+1) * blockMaxScore` is a valid upper bound on any doc's score
  * contribution in the block. k1/b/avgdl are fixed at build time.
  */
object Postings {
  final val DefaultBlockSize = 128

  /** BM25 tf saturation used for block maxima; must match query-side. */
  @inline def tfSaturation(tf: Int, dl: Long, k1: Double, b: Double, avgdl: Double): Double =
    tf / (tf + k1 * (1 - b + b * dl / avgdl))

  /** Streaming, bounded-memory builder for one term segment.
    * Doc ids must be added in strictly increasing order.
    */
  final class SegmentBuilder(k1: Double, b: Double, avgdl: Double,
                             blockSize: Int = DefaultBlockSize,
                             hasTfDl: Boolean = true) {
    require(blockSize > 0)
    // initial sizes are small: the gram-range build keeps up to |gram space|
    // (37^3) builders live per kernel task, so idle-builder footprint matters
    private val dir = new Varint.Writer(64)
    private val payload = new Varint.Writer(64)
    private val blockDocs = new Array[Long](blockSize)
    // membership-only segments never touch tf/dl — skip the allocations
    private val blockTfs = if (hasTfDl) new Array[Int](blockSize) else null
    private val blockDls = if (hasTfDl) new Array[Long](blockSize) else null
    private var inBlock = 0
    private var nDocs = 0L
    private var nBlocks = 0L
    private var lastDoc = -1L

    def add(docId: Long, tf: Int, dl: Long): Unit = {
      require(docId > lastDoc, s"doc ids must be strictly increasing: $docId after $lastDoc")
      blockDocs(inBlock) = docId
      if (hasTfDl) {
        blockTfs(inBlock) = tf
        blockDls(inBlock) = dl
      }
      inBlock += 1
      nDocs += 1
      lastDoc = docId
      if (inBlock == blockSize) flushBlock()
    }

    private def flushBlock(): Unit = {
      if (inBlock == 0) return
      var maxTf = 0
      var maxScore = 0.0
      var i = 0
      if (hasTfDl) {
        while (i < inBlock) {
          if (blockTfs(i) > maxTf) maxTf = blockTfs(i)
          val s = tfSaturation(blockTfs(i), blockDls(i), k1, b, avgdl)
          if (s > maxScore) maxScore = s
          i += 1
        }
      } else maxTf = 1 // membership-only: tf/dl are implicitly 1
      val pay = new Varint.Writer(inBlock * 4)
      i = 1
      while (i < inBlock) { pay.putNum(blockDocs(i) - blockDocs(i - 1)); i += 1 }
      if (hasTfDl) {
        i = 0
        while (i < inBlock) { pay.putNum(blockTfs(i).toLong); i += 1 }
        i = 0
        while (i < inBlock) { pay.putNum(blockDls(i)); i += 1 }
      }
      dir.putNum(inBlock.toLong)
      dir.putNum(blockDocs(0))
      dir.putNum(blockDocs(inBlock - 1))
      dir.putNum(maxTf.toLong)
      // round up so the float stays an upper bound of the double max
      dir.putIntBE(java.lang.Float.floatToIntBits(Math.nextUp(maxScore.toFloat)))
      dir.putNum(pay.size.toLong)
      payload.putBytes(pay.result())
      nBlocks += 1
      inBlock = 0
    }

    def result(): Array[Byte] = {
      flushBlock()
      val out = new Varint.Writer(32 + dir.size + payload.size)
      out.putNum(nDocs)
      out.putNum(nBlocks)
      out.putNum(if (hasTfDl) 1L else 0L)
      out.putNum(dir.size.toLong)
      out.putBytes(dir.result())
      out.putBytes(payload.result())
      out.result()
    }
  }

  /** Splice range-salted shard segments (strictly increasing doc-id ranges,
    * shard order = doc-id order) into one segment WITHOUT re-encoding docs:
    * blocks are self-contained, so this concatenates directories and
    * payloads and rewrites only the header.
    */
  def spliceShards(shards: Seq[Array[Byte]]): Array[Byte] = {
    val parsed = shards.map { s => (s, new Header(s)) }
      .filter(_._2.numDocs > 0)
    if (parsed.isEmpty) return new SegmentBuilder(1.2, 0.75, 1.0).result()
    var nDocs = 0L
    var nBlocks = 0L
    var lastDoc = -1L
    val flags = parsed.head._2.flags
    parsed.foreach { case (_, h) =>
      require(h.flags == flags, "shards mix segment layouts (flags differ)")
      require(h.firstDocId > lastDoc,
        s"shards out of order: first ${h.firstDocId} after $lastDoc")
      lastDoc = h.lastDocId
      nDocs += h.numDocs
      nBlocks += h.numBlocks
    }
    val dirLen = parsed.map(_._2.dirLen.toLong).sum
    val out = new Varint.Writer()
    out.putNum(nDocs)
    out.putNum(nBlocks)
    out.putNum(flags)
    out.putNum(dirLen)
    parsed.foreach { case (s, h) => out.putBytes(s, h.dirStart, h.dirLen) }
    parsed.foreach { case (s, h) => out.putBytes(s, h.payloadStart, s.length - h.payloadStart) }
    out.result()
  }

  private final class Header(bytes: Array[Byte]) {
    val r = new Varint.Reader(bytes)
    val numDocs: Long = r.getNum()
    val numBlocks: Long = r.getNum()
    val flags: Long = r.getNum()
    val dirLen: Int = r.getNum().toInt
    val dirStart: Int = r.off
    val payloadStart: Int = dirStart + dirLen
    def firstDocId: Long = {
      val d = new Varint.Reader(bytes, dirStart)
      d.getNum(); d.getNum()
    }
    def lastDocId: Long = {
      // walk the directory to the final block (directories are small)
      val d = new Varint.Reader(bytes, dirStart)
      var last = -1L
      var i = 0L
      while (i < numBlocks) {
        d.getNum(); d.getNum(); last = d.getNum(); d.getNum(); d.getIntBE(); d.getNum()
        i += 1
      }
      last
    }
  }

  /** Cursor over one segment with block skipping. Not thread-safe. */
  final class SegmentIterator(bytes: Array[Byte]) {
    private val hdr = new Varint.Reader(bytes)
    val numDocs: Long = hdr.getNum()
    val numBlocks: Int = hdr.getNum().toInt
    val hasTfDl: Boolean = (hdr.getNum() & 1L) == 1L
    private val dirLen = hdr.getNum().toInt
    private val dirStart = hdr.off
    private val payloadBase = dirStart + dirLen

    // decoded directory (numBlocks is ~numDocs/128; fine to materialize)
    private val bDocCount = new Array[Int](numBlocks)
    private val bFirst = new Array[Long](numBlocks)
    private val bLast = new Array[Long](numBlocks)
    private val bMaxTf = new Array[Int](numBlocks)
    private val bMaxScore = new Array[Float](numBlocks)
    private val bPayOff = new Array[Int](numBlocks)
    locally {
      val d = new Varint.Reader(bytes, dirStart)
      var off = payloadBase
      var i = 0
      while (i < numBlocks) {
        bDocCount(i) = d.getNum().toInt
        bFirst(i) = d.getNum()
        bLast(i) = d.getNum()
        bMaxTf(i) = d.getNum().toInt
        bMaxScore(i) = java.lang.Float.intBitsToFloat(d.getIntBE())
        bPayOff(i) = off
        off += d.getNum().toInt
        i += 1
      }
    }

    def blockLastDoc(i: Int): Long = bLast(i)
    def blockMaxScore(i: Int): Float = bMaxScore(i)
    def blockMaxTf(i: Int): Int = bMaxTf(i)

    /** Max tf-saturation across the whole segment — a term-level bound. */
    lazy val segmentMaxScore: Double = {
      var m = 0.0; var i = 0
      while (i < numBlocks) { if (bMaxScore(i) > m) m = bMaxScore(i); i += 1 }
      m
    }

    private var blk = -1
    private var docs: Array[Long] = null
    private var tfs: Array[Int] = null
    private var dls: Array[Long] = null
    private var pos = 0
    private var cnt = 0
    private var tfOff = 0          // payload offset of the tf section
    private var tfDecoded = false  // lazily decoded on first tf/dl access

    def currentBlock: Int = blk

    private def loadBlock(i: Int): Unit = {
      blk = i
      cnt = bDocCount(i)
      if (docs == null || docs.length < cnt) {
        docs = new Array[Long](cnt); tfs = new Array[Int](cnt); dls = new Array[Long](cnt)
      }
      val r = new Varint.Reader(bytes, bPayOff(i))
      docs(0) = bFirst(i)
      var j = 1
      while (j < cnt) { docs(j) = docs(j - 1) + r.getNum(); j += 1 }
      tfOff = r.off
      tfDecoded = false
      pos = 0
    }

    /** Decode the block's tf/dl sections — only for blocks that score. */
    private def decodeTfDl(): Unit = {
      if (hasTfDl) {
        val r = new Varint.Reader(bytes, tfOff)
        var j = 0
        while (j < cnt) { tfs(j) = r.getNum().toInt; j += 1 }
        j = 0
        while (j < cnt) { dls(j) = r.getNum(); j += 1 }
      } else {
        java.util.Arrays.fill(tfs, 0, cnt, 1)
        java.util.Arrays.fill(dls, 0, cnt, 1L)
      }
      tfDecoded = true
    }

    /** Advance to next posting; false at end. */
    def next(): Boolean = {
      if (blk >= 0 && pos + 1 < cnt) { pos += 1; true }
      else if (blk + 1 < numBlocks) { loadBlock(blk + 1); true }
      else { pos = cnt; false }
    }

    def docId: Long = docs(pos)
    def tf: Int = { if (!tfDecoded) decodeTfDl(); tfs(pos) }
    def dl: Long = { if (!tfDecoded) decodeTfDl(); dls(pos) }

    /** Position at first posting with docId >= target; false if exhausted.
      * Never moves backwards.
      */
    def skipTo(target: Long): Boolean = {
      if (blk >= 0 && pos < cnt && docs(pos) >= target) return true
      // find target block via the directory (galloping from current block)
      var i = math.max(blk, 0)
      while (i < numBlocks && bLast(i) < target) i += 1
      if (i >= numBlocks) { blk = numBlocks; pos = 0; cnt = 0; return false }
      if (i != blk) loadBlock(i)
      // binary search inside block
      var lo = pos
      var hi = cnt - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (docs(mid) < target) lo = mid + 1 else hi = mid
      }
      pos = lo
      docs(pos) >= target || next()
    }

    def exhausted: Boolean = blk >= numBlocks || (blk == numBlocks - 1 && pos >= cnt)

    /** Position at the first posting (call before iterating with docId/tf). */
    def start(): Boolean = {
      if (numBlocks == 0) false
      else { loadBlock(0); true }
    }
  }

  /** Decode a full segment (tests / small candidates). */
  def decodeAll(bytes: Array[Byte]): (Array[Long], Array[Int]) = {
    val (d, t, _) = decodeAllWithDl(bytes)
    (d, t)
  }

  def decodeAllWithDl(bytes: Array[Byte]): (Array[Long], Array[Int], Array[Long]) = {
    val it = new SegmentIterator(bytes)
    val n = it.numDocs.toInt
    val ds = new Array[Long](n)
    val ts = new Array[Int](n)
    val ls = new Array[Long](n)
    var i = 0
    if (it.start()) {
      ds(i) = it.docId; ts(i) = it.tf; ls(i) = it.dl; i += 1
      while (it.next()) { ds(i) = it.docId; ts(i) = it.tf; ls(i) = it.dl; i += 1 }
    }
    (ds, ts, ls)
  }
}
