package graft.core

/** Lexicographically-orderable prefix varint, 1-9 bytes, compatible with the
  * reference codec (reference: fts-lmdb.go:34-44 layout table,
  * putNum 1733-1753, getNum 1770-1780, numSize 1723-1730; boundary goldens
  * test.go:10-29). Values are unsigned 64-bit (Scala Long reinterpreted).
  *
  * Layout:
  *   7 bits  (1 byte):  0xxxxxxx
  *   12 bits (2 bytes): 1000xxxx X
  *   20 bits (3 bytes): 1001xxxx X X         ... +8 bits per extra byte ...
  *   64 bits (9 bytes): 1111---- X X X X X X X X
  */
object Varint {

  /** Encoded width in bytes of unsigned n. */
  def size(n: Long): Int = {
    if (java.lang.Long.compareUnsigned(n, 1L << 7) < 0) 1
    else {
      var offset = 0
      var tmp = n >>> 12
      while (tmp != 0) { offset += 1; tmp >>>= 8 }
      offset + 2
    }
  }

  /** Write unsigned n at buf(off); returns the new offset. */
  def put(n: Long, buf: Array[Byte], off: Int): Int = {
    if (java.lang.Long.compareUnsigned(n, 1L << 7) < 0) {
      buf(off) = (n & 0xFF).toByte
      off + 1
    } else {
      var offset = 0
      var tmp = n >>> 12
      while (tmp != 0) { offset += 1; tmp >>>= 8 }
      val first = (0x80 | (offset << 4)).toByte
      var num = n
      var i = offset + 1
      while (i > 0) {
        buf(off + i) = (num & 0xFF).toByte
        num >>>= 8
        i -= 1
      }
      buf(off) = (first | (num & 0xF)).toByte
      off + offset + 2
    }
  }

  /** Read unsigned value at buf(off); returns (value, newOffset). */
  def get(buf: Array[Byte], off: Int): (Long, Int) = {
    val b0 = buf(off) & 0xFF
    if ((b0 & 0x80) == 0) (b0.toLong, off + 1)
    else {
      val nbytes = ((b0 >> 4) & 0x7) + 2
      var r = (b0 & 0xF).toLong
      var i = 1
      while (i < nbytes) {
        r = (r << 8) | (buf(off + i) & 0xFF)
        i += 1
      }
      (r, off + nbytes)
    }
  }

  /** Growable write buffer of varints / raw bytes (reference myBuf analog). */
  final class Writer(initial: Int = 64) {
    private var buf = new Array[Byte](math.max(initial, 16))
    private var len = 0
    private def ensure(n: Int): Unit = {
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    }
    def putNum(n: Long): Unit = { ensure(9); len = Varint.put(n, buf, len) }
    def putBytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, buf, len, b.length); len += b.length }
    def putBytes(b: Array[Byte], off: Int, n: Int): Unit = { ensure(n); System.arraycopy(b, off, buf, len, n); len += n }
    def putCountedBytes(b: Array[Byte]): Unit = { putNum(b.length.toLong); putBytes(b) }
    def putIntBE(v: Int): Unit = {
      ensure(4)
      buf(len) = (v >>> 24).toByte; buf(len + 1) = (v >>> 16).toByte
      buf(len + 2) = (v >>> 8).toByte; buf(len + 3) = v.toByte
      len += 4
    }
    def size: Int = len
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
    def reset(): Unit = len = 0
  }

  /** Cursor-style reader. */
  final class Reader(buf: Array[Byte], var off: Int = 0) {
    def getNum(): Long = {
      val (v, o) = Varint.get(buf, off); off = o; v
    }
    def getIntBE(): Int = {
      val v = ((buf(off) & 0xFF) << 24) | ((buf(off + 1) & 0xFF) << 16) |
        ((buf(off + 2) & 0xFF) << 8) | (buf(off + 3) & 0xFF)
      off += 4
      v
    }
    def getCountedBytes(): Array[Byte] = {
      val n = getNum().toInt
      val r = java.util.Arrays.copyOfRange(buf, off, off + n)
      off += n
      r
    }
    def remaining: Int = buf.length - off
    def hasMore: Boolean = off < buf.length
  }
}
