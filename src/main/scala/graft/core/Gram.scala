package graft.core

import scala.collection.mutable

/** Base-37 trigram ("gram") codec and extraction.
  *
  * Semantics are bit-identical to the reference tokenizer
  * (reference: fulltext.go:56-64 constants, fulltext.go:210-238 extraction,
  * fulltext.go:240-282 codecs). A gram is a 3-digit base-37 number packed in
  * 16 bits: alphabet `.`=0 (any non-alphanumeric), `0-9`=1..10, `A-Z`
  * (case-folded)=11..36; 37^3 = 50653 < 2^16.
  *
  * Extraction (whole-word mode) is equivalent to: for each maximal run of
  * gram-chars w, emit all 3-char windows of "." + w + "." (never a window of
  * two leading dots). Partial mode emits only fully-interior windows of each
  * term (no dot in any position) and does not space-wrap.
  */
object Gram {
  final val Base: Int = 37
  final val Base2: Int = Base * Base // 1369
  final val Base3: Int = Base * Base * Base // 50653
  final val GramZero: Int = 1
  final val GramA: Int = 11

  /** fulltext.go:256-265 — char class to base-37 digit; 0 for non-alnum. */
  @inline def gramForChar(c: Int): Int =
    if (c >= '0' && c <= '9') c - '0' + GramZero
    else if (c >= 'A' && c <= 'Z') c - 'A' + GramA
    else if (c >= 'a' && c <= 'z') c - 'a' + GramA
    else 0

  /** fulltext.go:247-254 — digit to display char. */
  @inline def charForGram(g: Int): Char =
    if (g == 0) '.'
    else if (g < GramA) ('0' + (g - GramZero)).toChar
    else ('A' + (g - GramA)).toChar

  /** fulltext.go:240-245 — gram code to 3-char display string. */
  def gramString(g: Int): String = {
    val b = new Array[Char](3)
    b(0) = charForGram((g / Base2) % Base)
    b(1) = charForGram((g / Base) % Base)
    b(2) = charForGram(g % Base)
    new String(b)
  }

  /** fulltext.go:267-282 — parse a 3-char gram literal (e.g. ".TH"). */
  def gramForString(s: String): Int = {
    require(s.length == 3, s"Unicode gram is not a trigram: '$s'")
    var grm = 0
    var i = 0
    while (i < 3) {
      val c = gramForChar(s.charAt(i))
      if (!(grm % Base == 0 && c == 0)) {
        if (grm % Base == 0) grm = c
        else grm = ((grm * Base) + c) % Base3
      }
      i += 1
    }
    grm
  }

  /** fulltext.go:223-238 — sliding gram extraction into a set.
    * Iterates Unicode code points like Go's `for range` over a string.
    */
  def addGrams(partial: Boolean, str: String, result: mutable.Set[Int]): Unit = {
    var grm = 0
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val v = gramForChar(cp)
      // don't append more than one space
      if (!(v == 0 && grm % Base == 0)) {
        if (grm % Base == 0) grm = v // starting a word
        else grm = ((grm * Base) + v) % Base3
        val interiorOnlySkip = partial &&
          (grm / Base2 == 0 || (grm / Base) % Base == 0 || grm % Base == 0)
        if (!interiorOnlySkip && grm >= Base) result += grm
      }
    }
  }

  /** fulltext.go:210-220 — gram set for one or more terms. Whole-word mode
    * wraps the joined terms in single spaces so boundary grams are emitted.
    */
  def grams(partial: Boolean, args: Seq[String]): Set[Int] = {
    val result = mutable.Set.empty[Int]
    if (partial) args.foreach(addGrams(partial = true, _, result))
    else addGrams(partial = false, " " + args.mkString(" ") + " ", result)
    result.toSet
  }

  def grams(text: String): Set[Int] = grams(partial = false, Seq(text))

  /** Sorted gram codes — deterministic order for stable downstream plans.
    * Bitset-backed (the gram space is only 37^3 = 50653): no boxing, no
    * hash table, output already sorted — this is the index build's hottest
    * allocation path.
    */
  def gramsSorted(partial: Boolean, args: Seq[String]): Array[Int] = {
    // thread-local workspace: a fresh 6.3 KB bitset per chunk would be the
    // build's single largest allocation (tokenize runs per chunk in three
    // stages); the drain loop below re-zeroes every word, so the buffer is
    // always clean on entry. Executor task threads never share a call.
    val bits = tlBits.get()
    var count = 0
    def add(str: String): Unit = {
      var grm = 0
      var i = 0
      val n = str.length
      while (i < n) {
        val cp = str.codePointAt(i)
        i += Character.charCount(cp)
        val v = gramForChar(cp)
        if (!(v == 0 && grm % Base == 0)) {
          if (grm % Base == 0) grm = v
          else grm = ((grm * Base) + v) % Base3
          val interiorOnlySkip = partial &&
            (grm / Base2 == 0 || (grm / Base) % Base == 0 || grm % Base == 0)
          if (!interiorOnlySkip && grm >= Base) {
            val w = grm >> 6
            val m = 1L << (grm & 63)
            if ((bits(w) & m) == 0) { bits(w) |= m; count += 1 }
          }
        }
      }
    }
    if (partial) args.foreach(add) else add(" " + args.mkString(" ") + " ")
    val out = new Array[Int](count)
    var w = 0
    var o = 0
    while (w < bits.length) {
      var b = bits(w)
      bits(w) = 0L // leave the shared workspace clean for the next call
      while (b != 0) {
        val t = java.lang.Long.numberOfTrailingZeros(b)
        out(o) = (w << 6) + t
        o += 1
        b &= b - 1
      }
      w += 1
    }
    out
  }

  private val tlBits = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long]((Base3 >> 6) + 1)
  }

  /** Distinct-gram COUNT of one or more terms — [[gramsSorted]] without the
    * output array. The index build's chunk-stats stage only needs
    * `n_grams = gramsSorted(...).length`; building (and then discarding) a
    * ~50-130-int array per chunk was its largest remaining allocation. Uses
    * the same thread-local bitset workspace; the workspace is re-zeroed
    * wholesale on exit (a 792-long fill, cheaper than a drain walk).
    */
  def gramCount(partial: Boolean, args: Seq[String]): Int = {
    val bits = tlBits.get()
    var count = 0
    def add(str: String): Unit = {
      var grm = 0
      var i = 0
      val n = str.length
      while (i < n) {
        val cp = str.codePointAt(i)
        i += Character.charCount(cp)
        val v = gramForChar(cp)
        if (!(v == 0 && grm % Base == 0)) {
          if (grm % Base == 0) grm = v
          else grm = ((grm * Base) + v) % Base3
          val interiorOnlySkip = partial &&
            (grm / Base2 == 0 || (grm / Base) % Base == 0 || grm % Base == 0)
          if (!interiorOnlySkip && grm >= Base) {
            val w = grm >> 6
            val m = 1L << (grm & 63)
            if ((bits(w) & m) == 0) { bits(w) |= m; count += 1 }
          }
        }
      }
    }
    if (partial) args.foreach(add) else add(" " + args.mkString(" ") + " ")
    java.util.Arrays.fill(bits, 0L) // leave the shared workspace clean
    count
  }

  /** Parse one gram literal in the reference's three CLI forms (gramFor
    * fts-lmdb.go:780-793): 4 hex digits (`-gx`, two big-endian bytes),
    * decimal (`-gd`), or the default 3-char unicode string (".TH").
    */
  def parseGram(s: String, hex: Boolean = false, dec: Boolean = false): Int =
    if (hex) (Integer.parseInt(s.substring(0, 2), 16) << 8) |
      Integer.parseInt(s.substring(2, 4), 16)
    else if (dec) s.toInt
    else gramForString(s)

  /** The reference's word-boundary char class (fts-lmdb.go:1428-1430). */
  @inline def isGramChar(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
}
