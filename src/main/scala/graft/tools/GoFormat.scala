package graft.tools

/** Reference display-formatting ops (SURVEY §2.7 F3/F4).
  *
  * F3 `escape` (fts-lmdb.go:1423-1426): Go `strconv.Quote` minus the outer
  * quotes. ASCII behavior is byte-exact; for non-ASCII code points Go's
  * `unicode.IsPrint` tables are approximated with the matching Java
  * category classes (L/M/N/P/S printable, everything else `\u`-escaped) —
  * the parity corpus is ASCII, so the approximation is outside the tested
  * surface and documented here as the one deliberate deviation.
  *
  * F4 `printf` (fts-lmdb.go:1410-1421): print the format string literally
  * unless it contains a real verb. The reference scans with
  * `str = str[i+2:]` slicing past each `%%`, so when a real verb follows a
  * `%%` the already-scanned prefix is DROPPED from the Printf call, and a
  * literal-only format prints only the tail after its last `%%`. That
  * slicing quirk is replicated verbatim — group start/end formats go
  * through it (fts-lmdb.go:401,426).
  *
  * `format` interprets the Go format-verb subset the reference's own
  * formats use (fts-lmdb.go:56-62): `%s %v %d %f %x` with optional
  * `[ARGNUM]` explicit indexing (which, like Go, re-seats the implicit
  * cursor) and width/precision/flag passthrough. Go's `%f` defaults to 6
  * decimals, same as Java's.
  */
object GoFormat {

  /** Go unicode.IsPrint: ASCII 0x20-0x7E; otherwise categories L, M, N, P,
    * S (spaces other than ASCII space are NOT printable).
    */
  private def isPrint(cp: Int): Boolean =
    if (cp < 0x80) cp >= 0x20 && cp <= 0x7e
    else Character.getType(cp) match {
      case Character.UPPERCASE_LETTER | Character.LOWERCASE_LETTER |
           Character.TITLECASE_LETTER | Character.MODIFIER_LETTER |
           Character.OTHER_LETTER | Character.NON_SPACING_MARK |
           Character.ENCLOSING_MARK | Character.COMBINING_SPACING_MARK |
           Character.DECIMAL_DIGIT_NUMBER | Character.LETTER_NUMBER |
           Character.OTHER_NUMBER | Character.DASH_PUNCTUATION |
           Character.START_PUNCTUATION | Character.END_PUNCTUATION |
           Character.CONNECTOR_PUNCTUATION | Character.OTHER_PUNCTUATION |
           Character.MATH_SYMBOL | Character.CURRENCY_SYMBOL |
           Character.MODIFIER_SYMBOL | Character.OTHER_SYMBOL |
           Character.INITIAL_QUOTE_PUNCTUATION |
           Character.FINAL_QUOTE_PUNCTUATION => true
      case _ => false
    }

  /** F3: strconv.Quote(s) minus the outer quotes. */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == '"') sb.append("\\\"")
      else if (cp == '\\') sb.append("\\\\")
      else if (isPrint(cp)) sb.appendAll(Character.toChars(cp))
      else cp match {
        case 0x07 => sb.append("\\a")
        case 0x08 => sb.append("\\b")
        case 0x0c => sb.append("\\f")
        case 0x0a => sb.append("\\n")
        case 0x0d => sb.append("\\r")
        case 0x09 => sb.append("\\t")
        case 0x0b => sb.append("\\v")
        case _ =>
          if (cp < 0x20 || cp == 0x7f) sb.append(f"\\x$cp%02x")
          else if (cp < 0x10000) sb.append(f"\\u$cp%04x")
          else sb.append(f"\\U$cp%08x")
      }
    }
    sb.toString
  }

  private def asLong(a: Any): Long = a match {
    case n: Long => n
    case n: Int => n.toLong
    case n: Short => n.toLong
    case n: Byte => n.toLong
    case n: Double => n.toLong
    case n: Float => n.toLong
    case s: String => s.toLong
    case null => 0L
  }

  private def asDouble(a: Any): Double = a match {
    case n: Double => n
    case n: Float => n.toDouble
    case n: Long => n.toDouble
    case n: Int => n.toDouble
    case s: String => s.toDouble
    case null => 0.0
  }

  /** Go Printf over the reference's verb subset. Unknown verbs render as
    * Go does for bad input: `%!<verb>(value)`.
    */
  def format(fmt: String, args: Any*): String = {
    val sb = new StringBuilder(fmt.length + 16)
    var i = 0
    var argIdx = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%') { sb.append(c); i += 1 }
      else if (i + 1 < fmt.length && fmt.charAt(i + 1) == '%') {
        sb.append('%'); i += 2
      } else if (i + 1 >= fmt.length) { sb.append('%'); i += 1 }
      else {
        var j = i + 1
        var explicitIdx = false
        val prevArgIdx = argIdx
        // Go's doPrintf scan order (fmt/print.go): flags, [N], width, '.',
        // [N], precision, [N], verb. The strict order (vs a symmetric
        // two-sided scan) accepts `%[2]5d` and `%4.1[4]f` (fuzzyLineFormat,
        // fts-lmdb.go:58) while making malformed forms like `%4[2].1f`
        // fall out as bad-verb markers the way Go renders them — Go stops
        // at the '.' after a post-width index and treats it as the verb.
        val flagStart = j
        while (j < fmt.length && "+- #0".contains(fmt.charAt(j))) j += 1
        val flags = fmt.substring(flagStart, j)
        def argNumber(): Boolean =
          if (j < fmt.length && fmt.charAt(j) == '[') {
            val close = fmt.indexOf(']', j)
            if (close > j + 1 && fmt.substring(j + 1, close).forall(_.isDigit)) {
              argIdx = fmt.substring(j + 1, close).toInt - 1
              explicitIdx = true
              j = close + 1
              true
            } else false
          } else false
        var afterIndex = argNumber()
        val wStart = j
        while (j < fmt.length && fmt.charAt(j).isDigit) j += 1
        val width = fmt.substring(wStart, j)
        var precPart = ""
        if (j < fmt.length && fmt.charAt(j) == '.') {
          j += 1
          afterIndex = argNumber()
          val pStart = j
          while (j < fmt.length && fmt.charAt(j).isDigit) j += 1
          // Go: a '.' with no digits means precision 0
          precPart = "." + (if (pStart == j) "0" else fmt.substring(pStart, j))
        }
        if (!afterIndex) argNumber()
        val spec = flags + width + precPart
        if (j >= fmt.length) { sb.append(fmt.substring(i)); i = fmt.length }
        else {
          val verb = fmt.charAt(j)
          val missing = argIdx < 0 || argIdx >= args.length
          val a = if (!missing) args(argIdx) else null
          val badExplicit = missing && explicitIdx
          // Go does not apply an out-of-range explicit index: the cursor
          // keeps its previous value, so following implicit verbs print
          // the real args (fmt's argNumber leaves argNum on BADINDEX)
          argIdx = if (badExplicit) prevArgIdx else argIdx + 1
          if (missing)
            // Go: implicit cursor past the args prints %!<verb>(MISSING);
            // an explicit [N] out of range prints %!<verb>(BADINDEX)
            sb.append(if (explicitIdx) s"%!$verb(BADINDEX)" else s"%!$verb(MISSING)")
          else verb match {
            case 's' | 'v' => sb.append(String.format(s"%${spec}s", String.valueOf(a)))
            case 'd' => sb.append(String.format(s"%${spec}d", java.lang.Long.valueOf(asLong(a))))
            case 'f' => sb.append(String.format(s"%${spec}f", java.lang.Double.valueOf(asDouble(a))))
            case 'x' => sb.append(String.format(s"%${spec}x", java.lang.Long.valueOf(asLong(a))))
            case other => sb.append(s"%!$other(${String.valueOf(a)})")
          }
          i = j + 1
        }
      }
    }
    sb.toString
  }

  /** F4: the reference's guarded printf, slicing quirk included
    * (fts-lmdb.go:1410-1421). Returns what the reference would print.
    */
  def printfGuarded(fmt: String, args: Any*): String = {
    var str = fmt
    while (true) {
      val i = str.indexOf('%')
      if (i == -1 || i == str.length - 1) return str
      if (str.charAt(i + 1) != '%') return format(str, args: _*)
      str = str.substring(i + 2)
    }
    str // unreachable
  }
}
