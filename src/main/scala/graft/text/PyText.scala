package graft.text

import scala.collection.mutable.ArrayBuffer

/** CPython-compatible string primitives. The reference's filters are defined
  * in terms of `str.splitlines`, `str.strip`, `str.isspace` etc., whose
  * semantics differ from the JVM defaults (e.g. Python treats U+0085 and
  * U+001C-1E as line breaks, and NBSP as whitespace). Ported so that per-doc
  * keep/drop labels match the reference bit-for-bit.
  */
object PyText {

  /** Python str.isspace per char: ASCII/Latin-1 WS set CPython special-cases
    * plus Unicode categories Zs/Zl/Zp. */
  def pyIsSpace(c: Char): Boolean = {
    val cp = c.toInt
    // ASCII fast path (r8): every tokenize/strip loop calls this per char,
    // and the common case is an ASCII letter — answer it with two compares
    // instead of falling into Character.getType's Unicode tables. No char
    // below 0xA0 is a SPACE/LINE/PARAGRAPH_SEPARATOR except those
    // enumerated here (0x85 NEL included), so the fast path is exact.
    if (cp < 0xa0)
      (cp >= 0x09 && cp <= 0x0d) || (cp >= 0x1c && cp <= 0x20) || cp == 0x85
    else {
      val t = Character.getType(c)
      t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
      t == Character.PARAGRAPH_SEPARATOR
    }
  }

  /** Python str.strip() (no args): strip leading/trailing pyIsSpace chars. */
  def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && pyIsSpace(s.charAt(i))) i += 1
    while (j > i && pyIsSpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  def pyLStrip(s: String): String = {
    var i = 0
    while (i < s.length && pyIsSpace(s.charAt(i))) i += 1
    s.substring(i)
  }

  def pyRStrip(s: String): String = {
    var j = s.length
    while (j > 0 && pyIsSpace(s.charAt(j - 1))) j -= 1
    s.substring(0, j)
  }

  /** Python str.lstrip(chars): strip leading chars in the given set. */
  def pyLStrip(s: String, chars: String): String = {
    var i = 0
    while (i < s.length && chars.indexOf(s.charAt(i)) >= 0) i += 1
    s.substring(i)
  }

  /** Is `c` a Python-universal line terminator (str.splitlines set)?
    * \n \r \v \f \x1c \x1d \x1e \x85 U+2028 U+2029 */
  def isLineBreak(c: Char): Boolean = {
    val cp = c.toInt
    cp == 0x0a || cp == 0x0d || cp == 0x0b || cp == 0x0c ||
    cp == 0x1c || cp == 0x1d || cp == 0x1e || cp == 0x85 ||
    cp == 0x2028 || cp == 0x2029
  }

  /** Python str.splitlines(): splits on the universal-newline set, treats
    * \r\n as one break, no trailing empty element. */
  def splitLines(s: String): Array[String] = {
    val out = new ArrayBuffer[String]()
    var start = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isLineBreak(c)) {
        out += s.substring(start, i)
        if (c == '\r' && i + 1 < n && s.charAt(i + 1) == '\n') i += 1
        i += 1
        start = i
      } else i += 1
    }
    if (start < n) out += s.substring(start)
    out.toArray
  }

  /** Python s.split() (no args): split on runs of whitespace, drop empties. */
  def pySplit(s: String): Array[String] = {
    // raw growable array (same shape as Tokenizer.words, r8): this runs per
    // doc in the LID hot path — no ArrayBuffer bookkeeping, no final
    // toArray copy. Token boundaries identical to the ArrayBuffer form.
    val n = s.length
    var out = new Array[String]((n >> 3) + 4)
    var m = 0
    var i = 0
    while (i < n) {
      while (i < n && pyIsSpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !pyIsSpace(s.charAt(i))) i += 1
      if (i > start) {
        if (m == out.length) out = java.util.Arrays.copyOf(out, out.length << 1)
        out(m) = s.substring(start, i)
        m += 1
      }
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** Python str.lower() — locale-independent full-string lowercase. */
  def pyLower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** count of non-overlapping occurrences of sub (Python str.count). */
  def pyCount(s: String, sub: String): Int = {
    if (sub.isEmpty) return s.length + 1
    var count = 0
    var idx = s.indexOf(sub)
    while (idx >= 0) { count += 1; idx = s.indexOf(sub, idx + sub.length) }
    count
  }
}
