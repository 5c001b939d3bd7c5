package graft.text

import scala.collection.mutable.ArrayBuffer

/** Deterministic word / sentence tokenizer.
  *
  * The reference (fork) routes *every* language through a jieba-backed spaCy
  * tokenizer (utils/word_tokenizers.py:106-115 hard-codes language="zh" +
  * segmenter="jieba"). On Latin-script text jieba's behaviour reduces to:
  *   - maximal runs of [A-Za-z0-9] (plus decimal numbers "12.5") are one
  *     token (jieba finalseg re_skip = `\d+\.\d+|[a-zA-Z0-9]+`),
  *   - every other non-space char is its own single-char token,
  *   - whitespace tokens are dropped (strip_strings, word_tokenizers.py:15).
  * On CJK text jieba segments with a dictionary DAG + max-prob route plus
  * a B/M/E/S HMM over unknown runs; CJK runs here go through the same
  * algorithms over a committed frequency dict and a dict-derived HMM
  * (ZhSegmenter). Divergence from the real jieba: different dictionary and
  * a dict-derived (not corpus-trained) emission model — cross-checked
  * against an independent Python port in tools/zh_diff.py.
  *
  * This is a pure function so it can run inside whole-stage-codegen-adjacent
  * UDFs and mapPartitions without any per-row model state.
  */
object Tokenizer {

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  @inline private def isCjk(cp: Int): Boolean =
    (cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf)

  /** Tokenize into words (jieba-on-Latin approximation, see scaladoc).
    * r8 hot-path form: raw growable Array[String] instead of ArrayBuffer
    * (this runs for every doc in every text operator — the buffer's bounds/
    * size bookkeeping and final toArray copy are measurable at that rate).
    * Token boundaries are identical to the pre-r8 ArrayBuffer version. */
  def words(text: String): Array[String] = {
    val n = text.length
    var out = new Array[String]((n >> 3) + 4)
    var m = 0
    def push(s: String): Unit = {
      if (m == out.length) out = java.util.Arrays.copyOf(out, out.length << 1)
      out(m) = s
      m += 1
    }
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (PyText.pyIsSpace(c)) {
        i += 1
      } else if (isAlnum(c)) {
        val start = i
        while (i < n && isAlnum(text.charAt(i))) i += 1
        // decimal join: digits '.' digits → one token (jieba re_skip)
        if (i < n && text.charAt(i) == '.' && i > start &&
            isDigit(text.charAt(i - 1)) && i + 1 < n && isDigit(text.charAt(i + 1)) &&
            allDigits(text, start, i)) {
          i += 1
          while (i < n && isDigit(text.charAt(i))) i += 1
        }
        push(text.substring(start, i))
      } else if (isCjk(c)) {
        // dictionary segmentation of the whole CJK run (jieba DAG/max-prob
        // over the committed dict + finalseg-style HMM on unknown runs —
        // see ZhSegmenter)
        val start = i
        while (i < n && isCjk(text.charAt(i))) i += 1
        val cut = ZhSegmenter.cut(text.substring(start, i))
        var j = 0
        while (j < cut.length) { push(cut(j)); j += 1 }
      } else if (Character.isHighSurrogate(c) && i + 1 < n &&
                 Character.isLowSurrogate(text.charAt(i + 1))) {
        push(text.substring(i, i + 2))
        i += 2
      } else {
        push(String.valueOf(c))
        i += 1
      }
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** words(text).length without materializing the tokens — the hot path
    * for the native WordCountExpression (codegen calls this directly).
    * Must stay exactly equivalent to words(); the equivalence is
    * property-tested across Latin/CJK/decimal/surrogate inputs. */
  def wordCount(text: String): Int = {
    var count = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (PyText.pyIsSpace(c)) {
        i += 1
      } else if (isAlnum(c)) {
        val start = i
        while (i < n && isAlnum(text.charAt(i))) i += 1
        if (i < n && text.charAt(i) == '.' && i > start &&
            isDigit(text.charAt(i - 1)) && i + 1 < n && isDigit(text.charAt(i + 1)) &&
            allDigits(text, start, i)) {
          i += 1
          while (i < n && isDigit(text.charAt(i))) i += 1
        }
        count += 1
      } else if (isCjk(c)) {
        val start = i
        while (i < n && isCjk(text.charAt(i))) i += 1
        count += ZhSegmenter.cut(text.substring(start, i)).length
      } else if (Character.isHighSurrogate(c) && i + 1 < n &&
                 Character.isLowSurrogate(text.charAt(i + 1))) {
        count += 1
        i += 2
      } else {
        count += 1
        i += 1
      }
    }
    count
  }

  private def allDigits(s: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) { if (!isDigit(s.charAt(i))) return false; i += 1 }
    true
  }

  /** True when the word has at least one char outside PUNCTUATION_SET. */
  @inline private[graft] def hasNonSymbolChar(w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      if (!Punct.isPunct(w.charAt(i).toInt)) return true
      i += 1
    }
    false
  }

  /** Words containing at least one char outside PUNCTUATION_SET
    * (gopher_quality_filter.py:75). */
  def nonSymbolWords(ws: Array[String]): Array[String] =
    ws.filter(hasNonSymbolChar)

  /** Approximate sentence count: number of spaCy-sentencizer-style segments.
    * A boundary is a run of terminal punctuation [.!?…。！？] followed by
    * optional closing quotes/brackets then whitespace-or-end. Any trailing
    * text without terminal punctuation counts as one more sentence. */
  def sentenceCount(text: String): Int = {
    val t = PyText.pyStrip(text)
    if (t.isEmpty) return 0
    var count = 0
    var i = 0
    val n = t.length
    var sawContent = false
    while (i < n) {
      val c = t.charAt(i)
      if (isTerminal(c)) {
        while (i < n && (isTerminal(t.charAt(i)) || isCloser(t.charAt(i)))) i += 1
        if (sawContent) { count += 1; sawContent = false }
      } else {
        if (!PyText.pyIsSpace(c)) sawContent = true
        i += 1
      }
    }
    if (sawContent) count += 1
    math.max(count, 1)
  }

  /** Common abbreviations that end in '.' without ending a sentence —
    * a deterministic stand-in for a trained punkt/spaCy model (self-authored
    * list; single letters are guarded separately, which also covers the
    * trailing token of "e.g." / "i.e." / "et al."). */
  private val Abbrevs: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc", "fig",
    "gen", "col", "capt", "sgt", "rev", "hon", "approx", "dept", "est",
    "inc", "ltd", "co", "mt", "ave", "blvd", "rd", "univ", "assn", "bros",
    "vol", "pp", "para", "sec", "chap", "al", "ed", "eds", "op", "cit",
    // months/weekdays (entries that double as common English words —
    // may, mar, sun, sat, wed, no — are deliberately EXCLUDED: a
    // deterministic list can't disambiguate "the sun." the way a trained
    // punkt model does, and a false merge is worse than a false split)
    "jan", "feb", "apr", "jun", "jul", "aug", "sep", "sept", "oct", "nov",
    "dec", "mon", "tue", "tues", "thu", "thur", "thurs", "fri",
    // titles/honorifics and citation forms
    "gov", "atty", "supt", "det", "sen", "rep", "pres", "cmdr", "lt",
    "maj", "adm", "msgr", "messrs", "mme", "mmes", "cf", "viz", "resp",
    "corp", "dist", "div", "hwy", "apt", "ste", "acad", "assoc",
    "bldg", "intl", "natl", "mfg")

  /** True when the terminal run [runStart, runEnd) is a lone '.' whose
    * preceding letters-only token is a known abbreviation or single letter
    * (an initial, or the tail of "e.g."). */
  private def isAbbrevDot(text: String, runStart: Int, runEnd: Int): Boolean = {
    if (runEnd - runStart != 1 || text.charAt(runStart) != '.') return false
    var j = runStart - 1
    while (j >= 0 && Character.isLetter(text.charAt(j))) j -= 1
    val word = text.substring(j + 1, runStart)
    if (word.isEmpty) false
    else if (word.length == 1) true
    else Abbrevs.contains(word.toLowerCase)
  }

  /** True when [runStart, runEnd) is an ellipsis-like run: contains '…' or
    * two-plus '.' — punkt treats these as sentence-internal unless the next
    * token carries orthographic start-of-sentence evidence. */
  private def isEllipsisRun(text: String, runStart: Int, runEnd: Int): Boolean = {
    var dots = 0
    var i = runStart
    while (i < runEnd) {
      val c = text.charAt(i)
      if (c == '…') return true
      if (c == '.') dots += 1
      i += 1
    }
    dots >= 2
  }

  @inline private def isOpener(c: Char): Boolean =
    c == '"' || c == '\'' || c == '“' || c == '‘' || c == '(' ||
    c == '[' || c == '«' || c == '「' || c == '『'

  /** Deterministic sentence spans (trimmed [start, end) offsets into `text`):
    * a boundary is a run of terminal punctuation [.!?…。！？] + optional
    * closing quotes/brackets followed by whitespace-or-end, with an
    * abbreviation guard on lone '.' and a punkt-style orthographic guard on
    * ellipses ("…"/"..." continue the sentence unless the next token starts
    * with an uppercase letter or digit — nltk punkt's sentence-starter
    * evidence, deterministically approximated). A documented approximation
    * of the reference's nltk/spaCy sentence models (sentence_dedup.py:134).
    * NOTE: this is stricter than sentenceCount — the abbreviation,
    * whitespace-follows, and ellipsis guards are absent there
    * (sentenceCount mirrors the quality filters' simpler counting and must
    * stay diff-harness compatible), so the two can disagree on e.g.
    * "Dr. Smith arrived." */
  def sentenceSpans(text: String): Array[(Int, Int)] = {
    val bounds = new ArrayBuffer[Int]()
    val n = text.length
    var i = 0
    while (i < n) {
      if (isTerminal(text.charAt(i))) {
        val runStart = i
        var j = i
        while (j < n && isTerminal(text.charAt(j))) j += 1
        var k = j
        while (k < n && isCloser(text.charAt(k))) k += 1
        val boundary = (k >= n || PyText.pyIsSpace(text.charAt(k))) &&
          !isAbbrevDot(text, runStart, j) && {
            if (k < n && isEllipsisRun(text, runStart, j)) {
              // orthographic evidence check past whitespace and openers
              var m = k
              while (m < n && PyText.pyIsSpace(text.charAt(m))) m += 1
              while (m < n && isOpener(text.charAt(m))) m += 1
              m >= n || Character.isUpperCase(text.charAt(m)) ||
                Character.isDigit(text.charAt(m))
            } else true
          }
        if (boundary) bounds += k
        i = k
      } else i += 1
    }
    if (bounds.isEmpty || bounds.last != n) bounds += n
    val out = new ArrayBuffer[(Int, Int)]()
    var prev = 0
    for (b <- bounds) {
      var s = prev
      while (s < b && PyText.pyIsSpace(text.charAt(s))) s += 1
      var e = b
      while (e > s && PyText.pyIsSpace(text.charAt(e - 1))) e -= 1
      if (e > s) out += ((s, e))
      prev = b
    }
    out.toArray
  }

  /** Trimmed sentence texts (see sentenceSpans). */
  def sentences(text: String): Array[String] =
    sentenceSpans(text).map { case (s, e) => text.substring(s, e) }

  // GPT-2-style pre-tokenizer pattern (public, from the GPT-2 BPE spec):
  // contractions | optional-space letters | optional-space digits |
  // optional-space other | trailing/other whitespace
  private val BpeishPattern = java.util.regex.Pattern.compile(
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** BPE-ish token count: number of GPT-2 pre-tokenizer segments — a cheap
    * deterministic proxy for a trained BPE's token count. */
  def bpeishCount(text: String): Int = {
    val m = BpeishPattern.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  @inline private def isTerminal(c: Char): Boolean =
    c == '.' || c == '!' || c == '?' || c == '…' ||
    c == '。' || c == '！' || c == '？'

  @inline private def isCloser(c: Char): Boolean =
    c == '"' || c == '\'' || c == '”' || c == '’' || c == ')' ||
    c == ']' || c == '」' || c == '』'
}
