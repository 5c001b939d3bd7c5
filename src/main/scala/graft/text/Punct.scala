package graft.text

/** Punctuation tables ported verbatim from the reference's
  * utils/text.py:13-182 (PUNCTUATION incl. control chars 0-8,11-31,127-159)
  * and utils/text.py:19-179 (TERMINAL_PUNCTUATION, 159 marks incl. astral
  * plane, stored as surrogate-pair strings). */
object Punct {
  val PUNCTUATION: String = "!/\u2014\u201d:\uff05\uff11\u3008&(\u3001\u2501\\\u3010#%\u300c\u300d\uff0c\u3011\uff1b+^]~\u201c\u300a\u201e';\u2019{|\u2236\u00b4[=-`*\uff0e\uff08\u2013\uff1f\uff01\uff1a$\uff5e\u00ab\u3009,><\u300b)?\uff09\u3002\u2026@_.\"}\u25ba\u00bb\u0000\u0001\u0002\u0003\u0004\u0005\u0006\u0007\u0008\u000b\u000c\u000d\u000e\u000f\u0010\u0011\u0012\u0013\u0014\u0015\u0016\u0017\u0018\u0019\u001a\u001b\u001c\u001d\u001e\u001f\u007f\u0080\u0081\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008a\u008b\u008c\u008d\u008e\u008f\u0090\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099\u009a\u009b\u009c\u009d\u009e\u009f"

  /** Terminal punctuation marks; multi-char entries are surrogate pairs. */
  val TERMINAL_PUNCTUATION: Seq[String] = Seq("!", ".", "?", "\u0589", "\u061d", "\u061e", "\u061f", "\u06d4", "\u0700", "\u0701", "\u0702", "\u07f9", "\u0837", "\u0839", "\u083d", "\u083e", "\u0964", "\u0965", "\u104a", "\u104b", "\u1362", "\u1367", "\u1368", "\u166e", "\u1735", "\u1736", "\u17d4", "\u17d5", "\u17d6", "\u17d9", "\u17da", "\u1803", "\u1809", "\u1944", "\u1945", "\u1aa8", "\u1aa9", "\u1aaa", "\u1aab", "\u1b5a", "\u1b5b", "\u1b5e", "\u1b5f", "\u1b7d", "\u1b7e", "\u1c3b", "\u1c3c", "\u1c7e", "\u1c7f", "\u203c", "\u203d", "\u2047", "\u2048", "\u2049", "\u2e2e", "\u2e3c", "\u2e53", "\u2e54", "\u3002", "\ua4ff", "\ua60e", "\ua60f", "\ua6f3", "\ua6f7", "\ua876", "\ua877", "\ua8ce", "\ua8cf", "\ua92f", "\ua9c8", "\ua9c9", "\uaa5d", "\uaa5e", "\uaa5f", "\uaaf0", "\uaaf1", "\uabeb", "\ufe52", "\ufe56", "\ufe57", "\uff01", "\uff0e", "\uff1f", "\uff61", "\ud802\ude56", "\ud802\ude57", "\ud803\udf55", "\ud803\udf56", "\ud803\udf57", "\ud803\udf58", "\ud803\udf59", "\ud803\udf86", "\ud803\udf87", "\ud803\udf88", "\ud803\udf89", "\ud804\udc47", "\ud804\udc48", "\ud804\udcbe", "\ud804\udcbf", "\ud804\udcc0", "\ud804\udcc1", "\ud804\udd41", "\ud804\udd42", "\ud804\udd43", "\ud804\uddc5", "\ud804\uddc6", "\ud804\uddcd", "\ud804\uddde", "\ud804\udddf", "\ud804\ude38", "\ud804\ude39", "\ud804\ude3b", "\ud804\ude3c", "\ud804\udea9", "\ud805\udc4b", "\ud805\udc4c", "\ud805\uddc2", "\ud805\uddc3", "\ud805\uddc9", "\ud805\uddca", "\ud805\uddcb", "\ud805\uddcc", "\ud805\uddcd", "\ud805\uddce", "\ud805\uddcf", "\ud805\uddd0", "\ud805\uddd1", "\ud805\uddd2", "\ud805\uddd3", "\ud805\uddd4", "\ud805\uddd5", "\ud805\uddd6", "\ud805\uddd7", "\ud805\ude41", "\ud805\ude42", "\ud805\udf3c", "\ud805\udf3d", "\ud805\udf3e", "\ud806\udd44", "\ud806\udd46", "\ud806\ude42", "\ud806\ude43", "\ud806\ude9b", "\ud806\ude9c", "\ud807\udc41", "\ud807\udc42", "\ud807\udef7", "\ud807\udef8", "\ud807\udf43", "\ud807\udf44", "\ud81a\ude6e", "\ud81a\ude6f", "\ud81a\udef5", "\ud81a\udf37", "\ud81a\udf38", "\ud81a\udf44", "\ud81b\ude98", "\ud82f\udc9f", "\ud836\ude88")

  /** Code points (as Int) of PUNCTUATION + TERMINAL_PUNCTUATION, mirroring
    * PUNCTUATION_SET = set(PUNCTUATION) | TERMINAL_PUNCTUATION. */
  val PUNCTUATION_SET: Set[Int] = {
    val a = PUNCTUATION.map(_.toInt).toSet // all BMP, no astral in PUNCTUATION
    val b = TERMINAL_PUNCTUATION.map(s => s.codePointAt(0)).toSet
    a ++ b
  }

  // r8 hot-path form: the Set[Int] boxes every lookup and this check runs
  // per char of every word in nonSymbolWords — a code-point BitSet answers
  // it with one word load. Contents identical to PUNCTUATION_SET.
  private val PunctBits: java.util.BitSet = {
    val bs = new java.util.BitSet(0x110000)
    PUNCTUATION_SET.foreach(bs.set)
    bs
  }

  /** Code points of TERMINAL_PUNCTUATION only (every entry is one code
    * point — BMP char or surrogate pair), as a BitSet: lets line-ending
    * checks test the final code point instead of running 159 endsWith
    * scans per line (FineWebQualityFilter). */
  val TerminalBits: java.util.BitSet = {
    val bs = new java.util.BitSet(0x110000)
    TERMINAL_PUNCTUATION.foreach(s => bs.set(s.codePointAt(0)))
    bs
  }

  def isPunct(cp: Int): Boolean = PunctBits.get(cp)
}
