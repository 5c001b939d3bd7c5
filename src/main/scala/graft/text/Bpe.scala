package graft.text

import scala.collection.mutable

/** Byte-pair encoding trainer + encoder (public algorithm: Sennrich et al.
  * 2016, the same scheme behind the HF tokenizers the reference loads in
  * tokens/tokenizer.py:23-475 and tokens/counter.py:25-29). The reference
  * downloads pretrained vocabularies from the HF hub (no egress here); this
  * trains a real BPE from the corpus itself so the DocumentTokenizer /
  * TokensCounter paths exercise genuine multi-symbol merges instead of the
  * hash-bucket stand-in.
  *
  * Determinism: merge selection breaks frequency ties lexicographically;
  * ids are assigned base-symbols-sorted-first then merges in train order —
  * the same corpus always yields the same model.
  */
object Bpe {

  val EndOfWord = "</w>"

  final case class Model(merges: Vector[(String, String)], vocab: Map[String, Int]) {
    val idToSymbol: Map[Int, String] = vocab.map(_.swap)
    /** merge rank lookup: lower = applied first */
    val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Train `numMerges` merges over a word→frequency table. */
  def train(wordFreqs: Map[String, Long], numMerges: Int): Model = {
    // words as symbol sequences: chars + end-of-word marker
    var words: Vector[(Vector[String], Long)] = wordFreqs.toVector.sortBy(_._1).map {
      case (w, f) => (w.map(_.toString).toVector :+ EndOfWord, f)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    while (it < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (pairCounts.isEmpty) it = numMerges
      else {
        val (best, cnt) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < 2) it = numMerges // nothing left worth merging
        else {
          merges += best
          val merged = best._1 + best._2
          words = words.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }
          it += 1
        }
      }
    }
    // vocab: sorted base symbols first, then merge outputs in train order
    val base = wordFreqs.keys.flatMap(_.map(_.toString)).toSeq.distinct.sorted :+ EndOfWord
    val symbols = base ++ merges.map { case (a, b) => a + b }
    Model(merges.toVector, symbols.distinct.zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap)
    // id 0 stays reserved for EOS/doc separator (DocTokenizer contract)
  }

  /** Encode one word by applying merges lowest-rank-first (standard BPE). */
  def encodeWord(word: String, model: Model): Array[Int] = {
    var syms = (word.map(_.toString) :+ EndOfWord).toArray
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = model.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val merged = syms(bestIdx) + syms(bestIdx + 1)
        syms = (syms.take(bestIdx) :+ merged) ++ syms.drop(bestIdx + 2)
      }
    }
    // unknown symbols (chars unseen at train time) fall back to id 0-free
    // skipping — callers train on the same corpus so this is a safety net
    syms.flatMap(s => model.vocab.get(s))
  }

  /** Encode a text: per-word BPE ids, terminated by EOS id 0. */
  def encode(text: String, model: Model): Array[Int] = {
    val words = Tokenizer.words(text)
    val out = mutable.ArrayBuffer.empty[Int]
    for (w <- words) out ++= encodeWord(w, model)
    out += 0
    out.toArray
  }

  /** Inverse of encode: ids → words (EndOfWord marks boundaries) → text. */
  def decode(ids: Array[Int], model: Model): String = {
    val sb = new StringBuilder
    val word = new StringBuilder
    for (id <- ids if id != 0) {
      val sym = model.idToSymbol.getOrElse(id, "")
      if (sym.endsWith(EndOfWord)) {
        word.append(sym.dropRight(EndOfWord.length))
        if (sb.nonEmpty) sb.append(' ')
        sb.append(word)
        word.clear()
      } else word.append(sym)
    }
    if (word.nonEmpty) { if (sb.nonEmpty) sb.append(' '); sb.append(word) }
    sb.toString
  }

  /** Load a pretrained model from GPT-2/subword-nmt-format files: a flat
    * vocab.json ({"token": id, ...}) and a merges.txt ("#version" header +
    * one "left right" pair per line, applied in file order). This is the
    * seam the reference fills from the HF hub (tokens/counter.py:25-29 —
    * egress-blocked here); the committed /graft/bpe fixture is synthetic
    * self-authored content in the same file format, using the Sennrich
    * end-of-word marker convention this encoder operates on. */
  /** Single-pass JSON string unescape (handles \\ before \n correctly and
    * \uXXXX including surrogate pairs — GPT-2 vocab.json files are
    * ASCII-escaped, e.g. every "Ġ" is Ġ). */
  private[text] def unescapeJson(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'u' if i + 5 < s.length &&
              s.substring(i + 2, i + 6).forall(c =>
                (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')) =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'u' =>
            // malformed \uXXXX (non-hex or truncated): keep the escape
            // literally instead of crashing the whole model load
            sb.append('\\').append('u'); i += 2
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def loadPretrained(vocabJson: String, mergesTxt: String): Model = {
    val entry = java.util.regex.Pattern.compile(
      "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(\\d+)")
    val m = entry.matcher(vocabJson)
    val vocab = mutable.HashMap.empty[String, Int]
    while (m.find()) {
      vocab.put(unescapeJson(m.group(1)), m.group(2).toInt)
    }
    // only the FIRST line may be a "#version" header (the GPT-2/subword-nmt
    // convention) — a blanket '#' filter would drop legitimate merges whose
    // left symbol starts with '#' (e.g. byte-level "# #") and silently shift
    // every later merge's priority
    val lines = mergesTxt.split("\n")
    val body =
      if (lines.nonEmpty && lines(0).startsWith("#version")) lines.drop(1) else lines
    val merges = body.iterator
      .map(_.trim) // tolerate stray edge whitespace/CR (symbols never carry it)
      .filter(_.nonEmpty)
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0, s"malformed merges line: $l")
        (l.substring(0, sp), l.substring(sp + 1))
      }
      .toVector
    Model(merges, vocab.toMap)
  }

  /** The committed synthetic fixture model (see loadPretrained). */
  lazy val fixtureModel: Model =
    loadPretrained(Resources.readUtf8("/graft/bpe/vocab.json"),
      Resources.readUtf8("/graft/bpe/merges.txt"))

  /** Train from an iterator of texts (driver-side; the word-frequency table
    * for a corpus-wide vocab comes from a distributed groupBy upstream). */
  def trainFromTexts(texts: Iterator[String], numMerges: Int): Model = {
    val freqs = mutable.HashMap.empty[String, Long]
    for (t <- texts; w <- Tokenizer.words(t))
      freqs.updateWith(w)(c => Some(c.getOrElse(0L) + 1))
    train(freqs.toMap, numMerges)
  }
}
