package graft.text

/** Dictionary-based Chinese word segmentation — jieba's published
  * DAG + max-probability algorithm (the fork routes every language through
  * a jieba-backed spaCy tokenizer, utils/word_tokenizers.py:106-125; jieba
  * itself is public MIT code and its core algorithm is:
  *   1. prefix dictionary: every word plus every proper prefix (freq 0);
  *   2. DAG: from each position, every dict word starting there;
  *   3. dynamic programming right-to-left maximizing Σ log(freq/total),
  *      ties broken toward the longer word (tuple max in jieba's calc);
  *   4. walk the route emitting words).
  *
  * The frequency dictionary is a self-authored table of common words
  * (src/main/resources/graft/zh_dict.tsv) — NOT jieba's dict.txt — so
  * segmentations match jieba's *algorithm* under this dict, not jieba's
  * shipped model. Unknown runs go through a B/M/E/S HMM Viterbi decoder
  * (jieba finalseg's published algorithm) whose emission model is DERIVED
  * deterministically from the committed dict rather than trained on a
  * corpus (see Hmm below) — a self-authored model of the public algorithm,
  * not jieba's prob_emit table. tools/zh_diff.py cross-checks this
  * implementation against an independent Python port over the same dict.
  */
object ZhSegmenter {

  /** (word → freq, word → POS tag) from the committed 3-column dict
    * (word \t freq \t jieba-style tag — the same format as jieba's
    * dict.txt, self-authored content). */
  lazy val (wordFreqs: Map[String, Long], posTags: Map[String, String]) = {
    val rows = Resources.readUtf8("/graft/zh_dict.tsv").linesIterator.flatMap { line =>
      val parts = line.split("\t")
      if (parts.length >= 2)
        Some((parts(0), parts(1).toLong, if (parts.length >= 3) parts(2) else "n"))
      else None
    }.toVector
    (rows.map(r => r._1 -> r._2).toMap, rows.map(r => r._1 -> r._3).toMap)
  }

  /** freq for every dict word; 0L marks prefix-only entries (jieba's FREQ). */
  lazy val (freq: Map[String, Long], logTotal: Double) = {
    val words = wordFreqs
    val withPrefixes = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- words) {
      withPrefixes.put(w, f)
      var i = 1
      while (i < w.length) {
        val p = w.substring(0, i)
        if (!withPrefixes.contains(p) && !words.contains(p)) withPrefixes.put(p, 0L)
        i += 1
      }
    }
    (withPrefixes.toMap, math.log(words.values.sum.toDouble))
  }

  /** log(freq/total) quantized to 1e-6: Java's and CPython's libm can differ
    * by 1 ulp, which could flip a max-prob tie — rounding makes the Scala
    * and Python (tools/zh_diff.py) routes bit-identical. */
  private def qlog(f: Long): Double =
    math.rint((math.log(if (f > 0L) f.toDouble else 1.0) - logTotal) * 1e6) / 1e6

  /** B/M/E/S HMM for unknown-word runs — jieba finalseg's published Viterbi
    * over states Begin/Middle/End/Single, with a self-authored model:
    *
    *   - start:  log 0.6 for B, log 0.4 for S; M and E are impossible (NEG).
    *   - trans:  B→M log 0.3, B→E log 0.7; M→M log 0.4, M→E log 0.6;
    *             E→B log 0.55, E→S log 0.45; S→B log 0.55, S→S log 0.45.
    *   - emit:   derived from the committed dict itself — each positive-freq
    *             word contributes its frequency to (S, char) when single-char
    *             and to (B, first), (E, last), (M, middles) otherwise;
    *             emit(s, c) = log(count / totalOf(s)); unseen chars get a
    *             flat floor of -20.0 (below log(1/total) ≈ -18 for this
    *             dict, so transitions decide on fully-unseen runs).
    *
    * All log probs are quantized to 1e-6 (same rule as qlog) so the Scala
    * and CPython (tools/diff_harness.py) decoders are bit-identical; ties
    * in the max are broken exactly like jieba's tuple-max — toward the
    * lexicographically larger state letter — by iterating candidates in
    * that order and requiring strict improvement. */
  object Hmm {
    final val B = 0; final val M = 1; final val E = 2; final val S = 3
    final val Neg = -1e9
    private final val Unseen = -20.0

    private def q(x: Double): Double = math.rint(x * 1e6) / 1e6

    val start: Array[Double] =
      Array(q(math.log(0.6)), Neg, Neg, q(math.log(0.4)))

    // trans(prev)(next)
    val trans: Array[Array[Double]] = {
      val t = Array.fill(4, 4)(Neg)
      t(B)(M) = q(math.log(0.3)); t(B)(E) = q(math.log(0.7))
      t(M)(M) = q(math.log(0.4)); t(M)(E) = q(math.log(0.6))
      t(E)(B) = q(math.log(0.55)); t(E)(S) = q(math.log(0.45))
      t(S)(B) = q(math.log(0.55)); t(S)(S) = q(math.log(0.45))
      t
    }

    // candidate predecessor lists, ordered so the jieba tuple-max tie winner
    // (larger state letter: S > M > E > B) comes first under strict >
    val prevOf: Array[Array[Int]] =
      Array(Array(S, E), // B ← {E,S}, tie → S
            Array(M, B), // M ← {M,B}, tie → M
            Array(M, B), // E ← {B,M}, tie → M
            Array(S, E)) // S ← {S,E}, tie → S

    /** emission log-prob maps, derived from the dict (see scaladoc). */
    lazy val emit: Array[Map[Int, Double]] = {
      val counts = Array.fill(4)(scala.collection.mutable.HashMap.empty[Int, Long])
      for ((w, f) <- wordFreqs if f > 0L) {
        if (w.length == 1) {
          val m = counts(S); m.update(w.charAt(0).toInt, m.getOrElse(w.charAt(0).toInt, 0L) + f)
        } else {
          val mb = counts(B); mb.update(w.charAt(0).toInt, mb.getOrElse(w.charAt(0).toInt, 0L) + f)
          val me = counts(E)
          me.update(w.charAt(w.length - 1).toInt, me.getOrElse(w.charAt(w.length - 1).toInt, 0L) + f)
          var i = 1
          while (i < w.length - 1) {
            val mm = counts(M)
            mm.update(w.charAt(i).toInt, mm.getOrElse(w.charAt(i).toInt, 0L) + f)
            i += 1
          }
        }
      }
      counts.map { m =>
        val total = m.values.sum.toDouble
        m.map { case (c, n) => c -> q(math.log(n.toDouble) - math.log(total)) }.toMap
      }
    }

    @inline private def e(s: Int, c: Char): Double =
      emit(s).getOrElse(c.toInt, Unseen)

    /** Viterbi-decode `run` into words (jieba finalseg.cut semantics). */
    def cut(run: String): Seq[String] = {
      val n = run.length
      if (n == 0) return Nil
      if (n == 1) return Seq(run)
      val v = Array.ofDim[Double](n, 4)
      val back = Array.ofDim[Int](n, 4)
      var s = 0
      while (s < 4) { v(0)(s) = start(s) + e(s, run.charAt(0)); s += 1 }
      var t = 1
      while (t < n) {
        s = 0
        while (s < 4) {
          val cands = prevOf(s)
          var bestP = Double.NegativeInfinity
          var bestPrev = cands(0)
          var k = 0
          while (k < cands.length) {
            val p = (v(t - 1)(cands(k)) + trans(cands(k))(s)) + e(s, run.charAt(t))
            if (p > bestP) { bestP = p; bestPrev = cands(k) }
            k += 1
          }
          v(t)(s) = bestP
          back(t)(s) = bestPrev
          s += 1
        }
        t += 1
      }
      // final state ∈ {E, S}; tie → S (checked first, strict >)
      var last = S
      if (v(n - 1)(E) > v(n - 1)(S)) last = E
      val states = new Array[Int](n)
      states(n - 1) = last
      t = n - 1
      while (t > 0) { states(t - 1) = back(t)(states(t)); t -= 1 }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var begin = 0
      var i = 0
      while (i < n) {
        states(i) match {
          case B => begin = i
          case E => out += run.substring(begin, i + 1)
          case S => out += run.substring(i, i + 1)
          case _ => () // M: continue
        }
        i += 1
      }
      out.toSeq
    }
  }

  /** jieba __cut_DAG buffering: consecutive single-char route pieces are
    * buffered; a flushed buffer of length ≥ 2 with no positive dict
    * frequency goes through the HMM, otherwise chars are emitted singly. */
  private def flushBuf(buf: String, out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (buf.isEmpty) return
    if (buf.length == 1) out += buf
    else if (freq.getOrElse(buf, 0L) == 0L) out ++= Hmm.cut(buf)
    else buf.foreach(c => out += c.toString)
  }

  /** Segment a run of CJK characters into dict words (jieba cut, with the
    * finalseg HMM over buffered unknown single-char runs). */
  def cut(run: String): Seq[String] = {
    val route = cutNoHmm(run)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val buf = new StringBuilder
    for (w <- route) {
      if (w.length == 1) buf.append(w)
      else {
        if (buf.nonEmpty) { flushBuf(buf.toString, out); buf.clear() }
        out += w
      }
    }
    if (buf.nonEmpty) flushBuf(buf.toString, out)
    out.toSeq
  }

  /** DAG max-prob route only (no HMM) — the raw dictionary segmentation. */
  def cutNoHmm(run: String): Seq[String] = {
    val n = run.length
    if (n == 0) return Nil
    if (n == 1) return Seq(run)
    // DAG(i) = inclusive end indices of dict words starting at i
    val dag = Array.tabulate(n) { i =>
      val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
      var k = i
      var frag = run.substring(i, k + 1)
      var inPrefix = freq.contains(frag)
      while (k < n && inPrefix) {
        if (freq(frag) > 0L) ends += k
        k += 1
        if (k < n) {
          frag = run.substring(i, k + 1)
          inPrefix = freq.contains(frag)
        }
      }
      if (ends.isEmpty) ends += i
      ends
    }
    // route(i) = (best logprob from i to end, chosen inclusive end index);
    // jieba's tuple-max: higher logprob wins, ties prefer larger end
    val routeP = new Array[Double](n + 1)
    val routeX = new Array[Int](n + 1)
    routeP(n) = 0.0
    var idx = n - 1
    while (idx >= 0) {
      var bestP = Double.NegativeInfinity
      var bestX = idx
      for (x <- dag(idx)) {
        val w = run.substring(idx, x + 1)
        val p = qlog(freq.getOrElse(w, 0L)) + routeP(x + 1)
        if (p > bestP || (p == bestP && x > bestX)) { bestP = p; bestX = x }
      }
      routeP(idx) = bestP
      routeX(idx) = bestX
      idx -= 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var x = 0
    while (x < n) {
      val y = routeX(x) + 1
      out += run.substring(x, y)
      x = y
    }
    out.toSeq
  }
}
