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
  * The frequency dictionary is a small self-authored table of common words
  * (src/main/resources/graft/zh_dict.tsv) — NOT jieba's dict.txt — so
  * segmentations match jieba's *algorithm* under this dict, not jieba's
  * shipped model. Unknown runs fall back to single characters (jieba uses
  * an HMM there; documented divergence). tools/zh_diff.py cross-checks this
  * implementation against an independent Python port over the same dict.
  */
object ZhSegmenter {

  /** (word → freq, word → POS tag) from the committed 3-column dict
    * (word \t freq \t jieba-style tag — the same format as jieba's
    * dict.txt, self-authored content). */
  lazy val (wordFreqs: Map[String, Long], posTags: Map[String, String]) = {
    val in = getClass.getResourceAsStream("/graft/zh_dict.tsv")
    require(in != null, "zh_dict.tsv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val rows = try src.getLines().flatMap { line =>
      val parts = line.split("\t")
      if (parts.length >= 2)
        Some((parts(0), parts(1).toLong, if (parts.length >= 3) parts(2) else "n"))
      else None
    }.toVector finally src.close()
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

  /** Segment a run of CJK characters into dict words (jieba cut, no HMM). */
  def cut(run: String): Seq[String] = {
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
