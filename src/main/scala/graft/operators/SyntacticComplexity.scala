package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dependency-parse syntactic complexity — the CDF-GC stage pair
  * DocumentDependencyParser + SyntacticComplexityCalculator
  * (cdf_gc/dependency_parser.py:1-93, cdf_gc/gc_calculator.py:92-184).
  *
  * The reference's parse model is LTP ("LTP/small") on CUDA — GPU weights
  * and a hub download, both absent here — so the parse itself sits behind
  * the [[DependencyParser]] seam (same pattern as the perplexity
  * TokenScorer). Everything around the model is deterministic public code
  * and is ported exactly:
  *
  *   - [[SyntacticComplexity.splitIntoSentences]] — dependency_parser.py:5-24
  *     (punctuation-or-max-length splitting, alpha-bearing filter, strip);
  *   - [[SyntacticComplexity.treeHeight]] — calc_tree_height
  *     (gc_calculator.py:123-135), memoized parent-chain walk;
  *   - [[SyntacticComplexity.compute]] — the calculator body
  *     (gc_calculator.py:152-184): dep_ent = label-counter entropy,
  *     avg_dep_height = Σ tree heights / #sentences,
  *     avg_dep_dis = Σ |i − parent(i)| / Σ (len(parents) − 1).
  *
  * Divergences (documented, all at the "reference would crash" edges):
  * a doc with zero parsed sentences or zero edges yields 0.0 where the
  * reference raises ZeroDivisionError (gc_calculator.py:175-176) — a
  * 100 TB job must not die on one empty doc.
  */
object SyntacticComplexity {

  /** One parsed sentence: the reference's
    * {"words": [...], "dep_labels": [...], "parents": [...]} dict with
    * parents already 0-based (root = -1), as ChineseDependencyParser
    * rebases them (dependency_parser.py:63-65). */
  final case class ParsedSentence(words: Seq[String], depLabels: Seq[String],
                                  parents: Seq[Int])

  /** split_into_sentences (dependency_parser.py:5-24): cut whenever a
    * punctuation mark is hit or the running piece reaches maxLength; keep
    * only pieces bearing a letter; strip each. Exact port including the
    * `i - start + 1 >= max_length` split-before-advance quirk (a split
    * char lands at the END of its sentence). Python iterates CODE POINTS,
    * so this walks code points too: max-length cuts never land inside a
    * surrogate pair, and the letter test sees supplementary-plane letters
    * (CJK Extension B+) the way str.isalpha does. */
  def splitIntoSentences(text: String, maxLength: Int,
                         punctuations: String): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val punct = punctuations.toSet
    def hasLetter(s: String): Boolean = {
      var k = 0
      while (k < s.length) {
        val cp = s.codePointAt(k)
        if (Character.isLetter(cp)) return true
        k += Character.charCount(cp)
      }
      false
    }
    var start = 0
    var i = 0
    var cpLen = 0 // code points in the running piece, = Python's i-start+1
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      cpLen += 1
      // the punctuation sets in play are BMP chars
      if ((w == 1 && punct.contains(text.charAt(i))) || cpLen >= maxLength) {
        val s = text.substring(start, i + w)
        if (hasLetter(s)) out += graft.text.PyText.pyStrip(s)
        start = i + w
        cpLen = 0
      }
      i += w
    }
    if (start < n) {
      val s = text.substring(start)
      if (hasLetter(s)) out += graft.text.PyText.pyStrip(s)
    }
    out.toSeq
  }

  /** The zh EOS punctuation set ChineseDependencyParser.predict hardcodes
    * (dependency_parser.py:50). */
  val ZhEosPuncts = "。！!？?；;|\n\t…"

  /** calc_tree_height (gc_calculator.py:123-135): height of the deepest
    * node, memoized walk up the parent chain. Empty sentence → 0 (the
    * reference's max() would raise on an empty generator — divergence at
    * the crash edge only). A parent cycle (malformed input the reference
    * would hang on) is broken by the visited guard and scored as root. */
  def treeHeight(parents: Array[Int]): Int = {
    val n = parents.length
    if (n == 0) return 0
    val heights = Array.fill(n)(-1)
    def height(i0: Int): Int = {
      if (parents(i0) == -1) return 0
      if (heights(i0) != -1) return heights(i0)
      // iterative walk up the unresolved chain (chains can be O(n) deep);
      // stack head = highest unresolved ancestor, tail = i0
      var stack = List(i0)
      val onStack = scala.collection.mutable.HashSet(i0)
      var i = parents(i0)
      while (i >= 0 && i < n && parents(i) != -1 && heights(i) == -1 &&
             !onStack.contains(i)) {
        stack ::= i; onStack += i; i = parents(i)
      }
      val base =
        if (i >= 0 && i < n && heights(i) != -1) heights(i)
        else 0 // reached a root (-1 parent) — or an out-of-range/cyclic
               // parent, scored as root (malformed-input guard)
      var h = base
      for (j <- stack) { h += 1; heights(j) = h }
      heights(i0)
    }
    var best = 0
    var i = 0
    while (i < n) { val h = height(i); if (h > best) best = h; i += 1 }
    best
  }

  final case class SynComplexity(depEnt: Double, avgDepHeight: Double,
                                 avgDepDis: Double)

  /** SyntacticComplexityCalculator body (gc_calculator.py:152-184), exact:
    * label entropy over ALL sentences' labels pooled, per-sentence tree
    * heights averaged over sentence count, dependency distances averaged
    * over Σ(len−1) edges (the root contributes no distance but a
    * single-word sentence contributes 0 edges — the reference's own
    * arithmetic, preserved). */
  def compute(sentences: Seq[ParsedSentence]): SynComplexity = {
    val labelCounts = sentences.flatMap(_.depLabels)
      .groupBy(identity).map(_._2.length)
    val depEnt = LexicalDiversity.counterEntropy(labelCounts)
    var treeCnt = 0
    var totalHeight = 0L
    var totalDist = 0L
    var totalEdges = 0L
    for (s <- sentences) {
      val parents = s.parents.toArray
      treeCnt += 1
      // len−1 exactly as the reference — except an EMPTY sentence, where
      // the reference's arithmetic would subtract an edge (len([])−1 = −1)
      // right before calc_tree_height crashes on it; a seam-injected empty
      // sentence here contributes 0 edges and height 0 instead of skewing
      // the denominator (crash-edge divergence, like the 0.0 guards)
      totalEdges += math.max(0, parents.length - 1)
      totalHeight += treeHeight(parents)
      var i = 0
      while (i < parents.length) {
        if (parents(i) != -1) totalDist += math.abs(i - parents(i))
        i += 1
      }
    }
    val avgHeight = if (treeCnt == 0) 0.0 else totalHeight.toDouble / treeCnt
    val avgDis = if (totalEdges <= 0) 0.0 else totalDist.toDouble / totalEdges
    SynComplexity(depEnt, avgHeight, avgDis)
  }

  /** Parse-model seam (≙ BaseDependencyParser, dependency_parser.py:27-30).
    * The production fill is LTP-on-GPU (absent); offline fills are
    * [[HeuristicDependencyParser]] or any injected parser. */
  trait DependencyParser extends Serializable {
    def predict(text: String): Seq[ParsedSentence]
  }

  /** DocumentDependencyParser (gc_calculator.py:92-120): annotate each doc
    * with its parsed sentences. The reference writes one jsonl per rank and
    * re-reads it positionally; Spark-first the parse is a column carried to
    * the calculator (no side-file round trip, no positional-zip fragility).
    * The parser broadcasts once per job — the allowed model-broadcast
    * exception. */
  def parse(df: DataFrame, textCol: String, parser: DependencyParser,
            outCol: String = "parsed_sentences")
           (implicit spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(parser)
    val u = udf { t: String =>
      if (t == null) Seq.empty[ParsedSentence] else bc.value.predict(t)
    }
    df.withColumn(outCol, u(col(textCol)))
  }

  /** SyntacticComplexityCalculator (gc_calculator.py:138-184): attach
    * dep_ent / avg_dep_height / avg_dep_dis from a parsed-sentences
    * column. Narrow one-pass map — composes with GcOps.combine/normalize
    * for the full CDF-GC score. */
  def annotate(df: DataFrame, parsedCol: String = "parsed_sentences"): DataFrame = {
    val u = udf { ss: Seq[ParsedSentence] =>
      val r = compute(if (ss == null) Nil else ss)
      (r.depEnt, r.avgDepHeight, r.avgDepDis)
    }
    df.withColumn("__syn", u(col(parsedCol)))
      .withColumn("dep_ent", col("__syn._1"))
      .withColumn("avg_dep_height", col("__syn._2"))
      .withColumn("avg_dep_dis", col("__syn._3"))
      .drop("__syn")
  }
}

/** Deterministic offline stand-in for the LTP parse (the model itself is
  * GPU + hub-download, out of scope). Sentence splitting and batching
  * mirror ChineseDependencyParser.predict (dependency_parser.py:46-72)
  * exactly; the TREE is a rule-lite head heuristic, NOT an LTP
  * reproduction — it exists to exercise the exact calculator/seam with
  * valid single-rooted trees:
  *   - words: ZhSegmenter.cut for zh, Tokenizer.words for en
  *     (≙ LTP's cws task output slot);
  *   - root: first verb-tagged word, else word 0 (label HED);
  *   - words left of root chain rightward toward it, words right of it
  *     chain leftward (SBV / VOB for the root's immediate neighbours,
  *     ATT elsewhere) — valid trees with non-trivial heights/distances.
  */
final class HeuristicDependencyParser(lang: String = "zh",
                                      maxLength: Int = 128)
  extends SyntacticComplexity.DependencyParser {
  import SyntacticComplexity._

  private def segment(s: String): Array[String] =
    if (lang == "zh") graft.text.ZhSegmenter.cut(s).toArray
    else graft.text.Tokenizer.words(s)

  private def isVerb(w: String): Boolean =
    if (lang == "zh") graft.text.ZhSegmenter.posTags.get(w).contains("v")
    else LexicalDiversity.tagEn(w).startsWith("VB")

  def predict(text: String): Seq[ParsedSentence] = {
    splitIntoSentences(text, maxLength, ZhEosPuncts).flatMap { sent =>
      val words = segment(sent).filter(_.nonEmpty)
      if (words.isEmpty) None
      else {
        val root = words.indexWhere(isVerb) match {
          case -1 => 0
          case i => i
        }
        val parents = words.indices.map { i =>
          if (i == root) -1 else if (i < root) i + 1 else i - 1
        }
        val labels = words.indices.map { i =>
          if (i == root) "HED"
          else if (i == root - 1) "SBV"
          else if (i == root + 1) "VOB"
          else "ATT"
        }
        Some(ParsedSentence(words.toSeq, labels, parents))
      }
    }
  }
}
