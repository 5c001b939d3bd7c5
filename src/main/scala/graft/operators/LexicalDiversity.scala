package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.{Tokenizer, ZhSegmenter}

/** DocumentPartOfSpeechPredictor + LexicalDiversityCalculator
  * (cdf_gc/part_of_speech_predictor.py:20-79, gc_calculator.py:13-88) —
  * the CPU-feasible lexical-diversity half of the CDF-GC score:
  *   - preprocess: strip each line; lines wrapped in `|...|` (markdown
  *     tables) get their pipes replaced by spaces (gc_calculator.py:13-21);
  *   - POS-tag, keeping only alpha words (any letter char);
  *   - content words = noun/verb/adj/adv tags;
  *   - pos_ent  = Shannon entropy (log2) of the tag counter,
  *     con_ent = entropy of the content-word counter (gc_calculator.py:24-28).
  *
  * Tagger seam: the reference uses nltk's pretrained perceptron (en) /
  * jieba.posseg (zh); neither model ships offline. English uses a
  * deterministic lexicon+suffix tagger-lite over the Penn tagset
  * (documented approximation); Chinese uses the committed dict's
  * jieba-style tags over ZhSegmenter words (posseg without HMM). The
  * entropy/content-word/preprocess machinery is exact.
  */
object LexicalDiversity {

  // Penn content tags (part_of_speech_predictor.py:25-30)
  val EnContentTags: Set[String] = Set(
    "NN", "NNS", "NNP", "NNPS",
    "VB", "VBD", "VBG", "VBN", "VBP", "VBZ",
    "JJ", "JJR", "JJS", "RB", "RBR", "RBS")

  // jieba content tags (part_of_speech_predictor.py:49)
  val ZhContentTags: Set[String] = Set(
    "n", "v", "a", "m", "q", "d", "b", "r", "t", "s", "f",
    "an", "nr", "nrfg", "nrt", "ns", "nt", "nz", "vn")

  private val Determiners = Set("the", "a", "an", "this", "that", "these", "those")
  private val Pronouns = Set("i", "you", "he", "she", "it", "we", "they",
    "me", "him", "her", "us", "them")
  private val Prepositions = Set("of", "in", "to", "on", "at", "by", "for",
    "with", "from", "as", "into", "over", "under")
  private val Conjunctions = Set("and", "or", "but")
  private val Modals = Set("can", "could", "will", "would", "may", "might",
    "must", "shall", "should")
  private val BeVerbs = Set("is", "are", "was", "were", "be", "been", "am")

  /** Deterministic Penn-ish tagger-lite. Rule order is part of the contract
    * (mirrored in the driver oracle SQL). */
  def tagEn(word: String): String = {
    val w = word.toLowerCase(java.util.Locale.ROOT)
    if (Determiners(w)) "DT"
    else if (Pronouns(w)) "PRP"
    else if (Prepositions(w)) "IN"
    else if (Conjunctions(w)) "CC"
    else if (Modals(w)) "MD"
    else if (BeVerbs(w)) "VB"
    else if (w.endsWith("ly")) "RB"
    else if (w.endsWith("ing")) "VBG"
    else if (w.endsWith("ed")) "VBD"
    else if (w.endsWith("ous") || w.endsWith("ful") || w.endsWith("ive") || w.endsWith("able")) "JJ"
    else if (w.endsWith("s") && !w.endsWith("ss") && w.length > 3) "NNS"
    else "NN"
  }

  def tagZh(word: String): String = ZhSegmenter.posTags.getOrElse(word, "x")

  /** gc_calculator.py:13-21 — strip lines; `|...|` table rows lose pipes. */
  def preprocessText(text: String): String =
    text.split("\n", -1).map { line0 =>
      val line = graft.text.PyText.pyStrip(line0)
      if (line.startsWith("|") && line.endsWith("|")) line.replace("|", " ")
      else line
    }.mkString("\n")

  /** part_of_speech_predictor.py:6-7 — any letter char qualifies. */
  def isAlphaWord(w: String): Boolean = w.exists(Character.isLetter)

  /** Shannon entropy (log2) of a counter — calc_counter_entropy
    * (gc_calculator.py:24-28). Terms are summed in ascending-count order so
    * the result is deterministic under any map iteration order. */
  def counterEntropy(counts: Iterable[Int]): Double = {
    val total = counts.sum.toDouble
    if (total == 0) return 0.0
    val sorted = counts.toArray.sorted
    var acc = 0.0
    for (c <- sorted) {
      val p = c / total
      acc += p * (math.log(p) / math.log(2.0))
    }
    -acc
  }

  /** (words, tags) after alpha filtering — predict() in the reference. */
  def predict(text: String, lang: String): (Array[String], Array[String]) = {
    val tokens = Tokenizer.words(preprocessText(text))
    val tag: String => String = if (lang == "zh") tagZh else tagEn
    val kept = tokens.filter(isAlphaWord)
    (kept, kept.map(tag))
  }

  final case class LexDiv(posEnt: Double, conEnt: Double,
                          nContent: Int, nDistinctContent: Int, nTags: Int)

  def compute(text: String, lang: String = "en"): LexDiv = {
    val (words, tags) = predict(text, lang)
    val contentTags = if (lang == "zh") ZhContentTags else EnContentTags
    val content = words.zip(tags).collect { case (w, t) if contentTags(t) => w }
    val tagCounts = tags.groupBy(identity).map(_._2.length)
    val conCounts = content.groupBy(identity).map(_._2.length)
    LexDiv(counterEntropy(tagCounts), counterEntropy(conCounts),
      content.length, conCounts.size, tagCounts.size)
  }

  /** Column annotation: pos_ent, con_ent (+ integer counters). */
  def annotate(df: DataFrame, textCol: String, lang: String = "en"): DataFrame = {
    val u = udf { t: String =>
      val r = compute(t, lang)
      (r.posEnt, r.conEnt, r.nContent, r.nDistinctContent, r.nTags)
    }
    df.withColumn("__lx", u(col(textCol)))
      .withColumn("pos_ent", col("__lx._1"))
      .withColumn("con_ent", col("__lx._2"))
      .withColumn("n_content_words", col("__lx._3"))
      .withColumn("n_distinct_content", col("__lx._4"))
      .withColumn("n_distinct_tags", col("__lx._5"))
      .drop("__lx")
  }
}
