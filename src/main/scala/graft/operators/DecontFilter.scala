package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.text.{PyText, TextKernels, Tokenizer}

/** Eval-benchmark decontamination (pipeline/decont/n_grams.py:53-227):
  * build an index of n-gram hashes from benchmark texts, then drop any
  * training doc containing an indexed n-gram.
  *
  * Spark shape: the index build is a one-off aggregation; the filter is a
  * broadcast hash-set probe inside the narrow pass (a left-anti join on
  * exploded n-gram hashes would shuffle the whole corpus — the broadcast
  * set costs index-size memory instead, the right trade at 10^12 docs vs
  * ~10^6 benchmark n-grams).
  */
final case class DecontConfig(nGrams: Int = 12)

object DecontFilter {

  private def docHashes(text: String, n: Int): Array[Long] = {
    val words = Tokenizer.words(TextKernels.simplifyText(text))
    if (words.length < n) Array.empty
    else (0 to words.length - n).map { i =>
      Hashes.xxhash64(words.slice(i, i + n).mkString(" "))
    }.toArray
  }

  /** Index build: distinct n-gram hashes of the benchmark corpus. */
  def buildIndex(benchmarks: DataFrame, textCol: String = "text",
                 cfg: DecontConfig = DecontConfig())
                (implicit spark: SparkSession): Set[Long] = {
    import spark.implicits._
    val n = cfg.nGrams
    benchmarks.select(col(textCol)).as[String]
      .flatMap(t => docHashes(t, n))
      .distinct()
      .collect()
      .toSet
  }

  /** Filter: drop docs containing any indexed n-gram. */
  def apply(df: DataFrame, index: Set[Long], textCol: String = "text",
            cfg: DecontConfig = DecontConfig())
           (implicit spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(index)
    val n = cfg.nGrams
    val contaminated = udf { text: String =>
      val idx = bc.value
      idx.nonEmpty && docHashes(text, n).exists(idx.contains)
    }
    df.withColumn("decont_keep", !contaminated(col(textCol)))
  }

  /** As a pipeline stage. */
  def stage(index: Set[Long], cfg: DecontConfig = DecontConfig()): DocStage =
    DocStage.filter("ngrams_decont") { (d, _) =>
      if (index.nonEmpty && docHashes(d.text, cfg.nGrams).exists(index.contains))
        Some("contaminated")
      else None
    }
}

/** Generic classifier filter (filters/fasttext_filter.py:13-112): score
  * text with a pluggable classifier; keep/remove by label thresholds; at
  * PARAGRAPH/SENTENCE granularity the text is REWRITTEN to the passing
  * spans (fasttext_filter.py:96-112). The fastText model itself is behind
  * the scorer seam (no pretrained model ships offline). */
object ClassifierFilter {
  sealed trait Granularity
  case object Document extends Granularity
  case object Paragraph extends Granularity
  case object Sentence extends Granularity

  /** scorer: text → (label → score). */
  def stage(
      name0: String,
      scorer: String => Map[String, Double],
      keepLabels: Seq[(String, Double)] = Nil,   // keep if ANY label ≥ thr
      removeLabels: Seq[(String, Double)] = Nil, // drop if ANY label ≥ thr
      granularity: Granularity = Document): DocStage = new DocStage {
    val name = name0

    private def unitKeep(unit: String): Boolean = {
      val scores = scorer(unit)
      val removed = removeLabels.exists { case (l, t) => scores.getOrElse(l, 0.0) >= t }
      val kept = keepLabels.isEmpty || keepLabels.exists { case (l, t) => scores.getOrElse(l, 0.0) >= t }
      !removed && kept
    }

    def process(doc: PipeDoc, ctx: StageContext): PipeDoc = granularity match {
      case Document =>
        if (unitKeep(doc.text)) doc
        else doc.copy(keep = false, drop_reason = "classifier", drop_stage = name)
      case Paragraph | Sentence =>
        val units =
          if (granularity == Paragraph) doc.text.split("\n", -1)
          else PyText.splitLines(doc.text) // line-mode sentence approximation
        val kept = units.filter(unitKeep)
        if (kept.isEmpty)
          doc.copy(keep = false, drop_reason = "classifier_all_spans", drop_stage = name)
        else doc.copy(text = kept.mkString("\n"))
    }
  }
}
