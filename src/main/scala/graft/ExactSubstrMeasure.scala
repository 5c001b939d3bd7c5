package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{ExactSubstrConfig, ExactSubstrDedup}

/** Round-5 divergence measurement (VERDICT r4 "Next round" #4): runs the
  * engine's rolling-hash ExactSubstr approximation over a planted corpus
  * with KNOWN byte-exact duplicate ranges and dumps per-doc removed word
  * positions. tools/exact_substr_divergence.py generates the corpus,
  * computes the TRUE Lee-et-al byte-level answer with an independent
  * suffix-array reference, and scores precision/recall of the removal.
  *
  *   python3 tools/exact_substr_divergence.py gen /tmp/es_corpus.jsonl
  *   sbt -batch "runMain graft.ExactSubstrMeasure /tmp/es_corpus.jsonl /tmp/es_out"
  *   python3 tools/exact_substr_divergence.py score /tmp/es_corpus.jsonl /tmp/es_out
  */
object ExactSubstrMeasure {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark
    val cfg = ExactSubstrConfig(
      shortSpanWords = if (args.length > 2) Some(args(2).toInt) else None,
      anchorEvery = if (args.length > 3) Some(args(3).toInt) else None)
    val docs = spark.read.json(in).select(col("doc_id").cast("long"), col("text"))
    ExactSubstrDedup(docs, "doc_id", "text", cfg, emitRemovedWords = true)
      .select(col("doc_id"), col("exact_substr_keep"), col("n_removed_words"),
        coalesce(col("removed_word_positions"), array().cast("array<int>"))
          .as("removed_word_positions"))
      .coalesce(1)
      .write.mode("overwrite").json(out)
    spark.stop()
  }
}
