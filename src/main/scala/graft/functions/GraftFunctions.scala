package graft.functions

import org.apache.spark.sql.SparkSession
import graft.operators._
import graft.text.{TextKernels, Tokenizer}

/** SQL surface: registers the engine's scalar kernels as Spark SQL
  * functions so `spark.sql(...)` users get the full capability set without
  * the Scala API — `SELECT url FROM pages WHERE graft_gopher_quality(text) = ''`.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("graft_words", (t: String) => Tokenizer.words(t))
    u.register("graft_word_count", (t: String) => Tokenizer.words(t).length.toLong)
    u.register("graft_bpeish_count", (t: String) => Tokenizer.bpeishCount(t).toLong)
    u.register("graft_simplify", (t: String) => TextKernels.simplifyText(t))
    u.register("graft_gopher_quality",
      (t: String) => GopherQualityFilter.check(t).getOrElse(""))
    u.register("graft_gopher_repetition",
      (t: String) => GopherRepetitionFilter.check(t).getOrElse(""))
    u.register("graft_c4_quality",
      (t: String) => C4QualityFilter.check(t).fold(identity, _ => ""))
    u.register("graft_c4_rewrite",
      (t: String) => C4QualityFilter.check(t).getOrElse(t))
    u.register("graft_fineweb_quality",
      (t: String) => FineWebQualityFilter.check(t).getOrElse(""))
    u.register("graft_pii_scrub",
      (t: String) => new PiiScrubber(resetPerDoc = true).scrub(t))
    u.register("graft_lang", (t: String) => HeuristicLid.predict(t)._1)
    u.register("graft_lang_score", (t: String) => HeuristicLid.predict(t)._2)
    u.register("graft_simhash", (t: String) => SimHashDedup.simhash64(t))
    u.register("graft_fingerprint", (t: String) => Fingerprint.contentHash(t))
    u.register("graft_jaccard", (a: String, b: String) => NgramJaccard.jaccard(a, b))
    u.register("graft_sentence_count", (t: String) => Tokenizer.sentenceCount(t).toLong)
    u.register("graft_extract_html", (h: String) => HtmlExtractor.extract(h))
    // native (codegen) expression — same result as graft_word_count, no
    // ScalaUDF in the plan; also injectable at session build via
    // GraftExtensions for spark-submit users
    org.apache.spark.sql.GraftSqlBridge.registerFunction(
      spark, "graft_word_count_native", exprs => WordCountExpression(exprs.head))
  }
}
