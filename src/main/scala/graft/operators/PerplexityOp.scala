package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{ArpaModel, PerplexityScorer}

/** CCNet-style perplexity annotation/filter (stats/perplexity_stats.py +
  * utils/perplexity.py). The ARPA model is broadcast once per job — the
  * allowed model-broadcast exception in the north rule. */
object PerplexityOp {

  /** Annotate a `perplexity` column. */
  def annotate(df: DataFrame, textCol: String, model: ArpaModel,
               normalizeCcNet: Boolean = true)
              (implicit spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(model)
    val norm = normalizeCcNet
    val pplUdf = udf { text: String =>
      new PerplexityScorer(bc.value, normalizeCcNet = norm).perplexity(text)
    }
    df.withColumn("perplexity", pplUdf(col(textCol)))
  }

  /** Keep docs with perplexity ≤ maxPerplexity (lower = more fluent). */
  def filter(df: DataFrame, textCol: String, model: ArpaModel, maxPerplexity: Double)
            (implicit spark: SparkSession): DataFrame =
    annotate(df, textCol, model).where(col("perplexity") <= maxPerplexity)
}
