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

/** Perplexity Encoder (pipeline/perplexity/encoder.py:12-35): per-doc token
  * ids truncated to max_model_len-1, written as one jsonl file of JSON int
  * arrays per partition (≙ the reference's per-rank files). The reference
  * loads a pretrained HF tokenizer from the hub (no egress here); a
  * corpus-trained `graft.text.Bpe.Model` plugs the same seam with real
  * multi-symbol merges. */
object PerplexityEncoder {
  import org.apache.spark.sql.functions._

  /** Annotate with `token_ids` (BPE ids, EOS-terminated, truncated). */
  def annotate(df: org.apache.spark.sql.DataFrame, textCol: String,
               model: graft.text.Bpe.Model, maxModelLen: Int = 4096): org.apache.spark.sql.DataFrame = {
    val enc = udf { t: String =>
      if (t == null) Array(0) // null text -> empty doc (EOS only)
      else {
        val ids = graft.text.Bpe.encode(t, model)
        // truncation must not cut the EOS doc separator off the end —
        // downstream consumers find doc boundaries by id 0
        if (ids.length > maxModelLen - 1) ids.take(maxModelLen - 2) :+ 0 else ids
      }
    }
    df.withColumn("token_ids", enc(col(textCol)))
  }

  /** encoder.py run(): one jsonl file per partition, each line a JSON array
    * of token ids — written through Spark's text sink (any filesystem). */
  def write(df: org.apache.spark.sql.DataFrame, textCol: String, outDir: String,
            model: graft.text.Bpe.Model, maxModelLen: Int = 4096): Unit =
    annotate(df, textCol, model, maxModelLen)
      .select(to_json(col("token_ids")).as("value"))
      .write.mode("overwrite").text(outDir)
}
