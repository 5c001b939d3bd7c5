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

/** Token-level prompt-logprob seam for PerplexityCalculator
  * (perplexity/ppl_model.py:7-44 wraps a vLLM LLM with prompt_logprobs=0;
  * GPU + model weights are absent here, so the production fill stays out
  * and offline fills are a unigram table or any injected function). */
trait TokenScorer extends Serializable {
  /** log P(tokenIds(i) | prefix) for every position; index 0 is unused
    * (the reference skips the first prompt token). */
  def promptLogprobs(tokenIds: Array[Int]): Array[Double]
}

/** Offline fill: token-unigram logprobs from an injected frequency table
  * (OOV floor mirrors the `.get(token, 0.0)` lookup-miss path). */
final class UnigramTokenScorer(logprobs: Map[Int, Double],
                               oovLogprob: Double = 0.0) extends TokenScorer {
  def promptLogprobs(tokenIds: Array[Int]): Array[Double] =
    tokenIds.map(id => logprobs.getOrElse(id, oovLogprob))
}

/** PerplexityCalculator (perplexity/perplexity_calculator.py:10-55): score
  * the PerplexityEncoder's token ids with a model's prompt logprobs and
  * attach `perplexity` per doc. Arithmetic mirrors PPLModel.calc_ppl
  * exactly: sum logprobs over positions 1..n-1 (first token skipped),
  * divide by n — the FULL length, the reference's own quirk — and
  * ppl = exp(−mean); n ≤ 1 → 0.0. The reference runs one vLLM instance
  * per rank over a rank's jsonl; Spark-first this is a narrow map with the
  * scorer broadcast (the allowed model-broadcast exception). */
object PerplexityCalculator {

  def ppl(tokenIds: Array[Int], scorer: TokenScorer): Double = {
    val n = tokenIds.length
    if (n <= 1) return 0.0
    val lps = scorer.promptLogprobs(tokenIds)
    var sum = 0.0
    var i = 1
    while (i < n) { sum += lps(i); i += 1 }
    math.exp(-(sum / n))
  }

  def annotate(df: DataFrame, tokenIdsCol: String, scorer: TokenScorer)
              (implicit spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(scorer)
    // null token_ids (missing values from external jsonl/parquet) take the
    // n<=1 convention instead of NPE-ing the task
    val u = udf { ids: Seq[Int] => if (ids == null) 0.0 else ppl(ids.toArray, bc.value) }
    df.withColumn("perplexity", u(col(tokenIdsCol)))
  }
}
