package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score-driven sampling ops (fork's cdf_gc/eta_dacp, SURVEY.md §2.11):
  * global sort by a quality score + running token-mass window. The global
  * orderBy is a range-partition shuffle (Spark samples split points), and
  * the running sum is a window over that ordering — both scale-out native.
  */
object Sampling {

  /** eta_dacp/hard_sampler.py:8-47 — keep the top-scored docs up to a
    * token budget (doc budget: pass tokenCol = lit(1)). */
  def hardTopByTokens(df: DataFrame, scoreCol: String, tokenCol: String,
                      tokenBudget: Long): DataFrame = {
    val w = Window.orderBy(desc(scoreCol), asc(tokenCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__running", sum(col(tokenCol)).over(w))
      .where(col("__running") - col(tokenCol) < tokenBudget)
      .drop("__running")
  }

  /** cdf_gc/cdf_sampler.py:9-124 — ProbabilityCalculator + Sampler:
    * sort by score descending; the top `hardFraction` of total token mass
    * gets p=1 ("hard sample"); the remainder gets p = rate × CDF position;
    * then Bernoulli-sample with a seeded rand. */
  def cdfSample(df: DataFrame, scoreCol: String, tokenCol: String,
                hardFraction: Double, rate: Double, seed: Long = 42L): DataFrame = {
    val w = Window.orderBy(desc(scoreCol), asc(tokenCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = df.agg(sum(col(tokenCol))).first().getLong(0).toDouble
    df.withColumn("__cdf", sum(col(tokenCol)).over(w) / total)
      .withColumn("sample_p",
        when(col("__cdf") <= hardFraction, lit(1.0))
          .otherwise(lit(rate) * (lit(1.0) - col("__cdf") + lit(hardFraction))))
      .withColumn("sampled", rand(seed) <= col("sample_p"))
      .drop("__cdf")
  }
}
