package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass MetricStats aggregate (SURVEY.md §4: the reference's
  * MetricStatsDict tracks n/total/min/max/mean/std per key in one pass,
  * utils/stats.py:17-160; five separate built-in aggs do the same work in
  * five buffers). A typed Aggregator with Welford/Chan merging computes all
  * of them in one buffer — fewer aggregation buffers per group, which
  * matters when grouping by 100k+ fqdns. */
final case class MetricStatsBuf(
    n: Long, total: Double, min: Double, max: Double, mean: Double, m2: Double)

final case class MetricStatsResult(
    n: Long, total: Double, min: Double, max: Double, mean: Double, std: Double)

object MetricStatsAgg extends Aggregator[Double, MetricStatsBuf, MetricStatsResult] {

  override def zero: MetricStatsBuf =
    MetricStatsBuf(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0.0)

  override def reduce(b: MetricStatsBuf, x: Double): MetricStatsBuf = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    val m2 = b.m2 + delta * (x - mean) // Welford
    MetricStatsBuf(n, b.total + x, math.min(b.min, x), math.max(b.max, x), mean, m2)
  }

  override def merge(a: MetricStatsBuf, b: MetricStatsBuf): MetricStatsBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val n = a.n + b.n
    val delta = b.mean - a.mean
    val mean = a.mean + delta * b.n / n
    val m2 = a.m2 + b.m2 + delta * delta * a.n * b.n / n // Chan et al.
    MetricStatsBuf(n, a.total + b.total, math.min(a.min, b.min), math.max(a.max, b.max), mean, m2)
  }

  override def finish(b: MetricStatsBuf): MetricStatsResult =
    if (b.n == 0) MetricStatsResult(0L, 0.0, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    else MetricStatsResult(b.n, b.total, b.min, b.max, b.mean, math.sqrt(b.m2 / b.n))

  override def bufferEncoder: Encoder[MetricStatsBuf] = Encoders.product[MetricStatsBuf]
  override def outputEncoder: Encoder[MetricStatsResult] = Encoders.product[MetricStatsResult]

  /** Untyped column form for DataFrame groupBy.agg. */
  def column(valueCol: Column): Column = udaf(MetricStatsAgg).apply(valueCol)
}
