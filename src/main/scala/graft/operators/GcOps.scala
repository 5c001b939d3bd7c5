package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDF-GC combiner + normalizer (fork's cdf_gc/gc_calculator.py:186-296) —
  * the CPU-feasible pieces of the GC ("general composite") score pipeline.
  * The upstream per-doc metric producers (POS entropy, dependency parse)
  * are GPU/zh-NLP ops and stay out of scope; these two stages are pure
  * relational work and run on any per-doc metric columns.
  */
object GcOps {

  /** GcCombiner (gc_calculator.py:186-233): align two per-doc metric tables.
    * The reference zips two jsonl files positionally per rank; Spark-first
    * this is an id join (positional zip is not stable under repartitioning —
    * documented divergence; callers carry an explicit doc id). */
  def combine(lex: DataFrame, syn: DataFrame, idCol: String): DataFrame =
    lex.join(syn, Seq(idCol))

  /** GcNormalizer (gc_calculator.py:236-296): global min-max normalization
    * of each component column to [0,1] (`norm_<c>`); a constant column
    * normalizes to 0 like the reference's `val = 0` guard. One distributed
    * aggregate collects the 2×|components| extrema to the driver (a single
    * row — scale-independent), then the normalization is a narrow map. */
  def normalize(df: DataFrame, components: Seq[String],
                outPrefix: String = "norm_"): DataFrame = {
    require(components.nonEmpty, "no components to normalize")
    val aggs: Seq[Column] = components.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__min_$c"),
          max(col(c).cast("double")).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    components.foldLeft(df) { (d, c) =>
      // Extrema are null on an empty input — treat like the constant-column
      // case (reference's `val = 0` guard) instead of NPE-ing on unboxing.
      val lo = row.getAs[java.lang.Double](s"__min_$c")
      val hi = row.getAs[java.lang.Double](s"__max_$c")
      val norm =
        if (lo == null || hi == null || hi.doubleValue == lo.doubleValue) lit(0.0)
        else (col(c).cast("double") - lit(lo.doubleValue)) /
          lit(hi.doubleValue - lo.doubleValue)
      d.withColumn(outPrefix + c, norm)
    }
  }
}
