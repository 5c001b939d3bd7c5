package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{DocStage, PipeDoc, QualityPipeline}

/** Structured-Streaming front-end for the quality pipeline.
  *
  * The reference is bounded-batch only (its "streaming" is Python
  * generators); a Spark-native engine gets incremental processing for
  * free because the whole filter chain is stateless and narrow — the same
  * QualityPipeline.run works on a streaming DataFrame (readStream →
  * transforms → writeStream), enabling continuous ingestion of new
  * Common-Crawl dumps without re-running committed history.
  */
object StreamingQuality {

  /** Apply the pipeline to a streaming web-page DataFrame. */
  def run(stream: DataFrame, stages: Seq[DocStage])
         (implicit spark: SparkSession): Dataset[PipeDoc] =
    new QualityPipeline(stages).run(stream)

  /** Windowed drop-reason metrics with a watermark on event time —
    * per-window per-reason counts for monitoring a live ingest. */
  def windowedDropMetrics(result: Dataset[PipeDoc],
                          windowDur: String = "1 minute",
                          watermarkDelay: String = "10 minutes"): DataFrame =
    result.toDF()
      .withWatermark("warc_ts", watermarkDelay)
      .groupBy(
        window(col("warc_ts"), windowDur),
        when(col("keep"), lit("(kept)")).otherwise(col("drop_reason")).as("reason"))
      .agg(count(lit(1)).as("count"))
}
