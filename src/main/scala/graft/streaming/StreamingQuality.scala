package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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

  /** Streaming exact dedup across micro-batches: first occurrence of each
    * text hash wins; later arrivals are dropped. Custom per-key state via
    * flatMapGroupsWithState (the Spark-native replacement for the
    * reference's stateful single-task bloom filter). State ages out via
    * EVENT-time timeout against the watermark — a processing-time timeout
    * would make the engine self-trigger empty batches forever; with event
    * time, state for keys colder than watermark+ttl is dropped and memory
    * stays bounded over an unbounded ingest. */
  def streamingExactDedup(stream: Dataset[PipeDoc],
                          watermarkDelay: String = "10 minutes",
                          stateTtlMs: Long = 60L * 60 * 1000)
                         (implicit spark: SparkSession): Dataset[PipeDoc] = {
    import spark.implicits._
    stream
      .withWatermark("warc_ts", watermarkDelay)
      .groupByKey(d => graft.functions.Hashes.xxhash64(d.text))
      .flatMapGroupsWithState[Boolean, PipeDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, docs: Iterator[PipeDoc], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val seenBefore = state.exists
            val first = docs.next()
            if (!seenBefore) {
              state.update(true)
              // TTL anchored to the doc's own event time (the watermark can
              // lag arbitrarily at batch 0 — anchoring there would expire
              // fresh state as soon as the watermark catches up), clamped
              // above the current watermark: a late-arriving key with old
              // event time would otherwise make setTimeoutTimestamp throw
              // (timestamp <= watermark) and fail the whole query
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(
                math.max(first.warc_ts.getTime + stateTtlMs, wm + 1000L))
            }
            // first-ever doc for this hash passes; everything else drops
            if (seenBefore) Iterator.empty else Iterator.single(first)
          }
      }
  }

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
