package graft

import java.sql.Timestamp

/** Input row per BASELINE.json input_hint: Iceberg/parquet table of
  * Common-Crawl-style web pages. `url` is the stable document identity
  * (replaces the reference's positional doc_idx — SURVEY.md §1.2). */
final case class WebPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Output row of the quality pipeline: original columns + per-doc verdict.
  * `keep`/`drop_reason` carry the first-failing rule in reference check
  * order; `text` holds the (possibly C4-rewritten, PII-scrubbed) body. */
final case class FilteredPage(
    url: String,
    warc_ts: Timestamp,
    text: String,
    lang: String,
    language: String,
    language_score: Double,
    token_count: Long,
    keep: Boolean,
    drop_reason: String, // "" when kept
    drop_stage: String)  // "" when kept

/** Per-partition lineage/metrics row (north rule: every stage writes
  * per-partition drop-reason metrics). */
final case class StageMetric(
    stage: String,
    partition_id: Int,
    drop_reason: String,
    count: Long)
