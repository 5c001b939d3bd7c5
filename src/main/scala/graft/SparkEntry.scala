package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.WebCorpusGen

/** Driver contract — queries over the driver-generated tables in `sfDir`
  * plus DuckDB-equivalent oracle SQL. All float-sensitive comparisons are
  * expressed in integer arithmetic so Spark and DuckDB hash identically.
  * Each query orders by a unique key for a deterministic row order. */
object SparkEntry {

  private def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  // Gopher config used for the oracle queries on the `documents` table
  // (its docs are 10-99 plain lowercase words; thresholds chosen to split
  // keep/drop meaningfully — see BASELINE.md notes).
  private val oracleGopherCfg = GopherQualityConfig(
    minDocWords = Some(40), minStopWords = Some(1))

  private val gopherReasonUdf = udf { text: String =>
    GopherQualityFilter.check(text, oracleGopherCfg).getOrElse("")
  }

  private val tokenCountUdf = udf { text: String =>
    graft.text.Tokenizer.words(text).length.toLong
  }

  private val piiScrubUdf = udf { text: String =>
    new PiiScrubber(resetPerDoc = true).scrub(text)
  }

  private val gopherRepetitionUdf = udf { text: String =>
    GopherRepetitionFilter.check(text).getOrElse("")
  }

  private val fineWebReasonUdf = udf { text: String =>
    FineWebQualityFilter.check(text).getOrElse("")
  }

  private val langUdf = udf { text: String =>
    val (lang, score, _) = graft.functions.HeuristicLid.predict(text)
    lang + ":" + (score * 1000).toLong // integer-quantized for stable hashing
  }

  /** Flagship: full quality pipeline (language → score → Gopher repetition →
    * Gopher quality → FineWeb → token count → PII) over the sf0.001
    * documents mapped into the web-page schema. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = documents(spark, "/root/testdata/sf0.001")
      .select(
        concat(lit("https://"), col("source"), lit(".example.com/"), col("doc_id")).as("url"),
        lit(new java.sql.Timestamp(1700000000000L)).as("warc_ts"),
        col("text"),
        col("lang"))
    val pipeline = new QualityPipeline(Presets.forkDataCleaning(Seq("en")))
    pipeline.run(docs).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gopher_quality" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"),
          gopherReasonUdf(col("text")).as("reason"))
        .withColumn("keep", col("reason") === "")
        .orderBy("doc_id")
    }),
    "token_count" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), tokenCountUdf(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    }),
    "exact_dedup" -> ((s, dir) => {
      // exact text dedup: hash-groupBy, deterministic survivor = min doc_id
      documents(s, dir)
        .groupBy(col("text"))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
        .select("doc_id", "dup_count")
        .orderBy("doc_id")
    }),
    "url_dedup" -> ((s, dir) => {
      // dedup-with-priority (dedup/url_dedup.py:45-62): highest priority
      // survives, ties broken by lowest doc_id — encoded as one min_by score
      documents(s, dir)
        .withColumn("url_key", concat(col("source"), lit("/"), (col("doc_id") % 37).cast("string")))
        .withColumn("priority", col("doc_id") % 5)
        .groupBy("url_key")
        .agg(expr("min_by(doc_id, doc_id - priority * 10000000)").as("doc_id"))
        .select("url_key", "doc_id")
        .orderBy("url_key")
    }),
    "pii_scrub" -> ((s, dir) => {
      // plant one email + one public IP per doc, scrub both
      documents(s, dir)
        .withColumn("text2", concat(
          col("text"), lit(" contact a"), col("doc_id"),
          lit("@ex"), col("doc_id") % 7, lit(".com or 57.120.21."),
          col("doc_id") % 200, lit(" now")))
        .select(col("doc_id"), piiScrubUdf(col("text2")).as("scrubbed"))
        .orderBy("doc_id")
    }),
    "gopher_repetition" -> ((s, dir) => {
      // full repetition kernel (sequential n-gram scan — not SQL-expressible;
      // rows-only check)
      documents(s, dir)
        .select(col("doc_id"), gopherRepetitionUdf(col("text")).as("reason"))
        .withColumn("keep", col("reason") === "")
        .orderBy("doc_id")
    }),
    "fineweb_quality" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), fineWebReasonUdf(col("text")).as("reason"))
        .orderBy("doc_id")
    }),
    "language_id" -> ((s, dir) => {
      // heuristic LID labels (no SQL equivalent; rows-only check)
      documents(s, dir)
        .select(col("doc_id"), langUdf(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    })
  )

  private val stopList = "['the','be','to','of','and','that','have','with']"

  def oracleSql: Map[String, String] = Map(
    "gopher_quality" ->
      s"""WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words FROM documents
), m AS (
  SELECT doc_id,
    len(words) AS n,
    list_aggregate(list_transform(words, x -> length(x)), 'sum') AS sumlen,
    len(list_intersect(list_distinct(words), $stopList)) AS stops
  FROM w
)
SELECT doc_id,
  CASE WHEN n < 40 THEN 'gopher_short_doc'
       WHEN n > 100000 THEN 'gopher_long_doc'
       WHEN sumlen < 3*n THEN 'gopher_below_avg_threshold'
       WHEN sumlen > 10*n THEN 'gopher_above_avg_threshold'
       WHEN stops < 1 THEN 'gopher_enough_stop_words'
       ELSE '' END AS reason,
  (CASE WHEN n < 40 THEN 'gopher_short_doc'
       WHEN n > 100000 THEN 'gopher_long_doc'
       WHEN sumlen < 3*n THEN 'gopher_below_avg_threshold'
       WHEN sumlen > 10*n THEN 'gopher_above_avg_threshold'
       WHEN stops < 1 THEN 'gopher_enough_stop_words'
       ELSE '' END) = '' AS keep
FROM m ORDER BY doc_id""",
    "token_count" ->
      """SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id""",
    "exact_dedup" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY text ORDER BY doc_id""",
    "url_dedup" ->
      """SELECT source || '/' || CAST(doc_id % 37 AS VARCHAR) AS url_key,
  min_by(doc_id, doc_id - (doc_id % 5) * 10000000) AS doc_id
FROM documents GROUP BY 1 ORDER BY url_key""",
    "pii_scrub" ->
      """SELECT doc_id,
  regexp_replace(
    regexp_replace(
      text || ' contact a' || doc_id || '@ex' || (doc_id % 7) || '.com or 57.120.21.' || (doc_id % 200) || ' now',
      '[A-Za-z0-9]+@[A-Za-z0-9]+(\.[A-Za-z0-9]+)+', 'email@example.com', 'g'),
    '(\d{1,3}\.){3}\d{1,3}', '22.214.171.124', 'g') AS scrubbed
FROM documents ORDER BY doc_id"""
  )
}
