package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{CacheRegistry, Presets, UrlFilter}
import graft.sources.WebCorpusGen

/** Round-5 streaming at-scale smoke (VERDICT r4 "Next round" #6), raised
  * to sf1 in round 7 (VERDICT r6 "Next round" #7): the streaming path's
  * only prior evidence was the 1000-doc MemoryStream oracle + unit tests.
  * This drives the REAL file-source path over the corpus
  * (SPARK_GRAFT_STREAM_ROWS, default 200k; the r7 evidence runs 2M):
  *
  *   corpus → 20 time-ordered parquet chunks (1 simulated ingest-minute
  *   apart, like successive CC dump shards) → readStream
  *   maxFilesPerTrigger=1 → full quality pipeline → stateful streaming
  *   exact dedup (flatMapGroupsWithState, event-time TTL) → noop sink
  *
  * and reports per-batch rows/s plus state-store rows, asserting BOUNDED
  * STATE: with a 3-minute TTL against a 30-second watermark, keys older
  * than ~4 chunks must be evicted, so the final state-row count stays far
  * below the cumulative distinct-key count.
  *
  *   sbt -batch "runMain graft.StreamingSmoke"
  */
object StreamingSmoke {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_STATE_STORE=rocksdb swaps the default HDFS-backed state
    // store for RocksDB (changelog checkpointing): the per-batch cost of
    // the keyed dedup is state-store-bound, and RocksDB keeps state off
    // the JVM heap with incremental snapshots — the scale-path store for
    // large keyed state. Measured at 2M in BENCH.md.
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").contains("rocksdb")) {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      builder.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark

    val rows = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "200000").toLong
    val corpusPath = Bench.ensureCorpus(spark, rows)
    val srcDir = s"/tmp/graft_stream_src_$rows"
    val nChunks = 20
    val baseTs = 1700000000000L
    if (!new java.io.File(s"$srcDir/_chunks_done").exists()) {
      val corpus = spark.read.parquet(corpusPath)
        .withColumn("__chunk", pmod(xxhash64(col("url")), lit(nChunks)))
      // one file per chunk, written in ingest order (the file source lists
      // by modification time), each chunk one simulated minute of ingest;
      // html dropped — the pipeline never reads it
      for (i <- 0 until nChunks) {
        corpus.where(col("__chunk") === i)
          .withColumn("warc_ts",
            (lit(baseTs + i * 60000L) / 1000).cast("timestamp"))
          .select("url", "warc_ts", "text", "lang")
          .coalesce(1)
          .write.mode(if (i == 0) "overwrite" else "append").parquet(srcDir)
        Thread.sleep(1100) // distinct mtimes → deterministic source order
      }
      new java.io.File(s"$srcDir/_chunks_done").createNewFile()
    }

    val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_TRIGGER_FILES", "1").toInt
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger).parquet(srcDir)

    val stages = Presets.fineweb(
      urlFilter = new UrlFilter(blockListedDomains = WebCorpusGen.BlockedDomains),
      languages = Some(Seq("en")),
      badwords = WebCorpusGen.BadWordsFixture.asMap)
    val piped = graft.streaming.StreamingQuality.run(stream, stages)
      .filter(_.keep)
    val dedup = graft.streaming.StreamingQuality.streamingExactDedup(
      piped, watermarkDelay = "30 seconds", stateTtlMs = 3L * 60 * 1000)

    val ckpt = s"/tmp/graft_stream_ckpt_${System.nanoTime()}"
    val q = dedup.toDF().writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val t0 = System.nanoTime()
    try q.processAllAvailable() finally q.stop()
    val totalSec = (System.nanoTime() - t0) / 1e9

    var cumulativeIn = 0L
    var maxState = 0L
    var totalRemoved = 0L
    var lastState = 0L
    q.recentProgress.foreach { p =>
      val so = p.stateOperators
      val stateRows = if (so.nonEmpty) so(0).numRowsTotal else 0L
      val removed = if (so.nonEmpty) so(0).numRowsRemoved else 0L
      cumulativeIn += p.numInputRows
      maxState = math.max(maxState, stateRows)
      totalRemoved += removed
      lastState = stateRows
      println(f"""{"batch":${p.batchId},"input_rows":${p.numInputRows},"rows_per_sec":${p.processedRowsPerSecond}%.0f,"state_rows":$stateRows,"state_removed":$removed}""")
    }
    val docsPerSec = cumulativeIn / totalSec
    println(f"""{"metric":"streaming_smoke","rows":$cumulativeIn,"total_sec":$totalSec%.1f,"docs_per_sec":${docsPerSec.toLong},"max_state_rows":$maxState,"final_state_rows":$lastState,"state_evicted":$totalRemoved}""")
    // bounded-state assertion: TTL eviction actually fired and the state
    // store never held anywhere near the cumulative distinct-key count
    require(totalRemoved > 0, "no TTL eviction observed")
    // rows-proportional bound: 80k at the original 200k smoke (~5 chunks of
    // kept keys out of 20), scaling linearly — at 2M this demands the state
    // store hold < 800k rows while 1.26M kept keys stream through, i.e. TTL
    // eviction must keep pace at 10x the originally-evidenced volume
    val stateBound = rows * 80000L / 200000L
    require(maxState < stateBound,
      s"state unbounded: $maxState rows (bound $stateBound = ~5 chunks of keys at $rows rows)")
    CacheRegistry.clearAll()
    spark.stop()
  }
}
