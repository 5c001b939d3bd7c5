package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.plans.Checkpoint
import graft.sources.{WebCorpusGen, Writers}

/** The production job: spark-submit entry point running the full quality
  * pipeline over a web-pages table with checkpointed stages, quarantine
  * output, and per-partition lineage metrics (north rule: resumable from
  * the last committed snapshot, per-partition lineage + metrics).
  *
  *   spark-submit --class graft.RunPipeline engine.jar \
  *     --input  /path/web_pages_parquet   (or synth:N for the seeded corpus)
  *     --output /path/out                  \
  *     [--preset fineweb|fork] [--languages en,fr] [--extract-html]
  *
  * Stage layout under --output:
  *   stage_filtered/   committed verdict table (resume skip point)
  *   kept/ quarantine/ final split outputs
  *   _metrics/         per-partition drop-reason lineage
  */
object RunPipeline {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("--") =>
      k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val input = opts.getOrElse("input", sys.error("--input required"))
    val output = opts.getOrElse("output", sys.error("--output required"))
    val preset = opts.getOrElse("preset", "fineweb")
    val languages = opts.getOrElse("languages", "en").split(",").toSeq

    // master/conf come from spark-submit in production; local[*] fallback
    // lets the job run standalone in this sandbox
    implicit val spark: SparkSession = SparkSession.builder()
      .appName("graft-quality-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // CPU-bound text kernels want small read splits (BENCH.md)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .master(spark_masterOrLocal())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw: DataFrame =
      if (input.startsWith("synth:")) WebCorpusGen.generate(spark, input.stripPrefix("synth:").toLong)
      else spark.read.parquet(input)

    val pages =
      if (opts.contains("extract-html"))
        ExtractStage(raw, "html", "text").where(col("extract_ok"))
      else raw

    val stages = preset match {
      case "fork" => Presets.forkDataCleaning(languages)
      case _ => Presets.fineweb(languages = Some(languages),
        badwords = WebCorpusGen.BadWordsFixture.asMap)
    }

    val ckpt = new Checkpoint(output)
    val pipeline = new QualityPipeline(stages)

    // stage 1: filter verdicts — committed, resumable
    val filtered = ckpt.stage("stage_filtered") {
      pipeline.run(pages.select("url", "warc_ts", "text", "lang")).toDF()
    }
    // lineage metrics (north rule)
    ckpt.writeMetrics("stage_filtered", pipeline.metricsOf(filtered))

    // stage 2: split kept vs quarantine
    if (!ckpt.isCommitted("kept")) {
      Writers.withQuarantine(filtered, ckpt.stagePath("kept"), s"$output/quarantine")
    }
    val kept = spark.read.parquet(ckpt.stagePath("kept")).count()
    val total = filtered.count()
    println(s"""{"event":"pipeline_done","total":$total,"kept":$kept,"output":"$output"}""")
    spark.stop()
  }

  private def spark_masterOrLocal(): String =
    sys.props.get("spark.master").orElse(sys.env.get("MASTER")).getOrElse("local[*]")
}
