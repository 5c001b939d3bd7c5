package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.WebCorpusGen
object PlanAudit {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = Bench.ensureCorpus(spark, 2000)
    val corpus = spark.read.parquet(path)
    println("=== PIPELINE PLAN (expect: ReadSchema WITHOUT html — pruned) ===")
    val pipeline = new QualityPipeline(Presets.fineweb())
    pipeline.run(corpus).filter(_.keep).queryExecution.executedPlan
      .foreach(p => ())
    println(pipeline.run(corpus).filter(_.keep).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(3000))
    println("=== FILTER-PUSHDOWN (expect PushedFilters on lang) ===")
    println(corpus.where(col("lang") === "en").select("url").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(1800))

    println("=== SAMPLER PLAN (expect NO Window operator — distributed prefix sums) ===")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("score", col("doc_id")).withColumn("tokens", lit(10L))
    val samplerPlan = Sampling.hardTopByTokens(docs, "score", "tokens", 1000L)
      .queryExecution.executedPlan.toString
    println(if (samplerPlan.contains("Window")) "FAIL: Window found" else "OK: no Window")

    println("=== MINHASH EDGES (expect window-min, NO collect_list) ===")
    val edges = MinhashDedup.duplicateEdges(
      MinhashDedup.signatures(docs, "doc_id", "text"))
      .queryExecution.executedPlan.toString
    println(if (edges.toLowerCase.contains("collect_list")) "FAIL: collect_list" else "OK: no collect_list")
    spark.stop()
  }
}
