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
    spark.stop()
  }
}
