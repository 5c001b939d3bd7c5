package graft

import org.apache.spark.sql.SparkSession

/** Extra (non-driver) benchmarks for optimization rounds: isolates the
  * headline pipeline with the exact Bench methodology (same session conf,
  * same corpus, best-of-N) without paying a full 88-query run. Does NOT
  * replace graft.Bench — the driver artifact stays the frozen harness. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (768 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.noiseProbe() // JIT warm
    val rows = Bench.corpusRows(sfDir)
    Bench.pipelineDocsPerSec(spark, math.max(rows / 10, 1000)) // JIT warmup
    graft.operators.CacheRegistry.clearAll()
    spark.catalog.clearCache()
    System.gc()
    val probeStart = Bench.noiseProbe()
    val secs = (1 to reps).map { r =>
      val (sec, kept) = Bench.pipelineDocsPerSec(spark, rows)
      println(f"""{"rep":$r,"sec":$sec%.3f,"kept":$kept,"docs_per_sec":${(rows / sec).toLong}}""")
      sec
    }
    val probeEnd = Bench.noiseProbe()
    println(f"""{"metric":"pipeline_best","value":${secs.min}%.3f,"unit":"sec","docs_per_sec":${(rows / secs.min).toLong},"probe_start":$probeStart%.3f,"probe_end":$probeEnd%.3f}""")
    spark.stop()
  }
}
