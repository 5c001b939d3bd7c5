package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule's two-cluster-size
  * criterion: the same job + same input at two parallelism levels
  * (local[8] vs local[32] — no real cluster in this sandbox), reporting
  * docs/sec at both and efficiency = rate(4N) / (4 × rate(N)).
  *
  * The pipeline is a single narrow pass over a deterministically generated
  * corpus, so the partition count (not data placement) is the only
  * variable. Results land in BENCH/BASELINE.md.
  */
object ScalingBench {

  private def runAt(cores: Int, rows: Long): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warmup (JIT, codegen) on a slice, then the measured run
      Bench.pipelineDocsPerSec(spark, math.max(rows / 10, 1000))
      val (sec, _) = Bench.pipelineDocsPerSec(spark, rows)
      rows / sec
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong
               else Bench.corpusRows(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val n4 = n * 4
    val rateN = runAt(n, rows)
    val rate4N = runAt(n4, rows)
    val eff = rate4N / (4.0 * rateN)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","docs_per_sec_n":${rateN.toLong},"docs_per_sec_4n":${rate4N.toLong},"n_cores":$n,"n4_cores":$n4,"rows":$rows}""")
  }
}
