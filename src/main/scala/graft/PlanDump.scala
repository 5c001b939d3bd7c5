package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named SparkEntry queries to files —
  * the before/after plan evidence for the optimization rounds.
  *
  *   sbt -batch "runMain graft.PlanDump /root/testdata/sf0.1 plans/r08 _before q1,q2"
  *
  * Uses the same session config as Bench so plans match what the bench
  * executes. Queries whose construction runs eager driver actions (sizing
  * counts, collects) pay them here too — the dumped plan is the final
  * returned DataFrame's. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2|all]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names =
      if (args.length < 4 || args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").toSeq
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (768 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(outDir.resolve(s"$n$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"dumped $n$suffix")
      } catch {
        case e: Throwable => println(s"FAILED $n: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
