package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{MinhashDedup, MinhashDedupConfig}
import graft.sources.WebCorpusGen

/** MinHash dedup at a realistic near-duplicate rate: 20% of docs are
  * perturbed copies of a neighbor (~3% word replacement — above the LSH
  * design threshold s≈0.72). Reports docs/sec through the full sig →
  * bucket-group → components → join flow and the dup-detection counts.
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // base corpus + planted near-duplicates: id%5==0 docs become light
    // perturbations of their predecessor (same doc, a few words swapped)
    val corpus = spark.range(0, rows, 1, 256).as[Long].map { id =>
      val baseId = if (id % 5 == 0 && id > 0) id - 1 else id
      val (text0, _) = WebCorpusGen.genText(baseId, 42L)
      val text =
        if (id % 5 == 0 && id > 0) {
          val words = text0.split(" ")
          val rng = new java.util.Random(id)
          (0 until math.max(1, words.length / 40)).foreach { _ =>
            words(rng.nextInt(words.length)) = "perturbed" + rng.nextInt(100)
          }
          words.mkString(" ")
        } else text0
      (id, text)
    }.toDF("doc_id", "text")
    corpus.cache().count()

    val t0 = System.nanoTime()
    val out = MinhashDedup.dedup(corpus, "doc_id", "text", MinhashDedupConfig())
    val removed = out.where(!col("minhash_keep")).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val expected = rows / 5 // one per planted pair (minus misses)
    println(f"""{"metric":"minhash_dedup_docs_per_sec","value":${(rows / sec).toLong},"unit":"docs/sec","rows":$rows,"seconds":$sec%.1f,"removed":$removed,"planted_dups":$expected,"recall":${removed.toDouble / expected}%.3f}""")
    spark.stop()
  }
}
