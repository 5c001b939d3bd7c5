package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.text.{TextKernels, Tokenizer}

/** Bloom-filter shingle dedup (dedup/bloom_filter.py:66-210): stream docs
  * through a bloom filter of 13-gram shingles; drop a doc when more than
  * `dupThreshold` of its shingles were already seen.
  *
  * The reference runs this on a single task and is inherently
  * order-dependent (the filter mutates as docs stream — bloom_filter.py is
  * single-worker only). The Spark version applies one bloom filter per
  * partition after an optional repartition-by-key, which preserves the
  * semantics *within* a partition and is documented as approximate across
  * partitions — the exact-global alternative is MinhashDedup/ExactDedup.
  */
final case class BloomDedupConfig(
    nGrams: Int = 13,
    dupThreshold: Double = 0.8,
    bitsPerPartition: Int = 1 << 24, // 16 Mbit ≈ 2 MB per partition
    numHashes: Int = 7)

object BloomDedup {

  def apply(df: DataFrame, idCol: String, textCol: String,
            cfg: BloomDedupConfig = BloomDedupConfig())
           (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val n = cfg.nGrams
    val m = cfg.bitsPerPartition
    val k = cfg.numHashes
    val thr = cfg.dupThreshold

    val out = df.select(col(idCol).cast("string").as("__id"), col(textCol).as("__text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val bits = new java.util.BitSet(m)
        it.map { case (id, text) =>
          val words = Tokenizer.words(TextKernels.simplifyText(text))
          val shingles =
            if (words.length < n) Array.empty[Long]
            else (0 to words.length - n).map(i => Hashes.xxhash64(words.slice(i, i + n).mkString(" "))).toArray
          // Two-phase like the reference's step() (bloom_filter.py): query
          // ALL of the doc's shingles against the pre-doc filter state first,
          // and only then set the missed bits — so a 13-gram repeated
          // *within* one doc never counts as a duplicate against itself.
          var dups = 0
          val missed = new scala.collection.mutable.ArrayBuffer[Int]()
          for (h <- shingles) {
            var allSet = true
            var j = 0
            while (j < k) {
              // double hashing: h_j = h + j * (h >>> 32)
              val idx = (((h + j.toLong * (h >>> 32)) % m + m) % m).toInt
              if (!bits.get(idx)) { allSet = false; missed += idx }
              j += 1
            }
            if (allSet) dups += 1
          }
          missed.foreach(bits.set)
          val keep = shingles.isEmpty || dups.toDouble / shingles.length <= thr
          (id, keep)
        }
      }
      .toDF("__id", "bloom_keep")
    df.join(out.withColumnRenamed("__id", "__joinid"),
        col(idCol).cast("string") === col("__joinid"), "left")
      .drop("__joinid")
  }
}
