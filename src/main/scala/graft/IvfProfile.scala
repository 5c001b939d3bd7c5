package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Stage-level timing breakdown for ivfTopK and the forced distributed
  * connected-components path — attributes their bench cost to phases
  * (sampling, centroid training, cell assign, cell join + pair scoring,
  * ranking; edge materialization, label init, propagation rounds) so the
  * optimization targets the measured phase, not a guess. */
object IvfProfile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[ivf-profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    implicit val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df: DataFrame = SparkEntry.plantedCliqueEmbeddings(spark, dir)
    t("input count") { df.count() }

    // --- ivfTopK decomposition (mirrors Similarity.ivfTopK) ---
    val sample: Array[Array[Float]] = t("sample collect (8192)") {
      df.select(col("embedding").cast("array<float>")).limit(8192)
        .as[Seq[Float]].collect().map(_.toArray)
    }
    val cents = t("trainCentroids driver (64c,5it)") {
      spark.sparkContext.broadcast(Similarity.trainCentroids(sample, 64, 5))
    }
    val cellUdf = udf { v: Array[Float] => Similarity.nearestCentroid(v, cents.value) }
    val probeUdf = udf { v: Array[Float] => Similarity.nearestCells(v, cents.value, 1) }
    def normCol(v: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(v.cast("array<double>"), x => x * x), lit(0.0), (acc, x) => acc + x))
    val base = df
      .select(col("doc_id").as("__id"),
        col("embedding").cast("array<float>").as("__v"), normCol(col("embedding")).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("base materialize") { base.count() }
    val data = base.select(col("__id").as("neighbor"), col("__v").as("__nv"),
      col("__n").as("__nn"), cellUdf(col("__v")).as("__cell"))
    val queries = base.select(col("__id").as("__qid"), col("__v").as("__qv"),
      col("__n").as("__qn"), explode(probeUdf(col("__v"))).as("__cell"))
    t("cell assign only (data count)") { data.count() }
    val joined = queries.join(data, Seq("__cell"))
      .where(col("__qid") =!= col("neighbor"))
    val nPairs = t("cell join pair count") { joined.count() }
    println(s"[ivf-profile] candidate pairs = $nPairs")
    val dotUdf = udf { (a: Array[Float], b: Array[Float]) =>
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val scored = joined
      .withColumn("cosine", dotUdf(col("__qv"), col("__nv")) / (col("__qn") * col("__nn")))
      .select(col("__qid"), col("neighbor"), col("cosine"))
    t("score pairs (agg count)") { scored.agg(sum("cosine")).first() }
    t("score + k=1 hash agg (noop)") {
      scored.groupBy("__qid")
        .agg(min(struct(negate(col("cosine")).as("__nc"), col("neighbor"),
          col("cosine"))).as("__best"))
        .write.format("noop").mode("overwrite").save()
    }
    base.unpersist()

    // --- forced distributed components decomposition ---
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val bse = docs.agg(max("doc_id")).first().getLong(0) + 1L
    val twins = docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(bse)).as("doc_id"), col("text"))
    val all = docs.unionByName(twins)
    val sigs = MinhashDedup.signatures(all, "doc_id", "text")
    val edges = MinhashDedup.duplicateEdges(sigs).cache()
    val nE = t("edges materialize (count)") { edges.count() }
    println(s"[ivf-profile] edges = $nE")
    t("edges re-count (cached)") { edges.count() }
    val und = edges.select(col("doc").as("u"), col("rep").as("v"))
      .union(edges.select(col("rep").as("u"), col("doc").as("v")))
      .cache()
    t("und materialize") { und.count() }
    val labels = und.select(col("u").as("doc"), col("u").as("cluster"))
      .union(und.select(col("u").as("doc"), col("v").as("cluster")))
      .groupBy("doc").agg(min("cluster").as("cluster"))
      .cache()
    t("labels init + sum") {
      labels.agg(sum(col("cluster").cast(org.apache.spark.sql.types.DecimalType(38, 0)))).first()
    }
    t("one propagation round + sum") {
      val viaEdges = und.join(labels, und("v") === labels("doc"))
        .select(und("u").as("doc"), col("cluster"))
      val afterNeighbors = viaEdges.union(labels)
        .groupBy("doc").agg(min("cluster").as("cluster"))
      val next = afterNeighbors.as("l")
        .join(afterNeighbors.as("r"), col("l.cluster") === col("r.doc"), "left")
        .select(col("l.doc").as("doc"),
          least(col("l.cluster"), coalesce(col("r.cluster"), col("l.cluster"))).as("cluster"))
      next.agg(sum(col("cluster").cast(org.apache.spark.sql.types.DecimalType(38, 0)))).first()
    }
    spark.stop()
  }
}
