package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two strategies:
  *  - bruteForceTopK: exact all-pairs cosine via a (broadcast-friendly)
  *    self-join and native array expressions — the correctness baseline,
  *    O(n²·d); fine for one partition's block, not for 10^12 rows.
  *  - lshTopK: random-hyperplane LSH — signatures computed with seeded
  *    deterministic hyperplanes, banded into buckets so candidate pairs
  *    only form inside buckets (one groupBy shuffle), then exact cosine
  *    verification on the candidates. The scale path: cost ∝ bucket sizes,
  *    not n².
  */
object Similarity {

  /** cos(a,b) as a native column expression (arrays cast to double;
    * left-to-right accumulation — bit-compatible with the DuckDB oracle). */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"), _ * _),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a.cast("array<double>"), x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b.cast("array<double>"), x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** dot(a,b)/(na*nb) with precomputed norms — the norms are computed once
    * per row (not per pair) and the left-to-right double accumulation stays
    * bit-identical to the oracle's per-pair formula. */
  // Array[Float] (not Seq[Float]) parameters: Spark 4's Seq deserializer
  // hands the UDF a LINEAR sequence, turning every indexed inner loop into
  // O(n^2) boxed pointer chasing — measured 23x slower on the 64-dim LSH
  // bucket kernel (AnnProfile). Array keeps the primitive fast path.
  private val dotUdf = udf { (a: Array[Float], b: Array[Float]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def normCol(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sqrt(aggregate(transform(v.cast("array<double>"), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Exact top-k neighbors per row. Physical strategy: broadcast the
    * (small) candidate side as primitive float arrays and scan it per
    * query row inside mapPartitions with a bounded top-k heap — the same
    * block-broadcast pattern MLlib uses for BLAS-style ops. A crossJoin
    * materializes n² wide rows; this computes the identical cosine
    * (ordered double accumulation, /(qn·nn)) at memory cost O(n·d).
    * Returns (idCol, neighbor, cosine, rank). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
                     maxRows: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // this path collects every vector to the driver — exact, but NOT the
    // 100 TB path; refuse loudly instead of OOMing the driver
    // (limit() takes an Int — fall back to a full count for huge maxRows so
    // a raised cap can't overflow the guard into a false pass)
    val cnt =
      if (maxRows >= Int.MaxValue - 1) df.count()
      else df.limit((maxRows + 1).toInt).count()
    require(cnt <= maxRows,
      s"bruteForceTopK broadcasts the full table from the driver; >$maxRows rows " +
      s"found — use lshTopK (LSH-bucketed) for large inputs, or raise maxRows explicitly")
    val items: Array[(Long, Array[Float])] = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.toArray) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(items)
    val kk = k

    val queries = df.select(col(idCol).cast("long").as("__qid"), col(vecCol).cast("array<float>").as("__qv"))
      .as[(Long, Seq[Float])]
    queries.mapPartitions { it =>
      val cand = bc.value
      val norms = cand.map { case (_, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
        math.sqrt(s)
      }
      it.flatMap { case (qid, qv0) =>
        val qv = qv0.toArray
        var qn = 0.0
        var i = 0
        while (i < qv.length) { qn += qv(i).toDouble * qv(i).toDouble; i += 1 }
        val qnorm = math.sqrt(qn)
        // bounded selection: keep the kk best (cosine desc, neighbor asc)
        val best = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by { case (c, id) => (-c, id) }) // worst-first
        var j = 0
        while (j < cand.length) {
          val (nid, nv) = cand(j)
          if (nid != qid) {
            var dot = 0.0
            var d = 0
            val len = math.min(qv.length, nv.length)
            while (d < len) { dot += qv(d).toDouble * nv(d).toDouble; d += 1 }
            val cos = dot / (qnorm * norms(j))
            if (best.size < kk) best.enqueue((cos, nid))
            else {
              val (wc, wid) = best.head
              if (cos > wc || (cos == wc && nid < wid)) { best.dequeue(); best.enqueue((cos, nid)) }
            }
          }
          j += 1
        }
        best.toArray.sortBy { case (c, id) => (-c, id) }.zipWithIndex.map {
          case ((c, nid), rank) => (qid, nid, c, rank + 1)
        }
      }
    }.toDF(idCol, "neighbor", "cosine", "rank")
  }

  /** Deterministic pseudo-random unit-free hyperplanes from a seed. */
  private[graft] def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    var s = seed
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // Box-Muller-free: sum of 4 uniforms ≈ gaussian enough for LSH planes
    Array.fill(bits, dim) {
      ((next() >>> 11) * 1.1102230246251565e-16) +
      ((next() >>> 11) * 1.1102230246251565e-16) +
      ((next() >>> 11) * 1.1102230246251565e-16) +
      ((next() >>> 11) * 1.1102230246251565e-16) - 2.0
    }
  }

  /** Approximate top-k via random-hyperplane LSH with `bands` bucket
    * families of `bitsPerBand` bits each. Recall rises with bands. */
  /** @param prefilterSingletonBuckets a bucket with one member can only
    *   yield its self-pair (filtered out below), so it can never produce a
    *   candidate: when ON, an 8-byte bucket+count pass over the persisted
    *   id-bucket projection finds the multi-member buckets and a broadcast
    *   semi-join keeps singleton rows out of BOTH self-join exchanges.
    *   Output-identical by construction (DupCandidates) — but OFF by
    *   default, measured honestly: at the 8-bit band default every bucket
    *   is multi-member at any real scale (pure overhead), and even at
    *   2M×24-bit bands the occupancy λ≈1 puts ~63% of rows in multi
    *   buckets (birthday), so the count pass pays back what the filter
    *   saves (measured 4,141 vs 4,135 MB — a wash). Turn ON only for
    *   very wide bands over well-spread vectors where singleton share
    *   dominates. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              bands: Int = 8, bitsPerBand: Int = 8, seed: Long = 42L,
              prefilterSingletonBuckets: Boolean = false)
             (implicit spark: SparkSession): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val planes = spark.sparkContext.broadcast(hyperplanes(dim, bands * bitsPerBand, seed))
    val nb = bands
    val bpb = bitsPerBand

    val bucketUdf = udf { vec: Array[Float] =>
      val p = planes.value
      val bits = new Array[Boolean](p.length)
      var i = 0
      while (i < p.length) {
        var dot = 0.0
        val plane = p(i)
        var j = 0
        while (j < plane.length && j < vec.length) { dot += plane(j) * vec(j); j += 1 }
        bits(i) = dot >= 0
        i += 1
      }
      (0 until nb).map { b =>
        var key = 0L
        var j = 0
        while (j < bpb) { key = (key << 1) | (if (bits(b * bpb + j)) 1L else 0L); j += 1 }
        (b.toLong << 32) | key
      }.toArray
    }

    // Shuffle discipline: the bucket self-join and the pair-dedup move IDS
    // ONLY — the fat embedding arrays never ride through the n²-ish part of
    // the plan. The id-bucket projection is persisted so both join sides
    // reuse one computation (instead of re-hashing every vector twice), and
    // vectors join back per unique candidate pair at the end (two id-key
    // joins that AQE can broadcast when one side is small).
    // base is consumed three times (bucket build, query-side join,
    // neighbor-side join): persist the (id, vec, norm) projection so the
    // input lineage + norm computation run once (r8). Rotating key — a
    // caller may build a second lshTopK (e.g. cosineNearDupes after
    // ann_lsh_topk) before this one's consumers have executed.
    val base = CacheRegistry.swapRotating("similarity.lshBase", df
      .select(col(idCol).as("__qid"),
        col(vecCol).cast("array<float>").as("__qv"), normCol(col(vecCol)).as("__qn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val bucketed = CacheRegistry.swap("similarity.lshBuckets", base
      .select(col("__qid"), explode(bucketUdf(col("__qv"))).as("__bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val cand =
      if (prefilterSingletonBuckets)
        DupCandidates.filterToDupKeys(bucketed, Seq("__bucket"))
      else bucketed
    val pairs = cand
      .join(cand.withColumnRenamed("__qid", "neighbor"), Seq("__bucket"))
      .where(col("__qid") =!= col("neighbor"))
      .select("__qid", "neighbor")
      .dropDuplicates("__qid", "neighbor")

    val nside = base.select(col("__qid").as("neighbor"),
      col("__qv").as("__nv"), col("__qn").as("__nn"))
    val scored = pairs
      .join(base, Seq("__qid"))
      .join(nside, Seq("neighbor"))
      .withColumn("cosine", dotUdf(col("__qv"), col("__nv")) / (col("__qn") * col("__nn")))
      .select(col("__qid"), col("neighbor"), col("cosine"))
    topKPerQuery(scored, k).select(col("__qid").as(idCol),
      col("neighbor"), col("cosine"), col("rank"))
  }

  /** Per-query top-k by (cosine desc, neighbor asc) over slim
    * (__qid, neighbor, cosine) rows. k == 1 (the common ANN-query case)
    * takes a groupBy min-struct — a hash aggregate with map-side partial
    * aggregation and NO per-group sort, so a hot query id combines before
    * the exchange; k > 1 keeps the row_number window. The min-struct
    * winner equals the window's rank-1 row: min(-cosine) = max(cosine)
    * for the finite cosines here, ties fall to min(neighbor) in both. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    if (k == 1) {
      scored
        .groupBy("__qid")
        .agg(min(struct(negate(col("cosine")).as("__nc"), col("neighbor"),
          col("cosine"))).as("__best"))
        .select(col("__qid"), col("__best.neighbor").as("neighbor"),
          col("__best.cosine").as("cosine"), lit(1).as("rank"))
    } else {
      val w = Window.partitionBy("__qid").orderBy(desc("cosine"), asc("neighbor"))
      scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
        .select(col("__qid"), col("neighbor"), col("cosine"), col("rank"))
    }
  }

  /** Deterministic driver-side Lloyd k-means over a bounded sample — the
    * coarse quantizer for ivfTopK. Seeding: evenly spaced sample points
    * (deterministic, no RNG state dependence); empty cells keep their
    * previous centroid. Sample bias only affects cell BALANCE, never
    * correctness (every vector is searched within its assigned cells). */
  private[graft] def trainCentroids(sample: Array[Array[Float]], nLists: Int,
                                        iters: Int): Array[Array[Float]] = {
    val n = sample.length
    val kk = math.min(nLists, math.max(1, n))
    val dim = if (n == 0) 1 else sample(0).length
    val cents = Array.tabulate(kk)(i => sample((i.toLong * n / kk).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < n) {
        val c = nearestCentroid(sample(i), cents)
        var d = 0
        while (d < dim) { sums(c)(d) += sample(i)(d); d += 1 }
        counts(c) += 1
        i += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var d = 0
          while (d < dim) { cents(c)(d) = (sums(c)(d) / counts(c)).toFloat; d += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  private[graft] def nearestCentroid(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d2 = 0.0
      var d = 0
      val cc = cents(c)
      val len = math.min(v.length, cc.length)
      while (d < len) { val x = v(d) - cc(d); d2 += x * x; d += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  private[graft] def nearestCells(v: Array[Float], cents: Array[Array[Float]],
                                      nProbe: Int): Array[Int] = {
    val ds = cents.indices.map { c =>
      var d2 = 0.0
      var d = 0
      val cc = cents(c)
      val len = math.min(v.length, cc.length)
      while (d < len) { val x = v(d) - cc(d); d2 += x * x; d += 1 }
      (d2, c)
    }
    ds.sortBy(p => (p._1, p._2)).take(nProbe).map(_._2).toArray
  }

  /** IVF-flat approximate top-k: a coarse k-means quantizer partitions the
    * vectors into `nLists` cells; each query probes its `nProbe` nearest
    * cells and computes exact cosine only there. The scale path when LSH's
    * hyperplane bucketing fits poorly (clustered embeddings): candidates ∝
    * nProbe/nLists of the data per query, one cell-key shuffle join, AQE
    * skew-split on hot cells. Centroids train driver-side on a bounded
    * deterministic sample and broadcast (the classic IVF layout). */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              nLists: Int = 64, nProbe: Int = 8, kmeansIters: Int = 5,
              sampleSize: Int = 8192)
             (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // base is consumed twice (data side + query side), each side
    // re-running the input lineage and the norm fold: persist it (r8)
    val base = CacheRegistry.swapRotating("similarity.ivfBase", df
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<float>").as("__v"), normCol(col(vecCol)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // the k-means sample reads the persisted base (same projection, same
    // scan order ⇒ identical sample rows) instead of re-running the input
    // lineage in a separate job — the input is scanned once, not twice,
    // and the sample's partitions pre-fill the cache (r8 session 2)
    val sample: Array[Array[Float]] = base
      .select(col("__v")).limit(sampleSize)
      .as[Seq[Float]].collect().map(_.toArray)
    // Empty shards are a legitimate pipeline state: short-circuit with an
    // empty result (trainCentroids would index into the empty sample).
    if (sample.isEmpty)
      return df.select(col(idCol), col(idCol).as("neighbor"),
        lit(0.0).as("cosine"), lit(0).as("rank")).limit(0)
    val cents = spark.sparkContext.broadcast(trainCentroids(sample, nLists, kmeansIters))
    val np = nProbe

    val cellUdf = udf { v: Array[Float] => nearestCentroid(v, cents.value) }
    val probeUdf = udf { v: Array[Float] => nearestCells(v, cents.value, np) }
    val data = base.select(col("__id").as("neighbor"), col("__v").as("__nv"),
      col("__n").as("__nn"), cellUdf(col("__v")).as("__cell"))
    val queries = base.select(col("__id").as("__qid"), col("__v").as("__qv"),
      col("__n").as("__qn"), explode(probeUdf(col("__v"))).as("__cell"))

    val scored = queries.join(data, Seq("__cell"))
      .where(col("__qid") =!= col("neighbor"))
      .withColumn("cosine", dotUdf(col("__qv"), col("__nv")) / (col("__qn") * col("__nn")))
      // ids+cosine only through the ranking shuffle — the fat vectors must
      // not ride it
      .select(col("__qid"), col("neighbor"), col("cosine"))
    topKPerQuery(scored, k).select(col("__qid").as(idCol),
      col("neighbor"), col("cosine"), col("rank"))
  }

  /** Embedding near-duplicate detection: pairs with cosine ≥ threshold
    * (via LSH candidates), connected-components, min-id survivor.
    * k bounds neighbors per vector — clustering only needs CONNECTIVITY
    * (components close the transitive hull), so a mass-duplicated embedding
    * cluster doesn't need its full clique materialized; k=16 links even a
    * huge duplicate group into one component with high probability while
    * capping the window/edge volume. */
  def cosineNearDupes(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double = 0.95, bands: Int = 16, bitsPerBand: Int = 8,
                      k: Int = 16)
                     (implicit spark: SparkSession): DataFrame = {
    // Collapse byte-identical vectors FIRST: they are near-dups by
    // definition (cosine 1 ≥ any threshold), and a mass-duplicated
    // embedding would otherwise regenerate its full clique in every LSH
    // band — the dominant degenerate case at web scale. LSH then runs over
    // DISTINCT vectors only.
    // r8 shape: vector identity is a 128-bit pair of independent xxhash64
    // folds, so the collapse groupBy and the rep join-back move 16-byte
    // keys instead of the fat embedding arrays (the r7 shape grouped and
    // null-safe-joined on the full array<float>). False identity needs
    // both 64-bit hashes to collide on different vectors: ~2^-128 per
    // pair, ≪ 1 expected even at 10^12 rows — the same analysis as the
    // minhash band folds and ExactSubstrDedup.spanHashes. The fat table
    // is touched by one broadcastable semi-join (rep ids) only.
    val v = col(vecCol).cast("array<float>")
    val slim = df.select(col(idCol), xxhash64(v).as("__vh1"),
      xxhash64(v, lit(0x9E3779B97F4A7C15L)).as("__vh2"))
    val reps = slim.groupBy("__vh1", "__vh2").agg(min(col(idCol)).as("__rep"))
    val withRep = slim.join(reps, Seq("__vh1", "__vh2"))
    val exactEdges = withRep.where(col(idCol) =!= col("__rep"))
      .select(col(idCol).as("doc"), col("__rep").as("rep"))
    val uniques = df.join(
      withRep.where(col(idCol) === col("__rep")).select(col(idCol)),
      Seq(idCol), "left_semi")
      .select(col(idCol), col(vecCol))
    val top = lshTopK(uniques, idCol, vecCol, k = k, bands = bands, bitsPerBand = bitsPerBand)
    val lshEdges = top.where(col("cosine") >= threshold)
      .select(col(idCol).as("doc"), col("neighbor").as("rep"))
      .where(col("doc") =!= col("rep"))
    val comps = MinhashDedup.components(exactEdges.union(lshEdges))
    df.join(comps.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .withColumn("cosine_cluster", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
      .withColumn("cosine_keep", col("cosine_cluster") === col(idCol))
  }
}
