package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-sequence reader over DocumentTokenizer `.ds` output — the
  * Spark-native equivalent of DatatroveFileDataset / DatatroveFolderDataset
  * (utils/dataset.py:25-345): each row is one fixed-length window of
  * `seqLen + 1` tokens, with optional per-token positions (token index
  * within its document) computed either from the `.ds.index` doc-end
  * offsets or by resetting after an EOS token id — both position
  * algorithms ported exactly (dataset.py:70-152, incl. the cumsum-of-
  * offsets construction and the inclusive `start < end <= window_end`
  * index filter).
  *
  * Spark-first shape: one row per window via `spark.range` over the global
  * window count, mapped with contiguous per-partition index ranges so each
  * task reads its file span SEQUENTIALLY (the access pattern the reference
  * optimizes for); the `.index` is loaded once per (task, file). Windows
  * never shuffle. Divergences: the torch Dataset loops indices modulo its
  * length (a DataLoader nicety) — a DataFrame yields each window exactly
  * once; file shuffling uses a seeded Fisher-Yates, not numpy's
  * permutation.
  */
object DsDataset {

  /** @param tokenSize 2 (uint16) or 4 (uint32; ids must fit in Int — the
    *                  reference widens to int64, vocab ids ≥ 2^31 are
    *                  rejected here rather than wrapped) */
  def read(spark: SparkSession, dir: String, seqLen: Int,
           tokenSize: Int = 2, returnPositions: Boolean = false,
           positionsFromEosTokenId: Option[Int] = None,
           filenameSuffix: String = ".ds",
           shuffleFiles: Boolean = false, seed: Long = 42L): DataFrame = {
    require(tokenSize == 2 || tokenSize == 4, s"tokenSize must be 2 or 4, got $tokenSize")
    require(seqLen > 0, "seqLen must be positive")
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(hconf.value)
    var files = fs.listStatus(dirPath).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(filenameSuffix))
      .sortBy(_.getPath.getName)
      .map(s => (s.getPath.toString, s.getLen))
    require(files.nonEmpty, s"no $filenameSuffix files under $dir")
    if (shuffleFiles) {
      val arr = files.toBuffer
      graft.operators.DocTokenizer.seededShuffle(arr, seed)
      files = arr.toSeq
    }
    val win = seqLen + 1
    // per-file full-window counts + global cumulative starts (dataset.py:63)
    val meta = files.map { case (p, len) => (p, (len / tokenSize) / win) }
    val cum = meta.scanLeft(0L)(_ + _._2)
    val total = cum.last
    val bcMeta = spark.sparkContext.broadcast(
      meta.zip(cum.dropRight(1)).map { case ((p, n), c) => (p, n, c) }.toArray)
    val bcConf = hconf
    val eos = positionsFromEosTokenId
    val wantPos = returnPositions

    import spark.implicits._
    val rows = spark.range(0, total).mapPartitions { it =>
      val metaArr = bcMeta.value
      var curFile = -1
      var in: org.apache.hadoop.fs.FSDataInputStream = null
      var ends: Array[Long] = null // token-offset doc ends of curFile
      // the lazily-consumed iterator has no natural close point: an
      // exhausted OR abandoned task (limit(), downstream failure) must
      // still release the last open stream, or every task pins a
      // connection on s3a/HDFS
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => if (in != null) in.close()))
      def open(fi: Int): Unit = {
        if (in != null) in.close()
        val (p, _, _) = metaArr(fi)
        val path = new org.apache.hadoop.fs.Path(p)
        val fsys = path.getFileSystem(bcConf.value)
        in = fsys.open(path)
        ends =
          if (wantPos && eos.isEmpty) {
            val ip = new org.apache.hadoop.fs.Path(p + ".index")
            val st = fsys.getFileStatus(ip)
            val buf = new Array[Byte](st.getLen.toInt)
            val is = fsys.open(ip)
            try is.readFully(0, buf) finally is.close()
            graft.operators.DocTokenizer.parseIndexEnds(buf)
          } else null
        curFile = fi
      }
      val bytes = new Array[Byte](win * tokenSize)
      it.map { gid =>
        // contiguous ranges per partition: linear scan forward is O(1) amortized
        var fi = if (curFile >= 0) curFile else 0
        while (gid >= metaArr(fi)._3 + metaArr(fi)._2) fi += 1
        while (gid < metaArr(fi)._3) fi -= 1
        if (fi != curFile) open(fi)
        val local = gid - metaArr(fi)._3
        in.readFully(local * win * tokenSize, bytes)
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val toks = new Array[Int](win)
        var i = 0
        while (i < win) {
          toks(i) =
            if (tokenSize == 2) bb.getShort & 0xffff
            else {
              val v = bb.getInt
              if (v < 0) throw new IllegalArgumentException(
                s"uint32 token id >= 2^31 at window $gid")
              v
            }
          i += 1
        }
        val pos: Array[Int] =
          if (!wantPos) null
          else eos match {
            case Some(e) => positionsFromTokens(toks, e)
            case None => positionsFromIndex(ends, local * win.toLong, seqLen)
          }
        (gid, toks, pos)
      }
    }.toDF("seq_id", "input_ids", "positions")
    if (wantPos) rows else rows.drop("positions")
  }

  /** dataset.py:70-127 (_get_pos_from_index_file): doc ends within
    * (windowStart, windowStart+seqLen] become local resets; positions are
    * the cumsum of a ones-vector with offsets planted at the resets. */
  def positionsFromIndex(ends: Array[Long], windowStart: Long, seqLen: Int): Array[Int] = {
    val windowEnd = windowStart + seqLen
    val local = scala.collection.mutable.ArrayBuffer(0)
    var i = java.util.Arrays.binarySearch(ends, windowStart + 1) match {
      case k if k >= 0 => k
      case k => -k - 1
    }
    // binarySearch lands on an arbitrary duplicate: walk back to the FIRST
    // qualifying entry so zero-token docs (equal consecutive ends) emit
    // every reset like the reference's inclusive filter does
    while (i > 0 && ends(i - 1) > windowStart) i -= 1
    while (i < ends.length && ends(i) <= windowEnd) {
      local += (ends(i) - windowStart).toInt
      i += 1
    }
    cumsumWithResets(local.toArray, seqLen + 1)
  }

  /** dataset.py:129-152 (_get_positions_from_tokens): resets after each
    * EOS occurrence within the window. */
  def positionsFromTokens(tokens: Array[Int], eosTokenId: Int): Array[Int] = {
    val resets = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < tokens.length - 1) {
      if (tokens(i) == eosTokenId) resets += i + 1
      i += 1
    }
    cumsumWithResets(resets.toArray, tokens.length)
  }

  /** The reference's vectorized construction, scalarized: pos = ones;
    * pos(docEnds(k)) = prevEnd(k) − docEnds(k) + 1 (assignments applied in
    * order — duplicate reset indices keep the LAST write like torch
    * advanced indexing); result = cumsum(pos). First reset is always 0, so
    * position 0 is 0. */
  private def cumsumWithResets(resets: Array[Int], n: Int): Array[Int] = {
    val pos = Array.fill(n)(1)
    var k = 0
    while (k < resets.length) {
      val prev = if (k == 0) -1 else resets(k - 1)
      pos(resets(k)) = prev - resets(k) + 1
      k += 1
    }
    var acc = 0
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { acc += pos(i); out(i) = acc; i += 1 }
    out
  }
}
