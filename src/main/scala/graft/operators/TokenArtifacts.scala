package graft.operators

/** Post-tokenization artifact ops (tokens/merger.py:15-245,
  * tokens/context_shuffler.py:13-83, tokens/megatron_tokenizer.py):
  * operate on the DocTokenizer `.ds`/`.ds.index` rank files. These are
  * driver-side file transforms in the reference too (single-rank loops
  * over mmapped binaries); sizes here are token streams per rank, not the
  * corpus, so no distribution is needed beyond one task per output file. */
object TokenArtifacts {

  /** DocumentTokenizerMerger: merge rank files into ≤ maxTokensPerFile
    * outputs with an optional seeded document shuffle across ranks.
    * `.ds.loss` sidecars, when present on EVERY input rank, ride along in
    * the same document order (≙ TokenizedFile.copy reordering the loss
    * file with the tokens); a partial sidecar set fails loudly rather
    * than silently dropping masks. */
  def merge(inDir: String, outDir: String, maxTokensPerFile: Long,
            wide: Boolean = false, shuffleSeed: Option[Long] = None): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val rankFiles = new java.io.File(inDir).listFiles()
      .filter(_.getName.endsWith(".ds")).map(_.getPath).sorted
    val rankLoss = rankFiles.map(DocTokenizer.readRankLoss)
    val withLoss = rankLoss.count(_.isDefined)
    require(withLoss == 0 || withLoss == rankFiles.length,
      s"only $withLoss of ${rankFiles.length} rank files have .loss sidecars")
    val hasLoss = withLoss > 0
    var docs: Array[(Array[Int], Array[Byte])] =
      rankFiles.zip(rankLoss).flatMap { case (p, lossOpt) =>
        val toks = DocTokenizer.readRank(p, wide)
        val loss = lossOpt.getOrElse(Array.fill(toks.length)(null: Array[Byte]))
        toks.zip(loss)
      }
    shuffleSeed.foreach { seed =>
      val arr = docs.toBuffer
      DocTokenizer.seededShuffle(arr, seed)
      docs = arr.toArray
    }
    val written = scala.collection.mutable.ArrayBuffer.empty[String]
    var fileIdx = 0
    var ds: java.io.DataOutputStream = null
    var idx: java.io.DataOutputStream = null
    var loss: java.io.DataOutputStream = null
    var offset = 0L
    var tokensInFile = 0L
    def openNext(): Unit = {
      val p = f"$outDir/$fileIdx%05d.ds"
      ds = new java.io.DataOutputStream(new java.io.BufferedOutputStream(new java.io.FileOutputStream(p), 1 << 20))
      idx = new java.io.DataOutputStream(new java.io.FileOutputStream(p + ".index"))
      loss = if (hasLoss)
        new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(p + ".loss"), 1 << 20))
      else null
      written += p; offset = 0L; tokensInFile = 0L; fileIdx += 1
    }
    def closeCur(): Unit =
      if (ds != null) { ds.close(); idx.close(); if (loss != null) loss.close() }
    openNext()
    for ((doc, mask) <- docs) {
      if (tokensInFile > 0 && tokensInFile + doc.length > maxTokensPerFile) {
        closeCur(); openNext()
      }
      for (t <- doc) {
        if (wide) ds.writeInt(Integer.reverseBytes(t))
        else { ds.writeByte(t & 0xff); ds.writeByte((t >> 8) & 0xff) }
      }
      if (hasLoss) loss.write(mask)
      offset += doc.length.toLong // token units, matching DocTokenizer
      idx.writeLong(java.lang.Long.reverseBytes(offset))
      tokensInFile += doc.length
    }
    closeCur()
    written.toSeq
  }

  /** DocumentTokenizerContextShuffler: cut the token stream into fixed
    * windows (reference default 2049) and write them in a seeded shuffled
    * order; the trailing partial window is dropped (context_shuffler.py). */
  def contextShuffle(dsPath: String, outPath: String, windowTokens: Int = 2049,
                     wide: Boolean = false, seed: Long = 42L): Long = {
    val bytesPerTok = if (wide) 4 else 2
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dsPath))
    val nWindows = bytes.length / (windowTokens * bytesPerTok)
    val order = scala.collection.mutable.ArrayBuffer.range(0, nWindows)
    DocTokenizer.seededShuffle(order, seed)
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(outPath), 1 << 20)
    try {
      val win = windowTokens * bytesPerTok
      for (w <- order) out.write(bytes, w * win, win)
    } finally out.close()
    nWindows.toLong
  }

  /** Megatron .bin/.idx writer (public format: MMIDIDX magic, version 1,
    * dtype code, doc sizes + byte pointers + document index). */
  def writeMegatron(inDsPath: String, outPrefix: String, wide: Boolean = false): Unit = {
    val docs = DocTokenizer.readRank(inDsPath, wide)
    val dtypeCode: Byte = if (wide) 4 else 8 // numpy codes: 4=int32, 8=uint16
    val bytesPerTok = if (wide) 4 else 2
    val bin = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(outPrefix + ".bin"), 1 << 20))
    try docs.foreach(_.foreach { t =>
      if (wide) bin.writeInt(Integer.reverseBytes(t))
      else { bin.writeByte(t & 0xff); bin.writeByte((t >> 8) & 0xff) }
    }) finally bin.close()
    val idx = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(outPrefix + ".idx")))
    try {
      idx.writeBytes("MMIDIDX\u0000\u0000")
      idx.writeLong(java.lang.Long.reverseBytes(1L)) // version
      idx.writeByte(dtypeCode)
      idx.writeLong(java.lang.Long.reverseBytes(docs.length.toLong)) // sizes count
      idx.writeLong(java.lang.Long.reverseBytes(docs.length.toLong + 1)) // doc idx count
      docs.foreach(d => idx.writeInt(Integer.reverseBytes(d.length))) // sizes (int32)
      var ptr = 0L
      docs.foreach { d => idx.writeLong(java.lang.Long.reverseBytes(ptr)); ptr += d.length.toLong * bytesPerTok }
      (0L to docs.length.toLong).foreach(i => idx.writeLong(java.lang.Long.reverseBytes(i)))
    } finally idx.close()
  }
}
