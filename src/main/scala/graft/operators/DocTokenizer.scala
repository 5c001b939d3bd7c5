package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.text.Tokenizer

/** DocumentTokenizer (tokens/tokenizer.py:23-475): tokenize documents into
  * flat binary token files for training — `.ds` of little-endian uint16
  * (uint32 when the vocab exceeds 64k) token ids plus a `.ds.index` of
  * little-endian uint64 end-offsets per document IN TOKENS (not bytes —
  * tokenizer.py:101-119 advances write_idx by len(tk_bytes)//token_size),
  * one file pair per partition (≙ the reference's per-rank files), with an
  * optional seeded document shuffle (in-file shuffle ≙ orderBy(rand)).
  *
  * The reference encodes with a HuggingFace BPE tokenizer; offline we
  * encode with a hash-bucketed word-vocab (`encode` seam) — the binary
  * format and the distributed write path are the real thing.
  */
final case class DocTokenizerConfig(
    vocabSize: Int = 50257,
    shuffle: Boolean = true,
    seed: Long = 42L,
    /** When set, encode with a real (corpus-trained) BPE instead of the
      * hash-bucket stand-in — see graft.text.Bpe. */
    bpe: Option[graft.text.Bpe.Model] = None,
    /** Write `<rank>.ds.loss` masks (one byte per token, 0 = ignore the
      * loss — tokenizer.py save_loss_metadata). Ranges come from
      * `noLossRangesCol`; requires the word encoder (the BPE stand-in
      * carries no char offsets for char_to_token). */
    saveLoss: Boolean = false)

object DocTokenizer {

  /** Hash-bucket word encoder standing in for a trained BPE (ids 0..V-1;
    * id 0 reserved as EOS/doc separator). */
  def encode(text: String, vocabSize: Int): Array[Int] =
    encodeWords(Tokenizer.words(text), vocabSize)

  /** encode() over pre-tokenized words — lets the loss path tokenize once
    * for both ids and char spans. */
  def encodeWords(words: Array[String], vocabSize: Int): Array[Int] = {
    val out = new Array[Int](words.length + 1)
    var i = 0
    while (i < words.length) {
      out(i) = (java.lang.Long.remainderUnsigned(
        Hashes.xxhash64(words(i)), vocabSize - 1) + 1).toInt
      i += 1
    }
    out(words.length) = 0 // EOS
    out
  }

  /** Little-endian uint64 token-offset doc ends from raw `.index` bytes —
    * the ONE parser for the index format (readers fetch bytes however
    * their filesystem requires). */
  def parseIndexEnds(idxBytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(idxBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(idxBytes.length / 8)(bb.getLong)
  }

  /** Seeded in-place Fisher-Yates used by every .ds shuffle path (merger,
    * context shuffler, folder reader) — one implementation, one
    * determinism contract. */
  def seededShuffle[T](arr: scala.collection.mutable.Buffer[T], seed: Long): Unit = {
    val rng = new java.util.Random(seed)
    for (i <- arr.indices.reverse.dropRight(1)) {
      val j = rng.nextInt(i + 1)
      val t = arr(i); arr(i) = arr(j); arr(j) = t
    }
  }

  /** Token char spans: each words() token located at its verbatim position
    * via a moving cursor (tokens are in-order, non-overlapping, whitespace-
    * free substrings, so the first match at/after the cursor IS the token's
    * position) — spans cannot diverge from the token stream. The trailing
    * EOS has no span, like the HF post-processor's appended token. */
  def wordSpans(text: String): Array[(Int, Int)] =
    wordSpansOf(text, Tokenizer.words(text))

  /** wordSpans over pre-tokenized words (single-tokenization loss path). */
  def wordSpansOf(text: String, ws: Array[String]): Array[(Int, Int)] = {
    val spans = new Array[(Int, Int)](ws.length)
    var cur = 0
    var i = 0
    while (i < ws.length) {
      val at = text.indexOf(ws(i), cur)
      spans(i) = (at, at + ws(i).length)
      cur = at + ws(i).length
      i += 1
    }
    spans
  }

  /** char_to_token: index of the token whose span contains char c; None for
    * whitespace / out-of-range (HF Encodings semantics). */
  def charToToken(spans: Array[(Int, Int)], c: Int): Option[Int] = {
    var lo = 0
    var hi = spans.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val (s, e) = spans(mid)
      if (c < s) hi = mid - 1
      else if (c >= e) lo = mid + 1
      else return Some(mid)
    }
    None
  }

  /** get_loss_values (tokenizer.py:356-376): ones per token (incl. EOS),
    * zeroed across each no-loss char range via char_to_token, with the
    * reference's None-slicing quirks preserved — a start char in
    * whitespace zeroes from token 0 (Python's [None:t_end]), and a range
    * whose end maps to no token truncates the mask at its start (the
    * caller then truncates the doc's tokens to match). */
  def lossValues(nTokens: Int, spans: Array[(Int, Int)],
                 noLoss: Seq[(Int, Int)]): Array[Byte] = {
    var loss = Array.fill[Byte](nTokens)(1)
    for ((start, end) <- noLoss) {
      val tStart = charToToken(spans, start)
      val tEnd = charToToken(spans, end)
      val from = math.min(tStart.getOrElse(0), loss.length)
      val until = math.min(tEnd.getOrElse(loss.length), loss.length)
      var i = from
      while (i < until) { loss(i) = 0; i += 1 }
      // the reference also truncates on t_end >= len(encoded.ids), but
      // that arm is only reachable under HF max-length truncation (ids
      // shorter than the span table) — here spans always cover exactly
      // nTokens - 1 tokens, so a defined tEnd is in range by construction
      if (tEnd.isEmpty)
        loss = loss.take(math.min(tStart.getOrElse(loss.length), loss.length))
    }
    loss
  }

  /** Returns one (dsPath, docCount, tokenCount) per written rank file.
    * @param noLossRangesCol with cfg.saveLoss: an array<array<int>> column
    *        of [startChar, endChar] spans to mask (≙ metadata
    *        "no_loss_ranges"); null values mean no masked ranges */
  def write(df: DataFrame, textCol: String, outDir: String,
            cfg: DocTokenizerConfig = DocTokenizerConfig(),
            noLossRangesCol: Option[String] = None)
           (implicit spark: SparkSession): Seq[(String, Long, Long)] = {
    import spark.implicits._
    require(!cfg.saveLoss || cfg.bpe.isEmpty,
      "saveLoss needs the word encoder: the BPE stand-in carries no char offsets")
    // Write through the Hadoop FileSystem API against the configured
    // filesystem: on a real cluster a driver-side java.io mkdir + executor
    // FileOutputStream would land rank files on executor-local disks; this
    // path works for file://, hdfs://, s3a:// alike.
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    outPath.getFileSystem(hconf.value).mkdirs(outPath)
    val effVocab = cfg.bpe.map(_.vocab.size + 1).getOrElse(cfg.vocabSize)
    val wide = effVocab > 65536
    val vs = cfg.vocabSize
    val bpe = cfg.bpe
    val encodeFn: String => Array[Int] = bpe match {
      case Some(m) => t => graft.text.Bpe.encode(t, m)
      case None => t => encode(t, vs)
    }
    val saveLoss = cfg.saveLoss
    val rangesCol: Column = noLossRangesCol.map(col)
      .getOrElse(typedlit(Seq.empty[Seq[Int]]))
    val base = df.select(col(textCol).as("__t"), rangesCol.as("__r"))
    val input = if (cfg.shuffle) base.orderBy(rand(cfg.seed)) else base
    input.as[(String, Seq[Seq[Int]])].rdd.mapPartitionsWithIndex { (rank, it) =>
      val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(hconf.value)
      val dsPath = f"$outDir/$rank%05d.ds"
      val idxPath = f"$outDir/$rank%05d.ds.index"
      val ds = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        fs.create(new org.apache.hadoop.fs.Path(dsPath), true), 1 << 20))
      val idx = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        fs.create(new org.apache.hadoop.fs.Path(idxPath), true)))
      val loss = if (saveLoss)
        new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          fs.create(new org.apache.hadoop.fs.Path(dsPath + ".loss"), true), 1 << 20))
      else null
      var offset = 0L
      var docs = 0L
      var tokens = 0L
      try {
        for ((text, ranges) <- it) {
          var ids: Array[Int] = null
          if (saveLoss) {
            // tokenize ONCE for both ids and char spans (the CJK DAG+HMM
            // segmentation is the hot cost; running it twice per doc
            // would double the write CPU)
            val ws = Tokenizer.words(text)
            ids = encodeWords(ws, vs)
            // a SQL NULL ranges cell (docs without masks in a nullable
            // metadata column) means "no ranges", not a task NPE
            val safe = Option(ranges).getOrElse(Nil)
              .collect { case r if r != null && r.length >= 2 => (r(0), r(1)) }
            val mask = lossValues(ids.length, wordSpansOf(text, ws), safe)
            // tokenizer.py:407-409: a mask truncated by an off-the-end
            // range truncates the doc's tokens with it
            if (mask.length < ids.length) ids = ids.take(mask.length)
            loss.write(mask)
          } else ids = encodeFn(text)
          var i = 0
          while (i < ids.length) {
            if (wide) ds.writeInt(Integer.reverseBytes(ids(i)))
            else { ds.writeByte(ids(i) & 0xff); ds.writeByte((ids(i) >> 8) & 0xff) }
            i += 1
          }
          offset += ids.length.toLong // token units, the reference's format
          idx.writeLong(java.lang.Long.reverseBytes(offset))
          docs += 1
          tokens += ids.length
        }
      } finally { ds.close(); idx.close(); if (loss != null) loss.close() }
      Iterator((dsPath, docs, tokens))
    }.collect().toSeq
  }

  /** Per-doc loss masks of one rank file (1 byte per token, split on the
    * same .index ends); None when no .loss sidecar exists. */
  def readRankLoss(dsPath: String): Option[Array[Array[Byte]]] = {
    val lossFile = java.nio.file.Paths.get(dsPath + ".loss")
    if (!java.nio.file.Files.exists(lossFile)) return None
    val bytes = java.nio.file.Files.readAllBytes(lossFile)
    val ends = parseIndexEnds(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dsPath + ".index")))
    var start = 0L
    Some(ends.map { end =>
      val doc = java.util.Arrays.copyOfRange(bytes, start.toInt, end.toInt)
      start = end
      doc
    })
  }

  /** Round-trip reader for one rank file (testing + the merger path). */
  def readRank(dsPath: String, wide: Boolean): Array[Array[Int]] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dsPath))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ends = parseIndexEnds(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dsPath + ".index")))
    var start = 0L
    ends.map { end =>
      val n = (end - start).toInt // index entries are token offsets
      val doc = Array.fill(n)(if (wide) bb.getInt else (bb.getShort & 0xffff))
      start = end
      doc
    }
  }
}
