package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    bpe: Option[graft.text.Bpe.Model] = None)

object DocTokenizer {

  /** Hash-bucket word encoder standing in for a trained BPE (ids 0..V-1;
    * id 0 reserved as EOS/doc separator). */
  def encode(text: String, vocabSize: Int): Array[Int] = {
    val words = Tokenizer.words(text)
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

  /** Returns the written file pairs (dsPath, indexPath, docs, tokens). */
  def write(df: DataFrame, textCol: String, outDir: String,
            cfg: DocTokenizerConfig = DocTokenizerConfig())
           (implicit spark: SparkSession): Seq[(String, Long, Long)] = {
    import spark.implicits._
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
    val input =
      if (cfg.shuffle) df.select(col(textCol)).orderBy(rand(cfg.seed))
      else df.select(col(textCol))
    input.as[String].rdd.mapPartitionsWithIndex { (rank, it) =>
      val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(hconf.value)
      val dsPath = f"$outDir/$rank%05d.ds"
      val idxPath = f"$outDir/$rank%05d.ds.index"
      val ds = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        fs.create(new org.apache.hadoop.fs.Path(dsPath), true), 1 << 20))
      val idx = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        fs.create(new org.apache.hadoop.fs.Path(idxPath), true)))
      var offset = 0L
      var docs = 0L
      var tokens = 0L
      try {
        for (text <- it) {
          val ids = encodeFn(text)
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
      } finally { ds.close(); idx.close() }
      Iterator((dsPath, docs, tokens))
    }.collect().toSeq
  }

  /** Round-trip reader for one rank file (testing + the merger path). */
  def readRank(dsPath: String, wide: Boolean): Array[Array[Int]] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dsPath))
    val idxBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dsPath + ".index"))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ib = java.nio.ByteBuffer.wrap(idxBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ends = Array.fill(idxBytes.length / 8)(ib.getLong)
    var start = 0L
    ends.map { end =>
      val n = (end - start).toInt // index entries are token offsets
      val doc = Array.fill(n)(if (wide) bb.getInt else (bb.getShort & 0xffff))
      start = end
      doc
    }
  }
}
