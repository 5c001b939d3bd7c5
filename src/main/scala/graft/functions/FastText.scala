package graft.functions

import scala.collection.mutable.ArrayBuffer

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-Scala fastText supervised-model inference (lid.176.bin-compatible).
  *
  * Implements the public fastText binary format (FASTTEXT_FILEFORMAT_MAGIC
  * 793712314, version 12) and the supervised scoring path the reference
  * uses for language-ID (utils/lid.py:53-59): mean of the input vectors of
  * tokens (word id if in vocab, plus hashed character n-gram buckets) →
  * output matrix → softmax over __label__ entries. No pretrained model
  * ships in this zero-egress sandbox; the loader is exercised against a
  * synthetic model written in the same format (FastTextSpec), and drops in
  * for HeuristicLid via the Lid trait when a real model file is present.
  */
final class FastTextModel(
    val dim: Int,
    val bucket: Int,
    val minn: Int,
    val maxn: Int,
    val wordNgrams: Int,
    vocab: java.util.HashMap[String, Int],
    val labels: Array[String],
    nWords: Int,
    input: Array[Float], // (nWords + bucket) x dim
    output: Array[Float] // nLabels x dim
) extends Serializable with Lid {

  import FastTextModel.{hash => ftHash}

  private def addRow(vec: Array[Float], row: Int): Unit = {
    var i = 0
    val off = row * dim
    while (i < dim) { vec(i) += input(off + i); i += 1 }
  }

  // scratch buffers reused across subwordRows calls (the model instance is
  // per-JVM; per-thread scratch keeps the hot path allocation-free).
  // @transient lazy: ThreadLocal is not Serializable and the model is
  // documented to ride Lid-seam closures (review-caught) — the field
  // re-initializes empty on the executor after deserialization
  @transient private lazy val scratch = new ThreadLocal[(Array[Byte], Array[Int])] {
    override def initialValue(): (Array[Byte], Array[Int]) =
      (new Array[Byte](256), new Array[Int](80))
  }

  /** subword n-grams of a word wrapped in < > (fastText Dictionary).
    * Allocation-free hot path: the wrapped word is UTF-8-encoded ONCE with
    * per-character byte offsets, and each start position extends a single
    * running FNV-1a hash byte-by-byte — hash-identical to hashing the
    * substring (FNV is prefix-incremental), without the per-n-gram
    * StringBuilder/substring/getBytes the naive form pays. */
  /** Slow reference form of [[subwordRowIds]] — per-n-gram substring +
    * String.getBytes hashing, kept ONLY as the property-test twin of the
    * allocation-free fast path (FastTextSpec asserts row-id equality on
    * random unicode words). */
  private[graft] def subwordRowIdsNaive(word: String): Seq[Int] = {
    if (minn == 0) return Nil
    val w = "<" + word + ">"
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < w.length) {
      if (!Character.isLowSurrogate(w.charAt(i))) {
        var j = i
        var n = 0
        val sb = new StringBuilder
        while (j < w.length && n < maxn) {
          sb.append(w.charAt(j))
          j += 1
          if (j < w.length && Character.isLowSurrogate(w.charAt(j))) {
            sb.append(w.charAt(j)); j += 1
          }
          n += 1
          if (n >= minn && !(n == 1 && (i == 0 || j == w.length))) {
            // ftHash is already the unsigned 32-bit value (masked at the
            // source), so plain % matches the fast path's `u % bucket`
            // for ANY bucket size — same semantics as real fastText's
            // uint32 mod.
            out += nWords + (ftHash(sb.toString) % bucket).toInt
          }
        }
      }
      i += 1
    }
    out.toSeq
  }

  private[graft] def subwordRowIds(word: String, buf: ArrayBuffer[Int]): Unit = {
    if (minn == 0) return
    var (bytes, offs) = scratch.get()
    // worst case 3 bytes per BMP char (+ wrappers); chars in [,) offsets
    val wlen = word.length + 2
    if (offs.length < wlen + 1 || bytes.length < wlen * 3 + 4) {
      bytes = new Array[Byte](wlen * 3 + 4)
      offs = new Array[Int](wlen + 1)
      scratch.set((bytes, offs))
    }
    // encode "<word>" into bytes, recording each CHARACTER's byte offset
    // (surrogate pairs collapse to one character like the old path)
    var nChars = 0
    var bi = 0
    def putChar(cp0: Int): Unit = {
      // unpaired surrogates encode as '?' exactly like String.getBytes(UTF_8)
      val cp = if (cp0 >= 0xd800 && cp0 <= 0xdfff) '?'.toInt else cp0
      offs(nChars) = bi; nChars += 1
      if (cp < 0x80) { bytes(bi) = cp.toByte; bi += 1 }
      else if (cp < 0x800) {
        bytes(bi) = (0xc0 | (cp >> 6)).toByte
        bytes(bi + 1) = (0x80 | (cp & 0x3f)).toByte; bi += 2
      } else if (cp < 0x10000) {
        bytes(bi) = (0xe0 | (cp >> 12)).toByte
        bytes(bi + 1) = (0x80 | ((cp >> 6) & 0x3f)).toByte
        bytes(bi + 2) = (0x80 | (cp & 0x3f)).toByte; bi += 3
      } else {
        bytes(bi) = (0xf0 | (cp >> 18)).toByte
        bytes(bi + 1) = (0x80 | ((cp >> 12) & 0x3f)).toByte
        bytes(bi + 2) = (0x80 | ((cp >> 6) & 0x3f)).toByte
        bytes(bi + 3) = (0x80 | (cp & 0x3f)).toByte; bi += 4
      }
    }
    putChar('<')
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      putChar(cp)
      ci += Character.charCount(cp)
    }
    putChar('>')
    offs(nChars) = bi

    var i = 0
    while (i < nChars) {
      var h = 2166136261L.toInt // running FNV-1a over bytes from offs(i)
      var b = offs(i)
      var n = 0
      val maxN = math.min(maxn, nChars - i)
      while (n < maxN) {
        val stop = offs(i + n + 1)
        while (b < stop) { h = (h ^ bytes(b).toInt) * 16777619; b += 1 }
        n += 1
        if (n >= minn && !(n == 1 && (i == 0 || i + n == nChars))) {
          val u = h.toLong & 0xffffffffL
          buf += nWords + (u % bucket).toInt
        }
      }
      i += 1
    }
  }

  // token → (sum of its input-row vectors, row count), bounded LRU per
  // thread. Zipfian text repeats tokens constantly; caching the PARTIAL
  // SUM skips both the n-gram hashing and the per-row float adds (~20
  // rows × dim adds collapse to dim adds per repeated token). The sum is
  // computed the same way for a given token every time, so scores stay
  // fully deterministic and cache-independent; within-token add order is
  // fixed (word row, then subword rows in scan order). Long tokens
  // (unspaced CJK runs) rarely repeat and are not cached.
  @transient private lazy val sumCache =
    new ThreadLocal[java.util.LinkedHashMap[String, (Array[Float], Int)]] {
      override def initialValue(): java.util.LinkedHashMap[String, (Array[Float], Int)] =
        new java.util.LinkedHashMap[String, (Array[Float], Int)](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, (Array[Float], Int)]): Boolean = size > 8192
        }
    }

  private def tokenSum(tok: String): (Array[Float], Int) = {
    val buf = new ArrayBuffer[Int](24)
    val wid = vocab.getOrDefault(tok, -1)
    if (wid >= 0) buf += wid
    subwordRowIds(tok, buf)
    val sum = new Array[Float](dim)
    var k = 0
    while (k < buf.length) { addRow(sum, buf(k)); k += 1 }
    (sum, buf.length)
  }

  /** fastText predict: tokens = whitespace split (+EOS handled by caller's
    * text form); returns label→probability, descending. */
  def predictScores(text: String): Array[(String, Double)] = {
    val p = probabilities(text)
    labels.indices.map(k => (labels(k), p(k))).sortBy(-_._2).toArray
  }

  /** Per-label probabilities indexed like `labels` — the allocation-lean
    * core of predict/predictScores (r8): callers that only need the argmax
    * plus a score map skip the 36-tuple sort entirely. */
  private def probabilities(text: String): Array[Double] = {
    // EOS is appended virtually (index == length) — the old `tokens :+ EOS`
    // copied the whole token array per doc; iteration order and the
    // per-token EOS equality check (a literal "</s>" token takes the EOS
    // branch) are unchanged, so accumulation stays bit-identical (r8)
    val tokens = graft.text.PyText.pySplit(text)
    val hidden = new Array[Float](dim)
    var count = 0
    val cache = sumCache.get()
    var ti = 0
    while (ti <= tokens.length) {
      val tok = if (ti == tokens.length) FastTextModel.EOS else tokens(ti)
      if (tok == FastTextModel.EOS) {
        val wid = vocab.getOrDefault(tok, -1)
        if (wid >= 0) { addRow(hidden, wid); count += 1 }
      } else {
        var entry = cache.get(tok)
        if (entry == null) {
          entry = tokenSum(tok)
          if (tok.length <= 32) cache.put(tok, entry)
        }
        val (sum, n) = entry
        var d = 0
        while (d < dim) { hidden(d) += sum(d); d += 1 }
        count += n
      }
      ti += 1
    }
    // each added row (in-vocab word or subword bucket) counts toward the mean
    val denom = math.max(count, 1)
    var i = 0
    while (i < dim) { hidden(i) /= denom; i += 1 }

    val logits = new Array[Double](labels.length)
    var best = Double.MinValue
    i = 0
    while (i < labels.length) {
      var s = 0.0
      var d = 0
      val off = i * dim
      while (d < dim) { s += hidden(d) * output(off + d); d += 1 }
      logits(i) = s
      if (s > best) best = s
      i += 1
    }
    var z = 0.0
    i = 0
    while (i < labels.length) { logits(i) = math.exp(logits(i) - best); z += logits(i); i += 1 }
    i = 0
    while (i < labels.length) { logits(i) /= z; i += 1 }
    logits
  }

  // labels with the __label__ prefix stripped ONCE at load, not 36 string
  // allocations per predicted doc (r8)
  @transient private lazy val cleanLabels: Array[String] =
    labels.map(_.stripPrefix("__label__"))

  override def predict(text: String): (String, Double, Map[String, Double]) = {
    // skip the full-string copy when there is no newline (the common case)
    val flat = if (text.indexOf('\n') >= 0) text.replace('\n', ' ') else text
    val p = probabilities(flat)
    // argmax with strict > = the head of the old stable descending sort
    // (first label wins ties in both forms)
    var bestIdx = 0
    var i = 1
    while (i < p.length) { if (p(i) > p(bestIdx)) bestIdx = i; i += 1 }
    val mb = Map.newBuilder[String, Double]
    mb.sizeHint(p.length)
    i = 0
    while (i < p.length) { mb += cleanLabels(i) -> p(i); i += 1 }
    (cleanLabels(bestIdx), p(bestIdx), mb.result())
  }
}

object FastTextModel {
  val Magic = 793712314
  val Version = 12
  val EOS = "</s>"

  /** fastText's FNV-1a-style 32-bit string hash (dictionary.cc). */
  def hash(str: String): Long = {
    var h = 2166136261L.toInt
    val bytes = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h = h ^ bytes(i).toInt
      h = h * 16777619
      i += 1
    }
    h.toLong & 0xffffffffL
  }

  def load(path: String): FastTextModel = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path), 1 << 20))
    try loadFrom(in) finally in.close()
  }

  def loadFrom(in: DataInputStream): FastTextModel = {
    def i32() = Integer.reverseBytes(in.readInt())
    def i64() = java.lang.Long.reverseBytes(in.readLong())
    def f64() = java.lang.Double.longBitsToDouble(java.lang.Long.reverseBytes(in.readLong()))
    def str(): String = {
      val buf = new java.io.ByteArrayOutputStream()
      var b = in.read()
      while (b > 0) { buf.write(b); b = in.read() }
      if (b < 0) throw new EOFException()
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    }

    require(i32() == Magic, "not a fastText model file")
    require(i32() == Version, "unsupported fastText version")
    // args (args.cc::load order)
    val dim = i32(); i32() /*ws*/; i32() /*epoch*/; i32() /*minCount*/
    i32() /*neg*/; val wordNgrams = i32(); i32() /*loss*/; i32() /*model*/
    val bucket = i32(); val minn = i32(); val maxn = i32()
    i32() /*lrUpdateRate*/; f64() /*t*/
    // dictionary (dictionary.cc::load)
    val size = i32(); val nWords = i32(); val nLabels = i32()
    i64() /*ntokens*/; val pruneIdxSize = i64()
    val vocab = new java.util.HashMap[String, Int]()
    val labels = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < size) {
      val w = str()
      i64() /*count*/
      val tpe = in.readByte()
      if (tpe == 0) vocab.put(w, i) else labels += w
      i += 1
    }
    require(pruneIdxSize <= 0, "pruned models not supported")
    // input matrix
    val quantInput = in.readBoolean()
    require(!quantInput, "quantized models not supported")
    val rows = i64().toInt; val cols = i64().toInt
    val inputM = readFloats(in, rows * cols)
    // output matrix
    val quantOut = in.readBoolean()
    val oRows = i64().toInt; val oCols = i64().toInt
    require(!quantOut, "quantized models not supported")
    val outputM = readFloats(in, oRows * oCols)
    new FastTextModel(dim, bucket, minn, maxn, wordNgrams, vocab,
      labels.toArray, nWords, inputM, outputM)
  }

  /** The committed self-trained fixture model (13 KB, 5 European languages,
    * word-level: minn=maxn=bucket=0). Trained and serialized by
    * tools/gen_fasttext_model.py (fixed seed, self-authored corpus — see the
    * script header for provenance); loading it here exercises the REAL .bin
    * loader + mean-of-input-vectors → output matmul → softmax path that a
    * production lid.176.bin would take (utils/lid.py:53-59). */
  lazy val fixture: FastTextModel = loadResource("/graft/lid.mini.bin")

  /** Subword variant of the fixture (minn=2, maxn=4, bucket=512 — the
    * lid.176-style configuration): char-n-gram bucket vectors make OOV and
    * misspelled words classifiable, exercising [[FastTextModel.subwordRows]]
    * end-to-end. Same trainer, same provenance. */
  lazy val subwordFixture: FastTextModel = loadResource("/graft/lid.mini.sub.bin")

  /** Round-5 wide fixture (36 languages, minn=2/maxn=4/bucket=4096):
    * Latin-script languages word-level+subword, unspaced zh/ja/th purely
    * via subword buckets (trained on concatenated OOV tokens — exactly how
    * inference sees real unspaced text, and how lid.176 covers CJK). This
    * is the DEFAULT pipeline LID (see [[graft.functions.Lid.default]]);
    * same trainer and provenance as the mini fixtures. */
  /** Classpath location of the wide 36-language fixture; probed by
    * [[graft.functions.WideFastTextLid]] before loading so only a truly
    * absent resource triggers the heuristic fallback. */
  val WideFixturePath = "/graft/lid.wide.bin"

  lazy val wideFixture: FastTextModel = loadResource(WideFixturePath)

  private def loadResource(name: String): FastTextModel = {
    val res = getClass.getResourceAsStream(name)
    require(res != null, s"$name resource missing")
    val in = new DataInputStream(new java.io.BufferedInputStream(res, 1 << 16))
    try loadFrom(in) finally in.close()
  }

  private def readFloats(in: InputStream, n: Int): Array[Float] = {
    val bytes = new Array[Byte](n * 4)
    var off = 0
    while (off < bytes.length) {
      val r = in.read(bytes, off, bytes.length - off)
      if (r < 0) throw new EOFException()
      off += r
    }
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](n)
    bb.asFloatBuffer().get(out)
    out
  }
}
