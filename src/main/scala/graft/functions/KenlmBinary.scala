package graft.functions

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets

/** KenLM binary model format (PROBING variant) — writer + loader.
  *
  * Real cc_net / datatrove perplexity models ship as KenLM *binaries*, not
  * ARPA text (utils/perplexity.py:17-164 loads them via the kenlm module).
  * This implements the public on-disk layout from kenlm's sources
  * (lm/binary_format.cc, lm/vocab.cc, lm/model.cc, util/probing_hash_table.hh):
  *
  *   1. Sanity header: the magic string
  *      "mmap lm http://kheafield.com/code format version 5\n\0" padded to
  *      8 bytes, then reference constants (0.0f, 1.0f, -0.5f as floats;
  *      word indices 1 and max; uint64 1) that a reader checks to reject
  *      foreign-endianness/ABI files.
  *   2. FixedWidthParameters: order, probing_multiplier, model_type
  *      (0 = PROBING), has_vocabulary, search_version — then one uint64
  *      n-gram count per order, padded to 8 bytes.
  *   3. ProbingVocabulary: header (version, bound), then a linear-probing
  *      hash table of (uint64 MurmurHash64A(word), uint32 id) entries with
  *      bucket count = ceil(multiplier × entries).
  *   4. ProbingSearch payload: the unigram (prob, backoff) float array
  *      indexed by word id; per middle order a probing table keyed by the
  *      chained word-id hash (CombineWordHash with kenlm's public constants
  *      8978948897894561157 and 17894857484156487943) carrying
  *      (prob, backoff); the longest order carries prob only.
  *   5. Trailing null-terminated vocab strings in id order (written when
  *      has_vocabulary, as `build_binary` does) — what lets a loader map
  *      tokens back to ids.
  *
  * The loader rebuilds id-keyed hash maps (it does not mmap-probe) and
  * scores with exactly [[ArpaModel]]'s longest-match backoff math, so a
  * round-tripped model is score-identical to its ARPA twin (unit-tested).
  * Documented seam: no real KenLM binary can reach this sandbox (egress),
  * so cross-fidelity against `build_binary` output is asserted on layout
  * constants, not on a reference file. Word ids: <unk> = 0, then SORTED
  * unigram order (deterministic file bytes; kenlm itself assigns ids in
  * ARPA unigram order, which ArpaModel's HashMap does not retain — a
  * documented divergence that cannot affect scores, only byte layout).
  */
object KenlmBinary {

  val MagicBytes: Array[Byte] =
    "mmap lm http://kheafield.com/code format version 5\n"
      .getBytes(StandardCharsets.US_ASCII) :+ 0.toByte
  val ModelTypeProbing = 0
  val DefaultMultiplier = 1.5f

  /** util/murmur_hash.cc MurmurHash64A (the 64-bit x64 variant, seed 0 for
    * vocab words — lm/vocab.hh HashForVocab). */
  def murmur64(data: Array[Byte], seed: Long = 0L): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    var h = seed ^ (data.length.toLong * m)
    val nBlocks = data.length / 8
    var i = 0
    while (i < nBlocks) {
      var k = 0L
      var j = 7
      while (j >= 0) { k = (k << 8) | (data(i * 8 + j) & 0xffL); j -= 1 }
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 1
    }
    val tail = data.length & 7
    if (tail > 0) {
      var k = 0L
      var j = tail - 1
      while (j >= 0) { k = (k << 8) | (data(nBlocks * 8 + j) & 0xffL); j -= 1 }
      h ^= k; h *= m
    }
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }

  def hashWord(w: String): Long = murmur64(w.getBytes(StandardCharsets.UTF_8))

  /** lm/model.cc detail::CombineWordHash — the chained n-gram key. The
    * second multiplier is kenlm's 17894857484156487943ULL, expressed as its
    * signed-64 twos-complement (-551886589553063673). */
  def combine(current: Long, nextId: Int): Long =
    (current * 8978948897894561157L) ^ ((1L + nextId) * -551886589553063673L)

  def chainHash(ids: Array[Int]): Long = chainHash(ids, 0, ids.length)

  /** Range form — lets the scoring hot path hash a context window without
    * allocating a slice per probe. */
  def chainHash(ids: Array[Int], from: Int, until: Int): Long = {
    var h = ids(from).toLong
    var i = from + 1
    while (i < until) { h = combine(h, ids(i)); i += 1 }
    h
  }

  // ---------------------------------------------------------------- write

  def write(model: ArpaModel, path: String): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 20))
    try writeTo(model, out) finally out.close()
  }

  private def pad8(out: DataOutputStream, written: Int): Unit = {
    var i = written
    while (i % 8 != 0) { out.writeByte(0); i += 1 }
  }

  private[functions] def writeTo(model: ArpaModel, out: DataOutputStream): Unit = {
    def u32(v: Int): Unit = out.writeInt(Integer.reverseBytes(v))
    def u64(v: Long): Unit = out.writeLong(java.lang.Long.reverseBytes(v))
    def f32(v: Float): Unit = u32(java.lang.Float.floatToIntBits(v))

    val maps = model.ngramMaps
    // word ids: <unk> = 0, then sorted unigram order (see class doc)
    val unigrams = {
      import scala.jdk.CollectionConverters._
      maps(0).keySet().asScala.toArray.sorted // deterministic file bytes
    }
    val vocab = new java.util.HashMap[String, Int]()
    vocab.put("<unk>", 0)
    var nextId = 1
    for (w <- unigrams if w != "<unk>") { vocab.put(w, nextId); nextId += 1 }
    val nVocab = nextId

    // 1. Sanity
    out.write(MagicBytes)
    pad8(out, MagicBytes.length)
    f32(0.0f); f32(1.0f); f32(-0.5f)
    u32(1); u32(Int.MaxValue) // one_word_index, max_word_index
    pad8(out, 4 * 5)
    u64(1L)

    // 2. FixedWidthParameters + counts
    out.writeByte(model.order); out.writeByte(0); out.writeByte(0); out.writeByte(0)
    f32(DefaultMultiplier)
    u32(ModelTypeProbing)
    out.writeByte(1); out.writeByte(0); out.writeByte(0); out.writeByte(0) // has_vocabulary
    u32(0) // search_version (ProbingSearch)
    pad8(out, 20)
    for (o <- 1 to model.order) u64(maps(o - 1).size().toLong)

    // 3. ProbingVocabulary: header + hash table of (hash(word) -> id)
    u64(1L) // ProbingVocabularyHeader.version
    u64(nVocab.toLong) // bound
    val vocabEntries = {
      import scala.jdk.CollectionConverters._
      vocab.entrySet().asScala.toArray
        .map(e => (hashWord(e.getKey), e.getValue))
    }
    writeProbingTable(out, vocabEntries.map { case (k, id) => (k, id.toLong, 0.0f, 0.0f) }, 4)

    // 4a. unigram (prob, backoff) array indexed by id
    val uniProbs = new Array[(Float, Float)](nVocab)
    java.util.Arrays.fill(uniProbs.asInstanceOf[Array[AnyRef]], (0.0f, 0.0f))
    // an ARPA without <unk> scores OOV at the -100 floor (ArpaModel:86)
    if (!maps(0).containsKey("<unk>")) uniProbs(0) = (-100.0f, 0.0f)
    maps(0).forEach { (w, pb) => uniProbs(vocab.get(w)) = pb }
    for ((p, b) <- uniProbs) { f32(p); f32(b) }

    // 4b. middle orders: probing tables keyed by chained id hash
    def idsOf(key: String): Array[Int] = key.split(" ").map { w =>
      // vocab is HashMap[String, Int]: a missing key's null would silently
      // unbox to 0 (= the <unk>/first id), so guard with containsKey
      require(vocab.containsKey(w), s"n-gram word '$w' missing from the \\1-grams section")
      vocab.get(w)
    }
    for (o <- 2 to model.order) {
      val entries = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Float, Float)]
      val isLongest = o == model.order
      maps(o - 1).forEach { (key, pb) =>
        entries += ((chainHash(idsOf(key)), 0L, pb._1, pb._2))
      }
      writeProbingTable(out, entries.toArray, if (isLongest) 1 else 2)
    }

    // 5. trailing vocab strings in id order
    val byId = new Array[String](nVocab)
    vocab.forEach { (w, id) => byId(id) = w }
    for (w <- byId) { out.write(w.getBytes(StandardCharsets.UTF_8)); out.writeByte(0) }
    out.flush()
  }

  /** Linear-probing table (util/probing_hash_table.hh): buckets =
    * ceil(multiplier × entries); slot = key % buckets; empty slots carry
    * the invalid key (all-ones, which no murmur/chain output in a tiny
    * fixture collides with). payloadKind: 4 = uint32 id, 2 = two floats,
    * 1 = one float. */
  private def writeProbingTable(out: DataOutputStream,
      entries: Array[(Long, Long, Float, Float)], payloadKind: Int): Unit = {
    def u32(v: Int): Unit = out.writeInt(Integer.reverseBytes(v))
    def u64(v: Long): Unit = out.writeLong(java.lang.Long.reverseBytes(v))
    def f32(v: Float): Unit = u32(java.lang.Float.floatToIntBits(v))
    val invalid = -1L
    // the all-ones sentinel marks empty slots; an entry whose hash equals
    // it would be silently lost on load and overwritable during probing —
    // refuse loudly (1-in-2^64 per entry; a real model hitting this needs
    // a different sentinel, not silent corruption)
    entries.foreach(e => require(e._1 != invalid,
      "entry hash collides with the empty-slot sentinel (-1)"))
    val buckets = math.max(1, math.ceil(entries.length * DefaultMultiplier.toDouble).toInt)
    u64(entries.length.toLong)
    u64(buckets.toLong)
    val slotKey = Array.fill(buckets)(invalid)
    val slotEntry = new Array[(Long, Long, Float, Float)](buckets)
    for (e <- entries) {
      var slot = java.lang.Long.remainderUnsigned(e._1, buckets.toLong).toInt
      while (slotKey(slot) != invalid) slot = (slot + 1) % buckets
      slotKey(slot) = e._1
      slotEntry(slot) = e
    }
    var i = 0
    while (i < buckets) {
      u64(slotKey(i))
      val e = if (slotEntry(i) == null) (invalid, 0L, 0.0f, 0.0f) else slotEntry(i)
      payloadKind match {
        case 4 => u32(e._2.toInt)
        case 2 => f32(e._3); f32(e._4)
        case 1 => f32(e._3)
      }
      i += 1
    }
  }

  // ----------------------------------------------------------------- load

  /** Load a PROBING binary into an id-keyed scorer. */
  def load(path: String): KenlmModel = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path), 1 << 20))
    try loadFrom(in) finally in.close()
  }

  private[functions] def loadFrom(in: DataInputStream): KenlmModel = {
    def u32(): Int = Integer.reverseBytes(in.readInt())
    def u64(): Long = java.lang.Long.reverseBytes(in.readLong())
    def f32(): Float = java.lang.Float.intBitsToFloat(u32())
    def skipPad(read: Int): Unit = { var i = read; while (i % 8 != 0) { in.readByte(); i += 1 } }

    val magic = new Array[Byte](MagicBytes.length)
    in.readFully(magic)
    require(java.util.Arrays.equals(magic, MagicBytes), "not a KenLM binary (bad magic)")
    skipPad(MagicBytes.length)
    require(f32() == 0.0f && f32() == 1.0f && f32() == -0.5f, "sanity floats mismatch")
    require(u32() == 1 && u32() == Int.MaxValue, "sanity word indices mismatch")
    skipPad(4 * 5)
    require(u64() == 1L, "sanity uint64 mismatch")

    val order = in.readByte().toInt
    in.readByte(); in.readByte(); in.readByte()
    f32() // probing_multiplier
    require(u32() == ModelTypeProbing, "only PROBING binaries supported")
    val hasVocab = in.readByte() != 0
    in.readByte(); in.readByte(); in.readByte()
    u32() // search_version
    skipPad(20)
    val counts = (1 to order).map(_ => u64()).toArray
    require(hasVocab, "binaries without trailing vocabulary are not supported")

    // Everything up to here is the format-mandated KenLM header, so a real
    // build_binary PROBING file passes the checks above — but the section
    // layout below (per-table entry/bucket headers, vocab-table skip) is
    // this writer's own fidelity scope, and a genuine kenlm file diverges
    // mid-parse. Surface that as a clear provenance error instead of a
    // misleading count-mismatch/EOF.
    try loadSections(in, order, counts)
    catch {
      case e: EOFException =>
        // running out of bytes is corruption/truncation, not a format
        // mismatch — don't send the user down the wrong-provenance road
        throw new IllegalArgumentException(
          "KenLM binary ends prematurely (truncated or corrupted file): " +
            e.getMessage, e)
      case e: Exception =>
        throw new IllegalArgumentException(
          "KenLM binary header is valid but the section layout does not match " +
            "this loader: only files produced by KenlmBinary.write are supported " +
            "(genuine build_binary output diverges after the header; use the ARPA " +
            s"text path for such models). Underlying: ${e.getMessage}", e)
    }
  }

  private def loadSections(
      in: DataInputStream, order: Int, counts: Array[Long]): KenlmModel = {
    def u32(): Int = Integer.reverseBytes(in.readInt())
    def u64(): Long = java.lang.Long.reverseBytes(in.readLong())
    def f32(): Float = java.lang.Float.intBitsToFloat(u32())

    // vocabulary table
    require(u64() == 1L, "unsupported vocabulary version")
    val bound = u64().toInt
    val (vEntries, vBuckets) = (u64().toInt, u64().toInt)
    // we rebuild from the trailing strings; skip the hash table bytes
    var i = 0
    while (i < vBuckets) { u64(); u32(); i += 1 }
    require(vEntries == bound, s"vocab entries $vEntries != bound $bound")

    val uniProbs = new Array[Float](bound)
    val uniBackoffs = new Array[Float](bound)
    i = 0
    while (i < bound) { uniProbs(i) = f32(); uniBackoffs(i) = f32(); i += 1 }

    val midMaps = (2 to order).map { o =>
      val n = u64().toInt
      val buckets = u64().toInt
      require(n == counts(o - 1), s"order-$o count mismatch: $n vs ${counts(o - 1)}")
      val m = new java.util.HashMap[java.lang.Long, (Float, Float)](n * 2)
      val isLongest = o == order
      var j = 0
      while (j < buckets) {
        val k = u64()
        val p = f32()
        val b = if (isLongest) 0.0f else f32()
        if (k != -1L) m.put(k, (p, b))
        j += 1
      }
      m
    }.toArray

    // trailing strings in id order
    val vocab = new java.util.HashMap[String, Int]()
    i = 0
    val buf = new java.io.ByteArrayOutputStream()
    while (i < bound) {
      var b = in.read()
      if (b < 0) throw new EOFException("truncated vocab strings")
      buf.reset()
      while (b > 0) { buf.write(b); b = in.read() }
      vocab.put(new String(buf.toByteArray, StandardCharsets.UTF_8), i)
      i += 1
    }
    new KenlmModel(order, vocab, uniProbs, uniBackoffs, midMaps)
  }
}

/** Id-keyed backoff scorer over a loaded KenLM binary — the same
  * longest-match backoff math as [[ArpaModel.score]] (OOV context n-grams
  * miss their tables and back off, OOV heads score as <unk>), so a
  * round-tripped model is score-identical to its ARPA twin. */
final class KenlmModel(
    val order: Int,
    vocab: java.util.HashMap[String, Int],
    uniProbs: Array[Float],
    uniBackoffs: Array[Float],
    midMaps: Array[java.util.HashMap[java.lang.Long, (Float, Float)]]) extends LineScorer {

  private val unkId = vocab.getOrDefault("<unk>", 0)

  private def lookup(ids: Array[Int], from: Int, until: Int): Option[(Float, Float)] = {
    val n = until - from
    var j = from
    while (j < until) { if (ids(j) < 0) return None; j += 1 } // OOV in span
    if (n == 1) {
      val id = ids(from)
      Some((uniProbs(id), uniBackoffs(id)))
    } else {
      Option(midMaps(n - 2).get(KenlmBinary.chainHash(ids, from, until)))
    }
  }

  private def condLogProb(ids: Array[Int], from: Int, last: Int): Double = {
    val n = last - from + 1
    if (n > order) return condLogProb(ids, last - order + 1, last)
    lookup(ids, from, last + 1) match {
      case Some((lp, _)) => lp
      case None =>
        if (n == 1) uniProbs(unkId).toDouble
        else {
          val backoff = lookup(ids, from, last).map(_._2.toDouble).getOrElse(0.0)
          backoff + condLogProb(ids, from + 1, last)
        }
    }
  }

  /** Σ log10 P over tokens + </s> with <s> bos — KenLM Model.score. */
  def score(line: String): Double = {
    val words = graft.text.PyText.pySplit(line)
    val tokens = ("<s>" +: words :+ "</s>").toArray
    val ids = tokens.map(t => vocab.getOrDefault(t, -1).intValue())
    var total = 0.0
    var i = 1
    while (i < tokens.length) {
      val from = math.max(0, i - order + 1)
      total += condLogProb(ids, from, i)
      i += 1
    }
    total
  }
}
