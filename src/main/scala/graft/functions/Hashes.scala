package graft.functions

/** Hash functions used by the dedup operators.
  *
  * sha1Hash64 mirrors the reference's utils/hashes/sha1.py:17-26 (first 8
  * bytes of SHA-1, little-endian unsigned) — the fork's minhash config uses
  * hash_fc="sha1", precision=64 (scripts/data_cleaning.py:202-205).
  * xxhash64 is the standard public XXH64 algorithm (the upstream default).
  */
object Hashes {

  // One digest instance per thread: MessageDigest.getInstance is a
  // provider lookup + allocation, and the minhash kernel calls this once
  // per shingle (~10^11 times at the 100 TB posture). digest() resets the
  // instance, so reuse is safe.
  private val sha1Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-1")
  }

  /** A reset, thread-owned SHA-1 instance for incremental update() use —
    * lets hot loops feed word bytes directly instead of building a shingle
    * String first. Callers must finish with digest() before the next
    * borrow on the same thread. */
  def sha1Borrow(): java.security.MessageDigest = {
    val md = sha1Local.get()
    md.reset()
    md
  }

  /** First 8 digest bytes, little-endian (shared by sha1Hash64/sha1Hash32
    * and the incremental minhash path). */
  def sha1DigestToLong64(d: Array[Byte]): Long =
    (d(0) & 0xffL) | ((d(1) & 0xffL) << 8) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 32) | ((d(5) & 0xffL) << 40) |
      ((d(6) & 0xffL) << 48) | ((d(7) & 0xffL) << 56)

  /** struct.unpack("<Q", sha1(utf8).digest()[:8]) as a (wrapping) Long. */
  def sha1Hash64(data: String): Long = {
    val d = sha1Borrow().digest(data.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    sha1DigestToLong64(d)
  }

  // ---- XXH64 (public domain algorithm, https://xxhash.com) ----
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  def xxhash64(data: String): Long =
    xxhash64(data.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0L)

  def xxhash64(input: Array[Byte], seed: Long): Long = {
    val len = input.length
    var i = 0
    var hash =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (i + 32 <= len) {
          v1 = round(v1, getLong(input, i))
          v2 = round(v2, getLong(input, i + 8))
          v3 = round(v3, getLong(input, i + 16))
          v4 = round(v4, getLong(input, i + 24))
          i += 32
        }
        var h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        h = mergeRound(h, v1); h = mergeRound(h, v2)
        h = mergeRound(h, v3); h = mergeRound(h, v4)
        h
      } else seed + P5
    hash += len
    while (i + 8 <= len) {
      hash ^= round(0L, getLong(input, i))
      hash = java.lang.Long.rotateLeft(hash, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      hash ^= (getInt(input, i) & 0xffffffffL) * P1
      hash = java.lang.Long.rotateLeft(hash, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      hash ^= (input(i) & 0xffL) * P5
      hash = java.lang.Long.rotateLeft(hash, 11) * P1
      i += 1
    }
    hash ^= hash >>> 33
    hash *= P2
    hash ^= hash >>> 29
    hash *= P3
    hash ^ (hash >>> 32)
  }

  @inline private def round(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * P2, 31) * P1

  @inline private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  @inline private def getLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) | ((b(i + 5) & 0xffL) << 40) |
    ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  @inline private def getInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** struct.unpack("<I", sha1(utf8).digest()[:4]) — sha1_hash32
    * (utils/hashes/sha1.py), returned as an unsigned value in a Long. */
  def sha1Hash32(data: String): Long = {
    val d = sha1Borrow().digest(data.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (d(0) & 0xffL) | ((d(1) & 0xffL) << 8) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 24)
  }

  // ---- XXH32 (public domain algorithm, https://xxhash.com) ----
  private val Q1 = 0x9E3779B1
  private val Q2 = 0x85EBCA77
  private val Q3 = 0xC2B2AE3D
  private val Q4 = 0x27D4EB2F
  private val Q5 = 0x165667B1

  def xxhash32(data: String): Long =
    xxhash32(data.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0) & 0xffffffffL

  /** XXH32 as a signed Int (standard algorithm, Int arithmetic wraps). */
  def xxhash32(input: Array[Byte], seed: Int): Int = {
    val len = input.length
    var i = 0
    var h =
      if (len >= 16) {
        var v1 = seed + Q1 + Q2
        var v2 = seed + Q2
        var v3 = seed
        var v4 = seed - Q1
        while (i + 16 <= len) {
          v1 = round32(v1, getInt(input, i))
          v2 = round32(v2, getInt(input, i + 4))
          v3 = round32(v3, getInt(input, i + 8))
          v4 = round32(v4, getInt(input, i + 12))
          i += 16
        }
        Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
          Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
      } else seed + Q5
    h += len
    while (i + 4 <= len) {
      h = Integer.rotateLeft(h + getInt(input, i) * Q3, 17) * Q4
      i += 4
    }
    while (i < len) {
      h = Integer.rotateLeft(h + (input(i) & 0xff) * Q5, 11) * Q1
      i += 1
    }
    h ^= h >>> 15
    h *= Q2
    h ^= h >>> 13
    h *= Q3
    h ^ (h >>> 16)
  }

  @inline private def round32(acc: Int, input: Int): Int =
    Integer.rotateLeft(acc + input * Q2, 13) * Q1

  /** create_hash_func (utils/hashing.py:44-50): the HashConfig selector —
    * precision 32 values are unsigned in the low Long bits, exactly the
    * reference's uint32 numpy dtype. */
  def forConfig(precision: Int, hashFc: String): String => Long = {
    require(precision == 32 || precision == 64, s"precision 32|64, got $precision")
    (precision, hashFc) match {
      case (32, "sha1") => sha1Hash32
      case (64, "sha1") => sha1Hash64
      case (32, "xxhash") => xxhash32(_: String)
      case (64, "xxhash") => xxhash64(_: String)
      case _ => throw new IllegalArgumentException(s"hash_fc sha1|xxhash, got $hashFc")
    }
  }
}
