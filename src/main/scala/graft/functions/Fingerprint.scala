package graft.functions

import graft.text.{TextKernels, Tokenizer}

/** Document fingerprinting (prompt: rolling-hash content fingerprints).
  * A 64-bit content fingerprint = xxhash of the normalized text, plus a
  * winnowing-style sketch: minimum rolling hash per fixed-size window of
  * word 5-gram hashes (Schleimer et al. 2003 — local fingerprinting that
  * survives small edits, public algorithm). */
object Fingerprint {

  /** Whole-content fingerprint over simplify_text'd words. */
  def contentHash(text: String): Long =
    Hashes.xxhash64(Tokenizer.words(TextKernels.simplifyText(text)).mkString(" "))

  /** Winnowing sketch: for windows of `window` consecutive 5-gram hashes,
    * keep each window's minimum (dedupes overlapping picks). */
  def winnow(text: String, n: Int = 5, window: Int = 8): Array[Long] = {
    val words = Tokenizer.words(TextKernels.simplifyText(text))
    if (words.length < n) return Array.empty
    val grams = (0 to words.length - n).map { i =>
      Hashes.xxhash64(words.slice(i, i + n).mkString(" "))
    }.toArray
    if (grams.length <= window) return Array(grams.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i + window <= grams.length) {
      var m = grams(i)
      var j = i + 1
      while (j < i + window) { if (java.lang.Long.compareUnsigned(grams(j), m) < 0) m = grams(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }
}
