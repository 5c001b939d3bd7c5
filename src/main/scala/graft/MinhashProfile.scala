package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{MinhashDedup, MinhashDedupConfig}
import graft.text.{TextKernels, Tokenizer}
import graft.functions.Hashes

/** Micro-profile of the minhash signature kernel's cost components on real
  * corpus texts (single-threaded, driver-side): tokenize+simplify, sha1
  * digests, permutation loop. Guides VERDICT r5 #3 without guessing. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 20000
    val corpus = if (args.length > 1) args(1) else "/tmp/graft_corpus_2000000"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = spark.read.parquet(corpus)
      .select("text").limit(nDocs).collect().map(_.getString(0))
    spark.stop()

    val cfg = MinhashDedupConfig()
    val (a, b) = MinhashDedup.parameters(cfg)
    val n = cfg.numBuckets * cfg.hashesPerBucket
    val ng = cfg.nGrams
    val M = (1L << 61) - 1

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  (sink=$out)")
    }

    // warm
    texts.take(2000).foreach(t => Tokenizer.words(TextKernels.simplifyText(t)))

    var sink = 0L
    time("tokenize+simplify") {
      var s = 0L
      texts.foreach { t => s += Tokenizer.words(TextKernels.simplifyText(t)).length }
      s
    }
    val tokenized = texts.map(t => Tokenizer.words(TextKernels.simplifyText(t)))
    time("utf8 encode words") {
      var s = 0L
      tokenized.foreach { ws => ws.foreach(w => s += w.getBytes("UTF-8").length) }
      s
    }
    val wbytes = tokenized.map(_.map(_.getBytes("UTF-8")))
    time("sha1 digests only") {
      var s = 0L
      wbytes.foreach { ws =>
        var i = 0
        val last = ws.length - ng
        while (i <= last) {
          val md = Hashes.sha1Borrow()
          var j = i
          while (j < i + ng) { if (j > i) md.update(' '.toByte); md.update(ws(j)); j += 1 }
          s += Hashes.sha1DigestToLong64(md.digest())
          i += 1
        }
      }
      s
    }
    // precompute h0 streams to isolate the permutation loop
    val h0s = wbytes.map { ws =>
      val last = ws.length - ng
      if (last < 0) Array.empty[Long]
      else Array.tabulate(last + 1) { i =>
        val md = Hashes.sha1Borrow()
        var j = i
        while (j < i + ng) { if (j > i) md.update(' '.toByte); md.update(ws(j)); j += 1 }
        Hashes.sha1DigestToLong64(md.digest())
      }
    }
    time("perm loop (fast mod)") {
      var s = 0L
      h0s.foreach { hs =>
        val mins = Array.fill(n)(-1L)
        hs.foreach { h0 =>
          var k = 0
          while (k < n) {
            val v = h0 * a(k) + b(k)
            var phv = (v & M) + (v >>> 61)
            if (phv >= M) phv -= M
            if (java.lang.Long.compareUnsigned(phv, mins(k)) < 0) mins(k) = phv
            k += 1
          }
        }
        s += mins(0)
      }
      s
    }
    time("perm loop (transposed)") {
      // perm-outer / shingle-inner: a(k), b(k) hoist to registers, the
      // running min lives in a register instead of a mins(k) load+store
      var s = 0L
      h0s.foreach { hs =>
        val mins = new Array[Long](n)
        val len = hs.length
        var k = 0
        while (k < n) {
          val ak = a(k); val bk = b(k)
          var mn = -1L
          var i = 0
          while (i < len) {
            val v = hs(i) * ak + bk
            var phv = (v & M) + (v >>> 61)
            if (phv >= M) phv -= M
            if (java.lang.Long.compareUnsigned(phv, mn) < 0) mn = phv
            i += 1
          }
          mins(k) = mn
          k += 1
        }
        s += mins(0)
      }
      s
    }
    time("perm loop (transposed x2)") {
      // 2-way unroll over k: two independent min chains per pass, half the
      // passes over the h0 array (n is even for all configs: nb*hpb)
      var s = 0L
      h0s.foreach { hs =>
        val mins = new Array[Long](n)
        val len = hs.length
        var k = 0
        while (k + 1 < n) {
          val a0 = a(k); val b0 = b(k); val a1 = a(k + 1); val b1 = b(k + 1)
          var m0 = -1L; var m1 = -1L
          var i = 0
          while (i < len) {
            val h0 = hs(i)
            val v0 = h0 * a0 + b0
            var p0 = (v0 & M) + (v0 >>> 61)
            if (p0 >= M) p0 -= M
            if (java.lang.Long.compareUnsigned(p0, m0) < 0) m0 = p0
            val v1 = h0 * a1 + b1
            var p1 = (v1 & M) + (v1 >>> 61)
            if (p1 >= M) p1 -= M
            if (java.lang.Long.compareUnsigned(p1, m1) < 0) m1 = p1
            i += 1
          }
          mins(k) = m0; mins(k + 1) = m1
          k += 2
        }
        if (k < n) {
          val ak = a(k); val bk = b(k)
          var mn = -1L
          var i = 0
          while (i < len) {
            val v = hs(i) * ak + bk
            var phv = (v & M) + (v >>> 61)
            if (phv >= M) phv -= M
            if (java.lang.Long.compareUnsigned(phv, mn) < 0) mn = phv
            i += 1
          }
          mins(k) = mn
        }
        s += mins(0)
      }
      s
    }
    time("perm loop (remainderUnsigned)") {
      var s = 0L
      h0s.foreach { hs =>
        val mins = Array.fill(n)(-1L)
        hs.foreach { h0 =>
          var k = 0
          while (k < n) {
            val phv = java.lang.Long.remainderUnsigned(h0 * a(k) + b(k), M)
            if (java.lang.Long.compareUnsigned(phv, mins(k)) < 0) mins(k) = phv
            k += 1
          }
        }
        s += mins(0)
      }
      s
    }
    println(s"docs=$nDocs avgWords=${tokenized.map(_.length.toLong).sum / nDocs} sink=$sink")
  }
}
