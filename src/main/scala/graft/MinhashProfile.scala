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
