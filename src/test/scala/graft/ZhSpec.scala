package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Tokenizer, ZhSegmenter}

class ZhSpec extends AnyFunSuite {

  test("max-prob picks whole dict words over char splits") {
    assert(ZhSegmenter.cut("我们") == Seq("我们"))
    assert(ZhSegmenter.cut("我们今天去北京大学") ==
      Seq("我们", "今天", "去", "北京大学"))
    assert(ZhSegmenter.cut("中国的发展") == Seq("中国", "的", "发展"))
  }

  test("unknown runs go through the finalseg-style HMM (joined, not singles)") {
    assert(ZhSegmenter.cut("魔焰") == Seq("魔焰"))
    assert(ZhSegmenter.cut("我们魔焰学习") == Seq("我们", "魔焰", "学习"))
    // raw DAG route (no HMM) still splits to singles
    assert(ZhSegmenter.cutNoHmm("魔焰") == Seq("魔", "焰"))
  }

  test("HMM emits B..E / S spans and partitions losslessly") {
    // 4 fully-unseen chars (彧犇淼焱 appear in NO dict word, checked below):
    // flat emissions, so transitions decide — B→E (log .7) beats B→M→M→E
    // (.3·.4·.6) and the start/E→B products favor BEBE = two 2-char words
    // (0.6·0.7·0.55·0.7 = .1617, the max over all B/M/E/S paths).
    val oov = "彧犇淼焱"
    assert(oov.forall(c => !ZhSegmenter.wordFreqs.keys.exists(_.contains(c))))
    val cut = ZhSegmenter.Hmm.cut(oov)
    assert(cut.mkString == oov)
    assert(cut == Seq("彧犇", "淼焱"))
    // the round-6 pin 鹿鸣魔焰 is no longer fully unseen: round 7's dict
    // waves made 鹿 an end-state char (梅花鹿/麋鹿/驯鹿), 鸣 end (耳鸣),
    // 魔 begin (魔方/魔鬼鱼) — emission mass now joins the run into one
    // 4-char word, which is exactly the emission-over-transition behavior
    // the model is supposed to show for name-like runs of seen chars.
    assert(ZhSegmenter.Hmm.cut("鹿鸣魔焰") == Seq("鹿鸣魔焰"))
  }

  test("buffered single-char dict words only HMM-join when the buffer has no dict freq") {
    // 去+了 are consecutive single-char route pieces; 去了 is not a dict
    // word, so jieba's __cut_DAG buffering sends the pair through the HMM
    val got = ZhSegmenter.cut("我们去了北京")
    assert(got.mkString == "我们去了北京")
    assert(got.contains("北京"))
  }

  test("prefix-only fragments do not emit zero-frequency words") {
    // 北京大 is a prefix of 北京大学 (freq 0 entry) — must not be emitted;
    // 大楼 is a dict word in the expanded dictionary
    assert(ZhSegmenter.cut("北京大楼") == Seq("北京", "大楼"))
  }

  test("Tokenizer routes CJK runs through the segmenter, mixed with Latin") {
    assert(Tokenizer.words("today我们去school").toSeq ==
      Seq("today", "我们", "去", "school"))
    assert(Tokenizer.words("我们今天去北京大学。然后学习").toSeq ==
      Seq("我们", "今天", "去", "北京大学", "。", "然后", "学习"))
  }

  test("HMM: lossless partition property over random CJK runs") {
    val rng = new scala.util.Random(123)
    val oovPool = (0x7a00 to 0x7aff).map(_.toChar).filterNot(c =>
      ZhSegmenter.wordFreqs.keys.exists(_.contains(c)))
    for (_ <- 1 to 200) {
      val len = 1 + rng.nextInt(12)
      val run = Array.fill(len)(oovPool(rng.nextInt(oovPool.length))).mkString
      val cut = ZhSegmenter.Hmm.cut(run)
      assert(cut.mkString == run, s"lossy partition for $run -> $cut")
      assert(cut.forall(_.nonEmpty))
    }
  }

  test("cut: lossless partition and determinism over random mixed runs") {
    val rng = new scala.util.Random(321)
    val dictWords = ZhSegmenter.wordFreqs.keys.toVector.sorted
    for (_ <- 1 to 100) {
      val parts = (1 to 1 + rng.nextInt(8)).map { _ =>
        if (rng.nextBoolean()) dictWords(rng.nextInt(dictWords.length))
        else (0x7b00 + rng.nextInt(128)).toChar.toString * (1 + rng.nextInt(3))
      }
      val run = parts.mkString
      val cut = ZhSegmenter.cut(run)
      assert(cut.mkString == run, s"lossy cut for $run -> $cut")
      assert(cut == ZhSegmenter.cut(run))
    }
  }

  test("deterministic across calls") {
    val s = "我们今天在北京学习计算机科学和机器学习"
    assert(ZhSegmenter.cut(s) == ZhSegmenter.cut(s))
    assert(ZhSegmenter.cut(s).mkString == s) // lossless partition
  }
}
