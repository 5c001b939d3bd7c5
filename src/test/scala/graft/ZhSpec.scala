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

  test("unknown characters fall back to singles (no HMM)") {
    assert(ZhSegmenter.cut("魔焰") == Seq("魔", "焰"))
    assert(ZhSegmenter.cut("我们魔焰学习") == Seq("我们", "魔", "焰", "学习"))
  }

  test("prefix-only fragments do not emit zero-frequency words") {
    // 北京大 is a prefix of 北京大学 (freq 0 entry) — must not be emitted
    assert(ZhSegmenter.cut("北京大楼") == Seq("北京", "大", "楼"))
  }

  test("Tokenizer routes CJK runs through the segmenter, mixed with Latin") {
    assert(Tokenizer.words("today我们去school").toSeq ==
      Seq("today", "我们", "去", "school"))
    assert(Tokenizer.words("我们今天去北京大学。然后学习").toSeq ==
      Seq("我们", "今天", "去", "北京大学", "。", "然后", "学习"))
  }

  test("deterministic across calls") {
    val s = "我们今天在北京学习计算机科学和机器学习"
    assert(ZhSegmenter.cut(s) == ZhSegmenter.cut(s))
    assert(ZhSegmenter.cut(s).mkString == s) // lossless partition
  }
}
