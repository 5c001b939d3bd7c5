package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Resources, ZhSegmenter}

/** Planted multi-char OOV compounds (person / place / brand names) with
  * pinned segmentations — VERDICT r6 "Next round" #6. The golden file is
  * derived by the INDEPENDENT Python port of the DAG + finalseg HMM
  * (tools/gen_zh_oov_goldens.py over tools/diff_harness.py), so this spec
  * is a cross-implementation pin of the unknown-word path: every compound
  * is asserted OOV-as-a-word here, and the engine must reproduce the
  * port's cut byte-for-byte, across emission regimes (fully-unseen
  * name-register chars, high-emission surnames/morphemes, 2-4 char
  * shapes). */
class ZhOovCompoundSpec extends AnyFunSuite {

  private lazy val goldens: Seq[(String, String, Seq[String])] =
    Resources.readUtf8("/graft/zh_oov_golden.tsv").linesIterator
      .filterNot(l => l.startsWith("#") || l.isEmpty)
      .map { l =>
        val Array(w, kind, cut) = l.split("\t")
        (w, kind, cut.split('|').toSeq)
      }.toSeq

  test("corpus shape: >= 50 planted compounds, all OOV as words") {
    assert(goldens.size >= 50, s"only ${goldens.size} goldens")
    for ((w, _, _) <- goldens)
      assert(ZhSegmenter.freq.getOrElse(w, 0L) == 0L, s"$w is a dict word")
    // the set covers all three name kinds and both short/long shapes
    assert(goldens.map(_._2).toSet == Set("person", "place", "brand"))
    assert(goldens.exists(_._1.length == 2) && goldens.exists(_._1.length >= 4))
  }

  test("engine segmentation matches the independent-port golden for every compound") {
    for ((w, kind, expected) <- goldens) {
      val got = ZhSegmenter.cut(w)
      assert(got == expected, s"$kind $w: engine $got vs port $expected")
      assert(got.mkString == w, s"lossy cut for $w")
    }
  }
}
