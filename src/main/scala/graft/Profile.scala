package graft
import graft.operators._
import graft.sources.WebCorpusGen
object Profile {
  def main(args: Array[String]): Unit = {
    val rows = (0L until 4000L).map(id => WebCorpusGen.genRow(id, 42L))
    val texts = rows.map(_.text).toArray
    val lf = new LanguageFilter(Some(Seq("en")))
    def time(name: String)(f: String => Any): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < texts.length) { f(texts(i)); i += 1 }
      println(f"$name%-22s ${(System.nanoTime()-t0)/1e6}%10.1f ms  ${texts.length*1e9/(System.nanoTime()-t0)}%8.0f docs/s")
    }
    // warmup
    texts.take(500).foreach { t => lf.check(t); GopherRepetitionFilter.check(t); GopherQualityFilter.check(t); FineWebQualityFilter.check(t); C4QualityFilter.check(t); graft.text.Tokenizer.wordCount(t); graft.text.Tokenizer.words(t) }
    // force the segmenter's lazy dict load OUTSIDE the timed loop — at 4000
    // iterations the one-time 44k-entry parse would otherwise dominate the
    // per-cut number
    graft.text.ZhSegmenter.cut("我们今天去北京大学学习计算机")
    time("language_filter")(lf.check)
    time("gopher_repetition")(t => GopherRepetitionFilter.check(t))
    time("gopher_quality")(t => GopherQualityFilter.check(t))
    time("c4_quality")(t => C4QualityFilter.check(t))
    time("fineweb_quality")(t => FineWebQualityFilter.check(t))
    time("tokens_counter")(t => graft.text.Tokenizer.words(t).length)
    time("pii")(t => new PiiScrubber().scrub(t))
    time("simplify_text")(t => graft.text.TextKernels.simplifyText(t))
    time("word_count_native")(t => graft.text.Tokenizer.wordCount(t))
    time("zh_segment")(t => graft.text.ZhSegmenter.cut("我们今天去北京大学学习计算机"))
  }
}
