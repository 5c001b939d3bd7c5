package graft

import graft.operators._
import graft.sources.WebCorpusGen
import graft.text.{FastRepetition, PyText, TextKernels, Tokenizer}
import java.util.regex.Pattern

/** Phase breakdown of the GopherRepetition kernel (the hottest stage of the
  * full_pipeline chain per graft.Profile) — guides the r8 optimization. */
object ProfileRep {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000
    val texts = (0L until n.toLong).map(id => WebCorpusGen.genRow(id, 42L).text).toArray
    val ParaExp = Pattern.compile("\n{2,}")
    val LineExp = Pattern.compile("\n+")

    def time(name: String)(f: String => Any): Unit = {
      // warmup
      var w = 0
      while (w < math.min(500, texts.length)) { f(texts(w)); w += 1 }
      val t0 = System.nanoTime()
      var i = 0
      while (i < texts.length) { f(texts(i)); i += 1 }
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e6}%10.1f ms")
    }

    time("pyStrip")(PyText.pyStrip)
    time("paraSplit")(t => ParaExp.split(PyText.pyStrip(t), -1))
    time("paraSplit+findDup") { t =>
      TextKernels.findDuplicates(ParaExp.split(PyText.pyStrip(t), -1))
    }
    time("lineSplit+findDup") { t =>
      TextKernels.findDuplicates(LineExp.split(t, -1))
    }
    time("preprocessIdentity")(TextKernels.repetitionPreprocessIsIdentity)
    time("tokenize")(Tokenizer.words)
    time("repsConstruct") { t => new FastRepetition.Reps(Tokenizer.words(t)) }
    time("reps+top234") { t =>
      val r = new FastRepetition.Reps(Tokenizer.words(t))
      r.findTopDuplicate(2); r.findTopDuplicate(3); r.findTopDuplicate(4)
    }
    time("reps+dup5to10") { t =>
      val r = new FastRepetition.Reps(Tokenizer.words(t))
      var n = 5
      while (n <= 10) { r.findAllDuplicate(n); n += 1 }
    }
    time("fullCheck")(t => GopherRepetitionFilter.check(t))
  }
}
