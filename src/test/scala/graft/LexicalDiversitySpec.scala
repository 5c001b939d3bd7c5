package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LexicalDiversity

class LexicalDiversitySpec extends AnyFunSuite {

  test("counterEntropy: hand-computed fixtures") {
    assert(LexicalDiversity.counterEntropy(Nil) == 0.0)
    assert(LexicalDiversity.counterEntropy(Seq(7)) == 0.0)
    assert(LexicalDiversity.counterEntropy(Seq(1, 1)) == 1.0) // uniform 2 -> 1 bit
    assert(LexicalDiversity.counterEntropy(Seq(2, 2, 2, 2)) == 2.0) // uniform 4
    // Counter({a:3, b:1}): -(0.75*log2(0.75) + 0.25*log2(0.25)) = 0.8112781...
    assert(math.abs(LexicalDiversity.counterEntropy(Seq(3, 1)) - 0.8112781244591328) < 1e-12)
    // order independence (sorted fold)
    assert(LexicalDiversity.counterEntropy(Seq(5, 2, 9)) ==
      LexicalDiversity.counterEntropy(Seq(9, 5, 2)))
  }

  test("preprocessText: strips lines, de-pipes markdown table rows") {
    val in = "  hello world  \n| a | b |\nnormal | not table"
    assert(LexicalDiversity.preprocessText(in) ==
      "hello world\n  a   b  \nnormal | not table")
  }

  test("en tagger-lite + content words") {
    val r = LexicalDiversity.compute("the dog quickly jumped over joyful tables and it ran")
    // tags: the=DT dog=NN quickly=RB jumped=VBD over=IN joyful=JJ tables=NNS
    //       and=CC it=PRP ran=NN
    assert(r.nContent == 6) // dog quickly jumped joyful tables ran
    assert(r.nDistinctContent == 6)
    assert(r.nTags == 9) // DT NN RB VBD IN JJ NNS CC PRP
  }

  test("alpha-word filter drops punctuation tokens like the reference") {
    val (words, _) = LexicalDiversity.predict("dog . cat ! 42", "en")
    assert(words.toSeq == Seq("dog", "cat")) // '.', '!', '42' have no letters
  }

  test("zh: dict tags drive content-word selection") {
    val r = LexicalDiversity.compute("我们今天去北京大学学习", "zh")
    // 我们=r 今天=t 去=v 北京大学=nt 学习=v — all content tags (r,t,v,nt)
    assert(r.nContent == 5)
    assert(r.nDistinctContent == 5)
    // unknown word -> 'x' (not content)
    val r2 = LexicalDiversity.compute("魔焰", "zh")
    assert(r2.nContent == 0)
  }
}
