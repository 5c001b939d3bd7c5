package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ArpaModel, CcNetNormalizer, PerplexityScorer}

class PerplexitySpec extends AnyFunSuite {

  // Hand-built 2-gram ARPA fixture (FIXTURES.md §12); scores hand-computed.
  private val arpa =
    """\data\
ngram 1=5
ngram 2=4

\1-grams:
-1.0	<unk>
-0.699	<s>	-0.301
-0.699	</s>
-0.602	the	-0.301
-0.602	cat	-0.301

\2-grams:
-0.301	<s> the
-0.301	the cat
-0.477	cat </s>
-0.602	the the

\end\
"""

  private val model = ArpaModel.parse(arpa)

  test("arpa: direct n-gram hits") {
    // <s> the → -0.301; the cat → -0.301; cat </s> → -0.477
    assert(math.abs(model.score("the cat") - (-0.301 - 0.301 - 0.477)) < 1e-6)
  }

  test("arpa: backoff path") {
    // P(cat|<s>) = bo(<s>) + P(cat) = -0.301 - 0.602 = -0.903
    // P(the|cat) = bo(cat) + P(the) = -0.301 - 0.602 = -0.903
    // P(</s>|the) = bo(the) + P(</s>) = -0.301 - 0.699 = -1.000
    assert(math.abs(model.score("cat the") - (-2.806)) < 1e-6)
  }

  test("arpa: OOV uses <unk>") {
    // P(dog|<s>) = bo(<s>) + P(dog→<unk>) = -0.301 - 1.0 = -1.301
    // P(</s>|dog): "dog </s>" missing, bo(dog) missing → 0 + P(</s>) = -0.699
    assert(math.abs(model.score("dog") - (-2.0)) < 1e-6)
  }

  test("perplexity: 10^(−Σlog10/Σ(len+1)) rounded to 1dp (perplexity.py:123-139)") {
    val scorer = new PerplexityScorer(model, normalizeCcNet = false)
    // "the cat": log -1.079, len 3 → 10^0.3597 = 2.289 → 2.3
    assert(scorer.perplexity("the cat") == 2.3)
    // "cat the": log -2.806, len 3 → 10^0.9353 = 8.617 → 8.6
    assert(scorer.perplexity("cat the") == 8.6)
  }

  test("cc_net normalization: lowercase, digits→0, unicode punct, non-printing") {
    assert(CcNetNormalizer.normalize("The CAT 42") == "the cat 0")
    assert(CcNetNormalizer.normalize("a，b。c？") == "a,b.c?")
    assert(CcNetNormalizer.normalize("x\u0007y") == "xy")
    assert(CcNetNormalizer.normalize("café") == "cafe") // NFD + Mn strip
    assert(CcNetNormalizer.normalize("— dash") == " -  dash") // '—' → ' - ' after the strip
  }

  test("perplexity orders fluent vs scrambled text") {
    val scorer = new PerplexityScorer(model)
    assert(scorer.perplexity("The Cat") < scorer.perplexity("dog dog dog"))
  }
}
