package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{FastRepetition, TextKernels}

/** Randomized equivalence: the hash-windowed kernels must agree with the
  * direct string-scan ports on arbitrary word sequences — including the
  * concatenation-collision corner ("ab"+"c" == "a"+"bc" in the unspaced
  * join, which IS a duplicate under the reference's semantics). */
class FastRepetitionSpec extends AnyFunSuite {

  private val pool = Array("a", "b", "ab", "ba", "abc", "the", "cat", "x", "catx", "thecat")

  test("findAllDuplicate: fast == reference port (1000 random cases)") {
    val rng = new scala.util.Random(1234)
    for (_ <- 1 to 1000) {
      val words = Array.fill(rng.nextInt(40))(pool(rng.nextInt(pool.length)))
      val n = 1 + rng.nextInt(6)
      val slow = TextKernels.findAllDuplicate(words, n)
      val fast = new FastRepetition.Reps(words).findAllDuplicate(n)
      assert(fast == slow, s"words=${words.mkString("|")} n=$n")
    }
  }

  test("findTopDuplicate: fast == reference port (1000 random cases)") {
    val rng = new scala.util.Random(99)
    for (_ <- 1 to 1000) {
      val words = Array.fill(rng.nextInt(40))(pool(rng.nextInt(pool.length)))
      val n = 1 + rng.nextInt(4)
      val grams = TextKernels.getNGrams(words, n)
      val slow = if (grams.isEmpty) 0 else TextKernels.findTopDuplicate(grams)
      val fast = new FastRepetition.Reps(words).findTopDuplicate(n)
      assert(fast == slow, s"words=${words.mkString("|")} n=$n")
    }
  }

  test("concatenation collision counts as duplicate (unspaced join semantics)") {
    // "ab"+"c" and "a"+"bc" join to "abc" — the reference sees a duplicate
    val words = Array("ab", "c", "a", "bc")
    assert(TextKernels.findAllDuplicate(words, 2) ==
      new FastRepetition.Reps(words).findAllDuplicate(2))
    assert(TextKernels.findAllDuplicate(words, 2) == 3) // "abc" repeated
  }
}
