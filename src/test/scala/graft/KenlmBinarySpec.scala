package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ArpaModel, KenlmBinary}

/** KenLM binary (PROBING) round trip: a model serialized into the public
  * binary layout and loaded back must score identically to its ARPA twin.
  * No pretrained KenLM binary can reach this sandbox, so fidelity is
  * asserted on the public layout constants (magic string, sanity header,
  * MurmurHash64A, CombineWordHash multipliers) plus exact score equality
  * across the write→load round trip. */
class KenlmBinarySpec extends AnyFunSuite {

  private def roundTrip(arpa: ArpaModel): (java.io.File, graft.functions.KenlmModel) = {
    val f = java.io.File.createTempFile("graft_kenlm", ".bin")
    f.deleteOnExit()
    KenlmBinary.write(arpa, f.getAbsolutePath)
    (f, KenlmBinary.load(f.getAbsolutePath))
  }

  test("tiny.arpa round trip: binary scorer equals the ARPA twin exactly") {
    val arpa = ArpaModel.parseResource("/graft/tiny.arpa")
    val (_, bin) = roundTrip(arpa)
    val sentences = Seq(
      "the quick brown fox",           // all in-vocab, bigram path
      "the quick brown fox jumps over the lazy dog",
      "fox unknownword the",           // OOV head + OOV context backoff
      "zzz yyy xxx",                   // all OOV -> <unk> unigrams
      "",                              // bos -> eos only
      "dog")                           // no-backoff unigram tail
    for (s <- sentences) {
      assert(bin.score(s) == arpa.score(s), s"score mismatch on '$s'")
    }
  }

  test("binary file leads with the kenlm magic string") {
    val arpa = ArpaModel.parseResource("/graft/tiny.arpa")
    val (f, _) = roundTrip(arpa)
    val head = java.nio.file.Files.readAllBytes(f.toPath).take(52)
    assert(new String(head.dropRight(1), "US-ASCII") ==
      "mmap lm http://kheafield.com/code format version 5\n")
    assert(head.last == 0, "magic must be NUL-terminated")
  }

  test("randomized trigram model round trip (probing collisions exercised)") {
    val rng = new scala.util.Random(20260817L)
    val words = (0 until 60).map(i => s"w$i")
    val sb = new StringBuilder
    sb.append("\\data\\\nngram 1=" + (words.length + 3) + "\n")
    val bigrams = (0 until 150).map { _ =>
      (words(rng.nextInt(words.length)), words(rng.nextInt(words.length)))
    }.distinct
    val trigrams = (0 until 200).map { _ =>
      (words(rng.nextInt(words.length)), words(rng.nextInt(words.length)),
        words(rng.nextInt(words.length)))
    }.distinct
    sb.append(s"ngram 2=${bigrams.length}\nngram 3=${trigrams.length}\n\n")
    sb.append("\\1-grams:\n-2.0\t<unk>\n-99\t<s>\t-0.5\n-1.8\t</s>\n")
    for (w <- words)
      sb.append(f"-${1.0 + rng.nextInt(20) / 10.0}%.1f\t$w\t-0.${1 + rng.nextInt(8)}%s\n")
    sb.append("\n\\2-grams:\n")
    for ((a, b) <- bigrams)
      sb.append(f"-0.${1 + rng.nextInt(9)}%s\t$a $b\t-0.${1 + rng.nextInt(5)}%s\n")
    sb.append("\n\\3-grams:\n")
    for ((a, b, c) <- trigrams)
      sb.append(f"-0.${1 + rng.nextInt(9)}%s\t$a $b $c\n")
    sb.append("\n\\end\\\n")

    val arpa = ArpaModel.parse(sb.toString)
    val (_, bin) = roundTrip(arpa)
    for (_ <- 0 until 200) {
      val n = 1 + rng.nextInt(8)
      val sent = (0 until n).map { _ =>
        if (rng.nextInt(10) == 0) "oov" + rng.nextInt(5)
        else words(rng.nextInt(words.length))
      }.mkString(" ")
      assert(bin.score(sent) == arpa.score(sent), s"score mismatch on '$sent'")
    }
  }

  test("murmur64 and chain hashes are deterministic and well-spread") {
    val hs = (0 until 100).map(i => KenlmBinary.hashWord("word" + i))
    assert(hs.distinct.length == 100)
    assert(KenlmBinary.hashWord("longerthan8byteword") ==
      KenlmBinary.hashWord("longerthan8byteword")) // block + tail path
    val chains = (0 until 100).map(i => KenlmBinary.chainHash(Array(1, i, i * 7)))
    assert(chains.distinct.length == 100)
  }
}
