package graft

import graft.operators.{DocTokenizer, DocTokenizerConfig}
import graft.text.Tokenizer

class DocTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("binary .ds + .index round trip (uint16), EOS-terminated docs") {
    val dir = java.nio.file.Files.createTempDirectory("ds").toString
    val df = Seq("the quick fox", "another document here with words", "third one")
      .toDF("text").coalesce(1)
    val stats = DocTokenizer.write(df, "text", dir,
      DocTokenizerConfig(vocabSize = 50257, shuffle = false))
    assert(stats.map(_._2).sum == 3) // 3 docs
    val docs = DocTokenizer.readRank(s"$dir/00000.ds", wide = false)
    assert(docs.length == 3)
    assert(docs.forall(_.last == 0)) // EOS separator
    assert(docs(0).length == Tokenizer.words("the quick fox").length + 1)
    // ids are deterministic per word
    val again = DocTokenizer.encode("the quick fox", 50257)
    assert(docs(0).toSeq == again.toSeq)
  }

  test("uint32 path for vocabs over 64k") {
    val dir = java.nio.file.Files.createTempDirectory("ds32").toString
    val df = Seq("wide vocab document").toDF("text").coalesce(1)
    DocTokenizer.write(df, "text", dir, DocTokenizerConfig(vocabSize = 100000, shuffle = false))
    val docs = DocTokenizer.readRank(s"$dir/00000.ds", wide = true)
    assert(docs.length == 1 && docs(0).last == 0)
  }

  test("seeded shuffle is deterministic") {
    val dir1 = java.nio.file.Files.createTempDirectory("dsh1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("dsh2").toString
    val df = (1 to 50).map(i => s"document number $i with content").toDF("text").coalesce(1)
    DocTokenizer.write(df, "text", dir1, DocTokenizerConfig(shuffle = true, seed = 7))
    DocTokenizer.write(df, "text", dir2, DocTokenizerConfig(shuffle = true, seed = 7))
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir1/00000.ds"))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir2/00000.ds"))
    assert(java.util.Arrays.equals(a, b))
  }

  test("bpe-ish token count segments like the GPT-2 pre-tokenizer") {
    assert(Tokenizer.bpeishCount("hello world") == 2) // "hello", " world"
    assert(Tokenizer.bpeishCount("it's fine") == 3) // "it", "'s", " fine"
    assert(Tokenizer.bpeishCount("a1 b!") == 4) // "a","1"," b","!"
    assert(Tokenizer.bpeishCount("") == 0)
  }
}
