package graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FastTextModel

/** Exercises the fastText .bin loader + supervised inference against a
  * synthetic model file written in the public format (magic 793712314,
  * version 12) — no pretrained model is available offline. */
class FastTextSpec extends AnyFunSuite {

  private def writeModel(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    def i32(v: Int): Unit = out.writeInt(Integer.reverseBytes(v))
    def i64(v: Long): Unit = out.writeLong(java.lang.Long.reverseBytes(v))
    def f64(v: Double): Unit = i64(java.lang.Double.doubleToLongBits(v))
    def str(s: String): Unit = { out.write(s.getBytes("UTF-8")); out.write(0) }
    def f32(v: Float): Unit = i32(java.lang.Float.floatToIntBits(v))

    val dim = 4
    i32(FastTextModel.Magic); i32(FastTextModel.Version)
    // args: dim ws epoch minCount neg wordNgrams loss model bucket minn maxn lrUpdateRate t
    i32(dim); i32(5); i32(5); i32(1); i32(5); i32(1); i32(1); i32(1)
    i32(0) /*bucket*/; i32(0) /*minn*/; i32(0) /*maxn*/; i32(100); f64(1e-4)
    // dictionary: size nwords nlabels ntokens pruneidx
    val words = Seq("the", "le", "</s>")
    val labels = Seq("__label__en", "__label__fr")
    i32(words.length + labels.length); i32(words.length); i32(labels.length)
    i64(1000L); i64(0L)
    for (w <- words) { str(w); i64(10L); out.writeByte(0) }
    for (l <- labels) { str(l); i64(10L); out.writeByte(1) }
    // input matrix (nwords + bucket) x dim — "the" → +e1, "le" → +e2
    out.writeBoolean(false)
    i64(words.length.toLong); i64(dim.toLong)
    val vecs = Seq(
      Array(1f, 0f, 0f, 0f), // the
      Array(0f, 1f, 0f, 0f), // le
      Array(0f, 0f, 0.1f, 0f)) // </s>
    vecs.foreach(_.foreach(f32))
    // output matrix nlabels x dim — en reads e1, fr reads e2
    out.writeBoolean(false)
    i64(labels.length.toLong); i64(dim.toLong)
    Seq(Array(4f, -4f, 0f, 0f), Array(-4f, 4f, 0f, 0f)).foreach(_.foreach(f32))
    out.flush()
    bos.toByteArray
  }

  private val model = FastTextModel.loadFrom(
    new DataInputStream(new java.io.ByteArrayInputStream(writeModel())))

  test("loader reads args, vocab, labels, matrices") {
    assert(model.dim == 4)
    assert(model.labels.toSeq == Seq("__label__en", "__label__fr"))
  }

  test("supervised prediction: softmax over labels, newline handling") {
    val (lang, score, all) = model.predict("the the the")
    assert(lang == "en" && score > 0.9, s"$lang $score")
    assert(math.abs(all.values.sum - 1.0) < 1e-9)
    val (lang2, score2, _) = model.predict("le\nle")
    assert(lang2 == "fr" && score2 > 0.9)
  }

  test("OOV-only text falls back to EOS vector (low-confidence)") {
    val (_, score, _) = model.predict("zzz qqq")
    assert(score < 0.9) // only </s> contributes → weak logits
  }

  test("fastText string hash matches the public FNV-1a variant") {
    // h = 2166136261; h ^= byte; h *= 16777619 (int32 wraparound)
    assert(FastTextModel.hash("") == 2166136261L)
    var h = 2166136261L.toInt
    for (b <- "a".getBytes("UTF-8")) { h ^= b; h *= 16777619 }
    assert(FastTextModel.hash("a") == (h.toLong & 0xffffffffL))
  }

  test("committed self-trained fixture model loads and classifies 5 languages") {
    val m = FastTextModel.fixture
    assert(m.dim == 16 && m.bucket == 0 && m.minn == 0)
    assert(m.labels.toSeq == Seq("de", "en", "es", "fr", "it").map("__label__" + _))
    val cases = Seq(
      "the quiet market and the bright garden of the village in the morning" -> "en",
      "le marché était calme ce matin et les enfants dans la rue près du pont" -> "fr",
      "der markt war heute ruhig und die kinder auf der straße nähe brücke" -> "de",
      "el mercado estaba tranquilo esta mañana y los niños en la calle cerca del puente" -> "es",
      "il mercato era tranquillo questa mattina e i bambini in strada vicino al ponte" -> "it")
    for ((text, want) <- cases) {
      val (lang, score, all) = m.predict(text)
      assert(lang == want, s"'$text' -> $lang ($score)")
      assert(score > 0.65, s"'$text' score $score below the LanguageFilter bar")
      assert(math.abs(all.values.sum - 1.0) < 1e-6)
    }
  }

  test("subword fixture: char-n-gram buckets classify OOV/misspelled words") {
    val m = FastTextModel.subwordFixture
    assert(m.bucket == 512 && m.minn == 2 && m.maxn == 4)
    // clean sentences classify like the word-level fixture
    val cases = Seq(
      "the quiet market and the bright garden of the village in the morning" -> "en",
      "le marché était calme ce matin et les enfants dans la rue près du pont" -> "fr",
      "der markt war heute ruhig und die kinder auf der straße nähe brücke" -> "de")
    for ((text, want) <- cases) {
      val (lang, score, _) = m.predict(text)
      assert(lang == want && score > 0.65, s"'$text' -> $lang ($score)")
    }
    // a misspelled/OOV content word rides on its subword vectors: the
    // word-level fixture can only fall back to the other (function) words,
    // but the subword model still sees the characteristic n-grams
    val (lang, _, _) = m.predict("the quiett markett and the bright gardens in the morning")
    assert(lang == "en", lang)
    val (langFr, _, _) = m.predict("le marchés était calmes ce matin dans la rue")
    assert(langFr == "fr", langFr)
  }

  test("drops into the LanguageFilter via the Lid seam") {
    val lf = new graft.operators.LanguageFilter(
      languages = Some(Seq("en")), lid = model)
    assert(lf.check("the the the the").keep)
    assert(!lf.check("le le le le").keep)
  }
  test("fast subword path equals the naive substring+getBytes reference on random unicode") {
    val model = graft.functions.FastTextModel.subwordFixture
    val rng = new scala.util.Random(20260817)
    // alphabets as CODE POINTS so astral chars stay well-formed pairs
    val alphabets: Seq[Array[Int]] = Seq(
      ('a' to 'z').mkString,                 // ascii
      "àéîöüçñßøæœ",                         // latin-1 accents (2-byte utf8)
      "的一是在不了有和人这中大为上",          // CJK (3-byte utf8)
      "καισεμεπουδεν",                       // greek
      "ивнасчтоне",                          // cyrillic
      "😀😁🚀")                              // astral (surrogate pairs)
      .map(_.codePoints().toArray)
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    for (_ <- 1 to 2000) {
      val alpha = alphabets(rng.nextInt(alphabets.length))
      val len = 1 + rng.nextInt(12)
      val word = (1 to len).map(_ => new String(Character.toChars(
        alpha(rng.nextInt(alpha.length))))).mkString
      buf.clear()
      model.subwordRowIds(word, buf)
      val naive = model.subwordRowIdsNaive(word)
      assert(buf.toSeq == naive, s"mismatch for [$word]")
    }
    // malformed input (lone surrogates): old and new paths may group the
    // broken halves differently — just must not crash and must stay
    // deterministic (real column data is valid UTF-16)
    buf.clear()
    model.subwordRowIds("ab\ud800cd\udc00", buf)
    val again = new scala.collection.mutable.ArrayBuffer[Int]()
    model.subwordRowIds("ab\ud800cd\udc00", again)
    assert(buf == again && buf.nonEmpty)
  }

  test("wide fixture: unspaced CJK text classifies via the subword path") {
    val m = graft.functions.FastTextModel.wideFixture
    val (zh, zs, _) = m.predict("的一是在不了有和人这中大为上个国我以要他时来用们生到作。")
    assert(zh == "zh", s"got $zh:$zs")
    val (en, es2, _) = m.predict("the quiet village and the bright morning market near the river")
    assert(en == "en" && es2 > 0.65)
    val (ja, _, _) = m.predict("これは静かな村の朝の市場です")
    assert(ja == "ja")
    val (ru, _, _) = m.predict("и в деревне на рынке утром было очень тихо")
    assert(ru == "ru")
  }

  test("corpus ko/vi kinds (63/64) classify as ko/vi and are dropped by the en filter") {
    // VERDICT r5 #8: the bench corpus now plants spaced ko/vi docs. The
    // en-kept invariant (123,665 at 200k) holds only if every one of them
    // is (a) labeled with its true language by the wide fixture and (b)
    // dropped by LanguageFilter(Seq("en")) — checked over 200 docs of each.
    val lf = new graft.operators.LanguageFilter(Some(Seq("en")))
    for (base <- 0L until 200L; kind <- Seq(63L, 64L)) {
      val id = base * 100L + kind
      val (text, lang) = graft.sources.WebCorpusGen.genText(id, graft.sources.WebCorpusGen.DefaultSeed)
      assert(lang == (if (kind == 63L) "ko" else "vi"))
      val (pred, score, _) = graft.functions.Lid.default.predict(text)
      assert(pred == lang, s"id=$id expected $lang got $pred ($score)")
      assert(score > 0.65, s"id=$id $lang score $score below the keep threshold")
      val r = lf.check(text)
      assert(!r.keep, s"id=$id ko/vi doc escaped the en language filter")
    }
  }

}