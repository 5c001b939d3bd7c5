package graft.functions

import graft.text.{PyText, Tokenizer}

/** Language identification.
  *
  * The reference scores docs with fastText lid.176.bin
  * (utils/lid.py:53-59: `model.predict(text.replace("\n"," "), k=-1)`,
  * then LanguageFilter keeps score > 0.65, filters/language_filter.py:9-65).
  * No pretrained model file can ship in this zero-egress sandbox, so the
  * default backend is a deterministic marker-word/char-evidence scorer with
  * a fastText-like normalized-probability output (scores over the supported
  * languages sum to 1). The trait seam allows dropping in a real fastText
  * .bin scorer (hashed n-gram embedding average + linear + softmax) when a
  * model file is available.
  */
trait Lid extends Serializable {
  /** Returns (bestLang, bestScore, all lang→score). Input newlines are
    * replaced with spaces first (utils/lid.py:54). */
  def predict(text: String): (String, Double, Map[String, Double])
}

object Lid {
  /** The default pipeline LID (round 5): REAL fastText `.bin` inference
    * over the committed 36-language wide fixture — the same
    * `model.predict(text.replace("\n"," "), k=-1)` path utils/lid.py:53-59
    * takes with lid.176.bin. The heuristic scorer remains only as the
    * fallback if the fixture resource is missing. */
  lazy val default: Lid = WideFastTextLid
}

/** Singleton wrapper so pipeline stages serialize as a module reference:
  * each executor JVM lazily loads the fixture from its own jar resources —
  * no model bytes travel in task closures and no broadcast is needed. */
object WideFastTextLid extends Lid {
  /** Fallback is narrowed to the genuinely-missing-resource case: we probe
    * for the classpath resource first and only then load it. Any failure
    * DURING the load (truncated bytes, transient I/O, OOM) propagates and
    * fails the task, so a flaky executor can never silently degrade the
    * cluster to mixed real-model/heuristic predictions. */
  @transient private lazy val backend: Lid =
    if (getClass.getResource(FastTextModel.WideFixturePath) == null) {
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"wide LID fixture ${FastTextModel.WideFixturePath} not on " +
          "classpath; falling back to HeuristicLid")
      HeuristicLid
    } else FastTextModel.wideFixture
  def predict(text: String): (String, Double, Map[String, Double]) =
    backend.predict(text)
}

object HeuristicLid extends Lid {
  // Per-language marker words. Distinctive words get higher weight; words
  // shared across Romance languages get weight 1.
  private def m(pairs: (String, Double)*): Map[String, Double] = pairs.toMap

  private val profiles: Map[String, Map[String, Double]] = Map(
    "en" -> m("the" -> 3, "of" -> 2, "and" -> 2, "to" -> 2, "in" -> 1, "is" -> 2,
      "that" -> 2, "it" -> 2, "was" -> 2, "for" -> 2, "not" -> 1.5, "have" -> 2,
      "be" -> 2, "with" -> 2, "are" -> 2, "this" -> 2, "my" -> 2, "said" -> 2,
      "you" -> 2, "they" -> 2, "wish" -> 2, "need" -> 2, "time" -> 2, "all" -> 1.5,
      "but" -> 2, "who" -> 1.5, "so" -> 1, "do" -> 1.5, "which" -> 2, "a" -> 0.75),
    "fr" -> m("le" -> 2, "la" -> 1, "les" -> 2, "un" -> 1, "une" -> 2, "des" -> 2,
      "et" -> 1.5, "est" -> 2, "que" -> 1, "qui" -> 2, "dans" -> 3, "pas" -> 3,
      "pour" -> 2.5, "vous" -> 3, "je" -> 3, "jamais" -> 3, "en" -> 1, "il" -> 1.5,
      "au" -> 2, "ce" -> 2, "ne" -> 1.5, "sont" -> 2.5, "avec" -> 3, "sur" -> 2,
      "mais" -> 3, "être" -> 3, "c" -> 1, "d" -> 1, "l" -> 1, "n" -> 1, "s" -> 0.5,
      "heure" -> 2, "arrive" -> 1.5, "retard" -> 1.5, "précisément" -> 2, "prévue" -> 2),
    "pt" -> m("o" -> 1.5, "os" -> 2, "as" -> 1.5, "um" -> 2, "uma" -> 2, "de" -> 1,
      "do" -> 2.5, "da" -> 2.5, "dos" -> 2.5, "das" -> 2.5, "que" -> 1, "não" -> 3,
      "para" -> 2, "com" -> 2, "em" -> 2, "por" -> 1.5, "é" -> 2, "se" -> 1,
      "mais" -> 1, "como" -> 1.5, "foi" -> 2.5, "são" -> 3, "ele" -> 2.5, "eu" -> 2,
      "você" -> 3, "nunca" -> 1.5, "chega" -> 2.5, "tarde" -> 1.5, "ao" -> 2,
      "mas" -> 1.5, "muito" -> 2.5, "já" -> 2.5, "quando" -> 2, "a" -> 0.75),
    "it" -> m("il" -> 1.5, "lo" -> 1.5, "la" -> 1, "i" -> 1.5, "gli" -> 3, "le" -> 1,
      "un" -> 1, "una" -> 2, "di" -> 2.5, "che" -> 2, "non" -> 2, "per" -> 2,
      "con" -> 1, "sono" -> 3, "della" -> 3, "tra" -> 2.5, "e" -> 1.5, "è" -> 2,
      "si" -> 1, "del" -> 1.5, "ma" -> 1.5, "come" -> 2, "più" -> 3, "anche" -> 3,
      "molti" -> 2.5, "morte" -> 2, "vita" -> 2, "essere" -> 3, "questo" -> 3,
      "vivi" -> 2, "meritano" -> 2.5),
    "es" -> m("el" -> 2, "la" -> 1, "los" -> 2.5, "las" -> 2, "un" -> 1, "una" -> 2,
      "de" -> 1, "que" -> 1, "no" -> 1.5, "por" -> 1.5, "con" -> 1, "para" -> 2,
      "es" -> 2, "y" -> 2.5, "en" -> 1, "se" -> 1, "su" -> 1.5, "al" -> 1.5,
      "como" -> 1.5, "está" -> 3, "pero" -> 3, "más" -> 3, "sí" -> 2.5, "muy" -> 3,
      "también" -> 3, "cuando" -> 2, "usted" -> 3, "del" -> 1.5),
    "de" -> m("der" -> 3, "die" -> 3, "das" -> 3, "und" -> 3, "ist" -> 2.5,
      "nicht" -> 3, "ein" -> 2.5, "eine" -> 3, "zu" -> 2, "mit" -> 2.5, "von" -> 2.5,
      "für" -> 3, "auf" -> 2.5, "den" -> 2, "im" -> 2, "sich" -> 3, "auch" -> 3,
      "werden" -> 3, "sind" -> 3, "dem" -> 2.5, "des" -> 1, "als" -> 2, "bei" -> 2.5,
      "aber" -> 3, "oder" -> 3, "wir" -> 2.5, "sie" -> 2.5, "es" -> 1))

  // accented-char evidence: char → (lang → weight) per occurrence
  private val charEvidence: Map[Char, Map[String, Double]] = Map(
    'é' -> Map("fr" -> 0.8, "pt" -> 0.4, "es" -> 0.4),
    'è' -> Map("fr" -> 0.8, "it" -> 0.8),
    'ê' -> Map("fr" -> 0.9, "pt" -> 0.5),
    'à' -> Map("fr" -> 0.7, "it" -> 0.6, "pt" -> 0.4),
    'ù' -> Map("fr" -> 0.6, "it" -> 0.8),
    'ì' -> Map("it" -> 1.0),
    'ò' -> Map("it" -> 1.0),
    'ç' -> Map("fr" -> 0.6, "pt" -> 0.6),
    'ã' -> Map("pt" -> 1.2),
    'õ' -> Map("pt" -> 1.2),
    'ñ' -> Map("es" -> 1.2),
    '¿' -> Map("es" -> 1.5), '¡' -> Map("es" -> 1.5),
    'í' -> Map("es" -> 0.6, "pt" -> 0.6),
    'ó' -> Map("es" -> 0.6, "pt" -> 0.6),
    'á' -> Map("es" -> 0.6, "pt" -> 0.6),
    'ú' -> Map("es" -> 0.6, "pt" -> 0.6),
    'ü' -> Map("de" -> 1.0, "es" -> 0.2),
    'ö' -> Map("de" -> 1.0),
    'ä' -> Map("de" -> 1.0),
    'ß' -> Map("de" -> 1.5))

  val languages: Seq[String] = Seq("en", "fr", "pt", "it", "es", "de", "zh")
  private val langIndex: Map[String, Int] = languages.zipWithIndex.toMap

  // one combined lookup per word: word → packed (langIdx, weight) pairs
  private val combinedProfiles: java.util.HashMap[String, Array[(Int, Double)]] = {
    val m = new java.util.HashMap[String, Array[(Int, Double)]]()
    val all = profiles.toSeq.flatMap { case (lang, p) =>
      p.toSeq.map { case (w, wt) => (w, langIndex(lang), wt) }
    }
    all.groupBy(_._1).foreach { case (w, entries) =>
      m.put(w, entries.map(e => (e._2, e._3)).toArray)
    }
    m
  }

  override def predict(text: String): (String, Double, Map[String, Double]) = {
    val scores = new Array[Double](languages.length)

    // char evidence (accents → romance/german; CJK → zh); ASCII fast path
    var cjk = 0
    var total = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c < 0x80) {
        if (!PyText.pyIsSpace(c)) total += 1
      } else if (!PyText.pyIsSpace(c)) {
        total += 1
        if ((c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3400 && c <= 0x4dbf)) cjk += 1
        val ev = charEvidence.getOrElse(Character.toLowerCase(c), null)
        if (ev != null) ev.foreach { case (l, w) => scores(langIndex(l)) += w }
      }
      i += 1
    }
    if (total > 0 && cjk > 0) scores(langIndex("zh")) += cjk.toDouble / total * 40.0

    // marker-word evidence over lowercased tokens (newlines are token
    // separators either way, matching predict(text.replace("\n"," ")))
    val words = Tokenizer.words(text)
    i = 0
    while (i < words.length) {
      val hits = combinedProfiles.get(PyText.pyLower(words(i)))
      if (hits != null) {
        var j = 0
        while (j < hits.length) { scores(hits(j)._1) += hits(j)._2; j += 1 }
      }
      i += 1
    }

    var sum = 0.0
    i = 0
    while (i < scores.length) { sum += scores(i); i += 1 }
    if (sum <= 0) {
      // no evidence: mimic fastText's low-confidence fallback
      ("en", 0.0, Map("en" -> 0.0))
    } else {
      val normalized = languages.zipWithIndex.map { case (l, k) => l -> scores(k) / sum }.toMap
      val (bestLang, bestScore) = normalized.maxBy { case (l, s) => (s, l) }
      (bestLang, bestScore, normalized)
    }
  }
}
