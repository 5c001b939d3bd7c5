package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Tokenizer

/** Punkt-style splitter parity fixtures (VERDICT r3 #8). nltk cannot run in
  * this sandbox, so expected splits are hand-derived from punkt's published
  * behavior (abbreviation suppression, orthographic sentence-starter
  * evidence after ellipses, initials); the fixture classes and agreement
  * are tabled in BENCH.md. sentenceCount (the quality filters' simpler
  * counter) is intentionally NOT widened — diff-harness compatibility. */
class SplitterSpec extends AnyFunSuite {

  private def split(s: String): Seq[String] = Tokenizer.sentences(s).toSeq

  test("abbreviations: months, weekdays, titles do not end sentences") {
    assert(split("He met Gen. Smith on Mon. Oct. 5 in the office. Then he left.") ==
      Seq("He met Gen. Smith on Mon. Oct. 5 in the office.", "Then he left."))
    assert(split("The memo is due Fri. Dec. 12 at noon. Send it early.") ==
      Seq("The memo is due Fri. Dec. 12 at noon.", "Send it early."))
    assert(split("Sen. Jones met Gov. Lee. They spoke briefly.") ==
      Seq("Sen. Jones met Gov. Lee.", "They spoke briefly."))
  }

  test("common-word lookalikes still split (sun/may/wed excluded by design)") {
    assert(split("He stared at the sun. Then he blinked.") ==
      Seq("He stared at the sun.", "Then he blinked."))
    assert(split("They finally wed. The party followed.") ==
      Seq("They finally wed.", "The party followed."))
  }

  test("ellipsis continues the sentence without orthographic evidence") {
    assert(split("I waited... and waited some more. Done now.") ==
      Seq("I waited... and waited some more.", "Done now."))
    assert(split("Well… maybe not. Sure.") ==
      Seq("Well… maybe not.", "Sure."))
  }

  test("ellipsis splits before an uppercase or digit sentence start") {
    assert(split("He stopped... Then he ran. The end.") ==
      Seq("He stopped...", "Then he ran.", "The end."))
    assert(split("Count them... 12 were left.") ==
      Seq("Count them...", "12 were left."))
    assert(split("""She whispered... "Go now." He went.""") ==
      Seq("She whispered...", "\"Go now.\"", "He went."))
  }

  test("ellipsis at end of text closes the last sentence") {
    assert(split("It faded away...") == Seq("It faded away..."))
    assert(split("First part. It faded away…") ==
      Seq("First part.", "It faded away…"))
  }

  test("initials and in-number periods never split") {
    assert(split("J. R. R. Tolkien wrote it. It sold well.") ==
      Seq("J. R. R. Tolkien wrote it.", "It sold well."))
    assert(split("Pi is 3.14 roughly. Next sentence!") ==
      Seq("Pi is 3.14 roughly.", "Next sentence!"))
  }

  test("sentenceCount stays the simple diff-harness-compatible counter") {
    // counts every terminal run: no abbreviation or ellipsis guards
    assert(Tokenizer.sentenceCount("Dr. Smith arrived. He sat down.") == 3)
    assert(Tokenizer.sentenceCount("I waited... and waited. Done.") == 3)
  }
}
