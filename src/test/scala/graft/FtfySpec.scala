package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EncodingFixer, FtfyLite}

class FtfySpec extends AnyFunSuite {
  private val esc = 0x1b.toChar

  test("unescape_html auto: unescapes entities only without raw markup") {
    assert(FtfyLite.unescapeHtml("fish &amp; chips &eacute;") == "fish & chips é")
    assert(FtfyLite.unescapeHtml("&#233; and &#x20AC;") == "é and €")
    // raw markup present -> leave alone (ftfy's "auto" heuristic)
    assert(FtfyLite.unescapeHtml("<b>fish &amp; chips</b>") == "<b>fish &amp; chips</b>")
    // unknown entity untouched
    assert(FtfyLite.unescapeHtml("&nosuchentity; ok &amp;") == "&nosuchentity; ok &")
  }

  test("remove_terminal_escapes strips ANSI CSI sequences") {
    assert(FtfyLite.removeTerminalEscapes(s"${esc}[1;31mred${esc}[0m plain") == "red plain")
    assert(FtfyLite.removeTerminalEscapes("no escapes") == "no escapes")
  }

  test("fix_encoding: latin-1 and cp1252 mojibake repair") {
    // "café" written as UTF-8, read as Latin-1
    assert(EncodingFixer.fixText("cafÃ©") == "café")
    // "don't" with curly quote: E2 80 99 read as cp1252 -> â€™ (€/™ are C1 displayables)
    assert(EncodingFixer.fixText("donâ€™t") == "don’t")
    // already-fine text untouched
    assert(EncodingFixer.fixText("plain café text") == "plain café text")
  }

  test("fix_c1_controls maps the C1 range to windows-1252 displayables") {
    assert(FtfyLite.fixC1Controls("a\u0093quoted\u0094b") == "a“quoted”b")
    assert(FtfyLite.fixC1Controls("a\u0081b") == "a\u0081b") // unmapped C1 stays
  }

  test("fix_surrogates: valid pairs kept, lone surrogates replaced") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(FtfyLite.fixSurrogates(s"ok $emoji ok") == s"ok $emoji ok")
    assert(FtfyLite.fixSurrogates("bad \ud83d end") == "bad � end")
    assert(FtfyLite.fixSurrogates("bad \ude00 end") == "bad � end")
  }

  test("remove_control_chars keeps tab/newline/formfeed/cr, drops the rest") {
    assert(FtfyLite.removeControlChars("a\u0000b\u0007c\td\ne") == "abc\td\ne")
  }

  test("full pipeline composes in ftfy order") {
    val in = s"cafÃ© &amp; bar${esc}[0m\u0001"
    assert(FtfyLite.fix(in) == "café & bar")
  }
}
