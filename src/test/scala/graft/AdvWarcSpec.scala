package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrafilaturaExtractor

/** Byte-equality replay of the adversarial mini-warc corpus: 61 pages of
  * markup the general extractor was NOT co-designed with (noise grammar +
  * 11 hand-authored pages), goldens computed independently in Python by
  * tools/gen_adv_warc.py from the planted content only. The driver-facing
  * twin is the `warc_extract_general` query (md5/length oracle); this spec
  * pins the full text byte-for-byte. */
class AdvWarcSpec extends AnyFunSuite {

  private def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case '\\' => b.append('\\'); i += 2
          case other => b.append(c); b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private lazy val goldens: Map[String, String] =
    new String(graft.text.Resources.readBytes("/graft/adv_golden.tsv"), "UTF-8")
      .split("\n").filter(_.nonEmpty).map { line =>
        val tab = line.indexOf('\t')
        line.substring(0, tab) -> unescape(line.substring(tab + 1))
      }.toMap

  private lazy val extracted: Map[String, String] = {
    val bytes = graft.text.Resources.readBytes("/graft/adv.warc")
    graft.sources.WarcParser.parse("adv.warc", bytes)
      .map(d => d.url -> TrafilaturaExtractor.extract(new String(d.html, "UTF-8")))
      .toMap
  }

  test("corpus shape: 61 pages, all with goldens") {
    assert(extracted.size == 61)
    assert(goldens.size == 61)
    assert(extracted.keySet == goldens.keySet)
  }

  test("every page extracts byte-identical to its independent golden") {
    val bad = goldens.toSeq.sortBy(_._1).flatMap { case (url, want) =>
      val got = extracted(url)
      if (got != want) Some(s"$url:\n  want [${want.take(300)}]\n  got  [${got.take(300)}]")
      else None
    }
    assert(bad.isEmpty, s"${bad.size} mismatching pages:\n${bad.mkString("\n")}")
  }
}
