package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrafilaturaExtractor.{extract, decodeEntities}

/** Hand-derived goldens for the general extractor — every expected string
  * here was written by hand from the HTML semantics BEFORE running the
  * extractor (the adversarial mini-warc corpus in AdvWarcSpec replays the
  * generator's independent goldens; this spec pins the nasty parser cases
  * one by one). */
class TrafilaturaSpec extends AnyFunSuite {

  test("baseline: reference's own unit fixture") {
    assert(extract("<html><body><article><p>Hello World!</p></article></body></html>")
      == "Hello World!")
  }

  test("quoted '>' inside attributes does not end the tag") {
    assert(extract("""<p><a href="/x?a>b" title='1>2'>link text</a> tail prose</p>""")
      == "link text tail prose")
  }

  test("script/style content is raw text, never parsed or extracted") {
    assert(extract(
      "<script>var x = '<p>decoy one</p>';</script>" +
      "<p>Real line.</p>" +
      "<style>p::before { content: \"<li>decoy two</li>\" }</style>") == "Real line.")
    // unterminated script swallows the rest of the document (browser behavior)
    assert(extract("<p>Kept early.</p><script>if (a<b) { <p>never</p>") == "Kept early.")
  }

  test("comments, CDATA, doctype, PI, bogus comments are invisible") {
    assert(extract(
      "<!DOCTYPE html><?xml version=\"1.0\"?><!-- <p>decoy</p> -->" +
      "<![CDATA[ <p>cdata decoy</p> ]]><p>Only this.</p></ x><//>") == "Only this.")
    // unclosed comment swallows the rest
    assert(extract("<p>Before.</p><!-- open comment <p>gone</p>") == "Before.")
  }

  test("stray '<' is literal text") {
    assert(extract("<p>3 < 5 and 7 > 2</p>") == "3 < 5 and 7 > 2")
  }

  test("implied closes: unclosed p and li chains") {
    assert(extract("<p>first para<p>second para<div>third block</div>")
      == "first para\nsecond para\nthird block")
    assert(extract("<ul><li>one<li>two<li>three</ul><p>after</p>")
      == "one\ntwo\nthree\nafter")
  }

  test("mis-nested close tags recover to nearest match; stray closes ignored") {
    assert(extract("<div><b>bold <i>both</b> italic?</i></div><p>next</p>")
      == "bold both italic?\nnext")
    assert(extract("</p></div><p>content survives stray closes</p></article>")
      == "content survives stray closes")
  }

  test("entities: named, decimal, hex, unknown passthrough") {
    assert(decodeEntities("a &amp; b &lt;tag&gt; &#65;&#x42; &euro;9 &unknown; &#xZZ;")
      == "a & b <tag> AB €9 &unknown; &#xZZ;")
    assert(extract("<p>Fish &amp; chips &mdash; only &pound;5</p>")
      == "Fish & chips — only £5")
    // entity-encoded markup is TEXT, not markup
    assert(extract("<p>&lt;script&gt;alert(1)&lt;/script&gt; is escaped</p>")
      == "<script>alert(1)</script> is escaped")
  }

  test("tables: cells space-joined per row, rows on their own lines") {
    assert(extract(
      "<table><thead><tr><th>Year</th><th>Crop</th></tr></thead>" +
      "<tbody><tr><td>1990</td><td>Wheat and barley</td>" +
      "<tr><td>1991<td>Oats</tr></tbody></table>")
      == "Year Crop\n1990 Wheat and barley\n1991 Oats")
  }

  test("definition lists: dt and dd each on their own line") {
    assert(extract("<dl><dt>Harbor</dt><dd>Sheltered water.</dd><dt>Pier</dt><dd>Wooden walkway.</dd></dl>")
      == "Harbor\nSheltered water.\nPier\nWooden walkway.")
  }

  test("boilerplate subtrees and hidden elements are pruned") {
    assert(extract(
      "<nav><a href='/'>Home</a><a href='/a'>About</a></nav>" +
      "<div class=\"cookie-banner\">We use cookies to improve things</div>" +
      "<div style=\"display: none\">tracking pixel text</div>" +
      "<div hidden>fully hidden</div>" +
      "<span aria-hidden=\"true\">icon glyph</span>" +
      "<p>The only visible sentence.</p>" +
      "<footer>© 2024 Example Corp</footer>") == "The only visible sentence.")
    // 'hidden' inside a URL must NOT hide the element
    assert(extract("<p><a href=\"/hidden/page\">archive link</a> and prose</p>")
      == "archive link and prose")
  }

  test("link farms die by density even without boilerplate markers") {
    val farm = "<ul>" + (1 to 8).map(i => s"<li><a href='/$i'>Category number $i</a></li>").mkString + "</ul>"
    assert(extract(farm + "<p>Genuine prose paragraph stays.</p>")
      == "Genuine prose paragraph stays.")
    // a data list with one link among prose survives
    assert(extract("<ul><li>The harvest was late this year</li>" +
      "<li>See the <a href='/r'>report</a> for the full numbers and notes</li></ul>")
      == "The harvest was late this year\nSee the report for the full numbers and notes")
  }

  test("paragraph-level density: a mostly-anchored block dies, prose with links lives") {
    assert(extract("<p><a href='/more'>Click here to continue reading the full story online</a></p>" +
      "<p>Short real line.</p>") == "Short real line.")
    val prose = "The committee published the annual accounts with a " +
      "<a href='/t'>table</a> of the figures."
    assert(extract(s"<p>$prose</p>") ==
      "The committee published the annual accounts with a table of the figures.")
  }

  test("candidate selection commits to a dominant article") {
    val art = "<article><p>" +
      "The expedition recorded the weather at every camp along the northern route. " +
      "Their notes filled three volumes by the end of the first season.</p></article>"
    // the stray p outside the article is NOT boilerplate, but the article
    // dominates (≥70% of text) so extraction commits to it — trafilatura's
    // candidate step
    assert(extract("<p>promo line</p>" + art) ==
      "The expedition recorded the weather at every camp along the northern route. " +
      "Their notes filled three volumes by the end of the first season.")
  }

  test("no dominant candidate: whole body kept") {
    val a = "<article><p>First independent section with its own words.</p></article>"
    val b = "<p>Second part outside any article, long enough to matter here.</p>"
    assert(extract(a + b) ==
      "First independent section with its own words.\n" +
      "Second part outside any article, long enough to matter here.")
  }

  test("within-document paragraph dedup: >100-char lines keep first two copies") {
    val long = "This exact announcement paragraph repeats itself over and over " +
      "inside the very same document body today." // 105 chars
    assert(long.length > 100)
    val short = "Repeat me."
    val html = (1 to 4).map(_ => s"<p>$long</p>").mkString +
      (1 to 3).map(_ => s"<p>$short</p>").mkString
    assert(extract(html) == s"$long\n$long\n$short\n$short\n$short")
  }

  test("br and hr break lines; inline markup joins") {
    assert(extract("<p>line one<br>line two<br/>line three</p><hr><p>after rule</p>")
      == "line one\nline two\nline three\nafter rule")
    assert(extract("<p>The <em>gentle</em> <b>librarian</b> sorted <span>the volumes</span>.</p>")
      == "The gentle librarian sorted the volumes.")
  }

  test("uppercase tags and whitespace-laden close tags") {
    assert(extract("<P>Upper case paragraph.</P ><UL><LI>Item one</LI\n></UL>")
      == "Upper case paragraph.\nItem one")
  }

  test("deep pathological nesting stays linear and correct") {
    val depth = 5000
    val html = "<div>" * depth + "<p>needle text</p>" + "</div>" * depth
    val t0 = System.nanoTime()
    assert(extract(html) == "needle text")
    assert((System.nanoTime() - t0) / 1e9 < 5.0)
  }

  test("empty and null-ish inputs") {
    assert(extract("") == "")
    assert(extract(null) == "")
    assert(extract("<nav>only boilerplate</nav>") == "")
    assert(extract("plain text no markup at all") == "plain text no markup at all")
  }
  test("fuzz: random markup garbage never crashes, stays fast and deterministic") {
    val rng = new scala.util.Random(0xF422)
    val pieces = Array("<", ">", "</", "/>", "<!--", "-->", "<![CDATA[", "]]>",
      "<div", "<p>", "</p>", "<a href=\"", "\"", "'", "=", "&", "&amp;", "&#",
      "<script>", "</script>", "<table>", "<tr>", "<td>", "</table>", "<P",
      "word", "text run", "的一是", "é", ";", " ", "\n", "\t", "<b><i>", "</i></b>",
      "<input type=checkbox hidden>", "class=\"nav\"", "<!DOCTYPE", "<?php")
    val t0 = System.nanoTime()
    for (i <- 1 to 500) {
      val n = 1 + rng.nextInt(200)
      val html = (1 to n).map(_ => pieces(rng.nextInt(pieces.length))).mkString
      val a = extract(html)
      val b = extract(html)
      assert(a == b, s"nondeterministic on seed-case $i")
    }
    assert((System.nanoTime() - t0) / 1e9 < 20.0, "fuzz corpus too slow")
  }

  test("fuzz: random mutations of a well-formed page never crash") {
    val rng = new scala.util.Random(0xBEEF)
    val base = "<html><head><title>t</title></head><body><nav><a href='/'>Home</a></nav>" +
      "<article><h1>Title line</h1><p>First paragraph with <b>bold</b> text.</p>" +
      "<ul><li>one</li><li>two</li></ul><table><tr><td>a</td><td>b</td></tr></table>" +
      "</article><footer>foot</footer></body></html>"
    for (_ <- 1 to 500) {
      val sb = new StringBuilder(base)
      for (_ <- 0 to rng.nextInt(6)) {
        rng.nextInt(3) match {
          case 0 => // delete a random slice
            val s = rng.nextInt(sb.length)
            sb.delete(s, math.min(sb.length, s + 1 + rng.nextInt(12)))
          case 1 => // duplicate a random slice elsewhere
            val s = rng.nextInt(sb.length)
            val e = math.min(sb.length, s + 1 + rng.nextInt(12))
            sb.insert(rng.nextInt(sb.length), sb.substring(s, e))
          case 2 => // flip a char to a metachar
            val p = rng.nextInt(sb.length)
            sb.setCharAt(p, "<>&\"'/=".charAt(rng.nextInt(7)))
        }
      }
      extract(sb.toString) // must not throw
    }
  }

  test("review-caught: data-id/grid/data-style attributes are not the real attribute") {
    assert(extract("<div data-id=\"comment-42\"><p>Real article prose kept here.</p></div>")
      == "Real article prose kept here.")
    assert(extract("<table grid=\"comments\"><tr><td>cell kept</td></tr></table>")
      == "cell kept")
    assert(extract("<div data-style=\"display:none\"><p>Still visible text.</p></div>")
      == "Still visible text.")
    // the REAL attributes still fire
    assert(extract("<div id=\"comment-42\"><p>gone</p></div><p>after</p>") == "after")
  }

  test("review-caught: unquoted attribute value ending in '/' keeps the element open") {
    // an anchor like href=http://x/cat/ must still count as an anchor, so a
    // farm of them dies by density
    val farm = "<ul>" + (1 to 8).map(i =>
      s"<li><a href=http://example.com/cat$i/>Directory of category number $i</a></li>").mkString + "</ul>"
    assert(extract(farm + "<p>Real prose paragraph stays.</p>") == "Real prose paragraph stays.")
    // XHTML-style explicit self-close still works
    assert(extract("<p>before<span/>after</p>") == "before after".replace(" ", "") ||
           extract("<p>before<span/>after</p>") == "beforeafter")
  }

  test("review-caught: </script2> does not close <script>") {
    assert(extract("<script>var s=\"</script2>\";</script><p>ok line</p>") == "ok line")
    // </titlebar> does NOT close <title>; the real </title> does
    assert(extract("<title>t</titlebar></title><p>kept</p>") == "kept")
    // and without a real close, raw-text swallows to EOF (browser behavior)
    assert(extract("<title>t</titlebar><p>gone</p>") == "")
  }

}