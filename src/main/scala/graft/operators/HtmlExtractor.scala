package graft.operators

import scala.collection.mutable.ArrayBuffer

/** HTML → text extraction.
  *
  * The reference uses trafilatura (extractors/trafilatura.py:4-55) with
  * favor_precision=True; no JVM trafilatura exists, so per SURVEY.md §7.3
  * we implement exact extraction for structured HTML (content inside
  * <article>/<p>/<h1-6>/<li>/<blockquote>, tables with cells joined by a
  * space and a line per row, nested lists with a line per item; boilerplate
  * <nav>/<header>/<footer>/<script>/<style>/<aside>/<form>/<figure>/<iframe>
  * subtrees, comments, and — the favor_precision analogue — any element
  * whose class/id contains a boilerplate keyword (menu, sidebar, share,
  * social, banner, cookie, …) are dropped whole), and document a
  * golden-table join as the escape hatch for arbitrary WARC data. Mirrors
  * the reference's own unit fixture (tests/pipeline/test_extractors.py:9:
  * "<html><body><article><p>Hello World!</p></article></body></html>"
  *  → "Hello World!").
  */
object HtmlExtractor {

  private val BlockDrop = Set("nav", "header", "footer", "script", "style",
    "aside", "head", "form", "figure", "iframe", "svg", "button", "noscript")
  private val LineBreakTags = Set("p", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "br", "div", "article", "section", "tr", "title", "blockquote",
    "ul", "ol", "table", "thead", "tbody", "tfoot", "caption",
    // preformatted blocks and definition lists break lines like trafilatura
    "pre", "dl")
  // table cells and definition terms/descriptions: inline within their
  // row/entry, separated by a single space
  private val CellTags = Set("td", "th", "dt", "dd")
  // void elements never get a matching close tag — they must not enter the
  // drop stack
  private val VoidTags = Set("br", "img", "hr", "meta", "link", "input",
    "source", "wbr", "area", "base", "col", "embed", "track", "param")
  // favor_precision analogue: boilerplate class/id keywords whose whole
  // subtree is pruned (trafilatura's OVERALL_DISCARD_XPATH keyword idea)
  private val BoilerplateAttr = Array("menu", "sidebar", "comment", "share",
    "social", "banner", "cookie", "widget", "breadcrumb", "footer", "nav")
  private val AttrPattern = java.util.regex.Pattern.compile(
    "(?:class|id)\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  private def hasBoilerplateAttr(inner: String): Boolean = {
    if (inner.indexOf('=') < 0) return false
    val m = AttrPattern.matcher(inner)
    while (m.find()) {
      val v = (if (m.group(2) != null) m.group(2)
               else if (m.group(3) != null) m.group(3)
               else m.group(4)).toLowerCase
      var k = 0
      while (k < BoilerplateAttr.length) {
        if (v.contains(BoilerplateAttr(k))) return true
        k += 1
      }
    }
    false
  }

  /** The ONE tokenizer + drop-stack walk both public entry points build
    * on (review-caught: extract/pruneMarkup used to carry two copies of
    * this logic, which had to stay byte-for-byte in sync for the
    * link-density numerator/denominator guarantee). Feeds the handler only
    * content OUTSIDE dropped subtrees: kept tags as (name, rawStart,
    * rawEndExclusive), kept text char-by-char. Periodically checks
    * Thread.interrupted so the ExtractStage timeout sandbox can cancel. */
  private def walkKept(html: String)(
      onTag: (String, Int, Int) => Unit, onChar: Char => Unit): Unit = {
    var i = 0
    val n = html.length
    // stack of open tag names inside a dropped subtree (nonEmpty = dropping);
    // a name stack rather than a depth counter so class/id-based drops on
    // generic tags (e.g. <div class="social">) close correctly
    val dropStack = new ArrayBuffer[String]()
    var sinceCheck = 0
    while (i < n) {
      sinceCheck += 1
      if (sinceCheck >= 4096) {
        sinceCheck = 0
        if (Thread.interrupted())
          throw new InterruptedException("extract cancelled")
      }
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i)
          if (end < 0) { i = n }
          else {
            val inner = html.substring(i + 1, end).trim
            val closing = inner.startsWith("/")
            val selfClosing = inner.endsWith("/")
            val name = inner.stripPrefix("/").takeWhile(ch => ch.isLetterOrDigit).toLowerCase
            if (dropStack.nonEmpty) {
              if (closing) {
                // Real-world HTML leaves elements unclosed (<li>Home<li>About),
                // so a close tag pops up to and including the NEAREST matching
                // open tag — popping only on an exact top match would wedge
                // the stack open and silently discard the rest of the page.
                // A close with no match anywhere is stray markup: ignored.
                val at = dropStack.lastIndexOf(name)
                if (at >= 0) dropStack.remove(at, dropStack.length - at)
              } else if (!selfClosing && !VoidTags.contains(name) && name.nonEmpty) {
                dropStack += name
              }
            } else if (!closing && !selfClosing && !VoidTags.contains(name) &&
                       (BlockDrop.contains(name) || hasBoilerplateAttr(inner))) {
              dropStack += name
            } else {
              onTag(name, i, end + 1)
            }
            i = end + 1
          }
        }
      } else {
        if (dropStack.isEmpty) onChar(c)
        i += 1
      }
    }
  }

  /** Extract readable text; returns "" when nothing qualifies (the
    * reference's extractor drops such docs). */
  def extract(html: String): String = {
    val out = new ArrayBuffer[String]()
    val current = new StringBuilder
    def flushLine(): Unit = {
      val line = current.toString.trim.replaceAll("\\s+", " ")
      if (line.nonEmpty) out += line
      current.clear()
    }
    walkKept(html)(
      (name, _, _) =>
        if (LineBreakTags.contains(name)) flushLine()
        else if (CellTags.contains(name)) current.append(' '),
      c => current.append(c))
    flushLine()
    out.mkString("\n")
  }

  /** The markup with dropped subtrees (BlockDrop tags, boilerplate class/id,
    * comments) removed and everything else — tags included — preserved
    * verbatim. Lets link-density scans count only anchors that survive the
    * same pruning `extract` applies, so an anchor buried inside a dropped
    * <nav>/<aside> never inflates the numerator while the denominator uses
    * extracted (pruned) length. Same tokenizer rules as `extract`. */
  def pruneMarkup(html: String): String = {
    val out = new StringBuilder(html.length)
    walkKept(html)(
      // NB: scala StringBuilder has no (CharSequence,int,int) append —
      // a 3-arg call silently auto-tuples. Slice explicitly.
      (_, start, end) => out.append(html.substring(start, end)),
      c => out.append(c))
    out.toString
  }

  /** Entity-decode the minimal set common in web text. */
  def decodeEntities(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
}

/** Readability-style alternative extractor (extractors/modular.py:6-51 —
  * readability-lxml summary → inscriptis text): pick the top-level block
  * with the highest link-density-penalized text volume (readability's core
  * scoring: candidates lose score proportional to the fraction of their
  * text living inside <a> anchors — menus/link farms score near zero even
  * when long), then squeeze excessive newlines like the reference's
  * `\n{2,}` cleanup. */
object ReadabilityLite {
  // candidate containers, specific-first; body intentionally absent — the
  // whole-page fallback covers it (readability also excludes the root)
  private val BlockTags = Seq("article", "main", "section", "div")

  /** Index of the next anchor-open "<a"/"<A" at or after `from` whose name
    * ends right after the 'a' (so not <article>, <aside>, <abbr>, …).
    * Case-insensitive like HtmlExtractor's tag handling. -1 when none. */
  private def nextAnchorOpen(inner: String, from: Int): Int = {
    var i = math.max(0, from)
    val n = inner.length
    while (i >= 0 && i < n) {
      i = inner.indexOf('<', i)
      if (i < 0) return -1
      if (i + 2 < n) {
        val a = inner.charAt(i + 1)
        val c = inner.charAt(i + 2)
        if ((a == 'a' || a == 'A') &&
            (c == '>' || c == '/' || Character.isWhitespace(c))) return i
      }
      i += 1
    }
    -1
  }

  /** Index of the next "</a>" (any case, optional whitespace before '>',
    * mirroring nextAnchorOpen's name-boundary tolerance — legacy markup
    * writes "</a >" / "</A\n>") at or after `from`; -1 when none. */
  private def nextAnchorClose(inner: String, from: Int): Int = {
    var i = math.max(0, from)
    val n = inner.length
    while (i >= 0 && i + 3 < n) {
      i = inner.indexOf('<', i)
      if (i < 0 || i + 3 >= n) return -1
      val a = inner.charAt(i + 2)
      if (inner.charAt(i + 1) == '/' && (a == 'a' || a == 'A')) {
        var j = i + 3
        while (j < n && Character.isWhitespace(inner.charAt(j))) j += 1
        if (j < n && inner.charAt(j) == '>') return i
      }
      i += 1
    }
    -1
  }

  /** Extractable text chars inside <a>…</a> anchors. An anchor whose close
    * tag is missing (or appears only after the NEXT anchor opens — the
    * implicit-close pattern HtmlExtractor tolerates elsewhere) contributes
    * only its immediate text run, never the block prose that follows. */
  private[graft] def anchorChars(inner: String): Int = {
    var linkChars = 0
    var open = nextAnchorOpen(inner, 0)
    while (open >= 0) {
      var next = open
      val gt = inner.indexOf('>', open)
      if (gt >= 0) {
        val close = nextAnchorClose(inner, gt)
        val nextOpen = nextAnchorOpen(inner, gt)
        if (close >= 0 && (nextOpen < 0 || close < nextOpen)) {
          linkChars += HtmlExtractor.extract(inner.substring(gt + 1, close)).length
          next = close + 3 // resume after this anchor — no double counting
        } else {
          // unclosed: count only the text run up to the next tag
          val lt = inner.indexOf('<', gt + 1)
          val end = if (lt < 0) inner.length else lt
          linkChars += HtmlExtractor.extract(inner.substring(gt + 1, end)).length
          next = gt
        }
      }
      open = nextAnchorOpen(inner, next + 1)
    }
    linkChars
  }

  /** min(1, anchorChars/total) with a caller-supplied (already computed)
    * extraction length — the ONE density formula both entry points share. */
  private def densityOf(anchor: Int, total: Int): Double =
    if (total == 0) 0.0 else math.min(1.0, anchor.toDouble / total)

  /** Fraction of extractable text chars inside <a>…</a> anchors. Anchors are
    * counted on the pruned view (dropped subtrees removed) so the numerator
    * and the extraction-length denominator describe the same text. */
  private[graft] def linkDensity(inner: String): Double = {
    val pruned = HtmlExtractor.pruneMarkup(inner)
    densityOf(anchorChars(pruned), HtmlExtractor.extract(inner).length)
  }

  def extract(html: String): String = {
    // find the best-scoring block among candidates; fall back to full
    // extraction when none qualifies
    var best = ""
    var bestScore = -1.0
    for (tag <- BlockTags) {
      var from = 0
      var open = html.indexOf(s"<$tag", from)
      while (open >= 0) {
        val start = html.indexOf('>', open)
        val end = html.indexOf(s"</$tag>", open)
        if (start >= 0 && end > start) {
          val inner = html.substring(start + 1, end)
          val text = HtmlExtractor.extract(inner)
          // readability scoring: volume × (1 − link density); anchors counted
          // on the pruned view so boilerplate-subtree anchors (which extract()
          // drops from the denominator) can't zero a mostly-prose block
          val score = text.length *
            (1.0 - densityOf(anchorChars(HtmlExtractor.pruneMarkup(inner)), text.length))
          if (score > bestScore) { bestScore = score; best = text }
        }
        from = open + 1
        open = html.indexOf(s"<$tag", from)
      }
    }
    val result = if (bestScore > 0) best else HtmlExtractor.extract(html)
    result.replaceAll("\n{3,}", "\n\n")
  }
}
