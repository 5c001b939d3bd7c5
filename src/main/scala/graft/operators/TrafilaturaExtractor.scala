package graft.operators

import scala.collection.mutable.ArrayBuffer

/** General HTML → text extraction for ARBITRARY web markup — the round-5
  * generalization of [[HtmlExtractor]] (which is exact for the corpus
  * generator's grammar and the committed mini.warc, but linear-scan based
  * and co-designed with those shapes).
  *
  * The reference runs trafilatura with `favor_precision=True,
  * include_comments=False, deduplicate=True`
  * (extractors/trafilatura.py:47-55). No JVM trafilatura exists, so this
  * ports the *decision core* of that algorithm (public, documented at
  * trafilatura.readthedocs.io) rather than wrapping it:
  *
  *   1. a real tokenizer: quoted attributes (a '>' inside quotes does not
  *      end the tag), raw-text elements (script/style/textarea/template —
  *      their content is never parsed as markup), comments incl. unclosed,
  *      CDATA, doctype/PI bogus comments, stray '<' as text;
  *   2. a tree with HTML5-style implied end tags (p closed by block
  *      elements, li by li, td/th/tr by their siblings, dt/dd, option),
  *      nearest-match recovery for mis-nested close tags, stray close
  *      tags ignored;
  *   3. boilerplate pruning: structural tags (nav/header/footer/aside/
  *      form/figure/iframe/...), hidden elements (style display:none,
  *      `hidden`/aria-hidden attributes), class/id discard keywords —
  *      trafilatura's OVERALL_DISCARD_XPATH idea;
  *   4. link-density deletion (favor_precision): lists/tables/quotes
  *      dropped when anchor text > 1/2 of their text, paragraph-level
  *      blocks when > 2/3 — link farms die even without boilerplate
  *      markers;
  *   5. main-candidate selection: if one article/main/content-marked
  *      block holds ≥ 70% of the surviving text, extraction commits to
  *      it (trafilatura's BODY_XPATH candidate step);
  *   6. serialization: one line per block element, table cells joined by
  *      a single space within their row, dt/dd each on their own line,
  *      whitespace collapsed, entities (named set + numeric dec/hex)
  *      decoded in text nodes only;
  *   7. `deduplicate=True` analogue: within-document paragraph dedup —
  *      lines longer than 100 chars keep their first two occurrences and
  *      drop the rest (trafilatura's MIN_DUPLCHECK_SIZE/MAX_REPETITIONS
  *      semantics, scoped to the document).
  *
  * Disclosed divergences from real trafilatura (kept deliberately —
  * see the adversarial-oracle divergence table in FIXTURES.md):
  *   - dedup cache is per-document, not cross-document: trafilatura's
  *     process-global LRU makes output depend on worker doc order, which
  *     a deterministic distributed engine must not;
  *   - no min_extracted_size floor here: emptiness/too-short policy
  *     belongs to the filter stage (ExtractStage drops empty);
  *   - <pre> content is whitespace-collapsed like other blocks;
  *   - candidate selection keeps the whole body when no single candidate
  *     dominates, instead of trafilatura's precision fallback cascade;
  *   - comments (include_comments=False) are never extracted, matching
  *     the reference's configuration rather than trafilatura's default.
  */
object TrafilaturaExtractor {

  // ------------------------------------------------------------- tree model

  private[graft] sealed trait N
  private[graft] final case class Txt(s: String) extends N
  private[graft] final class Elem(val name: String, val attrs: String) extends N {
    val kids = new ArrayBuffer[N]()
  }

  // ------------------------------------------------------------- tag tables

  /** Content never parsed as markup (HTML5 raw-text / escapable raw-text
    * elements); all are also non-content, so their text is discarded. */
  private val RawText = Set("script", "style", "textarea", "template", "title")

  private val VoidTags = Set("br", "img", "hr", "meta", "link", "input",
    "source", "wbr", "area", "base", "col", "embed", "track", "param")

  /** Subtrees dropped whole — structural boilerplate plus non-text media. */
  private val DropElems = Set("script", "style", "noscript", "template",
    "textarea", "title", "head", "nav", "header", "footer", "aside", "form",
    "figure", "iframe", "svg", "button", "select", "label", "object",
    "applet", "audio", "video", "canvas", "map", "datalist", "dialog",
    "menu", "address")

  /** Block-level elements: opening one implies closing an open <p>. */
  private val PClosers = Set("p", "div", "ul", "ol", "dl", "li", "h1", "h2",
    "h3", "h4", "h5", "h6", "blockquote", "table", "pre", "section",
    "article", "aside", "header", "footer", "nav", "form", "figure", "main",
    "hr", "fieldset", "details", "summary")

  /** Elements that start a new output line when opened or closed. */
  private val BlockTags = PClosers ++ Set("tr", "caption", "dt", "dd",
    "thead", "tbody", "tfoot", "body", "html")

  /** Cells joined by a single space within their row. */
  private val CellTags = Set("td", "th")

  /** Class/id substrings whose element is boilerplate (trafilatura's
    * discard-keyword idea; substring match, lowercase). */
  private val DiscardAttr = Array("menu", "sidebar", "side-bar", "comment",
    "share", "social", "banner", "cookie", "widget", "breadcrumb", "footer",
    "nav", "related", "pagination", "pager", "advert", "promo", "popup",
    "modal", "newsletter", "subscribe", "signup", "login", "rating",
    "skip-", "disclaimer", "consent", "masthead", "byline", "meta-",
    "tags", "jumplink")

  /** Class/id substrings marking a main-content candidate. */
  private val ContentAttr = Array("article", "content", "main", "post",
    "entry", "story", "body-text", "page-text")

  // (?<![\w-]) guard: attribute names merely ENDING in id/class/style
  // (data-id, grid, data-style) must not match as the real attribute —
  // <div data-id="comment-42"> would otherwise be discarded (review-caught)
  private val AttrValPattern = java.util.regex.Pattern.compile(
    "(?<![\\w-])(class|id|style|aria-hidden)\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  // --------------------------------------------------------------- entities

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "ndash" -> "\u2013", "mdash" -> "\u2014",
    "hellip" -> "\u2026", "lsquo" -> "\u2018", "rsquo" -> "\u2019",
    "ldquo" -> "\u201c", "rdquo" -> "\u201d", "laquo" -> "\u00ab",
    "raquo" -> "\u00bb", "copy" -> "\u00a9", "reg" -> "\u00ae",
    "trade" -> "\u2122", "deg" -> "\u00b0", "middot" -> "\u00b7",
    "bull" -> "\u2022", "times" -> "\u00d7", "divide" -> "\u00f7",
    "plusmn" -> "\u00b1", "frac12" -> "\u00bd", "eacute" -> "\u00e9",
    "egrave" -> "\u00e8", "agrave" -> "\u00e0", "ccedil" -> "\u00e7",
    "uuml" -> "\u00fc", "ouml" -> "\u00f6", "auml" -> "\u00e4",
    "szlig" -> "\u00df", "ntilde" -> "\u00f1", "euro" -> "\u20ac",
    "pound" -> "\u00a3", "cent" -> "\u00a2", "yen" -> "\u00a5",
    "sect" -> "\u00a7", "para" -> "\u00b6", "dagger" -> "\u2020",
    "prime" -> "\u2032", "Prime" -> "\u2033", "minus" -> "\u2212",
    "shy" -> "",
    // bidi / joiner controls \u2014 ubiquitous in RTL (Arabic, Hebrew, Persian)
    // markup; all four are standard HTML5 named references
    "zwnj" -> "\u200c", "zwj" -> "\u200d",
    "lrm" -> "\u200e", "rlm" -> "\u200f")

  /** Numeric reference → decoded string, or null when the code point must
    * not be emitted: NUL and lone surrogates (U+D800-DFFF) pass
    * isValidCodePoint but would put a zero byte / an unpaired surrogate
    * into extracted text — a lone surrogate silently becomes '?' in every
    * downstream UTF-8 encode (parquet, hashing), breaking byte-level
    * determinism. The HTML5 spec maps both to U+FFFD + parse error; our
    * documented convention for un-emittable references is the same as for
    * out-of-range ones — the reference stays literal. */
  private def decodeCp(cp: Int): String =
    if (cp == 0 || (cp >= 0xD800 && cp <= 0xDFFF) || !Character.isValidCodePoint(cp)) null
    else new String(Character.toChars(cp))

  /** Decode numeric (dec/hex) and the common named entities; unknown
    * entities pass through verbatim (browsers render them literally). */
  private[graft] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val rep: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try decodeCp(Integer.parseInt(body.substring(2), 16))
              catch { case _: NumberFormatException => null }
            } else if (body.startsWith("#")) {
              try decodeCp(Integer.parseInt(body.substring(1)))
              catch { case _: NumberFormatException => null }
            } else NamedEntities.getOrElse(body, null)
          if (rep != null) { out.append(rep); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  // ----------------------------------------------------------------- parser

  /** '>' position ending the tag that starts at `lt` ('<'), honoring quoted
    * attribute values; -1 when the tag never closes (rest of doc dropped,
    * like browsers' eof-in-tag handling). */
  private def tagEnd(html: String, lt: Int): Int = {
    var i = lt + 1
    val n = html.length
    var quote: Char = 0
    while (i < n) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  private def tagName(inner: String): String = {
    val s = if (inner.startsWith("/")) inner.substring(1) else inner
    val b = new StringBuilder
    var i = 0
    while (i < s.length && (s.charAt(i).isLetterOrDigit)) { b.append(s.charAt(i)); i += 1 }
    b.toString.toLowerCase
  }

  /** True when opening `incoming` implies closing the currently-open
    * `top` (HTML5 "generate implied end tags" subset). */
  private def impliedClose(top: String, incoming: String): Boolean = top match {
    case "p" => PClosers.contains(incoming)
    case "li" => incoming == "li"
    case "dt" | "dd" => incoming == "dt" || incoming == "dd"
    case "tr" => incoming == "tr"
    case "td" | "th" => incoming == "td" || incoming == "th" || incoming == "tr"
    case "option" => incoming == "option"
    case _ => false
  }

  /** Parse to a tree under a synthetic root; comments/CDATA/doctype/PI and
    * raw-text element content never reach the tree. Periodically checks
    * Thread.interrupted so the ExtractStage timeout sandbox can cancel. */
  private[graft] def parse(html: String): Elem = {
    val root = new Elem("", "")
    val stack = new ArrayBuffer[Elem]()
    stack += root
    var i = 0
    val n = html.length
    var sinceCheck = 0

    def appendText(s: String): Unit =
      if (s.nonEmpty) stack.last.kids += Txt(decodeEntities(s))

    while (i < n) {
      sinceCheck += 1
      if (sinceCheck >= 2048) {
        sinceCheck = 0
        if (Thread.interrupted()) throw new InterruptedException("extract cancelled")
      }
      val lt = html.indexOf('<', i)
      if (lt < 0) { appendText(html.substring(i)); i = n }
      else {
        if (lt > i) appendText(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (html.regionMatches(true, lt, "<![CDATA[", 0, 9)) {
          val end = html.indexOf("]]>", lt + 9)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          // doctype / processing instruction / bogus comment
          val end = html.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/' &&
                   (lt + 2 >= n || !html.charAt(lt + 2).isLetter)) {
          // "</ p>", "</>" etc: HTML5 bogus comment — skip to '>'
          val end = html.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n &&
                   (html.charAt(lt + 1).isLetter || (html.charAt(lt + 1) == '/' &&
                    lt + 2 < n && html.charAt(lt + 2).isLetter))) {
          val end = tagEnd(html, lt)
          if (end < 0) { i = n }
          else {
            val inner = html.substring(lt + 1, end).trim
            val closing = inner.startsWith("/")
            val name = tagName(inner)
            // '/' self-closes only when it ends the bare name (<div/>) or
            // follows whitespace/quote (<span class="x" />, <span a="b"/>);
            // an unquoted attribute value ending in '/' (href=http://x/y/)
            // keeps the element open — review-caught: treating it as
            // childless let link farms escape the density rule
            val selfClosing = inner.endsWith("/") && {
              val before = if (inner.length >= 2) inner.charAt(inner.length - 2) else ' '
              inner.equalsIgnoreCase(name + "/") ||
                Character.isWhitespace(before) || before == '"' || before == '\''
            }
            i = end + 1
            if (closing) {
              val at = stack.lastIndexWhere(_.name == name)
              if (at > 0) stack.remove(at, stack.length - at) // never pop root
            } else {
              while (stack.length > 1 && impliedClose(stack.last.name, name))
                stack.remove(stack.length - 1)
              if (RawText.contains(name)) {
                // raw content: ends only at the matching close tag
                var j = i
                var found = -1
                while (found < 0 && j < n) {
                  j = html.indexOf('<', j)
                  if (j < 0) { found = n }
                  else if (j + 2 + name.length <= n && html.charAt(j + 1) == '/' &&
                           html.regionMatches(true, j + 2, name, 0, name.length) && {
                             val after = j + 2 + name.length
                             after >= n || html.charAt(after) == '>' ||
                               html.charAt(after) == '/' ||
                               Character.isWhitespace(html.charAt(after))
                           }) {
                    found = j
                  } else j += 1
                }
                val closeGt = if (found >= n || found < 0) n
                              else { val g = html.indexOf('>', found); if (g < 0) n else g + 1 }
                i = closeGt // content discarded: all RawText elems are non-content
              } else if (!VoidTags.contains(name) && !selfClosing) {
                val e = new Elem(name, inner)
                stack.last.kids += e
                // depth cap (browsers/libxml2 bound their open-element
                // stacks too): beyond it, elements flatten into the
                // deepest kept ancestor, keeping downstream tree walks'
                // recursion bounded on adversarially-nested input
                if (stack.length < 512) stack += e
              } else {
                val e = new Elem(name, inner)
                stack.last.kids += e // void/self-closing: childless node (br/hr matter)
              }
            }
          }
        } else {
          appendText("<") // stray '<' is text
          i = lt + 1
        }
      }
    }
    root
  }

  // ---------------------------------------------------------------- pruning

  private def attrValues(attrs: String): Iterator[(String, String)] = {
    if (attrs.indexOf('=') < 0) return Iterator.empty
    val m = AttrValPattern.matcher(attrs)
    new Iterator[(String, String)] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): (String, String) = {
        val k = m.group(1).toLowerCase
        val v = (if (m.group(2) != null) m.group(2)
                 else if (m.group(3) != null) m.group(3)
                 else m.group(4)).toLowerCase
        has = m.find()
        (k, v)
      }
    }
  }

  private val BareHidden = java.util.regex.Pattern.compile(
    "(?i)(^|\\s)hidden(\\s|=|$)")
  private val QuotedVal = java.util.regex.Pattern.compile("\"[^\"]*\"|'[^']*'")

  private def isHiddenAttr(attrs: String): Boolean = {
    // strip quoted values first so a URL like href="/hidden/page" can't
    // trigger the bare-attribute check
    val unquoted = QuotedVal.matcher(attrs).replaceAll("")
    if (BareHidden.matcher(unquoted).find()) return true
    attrValues(attrs).exists {
      case ("style", v) =>
        v.replace(" ", "").contains("display:none") ||
          v.replace(" ", "").contains("visibility:hidden")
      case ("aria-hidden", v) => v == "true"
      case _ => false
    }
  }

  private def isDiscardAttr(attrs: String): Boolean =
    attrValues(attrs).exists {
      case ("class" | "id", v) => DiscardAttr.exists(v.contains)
      case _ => false
    }

  private def isContentAttr(attrs: String): Boolean =
    attrValues(attrs).exists {
      case ("class" | "id", v) => ContentAttr.exists(v.contains)
      case _ => false
    }

  private def shouldDrop(e: Elem): Boolean =
    DropElems.contains(e.name) || isHiddenAttr(e.attrs) || isDiscardAttr(e.attrs)

  // ------------------------------------------------------------ link density

  /** Per-extraction memo of (total text chars, anchor text chars) per
    * element — computed once bottom-up so the density/candidate passes stay
    * O(n) even on adversarially deep nesting. */
  private type LenMemo = java.util.IdentityHashMap[Elem, (Int, Int)]

  /** (total text chars, anchor text chars) under `e`, whitespace-normalized
    * lengths; `inAnchor` marks being inside an <a> subtree. */
  private def textAndAnchorLen(node: N, inAnchor: Boolean, memo: LenMemo): (Int, Int) =
    node match {
      case Txt(s) =>
        val len = s.trim.replaceAll("\\s+", " ").length
        (len, if (inAnchor) len else 0)
      case e: Elem =>
        val cached = if (inAnchor) null else memo.get(e)
        if (cached != null) cached
        else if (shouldDrop(e)) { if (!inAnchor) memo.put(e, (0, 0)); (0, 0) }
        else {
          var t = 0; var a = 0
          val in = inAnchor || e.name == "a"
          e.kids.foreach { k =>
            val (kt, ka) = textAndAnchorLen(k, in, memo)
            t += kt; a += ka
          }
          if (!inAnchor) memo.put(e, (t, a))
          (t, a)
        }
    }

  private val DensityLists = Set("ul", "ol", "dl", "table")
  private val DensityBlocks = Set("p", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "div", "section")

  /** favor_precision thresholds: lists/tables die above 1/2 anchor share,
    * paragraph-level blocks above 2/3. Tiny blocks (<15 chars) are judged
    * only when fully anchored, so a lone short link row still dies but a
    * short legit line with one link survives. */
  private def densityDrop(e: Elem, memo: LenMemo): Boolean = {
    val isList = DensityLists.contains(e.name)
    val isBlock = DensityBlocks.contains(e.name)
    if (!isList && !isBlock) return false
    val (t, a) = textAndAnchorLen(e, inAnchor = false, memo)
    if (t == 0) false
    else if (t < 15) a == t
    else {
      val d = a.toDouble / t
      if (isList) d > 0.5 else d > 2.0 / 3.0
    }
  }

  // ------------------------------------------------------- candidate select

  /** Text chars under `e` that would actually serialize: shouldDrop AND
    * density-dropped subtrees excluded — candidate shares must be measured
    * on surviving text, or a link farm outside the article (invisible in
    * the output) could deflate the article's share. */
  private def survivingLen(node: N, memo: LenMemo,
      sMemo: java.util.IdentityHashMap[Elem, Integer]): Int = node match {
    case Txt(s) => s.trim.replaceAll("\\s+", " ").length
    case e: Elem =>
      val cached = sMemo.get(e)
      if (cached != null) cached.intValue()
      else {
        val v = if (shouldDrop(e) || densityDrop(e, memo)) 0
                else e.kids.foldLeft(0)((acc, k) => acc + survivingLen(k, memo, sMemo))
        sMemo.put(e, Integer.valueOf(v))
        v
      }
  }

  /** The single best article/main/content-marked element, if it holds
    * ≥ 70% of the body's surviving text. */
  private def selectCandidate(root: Elem, memo: LenMemo): Option[Elem] = {
    val sMemo = new java.util.IdentityHashMap[Elem, Integer]()
    val total = survivingLen(root, memo, sMemo)
    if (total == 0) return None
    var best: Elem = null
    var bestLen = 0
    def walk(e: Elem): Unit = {
      if (shouldDrop(e)) return
      val isCand = e.name == "article" || e.name == "main" ||
        ((e.name == "div" || e.name == "section") && isContentAttr(e.attrs))
      if (isCand) {
        val t = survivingLen(e, memo, sMemo)
        if (t > bestLen) { bestLen = t; best = e }
      }
      e.kids.foreach { case k: Elem => walk(k); case _ => }
    }
    walk(root)
    if (best != null && bestLen.toDouble / total >= 0.70) Some(best) else None
  }

  // ------------------------------------------------------------- serializer

  private def serialize(scope: Elem, memo: LenMemo): ArrayBuffer[String] = {
    val lines = new ArrayBuffer[String]()
    val current = new StringBuilder

    def flush(): Unit = {
      val line = current.toString.trim.replaceAll("\\s+", " ")
      if (line.nonEmpty) lines += line
      current.clear()
    }

    def walk(node: N): Unit = node match {
      case Txt(s) => current.append(s)
      case e: Elem =>
        if (shouldDrop(e) || densityDrop(e, memo)) ()
        else if (e.name == "br" || e.name == "hr") flush()
        else {
          val block = BlockTags.contains(e.name)
          if (block) flush()
          else if (CellTags.contains(e.name)) current.append(' ')
          e.kids.foreach(walk)
          if (block) flush()
        }
    }
    walk(scope)
    flush()
    lines
  }

  // ------------------------------------------------------- paragraph dedup

  /** deduplicate=True analogue, per document: lines > 100 chars keep their
    * first two occurrences (MIN_DUPLCHECK_SIZE=100, MAX_REPETITIONS=2). */
  private def dedupLines(lines: ArrayBuffer[String]): ArrayBuffer[String] = {
    val seen = new java.util.HashMap[String, Int]()
    val out = new ArrayBuffer[String](lines.length)
    lines.foreach { l =>
      if (l.length <= 100) out += l
      else {
        val c = seen.getOrDefault(l, 0)
        if (c < 2) { out += l; seen.put(l, c + 1) }
      }
    }
    out
  }

  // ------------------------------------------------------------------ entry

  /** Extract readable text; "" when nothing qualifies. */
  def extract(html: String): String = {
    if (html == null || html.isEmpty) return ""
    val root = parse(html)
    val memo: LenMemo = new java.util.IdentityHashMap[Elem, (Int, Int)]()
    val scope = selectCandidate(root, memo).getOrElse(root)
    dedupLines(serialize(scope, memo)).mkString("\n")
  }
}
