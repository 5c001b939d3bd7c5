# -*- coding: utf-8 -*-
"""Extraction goldens over THIRD-PARTY-AUTHORED structures (VERDICT r6
"Next round" #5).

The wild corpus (gen_wild_warc.py) is hand-transcribed but its page
CLASSES were still invented by the same builder who wrote the extractor —
a shared blind spot would not be caught. This batch removes that degree of
freedom: every page's parser-stressing STRUCTURE is transcribed from a
published conformance suite the builder did not author —

  * html5lib-tests tree-construction inputs (github.com/html5lib/
    html5lib-tests, tests/tree-construction/*.dat): unclosed <p>/<li>,
    the <a><p></a> adoption-agency case, text around table internals
    (foster parenting), <b><i></b></i> misnesting, <select><option>,
    raw-text <script>/<textarea>/<template>, eof-in-comment,
    bogus comments / PIs, named+numeric entity decoding, MathML/SVG
    foreign content, </br>, heading-in-heading, orphan <td>,
    <plaintext>, <frameset>+<noframes>, obsolete <isindex>/<marquee>/
    <applet>, CDATA-in-HTML, '>' inside quoted attributes, stray '<',
    eof-in-tag, table section/colgroup structure;
  * W3C i18n test-suite structures (www.w3.org/International/tests):
    RTL document with an LTR island + <bdo> + &rlm;, ruby annotation
    markup (ruby-rb-rt pattern).

Only the filler PROSE inside the structures is ours (the .dat inputs use
single letters). Goldens are DERIVED BY HAND from the documented
extraction semantics (TrafilaturaExtractor scaladoc: tree with implied end
tags + nearest-match close recovery, raw-text elements, drop/hidden/
discard-attr pruning, link-density deletion, >=70%% candidate commit, one
line per block element, cells joined by a space, entities decoded in text
nodes only, whitespace collapse) — NOT by running the extractor. Where our
documented semantics diverge from what a spec HTML5 parser builds (no
foster parenting, </br> ignored, <plaintext> parsed as markup), the golden
encodes OUR semantics and the divergence is listed in FIXTURES.md §18.

Writes src/main/resources/graft/conformance.warc + conformance_golden.tsv
and prints the DuckDB VALUES rows for the warc_extract_conformance oracle.
"""
import hashlib
import os

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "..", "src", "main", "resources", "graft")
WARC_OUT = os.path.join(RES, "conformance.warc")
GOLD_OUT = os.path.join(RES, "conformance_golden.tsv")


# (name, cited structure source, html, hand-derived golden lines)
PAGES = [
    # -------------------------------------------------- tree construction
    ("unclosed-p", "html5lib-tests tests1.dat '<p>One<p>Two'",
     """<html><head><title>t</title></head><body>
<p>The first paragraph never closes
<p>The second paragraph follows it
</body></html>""", [
        "The first paragraph never closes",
        "The second paragraph follows it",
    ]),

    # The adoption-agency case: our parser nests the <p> inside the <a>
    # and the nearest-match </a> pops both; the stray </p> is ignored.
    ("adoption-a-p", "html5lib-tests tests1.dat '<a>1<p>2</a>3</p>'",
     """<html><body><p>Intro line</p>
<a href="/x">link start<p>inside paragraph</a> after anchor</p>
<p>closing line</p></body></html>""", [
        "Intro line",
        "link start",
        "inside paragraph",
        "after anchor",
        "closing line",
    ]),

    # Text around table internals. A spec parser FOSTER-PARENTS the
    # stray text before the table; ours keeps document order (disclosed
    # divergence, FIXTURES.md §18) — the golden encodes our semantics.
    ("foster-table", "html5lib-tests tests1.dat 'A<table>B<tr>C</tr>D</table>'",
     """<html><body>
<p>Table test page</p>
Before table<table><tr><td>Cell one<td>Cell two</tr>After row</table>Tail text
</body></html>""", [
        "Table test page",
        "Before table",
        "Cell one Cell two",
        "After row",
        "Tail text",
    ]),

    ("unclosed-li", "html5lib-tests tests1.dat '<li>...<li>...' sibling closes",
     """<html><body><h1>Shopping list</h1>
<ul><li>Apples and pears<li>Whole grain bread<li>Olive oil</ul>
<p>Three items total.</p></body></html>""", [
        "Shopping list",
        "Apples and pears",
        "Whole grain bread",
        "Olive oil",
        "Three items total.",
    ]),

    # <select> subtrees are boilerplate (DropElems) — the option text is
    # form chrome, never content.
    ("select-option", "html5lib-tests tests1.dat '<select><option>'",
     """<html><body><h1>Shipping form fragment</h1>
<p>Choose a region before checkout.</p>
<select><option>Northern region<option>Southern region</select>
<p>Delivery takes two days.</p></body></html>""", [
        "Shipping form fragment",
        "Choose a region before checkout.",
        "Delivery takes two days.",
    ]),

    # Mis-nested formatting: </b> pops to the nearest <b> (taking the
    # open <i> with it), the stray </i> is ignored; text stays one line.
    ("formatting-misnest", "html5lib-tests adoption01.dat '<b><i></b></i>'",
     """<html><body><p>Start <b>bold then <i>both styles</b> italic leftover</i> plain end</p></body></html>""", [
        "Start bold then both styles italic leftover plain end",
    ]),

    # Raw-text <script>: markup inside never reaches the tree.
    ("script-rawtext", "html5lib-tests tests16.dat script raw-text states",
     """<html><head><script>document.write("<p>Ghost paragraph</p>");</script></head>
<body><p>Visible paragraph only.</p>
<script>
var markup = "<div>also invisible</div>";
</script>
<p>Second visible paragraph.</p></body></html>""", [
        "Visible paragraph only.",
        "Second visible paragraph.",
    ]),

    # eof-in-comment: an unclosed comment consumes the rest of the doc.
    ("unclosed-comment", "html5lib-tests comments/eof-in-comment cases",
     """<html><body><p>Content before the comment stays.</p>
<!-- this comment never closes: everything after is consumed
<p>This paragraph is inside the unclosed comment.</p>
</body></html>""", [
        "Content before the comment stays.",
    ]),

    # Bogus comments: <!...> and <?...> skip to the next '>'.
    ("bogus-comment-pi", "html5lib-tests tests/bogus-comment + doctype cases",
     """<!DOCTYPE html><?php echo "server side"; ?>
<html><body><!DOCTYPE again>
<p>After a processing instruction <? inline pi ?> the text continues.</p>
</body></html>""", [
        "After a processing instruction the text continues.",
    ]),

    # Entity decoding: known named + numeric dec/hex decode; unknown
    # named, missing-semicolon, and case-mismatched stay literal.
    ("entities", "html5lib-tests entities01.dat/entities02.dat",
     """<html><body>
<p>Known: 5 &lt; 7 &amp;&amp; &quot;quoted&quot; &mdash; dash &copy; 2024</p>
<p>Numeric: &#65;&#66;&#67; and hex &#x2013; plus a symbol &#x263A;</p>
<p>Unknown named: &notin; stays &fakeent; literal</p>
<p>No semicolon: AT&T and R&D stay</p>
<p>Uppercase: &AMP; is not decoded</p>
</body></html>""", [
        "Known: 5 < 7 && \u201cquoted\u201d-PLACEHOLDER",  # replaced below
    ]),

    # MathML flows inline (unknown elements are transparent).
    ("math-inline", "html5lib-tests tests9.dat MathML content",
     """<html><body><p>The identity <math><mi>a</mi><mo>+</mo><mn>1</mn></math> holds for every integer.</p></body></html>""", [
        "The identity a+1 holds for every integer.",
    ]),

    # SVG subtrees are dropped whole (non-text media).
    ("svg-dropped", "html5lib-tests tests9.dat SVG content",
     """<html><body><p>Before the graphic.</p>
<svg viewBox="0 0 10 10"><title>circle title</title><text>svg label text</text></svg>
<p>After the graphic.</p></body></html>""", [
        "Before the graphic.",
        "After the graphic.",
    ]),

    # </br>: a spec parser converts it to <br> (line break); ours ignores
    # an end tag with no open element (disclosed divergence) — one line.
    ("end-tag-br", "html5lib-tests webkit01.dat '</br>'",
     """<html><body><p>First half</br> second half joins here</p></body></html>""", [
        "First half second half joins here",
    ]),

    # Heading inside heading: h1 is not implied-closed by h2; both still
    # serialize as their own lines.
    ("nested-heading", "html5lib-tests tests1.dat heading nesting",
     """<html><body><h1>Heading level one<h2>Heading level two</h2>
<p>Body copy under the headings.</p></body></html>""", [
        "Heading level one",
        "Heading level two",
        "Body copy under the headings.",
    ]),

    # Orphan <td> outside any table: cell-join semantics still apply.
    ("orphan-td", "html5lib-tests tests7.dat cell outside table",
     """<html><body><p>Orphan cells:</p>
<td>first stray cell<td>second stray cell
<p>Back to paragraphs.</p></body></html>""", [
        "Orphan cells:",
        "first stray cell second stray cell",
        "Back to paragraphs.",
    ]),

    # <plaintext>: a spec parser treats everything after as raw text;
    # ours parses it as markup (disclosed divergence) — the <b> element
    # is transparent and the text flows.
    ("plaintext", "html5lib-tests tests1.dat '<plaintext>'",
     """<html><body><p>Before plaintext.</p>
<plaintext>All <b>markup</b> after plaintext is literal in browsers.
</body></html>""", [
        "Before plaintext.",
        "All markup after plaintext is literal in browsers.",
    ]),

    # Raw-text <textarea> is form chrome: content never parsed, never kept.
    ("textarea-raw", "html5lib-tests tests16.dat textarea raw-text",
     """<html><body><p>Form remnant with a prefilled box.</p>
<textarea><p>typed draft text</p></textarea>
<p>The draft never leaks into extraction.</p></body></html>""", [
        "Form remnant with a prefilled box.",
        "The draft never leaks into extraction.",
    ]),

    # '>' inside a quoted attribute value does not end the tag.
    ("quoted-gt-attr", "html5lib-tests tokenizer domjs-unsafe/attr states",
     """<html><body><p title="a > b">Comparison attribute does not end the tag.</p>
<p data-expr='x > y'>Single-quoted too.</p></body></html>""", [
        "Comparison attribute does not end the tag.",
        "Single-quoted too.",
    ]),

    # Stray '<' before a non-letter is literal text.
    ("stray-lt", "html5lib-tests tokenizer '<' before non-letter",
     """<html><body><p>If 3 < 5 and 5 <= 7 then the parser keeps both signs.</p></body></html>""", [
        "If 3 < 5 and 5 <= 7 then the parser keeps both signs.",
    ]),

    # eof-in-tag: an unclosed tag at EOF drops the rest of the document.
    ("eof-in-tag", "html5lib-tests tokenizer eof-in-tag states",
     """<html><body><p>Only this line survives the truncated markup.</p><span class="never-closes""", [
        "Only this line survives the truncated markup.",
    ]),

    # <frameset> page: the frames are transparent unknowns; the
    # <noframes> fallback body is the only extractable content (what a
    # text-mode user agent renders).
    ("frameset-noframes", "html5lib-tests tests6.dat frameset cases",
     """<html><head><title>Frames</title></head>
<frameset cols="50%,50%"><frame src="a.html"><frame src="b.html">
<noframes><p>Your browser does not support frames.</p></noframes>
</frameset></html>""", [
        "Your browser does not support frames.",
    ]),

    # Obsolete elements: <isindex>/<marquee> are transparent unknowns,
    # <applet> is dropped media.
    ("obsolete-elements", "html5lib-tests tests2.dat isindex / webkit01.dat marquee",
     """<html><body><p>Obsolete gallery:</p>
<isindex prompt="search me">
<marquee>Scrolling banner text survives as plain content.</marquee>
<applet code="Old.class">Applet fallback body is dropped.</applet>
<p>End of gallery.</p></body></html>""", [
        "Obsolete gallery:",
        "Scrolling banner text survives as plain content.",
        "End of gallery.",
    ]),

    # CDATA in HTML content: skipped like a bogus comment.
    ("cdata-in-html", "html5lib-tests tests ' <![CDATA[ ]]> ' in HTML",
     """<html><body><p>Before cdata.<![CDATA[ hidden payload ]]>After cdata.</p></body></html>""", [
        "Before cdata.After cdata.",
    ]),

    # Table sections + colgroup: caption/thead/tbody line structure,
    # cells joined by spaces, <col> void.
    ("table-sections", "html5lib-tests webkit01.dat table section structure",
     """<html><body><h1>Quarterly table</h1>
<table><caption>Results by quarter</caption>
<colgroup><col span="2"><col></colgroup>
<thead><tr><th>Quarter<th>Revenue<th>Change
<tbody><tr><td>Q1<td>1200<td>+4%
<tr><td>Q2<td>1350<td>+12%
</table></body></html>""", [
        "Quarterly table",
        "Results by quarter",
        "Quarter Revenue Change",
        "Q1 1200 +4%",
        "Q2 1350 +12%",
    ]),

    # Raw-text <template>: inert content never parsed (ours treats it as
    # raw text AND non-content — spec parsers build an inert fragment;
    # either way nothing extracts).
    ("template-inert", "html5lib-tests template.dat",
     """<html><body><p>Live content line.</p>
<template><p>Template clone content never renders.</p></template>
<p>Second live line.</p></body></html>""", [
        "Live content line.",
        "Second live line.",
    ]),

    # ----------------------------------------------------- W3C i18n suite
    # RTL document with an LTR island, <bdo>, and an &rlm; mark (the
    # structure of the W3C i18n bidi test pages).
    ("i18n-bidi-rtl", "W3C i18n test suite bidi test page structure",
     """<html dir="rtl"><body>
<h1>اختبار الاتجاه</h1>
<p>النص العربي مع <span dir="ltr">LTR ISLAND</span> داخل الفقرة.</p>
<p><bdo dir="ltr">محفوظ بالترتيب</bdo> &rlm;بعد العلامة</p>
</body></html>""", [
        "اختبار الاتجاه",
        "النص العربي مع LTR ISLAND داخل الفقرة.",
        "محفوظ بالترتيب \u200fبعد العلامة",
    ]),

    # Ruby annotation markup (W3C i18n ruby-rb-rt test structure): ruby
    # machinery elements are transparent, base and annotation text flow.
    ("i18n-ruby", "W3C i18n test suite ruby-rb-rt test structure",
     """<html lang="ja"><body>
<p>振り仮名: <ruby>漢<rt>かん</rt>字<rt>じ</rt></ruby>を抽出する。</p>
<p><ruby><rb>東京</rb><rp>(</rp><rt>とうきょう</rt><rp>)</rp></ruby>行きの列車。</p>
</body></html>""", [
        "振り仮名: 漢かん字じを抽出する。",
        "東京(とうきょう)行きの列車。",
    ]),

    # ------------------------------------------------------------ batch 2
    # <div> implies </p>; a <p> inside an open <div> nests (no implied
    # close for div), each block its own line.
    ("div-closes-p", "html5lib-tests tree-construction p/div implied-end cases",
     """<html><body><p>Alpha paragraph text<div>Beta block text<p>Gamma paragraph text</div></body></html>""", [
        "Alpha paragraph text",
        "Beta block text",
        "Gamma paragraph text",
    ]),

    # <blockquote> implies </p>; trailing text after </blockquote> sits at
    # body level and forms its own line at the final flush.
    ("blockquote-closes-p", "html5lib-tests tree-construction blockquote implied-end cases",
     """<html><body><p>He opened with a claim<blockquote>The quoted passage stands alone.</blockquote>and closed without a new paragraph.</body></html>""", [
        "He opened with a claim",
        "The quoted passage stands alone.",
        "and closed without a new paragraph.",
    ]),

    # <button> and <menu> are interactive chrome (DropElems): their text —
    # including <li> items inside <menu> — never extracts.
    ("button-menu-chrome", "html5lib-tests tree-construction button scope / menu cases",
     """<html><body><h1>Interactive chrome page</h1>
<p>The verbs below are controls, not content.</p>
<button type="submit">Submit the form now</button>
<menu><li>Cut selection</li><li>Paste buffer</li></menu>
<p>Only prose survives.</p></body></html>""", [
        "Interactive chrome page",
        "The verbs below are controls, not content.",
        "Only prose survives.",
    ]),

    # <iframe>: a spec parser treats the content as raw text (never part of
    # the tree); ours parses it as markup but drops the whole subtree
    # (DropElems) — the EXTRACTION result is identical, so no divergence row.
    ("iframe-markup", "html5lib-tests tests16.dat iframe raw-text states",
     """<html><body><p>Embedded frame below.</p>
<iframe src="/ad.html"><p>Iframe fallback markup never extracts.</p></iframe>
<p>Main flow continues.</p></body></html>""", [
        "Embedded frame below.",
        "Main flow continues.",
    ]),

    # <xmp>: spec raw text (literal <b> tags would show); ours parses it as
    # markup under a transparent unknown element (disclosed divergence,
    # FIXTURES.md §18) — the inline tags vanish and the text floats as one
    # body-level line.
    ("xmp-transparent", "html5lib-tests webkit01.dat xmp raw-text case",
     """<html><body><p>Before the sample.</p>
<xmp>Inline <b>code sample</b> text</xmp>
<p>After the sample.</p></body></html>""", [
        "Before the sample.",
        "Inline code sample text",
        "After the sample.",
    ]),

    # dt/dd implied end tags: each sibling implies closing the open one;
    # dt and dd are block tags, one line each.
    ("dt-dd-implied", "html5lib-tests tree-construction dt/dd implied-end-tag cases",
     """<html><body><h1>Glossary</h1>
<dl><dt>First term<dd>Meaning of the first term<dt>Second term<dd>Meaning of the second term</dl>
</body></html>""", [
        "Glossary",
        "First term",
        "Meaning of the first term",
        "Second term",
        "Meaning of the second term",
    ]),

    # Entity edge cases: &shy; deletes, &nbsp; maps to a plain space,
    # out-of-range numerics (> U+10FFFF) stay literal, names longer than
    # the 10-char reference budget stay literal, known math names decode.
    ("entity-edges", "html5lib-tests entities02.dat numeric/edge cases",
     """<html><body>
<p>Soft hyphen: co&shy;operate rejoins</p>
<p>Nbsp is a plain space: a&nbsp;b</p>
<p>Invalid numerics &#x110000; and &#99999999; stay literal</p>
<p>Overlong name &averylongname; stays</p>
<p>Math: 3&times;4&divide;2 gives 6&plusmn;0</p>
</body></html>""", [
        "Soft hyphen: cooperate rejoins",
        "Nbsp is a plain space: a b",
        "Invalid numerics &#x110000; and &#99999999; stay literal",
        "Overlong name &averylongname; stays",
        "Math: 3×4÷2 gives 6±0",
    ]),

    # <tfoot> written before <thead>/<tbody>: the DOM keeps source order
    # (rendering reorders, extraction follows the DOM — same in lxml).
    ("tfoot-source-order", "html5lib-tests tree-construction table-section cases",
     """<html><body><h1>Annual totals</h1>
<table><tfoot><tr><td>Total<td>4550</tfoot>
<thead><tr><th>Item<th>Amount</thead>
<tbody><tr><td>Widgets<td>4550</tbody></table></body></html>""", [
        "Annual totals",
        "Total 4550",
        "Item Amount",
        "Widgets 4550",
    ]),

    # <a> inside <a>: spec's adoption agency closes the outer anchor first,
    # ours nests and nearest-match closes — the text order and the
    # extracted line are identical either way; the plain continuation
    # keeps the paragraph's anchor density below the 2/3 threshold.
    ("nested-anchor", "html5lib-tests adoption01.dat '<a>1<a>2'",
     """<html><body><p><a href="/one">first anchor <a href="/two">second anchor</a></a> then a long plain continuation that keeps the paragraph density safely below the threshold.</p></body></html>""", [
        "first anchor second anchor then a long plain continuation that keeps the paragraph density safely below the threshold.",
    ]),

    # Non-whitespace text inside <head>: a spec parser re-parents it to
    # <body> (it renders); ours drops it with the head subtree (disclosed
    # divergence, FIXTURES.md §18).
    ("head-stray-text", "html5lib-tests tree-construction text-in-head cases",
     """<html><head><title>Stray</title>Loose head text is spec-reparented to body.</head><body><p>Only the body paragraph extracts.</p></body></html>""", [
        "Only the body paragraph extracts.",
    ]),

    # Duplicate attribute: the spec tokenizer keeps the FIRST class and
    # drops the duplicate, so a spec-based extractor keeps this div; our
    # attribute scan checks every class/id occurrence and sees the discard
    # keyword in the duplicate (disclosed divergence, FIXTURES.md §18).
    ("duplicate-class-attr", "html5lib-tests tokenizer duplicate-attribute cases",
     """<html><body><p>First paragraph stays.</p>
<div class="story" class="comment-list">A spec parser keeps this line because the first class attribute wins.</div>
<p>Last paragraph stays.</p></body></html>""", [
        "First paragraph stays.",
        "Last paragraph stays.",
    ]),

    # MathML <semantics>/<annotation>: browsers render only the first
    # child and hide the annotation; our unknown elements are transparent,
    # so the TeX annotation text flows too (disclosed divergence,
    # FIXTURES.md §18).
    ("math-annotation", "html5lib-tests tests9.dat MathML semantics/annotation",
     """<html><body><p>The successor <math><semantics><mrow><mi>n</mi><mo>+</mo><mn>1</mn></mrow><annotation encoding="application/x-tex">n+1</annotation></semantics></math> of n.</p></body></html>""", [
        "The successor n+1n+1 of n.",
    ]),

    # SVG <foreignObject> holding HTML: a spec parser switches back to the
    # HTML insertion mode inside it (the paragraph renders); ours drops
    # the whole <svg> subtree as non-text media (disclosed divergence,
    # FIXTURES.md §18).
    ("svg-foreignobject", "html5lib-tests tests9/tests10.dat svg foreignObject",
     """<html><body><p>Vector intro.</p>
<svg width="100" height="50"><foreignObject x="0" y="0"><p>HTML inside the SVG canvas.</p></foreignObject></svg>
<p>Vector outro.</p></body></html>""", [
        "Vector intro.",
        "Vector outro.",
    ]),

    # Self-closing slash on a non-void HTML element: the spec ignores the
    # slash (<div/> stays open), ours honors it (no element pushed) — the
    # floating text forms its own body-level line either way, so the
    # extracted lines are identical and no divergence row is needed.
    ("self-closing-div", "html5lib-tests tokenizer self-closing-flag cases",
     """<html><body><p>Header line.</p><div/>Floating text after a self-closed div.<p>Footer line.</p></body></html>""", [
        "Header line.",
        "Floating text after a self-closed div.",
        "Footer line.",
    ]),

    # NUL and lone-surrogate numeric references: the spec emits U+FFFD +
    # parse error; ours keeps the reference literal (same convention as
    # out-of-range numerics) so no zero byte or unpaired surrogate can
    # reach extracted text (disclosed divergence, FIXTURES.md §18).
    ("entity-nul-surrogate", "html5lib-tests entities02.dat / tokenizer NUL + surrogate refs",
     """<html><body><p>Nul ref &#0; stays literal</p>
<p>Surrogate refs &#xD800; and &#xDFFF; stay literal</p>
<p>Boundary neighbours &#xD7FF; and &#xE000; decode fine</p></body></html>""", [
        "Nul ref &#0; stays literal",
        "Surrogate refs &#xD800; and &#xDFFF; stay literal",
        "Boundary neighbours \ud7ff and \ue000 decode fine",
    ]),
]

# The entities page's golden, spelled out with explicit escapes (the
# placeholder above keeps the PAGES literal readable).
PAGES[[p[0] for p in PAGES].index("entities")] = (
    "entities", "html5lib-tests entities01.dat/entities02.dat",
    PAGES[[p[0] for p in PAGES].index("entities")][2], [
        'Known: 5 < 7 && "quoted" \u2014 dash \u00a9 2024',
        "Numeric: ABC and hex \u2013 plus a symbol \u263a",
        "Unknown named: &notin; stays &fakeent; literal",
        "No semicolon: AT&T and R&D stay",
        "Uppercase: &AMP; is not decoded",
    ])


def record(tpe, uri, body, rec_id):
    b = body.encode("utf-8") if isinstance(body, str) else body
    return (("WARC/1.0\r\nWARC-Type: %s\r\nWARC-Target-URI: %s\r\n"
             "WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:graft:%s>\r\n"
             "Content-Length: %d\r\n\r\n") % (tpe, uri, rec_id, len(b))).encode("utf-8") \
        + b + b"\r\n\r\n"


def main():
    out = record("warcinfo", "meta", "software: graft-conformance-transcriber", "info")
    gold_tsv = []
    oracle_rows = []
    for i, (name, cite, html, gold) in enumerate(PAGES):
        url = "https://conformance.example.org/%s" % name
        http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
                ).encode("ascii") + html.encode("utf-8")
        out += record("response", url, http, "conf%d" % i)
        text = "\n".join(gold)
        for ch in text:
            assert ord(ch) < 0x10000, "astral char would break n_chars parity"
        esc = text.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t")
        gold_tsv.append("%s\t%s" % (url, esc))
        md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
        n_lines = 0 if text == "" else len(gold)
        oracle_rows.append("  ('%s', %d, %d, '%s')" % (url, n_lines, len(text), md5))

    with open(WARC_OUT, "wb") as f:
        f.write(out)
    with open(GOLD_OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(gold_tsv) + "\n")
    print("wrote %s (%d bytes, %d pages) + %s" %
          (WARC_OUT, len(out), len(PAGES), GOLD_OUT))
    print("-- oracle VALUES rows --")
    print(",\n".join(oracle_rows))


if __name__ == "__main__":
    main()
