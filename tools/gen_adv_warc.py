#!/usr/bin/env python3
"""Generate src/main/resources/graft/adv.warc + adv_golden.tsv — a 61-page
ADVERSARIAL WARC for the warc_extract_general driver query, grading the
general TrafilaturaExtractor on markup it was NOT co-designed with.

Anti-co-design discipline:
  * The golden for each page is computed HERE, in Python, from the planted
    content blocks ONLY, via an independent (and much simpler) rendering of
    the public serialization rules (paragraph/heading/quote -> one line;
    list -> line per item; table -> row per line with cells space-joined;
    dl -> dt and dd each on their own line; whitespace collapsed; entities
    decoded; >100-char lines keep first two copies).
  * The NOISE wrapped around the planted blocks is drawn from a combinator
    grammar (boilerplate subtrees, hidden elements, link farms, raw-text
    decoys, comments/CDATA/PI, stray close tags, malformed nesting,
    quoted-'>' attributes, uppercase/whitespace tag spellings) that the
    golden logic never sees: the extractor must make ALL of it invisible.
  * 11 pages are hand-authored with hand-derived goldens (no generator).

Outputs (committed):
  src/main/resources/graft/adv.warc        - the corpus
  src/main/resources/graft/adv_golden.tsv  - url \\t escaped-golden (for the
                                             byte-equality ScalaTest)
  stdout                                   - the DuckDB VALUES oracle rows
                                             (url, n_lines, n_chars, md5)
"""
import hashlib
import os
import random

HERE = os.path.dirname(os.path.abspath(__file__))
WARC_OUT = os.path.join(HERE, "../src/main/resources/graft/adv.warc")
GOLD_OUT = os.path.join(HERE, "../src/main/resources/graft/adv_golden.tsv")

rng = random.Random(0x5EED5)

# --------------------------------------------------------------- vocabulary

NOUNS = ["harbor", "village", "council", "library", "orchard", "festival",
         "bridge", "market", "castle", "valley", "river", "station",
         "observatory", "archive", "workshop", "lighthouse", "granary",
         "courtyard", "bakery", "printing press"]
VERBS = ["recorded", "measured", "repaired", "described", "collected",
         "painted", "surveyed", "catalogued", "restored", "documented"]
ADJS = ["quiet", "ancient", "narrow", "careful", "distant", "gentle",
        "patient", "weathered", "steady", "bright"]
TAILS = ["during the long autumn weeks", "before the winter storms arrived",
         "while the lamps burned in the evening", "under the supervision of the keeper",
         "for the benefit of the town records", "despite the shortage of paper",
         "according to the oldest charter", "with the help of three apprentices"]


def sentence():
    return "The %s %s %s the %s %s." % (
        rng.choice(ADJS), rng.choice(NOUNS), rng.choice(VERBS),
        rng.choice(ADJS), rng.choice(NOUNS)) if rng.random() < 0.3 else \
        "The %s %s %s the %s %s %s." % (
        rng.choice(ADJS), rng.choice(NOUNS), rng.choice(VERBS),
        rng.choice(ADJS), rng.choice(NOUNS), rng.choice(TAILS))


def paragraph_text(n_min=2, n_max=4):
    return " ".join(sentence() for _ in range(rng.randint(n_min, n_max)))

# ------------------------------------------------- entity-encoding (golden-safe)

# (encoded-in-html, decoded-in-golden) pairs the renderer may inject
ENTITY_PAIRS = [("&amp;", "&"), ("&mdash;", "\u2014"), ("&pound;", "\u00a3"),
                ("&eacute;", "\u00e9"), ("&#65;", "A"), ("&#x42;", "B"),
                ("&hellip;", "\u2026"), ("&laquo;", "\u00ab"), ("&raquo;", "\u00bb")]


def maybe_entities(text):
    """Return (html_form, golden_form): sprinkle 0-2 entity tokens into the
    text; the golden gets the decoded characters."""
    html, gold = text, text
    for _ in range(rng.randint(0, 2)):
        enc, dec = rng.choice(ENTITY_PAIRS)
        words_h = html.split(" ")
        k = rng.randrange(len(words_h))
        words_h[k] = words_h[k] + " " + enc
        html = " ".join(words_h)
        words_g = gold.split(" ")
        words_g[k] = words_g[k] + " " + dec
        gold = " ".join(words_g)
    return html, gold


def maybe_inline_markup(html_text):
    """Wrap random words in golden-invisible inline markup (b/i/em/span,
    sometimes mis-nested or uppercase, anchors with quoted '>')."""
    words = html_text.split(" ")
    for _ in range(rng.randint(0, 3)):
        k = rng.randrange(len(words))
        w = words[k]
        if "&" in w or "<" in w:
            continue
        style = rng.randrange(6)
        if style == 0:
            words[k] = "<b>%s</b>" % w
        elif style == 1:
            words[k] = "<EM>%s</EM >" % w
        elif style == 2:
            words[k] = '<span class="plain">%s</span>' % w
        elif style == 3 and k + 1 < len(words) and "<" not in words[k + 1] and "&" not in words[k + 1]:
            # mis-nested pair: <b>w <i>w2</b> ...</i> — inline, golden-safe
            words[k] = "<b>%s <i>%s</b>" % (w, words[k + 1])
            words[k + 1] = "</i>"
            # note: "</i>" token alone collapses to nothing; spacing survives
        elif style == 4:
            words[k] = '<a href="/x?cmp=1>2&lang=en" title=\'a>b\'>%s</a>' % w
        else:
            words[k] = "<i>%s</i>" % w
    return " ".join(w for w in words if w)

# ------------------------------------------------------------ planted blocks
# each returns (html, [golden lines])


def block_paragraph():
    t = paragraph_text()
    h, g = maybe_entities(t)
    h = maybe_inline_markup(h)
    tag_open, tag_close = rng.choice([
        ("<p>", "</p>"), ("<P>", "</P>"), ("<p>", ""),  # unclosed: implied close
        ("<p class='intro-text'>", "</p >"),
        # review-caught traps: attribute names merely ENDING in id/style
        # are NOT the real attribute — these wrappers must stay visible
        ("<div data-id=\"comment-%d\"><p>" % rng.randrange(99), "</p></div>"),
        ("<div data-style=\"display:none\"><p>", "</p></div>")])
    return tag_open + h + tag_close, [g]


def block_heading():
    lvl = rng.randint(1, 4)
    t = "Chapter notes on the %s %s" % (rng.choice(ADJS), rng.choice(NOUNS))
    return "<h%d>%s</h%d>" % (lvl, t, lvl), [t]


def block_list():
    items = ["%s %s %s" % (rng.choice(ADJS), rng.choice(NOUNS), rng.choice(TAILS))
             for _ in range(rng.randint(3, 5))]
    closed = rng.random() < 0.5
    tag = rng.choice(["ul", "ol"])
    inner = "".join("<li>%s%s" % (it, "</li>" if closed else "") for it in items)
    return "<%s>%s</%s>" % (tag, inner, tag), items


def block_table():
    rows = [["%s %s" % (rng.choice(ADJS), rng.choice(NOUNS)),
             "%s %s" % (rng.choice(VERBS), rng.choice(TAILS))]
            for _ in range(rng.randint(2, 4))]
    closed = rng.random() < 0.5
    body = ""
    for r in rows:
        cells = "".join("<td>%s%s" % (c, "</td>" if closed else "") for c in r)
        body += "<tr>%s%s" % (cells, "</tr>" if closed else "")
    sect = rng.choice(["", "<tbody>%s</tbody>"])
    inner = (sect % body) if sect else body
    return "<table>%s</table>" % inner, [" ".join(r) for r in rows]


def block_quote():
    t = paragraph_text(1, 2)
    return "<blockquote><p>%s</p></blockquote>" % t, [t]


def block_dl():
    pairs = [("%s %s" % (rng.choice(ADJS).capitalize(), rng.choice(NOUNS)),
              "means the %s that the %s %s." % (
                  rng.choice(NOUNS), rng.choice(NOUNS), rng.choice(VERBS)))
             for _ in range(rng.randint(1, 2))]
    inner = "".join("<dt>%s</dt><dd>%s</dd>" % p for p in pairs)
    gold = []
    for dt, dd in pairs:
        gold += [dt, dd]
    return "<dl>%s</dl>" % inner, gold


def block_duplicate():
    """A >100-char paragraph repeated 3-4x; golden keeps exactly two."""
    t = paragraph_text(2, 3)
    while len(t) <= 100:
        t += " " + sentence()
    reps = rng.randint(3, 4)
    return "".join("<p>%s</p>" % t for _ in range(reps)), [t, t]


def block_prose_with_link():
    """Prose with a minority link: must survive the density rule."""
    t1 = sentence()
    t2 = sentence()
    word = rng.choice(["full report", "archive entry", "council minutes"])
    html = "<p>%s See the <a href=\"/doc/%d\">%s</a> for details. %s</p>" % (
        t1, rng.randrange(99), word, t2)
    gold = "%s See the %s for details. %s" % (t1, word, t2)
    return html, [gold]


BLOCK_KINDS = [block_paragraph, block_paragraph, block_paragraph,
               block_heading, block_list, block_table, block_quote,
               block_dl, block_duplicate, block_prose_with_link]

# ------------------------------------------------------------------- noise
# every combinator returns raw html that must extract to NOTHING


def noise_boilerplate():
    tag = rng.choice(["nav", "aside", "footer", "header", "form", "figure"])
    body = " | ".join("<a href='/n%d'>%s</a>" % (i, rng.choice(NOUNS))
                      for i in range(rng.randint(2, 5)))
    return "<%s>%s</%s>" % (tag, body, tag)


def noise_discard_class():
    cls = rng.choice(["social share", "cookie-banner", "sidebar widget",
                      "newsletter-signup", "breadcrumb trail", "related-posts",
                      "pagination links", "promo box", "comment-section"])
    tag = rng.choice(["div", "section", "ul"])
    inner = "decoy %s %s" % (rng.choice(NOUNS), rng.choice(VERBS))
    if tag == "ul":
        inner = "<li>%s</li>" % inner
    return "<%s class=\"%s\">%s</%s>" % (tag, cls, inner, tag)


def noise_hidden():
    style = rng.choice(['style="display:none"', 'style="visibility: hidden"',
                        'hidden', 'aria-hidden="true"'])
    return "<div %s>invisible decoy about the %s</div>" % (style, rng.choice(NOUNS))


def noise_rawtext():
    tag = rng.choice(["script", "style", "textarea", "template"])
    decoy = "<p>raw decoy %s</p><div>%s</div>" % (rng.choice(NOUNS), rng.choice(VERBS))
    return "<%s>%s</%s>" % (tag, decoy, tag)


def noise_comment():
    return rng.choice([
        "<!-- hidden decoy <p>%s</p> -->" % rng.choice(NOUNS),
        "<![CDATA[ <li>cdata decoy %s</li> ]]>" % rng.choice(VERBS),
        "<?php echo 'server decoy'; ?>",
        "<!DOCTYPE html>"])


def noise_stray_close():
    # close tags with no matching open: must be ignored
    return rng.choice(["</table>", "</span>", "</blockquote>", "</ x>", "<//>"])


def noise_link_farm():
    # NO boilerplate class — only the density rule can kill it
    n = rng.randint(6, 10)
    items = "".join("<li><a href='/cat/%d'>%s %s directory</a></li>"
                    % (i, rng.choice(ADJS), rng.choice(NOUNS)) for i in range(n))
    return "<ul>%s</ul>" % items


def noise_anchor_para():
    # a paragraph that is ~all link: density-dropped
    return "<p><a href='/more/%d'>Continue reading the complete %s %s story online here</a></p>" % (
        rng.randrange(99), rng.choice(ADJS), rng.choice(NOUNS))


def noise_unquoted_farm():
    # unquoted hrefs ending in '/': the anchors must still count as anchors
    # (review-caught: a naive self-closing check made them childless and
    # the farm escaped the density rule)
    n = rng.randint(5, 8)
    items = "".join("<li><a href=http://adv.example.org/cat%d/>%s %s index</a></li>"
                    % (i, rng.choice(ADJS), rng.choice(NOUNS)) for i in range(n))
    return "<ul>%s</ul>" % items


def noise_rawtext_trap():
    # close-tag lookalikes inside raw text must not end the element
    return rng.choice([
        "<script>var s=\"</script2>\"; document.write('<p>%s decoy</p>');</script>" % rng.choice(NOUNS),
        "<style>/* </styles> */ p { color: red } /* <p>%s</p> */</style>" % rng.choice(VERBS),
        "<textarea>not closed by </textareas> markers %s</textarea>" % rng.choice(NOUNS)])


NOISE_KINDS = [noise_boilerplate, noise_discard_class, noise_hidden,
               noise_rawtext, noise_comment, noise_stray_close,
               noise_link_farm, noise_anchor_para, noise_unquoted_farm,
               noise_rawtext_trap]


def noise_run():
    return "".join(rng.choice(NOISE_KINDS)() for _ in range(rng.randint(1, 3)))

# ------------------------------------------------------------- page assembly


def collapse(s):
    return " ".join(s.split())


def dedup_lines(lines):
    seen = {}
    out = []
    for l in lines:
        if len(l) <= 100:
            out.append(l)
        else:
            c = seen.get(l, 0)
            if c < 2:
                out.append(l)
                seen[l] = c + 1
    return out


def gen_page(idx):
    n_blocks = rng.randint(3, 7)
    html_parts, gold_lines = [], []
    for _ in range(n_blocks):
        h, g = rng.choice(BLOCK_KINDS)()
        html_parts.append(h)
        gold_lines += [collapse(x) for x in g]

    layout = rng.choice(["body", "article"])
    if layout == "article":
        core = "<article>" + noise_run().join(html_parts) + "</article>"
        # outside the article: short plain decoys that only candidate
        # selection can drop (plus regular noise)
        planted_len = sum(len(l) for l in gold_lines)
        decoy = "<p>promo %s</p>" % rng.choice(NOUNS)
        assert planted_len >= 5 * len(decoy), (idx, planted_len)
        body = noise_run() + decoy + core + noise_run()
    else:
        parts = [noise_run()]
        for h in html_parts:
            parts.append(h)
            parts.append(noise_run())
        body = "".join(parts)

    page = "<html><head><title>adv %d</title></head><body>%s</body></html>" % (idx, body)
    return page, dedup_lines(gold_lines)

# ------------------------------------------------------- hand-authored pages

LONG_DUP = ("The council repeats this exact announcement about the ferry "
            "schedule in every single bulletin of the season again.")
assert len(LONG_DUP) > 100

HAND_PAGES_EXTRA = [
    ("hand-traps",
     "<html><body>"
     "<div data-id=\"comment-9\"><p>Wrapper with a lookalike attribute keeps this line.</p></div>"
     "<ul><li><a href=http://t.example/a/>one</a><li><a href=http://t.example/b/>two</a>"
     "<li><a href=http://t.example/c/>three</a><li><a href=http://t.example/d/>four</a></ul>"
     "<script>if(x<1){document.write(\"</script2>\")}</script>"
     "<p>Final plain sentence survives the traps.</p></body></html>",
     ["Wrapper with a lookalike attribute keeps this line.",
      "Final plain sentence survives the traps."]),
]

HAND_PAGES = [
    # 1: all boilerplate -> empty extraction
    ("hand-empty",
     "<html><body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
     "<div class='cookie-banner'>We use cookies.</div>"
     "<footer>© 2024</footer></body></html>",
     []),
    # 2: raw-text swallows fake markup; unterminated script swallows tail
    ("hand-rawtext",
     "<html><body><p>Kept before the script runs.</p>"
     "<script>document.write('<p>decoy</p>');</script>"
     "<p>Kept after the script too.</p>"
     "<script>if (a<b) { broken <p>never seen</p>",
     ["Kept before the script runs.", "Kept after the script too."]),
    # 3: entity-encoded markup is text, numeric entities decode
    ("hand-entities",
     "<html><body><p>&lt;div&gt;not markup&lt;/div&gt; costs &pound;5 &amp; more &#x2014; done</p></body></html>",
     ["<div>not markup</div> costs \u00a35 & more \u2014 done"]),
    # 4: quoted '>' attributes + misnested inline recovery
    ("hand-attrs",
     "<html><body><div data-x=\"a>b\" title='c>d'><p>The archive "
     "<b>holds <i>many</b> maps</i> of the coast.</p></div></body></html>",
     ["The archive holds many maps of the coast."]),
    # 5: implied closes chains (p, li, td)
    ("hand-implied",
     "<html><body><p>alpha paragraph<p>beta paragraph"
     "<ul><li>first entry<li>second entry</ul>"
     "<table><tr><td>cell one<td>cell two<tr><td>cell three<td>cell four</table></body></html>",
     ["alpha paragraph", "beta paragraph", "first entry", "second entry",
      "cell one cell two", "cell three cell four"]),
    # 6: dedup keeps first two of a long repeated line; short repeats all stay
    ("hand-dedup",
     "<html><body>" + "".join("<p>%s</p>" % LONG_DUP for _ in range(4)) +
     "<p>Yes.</p><p>Yes.</p><p>Yes.</p></body></html>",
     [LONG_DUP, LONG_DUP, "Yes.", "Yes.", "Yes."]),
    # 7: link farm + all-anchor paragraph die by density; prose with one link lives
    ("hand-density",
     "<html><body><ul>" +
     "".join("<li><a href='/d%d'>Directory of the %s section</a></li>" % (i, n)
             for i, n in enumerate(NOUNS[:7])) + "</ul>"
     "<p><a href='/all'>Browse every article in the complete archive today</a></p>"
     "<p>The surveyors published the <a href='/map'>map</a> with their notes.</p></body></html>",
     ["The surveyors published the map with their notes."]),
    # 8: dominant article wins; outside decoys dropped by candidate selection
    ("hand-candidate",
     "<html><body><p>teaser</p><article><p>The observatory kept the weather "
     "ledger for forty years and the keepers recorded every storm that "
     "crossed the valley floor in that time.</p></article>"
     "<p>more teaser</p></body></html>",
     ["The observatory kept the weather ledger for forty years and the "
      "keepers recorded every storm that crossed the valley floor in that time."]),
    # 9: hidden elements in all four spellings
    ("hand-hidden",
     "<html><body><div style=\"display: none\">one</div><div hidden>two</div>"
     "<span aria-hidden=\"true\">three</span>"
     "<div style='visibility:hidden'>four</div>"
     "<p>Visible line with a <a href=\"/hidden/path\">link to hidden path</a> kept.</p></body></html>",
     ["Visible line with a link to hidden path kept."]),
    # 10b inserted below as hand-traps; 10: uppercase/whitespace spellings
    ("hand-spelling",
     "<HTML><BODY></p></div><P>Upper paragraph one.</P >"
     "<UL><LI>Upper item</LI\n></UL><//></ x><p>tail line</p></BODY></HTML>",
     ["Upper paragraph one.", "Upper item", "tail line"]),
]


# ------------------------------------------------------------------ writing

def record(tpe, uri, body, rec_id):
    b = body.encode("utf-8")
    return (("WARC/1.0\r\nWARC-Type: %s\r\nWARC-Target-URI: %s\r\n"
             "WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:graft:%s>\r\n"
             "Content-Length: %d\r\n\r\n") % (tpe, uri, rec_id, len(b))).encode("utf-8") \
        + b + b"\r\n\r\n"


def main():
    pages = []  # (url, html, gold_lines)
    for i in range(50):
        html, gold = gen_page(i)
        pages.append(("https://adv.example.org/gen/%02d" % i, html, gold))
    for name, html, gold in HAND_PAGES + HAND_PAGES_EXTRA:
        pages.append(("https://adv.example.org/%s" % name, html, gold))

    out = record("warcinfo", "meta", "software: graft-adv-warc-gen", "info")
    gold_tsv = []
    oracle_rows = []
    for i, (url, html, gold) in enumerate(pages):
        http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
                + html)
        out += record("response", url, http, "resp%d" % i)
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
          (WARC_OUT, len(out), len(pages), GOLD_OUT))
    print("-- oracle VALUES rows --")
    print(",\n".join(oracle_rows))


if __name__ == "__main__":
    main()
