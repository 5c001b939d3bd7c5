#!/usr/bin/env python3
"""Generate src/main/resources/graft/mini.warc — a committed 9-page WARC
for the warc_extract_filter end-to-end driver query (WARC parse → HTML
extract → Gopher quality/repetition). Pages are self-authored; each HTML
body is constructed so HtmlExtractor.extract(html) equals the page's
expected text exactly (tables → one line per row with cells joined by a
space; nested lists → one line per item; boilerplate nav/social/form
subtrees pruned). Expected filter outcomes were replayed through the
reference's own gopher filters during construction (see SparkEntry's
warc_extract_filter oracle).
"""
import os

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "../src/main/resources/graft/mini.warc")

BOILER_TOP = ('<nav>home | about</nav>'
              '<div class="social share">like | tweet | pin</div>'
              '<form action="/search"><input name="q"/>search</form>')
BOILER_BOTTOM = '<aside>related links</aside><footer>copyright</footer>'


def page(body):
    return ('<html><head><title>mini</title></head><body>'
            + BOILER_TOP + body + BOILER_BOTTOM + '</body></html>')


CLEAN_LINES = [
    "The quiet harbor watched the morning boats with a steady patience.",
    "Some of the sailors have crossed the narrow bridge to reach the market and the bakery.",
    "It would be pleasant to describe the golden valley while the river carried the wooden boats past the village.",
    "People enjoyed the festival and the bright music that came with the peaceful evening near the ancient castle.",
]

TABLE_PARA1 = "The farmers gathered the apples and the pears with care during the foggy autumn morning."
TABLE_PARA2 = "That village kept the records because the winters seemed long and the summers were short and busy."

DUP_LINE = "The same announcement about the harbor schedule appears again and again here."

HASH_TEXT = ("The town crier posted the notes with the marks that follow and everyone "
             "of the readers came to see them today. " +
             " ".join("# # the %s %s %s" % t for t in zip(
                 ["quiet", "bright", "ancient", "narrow", "pleasant", "careful", "distant", "gentle"],
                 ["market", "garden", "river", "mountain", "library", "station", "teacher", "window"],
                 ["watched", "crossed", "visited", "painted", "carried", "opened", "repaired", "planted"])))

PAGES = [
    ("https://mini.example.org/clean",
     page("<article>" + "".join("<p>%s</p>" % l for l in CLEAN_LINES) + "</article>")),
    ("https://mini.example.org/short",
     page("<blockquote><p>Too short to pass.</p></blockquote>")),
    ("https://mini.example.org/table",
     page("<table><tbody>"
          "<tr><td>Year</td><td>Result of the harvest</td></tr>"
          "<tr><th>Total</th><th>42 baskets of grain</th></tr>"
          "</tbody></table>"
          "<p>%s</p>" % TABLE_PARA1 +
          "<ul><li>first note about the storage</li>"
          "<ul><li>second note about the cellar</li></ul></ul>"
          "<p>%s</p>" % TABLE_PARA2)),
    ("https://mini.example.org/boilerplate",
     page("")),
    ("https://mini.example.org/dup",
     page("<article>" + ("<p>%s</p>" % DUP_LINE) * 5 + "</article>")),
    ("https://mini.example.org/hashes",
     page("<article><p>%s</p></article>" % HASH_TEXT)),
    # round-4 extractor shapes: <pre>, definition list (dt/dd space-join)
    ("https://mini.example.org/pre-dl",
     page("<pre>The printed timetable kept the exact departure of every ferry.</pre>"
          "<dl><dt>Harbor</dt><dd>means the sheltered water where the boats rested "
          "between the long journeys of the season.</dd></dl>"
          "<p>Several of the captains trusted the old charts and the careful notes "
          "that the keeper updated with patience during the winter months and the "
          "travelers thanked them for the safe crossings of the year.</p>")),
    # inline markup + comment/noscript/figure noise that must not leak
    ("https://mini.example.org/inline",
     page("<!-- hidden words that must never appear in the extraction -->"
          "<noscript>enable scripts to continue reading this page</noscript>"
          "<article><p>The <em>gentle</em> librarian sorted the <a href=\"/s\">returned "
          "volumes</a> before the morning readers arrived at the quiet hall.</p>"
          "<p>Most of the students borrowed the atlas and the dictionaries while the "
          "rain kept the courtyard empty for the whole afternoon and the lamps "
          "glowed over the long tables until the evening bell rang.</p></article>"
          "<figure><img src=\"x.png\"/><figcaption>a caption to drop</figcaption></figure>")),
    # heading + section with <br>-separated lines
    ("https://mini.example.org/sections",
     page("<h1>The annual report of the mountain weather station</h1>"
          "<section><p>The observers measured the snowfall and the wind with the "
          "same instruments that their teachers once calibrated.<br/>Every one of "
          "the readings traveled down the valley by wire before the storms cut "
          "the lines in late autumn.<br/>The villagers still collected the pages of "
          "the bulletin and posted them beside the door of the council hall.</p>"
          "</section>")),
]


def record(tpe, uri, body, rec_id):
    b = body.encode("utf-8")
    return (("WARC/1.0\r\nWARC-Type: %s\r\nWARC-Target-URI: %s\r\n"
             "WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:graft:%s>\r\n"
             "Content-Length: %d\r\n\r\n") % (tpe, uri, rec_id, len(b))).encode("utf-8") \
        + b + b"\r\n\r\n"


def main():
    out = record("warcinfo", "meta", "software: graft-mini-warc-gen", "info")
    for i, (url, html) in enumerate(PAGES):
        http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html
        out += record("request", url, "GET / HTTP/1.1", "req%d" % i)
        out += record("response", url, http, "resp%d" % i)
    with open(OUT, "wb") as f:
        f.write(out)
    print("wrote %s (%d bytes, %d pages)" % (OUT, len(out), len(PAGES)))


if __name__ == "__main__":
    main()
