# -*- coding: utf-8 -*-
"""Hand-transcribed realistic page skeletons + hand-derived goldens
(VERDICT r5 "Next round" #5).

Unlike adv.warc (whose 50 noise pages come from a grammar co-evolved with
the extractor), every page here was WRITTEN BY HAND, transcribing the
structure of common real-world page classes: news article with sidebar and
comments, documentation with a TOC, forum thread, table-heavy spec sheet,
RTL Arabic news, wiki article with reference lists, marketing landing page,
legacy table layout, paywall teaser, FAQ with details/summary, and so on.

The goldens were DERIVED BY HAND from the documented extraction semantics
(TrafilaturaExtractor scaladoc: one line per block element, cells joined by
space per row, br flushes, whitespace collapse, entity decode, boilerplate /
hidden / discard-keyword pruning, favor_precision link-density deletion,
>=70% candidate commit, >100-char lines keep first two copies) — NOT by
running the extractor. Divergences found when the fixture was first run are
documented in FIXTURES.md §17.

Writes src/main/resources/graft/wild.warc + wild_golden.tsv and prints the
DuckDB VALUES rows for the warc_extract_wild oracle.
"""
import hashlib
import os

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "..", "src", "main", "resources", "graft")
WARC_OUT = os.path.join(RES, "wild.warc")
GOLD_OUT = os.path.join(RES, "wild_golden.tsv")


# (name, html, golden_lines) — golden_lines hand-derived, see module doc.
PAGES = [
    ("news-sidebar", """<!DOCTYPE html>
<html><head><title>Storm closes harbor</title>
<meta charset="utf-8"><style>p{margin:0}</style></head>
<body>
<div class="masthead"><img src="logo.png"><ul class="nav"><li><a href="/">Home</a></li><li><a href="/news">News</a></li></ul></div>
<div id="wrapper">
<article>
<h1>Storm closes the northern harbor for two days</h1>
<p class="byline">By A. Reporter, Tuesday</p>
<p>The northern harbor closed on Tuesday after a winter storm pushed waves over the outer pier, the port authority said.</p>
<p>Ferry crossings to the island were cancelled through Thursday morning, and cargo traffic was rerouted to the southern terminal.</p>
<p>Officials said the pier lighting would be repaired before the weekend, weather permitting.</p>
</article>
<div id="sidebar"><h3>Most read</h3><ul><li><a href="/a">Bridge reopens</a></li><li><a href="/b">Rail strike ends</a></li></ul></div>
<div class="comments"><h3>Comments</h3><div class="comment"><p>Glad the ferry is back soon!</p></div></div>
</div>
<div class="footer"><p>&copy; 2024 Example News</p></div>
</body></html>""", [
        "Storm closes the northern harbor for two days",
        "The northern harbor closed on Tuesday after a winter storm pushed waves over the outer pier, the port authority said.",
        "Ferry crossings to the island were cancelled through Thursday morning, and cargo traffic was rerouted to the southern terminal.",
        "Officials said the pier lighting would be repaired before the weekend, weather permitting.",
    ]),

    ("docs-toc", """<html><head><title>API Guide</title></head><body>
<nav class="toc"><ul><li><a href="#intro">Introduction</a></li><li><a href="#auth">Authentication</a></li></ul></nav>
<main>
<h1>Connector API guide</h1>
<p>This guide explains how to configure the connector and submit your first batch of records.</p>
<h2 id="intro">Introduction</h2>
<p>The connector accepts newline-delimited records over HTTP and writes them to the store in ordered batches.</p>
<pre>POST /v1/records
Content-Type: application/x-ndjson</pre>
<h2 id="auth">Authentication</h2>
<p>Every request must carry a signed token in the Authorization header.</p>
<ul><li>Tokens expire after one hour.</li><li>Clock skew above five minutes is rejected.</li></ul>
</main>
<footer><p>Docs built nightly.</p></footer>
</body></html>""", [
        "Connector API guide",
        "This guide explains how to configure the connector and submit your first batch of records.",
        "Introduction",
        "The connector accepts newline-delimited records over HTTP and writes them to the store in ordered batches.",
        "POST /v1/records Content-Type: application/x-ndjson",
        "Authentication",
        "Every request must carry a signed token in the Authorization header.",
        "Tokens expire after one hour.",
        "Clock skew above five minutes is rejected.",
    ]),

    ("forum-thread", """<html><body>
<div class="breadcrumb"><a href="/">Forum</a> &raquo; <a href="/gear">Gear</a></div>
<h1>Which tent pole fits the 2019 model?</h1>
<div class="post"><div class="post-author">trailfan_42</div><p>My rear pole snapped on the last trip. Does the 2019 model take the same 9 mm segments as the 2021 one?</p></div>
<div class="post"><div class="post-author">gearhead</div><p>Yes, the 9 mm segments are identical across 2018 to 2022. Bring a repair sleeve anyway.</p><p>Mine lasted four seasons with one splice.</p></div>
<div class="post"><div class="post-author">trailfan_42</div><p>Ordered the segments, thanks. Marking this solved.</p></div>
<div class="pagination"><a href="?p=1">1</a> <a href="?p=2">2</a></div>
</body></html>""", [
        "Which tent pole fits the 2019 model?",
        "trailfan_42",
        "My rear pole snapped on the last trip. Does the 2019 model take the same 9 mm segments as the 2021 one?",
        "gearhead",
        "Yes, the 9 mm segments are identical across 2018 to 2022. Bring a repair sleeve anyway.",
        "Mine lasted four seasons with one splice.",
        "trailfan_42",
        "Ordered the segments, thanks. Marking this solved.",
    ]),

    ("table-specs", """<html><body>
<main class="content">
<h1>Camera specifications</h1>
<p>Measured values from the bench test, firmware 2.3.</p>
<table>
<caption>Sensor and body</caption>
<tr><th>Sensor</th><th>Resolution</th><th>Weight</th></tr>
<tr><td>APS-C</td><td>26 MP</td><td>440 g</td></tr>
<tr><td>Full frame</td><td>24 MP</td><td>650 g</td></tr>
</table>
<p>Both bodies share the same battery and charge over USB-C.</p>
</main>
</body></html>""", [
        "Camera specifications",
        "Measured values from the bench test, firmware 2.3.",
        "Sensor and body",
        "Sensor Resolution Weight",
        "APS-C 26 MP 440 g",
        "Full frame 24 MP 650 g",
        "Both bodies share the same battery and charge over USB-C.",
    ]),

    ("rtl-news", """<html dir="rtl" lang="ar"><body>
<header><h1>أخبار الميناء</h1></header>
<article>
<h1>إغلاق الميناء الشمالي يومين بسبب العاصفة</h1>
<p>أغلقت سلطة الميناء الرصيف الخارجي بعد أن تجاوزت الأمواج الحاجز صباح الثلاثاء.</p>
<p>وقالت السلطة إن حركة الشحن ستحول إلى المحطة الجنوبية حتى نهاية الأسبوع.</p>
</article>
<footer><p>جميع الحقوق محفوظة</p></footer>
</body></html>""", [
        "إغلاق الميناء الشمالي يومين بسبب العاصفة",
        "أغلقت سلطة الميناء الرصيف الخارجي بعد أن تجاوزت الأمواج الحاجز صباح الثلاثاء.",
        "وقالت السلطة إن حركة الشحن ستحول إلى المحطة الجنوبية حتى نهاية الأسبوع.",
    ]),

    ("blog-share", """<html><body>
<article class="entry">
<h1>Notes from a week of slow baking</h1>
<p>I spent the week testing a colder final proof, and the crumb opened up noticeably compared with my usual schedule.</p>
<div class="share"><a href="#">Tweet</a><a href="#">Share</a></div>
<p>The second change was a darker bake. Twelve extra minutes with the lid off gave the crust a deep caramel note without any bitterness.</p>
</article>
<div class="related"><h3>Related posts</h3><ul><li><a href="/a">Starter care</a></li></ul></div>
</body></html>""", [
        "Notes from a week of slow baking",
        "I spent the week testing a colder final proof, and the crumb opened up noticeably compared with my usual schedule.",
        "The second change was a darker bake. Twelve extra minutes with the lid off gave the crust a deep caramel note without any bitterness.",
    ]),

    ("product-page", """<html><body>
<div class="breadcrumb"><a href="/">Shop</a> / <a href="/packs">Packs</a></div>
<main>
<h1>Ridgeline 38 pack</h1>
<p>A 38 litre pack for three-season ridge walks, with a stiffened back panel and a roll-top closure that sheds rain without a separate cover.</p>
<h2>Details</h2>
<ul><li>Weight: 980 g in the medium back length.</li><li>Fabric: 210 denier ripstop with a PU coating.</li><li>Hip belt pockets fit a large phone.</li></ul>
<div class="rating">4.6 out of 5 from 212 reviews</div>
</main>
</body></html>""", [
        "Ridgeline 38 pack",
        "A 38 litre pack for three-season ridge walks, with a stiffened back panel and a roll-top closure that sheds rain without a separate cover.",
        "Details",
        "Weight: 980 g in the medium back length.",
        "Fabric: 210 denier ripstop with a PU coating.",
        "Hip belt pockets fit a large phone.",
    ]),

    ("recipe", """<html><body>
<article class="post">
<h1>Skillet flatbreads in twenty minutes</h1>
<p>These flatbreads need no yeast and cook in a dry skillet while the dough is still warm.</p>
<h2>Ingredients</h2>
<ul><li>300 g flour</li><li>200 g warm water</li><li>One teaspoon salt</li><li>Two tablespoons oil</li></ul>
<h2>Method</h2>
<ol><li>Mix everything into a shaggy dough and rest it for ten minutes.</li><li>Divide into eight balls and roll each one thin.</li><li>Cook each round for about a minute per side.</li></ol>
</article>
</body></html>""", [
        "Skillet flatbreads in twenty minutes",
        "These flatbreads need no yeast and cook in a dry skillet while the dough is still warm.",
        "Ingredients",
        "300 g flour",
        "200 g warm water",
        "One teaspoon salt",
        "Two tablespoons oil",
        "Method",
        "Mix everything into a shaggy dough and rest it for ten minutes.",
        "Divide into eight balls and roll each one thin.",
        "Cook each round for about a minute per side.",
    ]),

    ("wiki-article", """<html><body>
<div id="siteNotice" class="banner">Support our mission.</div>
<main id="content" class="mw-body">
<h1>Harbor lighthouse</h1>
<p>The harbor lighthouse is a cast iron tower completed in 1884 at the end of the northern pier. It replaced an oil lantern mounted on a wooden mast.</p>
<p>The light was electrified in 1921 and automated in 1969, when the last keeper left the station.</p>
<h2>See also</h2>
<ul><li><a href="/w/Pier">Northern pier</a></li><li><a href="/w/List">List of lighthouses</a></li></ul>
<h2>References</h2>
<ol class="references"><li><a href="#r1">Harbor board minutes, 1884</a></li><li><a href="#r2">Coastal light registry</a></li></ol>
</main>
</body></html>""", [
        "Harbor lighthouse",
        "The harbor lighthouse is a cast iron tower completed in 1884 at the end of the northern pier. It replaced an oil lantern mounted on a wooden mast.",
        "The light was electrified in 1921 and automated in 1969, when the last keeper left the station.",
        "See also",
        "References",
    ]),

    ("landing-page", """<html><body>
<section class="hero"><h1>Ship your data anywhere</h1><p>One pipeline, every destination.</p><a class="cta" href="/signup">Start free</a></section>
<section class="features">
<div class="card"><h3>Fast</h3><p>Batches land in under a minute, even at peak load.</p></div>
<div class="card"><h3>Safe</h3><p>Every record is checksummed twice before the ack.</p></div>
</section>
<div class="cookie-banner">We use cookies. <a href="/consent">Manage</a></div>
</body></html>""", [
        "Ship your data anywhere",
        "One pipeline, every destination.",
        "Start free",
        "Fast",
        "Batches land in under a minute, even at peak load.",
        "Safe",
        "Every record is checksummed twice before the ack.",
    ]),

    ("terms", """<html><body>
<main>
<h1>Terms of service</h1>
<h2>1. Accounts</h2>
<p>You are responsible for activity on your account and for keeping your password secure.</p>
<h2>2. Acceptable use</h2>
<p>You may not probe the service for vulnerabilities without written permission.</p>
<p class="disclaimer">Nothing here is legal advice.</p>
</main>
</body></html>""", [
        "Terms of service",
        "1. Accounts",
        "You are responsible for activity on your account and for keeping your password secure.",
        "2. Acceptable use",
        "You may not probe the service for vulnerabilities without written permission.",
    ]),

    ("faq-details", """<html><body>
<main class="content">
<h1>Billing questions</h1>
<details><summary>When are invoices issued?</summary><p>Invoices are issued on the first business day of each month.</p></details>
<details><summary>Can I pay in euros?</summary><p>Yes, invoices can be issued in euros or dollars.</p></details>
</main>
</body></html>""", [
        "Billing questions",
        "When are invoices issued?",
        "Invoices are issued on the first business day of each month.",
        "Can I pay in euros?",
        "Yes, invoices can be issued in euros or dollars.",
    ]),

    ("photo-gallery", """<html><body>
<main>
<h1>Winter on the pier</h1>
<p>Photographs from the first cold week of January.</p>
<figure><img src="1.jpg"><figcaption>Ice on the rail</figcaption></figure>
<figure><img src="2.jpg"><figcaption>The light at dusk</figcaption></figure>
</main>
</body></html>""", [
        "Winter on the pier",
        "Photographs from the first cold week of January.",
    ]),

    ("paywall-teaser", """<html><body>
<article>
<h1>Council approves the bridge repair budget</h1>
<p>The council voted seven to two on Monday to fund the full repair of the swing bridge, ending a year of temporary closures.</p>
<div class="signup-wall"><h3>Subscribe to keep reading</h3><p>Get unlimited access for two euros a month.</p></div>
</article>
</body></html>""", [
        "Council approves the bridge repair budget",
        "The council voted seven to two on Monday to fund the full repair of the swing bridge, ending a year of temporary closures.",
    ]),

    ("museum-popups", """<html><body>
<div class="modal newsletter"><h3>Join the letter</h3></div>
<main><article>
<h1>The old mill opens as a museum</h1>
<p>After four years of restoration the water mill reopened with its original gearing turning again.</p>
<p>The museum plans milling demonstrations on the first Saturday of every month.</p>
</article></main>
<div class="consent-bar">Accept cookies?</div>
</body></html>""", [
        "The old mill opens as a museum",
        "After four years of restoration the water mill reopened with its original gearing turning again.",
        "The museum plans milling demonstrations on the first Saturday of every month.",
    ]),

    ("abstract-page", """<html><body>
<main id="main-content">
<h1>Sampling bounds for streaming quantile sketches</h1>
<div class="byline">J. Doe and R. Roe</div>
<h2>Abstract</h2>
<p>We give tighter space bounds for mergeable quantile sketches under adversarial streams, improving the known constant by a factor of two.</p>
<div class="tags"><a href="/t/streams">streams</a><a href="/t/sketches">sketches</a></div>
</main>
</body></html>""", [
        "Sampling bounds for streaming quantile sketches",
        "Abstract",
        "We give tighter space bounds for mergeable quantile sketches under adversarial streams, improving the known constant by a factor of two.",
    ]),

    ("changelog", """<html><body>
<main class="content">
<h1>Release notes</h1>
<h2>2.4.0</h2>
<ul><li>Added retry budgets to the uploader.</li><li>Fixed a crash when the manifest was empty.</li></ul>
<h2>2.3.2</h2>
<ul><li>Reduced idle memory by a third.</li></ul>
</main>
</body></html>""", [
        "Release notes",
        "2.4.0",
        "Added retry budgets to the uploader.",
        "Fixed a crash when the manifest was empty.",
        "2.3.2",
        "Reduced idle memory by a third.",
    ]),

    ("sports-report", """<html><body>
<article>
<h1>Harbor Rovers take the derby three to one</h1>
<p>Rovers scored twice before the break and controlled the midfield throughout the second half.</p>
<table class="scoreline"><tr><th>Team</th><th>Goals</th></tr><tr><td>Harbor Rovers</td><td>3</td></tr><tr><td>Mill Town</td><td>1</td></tr></table>
<p>The returning keeper saved a penalty in the closing minutes.</p>
</article>
</body></html>""", [
        "Harbor Rovers take the derby three to one",
        "Rovers scored twice before the break and controlled the midfield throughout the second half.",
        "Team Goals",
        "Harbor Rovers 3",
        "Mill Town 1",
        "The returning keeper saved a penalty in the closing minutes.",
    ]),

    ("mixed-language", """<html><body>
<main>
<h1>Port notice 港口通告</h1>
<p>The ferry timetable changes on Monday. 渡轮时刻表将于星期一调整。</p>
<p>Night crossings resume in March. 夜间航线三月恢复。</p>
</main>
</body></html>""", [
        "Port notice 港口通告",
        "The ferry timetable changes on Monday. 渡轮时刻表将于星期一调整。",
        "Night crossings resume in March. 夜间航线三月恢复。",
    ]),

    ("inline-entities", """<html><body>
<article>
<h1>Care &amp; feeding of cast iron</h1>
<p>Rinse the pan while it is still <b>warm</b>, dry it on the stove, and wipe on a film of oil &ndash; about half a teaspoon.</p>
<p>Storage tip:<br>keep the lid off so the seasoning can breathe.</p>
<p>Never soak it &#8211; an hour in water undoes a month of use.</p>
</article>
</body></html>""", [
        "Care & feeding of cast iron",
        "Rinse the pan while it is still warm, dry it on the stove, and wipe on a film of oil – about half a teaspoon.",
        "Storage tip:",
        "keep the lid off so the seasoning can breathe.",
        "Never soak it – an hour in water undoes a month of use.",
    ]),

    ("legacy-table-layout", """<html><body>
<table width="100%"><tr><td class="nav-cell"><a href="/">Home</a><br><a href="/fleet">Fleet</a></td><td>
<h1>Ferry fleet history</h1>
<p>The first diesel ferry entered service in 1935 and stayed on the crossing for forty years.</p>
<p>Two sister ships followed after the war, both built at the local yard.</p>
</td></tr></table>
</body></html>""", [
        "Ferry fleet history",
        "The first diesel ferry entered service in 1935 and stayed on the crossing for forty years.",
        "Two sister ships followed after the war, both built at the local yard.",
    ]),

    ("comments-heavy", """<html><body>
<article class="story">
<h1>Short notice: road closed tonight</h1>
<p>Mill Road closes at eight for resurfacing and reopens at six in the morning.</p>
</article>
<section class="comments">
<h3>12 comments</h3>
<div class="comment"><p>About time, the potholes were brutal.</p></div>
<div class="comment"><p>Any detour for the night bus?</p></div>
</section>
</body></html>""", [
        "Short notice: road closed tonight",
        "Mill Road closes at eight for resurfacing and reopens at six in the morning.",
    ]),

    ("code-article", """<html><body>
<main class="post-body">
<h1>Retrying uploads with a budget</h1>
<p>The uploader retries a failed part only while the shared budget is positive, which caps the total extra traffic.</p>
<pre><code>budget = parts * 0.2
if budget &lt; 1: give_up()</code></pre>
<p>Set the factor to zero to disable retries entirely.</p>
</main>
</body></html>""", [
        "Retrying uploads with a budget",
        "The uploader retries a failed part only while the shared budget is positive, which caps the total extra traffic.",
        "budget = parts * 0.2 if budget < 1: give_up()",
        "Set the factor to zero to disable retries entirely.",
    ]),

    ("hidden-drafts", """<html><body>
<main>
<h1>Opening hours</h1>
<p>The reading room is open from nine to five on weekdays.</p>
<p style="display:none">Draft: do not publish this paragraph.</p>
<p hidden>Old hours kept for the archive.</p>
<p>Saturday opening starts again in April.</p>
</main>
</body></html>""", [
        "Opening hours",
        "The reading room is open from nine to five on weekdays.",
        "Saturday opening starts again in April.",
    ]),

    # ---- round-6 second batch: 10 more hand-transcribed classes ----

    ("liveblog", """<html><body>
<div class="masthead"><a href="/">The Harbor Ledger</a><ul><li><a href="/live">Live</a></li></ul></div>
<article class="live">
<h1>Live: council vote on the harbor plan</h1>
<p class="standfirst">Rolling updates as the council debates the harbor redevelopment plan.</p>
<div class="update"><p><strong>14:05</strong> The meeting opened with a quorum of nineteen members.</p></div>
<div class="update"><p><strong>14:32</strong> An amendment to cap building height at six storeys was tabled.</p></div>
<div class="update"><p><strong>15:10</strong> The vote passed by eleven to eight; work starts next spring.</p></div>
</article>
<div class="related"><h3>Related</h3><ul><li><a href="/plan">The plan in maps</a></li></ul></div>
</body></html>""", [
        "Live: council vote on the harbor plan",
        "Rolling updates as the council debates the harbor redevelopment plan.",
        "14:05 The meeting opened with a quorum of nineteen members.",
        "14:32 An amendment to cap building height at six storeys was tabled.",
        "15:10 The vote passed by eleven to eight; work starts next spring.",
    ]),

    ("job-posting", """<html><body>
<header><img src="crest.png"><span>Records office</span></header>
<main>
<h1>Data steward (part time)</h1>
<p>The records office seeks a data steward to curate the municipal archive two days per week.</p>
<h2>Requirements</h2>
<ul>
<li>Two years of archival or library experience.</li>
<li>Comfort with spreadsheets and fixed-width exports.</li>
</ul>
<h2>What we offer</h2>
<ul>
<li>Flexible hours and a season transit pass.</li>
</ul>
<p>Applications close at the end of the month.</p>
</main>
<div class="signup"><p>Apply through the portal with reference RS-12.</p></div>
<footer><p>An equal opportunity employer.</p></footer>
</body></html>""", [
        "Data steward (part time)",
        "The records office seeks a data steward to curate the municipal archive two days per week.",
        "Requirements",
        "Two years of archival or library experience.",
        "Comfort with spreadsheets and fixed-width exports.",
        "What we offer",
        "Flexible hours and a season transit pass.",
        "Applications close at the end of the month.",
    ]),

    ("qa-interview", """<html><body>
<article>
<h1>Five questions for the harbormaster</h1>
<p class="intro">We sat down with the harbormaster after the storm closure to ask what comes next.</p>
<p><em>What broke on the outer pier?</em></p>
<blockquote>Mostly the lighting and two mooring cleats; the deck itself held up fine.</blockquote>
<p><em>When do ferries resume?</em></p>
<blockquote>Thursday morning, once the insurer signs off on the repairs.</blockquote>
</article>
</body></html>""", [
        "Five questions for the harbormaster",
        "We sat down with the harbormaster after the storm closure to ask what comes next.",
        "What broke on the outer pier?",
        "Mostly the lighting and two mooring cleats; the deck itself held up fine.",
        "When do ferries resume?",
        "Thursday morning, once the insurer signs off on the repairs.",
    ]),

    ("weather-report", """<html><body>
<main>
<h1>Harbor weather, Tuesday</h1>
<p>A clearing trend follows the storm, with winds easing through the afternoon.</p>
<dl>
<dt>Wind</dt><dd>Northwest at 30 km/h, gusting 45</dd>
<dt>Visibility</dt><dd>Eight kilometres, improving</dd>
<dt>Sea state</dt><dd>Two metre swell, subsiding overnight</dd>
</dl>
</main>
</body></html>""", [
        "Harbor weather, Tuesday",
        "A clearing trend follows the storm, with winds easing through the afternoon.",
        "Wind",
        "Northwest at 30 km/h, gusting 45",
        "Visibility",
        "Eight kilometres, improving",
        "Sea state",
        "Two metre swell, subsiding overnight",
    ]),

    ("event-schedule", """<html><body>
<main>
<h1>Spring regatta programme</h1>
<p>Racing runs over two days, with the prize ceremony on the quay after the final heat.</p>
<table>
<caption>Saturday heats</caption>
<thead><tr><th>Time</th><th>Class</th><th>Course</th></tr></thead>
<tbody>
<tr><td>09:00</td><td>Dinghy</td><td>Inner bay</td></tr>
<tr><td>11:30</td><td>Keelboat</td><td>Outer mark</td></tr>
</tbody>
</table>
<p>Entry closes on Friday at noon.</p>
</main>
</body></html>""", [
        "Spring regatta programme",
        "Racing runs over two days, with the prize ceremony on the quay after the final heat.",
        "Saturday heats",
        "Time Class Course",
        "09:00 Dinghy Inner bay",
        "11:30 Keelboat Outer mark",
        "Entry closes on Friday at noon.",
    ]),

    # candidate-commit trap: a surviving paragraph OUTSIDE the content div
    # must be excluded once the div holds >= 70% of surviving text
    ("press-release", """<html><body>
<div class="masthead"><p>Port Authority newsroom</p></div>
<div class="content">
<h1>Port authority to rebuild the outer pier lighting</h1>
<p>HARBORTOWN, Tuesday — The port authority will replace the storm-damaged lighting on the outer pier with sealed LED units before the weekend.</p>
<p>The work is funded from the maintenance reserve and requires no closure beyond the current one.</p>
</div>
<div class="disclaimer"><p>This release may contain forward-looking statements.</p></div>
<p class="contactline">Press contact: the newsroom desk, weekdays.</p>
</body></html>""", [
        "Port authority to rebuild the outer pier lighting",
        "HARBORTOWN, Tuesday — The port authority will replace the storm-damaged lighting on the outer pier with sealed LED units before the weekend.",
        "The work is funded from the maintenance reserve and requires no closure beyond the current one.",
    ]),

    # tiny-block edge: a 14-char h1 survives (not fully anchored) while the
    # all-anchor link list dies by density and the menu/form by pruning
    ("soft-404", """<html><body>
<div class="error">
<h1>Page not found</h1>
<p>The address may have moved when the archive was reorganised.</p>
<ul class="menu"><li><a href="/news">News</a></li><li><a href="/tides">Tides</a></li></ul>
<ul><li><a href="/">Front page</a></li><li><a href="/search">Search</a></li></ul>
</div>
<form action="/search"><input name="q"><button>Search the site</button></form>
</body></html>""", [
        "Page not found",
        "The address may have moved when the archive was reorganised.",
    ]),

    ("glossary", """<html><body>
<main>
<h1>Glossary of port terms</h1>
<dl>
<dt>Bollard</dt><dd>A short post on the quay for securing mooring lines.</dd>
<dt>Fairway</dt><dd>The navigable channel kept clear for vessels, marked on the <a href="/charts">harbor chart</a>.</dd>
<dt>Slack water</dt><dd>The short pause between tides when the current nearly stops.</dd>
</dl>
</main>
</body></html>""", [
        "Glossary of port terms",
        "Bollard",
        "A short post on the quay for securing mooring lines.",
        "Fairway",
        "The navigable channel kept clear for vessels, marked on the harbor chart.",
        "Slack water",
        "The short pause between tides when the current nearly stops.",
    ]),

    ("archive-letter", """<html><body>
<article>
<h1>From the archive: the keeper's letter</h1>
<p>In 1934 the lighthouse keeper wrote to the harbor board about the winter supply run.</p>
<blockquote>
<p>The tender calls but once a month, and the oil barely lasts the fortnight of fog.</p>
<p>I ask the board to double the ration before the ice closes the sound.</p>
</blockquote>
<p>The board approved the request the following spring.</p>
</article>
</body></html>""", [
        "From the archive: the keeper's letter",
        "In 1934 the lighthouse keeper wrote to the harbor board about the winter supply run.",
        "The tender calls but once a month, and the oil barely lasts the fortnight of fog.",
        "I ask the board to double the ration before the ice closes the sound.",
        "The board approved the request the following spring.",
    ]),

    ("guide-chrome", """<html><body>
<div class="breadcrumbs"><a href="/">Home</a> › <a href="/guides">Guides</a> › Mooring</div>
<article>
<h1>Mooring in a crosswind</h1>
<p>Approach slowly against the stronger element, wind or tide, and rig the midship spring first.</p>
<p>With the spring made fast, engine ahead at idle holds the boat alongside while crew steps ashore.</p>
</article>
<div class="pagination"><a href="/guides/1">Previous</a><a href="/guides/3">Next</a></div>
<div class="tags"><a href="/t/mooring">mooring</a><a href="/t/wind">wind</a></div>
</body></html>""", [
        "Mooring in a crosswind",
        "Approach slowly against the stronger element, wind or tide, and rig the midship spring first.",
        "With the spring made fast, engine ahead at idle holds the boat alongside while crew steps ashore.",
    ]),

    # ---- round-6 fourth batch: markup classes the wild set lacked ----

    # XHTML 1.0 Strict with XML prolog, PUBLIC doctype, xmlns, and
    # XHTML-style self-closed void tags (<br />)
    ("xhtml-strict", """<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">
<html xmlns="http://www.w3.org/1999/xhtml">
<head><title>Tide tables</title><meta http-equiv="Content-Type" content="text/html; charset=utf-8" /></head>
<body>
<div id="page">
<h1>Tide tables for the outer harbor</h1>
<p>High water arrives forty minutes later at the outer harbor than at the city quay.</p>
<p>Spring tides add roughly half a metre to the predicted heights.<br />Neap tides subtract about the same.</p>
</div>
</body>
</html>""", [
        "Tide tables for the outer harbor",
        "High water arrives forty minutes later at the outer harbor than at the city quay.",
        "Spring tides add roughly half a metre to the predicted heights.",
        "Neap tides subtract about the same.",
    ]),

    # IE conditional comments: the hidden form (<!--[if ...]> ... <![endif]-->)
    # is one ordinary comment and vanishes whole; the downlevel-revealed form
    # (<![if !IE]> ... <![endif]>) is two bogus comments whose enclosed
    # content stays parsed — exactly what browsers render
    ("conditional-comments", """<html><head><title>Branch opening hours</title></head><body>
<!--[if lt IE 9]><p>Please upgrade your browser to view this page.</p><![endif]-->
<main>
<h1>Branch opening hours</h1>
<![if !IE]><p>The branch opens at half past eight on weekdays.</p><![endif]>
<p>Saturday service runs from nine until noon.</p>
</main>
<!-- analytics snippet removed -->
</body></html>""", [
        "Branch opening hours",
        "The branch opens at half past eight on weekdays.",
        "Saturday service runs from nine until noon.",
    ]),

    # AMP-style unknown custom elements: parsed as ordinary inline elements,
    # their text flows; empty media custom tags contribute nothing
    ("amp-custom-tags", """<html><body>
<header><a href="/">Reader</a></header>
<article>
<h1>Night bus routes extended</h1>
<amp-img src="bus.jpg" width="600" height="400"></amp-img>
<p>Two night bus routes will run every twenty minutes until two in the morning.</p>
<my-pullquote>The extension follows a year of rising late ridership.</my-pullquote>
<p>The change takes effect from the first weekend of March.</p>
</article>
</body></html>""", [
        "Night bus routes extended",
        "Two night bus routes will run every twenty minutes until two in the morning.",
        "The extension follows a year of rising late ridership.",
        "The change takes effect from the first weekend of March.",
    ]),

    # <noscript> fallback junk (tracking pixel + prompt) drops whole
    ("noscript-pixel", """<html><body>
<main>
<h1>Library card renewal</h1>
<p>Cards renew automatically unless a fine is outstanding.</p>
<noscript><img src="pixel.gif"><p>Enable scripts to renew online.</p></noscript>
<p>Visit any branch desk to settle a fine in person.</p>
</main>
</body></html>""", [
        "Library card renewal",
        "Cards renew automatically unless a fine is outstanding.",
        "Visit any branch desk to settle a fine in person.",
    ]),

    # inline SVG chart: the svg subtree (including its <text> labels) is
    # non-content and drops whole
    ("svg-figure", """<html><body>
<main>
<h1>Rainfall by month</h1>
<p>October remains the wettest month in the forty-year series.</p>
<svg viewBox="0 0 100 40"><rect x="1" y="2" width="5" height="30"></rect><text x="3" y="38">Oct</text></svg>
<p>The driest stretch runs from February to April.</p>
</main>
</body></html>""", [
        "Rainfall by month",
        "October remains the wettest month in the forty-year series.",
        "The driest stretch runs from February to April.",
    ]),

    # legacy <frameset> page: frameset/frame are unknown (inline, no text);
    # the <noframes> fallback body is the only real content, and its
    # all-anchor link list dies by list link density
    ("frameset-legacy", """<html><head><title>Ferry schedules</title></head>
<frameset cols="20%,80%">
<frame src="menu.html" name="menu">
<frame src="main.html" name="main">
<noframes><body>
<p>This site uses frames. Open the schedule pages directly:</p>
<ul><li><a href="menu.html">Route menu</a></li><li><a href="main.html">Current schedule</a></li></ul>
</body></noframes>
</frameset>
</html>""", [
        "This site uses frames. Open the schedule pages directly:",
    ]),

    # legacy presentational markup: center/font/big/u/marquee are inline,
    # their text flows and flushes at the surrounding block boundaries
    ("legacy-font-center", """<html><body bgcolor="#ffffff">
<center><h1><font face="Arial" color="#000080">Village fete this Saturday</font></h1></center>
<center><font size="2">Gates open at ten; the parade starts at noon sharp.</font></center>
<p><big>Entry is free</big> and <u>parking</u> is signposted from the green.</p>
<marquee>Raffle tickets on sale at the gate.</marquee>
<p>The brass band plays at three.</p>
</body></html>""", [
        "Village fete this Saturday",
        "Gates open at ten; the parade starts at noon sharp.",
        "Entry is free and parking is signposted from the green.",
        "Raffle tickets on sale at the gate.",
        "The brass band plays at three.",
    ]),

    # mailing-list archive: the From/date chrome carries a meta- class
    # (discard keyword); the <pre> body is one whitespace-collapsed block
    # line (disclosed divergence from real trafilatura)
    ("mailing-list-pre", """<html><body>
<div class="masthead"><a href="/">List archive</a></div>
<main>
<h1>[harbor-users] Dredging schedule</h1>
<div class="meta-line">From: a.sailor — Tue, 12 Mar</div>
<pre>
The dredger arrives on the 18th and works the outer
channel first.  Expect single-lane traffic at the
narrows for two days.

Moorings on the east wall stay open throughout.
</pre>
<p>Replies to the list, please.</p>
</main>
</body></html>""", [
        "[harbor-users] Dredging schedule",
        "The dredger arrives on the 18th and works the outer channel first. Expect single-lane traffic at the narrows for two days. Moorings on the east wall stay open throughout.",
        "Replies to the list, please.",
    ]),

    # ---- round-6 sixth batch: non-Latin LAYOUTS, not just non-Latin bytes —
    # RTL pages with bidi controls (bdo, numeric+named bidi entities), ruby
    # furigana annotations, unspaced Thai with <wbr>, Eastern-Arabic-numeral
    # tables, mixed-script Korean, Persian ZWNJ-joined words over an LTR
    # <pre>. Same discipline: structures transcribed from common real-world
    # page classes, goldens hand-derived from the documented semantics.

    # Hebrew news page: dir=rtl, an LTR <bdo> product code inline, a numeric
    # bidi entity (&#x200F; = RLM) that must decode and SURVIVE whitespace
    # collapse (Java \s is ASCII-only; RLM > U+0020 survives trim)
    ("hebrew-rtl-bidi", """<html dir="rtl" lang="he"><head><title>\u05d7\u05d3\u05e9\u05d5\u05ea</title></head><body>
<div class="masthead"><a href="/">\u05e8\u05d0\u05e9\u05d9</a> | <a href="/news">\u05d7\u05d3\u05e9\u05d5\u05ea</a></div>
<main>
<h1>\u05e9\u05d3\u05d4 \u05d4\u05ea\u05e2\u05d5\u05e4\u05d4 \u05d7\u05d5\u05d6\u05e8 \u05dc\u05e4\u05e2\u05d9\u05dc\u05d5\u05ea \u05de\u05dc\u05d0\u05d4</h1>
<p>\u05e9\u05d3\u05d4 \u05d4\u05ea\u05e2\u05d5\u05e4\u05d4 \u05d7\u05d6\u05e8 \u05d4\u05d1\u05d5\u05e7\u05e8 \u05dc\u05e4\u05e2\u05d9\u05dc\u05d5\u05ea \u05de\u05dc\u05d0\u05d4 \u05dc\u05d0\u05d7\u05e8 \u05e9\u05dc\u05d5\u05e9\u05d4 \u05d9\u05de\u05d9\u05dd \u05e9\u05dc \u05d4\u05e4\u05e8\u05e2\u05d5\u05ea \u05d1\u05d2\u05dc\u05dc \u05d4\u05e9\u05dc\u05d2 \u05d4\u05db\u05d1\u05d3.</p>
<p>\u05d4\u05d3\u05d2\u05dd \u05d4\u05d7\u05d3\u05e9 <bdo dir="ltr">XR-7</bdo> \u05e9\u05dc \u05de\u05e2\u05e8\u05db\u05ea \u05d4\u05d4\u05db\u05d5\u05d5\u05e0\u05d4 \u05d4\u05d5\u05e4\u05e2\u05dc \u05dc\u05e8\u05d0\u05e9\u05d5\u05e0\u05d4 \u05d1\u05de\u05e1\u05dc\u05d5\u05dc \u05d4\u05d3\u05e8\u05d5\u05de\u05d9.</p>
<p>&#x200F;\u05d4\u05de\u05e0\u05d4\u05dc \u05d0\u05de\u05e8: &quot;\u05db\u05dc \u05d4\u05d8\u05d9\u05e1\u05d5\u05ea \u05d9\u05d7\u05d5\u05d3\u05e9\u05d5 \u05e2\u05d3 \u05d4\u05e2\u05e8\u05d1&quot;.</p>
</main>
<footer><p>\u05db\u05dc \u05d4\u05d6\u05db\u05d5\u05d9\u05d5\u05ea \u05e9\u05de\u05d5\u05e8\u05d5\u05ea</p></footer>
</body></html>""", [
        "\u05e9\u05d3\u05d4 \u05d4\u05ea\u05e2\u05d5\u05e4\u05d4 \u05d7\u05d5\u05d6\u05e8 \u05dc\u05e4\u05e2\u05d9\u05dc\u05d5\u05ea \u05de\u05dc\u05d0\u05d4",
        "\u05e9\u05d3\u05d4 \u05d4\u05ea\u05e2\u05d5\u05e4\u05d4 \u05d7\u05d6\u05e8 \u05d4\u05d1\u05d5\u05e7\u05e8 \u05dc\u05e4\u05e2\u05d9\u05dc\u05d5\u05ea \u05de\u05dc\u05d0\u05d4 \u05dc\u05d0\u05d7\u05e8 \u05e9\u05dc\u05d5\u05e9\u05d4 \u05d9\u05de\u05d9\u05dd \u05e9\u05dc \u05d4\u05e4\u05e8\u05e2\u05d5\u05ea \u05d1\u05d2\u05dc\u05dc \u05d4\u05e9\u05dc\u05d2 \u05d4\u05db\u05d1\u05d3.",
        "\u05d4\u05d3\u05d2\u05dd \u05d4\u05d7\u05d3\u05e9 XR-7 \u05e9\u05dc \u05de\u05e2\u05e8\u05db\u05ea \u05d4\u05d4\u05db\u05d5\u05d5\u05e0\u05d4 \u05d4\u05d5\u05e4\u05e2\u05dc \u05dc\u05e8\u05d0\u05e9\u05d5\u05e0\u05d4 \u05d1\u05de\u05e1\u05dc\u05d5\u05dc \u05d4\u05d3\u05e8\u05d5\u05de\u05d9.",
        "\u200f\u05d4\u05de\u05e0\u05d4\u05dc \u05d0\u05de\u05e8: \"\u05db\u05dc \u05d4\u05d8\u05d9\u05e1\u05d5\u05ea \u05d9\u05d7\u05d5\u05d3\u05e9\u05d5 \u05e2\u05d3 \u05d4\u05e2\u05e8\u05d1\".",
    ]),
    # ja ruby/rt/rp annotations flow INLINE (same as lxml text content): reading in rp-parens follows the base text
    ("ruby-furigana", """<html lang="ja"><body>
<article>
<h1>\u6e2f\u306e\u796d\u308a\u304c\u4e09\u5e74\u3076\u308a\u306b\u958b\u50ac</h1>
<p><ruby>\u6f01\u6e2f<rp>\uff08</rp><rt>\u304e\u3087\u3053\u3046</rt><rp>\uff09</rp></ruby>\u306e\u6625\u796d\u308a\u304c\u4e09\u5e74\u3076\u308a\u306b\u958b\u304b\u308c\u3001\u521d\u65e5\u306f\u6674\u5929\u306b\u6075\u307e\u308c\u305f\u3002</p>
<p>\u4e3b\u50ac\u8005\u306b\u3088\u308b\u3068\u3001\u5c4b\u53f0\u306f\u5168\u90e8\u3067\u56db\u5341\u8ed2\u304c\u4e26\u3073\u3001<ruby>\u795e\u8f3f<rt>\u307f\u3053\u3057</rt></ruby>\u306e\u5de1\u884c\u306f\u6b63\u5348\u306b\u59cb\u307e\u308b\u3002</p>
<p>\u4f1a\u5834\u3078\u306f\u81e8\u6642\u30d0\u30b9\u306e\u5229\u7528\u304c\u63a8\u5968\u3055\u308c\u3066\u3044\u308b\u3002</p>
</article>
<div class="share-tools"><a href="#">\u5171\u6709</a> <a href="#">\u4fdd\u5b58</a></div>
</body></html>""", [
        "\u6e2f\u306e\u796d\u308a\u304c\u4e09\u5e74\u3076\u308a\u306b\u958b\u50ac",
        "\u6f01\u6e2f\uff08\u304e\u3087\u3053\u3046\uff09\u306e\u6625\u796d\u308a\u304c\u4e09\u5e74\u3076\u308a\u306b\u958b\u304b\u308c\u3001\u521d\u65e5\u306f\u6674\u5929\u306b\u6075\u307e\u308c\u305f\u3002",
        "\u4e3b\u50ac\u8005\u306b\u3088\u308b\u3068\u3001\u5c4b\u53f0\u306f\u5168\u90e8\u3067\u56db\u5341\u8ed2\u304c\u4e26\u3073\u3001\u795e\u8f3f\u307f\u3053\u3057\u306e\u5de1\u884c\u306f\u6b63\u5348\u306b\u59cb\u307e\u308b\u3002",
        "\u4f1a\u5834\u3078\u306f\u81e8\u6642\u30d0\u30b9\u306e\u5229\u7528\u304c\u63a8\u5968\u3055\u308c\u3066\u3044\u308b\u3002",
    ]),

    # CJK link-density: an 8-channel all-anchor nav (16 chars, d=1.0 > 0.5) dies by DENSITY (id=channels is not a discard keyword); a short in-text anchor survives
    ("zh-portal", """<html lang="zh"><body>
<div id="channels"><ul><li><a href="/gn">\u56fd\u5185</a></li><li><a href="/gj">\u56fd\u9645</a></li><li><a href="/cj">\u8d22\u7ecf</a></li><li><a href="/ty">\u4f53\u80b2</a></li><li><a href="/kj">\u79d1\u6280</a></li><li><a href="/wh">\u6587\u5316</a></li><li><a href="/js">\u519b\u4e8b</a></li><li><a href="/jk">\u5065\u5eb7</a></li></ul></div>
<div class="content">
<h1>\u57ce\u5e02\u56fe\u4e66\u9986\u4e0b\u6708\u8d77\u5ef6\u957f\u5f00\u653e\u65f6\u95f4</h1>
<p>\u5e02\u56fe\u4e66\u9986\u5ba3\u5e03\uff0c\u81ea\u4e0b\u6708\u4e00\u65e5\u8d77\uff0c\u603b\u9986\u548c\u4e09\u5904\u5206\u9986\u7684\u5f00\u653e\u65f6\u95f4\u5c06\u5ef6\u957f\u81f3\u665a\u95f4\u4e5d\u70b9\uff0c\u5468\u672b\u7167\u5e38\u5f00\u653e\u3002</p>
<p>\u9986\u65b9\u8868\u793a\uff0c\u65b0\u589e\u7684\u591c\u95f4\u65f6\u6bb5\u5c06\u5f00\u653e\u81ea\u4e60\u533a\u548c\u671f\u520a\u9605\u89c8\u533a\uff0c\u501f\u9605\u670d\u52a1\u7167\u5e38\uff0c\u8be6\u60c5\u89c1<a href="/gg">\u5b98\u65b9\u516c\u544a</a>\u3002</p>
</div>
<div class="footer"><p>\u5907\u6848\u53f7 12345</p></div>
</body></html>""", [
        "\u57ce\u5e02\u56fe\u4e66\u9986\u4e0b\u6708\u8d77\u5ef6\u957f\u5f00\u653e\u65f6\u95f4",
        "\u5e02\u56fe\u4e66\u9986\u5ba3\u5e03\uff0c\u81ea\u4e0b\u6708\u4e00\u65e5\u8d77\uff0c\u603b\u9986\u548c\u4e09\u5904\u5206\u9986\u7684\u5f00\u653e\u65f6\u95f4\u5c06\u5ef6\u957f\u81f3\u665a\u95f4\u4e5d\u70b9\uff0c\u5468\u672b\u7167\u5e38\u5f00\u653e\u3002",
        "\u9986\u65b9\u8868\u793a\uff0c\u65b0\u589e\u7684\u591c\u95f4\u65f6\u6bb5\u5c06\u5f00\u653e\u81ea\u4e60\u533a\u548c\u671f\u520a\u9605\u89c8\u533a\uff0c\u501f\u9605\u670d\u52a1\u7167\u5e38\uff0c\u8be6\u60c5\u89c1\u5b98\u65b9\u516c\u544a\u3002",
    ]),

    # unspaced Thai; <wbr> is a void element contributing no text and no break
    ("thai-unspaced", """<html lang="th"><body>
<main>
<h1>\u0e1e\u0e22\u0e32\u0e01\u0e23\u0e13\u0e4c\u0e2d\u0e32\u0e01\u0e32\u0e28\u0e1b\u0e23\u0e30\u0e08\u0e33\u0e2a\u0e31\u0e1b\u0e14\u0e32\u0e2b\u0e4c</h1>
<p>\u0e01\u0e23\u0e21\u0e2d\u0e38\u0e15\u0e38\u0e19\u0e34\u0e22\u0e21\u0e27\u0e34\u0e17\u0e22\u0e32<wbr>\u0e23\u0e32\u0e22\u0e07\u0e32\u0e19\u0e27\u0e48\u0e32\u0e0a\u0e48\u0e27\u0e07\u0e15\u0e49\u0e19\u0e2a\u0e31\u0e1b\u0e14\u0e32\u0e2b\u0e4c\u0e08\u0e30\u0e21\u0e35\u0e1d\u0e19\u0e15\u0e01\u0e2b\u0e19\u0e31\u0e01\u0e43\u0e19\u0e20\u0e32\u0e04\u0e40\u0e2b\u0e19\u0e37\u0e2d\u0e41\u0e25\u0e30\u0e20\u0e32\u0e04\u0e01\u0e25\u0e32\u0e07</p>
<p>\u0e1b\u0e23\u0e30\u0e0a\u0e32\u0e0a\u0e19\u0e04\u0e27\u0e23\u0e15\u0e34\u0e14\u0e15\u0e32\u0e21\u0e1b\u0e23\u0e30\u0e01\u0e32\u0e28\u0e2d\u0e22\u0e48\u0e32\u0e07\u0e43\u0e01\u0e25\u0e49\u0e0a\u0e34\u0e14\u0e41\u0e25\u0e30\u0e2b\u0e25\u0e35\u0e01\u0e40\u0e25\u0e35\u0e48\u0e22\u0e07\u0e01\u0e32\u0e23\u0e40\u0e14\u0e34\u0e19\u0e17\u0e32\u0e07\u0e43\u0e19\u0e1e\u0e37\u0e49\u0e19\u0e17\u0e35\u0e48\u0e40\u0e2a\u0e35\u0e48\u0e22\u0e07</p>
</main>
</body></html>""", [
        "\u0e1e\u0e22\u0e32\u0e01\u0e23\u0e13\u0e4c\u0e2d\u0e32\u0e01\u0e32\u0e28\u0e1b\u0e23\u0e30\u0e08\u0e33\u0e2a\u0e31\u0e1b\u0e14\u0e32\u0e2b\u0e4c",
        "\u0e01\u0e23\u0e21\u0e2d\u0e38\u0e15\u0e38\u0e19\u0e34\u0e22\u0e21\u0e27\u0e34\u0e17\u0e22\u0e32\u0e23\u0e32\u0e22\u0e07\u0e32\u0e19\u0e27\u0e48\u0e32\u0e0a\u0e48\u0e27\u0e07\u0e15\u0e49\u0e19\u0e2a\u0e31\u0e1b\u0e14\u0e32\u0e2b\u0e4c\u0e08\u0e30\u0e21\u0e35\u0e1d\u0e19\u0e15\u0e01\u0e2b\u0e19\u0e31\u0e01\u0e43\u0e19\u0e20\u0e32\u0e04\u0e40\u0e2b\u0e19\u0e37\u0e2d\u0e41\u0e25\u0e30\u0e20\u0e32\u0e04\u0e01\u0e25\u0e32\u0e07",
        "\u0e1b\u0e23\u0e30\u0e0a\u0e32\u0e0a\u0e19\u0e04\u0e27\u0e23\u0e15\u0e34\u0e14\u0e15\u0e32\u0e21\u0e1b\u0e23\u0e30\u0e01\u0e32\u0e28\u0e2d\u0e22\u0e48\u0e32\u0e07\u0e43\u0e01\u0e25\u0e49\u0e0a\u0e34\u0e14\u0e41\u0e25\u0e30\u0e2b\u0e25\u0e35\u0e01\u0e40\u0e25\u0e35\u0e48\u0e22\u0e07\u0e01\u0e32\u0e23\u0e40\u0e14\u0e34\u0e19\u0e17\u0e32\u0e07\u0e43\u0e19\u0e1e\u0e37\u0e49\u0e19\u0e17\u0e35\u0e48\u0e40\u0e2a\u0e35\u0e48\u0e22\u0e07",
    ]),

    # RTL Arabic with an Eastern-Arabic-numeral timetable: th/td cells join with single spaces per tr row
    ("arabic-numerals-table", """<html dir="rtl" lang="ar"><body>
<main class="content">
<h1>\u062c\u062f\u0648\u0644 \u0645\u0648\u0627\u0639\u064a\u062f \u0627\u0644\u0642\u0637\u0627\u0631\u0627\u062a</h1>
<p>\u062a\u0639\u0645\u0644 \u0627\u0644\u0642\u0637\u0627\u0631\u0627\u062a \u064a\u0648\u0645\u064a\u0627\u064b \u0645\u0627 \u0639\u062f\u0627 \u064a\u0648\u0645 \u0627\u0644\u062c\u0645\u0639\u0629 \u062d\u0633\u0628 \u0627\u0644\u062c\u062f\u0648\u0644 \u0627\u0644\u062a\u0627\u0644\u064a.</p>
<table>
<caption>\u0645\u0648\u0627\u0639\u064a\u062f \u0627\u0644\u0627\u0646\u0637\u0644\u0627\u0642</caption>
<tr><th>\u0627\u0644\u0648\u062c\u0647\u0629</th><th>\u0627\u0644\u0633\u0627\u0639\u0629</th><th>\u0627\u0644\u0631\u0635\u064a\u0641</th></tr>
<tr><td>\u0627\u0644\u0634\u0645\u0627\u0644</td><td>\u0660\u0668:\u0661\u0665</td><td>\u0662</td></tr>
<tr><td>\u0627\u0644\u062c\u0646\u0648\u0628</td><td>\u0660\u0669:\u0664\u0665</td><td>\u0663</td></tr>
</table>
<p>\u062a\u064f\u0628\u0627\u0639 \u0627\u0644\u062a\u0630\u0627\u0643\u0631 \u0641\u064a \u0627\u0644\u0634\u0628\u0627\u0643 \u062d\u062a\u0649 \u0639\u0634\u0631 \u062f\u0642\u0627\u0626\u0642 \u0642\u0628\u0644 \u0627\u0644\u0627\u0646\u0637\u0644\u0627\u0642.</p>
</main>
</body></html>""", [
        "\u062c\u062f\u0648\u0644 \u0645\u0648\u0627\u0639\u064a\u062f \u0627\u0644\u0642\u0637\u0627\u0631\u0627\u062a",
        "\u062a\u0639\u0645\u0644 \u0627\u0644\u0642\u0637\u0627\u0631\u0627\u062a \u064a\u0648\u0645\u064a\u0627\u064b \u0645\u0627 \u0639\u062f\u0627 \u064a\u0648\u0645 \u0627\u0644\u062c\u0645\u0639\u0629 \u062d\u0633\u0628 \u0627\u0644\u062c\u062f\u0648\u0644 \u0627\u0644\u062a\u0627\u0644\u064a.",
        "\u0645\u0648\u0627\u0639\u064a\u062f \u0627\u0644\u0627\u0646\u0637\u0644\u0627\u0642",
        "\u0627\u0644\u0648\u062c\u0647\u0629 \u0627\u0644\u0633\u0627\u0639\u0629 \u0627\u0644\u0631\u0635\u064a\u0641",
        "\u0627\u0644\u0634\u0645\u0627\u0644 \u0660\u0668:\u0661\u0665 \u0662",
        "\u0627\u0644\u062c\u0646\u0648\u0628 \u0660\u0669:\u0664\u0665 \u0663",
        "\u062a\u064f\u0628\u0627\u0639 \u0627\u0644\u062a\u0630\u0627\u0643\u0631 \u0641\u064a \u0627\u0644\u0634\u0628\u0627\u0643 \u062d\u062a\u0649 \u0639\u0634\u0631 \u062f\u0642\u0627\u0626\u0642 \u0642\u0628\u0644 \u0627\u0644\u0627\u0646\u0637\u0644\u0627\u0642.",
    ]),

    # Korean article with an inline Latin exhibition name in a <span> and a decoded &amp;
    ("ko-mixed-scripts", """<html lang="ko"><body>
<article>
<h1>\uc2dc\ub9bd \ubbf8\uc220\uad00, \uc5ec\ub984 \ud2b9\ubcc4\uc804 \uac1c\ub9c9</h1>
<p>\uc2dc\ub9bd \ubbf8\uc220\uad00\uc774 \uc774\ubc88 \uc8fc\ub9d0\ubd80\ud130 \uc5ec\ub984 \ud2b9\ubcc4\uc804 <span lang="en">Light &amp; Form</span>\uc744 \uc5f0\ub2e4\uace0 \ubc1d\ud614\ub2e4.</p>
<p>\uc804\uc2dc\ub294 10\uc6d4 \ub9d0\uae4c\uc9c0 \uc774\uc5b4\uc9c0\uba70, \ub9e4\uc8fc \uc6d4\uc694\uc77c\uc740 \ud734\uad00\uc774\ub2e4.</p>
<p>\uad00\ub78c\uad8c\uc740 \uc628\ub77c\uc778\uacfc \ud604\uc7a5\uc5d0\uc11c \ubaa8\ub450 \uad6c\ub9e4\ud560 \uc218 \uc788\ub2e4.</p>
</article>
<aside><p>\uad00\ub828 \uae30\uc0ac</p></aside>
</body></html>""", [
        "\uc2dc\ub9bd \ubbf8\uc220\uad00, \uc5ec\ub984 \ud2b9\ubcc4\uc804 \uac1c\ub9c9",
        "\uc2dc\ub9bd \ubbf8\uc220\uad00\uc774 \uc774\ubc88 \uc8fc\ub9d0\ubd80\ud130 \uc5ec\ub984 \ud2b9\ubcc4\uc804 Light & Form\uc744 \uc5f0\ub2e4\uace0 \ubc1d\ud614\ub2e4.",
        "\uc804\uc2dc\ub294 10\uc6d4 \ub9d0\uae4c\uc9c0 \uc774\uc5b4\uc9c0\uba70, \ub9e4\uc8fc \uc6d4\uc694\uc77c\uc740 \ud734\uad00\uc774\ub2e4.",
        "\uad00\ub78c\uad8c\uc740 \uc628\ub77c\uc778\uacfc \ud604\uc7a5\uc5d0\uc11c \ubaa8\ub450 \uad6c\ub9e4\ud560 \uc218 \uc788\ub2e4.",
    ]),

    # Persian with HTML5 named &zwnj; joins (must DECODE to U+200C, not pass through) around an LTR <pre> command block (pre collapses whitespace per the disclosed divergence)
    ("persian-zwnj-pre", """<html dir="rtl" lang="fa"><body>
<main>
<h1>\u0631\u0627\u0647\u0646\u0645\u0627\u06cc \u0646\u0635\u0628 \u0646\u0631\u0645&zwnj;\u0627\u0641\u0632\u0627\u0631</h1>
<p>\u0628\u0631\u0627\u06cc \u0646\u0635\u0628\u060c \u0627\u0628\u062a\u062f\u0627 \u0628\u0633\u062a\u0647 \u0631\u0627 \u062f\u0627\u0646\u0644\u0648\u062f \u06a9\u0646\u06cc\u062f \u0648 \u0633\u067e\u0633 \u062f\u0633\u062a\u0648\u0631 \u0632\u06cc\u0631 \u0631\u0627 \u0627\u062c\u0631\u0627 \u06a9\u0646\u06cc\u062f.</p>
<pre dir="ltr">tar -xzf app-2.4.tgz
cd app-2.4 &amp;&amp; ./install.sh</pre>
<p>\u067e\u0633 \u0627\u0632 \u067e\u0627\u06cc\u0627\u0646 \u0646\u0635\u0628\u060c \u0633\u0631\u0648\u06cc\u0633 \u0628\u0647&zwnj;\u0637\u0648\u0631 \u062e\u0648\u062f\u06a9\u0627\u0631 \u0631\u0627\u0647&zwnj;\u0627\u0646\u062f\u0627\u0632\u06cc \u0645\u06cc&zwnj;\u0634\u0648\u062f.</p>
</main>
</body></html>""", [
        "\u0631\u0627\u0647\u0646\u0645\u0627\u06cc \u0646\u0635\u0628 \u0646\u0631\u0645\u200c\u0627\u0641\u0632\u0627\u0631",
        "\u0628\u0631\u0627\u06cc \u0646\u0635\u0628\u060c \u0627\u0628\u062a\u062f\u0627 \u0628\u0633\u062a\u0647 \u0631\u0627 \u062f\u0627\u0646\u0644\u0648\u062f \u06a9\u0646\u06cc\u062f \u0648 \u0633\u067e\u0633 \u062f\u0633\u062a\u0648\u0631 \u0632\u06cc\u0631 \u0631\u0627 \u0627\u062c\u0631\u0627 \u06a9\u0646\u06cc\u062f.",
        "tar -xzf app-2.4.tgz cd app-2.4 && ./install.sh",
        "\u067e\u0633 \u0627\u0632 \u067e\u0627\u06cc\u0627\u0646 \u0646\u0635\u0628\u060c \u0633\u0631\u0648\u06cc\u0633 \u0628\u0647\u200c\u0637\u0648\u0631 \u062e\u0648\u062f\u06a9\u0627\u0631 \u0631\u0627\u0647\u200c\u0627\u0646\u062f\u0627\u0632\u06cc \u0645\u06cc\u200c\u0634\u0648\u062f.",
    ]),

    # ---- round-6 seventh batch: page classes still unexercised \u2014 email
    # newsletter built from nested layout tables (hidden preheader, MSO
    # conditional comment, cells with block children), consent/modal chrome
    # around a committing <main>, JSON-LD + microdata markup, br-stanza
    # poetry, a timestamped interview transcript, scientific sub/sup with
    # footnote refs (inline: no space inserted), and nested ordered lists
    # with a definition list. Goldens hand-derived as above.

    ("newsletter-tables", """<html><head><title>Spring newsletter</title>
<!--[if mso]><style>body{font-family:Arial}</style><![endif]-->
</head><body bgcolor="#f4f4f4">
<div style="display:none;max-height:0;overflow:hidden">Spring issue preview text hidden in the inbox.</div>
<table role="presentation" width="600" align="center">
<tr><td class="logo-td"><img src="gazette.png" alt=""></td><td>The Allotment Gazette</td></tr>
<tr><td colspan="2">
<h1>Seedlings survive the late frost</h1>
<p>Most plots reported healthy seedlings this week despite Tuesday's late frost, with fleece covers doing their job on the exposed south beds.</p>
<p>The tool shed rota for May is posted by the gate; water butts will be cleaned on the first Saturday.</p>
</td></tr>
<tr><td colspan="2">
<table role="presentation"><tr><td><h2>Plot notes</h2><p>Bed 12 has spare leek seedlings, first come first served.</p></td></tr></table>
</td></tr>
<tr><td class="footer" colspan="2"><p>You receive this because you rent a plot. <a href="/unsub">Unsubscribe</a>.</p></td></tr>
</table>
</body></html>""", [
        "The Allotment Gazette",
        "Seedlings survive the late frost",
        "Most plots reported healthy seedlings this week despite Tuesday's late frost, with fleece covers doing their job on the exposed south beds.",
        "The tool shed rota for May is posted by the gate; water butts will be cleaned on the first Saturday.",
        "Plot notes",
        "Bed 12 has spare leek seedlings, first come first served.",
    ]),

    ("cookie-consent", """<html><body>
<div class="cookie-banner"><p>We use cookies to remember your preferences. <a href="/cookies">Learn more</a> <button>Accept</button></p></div>
<div id="signup-modal" aria-hidden="true"><h2>Join free</h2><p>Create an account to save your routes.</p></div>
<div class="site-header"><a href="/">Trail Maps</a></div>
<main>
<h1>Ridge loop reopens after bridge repair</h1>
<p>The ridge loop reopened on Friday after the footbridge over Miller Creek was replaced, the parks department said.</p>
<p>Crews added a gravel apron on both approaches, and the detour through the quarry path has been removed.</p>
<p>Rangers still advise poles for the north descent, which stays muddy into early summer.</p>
</main>
<div class="footer-links"><a href="/contact">Contact</a> <a href="/privacy">Privacy</a></div>
</body></html>""", [
        "Ridge loop reopens after bridge repair",
        "The ridge loop reopened on Friday after the footbridge over Miller Creek was replaced, the parks department said.",
        "Crews added a gravel apron on both approaches, and the detour through the quarry path has been removed.",
        "Rangers still advise poles for the north descent, which stays muddy into early summer.",
    ]),

    ("event-jsonld", """<html><head>
<script type="application/ld+json">{"@context":"https://schema.org","@type":"Event","name":"Harbor concert"}</script>
</head><body>
<div itemscope itemtype="https://schema.org/Event" class="event-card">
<h1 itemprop="name">Harbor concert under the cranes</h1>
<p>The summer series opens with a brass ensemble on the old quay, <time itemprop="startDate" datetime="2024-06-21T19:00">Friday at 19:00</time>, weather permitting.</p>
<p itemprop="description">Seating is unreserved; the harbor office opens the gates one hour before the first piece.</p>
<ul class="event-info"><li>Tickets 12 eur</li><li>Gates 18:00</li></ul>
</div>
</body></html>""", [
        "Harbor concert under the cranes",
        "The summer series opens with a brass ensemble on the old quay, Friday at 19:00, weather permitting.",
        "Seating is unreserved; the harbor office opens the gates one hour before the first piece.",
        "Tickets 12 eur",
        "Gates 18:00",
    ]),

    ("poetry-stanzas", """<html><body>
<article class="poem">
<h1>Lines written at the ferry dock</h1>
<p class="stanza">The gulls rehearse their only argument,<br>the rope uncoils its patient questions;<br>we count the channel markers, two by two,<br>and let the diesel hum decide for us.</p>
<p class="stanza">The mainland shrinks to rumor and to mast,<br>the tide keeps books nobody audits;<br>whatever we forgot to say on shore<br>the wake repeats until it flattens out.</p>
<p class="colophon">First printed in the harbor anthology, 2019.</p>
</article>
</body></html>""", [
        "Lines written at the ferry dock",
        "The gulls rehearse their only argument,",
        "the rope uncoils its patient questions;",
        "we count the channel markers, two by two,",
        "and let the diesel hum decide for us.",
        "The mainland shrinks to rumor and to mast,",
        "the tide keeps books nobody audits;",
        "whatever we forgot to say on shore",
        "the wake repeats until it flattens out.",
        "First printed in the harbor anthology, 2019.",
    ]),

    ("lighthouse-transcript", """<html><body>
<main class="transcript">
<h1>Interview: fifty years keeping the light</h1>
<p class="turn"><b>Host</b> <span class="timecode">[00:12]</span> You started at the lighthouse in 1974. What did the first week feel like?</p>
<p class="turn"><b>Keeper</b> <span class="timecode">[00:31]</span> Mostly stairs. Four hundred steps a day before you even touch the lens, and the brass wants polishing whether the fog comes or not.</p>
<p class="turn"><b>Host</b> <span class="timecode">[02:05]</span> And the automation in the nineties?</p>
<p class="turn"><b>Keeper</b> <span class="timecode">[02:18]</span> The lamp stopped needing me before I stopped needing the lamp. I stayed on as caretaker until the service sold the cottage.</p>
</main>
</body></html>""", [
        "Interview: fifty years keeping the light",
        "Host [00:12] You started at the lighthouse in 1974. What did the first week feel like?",
        "Keeper [00:31] Mostly stairs. Four hundred steps a day before you even touch the lens, and the brass wants polishing whether the fog comes or not.",
        "Host [02:05] And the automation in the nineties?",
        "Keeper [02:18] The lamp stopped needing me before I stopped needing the lamp. I stayed on as caretaker until the service sold the cottage.",
    ]),

    ("science-subsup", """<html><body>
<article>
<h1>Measuring dissolved CO<sub>2</sub> in the reservoir</h1>
<p>Summer samples averaged 2.4 mg per liter of dissolved CO<sub>2</sub>, rising near the inlet where leaf litter collects.</p>
<p>The sensor floats cover roughly 1.8 km<sup>2</sup> of surface, logging temperature and partial pressure every ten minutes.<sup><a href="#n1">[1]</a></sup></p>
<p>Calcium carbonate saturation follows the same seasonal curve, with CaCO<sub>3</sub> precipitation visible on the spill gates by August.<sup><a href="#n2">[2]</a></sup></p>
<ol class="footnotes"><li id="n1">Sensor placement follows the 2021 survey grid.</li><li id="n2">Gate deposits were sampled in September.</li></ol>
</article>
</body></html>""", [
        "Measuring dissolved CO2 in the reservoir",
        "Summer samples averaged 2.4 mg per liter of dissolved CO2, rising near the inlet where leaf litter collects.",
        "The sensor floats cover roughly 1.8 km2 of surface, logging temperature and partial pressure every ten minutes.[1]",
        "Calcium carbonate saturation follows the same seasonal curve, with CaCO3 precipitation visible on the spill gates by August.[2]",
        "Sensor placement follows the 2021 survey grid.",
        "Gate deposits were sampled in September.",
    ]),

    ("licence-terms", """<html><body>
<div class="content legal">
<h1>Boat shed licence terms</h1>
<ol>
<li>The licensee may store one vessel and its trailer in the numbered bay.</li>
<li>Maintenance work is permitted only
<ol><li>between 08:00 and 18:00,</li><li>with drip trays under any engine work, and</li><li>never involving open flame.</li></ol>
</li>
<li>The licence renews each April unless either party gives notice in writing.</li>
</ol>
<dl><dt>Licensee</dt><dd>The person named on the schedule.</dd><dt>Bay</dt><dd>The marked floor area, including its wall rack.</dd></dl>
</div>
</body></html>""", [
        "Boat shed licence terms",
        "The licensee may store one vessel and its trailer in the numbered bay.",
        "Maintenance work is permitted only",
        "between 08:00 and 18:00,",
        "with drip trays under any engine work, and",
        "never involving open flame.",
        "The licence renews each April unless either party gives notice in writing.",
        "Licensee",
        "The person named on the schedule.",
        "Bay",
        "The marked floor area, including its wall rack.",
    ]),

    # ---- round-6 eighth batch: homepage teaser index (link-only <h2>
    # headlines die by the favor_precision block rule while their teaser
    # paragraphs survive), sports box score across thead/tbody/tfoot, civic
    # form instructions committing via id="main-content", a dictionary
    # entry with inline <q>/<i>, a maintenance notice (near-empty class),
    # a review whose class="rating" block is discarded, and a wiki talk
    # page with replies nested as <dl> inside <dd>.

    ("homepage-index", """<html><body>
<main>
<h1>The Valley Courier</h1>
<div class="teaser"><h2><a href="/n1">Reservoir works enter final phase</a></h2><p>Contractors began lining the spill channel on Monday, with the footpath reopening planned for October.</p></div>
<div class="teaser"><h2><a href="/n2">Market hall roof wins design award</a></h2><p>The timber lattice roof took the regional prize for public buildings, the jury citing its reuse of the 1911 trusses.</p></div>
<div class="teaser"><h2><a href="/n3">School buses rerouted next week</a></h2><p>Three routes will divert around the bridge works; pickup times shift by ten minutes at most stops.</p></div>
</main>
</body></html>""", [
        "The Valley Courier",
        "Contractors began lining the spill channel on Monday, with the footpath reopening planned for October.",
        "The timber lattice roof took the regional prize for public buildings, the jury citing its reuse of the 1911 trusses.",
        "Three routes will divert around the bridge works; pickup times shift by ten minutes at most stops.",
    ]),

    ("box-score", """<html><body>
<article>
<h1>Harriers 3, Rovers 1</h1>
<p>The Harriers pulled away after the hour mark with two goals in five minutes at a windy Eastfield.</p>
<table class="box-score">
<thead><tr><th>Player</th><th>G</th><th>A</th></tr></thead>
<tbody>
<tr><td>Okafor</td><td>2</td><td>0</td></tr>
<tr><td>Lindqvist</td><td>1</td><td>1</td></tr>
</tbody>
<tfoot><tr><td>Total</td><td>3</td><td>1</td></tr></tfoot>
</table>
<p>Rovers' reply came from the penalty spot after a handball call the visitors disputed.</p>
</article>
</body></html>""", [
        "Harriers 3, Rovers 1",
        "The Harriers pulled away after the hour mark with two goals in five minutes at a windy Eastfield.",
        "Player G A",
        "Okafor 2 0",
        "Lindqvist 1 1",
        "Total 3 1",
        "Rovers' reply came from the penalty spot after a handball call the visitors disputed.",
    ]),

    ("gov-form", """<html><body>
<div id="main-content">
<h1>How to renew a mooring permit</h1>
<p>Renewals open on 1 March and close on 30 April; late applications go to the waiting list.</p>
<ol>
<li>Check the permit number on your current sticker.</li>
<li>Gather the required documents listed below.</li>
<li>Submit the form at the harbor office or by post.</li>
</ol>
<h2>Required documents</h2>
<ul><li>Proof of insurance valid through September.</li><li>The boat's registration card.</li></ul>
<blockquote>Applications without insurance proof are returned unprocessed.</blockquote>
</div>
</body></html>""", [
        "How to renew a mooring permit",
        "Renewals open on 1 March and close on 30 April; late applications go to the waiting list.",
        "Check the permit number on your current sticker.",
        "Gather the required documents listed below.",
        "Submit the form at the harbor office or by post.",
        "Required documents",
        "Proof of insurance valid through September.",
        "The boat's registration card.",
        "Applications without insurance proof are returned unprocessed.",
    ]),

    ("dictionary-entry", """<html><body>
<article class="entry">
<h1>grapnel</h1>
<p class="pronounce">/ˈɡræp.nəl/ · noun</p>
<ol class="senses">
<li>A small anchor with several flukes, used for small boats.</li>
<li>A hooked device thrown on a rope to catch or hold something, as in <q>they hauled the raft in with a grapnel</q>.</li>
</ol>
<p class="etym">From Old French <i>grapin</i>, diminutive of <i>grape</i>, hook.</p>
</article>
</body></html>""", [
        "grapnel",
        "/ˈɡræp.nəl/ · noun",
        "A small anchor with several flukes, used for small boats.",
        "A hooked device thrown on a rope to catch or hold something, as in they hauled the raft in with a grapnel.",
        "From Old French grapin, diminutive of grape, hook.",
    ]),

    ("maintenance-notice", """<html><body>
<main>
<h1>Scheduled maintenance</h1>
<p>The booking system is offline until 06:00 tomorrow while we move to new hardware.</p>
<p>Saved itineraries are safe; nothing is lost.</p>
</main>
</body></html>""", [
        "Scheduled maintenance",
        "The booking system is offline until 06:00 tomorrow while we move to new hardware.",
        "Saved itineraries are safe; nothing is lost.",
    ]),

    ("review-pros-cons", """<html><body>
<article class="review">
<h1>Fieldlite 2 tent review</h1>
<p>After a wet fortnight on the coast path, the Fieldlite 2 earned its place: quick to pitch, stable in gusts, and light enough to forget.</p>
<div class="rating">4.5 out of 5</div>
<h2>Pros</h2>
<ul><li>Pitches inner-first in under four minutes.</li><li>Held firm in 40 mph gusts on the headland.</li></ul>
<h2>Cons</h2>
<ul><li>The porch floods if the door faces the wind.</li><li>Pegs are flimsy aluminum hooks.</li></ul>
<p>At this weight and price it is the tent to beat for solo coastal trips.</p>
</article>
</body></html>""", [
        "Fieldlite 2 tent review",
        "After a wet fortnight on the coast path, the Fieldlite 2 earned its place: quick to pitch, stable in gusts, and light enough to forget.",
        "Pros",
        "Pitches inner-first in under four minutes.",
        "Held firm in 40 mph gusts on the headland.",
        "Cons",
        "The porch floods if the door faces the wind.",
        "Pegs are flimsy aluminum hooks.",
        "At this weight and price it is the tent to beat for solo coastal trips.",
    ]),

    ("wiki-talk", """<html><body>
<main>
<h1>Talk: Harbor lighthouse</h1>
<dl>
<dt>Proposed merge with Breakwater light</dt>
<dd>The two towers share one keeper's log; merging loses nothing. — Editor_A</dd>
<dd><dl><dd>Oppose: the breakwater light has its own construction history worth a page. — Editor_B</dd></dl></dd>
<dd>Support per Editor_A; the log citation covers both. — Editor_C</dd>
</dl>
</main>
</body></html>""", [
        "Talk: Harbor lighthouse",
        "Proposed merge with Breakwater light",
        "The two towers share one keeper's log; merging loses nothing. — Editor_A",
        "Oppose: the breakwater light has its own construction history worth a page. — Editor_B",
        "Support per Editor_A; the log citation covers both. — Editor_C",
    ]),

    # ---- round-6 ninth batch: constructs still unexercised — <template>
    # ghost content (raw-text element, never parsed, never extracted) next
    # to a dropped <noscript> fallback, rowspan/colspan header cells
    # (attributes ignored, rows serialize as written), aria-hidden="false"
    # (NOT hidden — only the value "true" hides) vs hidden="until-found"
    # (the quoted value is stripped first, leaving a bare `hidden=` that
    # matches the hidden rule — hand-derived as dropped), inline <time>/
    # <em>/<code> flow, and text TRAILING a nested <ol> inside its parent
    # <li> (flushes as its own line after the sublist).

    ("spa-template-ghost", """<html><body>
<div id="app">
<noscript><p>This schedule needs JavaScript; a text version is posted at the station.</p></noscript>
<template id="row-tpl"><tr><td>GHOST ROW</td><td>00:00</td></tr></template>
<h1>Cable car departures</h1>
<p>Cars leave every twenty minutes from 08:00, with the last descent at 18:40.</p>
<p>Service pauses in high wind; the valley station posts closures an hour ahead.</p>
</div>
</body></html>""", [
        "Cable car departures",
        "Cars leave every twenty minutes from 08:00, with the last descent at 18:40.",
        "Service pauses in high wind; the valley station posts closures an hour ahead.",
    ]),

    ("tide-table-spans", """<html><body>
<article>
<h1>Tide tables, first week of June</h1>
<table>
<tr><th rowspan="2">Day</th><th colspan="2">High water</th></tr>
<tr><th>Morning</th><th>Evening</th></tr>
<tr><td>Monday</td><td>04:12</td><td>16:47</td></tr>
<tr><td>Tuesday</td><td>05:01</td><td>17:33</td></tr>
</table>
<p>Heights stay under four meters all week; the shelf dries out from mid-morning.</p>
</article>
</body></html>""", [
        "Tide tables, first week of June",
        "Day High water",
        "Morning Evening",
        "Monday 04:12 16:47",
        "Tuesday 05:01 17:33",
        "Heights stay under four meters all week; the shelf dries out from mid-morning.",
    ]),

    ("chamber-series", """<html><body>
<main class="program">
<h1>Autumn chamber series</h1>
<p>Seven concerts in the old granary, Thursdays at <time>19:30</time>, doors half an hour before.</p>
<ul>
<li><em>Trout Quintet</em> — 12 September, with the harbor quartet and guest bass.</li>
<li><em>Winter Words</em> — 10 October, tenor and piano.</li>
<li><em>Folk settings</em> — 7 November, full ensemble.</li>
</ul>
<p>Season tickets cover all seven dates and transfer freely.</p>
</main>
</body></html>""", [
        "Autumn chamber series",
        "Seven concerts in the old granary, Thursdays at 19:30, doors half an hour before.",
        "Trout Quintet — 12 September, with the harbor quartet and guest bass.",
        "Winter Words — 10 October, tenor and piano.",
        "Folk settings — 7 November, full ensemble.",
        "Season tickets cover all seven dates and transfer freely.",
    ]),

    ("obituary", """<html><body>
<article class="obituary">
<h1>Margit Holm, 1931-2024</h1>
<p>Margit Holm, who kept the island's weather diary for sixty-one years without a missed day, died on Tuesday at the care home in Sundvik. She was 93.</p>
<p>Her notebooks, donated to the maritime museum in 2019, record every gale, ice year, and first tern back to 1958.</p>
<p>A gathering is planned at the chapel on the 14th; the family asks for bulbs for the school garden instead of flowers.</p>
</article>
</body></html>""", [
        "Margit Holm, 1931-2024",
        "Margit Holm, who kept the island's weather diary for sixty-one years without a missed day, died on Tuesday at the care home in Sundvik. She was 93.",
        "Her notebooks, donated to the maritime museum in 2019, record every gale, ice year, and first tern back to 1958.",
        "A gathering is planned at the chapel on the 14th; the family asks for bulbs for the school garden instead of flowers.",
    ]),

    ("api-reference", """<html><body>
<main class="api">
<h1>GET /v2/moorings</h1>
<p>Lists moorings visible to the caller, newest first.</p>
<table>
<tr><th>Param</th><th>Type</th><th>Default</th></tr>
<tr><td><code>harbor</code></td><td>string</td><td>all</td></tr>
<tr><td><code>free</code></td><td>boolean</td><td>false</td></tr>
</table>
<dl><dt>200</dt><dd>A JSON array of mooring objects.</dd><dt>429</dt><dd>Rate limited; retry after the indicated delay.</dd></dl>
<pre>curl -s https://api.example.com/v2/moorings?free=true</pre>
</main>
</body></html>""", [
        "GET /v2/moorings",
        "Lists moorings visible to the caller, newest first.",
        "Param Type Default",
        "harbor string all",
        "free boolean false",
        "200",
        "A JSON array of mooring objects.",
        "429",
        "Rate limited; retry after the indicated delay.",
        "curl -s https://api.example.com/v2/moorings?free=true",
    ]),

    ("faq-aria-hidden", """<html><body>
<div class="faq-list">
<h1>Allotment water FAQ</h1>
<section aria-hidden="false"><h2>When do the taps open?</h2><p>The mains are charged the first weekend of April once frost risk passes.</p></section>
<section hidden="until-found"><h2>Why is my pressure low?</h2><p>Shared spurs drop on warm evenings; fill butts at midday instead.</p></section>
<section><h2>Can I fit a timer?</h2><p>Battery timers are fine; fixed plumbing needs the committee's sign-off.</p></section>
</div>
</body></html>""", [
        "Allotment water FAQ",
        "When do the taps open?",
        "The mains are charged the first weekend of April once frost risk passes.",
        "Can I fit a timer?",
        "Battery timers are fine; fixed plumbing needs the committee's sign-off.",
    ]),

    ("board-minutes", """<html><body>
<main>
<h1>Harbor board minutes, 12 May</h1>
<p>Present: <b>Aldersen</b> (chair), <b>Brandt</b>, <b>Covas</b>; apologies from <b>Dahl</b>.</p>
<ol>
<li>The April minutes were approved without amendment.</li>
<li>Motion to resurface the east ramp
<ol><li>carried, five votes to one,</li><li>with works scheduled after the regatta.</li></ol>
The chair thanked the volunteer crew for the patching done in April.</li>
<li>The crane inspection report was noted; follow-up in September.</li>
</ol>
<p>The meeting closed at 21:10.</p>
</main>
</body></html>""", [
        "Harbor board minutes, 12 May",
        "Present: Aldersen (chair), Brandt, Covas; apologies from Dahl.",
        "The April minutes were approved without amendment.",
        "Motion to resurface the east ramp",
        "carried, five votes to one,",
        "with works scheduled after the regatta.",
        "The chair thanked the volunteer crew for the patching done in April.",
        "The crane inspection report was noted; follow-up in September.",
        "The meeting closed at 21:10.",
    ]),

    # ---- round-6 tenth batch: the NEAR-EMPTY behavior class — pages whose
    # correct extraction is (almost) nothing. A sitemap whose all-anchor
    # lists die by link density leaving only the heading; a login page
    # whose single wrapper div carries the "login" discard keyword, so the
    # WHOLE page extracts to the empty string (n_lines 0 — the oracle's
    # empty-text branch); a two-line unsubscribe confirmation; and an
    # hr-separated print checklist (hr flushes, emits nothing itself).

    ("sitemap-links", """<html><body>
<h1>Site map</h1>
<ul>
<li><a href="/news">News</a></li>
<li><a href="/harbor">Harbor information</a></li>
<li><a href="/tides">Tide tables</a></li>
<li><a href="/contact">Contact the office</a></li>
</ul>
<ul>
<li><a href="/archive/2023">2023 archive</a></li>
<li><a href="/archive/2022">2022 archive</a></li>
</ul>
</body></html>""", [
        "Site map",
    ]),

    ("login-page", """<html><body>
<div class="login-box"><h1>Member sign-in</h1>
<form action="/session"><label>Email</label><input type="email"><label>Password</label><input type="password"><button>Sign in</button></form>
<p class="help">Accounts are created by the harbor office; call during opening hours if you are locked out.</p>
</div>
</body></html>""", []),

    ("unsubscribe-confirm", """<html><body>
<main>
<h1>You are unsubscribed</h1>
<p>The weekly digest will stop within two issues; transactional mail about your booking continues.</p>
</main>
</body></html>""", [
        "You are unsubscribed",
        "The weekly digest will stop within two issues; transactional mail about your booking continues.",
    ]),

    ("print-checklist", """<html><body class="print">
<h1>Mushroom foray checklist</h1>
<hr>
<p>Carry a basket, not a plastic bag; spores travel and the caps keep their shape.</p>
<hr>
<p>Cut one specimen per cluster and leave the young ones standing.</p>
<hr>
<p>When in doubt, photograph the gills and ask at the Sunday table.</p>
</body></html>""", [
        "Mushroom foray checklist",
        "Carry a basket, not a plastic bag; spores travel and the caps keep their shape.",
        "Cut one specimen per cluster and leave the young ones standing.",
        "When in doubt, photograph the gills and ask at the Sunday table.",
    ]),
]

# ---- round-6 third batch: non-UTF-8 bytes through the decode-or-drop path.
# (name, html_unicode, golden_lines, encoding, bom) — the page bytes are
# html.encode(encoding) with an optional BOM prefix, exercising
# WarcParser.decodeHtml end to end (warc.py:117-129 analogue): BOM wins,
# then strict UTF-8, then the in-body meta-charset sniff, then the
# windows-1252 single-byte fallback. Goldens are hand-derived over the
# DECODED unicode, same discipline as the rest of this file.
PAGES_ENC = [
    # windows-1252 legacy page with NO meta charset and no header help:
    # strict UTF-8 fails on the 0xE9/0x92 bytes, no meta, no NULs -> the
    # deterministic cp1252 fallback decodes it.
    ("cp1252-bistro", """<html><head><title>Bistro du port</title></head><body>
<div class="masthead"><a href="/">Le Carnet</a><ul><li><a href="/cuisine">Cuisine</a></li></ul></div>
<article>
<h1>Une soir\u00e9e au bistro du port</h1>
<p>La carte du soir proposait une soupe \u00e0 l\u2019oignon et un plat du jour g\u00e9n\u00e9reux.</p>
<p>Le chef, arriv\u00e9 l\u2019an dernier, pr\u00e9f\u00e8re les produits de la c\u00f4te : moules, merlu, l\u00e9gumes du march\u00e9.</p>
<p>Comptez vingt euros pour un d\u00eener complet, caf\u00e9 compris.</p>
</article>
<div class="footer"><p>\u00a9 Le Carnet</p></div>
</body></html>""", [
        "Une soir\u00e9e au bistro du port",
        "La carte du soir proposait une soupe \u00e0 l\u2019oignon et un plat du jour g\u00e9n\u00e9reux.",
        "Le chef, arriv\u00e9 l\u2019an dernier, pr\u00e9f\u00e8re les produits de la c\u00f4te : moules, merlu, l\u00e9gumes du march\u00e9.",
        "Comptez vingt euros pour un d\u00eener complet, caf\u00e9 compris.",
    ], "windows-1252", b""),

    # iso-8859-2 Czech notice declaring itself via <meta charset=...>.
    ("latin2-notice", """<html><head><meta charset="iso-8859-2"><title>Ozn\u00e1men\u00ed</title></head><body>
<div class="nav-strip"><a href="/">M\u011bsto</a> <a href="/urad">\u00da\u0159ad</a></div>
<main>
<h1>Ozn\u00e1men\u00ed o uzav\u00edrce mostu</h1>
<p>Most p\u0159es \u0159eku bude od pond\u011bl\u00ed uzav\u0159en kv\u016fli oprav\u011b z\u00e1bradl\u00ed.</p>
<p>Obj\u00ed\u017e\u010fka povede p\u0159es n\u00e1ves a zp\u011bt na hlavn\u00ed silnici.</p>
<ul><li>Pr\u00e1ce za\u010d\u00ednaj\u00ed v sedm hodin r\u00e1no.</li><li>Pr\u016fjezd pro z\u00e1chrann\u00e9 vozy z\u016fst\u00e1v\u00e1 mo\u017en\u00fd.</li></ul>
</main>
<div class="footer"><p>M\u011bstsk\u00fd \u00fa\u0159ad</p></div>
</body></html>""", [
        "Ozn\u00e1men\u00ed o uzav\u00edrce mostu",
        "Most p\u0159es \u0159eku bude od pond\u011bl\u00ed uzav\u0159en kv\u016fli oprav\u011b z\u00e1bradl\u00ed.",
        "Obj\u00ed\u017e\u010fka povede p\u0159es n\u00e1ves a zp\u011bt na hlavn\u00ed silnici.",
        "Pr\u00e1ce za\u010d\u00ednaj\u00ed v sedm hodin r\u00e1no.",
        "Pr\u016fjezd pro z\u00e1chrann\u00e9 vozy z\u016fst\u00e1v\u00e1 mo\u017en\u00fd.",
    ], "iso-8859-2", b""),

    # Shift_JIS with the older http-equiv declaration form.
    ("shiftjis-guide", """<html><head><meta http-equiv="Content-Type" content="text/html; charset=shift_jis"><title>\u6848\u5185</title></head><body>
<div class="breadcrumb"><a href="/">\u30db\u30fc\u30e0</a> &gt; <a href="/guide">\u6848\u5185</a></div>
<article>
<h1>\u6e2f\u306e\u98df\u5802\u306e\u6848\u5185</h1>
<p>\u663c\u306e\u5b9a\u98df\u306f\u9b5a\u306e\u716e\u4ed8\u3051\u3068\u5473\u564c\u6c41\u3001\u5c0f\u9262\u304c\u4ed8\u304d\u307e\u3059\u3002</p>
<p>\u55b6\u696d\u6642\u9593\u306f\u5341\u4e00\u6642\u304b\u3089\u5341\u56db\u6642\u307e\u3067\u3067\u3059\u3002</p>
</article>
<div class="share-row"><a href="#">\u5171\u6709</a></div>
</body></html>""", [
        "\u6e2f\u306e\u98df\u5802\u306e\u6848\u5185",
        "\u663c\u306e\u5b9a\u98df\u306f\u9b5a\u306e\u716e\u4ed8\u3051\u3068\u5473\u564c\u6c41\u3001\u5c0f\u9262\u304c\u4ed8\u304d\u307e\u3059\u3002",
        "\u55b6\u696d\u6642\u9593\u306f\u5341\u4e00\u6642\u304b\u3089\u5341\u56db\u6642\u307e\u3067\u3067\u3059\u3002",
    ], "shift_jis", b""),

    # GBK community bulletin.
    ("gbk-bulletin", """<html><head><meta charset="gbk"><title>\u516c\u544a</title></head><body>
<div class="top-menu"><a href="/">\u9996\u9875</a><a href="/news">\u65b0\u95fb</a></div>
<main>
<h1>\u793e\u533a\u4f9b\u6c34\u68c0\u4fee\u516c\u544a</h1>
<p>\u672c\u5468\u56db\u4e0a\u5348\u4e5d\u65f6\u81f3\u4e0b\u5348\u4e09\u65f6\uff0c\u5c0f\u533a\u5c06\u8fdb\u884c\u4f9b\u6c34\u7ba1\u9053\u68c0\u4fee\uff0c\u671f\u95f4\u6682\u505c\u4f9b\u6c34\u3002</p>
<p>\u8bf7\u5404\u4f4d\u5c45\u6c11\u63d0\u524d\u50a8\u6c34\uff0c\u7ed9\u60a8\u5e26\u6765\u4e0d\u4fbf\uff0c\u656c\u8bf7\u8c05\u89e3\u3002</p>
</main>
<div class="footer"><p>\u7269\u4e1a\u670d\u52a1\u4e2d\u5fc3</p></div>
</body></html>""", [
        "\u793e\u533a\u4f9b\u6c34\u68c0\u4fee\u516c\u544a",
        "\u672c\u5468\u56db\u4e0a\u5348\u4e5d\u65f6\u81f3\u4e0b\u5348\u4e09\u65f6\uff0c\u5c0f\u533a\u5c06\u8fdb\u884c\u4f9b\u6c34\u7ba1\u9053\u68c0\u4fee\uff0c\u671f\u95f4\u6682\u505c\u4f9b\u6c34\u3002",
        "\u8bf7\u5404\u4f4d\u5c45\u6c11\u63d0\u524d\u50a8\u6c34\uff0c\u7ed9\u60a8\u5e26\u6765\u4e0d\u4fbf\uff0c\u656c\u8bf7\u8c05\u89e3\u3002",
    ], "gbk", b""),

    # KOI8-R reading-room memo.
    ("koi8-memo", """<html><head><meta charset="koi8-r"><title>\u041f\u0430\u043c\u044f\u0442\u043a\u0430</title></head><body>
<div class="sidebar"><ul><li><a href="/docs">\u0414\u043e\u043a\u0443\u043c\u0435\u043d\u0442\u044b</a></li></ul></div>
<article>
<h1>\u041f\u0430\u043c\u044f\u0442\u043a\u0430 \u0434\u043b\u044f \u0447\u0438\u0442\u0430\u0442\u0435\u043b\u0435\u0439 \u0437\u0430\u043b\u0430</h1>
<p>\u0427\u0438\u0442\u0430\u043b\u044c\u043d\u044b\u0439 \u0437\u0430\u043b \u043e\u0442\u043a\u0440\u044b\u0442 \u0441 \u0434\u0435\u0432\u044f\u0442\u0438 \u0443\u0442\u0440\u0430 \u0434\u043e \u0448\u0435\u0441\u0442\u0438 \u0432\u0435\u0447\u0435\u0440\u0430 \u043f\u043e \u0431\u0443\u0434\u043d\u044f\u043c.</p>
<p>\u0420\u0435\u0434\u043a\u0438\u0435 \u0438\u0437\u0434\u0430\u043d\u0438\u044f \u0432\u044b\u0434\u0430\u044e\u0442\u0441\u044f \u0442\u043e\u043b\u044c\u043a\u043e \u043f\u043e \u043f\u0440\u0435\u0434\u0432\u0430\u0440\u0438\u0442\u0435\u043b\u044c\u043d\u043e\u0439 \u0437\u0430\u043f\u0438\u0441\u0438.</p>
</article>
</body></html>""", [
        "\u041f\u0430\u043c\u044f\u0442\u043a\u0430 \u0434\u043b\u044f \u0447\u0438\u0442\u0430\u0442\u0435\u043b\u0435\u0439 \u0437\u0430\u043b\u0430",
        "\u0427\u0438\u0442\u0430\u043b\u044c\u043d\u044b\u0439 \u0437\u0430\u043b \u043e\u0442\u043a\u0440\u044b\u0442 \u0441 \u0434\u0435\u0432\u044f\u0442\u0438 \u0443\u0442\u0440\u0430 \u0434\u043e \u0448\u0435\u0441\u0442\u0438 \u0432\u0435\u0447\u0435\u0440\u0430 \u043f\u043e \u0431\u0443\u0434\u043d\u044f\u043c.",
        "\u0420\u0435\u0434\u043a\u0438\u0435 \u0438\u0437\u0434\u0430\u043d\u0438\u044f \u0432\u044b\u0434\u0430\u044e\u0442\u0441\u044f \u0442\u043e\u043b\u044c\u043a\u043e \u043f\u043e \u043f\u0440\u0435\u0434\u0432\u0430\u0440\u0438\u0442\u0435\u043b\u044c\u043d\u043e\u0439 \u0437\u0430\u043f\u0438\u0441\u0438.",
    ], "koi8-r", b""),

    # UTF-16LE with BOM: the BOM branch wins before any NUL heuristics
    # (ASCII-heavy UTF-16 is full of NUL bytes).
    ("utf16-press", """<html><head><title>Press note</title></head><body>
<div class="nav"><a href="/">Press room</a></div>
<main>
<h1>Ferry line adds a winter sailing</h1>
<p>The operator will add a seven o&rsquo;clock sailing from the first of December \u2014 subject to weather.</p>
<p>Tickets go on sale next Monday at the harbor office.</p>
</main>
</body></html>""", [
        "Ferry line adds a winter sailing",
        "The operator will add a seven o\u2019clock sailing from the first of December \u2014 subject to weather.",
        "Tickets go on sale next Monday at the harbor office.",
    ], "utf-16-le", b"\xff\xfe"),

    # UTF-8 with BOM: strict UTF-8 decodes, the leading U+FEFF is stripped.
    ("utf8bom-changelog", """<html><head><title>Changelog</title></head><body>
<main>
<h1>Release notes 2.4</h1>
<ul>
<li>The importer now skips rows with an empty key instead of stopping.</li>
<li>Exports include a checksum column.</li>
</ul>
<p>Upgrade by replacing the binary and restarting the service.</p>
</main>
<div class="footer-links"><a href="/old">Older releases</a></div>
</body></html>""", [
        "Release notes 2.4",
        "The importer now skips rows with an empty key instead of stopping.",
        "Exports include a checksum column.",
        "Upgrade by replacing the binary and restarting the service.",
    ], "utf-8", b"\xef\xbb\xbf"),
]

# Records that must be DROPPED by decode-or-drop (the reference's
# detect-failure `return` in warc.py:120-129): raw bytes, no golden.
DROPPED = [
    # declares an unsupported charset name and is not valid UTF-8
    ("bogus-charset-drop",
     b'<html><head><meta charset="x-unknown-9"></head><body><p>Caf\xe9 legacy page</p></body></html>'),
    # declares utf-8 but carries a stray latin-1 byte: strict decode fails
    # and the declared name offers no second chance
    ("utf8-declared-broken-drop",
     b'<html><head><meta charset="utf-8"></head><body><p>Caf\xe9 broken page</p></body></html>'),
    # served as text/html but the body is binary junk: invalid UTF-8, no
    # meta declaration, NUL bytes veto the single-byte fallback
    ("binary-nul-drop",
     b'<html><body>\xff\x00\x00PK fake zip payload\x00\x00</body></html>'),
]


def record(tpe, uri, body, rec_id):
    b = body.encode("utf-8") if isinstance(body, str) else body
    return (("WARC/1.0\r\nWARC-Type: %s\r\nWARC-Target-URI: %s\r\n"
             "WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:graft:%s>\r\n"
             "Content-Length: %d\r\n\r\n") % (tpe, uri, rec_id, len(b))).encode("utf-8") \
        + b + b"\r\n\r\n"


# Independent re-derivation of WarcParser.decodeHtml's DECISION (not its
# output) so the generator fails loudly if a page lands on the wrong branch.
def decode_branch(body):
    if body[:2] == b"\xff\xfe":
        return "bom-utf16le"
    if body[:2] == b"\xfe\xff":
        return "bom-utf16be"
    try:
        body.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    import re
    head = body[:1024].decode("iso-8859-1")
    m = re.search(r"(?i)charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", head)
    if m:
        cs = m.group(1)
        if cs.lower() == "utf-8":
            return "drop"
        # the ENGINE's supported() check is java.nio.charset; Python's codec
        # registry is a superset (hz, euc_jisx0213, ...), so gate on an
        # explicit allowlist of names verified supported by BOTH runtimes —
        # a future page declaring a Python-only charset must fail HERE, not
        # at Scala test time
        if cs.lower() in JVM_AND_PY_CHARSETS:
            return "meta:" + cs.lower()
        return "drop"
    return "drop" if b"\x00" in body else "cp1252-fallback"


# meta-declarable charsets used by PAGES_ENC, each verified supported by
# BOTH java.nio.charset.Charset.isSupported and Python codecs.lookup
JVM_AND_PY_CHARSETS = {"iso-8859-2", "shift_jis", "gbk", "koi8-r",
                       "windows-1252", "iso-8859-1", "big5", "euc-kr",
                       "euc-jp", "iso-8859-5", "iso-8859-7", "windows-1251"}


def main():
    out = record("warcinfo", "meta", "software: graft-wild-warc-transcriber", "info")
    gold_tsv = []
    oracle_rows = []

    def emit(url, body_bytes, header_charset, rec_id):
        charset_part = "; charset=%s" % header_charset if header_charset else ""
        http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html%s\r\n\r\n"
                % charset_part).encode("ascii") + body_bytes
        return record("response", url, http, rec_id)

    def golden(url, gold):
        text = "\n".join(gold)
        for ch in text:
            assert ord(ch) < 0x10000, "astral char would break n_chars parity"
        esc = text.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t")
        gold_tsv.append("%s\t%s" % (url, esc))
        md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
        n_lines = 0 if text == "" else len(gold)
        oracle_rows.append("  ('%s', %d, %d, '%s')" % (url, n_lines, len(text), md5))

    for i, (name, html, gold) in enumerate(PAGES):
        url = "https://wild.example.org/%s" % name
        out += emit(url, html.encode("utf-8"), "utf-8", "wild%d" % i)
        golden(url, gold)

    for i, (name, html, gold, enc, bom) in enumerate(PAGES_ENC):
        url = "https://wild.example.org/%s" % name
        body = bom + html.encode(enc)
        branch = decode_branch(body)
        if enc == "utf-8":
            assert branch == "utf-8", (name, branch)
        elif bom:
            assert branch.startswith("bom-"), (name, branch)
        elif enc == "windows-1252":
            assert branch == "cp1252-fallback", (name, branch)
            assert b"charset" not in body and b"\x00" not in body, name
        else:
            # the sniffed name must be exactly the encoding this page was
            # authored in — a stray earlier "charset=" mention in the first
            # 1024 bytes would sniff onto the wrong charset and fail here
            assert branch == "meta:" + enc, (name, branch)
        # the declared decode must roundtrip the authored unicode exactly
        decode_as = {"bom-utf16le": "utf-16-le", "cp1252-fallback": "windows-1252",
                     "utf-8": "utf-8"}.get(branch, branch.split(":", 1)[-1])
        stripped = body[len(bom):] if bom else body
        assert stripped.decode(decode_as) == html, name
        out += emit(url, body, None if enc == "windows-1252" else enc, "wildenc%d" % i)
        golden(url, gold)

    for i, (name, body) in enumerate(DROPPED):
        url = "https://wild.example.org/%s" % name
        assert decode_branch(body) == "drop", name
        out += emit(url, body, None, "wilddrop%d" % i)

    with open(WARC_OUT, "wb") as f:
        f.write(out)
    with open(GOLD_OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(gold_tsv) + "\n")
    n_pages = len(PAGES) + len(PAGES_ENC) + len(DROPPED)
    print("wrote %s (%d bytes, %d pages: %d goldens + %d planted drops) + %s" %
          (WARC_OUT, len(out), n_pages, len(gold_tsv), len(DROPPED), GOLD_OUT))
    print("-- oracle VALUES rows --")
    print(",\n".join(oracle_rows))


if __name__ == "__main__":
    main()
