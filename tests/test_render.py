"""TEI → HTML renderer (U2/F11): escape chain, citation popups, references
list, and the Arrow batch path over the synthetic pages world
(reference: tei_parser.py:54-409)."""

from arxiv_crawler_spark.extraction.render import escape_html, render_pages, render_tei
from arxiv_crawler_spark.fixtures import gen_world, spark_pages

TEI = b"""<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader>
<fileDesc><titleStmt><title>Tags &amp; "Quotes" &lt;here&gt;</title></titleStmt>
<sourceDesc><biblStruct><analytic>
<author><persName><forename>Ada</forename><surname>Lovelace</surname></persName></author>
<author><persName><forename>Alan</forename><surname>Turing</surname></persName></author>
</analytic></biblStruct></sourceDesc></fileDesc>
<profileDesc><abstract><div><p>An abstract with a &lt;tag&gt;.</p></div></abstract></profileDesc>
</teiHeader>
<text><body>
<div><head n="1">Introduction</head>
<p>We build on <ref type="bibr" target="#b0">[1]</ref> and prior art
<ref type="bibr" target="#b1">[2]</ref>.</p></div>
</body><back><div><listBibl>
<biblStruct xml:id="b0"><analytic><title level="a">Great &amp; Good</title>
<author><persName><forename>Q</forename><surname>One</surname></persName></author>
<author><persName><forename>R</forename><surname>Two</surname></persName></author>
<author><persName><forename>S</forename><surname>Three</surname></persName></author>
<idno type="arXiv">arXiv:2101.00001</idno></analytic>
<monogr><imprint><date type="published" when="2021-05-01"/></imprint></monogr></biblStruct>
<biblStruct xml:id="b1"><analytic><title level="a">No Link Paper</title></analytic>
<monogr><imprint><date type="published" when="1999"/></imprint></monogr></biblStruct>
</listBibl></div></back></text></TEI>"""


def test_escape_html_reference_chain():
    # tei_parser.py:54-62 — ampersand escaped first, then <>"'
    assert escape_html('&<>"\'') == "&amp;&lt;&gt;&quot;&#39;"
    assert escape_html("a&amp;b") == "a&amp;amp;b"  # no double-unescape smartness


def test_render_tei_core_surface():
    r = render_tei(TEI, url_builder=lambda a: f"https://arxiv.org/abs/{a}")
    assert r["title"] == 'Tags & "Quotes" <here>'
    assert r["authors"] == "Ada Lovelace, Alan Turing"
    assert "<p>An abstract with a &lt;tag&gt;.</p>" in r["abstract_html"]
    assert '<h2 id="section-1"><span class="section-num">1</span> Introduction</h2>' in r["body_html"]
    # arXiv-linked citation: anchor with popup = title — first-2-authors et al. (year)
    assert (
        '<a href="https://arxiv.org/abs/2101.00001" class="citation" data-ref-id="b0" '
        'data-popup="Great &amp; Good — Q One, R Two et al. (2021)">[1]</a>' in r["body_html"]
    )
    # unlinked citation renders as a span
    assert '<span class="citation" data-ref-id="b1"' in r["body_html"]
    assert 'data-popup="No Link Paper (1999)"' in r["body_html"]
    assert '<li id="ref-b0">' in r["references_html"]
    assert "Great &amp; Good</a>" in r["references_html"]


FIG_TEI = b"""<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader>
<fileDesc><titleStmt><title>Figures</title></titleStmt></fileDesc></teiHeader>
<text><body>
<div><head n="2">Results</head>
<p>As <ref type="figure" target="#fig_0">Figure 1</ref> and
<ref type="table" target="#tab_0">Table 1</ref> show,
<formula>E = mc^2</formula> within error.</p>
<figure xml:id="fig_0"><head>Loss &amp; accuracy</head><label>Figure 1</label>
<figDesc>Curves over epochs &amp; seeds</figDesc></figure>
<figure type="table" xml:id="tab_0"><head>Main results</head><label>Table 1</label>
<table><row><cell>model &amp; data</cell><cell>1</cell></row>
<row><cell>ours</cell><cell>2</cell></row></table></figure>
<formula>\\sum_i x_i</formula>
</div></body></text></TEI>"""


def test_render_figures_tables_formulas():
    """tei_parser.py:321-379 branches: figure placeholder + escaped caption,
    table-figure rows/cells (label unescaped in the table caption — the
    reference's quirk), MathJax block/inline delimiters, figure-ref spans."""
    r = render_tei(FIG_TEI)
    body = r["body_html"]
    # in-text refs: figure/table refs are figure-ref spans, never citations
    assert '<span class="figure-ref">Figure 1</span>' in body
    assert '<span class="figure-ref">Table 1</span>' in body
    # inline formula inside the paragraph
    assert '<span class="math-inline">\\(E = mc^2\\)</span>' in body
    # block formula at div level
    assert '<div class="math-block">\\[\\sum_i x_i\\]</div>' in body
    # regular figure: placeholder + escaped label/head caption + figDesc
    assert '<figure class="paper-figure">' in body
    assert '<div class="figure-placeholder">[Figure]</div>' in body
    assert "<strong>Figure 1</strong>: Loss &amp; accuracy" in body
    assert '<p class="figure-desc">Curves over epochs &amp; seeds</p>' in body
    # table-figure: rows/cells escaped, caption "<strong>label</strong>: head"
    assert '<figure class="table-figure">' in body
    assert '<table class="paper-table">' in body
    assert "<td>model &amp; data</td><td>1</td>" in body
    assert "<tr><td>ours</td><td>2</td></tr>" in body
    assert "<figcaption><strong>Table 1</strong>: Main results</figcaption>" in body


def test_render_pages_covers_figure_branches(spark):
    """The synthetic world now carries figures/tables/formulas — the Arrow
    path must emit every branch."""
    pages = spark_pages(spark, gen_world(n_docs=12, seed=42))
    out = render_pages(pages).collect()
    bodies = "\n".join(r["body_html"] for r in out)
    assert 'class="paper-figure"' in bodies
    assert 'class="table-figure"' in bodies
    assert 'class="paper-table"' in bodies
    assert 'class="math-inline"' in bodies
    assert 'class="math-block"' in bodies
    assert 'class="figure-ref"' in bodies


def test_render_pages_arrow_batch(spark):
    pages = spark_pages(spark, gen_world(n_docs=12, seed=42))
    out = render_pages(pages).collect()
    assert len(out) == 12
    ok = [r for r in out if r["body_html"]]
    assert ok, "no documents rendered"
    for r in ok:
        assert "<p>" in r["body_html"]
    assert any('class="citation"' in r["body_html"] for r in ok)
    assert any("references-list" in r["references_html"] for r in ok)
