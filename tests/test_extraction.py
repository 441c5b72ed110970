"""Golden extraction parity (SURVEY.md §5 t2): the mapInPandas engine
extractor must be byte-identical per url to the row-at-a-time oracle
(= the fixture ``text`` column), and structurally faithful to the
reference's comparison semantics (test_citation_extractor.py:105-168)."""

import gzip
import json

import pytest

from arxiv_crawler_spark.extraction.tei import (
    canonical_extraction_json,
    extract_citations,
    extract_pages,
)
from arxiv_crawler_spark.fixtures import gen_world, spark_pages


@pytest.fixture(scope="module")
def world_pdf():
    return gen_world(n_docs=60, seed=42)


def test_fixture_text_is_oracle_output(world_pdf):
    for _, row in world_pdf.head(10).iterrows():
        assert canonical_extraction_json(extract_citations(row["html"])) == row["text"]


def test_extraction_structure(world_pdf):
    cits = extract_citations(world_pdf.iloc[0]["html"])
    assert len(cits) >= 4
    some_arxiv = [c for c in cits.values() if c["details"]["arxiv_id"]]
    assert some_arxiv, "at least one bib entry should carry an arXiv id"
    for c in cits.values():
        d = c["details"]
        assert isinstance(d["authors"], list) and d["title"]
        assert c["references"] == sorted(c["references"])  # canonical ordering


def test_all_four_id_strategies_hit(world_pdf):
    """Across the fixture corpus every extraction strategy of
    arxiv_util.py:132-185 must fire (strategy is rotated k % 4)."""
    found = set()
    for _, row in world_pdf.iterrows():
        raw = gzip.decompress(bytes(row["html"])).decode()
        cits = extract_citations(row["html"])
        for cid, c in cits.items():
            if not c["details"]["arxiv_id"]:
                continue
            aid = c["details"]["arxiv_id"]
            if f'<idno type="arXiv">arXiv:{aid}' in raw:
                found.add(0)
            elif f"abs/{aid}</idno>" in raw:
                found.add(1)
            elif f'<ptr target="https://arxiv.org/abs/{aid}"' in raw:
                found.add(2)
            elif f"arXiv preprint arXiv:{aid}" in raw:
                found.add(3)
    assert found == {0, 1, 2, 3}


def test_byte_identical_engine_vs_oracle(spark, world_pdf):
    """The engine (Arrow-batched mapInPandas) output must equal the oracle
    text byte-for-byte, per url — BASELINE.json input_hint invariant."""
    pages = spark_pages(spark, world_pdf)
    got = {r["url"]: r for r in extract_pages(pages).collect()}
    assert len(got) == len(world_pdf)
    for _, row in world_pdf.iterrows():
        g = got[row["url"]]
        assert g["ok"]
        assert g["extracted_text"] == row["text"], row["url"]
        # structural parity of the exploded citation array
        oracle = json.loads(row["text"])
        assert [c["citation_id"] for c in g["citations"]] == list(oracle.keys())
        assert g["num_citations"] == len(oracle)


def test_malformed_html_fails_row_not_job(spark):
    import pandas as pd

    from arxiv_crawler_spark.fixtures import BASE_TS

    pdf = pd.DataFrame(
        [
            {"url": "https://x.example/bad", "warc_ts": BASE_TS, "html": b"\x00notxml",
             "text": "", "lang": "en"},
        ]
    )
    out = extract_pages(spark_pages(spark, pdf)).collect()
    assert len(out) == 1 and out[0]["ok"] is False and out[0]["num_citations"] == 0


def test_extract_pages_passthrough(spark):
    """passthrough=True must carry arbitrary input columns through the Arrow
    boundary untouched and row-aligned (the round loop's no-rejoin contract),
    flag null/invalid html as ok=False, and keep the fetch join broadcastable."""
    from pyspark.sql import functions as F

    from arxiv_crawler_spark.fixtures import gen_world, spark_pages

    pages = spark_pages(spark, gen_world(n_docs=6, seed=42))
    wave_like = pages.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.lit(3).alias("depth"),
        (F.length("url") % 7).alias("count"),
    )
    fetch = F.broadcast(wave_like).join(pages.select("url", "html"), "url", "inner")
    # one url with unparsable bytes, one with NULL html (missing page shape)
    bad = spark.createDataFrame(
        [("u-bad", 1, 0, 0, bytearray(b"\x00notxml")), ("u-null", 2, 0, 0, None)],
        "url string, url_hash long, depth int, count int, html binary",
    )
    out = extract_pages(fetch.unionByName(bad), passthrough=True)
    assert "BroadcastHashJoin" in fetch._jdf.queryExecution().executedPlan().toString()
    got = {r["url"]: r for r in out.collect()}
    assert set(out.columns) == (set(wave_like.columns) | {
        "ok", "citations", "extracted_text", "num_citations",
        "title", "authors", "abstract", "published", "categories"})
    for r in wave_like.collect():
        g = got[r["url"]]
        assert (g["url_hash"], g["depth"], g["count"]) == (r["url_hash"], 3, r["count"])
        assert g["ok"] is True and g["num_citations"] > 0
    assert got["u-bad"]["ok"] is False and got["u-null"]["ok"] is False
    assert got["u-bad"]["extracted_text"] is None


# ----------------------------------------------------------- XML recovery
#
# Recover-mode parity (arxiv_util.py:206 `etree.XMLParser(recover=True)`;
# the reference's own malformed-XML test, test_citation_extractor.py:223-261):
# each malformed document must extract BYTE-IDENTICALLY to its hand-repaired
# well-formed twin — the tree libxml2-recover produces for that input —
# instead of landing on the failure path.

_REFERENCE_MALFORMED = b"""<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
    <text>
        <body>
            <div>
                <!-- Missing closing tag will be recovered -->
                <p>Some text
            </div>
        </body>
    </text>
</TEI>"""


def test_reference_malformed_case_recovers():
    """The exact fixture of test_citation_extractor.py:240-253: partial
    results (empty dict — no listBibl), not an exception."""
    cits = extract_citations(_REFERENCE_MALFORMED)
    assert isinstance(cits, dict) and cits == {}


def _tei(body: str, bibs: str) -> bytes:
    return (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader/><text><body>'
        f"{body}</body><back><div><listBibl>{bibs}</listBibl></div></back>"
        "</text></TEI>"
    ).encode()


_BIBS = (
    '<biblStruct xml:id="b0"><analytic><title level="a">T0</title>'
    "<author><persName><forename>A</forename><surname>B</surname></persName></author>"
    '<idno type="arXiv">arXiv:2101.00001</idno></analytic>'
    '<monogr><title>Venue Zero</title><imprint><date type="published" when="2021"/>'
    "</imprint></monogr></biblStruct>"
    '<biblStruct xml:id="b1"><analytic><title level="a">T1</title></analytic>'
    "<monogr><title>Venue One</title></monogr></biblStruct>"
)
_BODY = (
    '<div><p><s>First sentence cites <ref type="bibr" target="#b0">[0]</ref>.</s>'
    '<s>Second cites <ref type="bibr" target="#b1">[1]</ref>.</s></p></div>'
)


@pytest.mark.parametrize(
    "malformed,repaired_twin",
    [
        # missing </p>: implicit close at </div> — twin is the explicit form
        (
            _tei('<div><p><s>Cites <ref type="bibr" target="#b0">[0]</ref>.</s></div>', _BIBS),
            _tei('<div><p><s>Cites <ref type="bibr" target="#b0">[0]</ref>.</s></p></div>', _BIBS),
        ),
        # stray end tag dropped
        (
            _tei(_BODY + "</span>", _BIBS),
            _tei(_BODY, _BIBS),
        ),
        # truncated mid-write (Grobid died): trailing end tags lost —
        # recovery closes all open elements, tree identical to the original
        (
            _tei(_BODY, _BIBS)[: -len(b"</listBibl></div></back></text></TEI>")],
            _tei(_BODY, _BIBS),
        ),
        # undefined entity dropped; defined ones kept
        (
            _tei(_BODY.replace("First sentence", "First &nbsp;s&amp;ntence"), _BIBS),
            _tei(_BODY.replace("First sentence", "First s&amp;ntence"), _BIBS),
        ),
        # unquoted attribute normalized
        (
            _tei(_BODY, _BIBS.replace('xml:id="b1"', "xml:id=b1")),
            _tei(_BODY, _BIBS),
        ),
        # junk after the first root element ignored
        (
            _tei(_BODY, _BIBS) + b"<oops>trailing</oops> junk",
            _tei(_BODY, _BIBS),
        ),
    ],
    ids=["missing_close", "stray_close", "truncated", "bad_entity", "unquoted_attr", "trailing_junk"],
)
def test_recovery_matches_repaired_twin(malformed, repaired_twin):
    got = canonical_extraction_json(extract_citations(malformed))
    want = canonical_extraction_json(extract_citations(repaired_twin))
    assert got == want
    assert json.loads(got)  # sanity: the bibliography actually survived


def test_recovered_rows_flow_through_engine_ok(spark):
    """End-to-end: a malformed-but-recoverable page is an ok=True extraction
    in the mapInPandas engine path (it previously became a failed pop —
    changing the crawl frontier vs the reference)."""
    import pandas as pd

    from arxiv_crawler_spark.fixtures import BASE_TS

    mal = _tei(_BODY.replace("</p>", ""), _BIBS)  # strip every </p>
    pdf = pd.DataFrame(
        [
            {"url": "https://arxiv.org/abs/2101.99999", "warc_ts": BASE_TS,
             "html": mal, "text": "", "lang": "en"},
            {"url": "https://x.example/bad", "warc_ts": BASE_TS,
             "html": b"\x00notxml", "text": "", "lang": "en"},
        ]
    )
    out = {r["url"]: r for r in extract_pages(spark_pages(spark, pdf)).collect()}
    good = out["https://arxiv.org/abs/2101.99999"]
    assert good["ok"] is True and good["num_citations"] == 2
    assert out["https://x.example/bad"]["ok"] is False  # true garbage still fails


def test_recovery_on_fixture_world_truncations():
    """End-to-end recovery on REAL fixture TEI: truncate each document at
    an arbitrary point after its listBibl closes (Grobid-died damage that
    only loses trailing end tags and body tail) — extraction must succeed;
    when the truncation point preserves the full bibliography and body, the
    result is byte-identical to the intact document."""
    world = gen_world(n_docs=8, seed=7)
    for _, row in world.iterrows():
        intact = canonical_extraction_json(extract_citations(row["html"]))
        raw = row["html"]
        if raw[:2] == b"\x1f\x8b":  # stored form is gzipped
            raw = gzip.decompress(raw)
        doc = raw.decode()
        cut = doc.rindex("</listBibl>") + len("</listBibl>")
        cits = extract_citations(doc[:cut].encode())  # drop all trailing closes
        assert canonical_extraction_json(cits) == intact
