"""Property-based tests for the pure driver-side machinery introduced in
round 3: histogram-derived wave bounds and the robots.txt parser. No Spark
session — these run the math the plans are built from."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from arxiv_crawler_spark.crawl.frontier import (
    _HIST_CLAMP,
    _HIST_EXACT,
    hist_bounds,
    hist_total,
)
from arxiv_crawler_spark.crawl.politeness import parse_robots_txt


def _cbin(c: int) -> int:
    c = min(c, _HIST_CLAMP)
    return c if c <= _HIST_EXACT else 27 + int(math.log2(c))


def _key(phase: str, d: int, c: int) -> int:
    c = min(c, _HIST_CLAMP)
    inv = _HIST_CLAMP - c
    return d * (1 << 22) + inv if phase == "bfs" else inv * (1 << 22) + d


rows_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 1 << 23)),  # (depth, count>clamp ok)
    min_size=1,
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(rows=rows_strategy, cap=st.integers(1, 5000), nb=st.integers(2, 64),
       phase=st.sampled_from(["bfs", "citations"]))
def test_hist_bounds_invariants(rows, cap, nb, phase):
    """For ANY histogram: bounds ascend strictly, and the exact number of
    rows whose scalar key is ≤ the last bound is ≥ min(overfetch·cap, total)
    — the prefilter can never starve the wave of its top-cap rows."""
    hist = {}
    for d, c in rows:
        k = (d, _cbin(c))
        hist[k] = hist.get(k, 0) + 1
    bounds = hist_bounds(hist, phase, cap, nb)
    assert bounds, "non-empty hist must yield bounds"
    assert all(a < b for a, b in zip(bounds, bounds[1:])), "strictly ascending"
    covered = sum(1 for d, c in rows if _key(phase, d, c) <= bounds[-1])
    assert covered >= min(3 * cap, hist_total(hist))


_agent_names = st.sampled_from(["*", "graftbot", "OtherBot", "a-b.c_d"])


@settings(max_examples=150, deadline=None)
@given(text=st.text(max_size=400), agent=_agent_names)
def test_parse_robots_never_raises(text, agent):
    """robots.txt in the wild is lawless — the parser must accept anything
    and return well-typed output."""
    delay, dis = parse_robots_txt(text, agent)
    assert delay is None or isinstance(delay, float)
    assert isinstance(dis, list) and all(isinstance(p, str) and p for p in dis)


@settings(max_examples=100, deadline=None)
@given(
    groups=st.lists(
        st.tuples(
            st.lists(_agent_names, min_size=1, max_size=3, unique=True),
            st.lists(st.from_regex(r"/[A-Za-z0-9_\-/]{0,12}", fullmatch=True),
                     max_size=4),
            st.one_of(st.none(), st.floats(0.1, 60, allow_nan=False)),
        ),
        min_size=0,
        max_size=5,
    ),
    agent=st.sampled_from(["graftbot", "unlisted"]),
)
def test_parse_robots_round_trip(groups, agent):
    """Clean generated robots files round-trip: the parsed (delay, disallow)
    equals the RFC-style merge computed independently from the spec."""
    lines = ["# generated corpus file"]
    for agents, dis, delay in groups:
        for a in agents:
            lines.append(f"User-agent: {a}")
        for p in dis:
            lines.append(f"Disallow: {p}")
        if delay is not None:
            lines.append(f"Crawl-delay: {delay}")
        if not dis and delay is None:
            lines.append("Disallow:")  # keep the group header closed
        lines.append("")
    text = "\n".join(lines)

    def expect(target):
        tl = target.lower()
        chosen = [g for g in groups if tl in {a.lower() for a in g[0]}]
        if not chosen:
            chosen = [g for g in groups if "*" in g[0]]
        delay, dis = None, []
        for _, d, dl in chosen:
            dis.extend(d)
            if dl is not None:
                delay = dl
        return (delay, dis)

    assert parse_robots_txt(text, agent) == expect(agent)


# ------------------------------------------------------- XML recovery (r4)
#
# recover_xml (extraction/tei.py) must satisfy two properties on ARBITRARY
# mutations of well-formed documents: (1) its output is always well-formed
# XML (ET parses it), and (2) structure-preserving damage — deleting END
# tags only — never loses character data that lived inside the root.

import re as _re
import xml.etree.ElementTree as _ET

from arxiv_crawler_spark.extraction.tei import recover_xml


def _doc(parts: list[tuple[str, str]]) -> str:
    """Build a small nested doc from (tag, text) pairs."""
    out = ["<root>"]
    for tag, text in parts:
        out.append(f"<{tag}>{text}")
    for tag, _ in reversed(parts):
        out.append(f"</{tag}>")
    out.append("</root>")
    return "".join(out)


_tags = st.sampled_from(["div", "p", "s", "ref", "biblStruct", "title"])
_texts = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(parts=st.lists(st.tuples(_tags, _texts), min_size=1, max_size=8),
       drop=st.data())
def test_recover_xml_end_tag_deletion_keeps_all_text(parts, drop):
    doc = _doc(parts)
    # delete a random subset of END tags (Grobid-died / truncation damage)
    ends = [m.span() for m in _re.finditer(r"</[^>]+>", doc)]
    keep_mask = drop.draw(st.lists(st.booleans(), min_size=len(ends), max_size=len(ends)))
    damaged, prev = [], 0
    for (a, b), keep in zip(ends, keep_mask):
        damaged.append(doc[prev:a])
        if keep:
            damaged.append(doc[a:b])
        prev = b
    damaged.append(doc[prev:])
    repaired = recover_xml("".join(damaged).encode())
    root = _ET.fromstring(repaired)  # (1) always well-formed
    # (2) all character data survives, in document order
    want = "".join(t for _, t in parts)
    got = "".join(root.itertext())
    assert got == want


@settings(max_examples=150, deadline=None)
@given(junk=st.text(max_size=40))
def test_recover_xml_arbitrary_junk_inside_root_stays_parseable(junk):
    """Arbitrary junk (stray <, &, unterminated tags) inside a root element
    either parses after recovery or raises ParseError — never a crash of a
    different class, and never unbalanced output."""
    try:
        repaired = recover_xml(f"<root><p>{junk}</p></root>".encode())
    except _ET.ParseError:
        return
    _ET.fromstring(repaired)


# --------------------------------------------------- discovery_seq (r4)


@settings(max_examples=300, deadline=None)
@given(a=st.tuples(st.integers(0, (1 << 20) - 1), st.integers(0, 1),
                   st.integers(0, (1 << 27) - 1), st.integers(0, (1 << 14) - 1)),
       b=st.tuples(st.integers(0, (1 << 20) - 1), st.integers(0, 1),
                   st.integers(0, (1 << 27) - 1), st.integers(0, (1 << 14) - 1)))
def test_seq_encoding_is_order_isomorphic(a, b):
    """The int64 packing must order exactly like the insertion tuple
    (round, is_discovery, pop_rank-or-seed_idx, bib): seeds (is_disc=0)
    use (idx := rank<<14 | bib) as a plain low-field value. Pure-python
    mirror of the column arithmetic in crawl/frontier.py."""

    def enc(t):
        r, is_disc, rank, bib = t
        low = (is_disc << 41) | (rank << 14) | bib
        return (r << 42) | low

    ta = (a[0], a[1], a[2], a[3])
    tb = (b[0], b[1], b[2], b[3])
    assert (enc(a) < enc(b)) == (ta < tb)
    assert enc(a) < (1 << 63)  # never overflows into the sign bit
