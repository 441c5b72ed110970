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
