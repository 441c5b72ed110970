"""Canonicalization parity tests.

Oddball arXiv-id cases pinned against the reference semantics of
normalize_arxiv_id (arxiv_util.py:16-23).
"""

import pytest
from pyspark.sql import functions as F

from arxiv_crawler_spark.functions.urls import (
    arxiv_id_to_url,
    canonicalize_url,
    host_of,
    normalize_arxiv_id_col,
)


def _run(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["u"])
    return [r[0] for r in df.select(fn(F.col("u"))).collect()]


CANON_CASES = [
    ("HTTPS://ArXiv.org/abs/2004.10934v3", "https://arxiv.org/abs/2004.10934"),
    ("http://example.com:80/a/b/", "http://example.com/a/b"),
    ("https://Example.COM:443/", "https://example.com/"),
    ("https://example.com:8080/x", "https://example.com:8080/x"),
    ("https://example.com/x?b=2&a=1#frag", "https://example.com/x?a=1&b=2"),
    ("  https://example.com  ", "https://example.com/"),
    ("https://host7.example/doc/42", "https://host7.example/doc/42"),
    ("https://example.com/path/v2x", "https://example.com/path/v2x"),  # not an /abs/ path
    ("https://arxiv.org/abs/2004.10934", "https://arxiv.org/abs/2004.10934"),
]


def test_canonicalize_url(spark):
    got = _run(spark, canonicalize_url, [c[0] for c in CANON_CASES])
    for (inp, want), g in zip(CANON_CASES, got):
        assert g == want, f"{inp!r}: {g!r} != {want!r}"


def test_canonicalize_idempotent(spark):
    once = _run(spark, canonicalize_url, [c[0] for c in CANON_CASES])
    twice = _run(spark, canonicalize_url, once)
    assert once == twice


ARXIV_ID_CASES = [
    ("2004.10934v3", "2004.10934"),
    ("2004.10934", "2004.10934"),
    ("1902.05509v12", "1902.05509"),
    ("9912345", "9912345"),  # legacy 7-digit, no v
]


def test_normalize_arxiv_id(spark):
    got = _run(spark, normalize_arxiv_id_col, [c[0] for c in ARXIV_ID_CASES])
    for (inp, want), g in zip(ARXIV_ID_CASES, got):
        assert g == want, f"{inp!r}: {g!r} != {want!r}"


def test_arxiv_id_to_url(spark):
    got = _run(spark, arxiv_id_to_url, ["2004.10934v3"])
    assert got == ["https://arxiv.org/abs/2004.10934"]


def test_host_of(spark):
    cases = [
        ("https://ArXiv.org/abs/1", "arxiv.org"),
        ("http://host3.example:8080/x", "host3.example"),
        ("https://a.b.c/?q=1", "a.b.c"),
    ]
    got = _run(spark, host_of, [c[0] for c in cases])
    assert got == [c[1] for c in cases]


from hypothesis import given, settings
from hypothesis import strategies as st


_hosts = st.sampled_from(["Example.COM", "arxiv.org", "Host3.Example", "a.b.c.d"])
_paths = st.lists(
    st.text(alphabet="abcdefXYZ019._-", min_size=1, max_size=8), max_size=4
).map(lambda parts: "/" + "/".join(parts))
_queries = st.lists(
    st.tuples(st.sampled_from("abcz"), st.integers(0, 99)), max_size=4
).map(lambda kv: "&".join(f"{k}={v}" for k, v in kv))


@settings(max_examples=30, deadline=None)
@given(
    scheme=st.sampled_from(["http", "HTTPS", "https"]),
    host=_hosts,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=_paths,
    query=_queries,
    frag=st.sampled_from(["", "#x", "#frag/y"]),
)
def test_canonicalize_idempotent_property(spark, scheme, host, port, path, query, frag):
    url = f"{scheme}://{host}{port}{path}"
    if query:
        url += f"?{query}"
    url += frag
    df = spark.createDataFrame([(url,)], ["u"])
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    row1 = once.collect()[0]["c"]
    row2 = once.select(canonicalize_url(F.col("c"))).collect()[0][0]
    assert row1 == row2, f"not idempotent for {url!r}: {row1!r} → {row2!r}"
    assert "#" not in row1 and row1 == row1.strip()
