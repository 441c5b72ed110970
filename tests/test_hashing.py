"""Murmur3 x64 hash: numpy-vectorized impl vs pure-Python port, plus the
md5-based DuckDB-parity hash."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from arxiv_crawler_spark.functions.hashing import (
    _murmur3_x64_128_py,
    md5_hash64,
    murmur3_x64_64_np,
    url_hash,
)


def _low64_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def test_empty_string_is_zero():
    # murmur3 x64_128("") with seed 0 is the all-zero hash (no blocks, zero
    # tail, fmix64(0) == 0) — the one vector derivable by hand.
    assert murmur3_x64_64_np(pd.Series([""]))[0] == 0
    assert _murmur3_x64_128_py(b"") == (0, 0)


def test_numpy_matches_pure_python():
    vals = [
        "",
        "a",
        "https://arxiv.org/abs/2004.10934",
        "x" * 15,
        "x" * 16,
        "x" * 17,
        "x" * 31,
        "x" * 32,
        "x" * 33,
        "héllo wörld ☃",
        "\x00\x01binary-ish",
    ]
    got = murmur3_x64_64_np(pd.Series(vals))
    for v, g in zip(vals, got):
        want = _low64_signed(_murmur3_x64_128_py(v.encode("utf-8"))[0])
        assert int(g) == want, v


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100))
def test_numpy_matches_pure_python_property(s):
    got = int(murmur3_x64_64_np(pd.Series([s]))[0])
    want = _low64_signed(_murmur3_x64_128_py(s.encode("utf-8"))[0])
    assert got == want


def test_avalanche_distinct():
    vals = [f"https://host{i}.example/doc/{i}" for i in range(5000)]
    h = murmur3_x64_64_np(pd.Series(vals))
    assert len(np.unique(h)) == 5000
    # rough uniformity: both sign halves populated
    assert 0.4 < (h > 0).mean() < 0.6


def test_spark_udf_and_md5_parity(spark):
    vals = ["", "abc", "https://arxiv.org/abs/2004.10934"]
    df = spark.createDataFrame([(v,) for v in vals], ["u"])
    out = df.select(
        url_hash(F.col("u"), "murmur64").alias("m"),
        md5_hash64(F.col("u")).alias("d"),
        url_hash(F.col("u"), "xxhash64").alias("x"),
    ).collect()
    for v, row in zip(vals, out):
        assert row["m"] == _low64_signed(_murmur3_x64_128_py(v.encode())[0])
        duck = duckdb.sql(
            "select ('0x'||substr(md5(?),1,15))::BIGINT", params=[v]
        ).fetchone()[0]
        assert row["d"] == duck
        assert isinstance(row["x"], int)
