"""oracle/refann.py — the pure-numpy ANN oracle twins. Full value parity
with the engine is enforced by the oracle gate itself (check_oracle /
CORRECTNESS: x61/x62/x66/x68/x69/x71 hash-green at sf0.001 and sf0.01);
these tests pin the two pieces the gate exercises only implicitly."""

from __future__ import annotations

import random

from arxiv_crawler_spark.oracle import refann


def test_ann_oracles_carry_both_sf_dispatch_branches():
    """Every refann-built oracle must embed one VALUES branch per gate sf,
    keyed on the table content signature — a missing branch would make the
    oracle return 0 rows (loud rows-mismatch) at that sf instead of
    silently passing."""
    from arxiv_crawler_spark.plans.analytics import ORACLE_SQL

    emb_sigs = [refann._load(d)[2] for d in refann.GATE_SF_DIRS]
    for q in (
        "x61_knn_ivf",
        "x68_knn_pq",
        "x69_knn_ivfpq",
        "x71_semdedup_kmeans",
        "x62_semantic_search_ann",
    ):
        for s in emb_sigs:
            assert s in ORACLE_SQL[q], (q, s)
        assert refann.SIG_SQL in ORACLE_SQL[q]
    doc_sigs = [refann._load_docs(d)[2] for d in refann.GATE_SF_DIRS]
    for s in doc_sigs:
        assert s in ORACLE_SQL["x66_encode_and_search"]
    assert len(set(emb_sigs)) == 2 and len(set(doc_sigs)) == 2


def test_spark_round6_matches_engine_round(spark):
    """spark_round6 mirrors F.round(col, 6) bit-for-bit: shortest-repr
    decimal (BigDecimal.valueOf semantics) quantized HALF_UP — including
    the exact-tie cases where Python's builtin round() (half-even) would
    disagree."""
    from pyspark.sql import functions as F

    rng = random.Random(7)
    vals = [rng.uniform(-1, 1) for _ in range(200)] + [
        0.0, 1.0, -1.0, 5e-07, -5e-07, 0.0000015, -0.9999995, 0.1234565
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double").coalesce(1)
    got = [r["r"] for r in df.select(F.round("v", 6).alias("r")).collect()]
    exp = [refann.spark_round6(v) for v in vals]
    assert got == exp
