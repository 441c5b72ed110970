"""Scale probe for operators/dedup.py ExactSubstr (duplicate_spans /
remove_duplicate_spans).

Synthesizes a deterministic corpus entirely JVM-side (spark.range → token
arrays; no external data, no Python row work): ``n_docs`` documents of
``doc_len`` globally-unique tokens, with a ``run_len``-token boilerplate
run planted at a fixed offset in every 4th document. Expected output is
closed-form — exactly one span of exactly ``run_len`` tokens at the
planted offset per marked doc, nothing anywhere else — so the probe
asserts exact correctness at millions of tokens, then reports tokens/s
through the two-exchange plan plus the cleaned-corpus rebuild.

The ExactSubstr claim under test: cost is Θ(total tokens) through ONE
gram-hash exchange (8-byte hashes only) + one doc-keyed pass — the same
order as a tokenizer pass — so throughput should scale with cores. Run at
two parallelism levels for the two-cluster-size evidence:

    SPARK_GRAFT_CPUS=8  python scripts/exactsubstr_probe.py
    SPARK_GRAFT_CPUS=32 python scripts/exactsubstr_probe.py

Usage: python scripts/exactsubstr_probe.py [n_docs] [doc_len] [run_len]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    run_len = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    offset = 20  # planted run covers 1-based tokens [offset+1, offset+run_len]

    from arxiv_crawler_spark.operators.dedup import duplicate_spans, remove_duplicate_spans
    from arxiv_crawler_spark.session import get_spark

    spark = get_spark(app_name="exactsubstr-probe")
    cores = spark.sparkContext.defaultParallelism

    # token j of doc d: globally unique "u<d*doc_len+j>", except the planted
    # window in every 4th doc, which is the shared "b0..b<run_len-1>" run
    docs = (
        spark.range(n_docs)
        .repartition(cores * 2)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(doc_len - 1)),
                    lambda j: tok_at(j, doc_len, offset, run_len),
                ),
                " ",
            ).alias("text"),
        )
    )

    t0 = time.time()
    spans = duplicate_spans(docs, n=8)
    agg = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when((F.col("span_start") == offset + 1)
                     & (F.col("span_tokens") == run_len), 1).otherwise(0)).alias("n_exact"),
    ).collect()[0]
    t_detect = time.time() - t0

    expected = (n_docs + 3) // 4
    assert agg["n_spans"] == expected, (agg["n_spans"], expected)
    assert agg["n_exact"] == expected, (agg["n_exact"], expected)

    t0 = time.time()
    cut = remove_duplicate_spans(docs, n=8)
    cagg = cut.agg(
        F.sum("n_removed").alias("removed"),
        F.count(F.lit(1)).alias("n_out"),
    ).collect()[0]
    t_remove = time.time() - t0
    assert cagg["n_out"] == n_docs
    assert cagg["removed"] == expected * run_len, (cagg["removed"], expected * run_len)

    total_tokens = n_docs * doc_len
    out = {
        "probe": "exactsubstr",
        "cores": cores,
        "cpus_env": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "detect_s": round(t_detect, 2),
        "detect_tokens_per_s": round(total_tokens / t_detect),
        "remove_s": round(t_remove, 2),
        "remove_tokens_per_s": round(total_tokens / t_remove),
        "spans": int(agg["n_spans"]),
        "all_spans_exact": True,
    }
    print(json.dumps(out))
    spark.stop()


def tok_at(j, doc_len: int, offset: int, run_len: int):
    doc = F.col("doc_id")
    return F.when(
        (doc % 4 == 0) & (j >= offset) & (j < offset + run_len),
        F.concat(F.lit("b"), (j - offset).cast("string")),
    ).otherwise(F.concat(F.lit("u"), (doc * doc_len + j).cast("string")))


if __name__ == "__main__":
    main()
