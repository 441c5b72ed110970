"""Isolated-stage scaling A/B: time ONE pipeline stage (default: the
repetition gate, pipeline-v3's most expensive stage) over the probe's
synthetic corpus at n and 4n docs in a fresh session with no neighbor
caches and no output persist — the pure stage cost, separating algorithm
scaling from the probe's measurement context (cache residency, output
persist). Produced the numbers quoted in BENCH/BASELINE.md round 6:
41.8 s at 2.5M → 156.8 s at 10M = 3.75x for 4x input, vs the in-probe
4.87x; and the AQE initialPartitionNum=256 check (173.9 s at 10M —
slower, so the core-count shuffle-partition default is not a spill
bottleneck at this scale).

Usage: python scripts/stage_ab.py [n_docs=10000000] [doc_len=24]
                                  [initial_partition_num or "-"]
Runs n_docs/4 then n_docs after a 200k-doc JIT warmup; prints one JSON
line per leg plus the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def time_stage(spark, n_docs: int, doc_len: int) -> dict:
    from pipeline_v3_probe import synth_corpus

    from arxiv_crawler_spark.operators.search import repetition_signals

    docs = synth_corpus(spark, n_docs, doc_len).persist()
    docs.count()
    train = docs.filter(F.col("doc_id") % 50 != 0)
    t0 = time.time()
    rep_pass = (
        repetition_signals(train, n_top=2, n_dup=3)
        .filter(F.col("top_ngram_char_frac") <= 0.1)
        .select("doc_id")
    )
    n = train.join(rep_pass, "doc_id").count()
    dt = round(time.time() - t0, 2)
    docs.unpersist()
    return {"n_docs": n_docs, "rows": n, "sec": dt}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    ipn = sys.argv[3] if len(sys.argv) > 3 else "-"

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from arxiv_crawler_spark.session import get_spark

    extra = {}
    if ipn != "-":
        extra["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] = ipn
    spark = get_spark(app_name="stage-ab", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    time_stage(spark, 200_000, doc_len)  # JIT/python-worker warmup
    small = time_stage(spark, n_docs // 4, doc_len)
    big = time_stage(spark, n_docs, doc_len)
    print(json.dumps(small))
    print(json.dumps(big))
    print(
        json.dumps(
            {
                "ratio_4x_input": round(big["sec"] / max(small["sec"], 0.01), 2),
                "initial_partition_num": None if ipn == "-" else int(ipn),
                "cores": spark.sparkContext.defaultParallelism,
            }
        )
    )


if __name__ == "__main__":
    main()
