"""Sketch scale probe: HLL and CMS build throughput over a synthetic
high-cardinality token stream ~10^3× the sf0.1 bench corpus.

What it evidences (BENCH/sketch_probe_r5.json): the sketch operators'
exchanges are bounded by the sketch size — 256 register rows / ≤2048 CMS
cells — no matter how large the input stream, so build cost is one
map-side pass at scan speed. The HLL estimate's relative error against
the known true cardinality is recorded as the accuracy witness.

Usage: python scripts/sketch_probe.py [n_tokens] [n_distinct]
(defaults 100M tokens / 30M distinct; local[${SPARK_GRAFT_CPUS:-32}]).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arxiv_crawler_spark.operators.sketches import (  # noqa: E402
    cms_build,
    hll_estimate,
    hll_registers,
)
from arxiv_crawler_spark.session import get_spark  # noqa: E402


def main(n_tokens: int, n_distinct: int) -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sketch-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")},
    )
    stream = spark.range(n_tokens).select(
        F.concat(F.lit("tok"), (F.col("id") % n_distinct).cast("string")).alias("token")
    )
    stream.count()  # warm scan path / JIT

    t0 = time.monotonic()
    regs = hll_registers(stream, "token", p=8)
    n_regs = regs.count()
    hll_s = time.monotonic() - t0
    est = hll_estimate(regs, p=8).first()
    rel_err = abs(est["est_micro"] / 1e6 - n_distinct) / n_distinct

    t0 = time.monotonic()
    n_cells = cms_build(stream, "token", d=4, w=512).count()
    cms_s = time.monotonic() - t0

    # grouped HLL: 1000 keys over the same stream — the per-host
    # cardinality question; exchange bounded by |keys|·m
    from arxiv_crawler_spark.operators.sketches import hll_registers_by

    keyed = spark.range(n_tokens).select(
        F.concat(F.lit("h"), (F.col("id") % 1000).cast("string")).alias("key"),
        F.concat(F.lit("tok"), (F.col("id") % n_distinct).cast("string")).alias("token"),
    )
    t0 = time.monotonic()
    n_kregs = hll_registers_by(keyed, "key", "token", p=8).count()
    ghll_s = time.monotonic() - t0

    out = {
        "n_tokens": n_tokens,
        "n_distinct": n_distinct,
        "cores": int(cpus),
        "hll": {
            "build_sec": round(hll_s, 2),
            "tokens_per_sec": round(n_tokens / hll_s),
            "register_rows": n_regs,
            "est": est["est_micro"] / 1e6,
            "rel_err": round(rel_err, 4),
        },
        "cms": {
            "build_sec": round(cms_s, 2),
            "tokens_per_sec": round(n_tokens / cms_s),
            "cell_rows": n_cells,
        },
        "grouped_hll": {
            "n_keys": 1000,
            "build_sec": round(ghll_s, 2),
            "tokens_per_sec": round(n_tokens / ghll_s),
            "register_rows": n_kregs,
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000_000
    main(n, d)
