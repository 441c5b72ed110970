"""Crawl-scale soak: many wave rounds over a ~10^6-URL world with snapshot
gc() between rounds — evidence that the tiered compaction + COW store hold
steady-state throughput over a long crawl (no monotonic per-round slowdown,
bounded on-disk store size).

Usage: python scripts/soak_bench.py  (env: SOAK_DOCS, SOAK_WAVE, SOAK_ROUNDS,
SOAK_GC_EVERY, SPARK_GRAFT_CPUS). Prints one JSON line per round plus a
summary line; the summary feeds the BENCH/BASELINE.md soak section.

Slowdown verdict: least-squares slope of per-round seconds over the
post-warmup rounds, reported as pct-of-mean per round, plus a first-half vs
second-half mean comparison (the monotonic-slowdown check).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (synth_pages)
from arxiv_crawler_spark.crawl import CrawlConfig, CrawlEngine  # noqa: E402
from arxiv_crawler_spark.fixtures import arxiv_id_of  # noqa: E402
from arxiv_crawler_spark.session import get_spark  # noqa: E402


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    n_docs = int(os.environ.get("SOAK_DOCS", "1200000"))
    wave = int(os.environ.get("SOAK_WAVE", "50000"))
    n_rounds = int(os.environ.get("SOAK_ROUNDS", "22"))
    gc_every = int(os.environ.get("SOAK_GC_EVERY", "1"))
    warmup = int(os.environ.get("SOAK_WARMUP", "2"))

    multihost = os.environ.get("SOAK_MULTIHOST", "0") == "1"

    spark = get_spark(app_name="arxiv-crawler-spark-soak")
    spark.sparkContext.setLogLevel("ERROR")

    pages = bench.synth_pages(spark, n_docs, multihost=multihost)
    pages = pages.repartition(4 * spark.sparkContext.defaultParallelism)
    pages.count()  # codegen-warm outside timing

    store_path = tempfile.mkdtemp(prefix="soak_crawl_")
    robots = None
    resolver = None
    round_seconds = 1e9  # single-host soak: politeness unconstrained
    if multihost:
        # Common-Crawl-shaped politeness soak: 8 mirror hosts, budgets that
        # BIND (sum of budgets ≈ 0.85·wave → real deferral every round) and
        # one host with a disallow prefix (robots_denied accounting). The
        # budget math: budget(h) = floor(round_seconds / crawl_delay).
        from arxiv_crawler_spark.fixtures import N_HOSTS, multihost_resolver

        resolver = multihost_resolver
        round_seconds = 8.0 * wave / 10  # default-delay hosts get wave/10 each
        rows = []
        for k in range(N_HOSTS):
            delay = 8.0 if k % 4 else 16.0  # every 4th host half-budget
            # bench world ids are 21xx.yyyyy → deny one id-prefix slice on
            # mirror1 so robots_denied accounting is exercised (~1/32 of
            # all discovered links)
            dis = ["/abs/2101"] if k == 1 else []
            rows.append((f"mirror{k}.example.org", delay, dis))
        robots = spark.createDataFrame(
            rows, "host string, crawl_delay double, disallow array<string>"
        )
    cfg = CrawlConfig(
        mode="wave",
        max_papers=n_docs,
        wave_size=wave,
        round_seconds=round_seconds,
        n_buckets=32,
        use_bloom=True,
        hash_algo="murmur64",
        exact_lineage=False,
        collect_host_lineage=multihost,  # exercise the deferral audit agg
    )
    eng = CrawlEngine(spark, store_path, pages, cfg, robots=robots, link_resolver=resolver)
    # seed the FULL 10^6-URL frontier up front: the frontier is maximal at
    # round 0 and drains by `wave` per round, so live-data work per round is
    # non-increasing by construction — any UPWARD per-round trend over the
    # soak is store-induced (delta-chain bloat, compaction debt, gc failure),
    # which is exactly what this benchmark exists to rule out. Discovered
    # links still merge count updates into the queued frontier every round
    # (the worst-case uniform-touch COW pattern).
    eng.bootstrap([arxiv_id_of(i) for i in range(n_docs)])
    # full-frontier seeding means robots filtering bites at BOOTSTRAP (every
    # url is seeded, so per-round discoveries are never new): count the
    # denied population once here; per-round robots_denied stays 0 by design
    denied_at_bootstrap = 0
    if robots is not None:
        from pyspark.sql import functions as F
        denied_at_bootstrap = (
            eng.store.seen().filter(F.col("status") == "robots_denied").count()
        )

    rows = []
    freed_total = 0
    for r in range(n_rounds):
        t0 = time.monotonic()
        res = eng.run_round()
        dt = time.monotonic() - t0
        if res is None:
            break
        g = {"bytes_freed": 0}
        if gc_every and (r + 1) % gc_every == 0:
            g = eng.store.gc()
        freed_total += g["bytes_freed"]
        row = {
            "round": r,
            "seconds": round(dt, 2),
            "urls": res.waved,
            "urls_per_sec": round(res.waved / dt, 1),
            "new_links": res.new_links,
            "frontier_size": res.frontier_size,
            "robots_denied": res.robots_denied,
            "politeness_deferred": res.politeness_deferred,
            "hosts_deferred": len(res.lineage.get("politeness_deferred_by_host", {}) or {}),
            "gc_bytes_freed": g["bytes_freed"],
            "store_bytes": du(store_path),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    timed = rows[warmup:]
    secs = [r["seconds"] for r in timed]
    xs = list(range(len(secs)))
    n = len(secs)
    mx, my = sum(xs) / n, sum(secs) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, secs)) / max(
        1e-9, sum((x - mx) ** 2 for x in xs)
    )
    half = max(1, n // 2)  # guard the degenerate 1-timed-round smoke case
    first, second = secs[:half], secs[half:] or secs[:half]
    summary = {
        "soak": {
            "n_docs": n_docs,
            "wave": wave,
            "rounds_run": len(rows),
            "warmup_excluded": warmup,
            "total_urls": sum(r["urls"] for r in timed),
            "total_seconds": round(sum(secs), 1),
            "urls_per_sec_steady": round(sum(r["urls"] for r in timed) / sum(secs), 1),
            "sec_per_round_mean": round(my, 2),
            "sec_per_round_slope_pct_of_mean": round(100 * slope / my, 2),
            "first_half_mean_sec": round(sum(first) / len(first), 2),
            "second_half_mean_sec": round(sum(second) / len(second), 2),
            "gc_bytes_freed_total": freed_total,
            "multihost": multihost,
            "robots_denied_total": sum(r.get("robots_denied", 0) for r in rows),
            "robots_denied_at_bootstrap": denied_at_bootstrap,
            "politeness_deferred_total": sum(r.get("politeness_deferred", 0) for r in rows),
            "final_store_bytes": rows[-1]["store_bytes"],
            "master": spark.sparkContext.master,
        }
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
