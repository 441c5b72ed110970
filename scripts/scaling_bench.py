"""Scaling-evidence protocol (BASELINE.md §c): run the same bench job via
spark-submit at two parallelism levels (local[2] = N cores, local[8] = 4N
cores — both below the single socket's memory-bandwidth ceiling, the regime
that models adding executors on a multi-node cluster) on identical
input/configs, and write BENCH/BASELINE.generated.md with both throughputs
and the scaling efficiency T(4N)/(4·T(N)). The curated analysis lives in
BENCH/BASELINE.md (this script never overwrites it).

Usage: python scripts/scaling_bench.py [--docs N] [--wave K] [--n 2] [--n4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, docs: int, sf_dir: str, wave: int, rounds: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_MASTER": f"local[{cores}]",
            "SPARK_GRAFT_CPUS": str(cores),
            "BENCH_CRAWL_DOCS": str(docs),
            "BENCH_WAVE": str(wave),
            "BENCH_ROUNDS": str(rounds),
            "BENCH_WARMUP": env.get("BENCH_WARMUP", "1"),
            "BENCH_MODE": "single",
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_DRIVER_MEM": env.get("SPARK_GRAFT_DRIVER_MEM", "56g"),
        }
    )
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        # builder-side spark.driver.memory is ineffective under spark-submit
        # (the JVM already exists) — the flag is the only path that works
        "--driver-memory",
        env["SPARK_GRAFT_DRIVER_MEM"],
        "--conf",
        f"spark.sql.shuffle.partitions={cores}",
        "--py-files",
        _zip_package(),
        os.path.join(REPO, "bench.py"),
    ]
    print(f"$ {' '.join(cmd)}", file=sys.stderr)
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    print(out.stdout[-3000:], file=sys.stderr)
    print(out.stderr[-3000:], file=sys.stderr)
    raise RuntimeError(f"no JSON line from bench at local[{cores}]")


def _zip_package() -> str:
    """Package the engine for spark-submit --py-files (north_rule run mode)."""
    import zipfile

    zpath = os.path.join(REPO, "BENCH", "arxiv_crawler_spark.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "arxiv_crawler_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--wave", type=int, default=120_000)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--n", type=int, default=2, help="N cores")
    ap.add_argument("--n4", type=int, default=8, help="4N cores")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    r8 = run_level(args.n, args.docs, args.sf_dir, args.wave, args.rounds)
    r32 = run_level(args.n4, args.docs, args.sf_dir, args.wave, args.rounds)
    t8, t32 = r8["crawl"]["urls_per_sec"], r32["crawl"]["urls_per_sec"]
    eff = t32 / (4 * t8)

    md = f"""# BENCH/BASELINE — measured numbers (this sandbox)

North metric: **URLs scheduled+fetched per second** through full wave-mode
crawl rounds (schedule → fetch-join → Arrow TEI extraction → Bloom+anti-join
dedupe → frontier COW merge → atomic snapshot commit), synthetic world of
{args.docs} pages, identical input and configs at both parallelism levels.

Protocol (BASELINE.md §c): a real N→4N-executor cluster is unavailable in
this sandbox; the same `spark-submit --py-files` job is run at
`--master local[{args.n}]` (N) and `--master local[{args.n4}]` (4N) with
`spark.sql.shuffle.partitions` scaled to the core count.

| level | cores | URLs/s | links/s | rounds | seconds |
|---|---|---|---|---|---|
| N  | {args.n}  | {t8} | {r8['crawl']['links_per_sec']} | {r8['crawl']['rounds']} | {r8['crawl']['seconds']} |
| 4N | {args.n4} | {t32} | {r32['crawl']['links_per_sec']} | {r32['crawl']['rounds']} | {r32['crawl']['seconds']} |

**Scaling efficiency = T(4N) / (4 × T(N)) = {eff:.3f}** (target ≥ 0.8).

Headline analytics queries at sf={r32['sf']} (seconds, 4N / N):

| query | 4N | N |
|---|---|---|
""" + "\n".join(
        f"| {q} | {r32['queries'][q]} | {r8['queries'][q]} |" for q in r32["queries"]
    ) + f"""

Spark confs: AQE on (coalesce + skew join), runtime Bloom-filter join
pruning on, Arrow pandas UDFs, shuffle partitions = core count,
`spark.sql.files.maxPartitionBytes` from `SPARK_GRAFT_MAX_PARTITION_BYTES`
(16m local default; 512m-1g recommended on real clusters).

Raw JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    out = os.path.join(REPO, "BENCH", "BASELINE.generated.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
