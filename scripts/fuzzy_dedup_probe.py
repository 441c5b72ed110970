"""Scale probe for the composed fuzzy-dedup pass (the q95 stage chain —
MinHash-LSH candidate pairs → exact-Jaccard verification → connected
components → min-id keeper): does the SlimPajama-shape pipeline stay
linear when the corpus grows, and does the verify stage actually kill
LSH false positives at scale?

Corpus: deterministic, synthesized JVM-side. Docs come in decades of 10
on doc id d (r = d % 10, base b = d - r, L = 32 unique tokens):

* r == 0      — the base doc of the decade
* r == 1 / 2  — near-dup variants: one token mutated (position 8 / 24) →
                3-shingle Jaccard vs base = 27/33 ≈ 0.818, v1 vs v2 =
                24/36 ≈ 0.667 — all three pairs clear the 0.5 verify bar,
                so the decade MUST come out as one 3-member cluster
                (transitively through the base even if LSH misses an edge)
* r == 3      — decoy: five tokens mutated (positions 2,8,14,20,26) →
                Jaccard vs base = 15/45 ≈ 0.333 < 0.5. At k=8/bands=4
                (r=2 rows/band) a 0.333-similar pair still band-collides
                with P ≈ 0.37, so decoys flood the candidate list — and
                the verify stage must kill every one (exact assert).
* r >= 4      — six unique singleton docs (must never appear in output)

LSH is probabilistic even on this deterministic corpus (band collision
at J=0.818 has P ≈ 0.988 per pair), so family completeness is asserted
as a fraction (≥ 0.97 expected ≈ 0.998); cluster PURITY is exact: no
cluster may mix decades, contain a decoy, or contain a singleton.

Two legs (n and 4n docs, default 2M / 8M) after a JIT warmup; per-stage
isolated timings (inputs persisted) + ratios land in
BENCH/fuzzy_dedup_probe_r6.json.

Usage: python scripts/fuzzy_dedup_probe.py [n_docs=8000000] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DOC_LEN = 32
MUT3 = (2, 8, 14, 20, 26)


def synth_corpus(spark, n_docs: int):
    d = F.col("doc_id")
    r = d % 10
    base = d - r
    owner = F.when(r <= 3, base).otherwise(d)

    def tok(j):
        uniq = F.concat(F.lit("u"), (owner * DOC_LEN + j).cast("string"))
        mut = F.concat(F.lit("m"), d.cast("string"), F.lit("_"), j.cast("string"))
        is_mut = (
            ((r == 1) & (j == 8))
            | ((r == 2) & (j == 24))
            | ((r == 3) & j.isin(*MUT3))
        )
        return F.when(is_mut, mut).otherwise(uniq)

    cores = spark.sparkContext.defaultParallelism
    return (
        spark.range(n_docs)
        .repartition(cores * 2)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(F.sequence(F.lit(0), F.lit(DOC_LEN - 1)), tok), " "
            ).alias("text"),
        )
    )


def run_one(spark, n_docs: int) -> dict:
    from arxiv_crawler_spark.operators import dedup as DD
    from arxiv_crawler_spark.operators.graph import connected_components

    stages: dict[str, dict] = {}

    def clock(name, df):
        t0 = time.time()
        df = df.persist()
        n = df.count()
        stages[name] = {"rows": n, "sec": round(time.time() - t0, 2)}
        return df

    docs = clock("synth", synth_corpus(spark, n_docs))
    pairs = clock("lsh_pairs", DD.lsh_candidate_pairs(docs, k=8, bands=4))
    sh = docs.select(F.col("doc_id").alias("id"), DD.shingles(F.col("text"), 3).alias("sh"))
    verified = clock(
        "jaccard_verify",
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .filter(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b"))
            >= 0.5
        )
        .select("id_a", "id_b"),
    )
    t0 = time.time()
    cc = connected_components(verified, "id_a", "id_b").persist()
    n_nodes = cc.count()
    stages["connected_components"] = {"rows": n_nodes, "sec": round(time.time() - t0, 2)}

    # --- quality: the verify stage must have killed every sub-threshold
    # candidate, and clusters must be decade-pure ---------------------------
    q = cc.agg(
        F.count(F.when(F.pmod(F.col("node"), 10) >= 3, 1)).alias("bad_members"),
        F.count(
            F.when(F.floor(F.col("node") / 10) != F.floor(F.col("cluster_id") / 10), 1)
        ).alias("cross_decade"),
        F.count_distinct("cluster_id").alias("n_clusters"),
    ).collect()[0]
    assert q["bad_members"] == 0, "a decoy or singleton reached the cluster output"
    assert q["cross_decade"] == 0, "a cluster mixed two decades"
    fp_killed = stages["lsh_pairs"]["rows"] - stages["jaccard_verify"]["rows"]
    assert fp_killed > 0, "no LSH false positives were generated — probe too easy"

    n_families = n_docs // 10
    complete = (
        cc.groupBy("cluster_id").count().filter(F.col("count") == 3).count()
    )
    frac = complete / n_families
    assert frac >= 0.97, f"only {frac:.4f} of planted families fully clustered"

    for df in (docs, pairs, verified, cc):
        df.unpersist()
    total = round(sum(s["sec"] for s in stages.values()), 2)
    return {
        "n_docs": n_docs,
        "stages": stages,
        "total_sec": total,
        "docs_per_sec": round(n_docs / total),
        "lsh_false_positives_killed": fp_killed,
        "n_clusters": int(q["n_clusters"]),
        "families_complete_frac": round(frac, 5),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/fuzzy_dedup_probe_r6.json"

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from arxiv_crawler_spark.session import get_spark

    spark = get_spark(app_name="fuzzy-dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    run_one(spark, max(n_docs // 100, 10_000))  # JIT warmup
    small = run_one(spark, n_docs // 4)
    big = run_one(spark, n_docs)
    ratios = {
        k: round(big["stages"][k]["sec"] / max(small["stages"][k]["sec"], 0.01), 2)
        for k in big["stages"]
    }
    ratios["total"] = round(big["total_sec"] / max(small["total_sec"], 0.01), 2)
    result = {
        "metric": "fuzzy dedup e2e (q95 stage chain) scaling, n vs 4n docs",
        "cores": spark.sparkContext.defaultParallelism,
        "small": small,
        "big": big,
        "time_ratio_4x_input": ratios,
    }
    print(json.dumps(result))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
