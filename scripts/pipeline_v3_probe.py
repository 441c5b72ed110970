"""Scale probe for the composed curation pipeline v3 (plans/analytics
q85): does the seven-stage plan — repetition gate → decontamination →
exact dedup → ExactSubstr span removal → PII redaction → temperature
sampling → sequence packing — stay LINEAR when the corpus grows?

Corpus: deterministic, synthesized entirely JVM-side (spark.range → token
arrays; no external data, no Python row work). Every stage gets real prey
planted by residue class on the effective doc id (dup docs copy their
predecessor's text, so exact_dedup fires on byte-identical pairs):

* eff % 37 == 2  — pure repeated-token spam (fails the repetition gate)
* eff % 4  == 0  — an 8-token boilerplate run at offset 8 (ExactSubstr)
* eff % 50 == 0  — the benchmark split (q85's own rule) with a 3-token
                   marker block; eff % 23 == 7 train docs embed the block
                   of bench doc ((eff*31) % n) - ((eff*31) % n) % 50
                   (decontamination prey)
* eff % 10 == 6  — a trailing e-mail token (PII prey)
* d   % 7  == 3  — eff = d-1: an exact duplicate of the previous doc

The probe times each stage in isolation (inputs persisted so a stage's
clock doesn't re-run its upstream) AND runs the SHIPPED q85 end-to-end
over the same corpus written as documents.parquet — the audit row the
driver hash-checks at sf0.01 is exactly what comes back here at scale.

Linearity evidence: run back-to-back at n and 4n (default 2.5M / 10M
docs) and compare per-stage ratios — no stage may grow super-linearly
(ratio ≫ 4 ⇒ a quadratic crept in). Results land in
BENCH/pipeline_v3_probe_r6.json.

Usage: python scripts/pipeline_v3_probe.py [n_docs] [doc_len] [out.json]
       (runs n_docs/4 first, then n_docs)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def synth_corpus(spark, n_docs: int, doc_len: int):
    d = F.col("doc_id")
    eff = F.when(d % 7 == 3, d - 1).otherwise(d)
    bench_target = (eff * 31) % n_docs - ((eff * 31) % n_docs) % 50

    def tok(j):
        uniq = F.concat(F.lit("u"), (eff * doc_len + j).cast("string"))
        return (
            F.when(eff % 37 == 2, F.lit("z"))
            .when((eff % 4 == 0) & (eff % 50 != 0) & (j >= 8) & (j < 16),
                  # bench docs must NOT carry the boilerplate run, or
                  # decontamination kills every ExactSubstr-prey doc
                  # before the span stage can see one
                  F.concat(F.lit("bp"), j.cast("string")))
            .when((eff % 50 == 0) & (j >= 2) & (j < 5),
                  F.concat(F.lit("bb"), eff.cast("string"), F.lit("_"), j.cast("string")))
            .when((eff % 23 == 7) & (j >= 2) & (j < 5),
                  F.concat(F.lit("bb"), bench_target.cast("string"), F.lit("_"), j.cast("string")))
            .when((eff % 10 == 6) & (j == doc_len - 1),
                  F.concat(F.lit("alice"), eff.cast("string"), F.lit("@example.com")))
            .otherwise(uniq)
        )

    cores = spark.sparkContext.defaultParallelism
    return (
        spark.range(n_docs)
        .repartition(cores * 2)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(F.sequence(F.lit(0), F.lit(doc_len - 1)), tok), " "
            ).alias("text"),
            F.when(F.col("id") % 20 < 12, "en")
            .when(F.col("id") % 20 < 16, "de")
            .when(F.col("id") % 20 < 19, "fr")
            .otherwise("sw")
            .alias("lang"),
        )
    )


def run_one(spark, n_docs: int, doc_len: int) -> dict:
    from arxiv_crawler_spark.functions import text as TX
    from arxiv_crawler_spark.operators.dedup import (
        decontaminate,
        exact_dedup,
        remove_duplicate_spans,
    )
    from arxiv_crawler_spark.operators.sampling import pack_sequences, temperature_sample
    from arxiv_crawler_spark.operators.search import repetition_signals
    from arxiv_crawler_spark.plans.analytics import q85_pipeline_v3

    stages: dict[str, dict] = {}
    cached = []

    def step(name, df, agg=None):
        t0 = time.time()
        df = df.persist()
        n = df.count()
        stages[name] = {"rows": n, "sec": round(time.time() - t0, 2)}
        # Each stage consumes only its predecessor (docs is kept for the
        # bench/train branches and the final parquet write). Releasing the
        # grandparent keeps the cache footprint at ~2 stages instead of 8 —
        # holding all of them caused eviction/GC pressure that inflated the
        # big-leg stage ratios ~1.5x in the first probe run.
        if len(cached) >= 2:
            cached.pop(1).unpersist()
        cached.append(df)
        return df

    docs = step("synth", synth_corpus(spark, n_docs, doc_len))
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)

    # the exact q85 stage chain, one timed action per stage
    rep_pass = (
        repetition_signals(train, n_top=2, n_dup=3)
        .filter(F.col("top_ngram_char_frac") <= 0.1)
        .select("doc_id")
    )
    gated = step("repetition_gate", train.join(rep_pass, "doc_id"))
    contaminated = decontaminate(gated, bench, n=3).select("doc_id")
    clean = step("decontaminate", gated.join(contaminated, "doc_id", "left_anti"))
    keepers = exact_dedup(clean).select(F.col("keeper_id").alias("doc_id"))
    deduped = step("exact_dedup", clean.join(keepers, "doc_id"))
    cut = step(
        "exactsubstr_cut",
        remove_duplicate_spans(deduped, n=8).join(
            deduped.select("doc_id", "lang"), "doc_id"
        ),
    )
    red = step(
        "pii_redact",
        cut.select(
            "doc_id", "lang", "n_removed",
            TX.redact_pii(F.col("text")).alias("text"),
            *TX.pii_counts(F.col("text")),
        ),
    )
    sampled = step(
        "temperature_sample",
        red.join(temperature_sample(red, "lang", 2.0, seed=42).select("doc_id"), "doc_id"),
    )
    t0 = time.time()
    packed = pack_sequences(sampled, budget_tokens=512, n_buckets=8)
    n_seqs = packed.count()
    stages["pack_sequences"] = {"rows": n_seqs, "sec": round(time.time() - t0, 2)}

    # sanity: every stage actually bit
    assert stages["repetition_gate"]["rows"] < stages["synth"]["rows"]
    assert stages["decontaminate"]["rows"] < stages["repetition_gate"]["rows"]
    assert stages["exact_dedup"]["rows"] < stages["decontaminate"]["rows"]
    assert stages["temperature_sample"]["rows"] < stages["exact_dedup"]["rows"]
    assert n_seqs > 0

    # end-to-end: the SHIPPED q85 over the same corpus as a parquet table
    tmp = tempfile.mkdtemp(prefix="pipe_v3_probe_")
    docs.write.parquet(f"{tmp}/documents.parquet", mode="overwrite")
    for df in cached:
        df.unpersist()
    t0 = time.time()
    audit = q85_pipeline_v3(spark, tmp).collect()[0].asDict()
    e2e = time.time() - t0
    shutil.rmtree(tmp, ignore_errors=True)

    # every surgery stage must have actually bitten in the composed run
    assert audit["n_span_tokens_removed"] > 0, audit
    assert audit["n_pii_redacted"] > 0, audit
    assert 0 < audit["n_contaminated"] < audit["n_repetition_pass"], audit

    total_tokens = n_docs * doc_len
    return {
        "n_docs": n_docs,
        "doc_len": doc_len,
        "total_tokens": total_tokens,
        "stages": stages,
        "q85_end_to_end_sec": round(e2e, 2),
        "q85_tokens_per_sec": round(total_tokens / e2e),
        "q85_audit": {k: int(v) for k, v in audit.items()},
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH/pipeline_v3_probe_r6.json"

    from arxiv_crawler_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="pipeline-v3-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # JIT/python-worker warmup so the small leg's stage clocks aren't
    # dominated by first-use compilation (same convention as bench.py)
    run_one(spark, max(n_docs // 100, 2000), doc_len)

    small = run_one(spark, n_docs // 4, doc_len)
    big = run_one(spark, n_docs, doc_len)
    ratios = {
        k: round(big["stages"][k]["sec"] / max(small["stages"][k]["sec"], 0.01), 2)
        for k in big["stages"]
    }
    ratios["q85_end_to_end"] = round(
        big["q85_end_to_end_sec"] / max(small["q85_end_to_end_sec"], 0.01), 2
    )
    result = {
        "metric": "pipeline_v3 (q85) stage scaling, n vs 4n docs",
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
