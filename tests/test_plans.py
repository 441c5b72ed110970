"""Physical-plan assertions — the plans must be the plans we want at scale,
not merely correct: filters pushed to the parquet scan, columns pruned,
dimension joins broadcast, and no row-at-a-time Python in any oracle query.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from arxiv_crawler_spark.plans.analytics import SPARK_QUERIES, load


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    df = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id", "lang")
    p = plan_of(df)
    assert "PushedFilters" in p and "LessThan(doc_id,200)" in p.replace(" ", "")
    # projection reaches the scan: text/n_chars are not read
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" not in read_schema[0]


def test_dim_join_is_broadcast(spark, sf_dir):
    p = plan_of(SPARK_QUERIES["q04_broadcast_join"](spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_anti_join_shape(spark, sf_dir):
    p = plan_of(SPARK_QUERIES["q05_anti_join"](spark, sf_dir))
    assert "LeftAnti" in p


def test_map_side_partial_agg(spark, sf_dir):
    """The rollup must be a two-phase hash aggregate (map-side combine
    before the shuffle) — with AQE on, the pre-execution plan shows the
    partial/final HashAggregate pair; codegen happens in the final plan."""
    p = plan_of(SPARK_QUERIES["q01_pricing_summary"](spark, sf_dir), "simple")
    assert "partial_sum" in p
    assert p.count("HashAggregate") >= 2


def test_composed_pipeline_join_strategies(spark, sf_dir):
    """Round-2 composed workloads must pick the scale-right physical joins:
    small sides broadcast (valid-id semi-join, metadata, cited-set labels);
    the only nested-loop is the deliberately-broadcast KNN scoring join."""
    p40 = plan_of(SPARK_QUERIES["q40_process_citations"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in p40 and "SortMergeJoin" not in p40
    p42 = plan_of(SPARK_QUERIES["q42_semantic_search"](spark, sf_dir), "simple")
    assert p42.count("BroadcastHashJoin") >= 2  # metadata join + cited-set label join
    assert "CartesianProduct" not in p42  # KNN side is broadcast, never cartesian
    p44 = plan_of(SPARK_QUERIES["q44_paginate_cited_by"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in p44 and "SortMergeJoin" not in p44


def test_q40_no_single_partition_window(spark, sf_dir):
    """The global row index must be the bucketed-rank plan (operators/
    rank.py): no Exchange SinglePartition anywhere — a global window would
    funnel every citation row through one task at 10^10 rows."""
    p = plan_of(SPARK_QUERIES["q40_process_citations"](spark, sf_dir), "simple")
    assert "Window" in p  # the per-bucket window is still there
    assert "SinglePartition" not in p


@pytest.mark.parametrize("name", [n for n in SPARK_QUERIES if n.startswith("q")])
def test_no_row_python_in_oracle_queries(spark, sf_dir, name):
    """Every oracle-checked operator avoids ROW-AT-A-TIME Python: no
    BatchEvalPython / ArrowEvalPython (scalar UDF) nodes anywhere in the
    physical plan. Arrow-batched whole-partition transforms (MapInPandas /
    MapInArrow) are allowed where they hand entire batches to vectorized
    native code — round 7 moved exact KNN scoring (q27/q42/q70) onto one
    BLAS matmul per batch this way (optimization guide §4.2), which is the
    opposite of the per-row Python boundary this test exists to forbid."""
    p = plan_of(SPARK_QUERIES[name](spark, sf_dir), "simple")
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p


def test_lsh_near_pairs_dedup_shuffle_carries_no_vectors(spark, sf_dir):
    """The multi-table pair dedupe must exchange (id_a, id_b, cos) only —
    shuffling the two 64-float embedding payloads through the dedup would
    dominate the stage at 100-TB corpus scale. The vectors may appear only
    below the bucket join (where they are scored), never in an Exchange at
    or above the deduplicating aggregate."""
    from arxiv_crawler_spark.operators.knn import lsh_near_pairs

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    df = lsh_near_pairs(emb, threshold=0.35, n_planes=3, n_tables=6)
    p = plan_of(df, "formatted")
    # formatted mode lists each node's Output columns: the pair-dedup
    # exchange (keyed on id_a/id_b) must output scalars only — no array
    # payload. The (table, bucket) exchanges BELOW the join rightly carry
    # the vectors (that is where scoring happens).
    blocks = p.split("\n\n")
    dedup_exchanges = [
        b for b in blocks
        if b.lstrip().startswith("(") and "Exchange" in b.splitlines()[0]
        and "hashpartitioning(id_a" in b
    ]
    assert dedup_exchanges, "pair-dedup exchange not found in plan:\n" + p
    for b in dedup_exchanges:
        in_line = next(ln for ln in b.splitlines() if ln.startswith("Input"))
        assert "v#" not in in_line and "embedding" not in in_line, b


def test_jaccard_pairs_no_corpus_broadcast(spark, sf_dir):
    """The pair plan must not broadcast any corpus-derived side: the old
    shape broadcast a per-document sizes table (O(|docs|) rows — multi-GB
    at 10^9 docs); sizes now ride on the inverted-index rows and come out
    of the pair groupBy via first(). The only joins allowed are the
    inverted-index self-join, shuffled on the shingle key. A size-based
    broadcast Catalyst picks on tiny test inputs is fine — so the assert
    runs with auto-broadcast disabled, where only a *forced* hint could
    still produce a BroadcastExchange."""
    from arxiv_crawler_spark.operators.dedup import jaccard_pairs

    docs = load(spark, sf_dir, "documents").limit(300)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = jaccard_pairs(docs, id_col="doc_id", text_col="text")
        p = plan_of(df, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastHashJoin" not in p and "BroadcastExchange" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p  # the g-key self-join


@pytest.mark.parametrize("name", ["q40_process_citations", "q47_cited_by_contexts"])
def test_valid_id_semi_join_no_forced_corpus_broadcast(spark, sf_dir, name):
    """The valid-id membership side of q40/q47 is corpus-derived (every
    crawled paper's id — build_embeddings_dataset.py:85, app.py:358): a
    forced broadcast would ship a multi-GB set to every executor at a
    10^10-URL crawl. With auto-broadcast disabled, only a *forced* hint
    could still produce a BroadcastExchange — there must be none anywhere
    in the plan; the semi-join falls back to a key-shuffled join."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(SPARK_QUERIES[name](spark, sf_dir), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastHashJoin" not in p and "BroadcastExchange" not in p
    assert "LeftSemi" in p  # the membership join is still there, shuffled


def test_lm_perplexity_self_mode_tokenizes_once(spark, sf_dir):
    """Self-mode must NOT pay a second full corpus read for the model
    pass: the model's bigram counts roll up from the doc-keyed count
    table, whose exchange AQE reuses at runtime. The executed plan must
    show the stage reuse and exactly one tokenize+explode of the corpus
    (round 5 had two — a second 100-TB scan at scale)."""
    from arxiv_crawler_spark.operators.search import lm_perplexity

    df = lm_perplexity(load(spark, sf_dir, "documents"))
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    assert final.count("ReusedExchange") >= 3, final  # model bc/uc/v branches
    assert final.count("Generate explode") == 1, final


def test_dsir_and_source_kl_tokenize_once_per_input_without_persist(spark, sf_dir):
    """Round-6 leak fix: dsir_select and source_kl no longer persist()
    their count tables — every branch anchors on the same aggregate
    exchange and AQE stage reuse dedupes it at runtime. Pin the executed
    plans: dsir tokenizes exactly twice (raw pool once + target once),
    source_kl exactly once; both show the runtime reuse."""
    from arxiv_crawler_spark.operators.sampling import dsir_select, source_kl

    docs = load(spark, sf_dir, "documents")
    tgt = docs.filter(F.col("doc_id") % 7 == 0)
    d = dsir_select(docs, tgt, k=20)
    d.collect()
    final = d._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert final.count("Generate explode") == 2, final  # pool + target
    assert "ReusedExchange" in final
    assert "InMemoryTableScan" not in final  # no persist anywhere

    s = source_kl(docs, key_col="source", text_col="text", n_buckets=64)
    s.collect()
    final = s._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert final.count("Generate explode") == 1, final
    assert "ReusedExchange" in final
    assert "InMemoryTableScan" not in final


def test_incremental_lsh_bands_delta_once_without_persist(spark, sf_dir):
    """The q84 composition (index probe ∪ delta-internal pairs) must band
    the delta ONCE: the band_hash repartition — the partitioning both
    joins need anyway — is the common exchange AQE reuses; no cache."""
    p = SPARK_QUERIES["q84_incremental_lsh"](spark, sf_dir)
    p.collect()
    final = p._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # one banding Generate for the corpus index + one for the delta
    assert final.count("Generate explode") == 2, final
    assert "InMemoryTableScan" not in final


def test_temperature_sample_broadcasts_rates_not_corpus(spark, sf_dir):
    """The corpus side must reach the rates join without shuffling: with
    auto-broadcast off, the only BroadcastExchange allowed is the forced
    rates/n_min side (O(|keys|)); a SortMergeJoin would mean the 100-TB
    side shuffles on lang."""
    from arxiv_crawler_spark.operators.sampling import temperature_sample

    docs = load(spark, sf_dir, "documents")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(temperature_sample(docs, "lang", 2.0), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastHashJoin" in p          # forced rates-side broadcast
    assert "SortMergeJoin" not in p          # corpus never shuffles on lang


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark gram set must broadcast (bounded by construction);
    the corpus gram stream must not sort-merge against it."""
    from arxiv_crawler_spark.operators.dedup import decontaminate

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(decontaminate(train, bench, n=3), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_dsir_broadcasts_model_not_corpus(spark, sf_dir):
    """DSIR's only broadcasts are the bounded model sides (≤n_buckets
    log-ratio rows and two 1-row totals): with auto-broadcast off, the
    scoring join must still be the forced model-side broadcast, and no
    BroadcastExchange may carry the corpus text column — the pool's only
    shuffles are its two keyed aggregations."""
    from arxiv_crawler_spark.operators.sampling import dsir_select

    docs = load(spark, sf_dir, "documents")
    pool = docs.filter(F.col("source") != "src0")
    target = docs.filter(F.col("source") == "src0")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = dsir_select(pool, target, n_buckets=256, k=10)
        p = plan_of(df, "formatted")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastHashJoin" in p  # forced lr-side scoring join
    for b in p.split("\n\n"):
        if b.lstrip().startswith("(") and "BroadcastExchange" in b.splitlines()[0]:
            in_line = next(ln for ln in b.splitlines() if ln.strip().startswith("Input"))
            assert "text" not in in_line, b


def test_duplicate_spans_two_exchanges_hash_only(spark, sf_dir):
    """The ExactSubstr span plan must cost exactly TWO keyed exchanges —
    gram-hash occurrence window, then per-doc islands window (the span
    groupBy reuses the doc partitioning) — with no broadcast and no
    single-partition stage. The gram TEXT must never cross an exchange:
    only the 8-byte xxhash64 is shuffled, so exchange width is O(id+pos+8)
    regardless of gram length."""
    from arxiv_crawler_spark.operators.dedup import duplicate_spans

    df = duplicate_spans(load(spark, sf_dir, "documents"), n=8)
    p = plan_of(df, "simple")
    assert "BroadcastExchange" not in p and "SinglePartition" not in p
    assert p.count("Exchange") == 2
    # the projected gram column is consumed by xxhash64 below the first
    # exchange and must not appear in either exchange's output schema
    for line in p.splitlines():
        if "Exchange" in line:
            assert "_gram" not in line


def test_remove_duplicate_spans_no_extra_shuffles(spark, sf_dir):
    """The ExactSubstr removal plan must add ZERO keyed shuffles beyond
    duplicate_spans' two: the (doc,island) span groupBy, the per-doc
    collect_list groupBy, and the spans side of the corpus join all reuse
    the doc-hash partitioning. The join strategy is Catalyst's choice (no
    forced broadcast of a corpus-derived side), the cut itself is a
    row-local lambda (no SinglePartition stage anywhere), and gram text
    still never crosses an exchange."""
    from arxiv_crawler_spark.operators.dedup import remove_duplicate_spans

    df = remove_duplicate_spans(load(spark, sf_dir, "documents"), n=8)
    p = plan_of(df, "simple")
    assert "SinglePartition" not in p
    assert p.count("Exchange hashpartitioning") == 2
    for line in p.splitlines():
        if "Exchange" in line:
            assert "_gram" not in line


def test_winnow_fingerprints_single_doc_shuffle(spark, sf_dir):
    """Winnowing must cost exactly ONE keyed exchange: the doc-hash
    shuffle for the per-doc ordered window; the trailing distinct groups
    on (id, pos, hash) whose clustering the doc partitioning already
    satisfies. No broadcast, no single-partition stage."""
    from arxiv_crawler_spark.operators.dedup import winnow_fingerprints

    df = winnow_fingerprints(load(spark, sf_dir, "documents"), n=4, w=4)
    p = plan_of(df, "simple")
    assert "BroadcastExchange" not in p and "SinglePartition" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_bm25_tokenizes_once(spark, sf_dir):
    """Round 7: BM25 must pay ONE tokenize+explode pass — the corpus
    stats (which need every doc) ride a per-doc sentinel row through the
    same (id, term) count table the tf/df branches read, and AQE stage
    reuse dedupes that table's exchange at runtime (the round-6 shape
    tokenized the corpus twice)."""
    from arxiv_crawler_spark.operators.search import bm25_topk

    df = bm25_topk(load(spark, sf_dir, "documents"), ["spark", "hash", "join"], k=10)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert final.count("Generate explode") == 1, final
    assert "ReusedExchange" in final


def test_bm25_no_sort_merge_joins(spark, sf_dir):
    """df and corpus stats are tiny by construction (|query| terms / one
    row) and must broadcast into the scoring join even with size-based
    auto-broadcast off; the corpus side's only shuffle is the tf groupBy."""
    from arxiv_crawler_spark.operators.search import bm25_topk

    docs = load(spark, sf_dir, "documents")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(bm25_topk(docs, ["spark", "hash", "join"], k=10), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_hll_register_exchange_bounded(spark, sf_dir):
    """The HLL register build must be ONE keyed exchange fed by a
    map-side partial max — the exchange carries (reg, partial mj) rows,
    bounded by 256 per upstream partition, never the token stream."""
    from arxiv_crawler_spark.operators.sketches import hll_registers

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    p = plan_of(hll_registers(toks, "token", p=8), "simple")
    assert p.count("Exchange hashpartitioning") == 1
    assert "BroadcastExchange" not in p
    assert p.count("HashAggregate") == 2  # partial + final max


def test_cms_probe_broadcasts_sketch_not_stream(spark, sf_dir):
    """The CMS probe join must broadcast the ≤ d·w-row sketch side even
    with size-based auto-broadcast off (the hint is justified by the
    sketch's construction bound), and no broadcast may carry the raw
    stream's text column."""
    from arxiv_crawler_spark.operators.sketches import cms_build, cms_query

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sk = cms_build(toks, "token", d=4, w=512)
        p = plan_of(cms_query(sk, toks.distinct(), "token", d=4, w=512), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_source_kl_exchanges_carry_cells_not_text(spark, sf_dir):
    """source_kl's corpus pass must reduce to (key, bucket) cells before
    anything shuffles: no exchange input may carry the document text or
    the exploded token column. Round 6 dropped the persisted cell table
    (AQE stage reuse dedupes the shared aggregate exchange instead — see
    test_dsir_and_source_kl_tokenize_once_per_input_without_persist), so
    the plan must also be cache-free."""
    from arxiv_crawler_spark.operators.sampling import source_kl

    docs = load(spark, sf_dir, "documents")
    df = source_kl(docs, key_col="source", text_col="text", n_buckets=256)
    p = plan_of(df, "formatted")
    assert "InMemoryTableScan" not in p  # round-6 leak fix: no cached cells
    for b in p.split("\n\n"):
        first = b.splitlines()[0] if b.splitlines() else ""
        if first.lstrip().startswith("(") and "Exchange" in first:
            in_line = next(
                (ln for ln in b.splitlines() if ln.strip().startswith("Input")), ""
            )
            assert "text" not in in_line and "_t#" not in in_line, b


def test_bloom_decontaminate_broadcasts_bits_not_grams(spark, sf_dir):
    """The Bloom probe join must broadcast the position table (bounded by
    the m literal — the hint is justified by construction) even with
    size-based auto-broadcast off, and no broadcast input may carry gram
    or text strings: the corpus side streams map-side, its only shuffles
    the two post-join hit aggregates."""
    from arxiv_crawler_spark.operators.dedup import bloom_decontaminate

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(bloom_decontaminate(train, bench), "formatted")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    for b in p.split("\n\n"):
        first = b.splitlines()[0] if b.splitlines() else ""
        if first.lstrip().startswith("(") and "BroadcastExchange" in first:
            in_line = next(
                (ln for ln in b.splitlines() if ln.strip().startswith("Input")), ""
            )
            assert "text" not in in_line and "g#" not in in_line, b


def test_quantile_bins_single_bounded_exchange(spark, sf_dir):
    """quantile_bins must reduce the corpus to bin cells with one
    map-side-combined keyed exchange (≤ ~64·n_sub rows per upstream
    partition) and no broadcast; the estimate stage's window runs over
    that bounded histogram, never the data."""
    from arxiv_crawler_spark.operators.sketches import quantile_bins

    docs = load(spark, sf_dir, "documents")
    lens = docs.selectExpr("cast(length(text) as long) as x")
    p = plan_of(quantile_bins(lens, "x"), "simple")
    assert p.count("Exchange hashpartitioning") == 1
    assert "BroadcastExchange" not in p
    assert p.count("HashAggregate") == 2
