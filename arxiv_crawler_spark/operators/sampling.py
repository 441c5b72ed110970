"""Corpus mixing and training-prep operators: temperature sampling,
sequence packing, budgeted selection, and DSIR importance resampling.

The last mile between a curated 100-TB corpus and a training run:
rebalance the source/language mix (temperature sampling, the multilingual
recipe of mBERT/XLM-R/PaLM) and pack variable-length documents into
fixed-token-budget shards (the concatenate-and-chunk data prep of
GPT-style training). The reference stops at crawl+extract
(crawler.py:243-263); these compose downstream of its corpus.

Both are fully deterministic (md5-derived acceptance hashes, hash-bucketed
packing order) so a SQL oracle can mirror them bit-for-bit, and both keep
the 100-TB side shuffle-light: sampling is one small per-key aggregate
broadcast back over a scan-fused filter; packing shuffles each document
once into its pack bucket and runs an O(bucket) window inside each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arxiv_crawler_spark.functions.hashing import md5_hash64
from arxiv_crawler_spark.functions.text import (
    position_grams,
    quality_score,
    token_count,
    tokens,
)

__all__ = [
    "temperature_sample",
    "pack_sequences",
    "select_token_budget",
    "dsir_select",
    "chunk_documents",
    "source_kl",
]


def temperature_sample(
    df: DataFrame,
    key_col: str = "lang",
    temperature: float = 2.0,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic temperature-based corpus rebalancing: subsample so the
    key distribution moves from the natural q_k toward q_k^(1/T)
    (T > 1 flattens — downsample head keys, keep tail keys whole).

    Realized by per-key acceptance rates a_k = (n_min / n_k)^(1 - 1/T),
    normalized so the rarest key keeps everything (subsampling only, no
    duplication). A document survives iff
    md5_hash64(id || '#seed') % 1e6 < floor(round(a_k, 6) * 1e6) — a pure
    column predicate, reproducible anywhere md5 exists.

    Returns surviving rows: (doc_id, key, rate). Scale shape: one
    small groupBy(key) count (|keys| = languages/sources, bounded), its
    min as a scalar, the rates broadcast back; the corpus side is a single
    scan-fused filter — no corpus-sized shuffle at all.
    """
    exp = 1.0 - 1.0 / temperature
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_nk"))
    nmin = counts.agg(F.min("_nk").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        key_col,
        F.round(
            F.pow(F.col("_nmin").cast("double") / F.col("_nk"), F.lit(exp)), 6
        ).alias("rate"),
    )
    probe = F.pmod(
        md5_hash64(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))),
        F.lit(1_000_000),
    )
    return (
        df.join(F.broadcast(rates), key_col)
        .filter(probe < F.floor(F.col("rate") * 1_000_000))
        .select(id_col, key_col, "rate")
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 512,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: assign each document a
    (bucket, pack_id, start_offset) as if the bucket's documents were
    concatenated in doc-id order and split every ``budget_tokens`` tokens
    — (doc_id, bucket, n_tokens, start_offset, pack_id).

    ``bucket = md5_hash64(id) % n_buckets`` shards the corpus so packing
    is embarrassingly parallel (at 100 TB n_buckets ≈ shard count and each
    bucket's window cumsum runs within one partition after a single keyed
    shuffle); pack_id = start_offset // budget is the GPT-style streaming
    chunk index within the bucket.
    """
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            F.pmod(md5_hash64(F.col(id_col).cast("string")), F.lit(n_buckets))
            .cast("int")
            .alias("bucket"),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
        )
        .withColumn(
            "pack_id", F.floor(F.col("start_offset") / F.lit(budget_tokens)).cast("long")
        )
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    k: int = 100,
    alpha: float = 1.0,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): pick the ``k`` raw-pool documents that look most like
    ``target``, by hashed-n-gram importance weights + Gumbel top-k.

    Feature space: unigrams + space-joined bigrams (the corpus-wide
    ``position_grams`` convention), each hashed into one of ``n_buckets``
    buckets via the DuckDB-reproducible md5 bridge. Fit add-``alpha``
    bucket distributions p̂ (target) and q̂ (raw pool); a document's log
    importance weight is Σ over its gram occurrences of
    ln(p̂[b]) − ln(q̂[b]). Sampling-without-replacement ∝ w is the Gumbel
    trick: key = ln w + Gumbel(0,1), take the k largest.

    Everything is exact-integer past the per-bucket model: the bucket
    log-ratios are fixed-pointed to micro-units (round ×1e6 → BIGINT,
    the repo's cross-engine float contract applied once per bucket), so
    per-document weights are *integer sums* — immune to float summation
    order across engines — and the Gumbel noise is derived from
    md5(id#seed) the same way q76's acceptance test is. Documents with no
    tokens have no grams and are unscoreable → dropped (DSIR cannot rank
    them).

    Returns the k rows with the largest ``sample_key``
    (ties → lower id first): (id, logw_micro, sample_key).

    Scale shape (100-TB raw pool): ONE tokenize+explode pass over the
    pool, reduced immediately to (id, bucket, cnt) with map-side partial
    aggregation; the raw bucket marginals are a rollup of that table, the
    target marginals one aggregate of the (curated, small) target stream.
    The model is ≤ ``n_buckets`` rows — a bounded constant — broadcast
    into the scoring join, so scoring is map-side; the only corpus-keyed
    shuffle is the per-document weight reduction, and the final top-k is
    Spark's TakeOrdered (no global sort materialization).
    """

    def gram_buckets(frame: DataFrame, keep_id: bool) -> DataFrame:
        grams = F.concat(
            tokens(F.col(text_col)), position_grams(F.col(text_col), 2)
        )
        cols = [F.col(id_col)] if keep_id else []
        return frame.select(*cols, F.explode(grams).alias("_g")).select(
            *([id_col] if keep_id else []),
            F.pmod(md5_hash64(F.col("_g")), F.lit(n_buckets))
            .cast("int")
            .alias("_bucket"),
        ).filter(F.col("_bucket").isNotNull())
        # ^ always true (_g comes out of explode): keeps the joined and
        # standalone branches' constraints identical so AQE reuses the
        # count-table exchanges instead of re-tokenizing per branch

    # raw pool: one pass → (id, bucket, cnt); bucket marginals roll up
    # from it instead of paying a second corpus scan. No persist: the
    # marginal and scoring branches share this aggregate's exchange, so
    # AQE's runtime stage reuse computes it once per action without
    # holding executor memory across actions (round-6 leak fix).
    db = (
        gram_buckets(df, keep_id=True)
        .groupBy(id_col, "_bucket")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    raw_counts = db.groupBy("_bucket").agg(F.sum("_cnt").alias("_cr"))
    tgt_counts = (
        gram_buckets(target, keep_id=False)
        .groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("_ct"))
    )
    # the >= 1 filters are always true (counts are positive); they pin
    # the total rollups onto the marginal tables' subtrees — without them
    # the optimizer collapses sum-of-sum straight onto the raw streams,
    # paying a second tokenize pass per total (round-6 AQE-reuse fix)
    raw_total = raw_counts.filter(F.col("_cr") >= 1).agg(F.sum("_cr").alias("_nr"))
    tgt_total = tgt_counts.filter(F.col("_ct") >= 1).agg(
        F.coalesce(F.sum("_ct"), F.lit(0)).alias("_nt")
    )

    # per-bucket smoothed log-likelihood ratio, fixed-pointed once; only
    # buckets the raw pool touches can contribute to a raw doc's weight
    denom = float(alpha) * n_buckets
    lr = (
        raw_counts.join(tgt_counts, "_bucket", "left")
        .crossJoin(F.broadcast(raw_total))
        .crossJoin(F.broadcast(tgt_total))
        .select(
            "_bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(alpha))
                        / (F.col("_nt") + F.lit(denom))
                    )
                    - F.log(
                        (F.col("_cr") + F.lit(alpha)) / (F.col("_nr") + F.lit(denom))
                    )
                )
                * 1_000_000
            )
            .cast("long")
            .alias("_lrm"),
        )
    )

    u = (
        F.pmod(
            md5_hash64(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))),
            F.lit(1_000_000),
        )
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    gumbel_micro = F.round(-F.log(-F.log(u)) * 1_000_000).cast("long")
    return (
        db.join(F.broadcast(lr), "_bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("_cnt") * F.col("_lrm")).alias("logw_micro"))
        .select(
            id_col,
            "logw_micro",
            (F.col("logw_micro") + gumbel_micro).alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbins: int = 1000,
) -> DataFrame:
    """Quality-ranked corpus selection under a global token budget (the
    FineWeb-edu shape: rank every document by a quality score, keep the
    best until the budget fills) WITHOUT a global sort. Selection rule:
    order by (score desc, id asc) and keep the prefix whose running token
    sum stays ≤ ``budget_tokens`` — tokens are non-negative, so the
    prefix is exactly ``cumsum ≤ budget`` and a naive sorted-cumsum SQL
    restatement is the oracle (q87).

    Scale shape: scores are rounded to 6 decimals (the cross-engine float
    contract every quality query already uses) and histogram-binned; the
    per-bin token totals — ≤ ``nbins`` rows, a bounded driver aggregate —
    locate the cutoff bin, bins above it are selected with a scan-fused
    filter (no shuffle, no sort), and only the single cutoff bin pays an
    ordered window for the partial prefix. Bin boundaries only ROUTE rows
    (equal scores always share a bin and floor() is monotone), so the
    result is bit-identical to the global sort at any ``nbins``.
    """
    # null text scores as the empty string (0 tokens) so the prefix rule
    # stays total and the histogram sums never go NULL
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col),
        F.coalesce(F.round(quality_score(t), 6), F.lit(0.0)).alias("score"),
        F.coalesce(token_count(t).cast("long"), F.lit(0)).alias("n_tokens"),
    )
    binned = base.withColumn(
        "_bin",
        F.least(F.lit(nbins - 1), F.floor(F.col("score") * nbins)).cast("int"),
    )
    # No persist: the histogram pass and the selection pass each rescan
    # the scored corpus — two cheap scan-fused passes. Caching a
    # corpus-sized intermediate is not the 100-TB shape (it cannot fit;
    # MEMORY_AND_DISK would spill the whole corpus to executor disk), and
    # it leaked across actions in long-lived sessions (round-6 fix).
    hist = {
        int(r["_bin"]): int(r["_t"])
        for r in binned.groupBy("_bin").agg(F.sum("n_tokens").alias("_t")).collect()
    }
    running, cutoff, remainder = 0, None, 0
    for b in sorted(hist, reverse=True):
        if running + hist[b] <= budget_tokens:
            running += hist[b]
        else:
            cutoff, remainder = b, budget_tokens - running
            break
    if cutoff is None:
        return base
    full = binned.filter(F.col("_bin") > cutoff)
    w = Window.partitionBy("_bin").orderBy(F.desc("score"), F.asc(id_col))
    part = (
        binned.filter(F.col("_bin") == cutoff)
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .filter(F.col("_cum") <= remainder)
        .drop("_cum")
    )
    return full.unionByName(part).select(id_col, "score", "n_tokens")


def chunk_documents(
    df: DataFrame,
    *,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: split each document's whitespace tokens
    into windows of ``size`` tokens every ``stride`` (overlap =
    size - stride) — ``(id, chunk_idx, n_tok, chunk_text)``. The
    context-window prep step that feeds tokenize-and-pack (see
    ``pack_sequences`` for the inter-document variant).

    Empty/whitespace-only documents emit exactly one empty chunk
    (chunk_idx 0, n_tok 0) so downstream per-document accounting never
    loses rows.

    Scale shape: narrow per-row transform (tokens → posexplode of the
    start sequence → slice) — no shuffle at all; chunk rows inherit the
    input partitioning, and per-row memory is one document's token list,
    exactly what the scan already held.
    """
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(F.col("_toks")), F.lit(1)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.col("_toks"),
            F.posexplode(starts).alias("chunk_idx", "_start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size(F.slice(F.col("_toks"), F.col("_start"), size))
            .cast("long")
            .alias("n_tok"),
            F.array_join(F.slice(F.col("_toks"), F.col("_start"), size), " ").alias(
                "chunk_text"
            ),
        )
    )


def source_kl(
    df: DataFrame,
    key_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-source KL divergence from the corpus token distribution —
    the mixture diagnostic behind data-mixing work (DoReMi / Dolma
    source-weight tuning): KL(p_src ‖ p_corpus) over add-one-smoothed
    hashed-unigram distributions tells you which sources are
    distributional outliers before you pick mixture weights.

    Exact definition (what the q98 oracle replays): tokens hash into
    ``n_buckets`` via the md5-60 bridge; p̂_s[b] = (c_sb + 1)/(n_s + B),
    q̂[b] = (c_b + 1)/(n + B); KL_s = Σ over all B buckets of
    p̂_s[b]·ln(p̂_s[b]/q̂[b]). The sum splits into the buckets the corpus
    touches (a |sources|×B'-row grid) plus one closed-form remainder for
    the B−B' buckets no token hits (where both distributions sit at their
    smoothing floor) — so the full-support sum is computed without
    materializing empty cells. Each grid term is fixed-pointed to
    pico-units (round ×1e12 → BIGINT) before summation, the q90
    float-order-proof contract; ``kl_pico`` is the integer result.

    Returns (key, n_tokens, kl_pico) sorted by key.

    Scale shape: ONE tokenize+explode pass reduced map-side to
    (source, bucket, cnt) — at most |sources|·B rows on the exchange;
    corpus marginals roll up from that table; the scoring grid is
    |sources|×B' ≤ |sources|·B rows of pure arithmetic. Nothing
    corpus-sized ever shuffles.
    """
    # no persist: every branch (corpus marginals, per-key totals, the
    # grid join) shares sb's aggregate exchange — AQE stage reuse runs
    # the tokenize once per action without leaking cache (round-6 fix)
    sb = (
        df.select(
            F.col(key_col).alias("key"),
            F.explode(tokens(F.col(text_col))).alias("_t"),
        )
        .select(
            "key",
            F.pmod(md5_hash64(F.col("_t")), F.lit(n_buckets)).cast("int").alias("b"),
        )
        # always true (_t comes out of explode, so the hash never nulls):
        # keeps the grid branch's inferred join constraint identical to
        # the marginal branches so AQE can reuse sb's exchange
        .filter(F.col("b").isNotNull())
        .groupBy("key", "b")
        .agg(F.count(F.lit(1)).alias("c_sb"))
    )
    corpus_b = sb.groupBy("b").agg(F.sum("c_sb").alias("c_b"))
    totals = sb.groupBy("key").agg(F.sum("c_sb").alias("n_s"))
    corpus_tot = corpus_b.agg(
        F.sum("c_b").alias("n"), F.count(F.lit(1)).alias("b_present")
    )

    bf = float(n_buckets)
    # the cell join is null-safe on key: a NULL source key still matches
    # its own cells (and, unlike a plain equi-join, Catalyst infers no
    # isnotnull(key) filter into sb's branch that would stop the exchange
    # canonicalizing equal to the marginal branches)
    cells = sb.select(
        F.col("key").alias("_ck"), F.col("b").alias("_cbk"), "c_sb"
    )
    grid = (
        totals.crossJoin(corpus_b)
        .join(
            cells,
            F.col("key").eqNullSafe(F.col("_ck")) & (F.col("b") == F.col("_cbk")),
            "left",
        )
        .drop("_ck", "_cbk")
        .crossJoin(F.broadcast(corpus_tot))
    )
    p = (F.coalesce(F.col("c_sb"), F.lit(0)) + 1).cast("double") / (
        F.col("n_s") + F.lit(bf)
    )
    q = (F.col("c_b") + 1).cast("double") / (F.col("n") + F.lit(bf))
    term = F.round(p * F.log(p / q) * F.lit(1e12)).cast("long")
    present = grid.groupBy("key", "n_s").agg(F.sum(term).alias("_kl_present"))

    # closed-form remainder: the B - B' buckets no corpus token hits,
    # where p and q are both at the smoothing floor
    p0 = F.lit(1.0) / (F.col("n_s") + F.lit(bf))
    q0 = F.lit(1.0) / (F.col("n") + F.lit(bf))
    rem = (F.lit(n_buckets) - F.col("b_present")) * F.round(
        p0 * F.log(p0 / q0) * F.lit(1e12)
    ).cast("long")
    out = (
        present.crossJoin(F.broadcast(corpus_tot))
        .select(
            F.col("key").alias(key_col),
            F.col("n_s").alias("n_tokens"),
            (F.col("_kl_present") + rem).alias("kl_pico"),
        )
        .orderBy(key_col)
    )
    return out
