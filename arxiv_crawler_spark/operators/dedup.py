"""Deduplication operators for web-scale corpora.

Six families, each a declarative DataFrame composition (shuffle-aware; no
Python UDFs):

* **exact**       — content-hash groupBy; first-id-wins keeper.
* **exact substring** — ExactSubstr duplicated-span detection (Lee et al.
  2021): gram-hash occurrence counting + gaps-and-islands span merge, two
  keyed shuffles, no suffix array.
* **MinHash+LSH** — shingle → k-min-hash signature → banded bucket join →
  candidate pairs verified by true Jaccard. The shuffle is on band keys
  (small), never on the full pair cross-product.
* **SimHash**     — per-token 60-bit hashes, bit-vote aggregation into a
  32-bit fingerprint; near-dups = small Hamming distance.
* **n-gram Jaccard** — exact pairwise Jaccard via an inverted-index join on
  shingles (cost ∝ Σ per-shingle df², not |docs|²).
* **embedding cosine** — see operators/knn.py.

Hash family: md5 of ``shingle || '#' || seed`` — chosen because DuckDB can
reproduce it verbatim for the correctness oracle; at production scale the
same structure runs with xxhash64 (flip ``hash_fn``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from arxiv_crawler_spark.functions.hashing import md5_hash64
from arxiv_crawler_spark.functions.text import position_grams, tokens

__all__ = [
    "shingles",
    "minhash_signature",
    "exact_dedup",
    "lsh_candidate_pairs",
    "lsh_oversized_buckets",
    "jaccard_pairs",
    "simhash32",
    "simhash64",
    "hamming32",
    "lsh_index_build",
    "lsh_index_probe",
    "simhash_near_pairs",
    "simhash64_near_pairs",
    "decontaminate",
    "bloom_bits",
    "bloom_decontaminate",
    "duplicate_span_positions",
    "duplicate_spans",
    "remove_duplicate_spans",
    "winnow_fingerprints",
    "semdedup",
    "paragraph_dedup",
    "remove_boilerplate",
]


def shingles(c: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined), distinct, empty-safe."""
    toks = tokens(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def _md5_seeded(s: Column, seed: int) -> Column:
    return F.md5(F.concat(s, F.lit(f"#{seed}")))


def minhash_signature(sh: Column, k: int = 8) -> Column:
    """k-wise min-hash signature: element i = min over shingles of
    md5(shingle || '#i') (string min — md5 hex is uniform, so lexicographic
    min is a valid min-hash)."""
    return F.array(
        *[F.array_min(F.transform(sh, lambda s: _md5_seeded(s, i))) for i in range(k)]
    )


def exact_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: (content_hash, keeper_id, dup_count)."""
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def _banded(df: DataFrame, id_col: str, text_col: str, k: int, bands: int) -> DataFrame:
    """(id, band_hash) rows: minhash signature → per-band hash keys.
    The band index is baked into the band hash so buckets join on one key."""
    rows = k // bands
    sig = df.select(
        F.col(id_col).alias("id"), minhash_signature(shingles(F.col(text_col)), k).alias("sig")
    )
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat(
                            F.lit(f"{b}:"),
                            F.array_join(F.slice(F.col("sig"), b * rows + 1, rows), ","),
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_hash"),
    )


def _cap_buckets(banded: DataFrame, max_bucket: int) -> DataFrame:
    """Drop band buckets larger than ``max_bucket`` (the 100-TB
    boilerplate guard shared by the pair join and the index probe): a
    window count on the same key the join shuffles on — AQE reuses the
    exchange, so oversized buckets never reach the join."""
    wc = Window.partitionBy("band_hash")
    return (
        banded.withColumn("_bsz", F.count(F.lit(1)).over(wc))
        .filter(F.col("_bsz") <= max_bucket)
        .drop("_bsz")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    max_bucket: int | None = 100_000,
    banded: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b), deduplicated across bands.

    Plan shape: signature (narrow) → posexplode into ``bands`` band keys →
    shuffle on (band_idx, band_hash) → within-bucket self-join. Only bucket
    contents are ever joined; the full pair space is never materialized.

    **Bucket cap** (100-TB guard): a boilerplate-heavy corpus can put 10^6
    docs in one band bucket, turning the within-bucket self-join into 10^12
    rows. Buckets larger than ``max_bucket`` are dropped from the pair join
    (their members are near-identical boilerplate, better handled by exact
    dedup on the band key itself); audit the dropped volume with
    ``lsh_oversized_buckets``. ``max_bucket=None`` disables the cap.
    """
    if banded is None:
        banded = _banded(df, id_col, text_col, k, bands)
    if max_bucket is not None:
        banded = _cap_buckets(banded, max_bucket)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_hash") == F.col("b.band_hash")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def lsh_oversized_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Audit view of the buckets ``lsh_candidate_pairs`` drops under its
    ``max_bucket`` cap: (band_hash, bucket_size) for every oversized bucket.
    At scale this is the 'logged drop volume' — route it to lineage."""
    return (
        _banded(df, id_col, text_col, k, bands)
        .groupBy("band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )


def lsh_index_build(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Persistable MinHash-LSH dedup index: ``(id, band_hash)`` rows, the
    build half of build-once/probe-many incremental dedup. At 100 TB the
    corpus is banded ONCE and the index parquet (two narrow columns,
    bucketable by band_hash) is what every later crawl increment joins
    against — re-shingling petabytes per increment is the anti-pattern this
    split exists to avoid (same shape as the ANN index split in
    operators/knn.py). Append the delta's own banding after each round to
    keep the index current."""
    return _banded(df, id_col, text_col, k, bands)


def lsh_index_probe(
    index: DataFrame,
    delta: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    max_bucket: int | None = 100_000,
    delta_banded: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs between NEW documents and an existing
    :func:`lsh_index_build` index, without touching indexed text: the delta
    is banded (Θ(|delta|) work) and joined to the index on band_hash — ids
    normalized to ``id_a < id_b`` and deduplicated across bands. Within-
    delta pairs are NOT emitted; union with ``lsh_candidate_pairs(delta)``
    for full-increment semantics (q84 hash-checks exactly that composition
    against a whole-corpus oracle). When composing that union, band the
    delta ONCE with :func:`lsh_index_build`, persist it, and pass it via
    ``delta_banded`` here and ``banded`` there — otherwise each consumer
    re-shingles the increment (Spark does not reuse the subplan across
    the union's branches; verified on q84's physical plan). ``max_bucket``
    caps the INDEX side's bucket size — the corpus is where boilerplate
    mega-buckets accumulate over rounds; audit drops with
    :func:`lsh_oversized_buckets`."""
    if max_bucket is not None:
        index = _cap_buckets(index, max_bucket)
    new = delta_banded if delta_banded is not None else _banded(
        delta, id_col, text_col, k, bands
    )
    return (
        index.alias("i")
        .join(new.alias("d"), F.col("i.band_hash") == F.col("d.band_hash"))
        .filter(F.col("i.id") != F.col("d.id"))
        .select(
            F.least("i.id", "d.id").alias("id_a"),
            F.greatest("i.id", "d.id").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = 100_000,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle (inverted-index
    join): (id_a, id_b, jaccard) with jaccard ≥ threshold, id_a < id_b.

    **df ceiling** (100-TB guard): the inverted-index join costs ∝ Σ df² per
    shingle; one boilerplate shingle present in 10^6 docs alone yields 10^12
    joined rows. Shingles with document frequency > ``max_df`` are removed
    from the shingle space entirely — from both the intersection counts and
    the set sizes, so the reported Jaccard stays internally consistent (it
    is the exact Jaccard of the df-filtered shingle sets). Ubiquitous
    shingles carry no pair-discriminating signal, so at sane ceilings the
    ranking is unchanged. ``max_df=None`` disables the ceiling.
    """
    sh = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh"))
    # Per-doc set size rides ON the inverted-index rows (8 bytes/row) so the
    # pair aggregation yields both sizes via first() — no join against a
    # corpus-sized sizes table at all (a forced broadcast of |docs| rows
    # was the old shape; at 10^9 docs that broadcast is multi-GB and fatal).
    inv = sh.select("id", F.size("sh").alias("n_sh"), F.explode("sh").alias("g"))
    if max_df is not None:
        wdf = Window.partitionBy("g")
        inv = (
            inv.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("_df") <= max_df)
            .drop("_df")
        )
        # sizes must reflect the df-filtered shingle space: recount in place
        # with an id-partitioned window (one keyed shuffle, still no join)
        inv = inv.withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy("id")))
    a, b = inv.alias("a"), inv.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def duplicate_span_positions(
    df: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Token positions covered by a duplicated n-gram: (doc_id, pos) for every
    1-based gram start whose token n-gram occurs ≥ ``min_count`` times
    corpus-wide (all occurrences counted — cross- AND within-document, so a
    document repeating its own boilerplate flags itself).

    This is the position-level core of ExactSubstr dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"). The paper
    builds a corpus suffix array; the idiomatic Spark equivalent for
    fixed-width matches is ONE keyed shuffle: explode gram starts, hash each
    gram to 64 bits (xxhash64 over the window of per-token xxhash64s — no
    gram string is ever materialized, and only the 8-byte hash crosses the
    exchange), and count occurrences with a window over the hash.
    Cost is Θ(total tokens) rows through one exchange — the same order as the
    tokenizer pass a training pipeline already pays, and there is no
    candidate-pair blowup because position survival is per-occurrence, not
    per-pair. A 64-bit collision merging two distinct grams is ~|grams|²/2⁶⁵
    (≈10⁻⁶ at 10⁶ grams); at 100-TB scale flip to two independent salts if
    that matters.
    """
    toks = tokens(F.col(content_col))
    # gram hash = xxhash64 over the window of per-token xxhash64s: no
    # n-token gram STRING is ever materialized, so the posexplode emits
    # bigint rows instead of n-token strings (A/B at 60M tokens: parity on
    # wall clock — the shuffle dominates — with strictly less memory
    # traffic; scripts/exactsubstr_probe.py)
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.xxhash64(F.slice(tok_hashes, i, n)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    pos_grams = df.select(
        F.col(id_col), F.posexplode(grams).alias("_i", "_gh")
    ).select(
        F.col(id_col),
        (F.col("_i") + 1).cast("long").alias("pos"),
        F.col("_gh"),
    )
    # count-over-window (not groupBy + join-back): gram hashes are mostly
    # unique, so a hash aggregate gets no map-side reduction, pays a
    # 10^6-entry map per partition, and the join would recompute the
    # explode — measured 1.4-2.8x slower than the window in A/B runs
    # (scripts/exactsubstr_probe.py variants).
    cnt = F.count(F.lit(1)).over(Window.partitionBy("_gh"))
    return (
        pos_grams.withColumn("_cnt", cnt)
        .filter(F.col("_cnt") >= min_count)
        .select(id_col, "pos")
    )


def duplicate_spans(
    df: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """ExactSubstr duplicated-span report: maximal merged token spans
    ``(doc_id, span_start, span_end, span_tokens)`` (1-based, inclusive)
    covered by at least one duplicated n-gram — the spans ExactSubstr dedup
    would cut from each document.

    Covered windows ``[pos, pos+n-1]`` that overlap OR tile token-adjacently
    are merged with gaps-and-islands — a span is a maximal contiguous run of
    duplicated-covered tokens: a covered position opens a new island iff it
    starts ≥2 tokens past every previous window's end (running ``max``
    window, so out-of-order window ends can't split a span), islands are
    numbered by a running sum of breaks, and the span aggregate groups by
    (doc, island). Both window passes partition by ``doc_id``, and the final
    groupBy's (doc, island) clustering is satisfied by that same hash
    partitioning — so span assembly adds exactly ONE more keyed shuffle (by
    doc) after :func:`duplicate_span_positions`'s gram-hash exchange, and
    partitions stay balanced because no document contributes more rows than
    its token count. Removal itself composes downstream: join spans back and
    slice/filter tokens, keeping the cut a metadata operation until
    re-materialization.
    """
    cov = duplicate_span_positions(df, n, min_count, id_col, content_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + (n - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-2)) + 1, 1).otherwise(0)
    return (
        cov.withColumn("_island", F.sum(brk).over(w))
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """ExactSubstr removal (the cut side of Lee et al. 2021): rebuild each
    document with every :func:`duplicate_spans` span excised, returning
    ``(id, text, n_removed)`` — cleaned token stream (single-space joined)
    plus the number of tokens cut. Untouched documents pass through
    byte-identical and every input document survives (a fully-duplicated
    document comes back with empty text, mirroring the paper's policy of
    cutting the substring, not dropping the document).

    The cut itself is row-local JVM work: spans are grouped to one array
    per document (the groupBy reuses :func:`duplicate_spans`'s doc-hash
    partitioning — no new exchange) and tokens are dropped with an indexed
    ``filter`` + ``exists`` lambda, O(tokens × spans/doc) inside codegen,
    no Python UDF. The only join is corpus ⟕ per-doc span arrays on the id
    — both sides corpus-sized at worst, so the strategy is left to
    Catalyst/AQE (shuffle join at scale, broadcast only if the span side
    measures small), per the engine's no-forced-broadcast policy for
    corpus-derived sides.
    """
    spans = (
        duplicate_spans(df, n, min_count, id_col, content_col)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
            F.sum("span_tokens").alias("_removed"),
        )
    )
    toks = tokens(F.col(content_col))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        ),
    )
    return (
        df.join(spans, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("_spans").isNull(), F.col(content_col))
            .otherwise(F.array_join(kept, " "))
            .alias(content_col),
            F.coalesce(F.col("_removed"), F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    n: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    content_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """Robust winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 — the
    MOSS algorithm): hash every token n-gram, slide a window over ``w``
    consecutive gram hashes, keep each full window's minimum hash with the
    RIGHTMOST position winning ties, emit distinct ``(id, pos,
    gram_hash)``. The guarantee: any token run of ≥ w + n - 1 tokens
    shared by two documents contributes at least one identical
    fingerprint, at ~2/(w+1) of the grams' storage — the
    position-tracking fingerprint family between :func:`exact_dedup`'s
    whole-doc hash and ExactSubstr's full span scan.

    Spark shape: ONE doc-keyed shuffle (posexplode → per-doc ordered
    window); the rightmost-tie rule is free — the frame aggregate is a
    struct-min over (hash, -pos) — and the trailing distinct reuses the
    doc-hash partitioning. ``hash_fn`` maps the gram string to a 64-bit
    column: default xxhash64 (production); pass the md5-60 bridge for
    DuckDB-parity oracles (q86).
    """
    if hash_fn is None:
        hash_fn = F.xxhash64
    pg = df.select(
        F.col(id_col),
        F.posexplode(position_grams(F.col(content_col), n)).alias("_i", "_g"),
    ).select(
        F.col(id_col),
        (F.col("_i") + 1).cast("long").alias("_p"),
        hash_fn(F.col("_g")).alias("_gh"),
    )
    win = Window.partitionBy(id_col).orderBy("_p").rowsBetween(-(w - 1), 0)
    return (
        pg.withColumn(
            "_w", F.min(F.struct(F.col("_gh"), (-F.col("_p")).alias("_np"))).over(win)
        )
        .filter(F.col("_p") >= w)  # full windows only
        .select(
            id_col,
            (-F.col("_w._np")).alias("pos"),
            F.col("_w._gh").alias("gram_hash"),
        )
        .distinct()
    )


def _token_hash(t: Column, seed: int | None = None) -> Column:
    """60-bit md5-derived token hash (DuckDB-reproducible); ``seed`` salts
    the hash for independent fingerprint halves."""
    s = t if seed is None else F.concat(t, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _vote32(h_col: str, prefix: str):
    return [
        F.sum(F.shiftright(F.col(h_col), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"{prefix}{b}")
        for b in range(32)
    ]


def _fold32(prefix: str) -> Column:
    sim = None
    for b in range(32):
        term = F.when(F.col(f"{prefix}{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return sim


def simhash32(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash: per-token 60-bit md5-derived hash; bit b of the
    fingerprint is the majority vote (strictly more +1 than −1) of token
    hash bits b. Returns (id, simhash)."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    ).withColumn("h", _token_hash(F.col("t")))
    votes = tok.groupBy("id").agg(*_vote32("h", "v"))
    return votes.select("id", _fold32("v").alias("simhash"))


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash as two independent 32-bit halves (seeded token
    hashes), returned as non-negative longs (sim_hi, sim_lo) — statistically
    identical to one 64-bit fingerprint, while every piece stays
    DuckDB-reproducible (no signed-overflow games at bit 63).

    This is the scale-sane fingerprint for near-pair banding: at
    ``max_dist`` 6-8 the bands are 7-9 bits wide (vs 3-4 bits on a 32-bit
    fingerprint — buckets of |corpus|/16 are no bucket at all). One token
    explode, one aggregation pass for both halves.
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t"))
        .withColumn("ha", _token_hash(F.col("t"), seed=0xA))
        .withColumn("hb", _token_hash(F.col("t"), seed=0xB))
    )
    votes = tok.groupBy("id").agg(*_vote32("ha", "a"), *_vote32("hb", "b"))
    return votes.select("id", _fold32("a").alias("sim_hi"), _fold32("b").alias("sim_lo"))


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def _seg64(hi: Column, lo: Column, start: int, width: int) -> Column:
    """Bits [start, start+width) of the logical 64-bit fingerprint stored
    as two 32-bit halves (lo = bits 0..31, hi = bits 32..63)."""
    mask = (1 << width) - 1
    if start + width <= 32:
        return F.shiftright(lo, start).bitwiseAND(F.lit(mask))
    if start >= 32:
        return F.shiftright(hi, start - 32).bitwiseAND(F.lit(mask))
    lo_bits = 32 - start
    return (
        F.shiftright(lo, start).bitwiseAND(F.lit((1 << lo_bits) - 1))
        + F.shiftleft(hi.bitwiseAND(F.lit((1 << (width - lo_bits)) - 1)), lo_bits)
    ).bitwiseAND(F.lit(mask))


def simhash64_near_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_dist: int = 7
) -> DataFrame:
    """Near-dup pairs on the 64-bit SimHash, banded into ``max_dist + 1``
    segments (pigeonhole → 100% candidate recall at distance ≤ max_dist,
    same guarantee as simhash_near_pairs but with 8-9-bit bands instead of
    3-4-bit ones — buckets stay selective on web-scale corpora).
    Returns (id_a, id_b, dist)."""
    n_bands = min(max_dist + 1, 64)
    bounds = [round(i * 64 / n_bands) for i in range(n_bands + 1)]
    segs = [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_bands)]
    sim = simhash64(df, id_col, text_col)
    bands = sim.select(
        "id",
        "sim_hi",
        "sim_lo",
        F.posexplode(
            F.array(*[_seg64(F.col("sim_hi"), F.col("sim_lo"), s, w) for s, w in segs])
        ).alias("band_idx", "band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    dist = F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi"))) + F.bit_count(
        F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo"))
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), dist.alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_dist: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, bucketed by banding the
    32-bit fingerprint into ``max_dist + 1`` bit segments.

    Pigeonhole guarantee (standard Hamming-LSH): a pair with at most
    ``max_dist`` differing bits split across ``max_dist + 1`` disjoint bands
    must share at least one band *exactly* — so the banded bucket join has
    **100% candidate recall** at distance ≤ max_dist (asserted against a
    brute-force all-pairs Hamming oracle in tests/test_operators.py), while
    the shuffle stays on (band_idx, band_value) keys, never all-pairs.
    """
    n_bands = min(max_dist + 1, 32)
    # split 32 bits into n_bands contiguous segments of near-equal width
    bounds = [round(i * 32 / n_bands) for i in range(n_bands + 1)]
    segs = [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_bands)]
    sim = simhash32(df, id_col, text_col)
    bands = sim.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), start).bitwiseAND(F.lit((1 << width) - 1))
                    for start, width in segs
                ]
            )
        ).alias("band_idx", "band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming32(F.col("a.simhash"), F.col("b.simhash")).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ≥ ``min_hits``
    distinct word n-grams with any benchmark/eval doc —
    (doc_id, n_hit_grams, n_bench_docs), contaminated rows only.

    The standard pre-training hygiene pass (GPT-3 App. C / PaLM / Llama
    n-gram-overlap decontamination): eval-set n-grams must not leak into
    the training corpus. The reference has no analog (it crawls, it does
    not curate); this composes with ``exact_dedup``/``lsh_candidate_pairs``
    as the last curation gate.

    Scale shape: the benchmark side is an eval suite — bounded (10^4-10^6
    grams) by construction, NOT corpus-sized — so its distinct gram set is
    genuinely broadcastable and the corpus side streams map-side through
    the join with zero shuffle of the 100-TB side. Set
    ``broadcast_benchmark=False`` to let AQE/Catalyst pick (the safe
    fallback if the "benchmark" is itself large); the groupBy then
    shuffles only the surviving hit rows, ∝ contamination rate, not corpus
    size.
    """
    bench_grams = (
        benchmark.select(
            F.col(id_col).alias("bench_id"),
            F.explode(shingles(F.col(text_col), n)).alias("g"),
        )
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("g")
    )
    return (
        doc_grams.join(bench_grams, "g")
        .groupBy(id_col)
        .agg(
            F.countDistinct("g").alias("n_hit_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_hit_grams") >= min_hits)
    )


def _bloom_probes(g: Column, m: int, k: int) -> list[Column]:
    """The k Bloom positions of gram ``g``: md5-60 of g#bf0..g#bf(k-1) mod
    m — the same hash bridge every oracle-checked operator uses, so the
    filter's exact bit pattern (false positives included) replays in SQL."""
    return [
        F.pmod(md5_hash64(F.concat(g, F.lit(f"#bf{r}"))), F.lit(m)).cast("int")
        for r in range(k)
    ]


def bloom_bits(
    items: DataFrame, col: str = "g", m: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Set-bit table of a Bloom filter over ``items[col]``: one ``pos``
    column, ≤ min(m, k·|items|) distinct rows. The relational encoding of
    the bitset — the crawl engine's in-memory variant is crawl/bloom.py;
    this one exists so membership itself is a (bounded, broadcastable)
    DataFrame that merges across shards by plain union+distinct."""
    probes = F.explode(F.array(*_bloom_probes(F.col(col), m, k))).alias("pos")
    return items.select(probes).distinct()


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    m: int = 1 << 16,
    k: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the bounded-width scale
    path beside :func:`decontaminate`'s exact gram join: flag training
    docs where ≥ ``min_hits`` distinct word n-grams have ALL ``k`` Bloom
    positions set in the benchmark filter — (doc_id, n_hit_grams).

    Where exact decontamination broadcasts the benchmark's gram STRINGS
    (width ∝ gram length × gram count), the Bloom side is ≤ ``m`` int
    positions no matter how large the eval suite grows — the classic
    CCNet/Dolma-scale trade: a fixed-size membership structure bought
    with a replayable false-positive rate (≈ (k·|grams|/m)^k per probe;
    supersets exact — every truly shared gram always flags, tested).

    Scale shape: the corpus side explodes k probe rows per gram and
    streams map-side through the forced broadcast of the position table
    (bounded by the ``m`` literal, hint justified by construction); only
    probe-hit rows reach the two contamination aggregates, so post-join
    work is ∝ hit rate, never corpus size. Zero corpus-keyed shuffles
    before the hit groupBy.
    """
    bits = bloom_bits(
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g")),
        "g",
        m,
        k,
    )
    doc_probes = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("g")
    ).select(
        id_col,
        "g",
        F.posexplode(F.array(*_bloom_probes(F.col("g"), m, k))).alias("r", "pos"),
    )
    hits = (
        doc_probes.join(F.broadcast(bits), "pos")
        .groupBy(id_col, "g")
        .agg(F.count_distinct("r").alias("_set"))
        .filter(F.col("_set") == k)
    )
    return (
        hits.groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_hit_grams"))
        .filter(F.col("n_hit_grams") >= min_hits)
    )


def _semdedup_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    centroid_col: str,
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k-row quantizer against
    the streamed corpus, map-side cosine, one ``id_col``-keyed reduce for
    the argmax (lowest cluster id breaks ties). Returns (id, cluster)."""
    from arxiv_crawler_spark.operators.knn import cosine

    scored = emb.select(
        F.col(id_col), F.col(vec_col)
    ).join(
        F.broadcast(centroids.select(F.col(cluster_col), F.col(centroid_col)))
    ).withColumn("_cos", cosine(F.col(vec_col), F.col(centroid_col)))
    return scored.groupBy(id_col).agg(
        F.max_by(
            F.col(cluster_col),
            F.struct(F.col("_cos"), (-F.col(cluster_col)).alias("_tb")),
        ).alias(cluster_col)
    )


def semdedup_oversized_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    centroid_col: str = "centroid",
    max_cluster: int = 100_000,
) -> DataFrame:
    """Audit view of the clusters :func:`semdedup` skips under its
    ``max_cluster`` cap: (cluster, cluster_size) for every oversized
    cluster — the 'logged drop volume', same contract as
    :func:`lsh_oversized_buckets`. Route it to lineage at scale; a
    non-empty result means the k~sqrt(n) balance premise failed for those
    centroids and their members went through uncapped exact/LSH dedup
    instead of the quadratic semantic stage."""
    asg = _semdedup_assign(emb, centroids, id_col, vec_col, cluster_col, centroid_col)
    return (
        asg.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") > max_cluster)
    )


def semdedup(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    centroid_col: str = "centroid",
    tau: float = 0.7,
    max_cluster: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup —
    assign every embedding to its nearest centroid by cosine, then inside
    each cluster drop any document that has an earlier (lower-id) neighbor
    with cosine >= ``tau``. Returns ``(id, cluster, is_kept)``.

    Plan shape at 100 TB: ``centroids`` is the trained coarse quantizer —
    k rows, tiny — so the assignment is a broadcast nested-loop against
    the streamed corpus followed by a map-side ``max_by`` argmax (one
    shuffle on ``id_col`` for the per-vector reduce); the pairwise stage
    shuffles the corpus ONCE on ``cluster`` and is quadratic only within a
    cluster, which the SemDeDup premise (k ~ sqrt(n) balanced clusters)
    keeps bounded. No window over the full corpus, no corpus-side
    broadcast.

    **Cluster cap** (100-TB guard, mirrors ``lsh_candidate_pairs``'s
    ``max_bucket``): the premise can fail — one boilerplate-heavy centroid
    at 10^9 docs puts |c|² cosine work on a single executor. Clusters
    larger than ``max_cluster`` are skipped by the pairwise stage (their
    members are all kept — near-identical boilerplate belongs to exact /
    LSH dedup, which cap-and-audit it already); audit the skipped volume
    with :func:`semdedup_oversized_clusters`. ``max_cluster=None``
    disables the cap. Train centroids with operators/knn.py's spherical k-means
    (``AnnIndex``/``ivf_build`` path) at scale; any deterministic centroid
    table works — plans/analytics.py::q91 feeds per-label means so DuckDB
    can reproduce the whole operator for the hash oracle.

    Keeper rule: a document is dropped iff SOME lower-id same-cluster
    document is tau-close — the NeMo-Curator SemDeDup retention rule
    (one representative survives per duplicate neighborhood; earliest id
    wins, mirroring exact_dedup's first-wins semantics).
    """
    from arxiv_crawler_spark.operators.knn import cosine

    asg = _semdedup_assign(emb, centroids, id_col, vec_col, cluster_col, centroid_col)

    vecs = emb.select(F.col(id_col), F.col(vec_col)).join(asg, id_col)
    if max_cluster is not None:
        # The size window shuffles on cluster_col — the same partitioning
        # the pairwise self-join needs, so the cap adds no extra exchange
        # on the join's build path beyond the one it already pays.
        wc = Window.partitionBy(cluster_col)
        vecs = (
            vecs.withColumn("_csz", F.count(F.lit(1)).over(wc))
            .filter(F.col("_csz") <= max_cluster)
            .drop("_csz")
        )
    a = vecs.select(
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
        F.col(cluster_col),
    )
    b = vecs.select(
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
        F.col(cluster_col),
    )
    dropped = (
        a.join(b, [cluster_col])
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cosine(F.col("_va"), F.col("_vb")) >= tau)
        .select(F.col("_idb").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return asg.join(dropped, id_col, "left").select(
        F.col(id_col),
        F.col(cluster_col),
        F.coalesce(~F.col("_dropped"), F.lit(True)).alias("is_kept"),
    )


def remove_boilerplate(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 8,
    max_df: int = 5,
) -> DataFrame:
    """Boilerplate paragraph removal (the C4/CCNet companion to
    :func:`paragraph_dedup`): drop every copy of a paragraph block whose
    corpus-wide DOCUMENT FREQUENCY exceeds ``max_df`` — headers, footers,
    navigation, cookie banners — while keeping ALL copies of ordinary
    text. First-wins dedup answers "have I stored this before"; this
    answers "is this paragraph site furniture" — orthogonal gates a
    pipeline runs back-to-back. Returns
    ``(id, n_paras, n_kept, text_clean)``, one row per input document.

    Same block convention as paragraph_dedup (non-overlapping
    ``block_tokens``-token blocks; a newline corpus swaps the explode for
    split('\\n')).

    Plan shape at 100 TB: explode → ONE groupBy on the 16-byte paragraph
    md5 for the df counts (map-side partial, paragraph text never keys an
    exchange) → the >max_df survivors form the hot-hash table, joined
    back as a flag (selective by definition — boilerplate is the tail of
    the df distribution — so Catalyst will usually broadcast it; no
    forced hint, since an adversarial corpus can make it large) → one
    doc-keyed reassembly groupBy."""
    toks = tokens(F.col(text_col))
    paras = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(block_tokens)),
        lambda s: F.array_join(F.slice(toks, s, block_tokens), " "),
    )
    ex = (
        df.select(F.col(id_col), F.posexplode(paras).alias("pos", "para"))
        .filter(F.col("para") != "")
        .withColumn("para_hash", F.md5("para"))
    )
    hot = (
        ex.groupBy("para_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("para_hash", F.lit(True).alias("_hot"))
    )
    per_doc = (
        ex.join(hot, "para_hash", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("_hot").isNull().cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_hot").isNull(), F.struct("pos", "para"))
                        )
                    ),
                    lambda s: s["para"],
                ),
                " ",
            ).alias("text_clean"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 8,
) -> DataFrame:
    """CCNet-style cross-document paragraph dedup (Wenzek et al. 2019
    §3.1: hash every paragraph, keep only the corpus-wide FIRST
    occurrence, re-emit the document from its surviving paragraphs).
    Returns ``(id, n_paras, n_kept, text_deduped)`` — one row per input
    document, dropped-to-empty documents included.

    The synthetic corpus has no newline structure, so a "paragraph" is a
    non-overlapping ``block_tokens``-token block (the delimiter-split
    variant is the same plan with split(text, '\\n') as the explode).

    Plan shape at 100 TB: explode → ONE keyed shuffle on the paragraph
    md5 (the window's partition key — duplicate groups are tiny, so no
    skew) → one groupBy on the document id to reassemble. Paragraph TEXT
    never rides the first shuffle's key — the 16-byte hash does; CCNet's
    own sharded-hash design, relationally."""
    toks = tokens(F.col(text_col))
    paras = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(block_tokens)),
        lambda s: F.array_join(F.slice(toks, s, block_tokens), " "),
    )
    ex = (
        df.select(F.col(id_col), F.posexplode(paras).alias("pos", "para"))
        .filter(F.col("para") != "")
        .withColumn("para_hash", F.md5("para"))
    )
    w = Window.partitionBy("para_hash").orderBy(id_col, "pos")
    per_doc = (
        ex.withColumn("rn", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rn") == 1, F.struct("pos", "para"))
                        )
                    ),
                    lambda s: s["para"],
                ),
                " ",
            ).alias("text_deduped"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        )
    )
