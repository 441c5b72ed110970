"""Keyword search over the crawled corpus: BM25 ranking and Gopher-style
repetition/quality signals.

The reference's search surface is substring metadata search plus FAISS
vector retrieval (arxiv_search/src/arxiv_search/app.py:61-75); BM25 is the
standard lexical complement a web-corpus engine needs (and the usual
hybrid-retrieval partner of operators/knn.py). Repetition signals are the
MassiveText/Gopher curation filters (Rae et al. 2021, table A1) — the gate
that runs BEFORE dedup in a 100-TB webtext pipeline.

Scale shape (BM25): ONE tokenize pass over the corpus (round 7) — each doc
emits its per-query-term hits plus one sentinel row, reduced to an
(id, term) count table whose exchange every branch (tf, per-term df,
corpus stats) reuses at runtime; the exploded table is O(docs × |query|),
never O(corpus tokens); the tiny per-term df table and the 1-row stats
both broadcast into the scoring join. Nothing corpus-sized ever shuffles.

Scale shape (repetition): one explode + groupBy(doc, gram) count — the
same inverted-index shuffle as dedup shingling; per-doc reduction is a
keyed aggregate, all JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arxiv_crawler_spark.functions.text import position_grams, tokens

__all__ = ["bm25_topk", "repetition_signals", "lm_perplexity"]


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k: (doc_id, score, n_hit_terms), ordered
    (score desc, doc_id asc), limit k.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5));
    tf term = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)), dl in whitespace
    tokens. Deterministic (exact counts, fixed tie order) so DuckDB can
    mirror it bit-for-bit.
    """
    qt = F.array(*[F.lit(t) for t in query_terms])
    # ONE tokenize pass over the corpus (round 7, guide §2.4): the old
    # shape tokenized twice — once for the corpus-stats scalar (n_docs,
    # avgdl need EVERY doc), once for the tf table (hit docs only). Every
    # fact now derives from a single (id, term) count table: each document
    # emits its per-query-term hits PLUS one sentinel ""-row (tokens are
    # never empty strings, so no collision), and the sentinel slice
    # carries exactly one row per document for the stats. The tf/stats
    # split filters on an AGGREGATED marker column (first(term = "")), so
    # neither filter can push below the shared aggregate and break AQE
    # exchange reuse; the always-true isNotNull keeps the scoring join's
    # inferred constraint identical across branches — the same stage-reuse
    # discipline as lm_perplexity's self-mode. avgdl stays bit-equal: dl
    # is an int and Σdl ≪ 2^53, so the double sum is exact in any order.
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        id_col,
        F.size("_toks").alias("dl"),
        # per-query-term hits BEFORE exploding: |docs|×|query| rows max
        F.filter(F.col("_toks"), lambda t: F.array_contains(qt, t)).alias("_hits"),
    )
    base = toks.select(
        id_col,
        "dl",
        F.explode(
            F.concat(F.coalesce(F.col("_hits"), F.array()), F.array(F.lit("")))
        ).alias("term"),
    ).filter(F.col("term").isNotNull())
    # exactly TWO aggregate outputs (tf + a struct of everything else), and
    # every consumer references BOTH — otherwise per-branch column pruning
    # drops unused aggregate expressions below the shared agg and the
    # exchanges stop canonicalizing equal (no ReusedExchange, and the
    # corpus is tokenized once per branch again). count("tf") ≡ count(1)
    # (tf is a count, never null) — used where a branch would otherwise
    # not touch tf.
    d1 = base.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first(
            F.struct(F.col("dl").alias("dl"), (F.col("term") == "").alias("sent"))
        ).alias("_m"),
    )
    tf = d1.filter(~F.col("_m.sent")).select(
        id_col, "term", "tf", F.col("_m.dl").alias("dl")
    )
    stats = d1.filter(F.col("_m.sent")).agg(
        F.count(F.when(F.col("tf") >= 1, 1)).alias("n_docs"),
        F.avg(F.col("_m.dl")).alias("avgdl"),
    )
    # count over when(tf >= 1) ≡ count(1) (tf is a per-group count, always
    # ≥ 1) but, unlike count(tf), survives the non-null-count rewrite —
    # without a live tf reference this branch prunes d1's count aggregate
    # and rebuilds the exchange instead of reusing it
    df_t = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") >= 1, 1)).alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("_s"),
        )
        .groupBy(id_col)
        .agg(
            F.round(F.sum("_s"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def repetition_signals(
    df: DataFrame,
    n_top: int = 2,
    n_dup: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher/MassiveText repetition filters, exactly specified:
    (doc_id, top_ngram_char_frac, dup_ngram_char_frac, dup_line_frac).

    * top_ngram_char_frac — occurrences of the most frequent word
      ``n_top``-gram (ties: lexicographically smallest gram) × gram char
      length / len(text).
    * dup_ngram_char_frac — Σ over word ``n_dup``-grams occurring ≥2 times
      of occurrences × gram char length / len(text).
    * dup_line_frac — 1 - distinct/total over split(text, '\\n').

    Docs too short for an n-gram score 0.0 on that signal — including
    EMPTY text: the char-frac denominators are ``greatest(len, 1)``, so
    a zero-length document scores 0.0 rather than NULL.
    """

    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_len"),
        position_grams(F.col(text_col), n_top).alias("_g_top"),
        position_grams(F.col(text_col), n_dup).alias("_g_dup"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    )

    def _gram_stats(col: str, top: bool) -> DataFrame:
        counts = (
            base.select(id_col, F.explode(col).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if top:
            # argmax as a plain aggregate (map-side partial combine) instead
            # of a row_number window (full sort shuffle): min over
            # (-cnt, gram) = highest count, lexicographically smallest gram
            # on ties — the exact window tie-break, one pass
            best = counts.groupBy(id_col).agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("_nc"), F.col("g").alias("_g"))
                ).alias("_b")
            )
            return best.select(
                id_col,
                ((-F.col("_b._nc")) * F.length(F.col("_b._g"))).alias("_top_chars"),
            )
        return (
            counts.filter(F.col("cnt") >= 2)
            .groupBy(id_col)
            .agg(F.sum(F.col("cnt") * F.length("g")).alias("_dup_chars"))
        )

    return (
        base.join(_gram_stats("_g_top", top=True), id_col, "left")
        .join(_gram_stats("_g_dup", top=False), id_col, "left")
        .select(
            F.col(id_col),
            F.round(
                F.coalesce(F.col("_top_chars"), F.lit(0))
                / F.greatest(F.col("_len"), F.lit(1)),
                6,
            ).alias("top_ngram_char_frac"),
            F.round(
                F.coalesce(F.col("_dup_chars"), F.lit(0))
                / F.greatest(F.col("_len"), F.lit(1)),
                6,
            ).alias("dup_ngram_char_frac"),
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct("_lines"))
                / F.size("_lines").cast("double"),
                6,
            ).alias("dup_line_frac"),
        )
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    reference: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020): per-document
    cross-entropy (bits/bigram, round-6) under a Laplace-smoothed bigram
    model trained on ``reference`` (default: the corpus itself — the
    self-scoring mode CCNet buckets head/middle/tail on). Lower = more
    typical text. Model spec, mirrored verbatim by the q88 oracle:
    P(w2|w1) = (c(w1,w2) + α) / (c(w1→·) + α·V), where c(w1→·) is w1's
    continuation count and V the distinct-continuation vocabulary; score
    = −avg log2 P over the document's bigrams (docs with none are
    dropped).

    Scale shape: the corpus is tokenized ONCE — the bigram stream reduces
    immediately to a doc-keyed count table ``(id, w1, w2, c)`` (map-side
    partial agg), and everything else derives from it: the model's bigram
    counts are a rollup of that table, continuation counts and the scalar
    V roll up from the bigram counts, and scoring joins the SAME table
    against the model — co-keyed shuffle joins on (w1,w2) then (w1),
    never a driver-side model object — reducing per doc with one
    ``c``-weighted keyed aggregate. The shared subtree ends at the
    doc-keyed aggregate's exchange, so AQE's stage reuse (ReusedExchange)
    runs the tokenize+explode pass once per action with no persist (the
    round-5 self-mode shape paid a second full corpus read for the model
    pass — at 100 TB that is a second 100-TB scan). With an external
    ``reference`` the model tables are typically small enough that AQE
    broadcasts them into the scoring scan.
    """

    def bigram_stream(frame: DataFrame, keep_id: bool) -> DataFrame:
        toks = tokens(F.col(text_col))
        pairs = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        cols = [F.col(id_col)] if keep_id else []
        return frame.select(*cols, F.explode(pairs).alias("_p")).select(
            *([id_col] if keep_id else []),
            F.col("_p.w1").alias("w1"),
            F.col("_p.w2").alias("w2"),
        )

    # ONE tokenize+explode pass over the scored corpus: the stream is
    # exchanged ONCE, keyed (w1, w2), and everything derives above that
    # exchange — the doc-keyed count table (hash(w1,w2) co-locates every
    # (id,w1,w2) group, so no second exchange), the model's bigram counts,
    # and the scoring join (both sides already (w1,w2)-partitioned). AQE's
    # runtime stage reuse (ReusedExchange) runs the tokenize once per
    # action with no persist. The isNotNull filter is a no-op (split()
    # elements are never null) that keeps every branch's inferred
    # constraints identical — otherwise the left joins push isnotnull
    # filters into the model branches only, the subtrees stop
    # canonicalizing equal, and the exchange is not reused.
    pairs = (
        bigram_stream(df, keep_id=True)
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
        .repartition("w1", "w2")
    )
    db = pairs.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("_c"))
    if reference is None:
        # self-mode: the model's bigram counts are a rollup of the SAME
        # db node the scoring side reads (not a second aggregate of
        # ``pairs`` — column pruning would drop id below the exchange on
        # that branch and break the canonical match) — the corpus is
        # never tokenized or shuffled a second time
        bc = db.groupBy("w1", "w2").agg(F.sum("_c").alias("_cb"))
    else:
        bc = (
            bigram_stream(reference, keep_id=False)
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("_cb"))
        )
    # continuation counts and the vocabulary are rollups of bc — two
    # aggregates of the (already small) count table. The _cb >= 1 filter
    # is always true (counts are positive); it pins the vocabulary
    # aggregate to bc's subtree — without it the optimizer collapses
    # count_distinct(w2) straight onto the raw stream, paying the second
    # corpus pass this shape exists to avoid.
    uc = bc.groupBy("w1").agg(F.sum("_cb").alias("_cu"))
    v = bc.filter(F.col("_cb") >= 1).agg(F.count_distinct(F.col("w2")).alias("_v"))

    p = (
        (F.coalesce(F.col("_cb"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("_cu"), F.lit(0)) + F.lit(alpha) * F.col("_v"))
    )
    return (
        db.join(bc, ["w1", "w2"], "left")
        .join(uc, ["w1"], "left")
        .crossJoin(v)
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_bigrams"),
            F.round(
                F.sum(F.col("_c") * (-F.log2(p))) / F.sum("_c"), 6
            ).alias("bits_per_bigram"),
        )
    )
