"""Text-analysis column builders for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure JVM expressions (split/filter/transform/regexp) —
no Python in the hot path — and every formula is specified exactly so the
DuckDB oracle can mirror it verbatim.

Reference analogs: token/whitespace handling generalizes the reference's
text normalization (arxiv_util.py:107-109); the fingerprint generalizes its
64-bit content hashing (build_embeddings_dataset.py:94).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "position_grams",
    "token_count",
    "regex_token_count",
    "stopword_ratio",
    "punct_ratio",
    "mean_word_len",
    "quality_score",
    "lang_guess",
    "fingerprint",
    "redact_pii",
    "pii_counts",
    "EN_STOPWORDS",
    "PII_PATTERNS",
]

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def tokens(c: Column) -> Column:
    """Whitespace tokens, empties dropped. Spec: split on single space."""
    return F.filter(F.split(c, " "), lambda t: t != "")


def position_grams(c: Column, n: int) -> Column:
    """Positional word n-grams (space-joined, 1-based starts, duplicates
    kept): element i is tokens[i..i+n-1]; docs shorter than n yield [].
    THE shared gram convention — winnowing, repetition signals, and the
    span-dedup oracle SQL all mirror exactly this boundary behavior."""
    t = tokens(c)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def regex_token_count(c: Column) -> Column:
    """BPE-ish sub-token estimate: alnum runs plus lone punctuation marks."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)))


def _count_token(toks: Column, word: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == F.lit(word)))


def stopword_ratio(c: Column, stopwords: list[str] | None = None) -> Column:
    """(# tokens that are stopwords) / (# tokens); 0.0 for empty docs."""
    toks = tokens(c)
    hits = None
    for w in stopwords or EN_STOPWORDS:
        h = _count_token(toks, w)
        hits = h if hits is None else hits + h
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(c: Column) -> Column:
    """(# chars not alnum/space) / (# chars); 0.0 for empty strings."""
    stripped = F.regexp_replace(c, r"[^a-zA-Z0-9 ]", "")
    return F.when(
        F.length(c) > 0,
        (F.length(c) - F.length(stripped)).cast("double") / F.length(c),
    ).otherwise(F.lit(0.0))


def mean_word_len(c: Column) -> Column:
    toks = tokens(c)
    return F.when(
        F.size(toks) > 0,
        F.length(F.regexp_replace(c, " ", "")).cast("double") / F.size(toks),
    ).otherwise(F.lit(0.0))


def quality_score(c: Column) -> Column:
    """Deterministic quality heuristic in [0, 1]:
    0.4·stopword_ratio_capped + 0.3·min(1, tokens/100) + 0.3·(1 − punct_ratio).
    """
    stop = F.least(F.lit(1.0), stopword_ratio(c) * 5.0)
    lencomp = F.least(F.lit(1.0), token_count(c).cast("double") / 100.0)
    return stop * 0.4 + lencomp * 0.3 + (F.lit(1.0) - punct_ratio(c)) * 0.3


def lang_guess(c: Column) -> Column:
    """N-gram-free language heuristic: English stopword density ≥ 8% → 'en',
    else 'other'. (Real corpora would use char-n-gram profiles; the spec
    here is deliberately simple so the oracle can mirror it.)"""
    return F.when(stopword_ratio(c) >= 0.08, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(c: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set. Near-dup-stable under token reordering."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(c))), " "))


# PII scrubbing (the C4/RefinedWeb/FineWeb anonymization pass). Patterns are
# deliberately restricted to the Java-regex ∩ RE2 common subset (no
# lookaround, no backrefs) so the DuckDB oracle replays them verbatim —
# byte-parity is tested. Order matters and is part of the spec: emails
# first (their dotted domains would otherwise feed the IP pattern), then
# IPs, then phones (whose 3-3-4 shape could swallow IP remnants).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"(\+[0-9]{1,3}[- ])?\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
]


def redact_pii(c: Column) -> Column:
    """Text with every PII_PATTERNS match replaced by its tag, applied in
    spec order. Pure JVM regexp_replace chain — one projection, no shuffle,
    whole-stage-codegen friendly."""
    for _, pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


def pii_counts(c: Column) -> list[Column]:
    """Match counts per PII family, each measured on the text as the
    PREVIOUS passes left it (sequential semantics — identical to what
    redact_pii removes). Returns columns aliased n_<family>."""
    out = []
    for name, pat, rep in PII_PATTERNS:
        out.append(
            F.size(F.regexp_extract_all(c, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        c = F.regexp_replace(c, pat, rep)
    return out
