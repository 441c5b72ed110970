"""URL canonicalization — pure JVM-side column expressions.

Generalizes the reference's ``normalize_arxiv_id`` (arxiv_util.py:16-23,
applied at seed intake crawler.py:216 and citation discovery crawler.py:150)
to the full URL canonicalization the north_rule asks for. Everything is
built from ``pyspark.sql.functions`` so it stays inside whole-stage codegen —
no Python in the hot path.

Canonical form (documented spec, mirrored by the DuckDB oracle SQL):
  1. trim surrounding whitespace
  2. lowercase scheme and host
  3. drop default ports (:80 for http, :443 for https)
  4. strip the #fragment
  5. sort query parameters byte-lexicographically ('?b=2&a=1' → '?a=1&b=2')
  6. empty path → '/'; trailing '/' stripped from non-root paths
  7. arXiv special case: an /abs/<id>vN version suffix is stripped
     (normalize_arxiv_id parity: arxiv_util.py:16-23)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "host_of",
    "normalize_arxiv_id_col",
    "arxiv_id_to_url",
    "url_quality_signals",
    "URL_BANNED_HARD",
    "URL_BANNED_SOFT",
]


def normalize_arxiv_id_col(c: Column) -> Column:
    """Strip a trailing version suffix ``vN`` from an arXiv id.

    The reference logic (arxiv_util.py:21-22) is
    ``"v" in id and id.split("v")[-1].isdigit()`` → ``rsplit("v", 1)[0]``;
    for well-formed ids (``\\d{4}.\\d{4,5}`` or legacy 7-digit) this equals
    the anchored regex below. Oddballs (e.g. bare ``v2``) are unit-tested.
    """
    return F.regexp_replace(c, r"v\d+$", "")


def arxiv_id_to_url(c: Column) -> Column:
    """Canonical URL for a (normalized) arXiv id."""
    return F.concat(F.lit("https://arxiv.org/abs/"), normalize_arxiv_id_col(c))


def _sorted_query(query: Column) -> Column:
    """Sort '&'-separated query params byte-lexicographically."""
    return F.array_join(F.array_sort(F.split(query, "&")), "&")


def canonicalize_url(c: Column) -> Column:
    """Apply the canonical form documented in the module docstring.

    Composed from parse_url/regexp/concat — all JVM expressions, so Catalyst
    can constant-fold, push down, and codegen this inside the scan stage.
    """
    u = F.trim(c)
    # strip fragment first so parse_url never sees it
    u = F.regexp_replace(u, r"#.*$", "")

    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    path = F.regexp_extract(rest, r"^[^/?]*(/[^?]*)?", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)

    # default-port elision
    is_default = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    portpart = F.when(is_default, F.lit("")).otherwise(F.concat(F.lit(":"), port))

    # path normalization: empty → '/', strip trailing '/' on non-root
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when((F.length(path) > 1) & path.endswith("/"), F.substring(path, 1, F.length(path) - 1)).otherwise(path)
    # arXiv version-suffix strip on /abs/<id>vN paths
    path = F.when(
        (host == "arxiv.org") & path.rlike(r"^/abs/.*v\d+$"),
        F.regexp_replace(path, r"v\d+$", ""),
    ).otherwise(path)

    querypart = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), _sorted_query(query)))

    schemepart = F.when(scheme == "", F.lit("")).otherwise(F.concat(scheme, F.lit("://")))
    return F.concat(schemepart, host, portpart, path, querypart)


def host_of(c: Column) -> Column:
    """Lowercased host of an (already canonical or raw) URL — the politeness
    partitioning key (crawler.py:33's single-host rate limit generalized
    per-host)."""
    rest = F.regexp_replace(F.trim(c), r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    return F.lower(F.regexp_extract(rest, r"^([^/:?#]*)", 1))


# --------------------------------------------------------------------------
# URL-level quality filtering (RefinedWeb-style, Penedo et al. 2023 §3.1 /
# appendix G: blocklist word scoring + URL shape heuristics). Pure column
# expressions — the filter runs inside the parquet scan's codegen stage, so
# at 100 TB it is a pushed-down row gate, not a separate pass.
# --------------------------------------------------------------------------

# Hard words: one hit alone disqualifies (weight 1.0). Soft words score
# 0.5 each — two soft hits add up to a drop, one alone survives (the
# RefinedWeb fractional word-weight scheme, truncated list).
URL_BANNED_HARD = ("casino", "xxx", "porn")
URL_BANNED_SOFT = ("promo", "free-download", "tracker")


def url_quality_signals(
    url: Column,
    *,
    max_len: int = 96,
    max_digit_ratio: float = 0.4,
) -> Column:
    """Struct of URL-quality signals + the keep verdict:
    ``(banned_score, digit_ratio, too_long, ad_subdomain, keep)``.

    * ``banned_score`` — Σ word-weights over the lowercased URL
      (hard = 1.0, soft = 0.5); ≥ 1.0 drops.
    * ``digit_ratio`` — digits / path length (SEO-spam shape signal).
    * ``too_long`` — full URL longer than ``max_len``.
    * ``ad_subdomain`` — host starts with the ``ads.`` label.

    Every predicate is a built-in string function, so the composed
    ``keep`` column stays in whole-stage codegen and Catalyst can push it
    to the scan when used as a filter.
    """
    low = F.lower(url)
    path = F.regexp_extract(low, r"^[a-z][a-z0-9+.-]*://[^/]+(/.*)?$", 1)
    score = sum(
        [F.when(low.contains(w), F.lit(1.0)).otherwise(F.lit(0.0)) for w in URL_BANNED_HARD]
        + [F.when(low.contains(w), F.lit(0.5)).otherwise(F.lit(0.0)) for w in URL_BANNED_SOFT],
        F.lit(0.0),
    )
    digit_ratio = F.length(F.regexp_replace(path, r"[^0-9]", "")) / F.greatest(
        F.length(path), F.lit(1)
    )
    too_long = F.length(url) > max_len
    ad_sub = host_of(url).startswith("ads.")
    keep = (
        (score < 1.0)
        & (digit_ratio <= max_digit_ratio)
        & ~too_long
        & ~ad_sub
    )
    return F.struct(
        score.alias("banned_score"),
        digit_ratio.alias("digit_ratio"),
        too_long.alias("too_long"),
        ad_sub.alias("ad_subdomain"),
        keep.alias("keep"),
    )
