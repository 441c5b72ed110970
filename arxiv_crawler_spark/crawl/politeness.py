"""Per-host politeness: robots cache + token-bucket budgets.

The reference rate-limits with one global ``time.sleep(3.0)`` before each
fetch (crawler.py:33,95) — a budget of one fetch per 3 s on a single host.
Generalized per the north_rule: a ``robots`` table
``(host, crawl_delay double, disallow array<string>)`` drives

* a **token-bucket budget** per scheduling round:
  ``budget(host) = max(1, floor(round_seconds / crawl_delay))`` — the
  number of politeness tokens a host accrues over one round. The reference
  behavior is the special case (one host, round_seconds = crawl_delay).
* **disallow filtering**: discovered links whose path starts with a
  disallowed prefix for their host are never queued; they are recorded in
  ``seen`` with status ``robots_denied`` so they are dropped exactly once
  (filtering at discovery time keeps the per-round cost O(new links), not
  O(frontier)).

Both are JVM-side expressions: a broadcast equi-join on host plus an
``exists(disallow, p -> startswith(path, p))`` array predicate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["host_budgets", "split_robots_denied", "DEFAULT_CRAWL_DELAY"]

DEFAULT_CRAWL_DELAY = 3.0  # crawler.py:33


def host_budgets(robots: DataFrame | None, round_seconds: float) -> DataFrame | None:
    """(host, budget) from the robots table; None → uniform default budget
    (computed by the caller from DEFAULT_CRAWL_DELAY)."""
    if robots is None:
        return None
    return robots.select(
        "host",
        F.greatest(
            F.lit(1), F.floor(F.lit(round_seconds) / F.col("crawl_delay"))
        ).cast("int").alias("budget"),
    )


def default_budget(round_seconds: float) -> int:
    return max(1, math.floor(round_seconds / DEFAULT_CRAWL_DELAY))


def split_robots_denied(links: DataFrame, robots: DataFrame | None) -> tuple[DataFrame, DataFrame]:
    """Partition discovered links into (allowed, denied) by robots disallow
    prefixes. ``links`` must carry (url, host)."""
    if robots is None:
        return links, links.limit(0)
    r = robots.select("host", "disallow")
    path = F.regexp_replace(F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    joined = links.join(F.broadcast(r), "host", "left").withColumn(
        "_denied",
        F.when(F.col("disallow").isNull(), F.lit(False)).otherwise(
            F.exists(F.col("disallow"), lambda p: path.startswith(p))
        ),
    )
    allowed = joined.filter(~F.col("_denied")).drop("_denied", "disallow")
    denied = joined.filter(F.col("_denied")).drop("_denied", "disallow")
    return allowed, denied
