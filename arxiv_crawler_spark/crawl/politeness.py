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
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "host_budgets",
    "split_robots_denied",
    "parse_robots_txt",
    "parse_robots",
    "DEFAULT_CRAWL_DELAY",
]

DEFAULT_CRAWL_DELAY = 3.0  # crawler.py:33


def parse_robots_txt(text: str | None, agent: str = "*") -> tuple[float | None, list[str]]:
    """Parse one robots.txt body into (crawl_delay | None, disallow prefixes)
    for ``agent`` — the pure-python spec behind :func:`parse_robots` (shared
    row oracle, unit-tested directly).

    RFC 9309-shaped, scoped to the directives the politeness layer consumes:
    ``#`` comments stripped; consecutive ``User-agent`` lines share one
    group; a group matching the agent name exactly (case-insensitive) takes
    precedence over ``*`` groups; multiple matching groups merge (disallow
    union, last crawl-delay wins); an empty ``Disallow:`` value allows all;
    malformed lines are ignored (robots.txt in the wild is lawless)."""
    agent = agent.lower()
    groups: list[dict] = []
    current: dict | None = None
    in_header = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_header:
                current = {"agents": set(), "disallow": [], "delay": None}
                groups.append(current)
                in_header = True
            current["agents"].add(val.lower())
            continue
        in_header = False
        if current is None:
            continue  # rules before any User-agent line are ignored
        if key == "disallow" and val:
            current["disallow"].append(val)
        elif key == "crawl-delay":
            try:
                current["delay"] = float(val)
            except ValueError:
                pass
    chosen = [g for g in groups if agent in g["agents"]]
    if not chosen:
        chosen = [g for g in groups if "*" in g["agents"]]
    delay: float | None = None
    disallow: list[str] = []
    for g in chosen:
        disallow.extend(g["disallow"])
        if g["delay"] is not None:
            delay = g["delay"]
    return delay, disallow


def parse_robots(
    robots_txt: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
    default_crawl_delay: float = DEFAULT_CRAWL_DELAY,
) -> DataFrame:
    """Ingest raw robots.txt bodies: ``(host, robots_txt)`` → the structured
    ``(host, crawl_delay, disallow)`` table the engine consumes
    (:func:`host_budgets` / :func:`split_robots_denied` /
    ``CrawlEngine(robots=...)``).

    Arrow-batched ``mapInPandas`` (ingestion path, once per robots fetch —
    not the round loop); hosts with no matching group or no Crawl-delay get
    ``default_crawl_delay`` so downstream budget math never sees a null."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            delays: list[float] = []
            prefixes: list[list[str]] = []
            for t in pdf[text_col]:
                d, p = parse_robots_txt(t, agent)
                delays.append(float(default_crawl_delay if d is None else d))
                prefixes.append(p)
            yield pd.DataFrame(
                {"host": pdf[host_col], "crawl_delay": delays, "disallow": prefixes}
            )

    return robots_txt.select(host_col, text_col).mapInPandas(
        batch, schema="host string, crawl_delay double, disallow array<string>"
    )


def host_budgets(
    robots: DataFrame | None, round_seconds: float, exceptions_only: bool = False
) -> DataFrame | None:
    """(host, budget) from the robots table; None → uniform default budget
    (computed by the caller from DEFAULT_CRAWL_DELAY).

    ``exceptions_only=True`` keeps only hosts whose budget DIFFERS from the
    default — the web-scale form: at Common-Crawl scale the robots table is
    O(10^8) hosts, almost all at the default crawl-delay, and the wave
    selector's left join + ``coalesce(budget, default)`` makes a
    default-budget row indistinguishable from an absent one. Shipping only
    the exceptions turns an O(all hosts) per-round broadcast into an
    O(non-default hosts) one."""
    if robots is None:
        return None
    out = robots.select(
        "host",
        F.greatest(
            F.lit(1), F.floor(F.lit(round_seconds) / F.col("crawl_delay"))
        ).cast("int").alias("budget"),
    )
    if exceptions_only:
        out = out.filter(F.col("budget") != F.lit(default_budget(round_seconds)))
    return out


def default_budget(round_seconds: float) -> int:
    return max(1, math.floor(round_seconds / DEFAULT_CRAWL_DELAY))


def split_robots_denied(
    links: DataFrame, robots: DataFrame | None, broadcast: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Partition discovered links into (allowed, denied) by robots disallow
    prefixes. ``links`` must carry (url, host).

    Hosts with an empty disallow list are dropped from the join side before
    shipping — a missing host and an empty-prefix host both mean "allowed",
    so the table shipped each round is O(hosts that forbid something), not
    O(all hosts). ``broadcast=False`` falls back to a shuffle join when even
    that set is too large to broadcast (the caller decides from its size)."""
    if robots is None:
        return links, links.limit(0)
    r = robots.select("host", "disallow").filter(F.size("disallow") > 0)
    if broadcast:
        r = F.broadcast(r)
    path = F.regexp_replace(F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    joined = links.join(r, "host", "left").withColumn(
        "_denied",
        F.when(F.col("disallow").isNull(), F.lit(False)).otherwise(
            F.exists(F.col("disallow"), lambda p: path.startswith(p))
        ),
    )
    allowed = joined.filter(~F.col("_denied")).drop("_denied", "disallow")
    denied = joined.filter(F.col("_denied")).drop("_denied", "disallow")
    return allowed, denied
