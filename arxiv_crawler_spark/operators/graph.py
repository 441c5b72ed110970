"""Citation-graph analytics: damped PageRank over the edges log.

Why it belongs here: the reference's crawl priority is raw citation count
(crawler.py:195-205) — in-degree. PageRank is the standard next step for
ranking a crawled citation corpus (importance-weighted sampling of training
data, seed prioritization for the next crawl), and it exercises the one
workload shape the engine didn't yet cover: an ITERATIVE join-aggregate
fixpoint expressed as a DataFrame loop.

Plan shape per iteration (the one you'd want at 100 TB):

* ``contrib = edges ⋈ ranks ⋈ outdeg`` — ranks/outdeg are O(|V|) and join
  on ``citer``; edges (O(|E|), the big side) is joined WITHOUT shuffling it
  when ranks broadcast (|V| small), else all three shuffle on ``citer``
  once and stay co-partitioned.
* ``groupBy(cited).sum`` — one shuffle on ``cited`` per iteration (partial
  aggregation map-side; this is the irreducible PageRank shuffle).
* fixed iteration count unrolls into ONE linear plan — no driver-side data
  movement, no RDD loop; each iteration's plan depth is constant, and for
  long runs a ``localCheckpoint`` every ~5 iterations bounds lineage.

Dangling nodes (out-degree 0) simply leak their mass (the (1-d)/N base
keeps ranks well-defined); full dangling redistribution would add a scalar
agg per iteration and is not needed for relative ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "connected_components"]


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    src_col: str = "citer",
    dst_col: str = "cited",
    checkpoint_every: int = 5,
    dangling: str = "leak",
) -> DataFrame:
    """Damped PageRank: (node, pagerank) after ``iterations`` fixpoint steps.

    ``edges``: (src, dst) — multi-edges count multiply (a paper citing
    twice contributes twice, matching the reference's per-occurrence count
    semantics). ``nodes``: one row per node (isolated nodes keep the base
    rank). Deterministic: pure column arithmetic + joins, no sampling.

    ``dangling``: "leak" (default) lets out-degree-0 mass vanish (the
    (1-d)/N base keeps ranks well-defined; relative ranking unaffected);
    "redistribute" spreads dangling mass uniformly each step (the
    networkx/classic convention — ranks sum to 1). Redistribution stays
    declarative: the dangling-mass scalar is an agg cross-joined back in,
    so the unrolled plan remains one linear chain with no driver collect.
    """
    n = nodes.count()  # one metadata-cheap job; N is a plan literal after
    base = (1.0 - damping) / n
    outdeg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_od"))
    ranks = nodes.select(F.col(node_col), F.lit(1.0 / n).alias("_r"))
    for i in range(iterations):
        contrib = (
            edges.join(ranks.withColumnRenamed(node_col, src_col), src_col)
            .join(outdeg, src_col)
            .groupBy(F.col(dst_col).alias(node_col))
            .agg(F.sum(F.col("_r") / F.col("_od")).alias("_c"))
        )
        nxt = nodes.select(node_col).join(contrib, node_col, "left")
        extra = F.lit(0.0)
        if dangling == "redistribute":
            dm = (
                ranks.join(
                    outdeg.withColumnRenamed(src_col, node_col), node_col, "left_anti"
                )
                .agg(F.coalesce(F.sum("_r"), F.lit(0.0)).alias("_dm"))
            )
            nxt = nxt.crossJoin(F.broadcast(dm))
            extra = F.col("_dm") / n
        ranks = nxt.select(
            F.col(node_col),
            (
                F.lit(base)
                + F.lit(damping) * (F.coalesce(F.col("_c"), F.lit(0.0)) + extra)
            ).alias("_r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(node_col, F.col("_r").alias("pagerank"))


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node attaches its strictly-larger neighbors
    to the minimum of its neighborhood (including itself)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.least(F.col("u"), F.col("_mn")).alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges large→small, then every node attaches
    its smaller-or-equal neighborhood (and itself) to that neighborhood's
    minimum."""
    oriented = (
        e.where(F.col("u") != F.col("v"))
        .select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("_mn"))
    return (
        oriented.join(mins, "u")
        .where(F.col("v") != F.col("_mn"))
        .select(F.col("v").alias("u"), F.col("_mn").alias("v"))
        .union(mins.select(F.col("u"), F.col("_mn").alias("v")))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Label each node with the minimum node id of its connected component:
    (node, cluster_id).

    The duplicate-clustering tail of a near-dup pipeline: candidate pairs
    from MinHash-LSH / SimHash banding (operators/dedup.py) form an
    undirected graph whose connected components are the duplicate clusters;
    one keeper per cluster (the min id) survives curation. The reference
    has no distributed analog (its dedupe is the crawler's per-URL seen
    set, crawler.py:160-170); this is the standard web-corpus shape
    (CCNet / RefinedWeb dedup stages).

    Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
    Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
    and Beyond", SoCC'14), which converges in O(log^2 n) rounds (observed
    ~log n) regardless of component diameter — min-label propagation would
    need diameter rounds, fatal on 10^8-node near-dup chains.

    100-TB plan shape: each round is one groupBy(node) shuffle plus one
    co-partitioned join on the same key; the edge set shrinks monotonically
    toward the star graph, so later rounds are cheap; high-degree nodes are
    safe because large-star moves big neighbor lists onto their component
    min instead of materializing pair products. Convergence is detected
    with scalar aggregates only (count + order-insensitive xxhash64 sum) —
    no row data ever reaches the driver; ``localCheckpoint`` per round
    bounds lineage exactly like ``pagerank``.

    Node ids must be NUMERIC (the min-label ordering and the internal
    long cast require it). String-keyed pair tables (e.g. the url-keyed
    output of ``scheduler.near_dup_report``) must be pre-hashed — pmod-
    free ``functions.hashing.md5_hash64``/``F.xxhash64`` with a kept
    (id → url) mapping is the standard bridge; a silent cast would turn
    every string id into NULL and return an empty result, so non-numeric
    id columns raise instead.
    """
    numeric = ("tinyint", "smallint", "int", "bigint", "long", "short", "byte")
    for c in (src_col, dst_col):
        dt = dict(edges.dtypes)[c]
        if dt not in numeric:
            raise TypeError(
                f"connected_components needs numeric node ids; column {c!r} is "
                f"{dt}. Hash string ids to long first (functions.hashing."
                "md5_hash64 / F.xxhash64) and keep a mapping to join back."
            )
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("u"), F.col(dst_col).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    prev_sig = None
    for _ in range(max_iterations):
        # lazy checkpoint: the signature agg below materializes it in the
        # same job (eager would run a second, redundant job per round)
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: order-insensitive and overflow-proof under ANSI
            F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(28,0)")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iterations} rounds")
    # converged star edges point (member -> root); roots map to themselves
    membership = e.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("cluster_id"))
    return (
        nodes.join(membership, "node", "left")
        .select(
            F.col("node"),
            F.coalesce(F.col("cluster_id"), F.col("node")).alias("cluster_id"),
        )
    )
