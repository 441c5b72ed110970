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

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    src_col: str = "citer",
    dst_col: str = "cited",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Damped PageRank: (node, pagerank) after ``iterations`` fixpoint steps.

    ``edges``: (src, dst) — multi-edges count multiply (a paper citing
    twice contributes twice, matching the reference's per-occurrence count
    semantics). ``nodes``: one row per node (isolated nodes keep the base
    rank). Deterministic: pure column arithmetic + joins, no sampling.
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
        ranks = nodes.select(node_col).join(contrib, node_col, "left").select(
            F.col(node_col),
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("_c"), F.lit(0.0))).alias("_r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(node_col, F.col("_r").alias("pagerank"))
