"""Scale probe for operators/graph.py::connected_components.

Builds an adversarial graph — long chains (the diameter regime that kills
min-label propagation) mixed with hub components (the skew regime) — at
millions of edges, runs CC, and asserts exact cluster labels (computable
in closed form from the generator). Reports star rounds + wall time:
the large-star/small-star claim is O(log n) rounds independent of
diameter, so chains of length 10^4 should converge in ~15 rounds, not
10^4.

Usage: python scripts/cc_probe.py [n_chains] [chain_len] [n_hubs] [hub_size]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_hubs = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    hub_size = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000

    from arxiv_crawler_spark.operators import graph as G
    from arxiv_crawler_spark.session import get_spark

    spark = get_spark(app_name="cc-probe")

    # chains: node ids [c*chain_len, (c+1)*chain_len); edges i -> i+1
    chain_edges = (
        spark.range(n_chains * chain_len)
        .filter((F.col("id") % chain_len) != chain_len - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    # hubs: offset ids; hub h center -> hub_size-1 spokes (max skew)
    hub_base = n_chains * chain_len
    hub_edges = (
        spark.range(n_hubs * hub_size)
        .filter((F.col("id") % hub_size) != 0)
        .select(
            (F.lit(hub_base) + (F.col("id") / hub_size).cast("long") * hub_size).alias("src"),
            (F.lit(hub_base) + F.col("id")).alias("dst"),
        )
    )
    edges = chain_edges.union(hub_edges).repartition(32)
    n_edges = edges.count()

    # instrument round count via a thin wrapper around the star steps
    rounds = [0]
    orig = G._small_star

    def counting_small_star(e):
        rounds[0] += 1
        return orig(e)

    G._small_star = counting_small_star
    t0 = time.monotonic()
    cc = G.connected_components(edges).cache()
    n_nodes = cc.count()
    elapsed = time.monotonic() - t0
    G._small_star = orig

    # exact expectation: chain c -> min id c*chain_len; hub h -> its center
    bad = cc.filter(
        F.when(
            F.col("node") < hub_base,
            F.col("cluster_id") != (F.col("node") / chain_len).cast("long") * chain_len,
        ).otherwise(
            F.col("cluster_id")
            != F.lit(hub_base) + ((F.col("node") - hub_base) / hub_size).cast("long") * hub_size
        )
    ).count()
    n_clusters = cc.select("cluster_id").distinct().count()

    result = {
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "n_chains": n_chains,
        "chain_len": chain_len,
        "n_hubs": n_hubs,
        "hub_size": hub_size,
        "expected_clusters": n_chains + n_hubs,
        "found_clusters": n_clusters,
        "mislabeled": bad,
        "star_rounds": rounds[0],
        "seconds": round(elapsed, 2),
        "edges_per_sec": round(n_edges / elapsed),
    }
    assert bad == 0, f"{bad} mislabeled nodes"
    assert n_clusters == n_chains + n_hubs
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
