"""Distributed exact global ordering — dense row index with no
single-partition window.

``global_row_index`` generalizes the value-bucketed rank scheme of
crawl/frontier.py ``_bucketed_rank`` (quantile-style boundary literals +
per-bucket offsets) from its scalar-priority special case to an arbitrary
composite sort key, so pipelines that need the reference's
``with_row_index`` semantics (build_embeddings_dataset.py:91) get an exact
0-based dense index that scales: every window in the plan is partitioned
by bucket, never global.

Scheme (all decisions are plan literals — deterministic across jobs and
recomputations, unlike ``repartitionByRange`` whose boundary *sampling* can
differ between the offset-collect job and the final evaluation):

1. pack the sort columns into one struct key (Spark orders structs
   lexicographically — the same comparator ``min(struct(...))`` uses);
2. draw a deterministic hash-mod sample of keys (bounded:
   ~``sample_per_bucket`` keys per bucket), sort it driver-side, and take
   every (len/n_buckets)-th key as a boundary — baked into the plan as
   struct literals;
3. bucket id = number of boundaries strictly below the row's key — a pure
   function of the row value, monotone in the sort order (equal keys share
   a bucket), so (bucket asc, within-bucket order) IS the global order;
4. one ≤ n_buckets-row collect of per-bucket counts → rank offsets;
   ``row_number`` over ``Window.partitionBy(bucket)`` + offset gives the
   exact dense global index with every window bounded to one bucket.

Cost: three extra passes over the input (count, sample, bucket counts)
plus the final evaluation — persist the input upstream if it is expensive
to recompute. Sort columns must be non-null (null ordering would diverge
between the driver-side boundary sort and Spark's comparator); coalesce
upstream if needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_index"]


def global_row_index(
    df: DataFrame,
    order_cols: list[str],
    *,
    index_col: str = "idx",
    n_buckets: int | None = None,
    sample_per_bucket: int = 64,
) -> DataFrame:
    """Append an exact dense 0-based global row index over ``order_cols``.

    Equivalent to ``row_number() over (order by order_cols) - 1`` but with
    no single-partition window anywhere in the plan. ``order_cols`` should
    be (near-)unique — ties get an arbitrary but valid dense numbering
    within their tie group, like ``row_number`` itself.
    """
    sess = df.sparkSession
    if n_buckets is None:
        n_buckets = max(2, sess.sparkContext.defaultParallelism)
    names = [f"_k{i}" for i in range(len(order_cols))]
    key = F.struct(*[F.col(c).alias(n) for c, n in zip(order_cols, names)])
    keyed = df.withColumn("_key", key)
    key_fields = keyed.schema["_key"].dataType.fields

    n = keyed.count()
    if n == 0:
        return df.withColumn(index_col, F.lit(None).cast("long"))

    # deterministic hash-mod sample of keys (expected n_buckets·sample_per_bucket)
    mod = max(1, n // (n_buckets * sample_per_bucket))
    sample = sorted(
        tuple(r["_key"])
        for r in keyed.select("_key")
        .filter(F.pmod(F.xxhash64("_key"), F.lit(mod)) == 0)
        .collect()
    )
    boundaries: list[tuple] = []
    for j in range(1, n_buckets):
        b = sample[(j * len(sample)) // n_buckets] if sample else None
        if b is not None and (not boundaries or b != boundaries[-1]):
            boundaries.append(b)

    def _lit_key(vals: tuple) -> Column:
        return F.struct(
            *[F.lit(v).cast(f.dataType).alias(f.name) for v, f in zip(vals, key_fields)]
        )

    if boundaries:
        barr = F.array(*[_lit_key(b) for b in boundaries])
        bucket = F.size(F.filter(barr, lambda b: b < F.col("_key")))
    else:  # degenerate sample (tiny or all-equal input): single bucket
        bucket = F.lit(0)
    bk = keyed.withColumn("_bk", bucket)

    counts = sorted(
        (row["_bk"], row["c"])
        for row in bk.groupBy("_bk").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for b, c in counts:
        offsets[b] = acc
        acc += c
    omap = F.create_map(*[F.lit(v) for b in offsets for v in (b, offsets[b])])
    w = Window.partitionBy("_bk").orderBy(*[F.asc(c) for c in order_cols])
    return (
        bk.withColumn(
            index_col,
            (F.row_number().over(w).cast("long") + omap[F.col("_bk")] - 1),
        )
        .drop("_key", "_bk")
    )
