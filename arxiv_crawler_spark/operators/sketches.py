"""Mergeable corpus sketches: HyperLogLog distinct counting and
count-min-sketch frequency estimation.

At 100 TB the questions "how many distinct URLs/tokens" and "roughly how
often does this n-gram occur" must be answered without materializing a
corpus-sized distinct set or a full frequency table. Both sketches here
are classic mergeable summaries (Flajolet et al. 2007 HLL; Cormode &
Muthukrishnan 2005 CMS) expressed as plain DataFrame aggregations, so
Spark's partial aggregation builds per-partition sketches map-side and
the exchange carries only the sketch cells:

- HLL: one pass, groupBy over m = 2^p register ids (the exchange is at
  most m rows regardless of input size), then a single-row fold.
  Registers merge across shards/days/streams by ``max`` — ``hll_merge``.
- CMS: one pass, groupBy over d*w cells; estimates probe the (tiny)
  sketch with a broadcast join. Cells merge by ``sum``.

Unlike Spark's built-in ``approx_count_distinct`` (HLL++, whose register
layout is opaque to other engines — see x56's semantic-only oracle), this
HLL is built from the md5-60 hash bridge, so DuckDB replays every
register and the final estimate bit-for-bit: q96/q97 are full value-hash
oracles for sketch construction AND estimation.

Determinism notes (the q90 fixed-point recipe): all per-register /
per-cell arithmetic is integer (2^(SCALE-Mj) register weights summed as
BIGINT — float-summation-order-proof); the only float steps are one
literal-coefficient division and, on the linear-counting branch, one
``ln`` — rounded to integer micro-units at the end.

No reference analog (the reference's single-node dict counters are the
semantic baseline: exact counting at small scale); parity with exact
counts is asserted in tests and carried as witness columns by q96/q97.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arxiv_crawler_spark.functions.hashing import md5_hash64

__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_registers_by",
    "hll_estimate_by",
    "quantile_bins",
    "quantile_estimates",
    "cms_build",
    "cms_merge",
    "cms_query",
]

_HASH_BITS = 60  # md5_hash64 yields a non-negative 60-bit value


def _alpha(m: int) -> float:
    """HLL bias-correction constant (Flajolet et al. 2007, fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str = "url", p: int = 8) -> DataFrame:
    """One-pass HLL register table for ``count_distinct(col)``.

    The 60-bit md5 hash splits into a p-bit register id (top bits) and a
    (60-p)-bit tail; the register records the max over items of
    ``rho`` = 1 + leading zeros of the tail (tail 0 → rho = 61-p, the
    saturated value). Returns (reg int, mj int) with ≤ 2^p rows — the
    shuffle after the map-side partial max is bounded by m, never by
    |df|. Tail zero-count comes from ``length(bin(tail))``, identical in
    Spark and DuckDB, which is what makes q96 hash-replayable.
    """
    tail_bits = _HASH_BITS - p
    h = md5_hash64(F.col(col))
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    rho = F.when(tail == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits + 1) - F.length(F.bin(tail))
    )
    return (
        df.select(
            F.shiftright(h, tail_bits).cast("int").alias("reg"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("mj"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union register tables built by :func:`hll_registers` over disjoint
    (or overlapping — HLL is idempotent) slices: per-register ``max``.
    This is the cross-shard / cross-day / streaming combine step."""
    it = iter(register_tables)
    out = next(it)
    for t in it:
        out = out.unionByName(t)
    return out.groupBy("reg").agg(F.max("mj").alias("mj"))


def _fold_aggs(m: int, scale: int) -> list:
    """The two register-fold aggregates: live-register count and the
    exact-BIGINT indicator sum Σ_j 2^(SCALE - M_j) over all m registers
    (absent rows are M_j = 0) — float-summation-order-proof."""
    return [
        F.count("*").cast("long").alias("nonzero_regs"),
        (
            F.sum(F.pow(F.lit(2.0), F.lit(scale) - F.col("mj")).cast("long"))
            + (F.lit(m) - F.count("*")) * F.lit(1 << scale)
        ).alias("sumw"),
    ]


def _est_micro(m: int, scale: int):
    """Estimate column over folded (nonzero_regs, sumw): the raw
    ``alpha_m · m² / Z`` (Z = sumw / 2^SCALE) collapses to one double
    division ``A / sumw`` with the driver-side literal
    A = alpha_m · m² · 2^SCALE; the small-range branch is linear counting
    ``m · ln(m / zeros)``. Integer micro-units (round half-up) — the
    hash-stable form every oracle replays."""
    a_lit = float(_alpha(m)) * m * m * float(1 << scale)
    zeros = F.lit(m) - F.col("nonzero_regs")
    raw = F.lit(a_lit) / F.col("sumw").cast("double")
    est = F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return F.round(est * F.lit(1000000.0)).cast("long").alias("est_micro")


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Fold a register table into the HLL cardinality estimate: single
    row (m, nonzero_regs, sumw, est_micro) — see :func:`_fold_aggs` /
    :func:`_est_micro` for the exact arithmetic contract."""
    m = 1 << p
    scale = _HASH_BITS - p + 1
    return registers.agg(*_fold_aggs(m, scale)).select(
        F.lit(m).alias("m"), "nonzero_regs", "sumw", _est_micro(m, scale)
    )


def hll_registers_by(
    df: DataFrame, key_col: str, col: str = "url", p: int = 8
) -> DataFrame:
    """Grouped HLL registers: (key, reg, mj), ≤ 2^p rows per key — the
    per-key form of :func:`hll_registers` for "distinct URLs per host" /
    "distinct tokens per source" questions where an exact per-key
    countDistinct would shuffle the corpus. The exchange after the
    map-side partial max is ≤ |keys|·m rows; merging across shards is
    the same per-(key, reg) max."""
    tail_bits = _HASH_BITS - p
    h = md5_hash64(F.col(col))
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    rho = F.when(tail == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits + 1) - F.length(F.bin(tail))
    )
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.shiftright(h, tail_bits).cast("int").alias("reg"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("key", "reg")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate_by(registers: DataFrame, p: int = 8) -> DataFrame:
    """Per-key estimates over :func:`hll_registers_by` output:
    (key, nonzero_regs, sumw, est_micro) — identical arithmetic to
    :func:`hll_estimate`, one row per key."""
    m = 1 << p
    scale = _HASH_BITS - p + 1
    return registers.groupBy("key").agg(*_fold_aggs(m, scale)).select(
        "key", "nonzero_regs", "sumw", _est_micro(m, scale)
    )


def quantile_bins(df: DataFrame, col: str, n_sub: int = 16) -> DataFrame:
    """Mergeable quantile histogram over a non-negative integer column:
    log₂ bins split into ``n_sub`` equal sub-bins — bin key
    ``b·n_sub + s`` with b = ⌊log₂ x⌋ (from ``length(bin(x))``, the same
    cross-engine trick as the HLL rho) and s = ⌊(x − 2^b)·n_sub / 2^b⌋;
    x = 0 keys bin −1. Relative bin width is 1/n_sub ≈ 6% at the default,
    which bounds the quantile estimate's relative error the way t-digest
    does — but deterministically and engine-replayably, where Spark's
    ``approx_percentile`` sketch is opaque (the x56 story, for
    percentiles). Returns (bin, cnt): ≤ ~64·n_sub rows however large the
    input; shards merge by per-bin sum."""
    x = F.col(col).cast("long")
    b = F.length(F.bin(x)) - 1
    p2 = F.pow(F.lit(2.0), b).cast("long")
    key = F.when(x <= 0, F.lit(-1)).otherwise(
        b * n_sub + F.floor((x - p2) * n_sub / p2)
    )
    return (
        df.select(key.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_estimates(
    bins: DataFrame, qs: list[float] = (0.5, 0.9, 0.99), n_sub: int = 16
) -> DataFrame:
    """Quantile point estimates from a :func:`quantile_bins` histogram:
    for each q, rank ⌈q·N⌉ is located in the cumulative bin counts and
    linearly interpolated inside its bin — (q, n, est_micro), one row per
    requested quantile, all arithmetic a fixed sequence of exact-integer
    and literal double ops (hash-replayable). The cumsum window runs over
    the ≤ ~64·n_sub-row histogram — a bounded table by construction,
    never the data."""
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin", "cnt", F.sum("cnt").over(w).alias("cum")
    ).crossJoin(F.broadcast(bins.agg(F.sum("cnt").alias("n"))))
    qdf = cum.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    j = cum.crossJoin(F.broadcast(qdf)).filter(
        (F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        & ((F.col("cum") - F.col("cnt")) < F.ceil(F.col("q") * F.col("n")))
    )
    b = F.floor(F.col("bin") / n_sub)
    s = F.col("bin") % n_sub
    p2 = F.pow(F.lit(2.0), b)
    low = p2 + s.cast("double") * (p2 / F.lit(float(n_sub)))
    width = p2 / F.lit(float(n_sub))
    target = F.ceil(F.col("q") * F.col("n")).cast("double")
    est = F.when(F.col("bin") < 0, F.lit(0.0)).otherwise(
        low + width * ((target - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
    )
    return j.select(
        "q",
        F.col("n"),
        F.round(est * F.lit(1000000.0)).cast("long").alias("est_micro"),
    ).orderBy("q")


def cms_build(df: DataFrame, col: str = "token", d: int = 4, w: int = 512) -> DataFrame:
    """Count-min sketch of the ``col`` value stream: d independent rows of
    w counters; item increments cell (r, md5_60(item || '#cms' || r) % w)
    in every row. Returns (r, bucket, cnt) with ≤ d·w rows — like the HLL
    registers, the post-combine exchange is bounded by the sketch size,
    not the stream. Cells merge across shards by ``sum`` (:func:`cms_merge`).
    """
    rows = F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r")
    item = F.col(col)
    keyed = df.select(item.alias("_it"), rows).select(
        F.col("r"),
        (md5_hash64(F.concat(F.col("_it"), F.lit("#cms"), F.col("r").cast("string"))) % w)
        .cast("int")
        .alias("bucket"),
    )
    return keyed.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Combine CMS cell tables over stream slices: per-cell ``sum``."""
    it = iter(sketches)
    out = next(it)
    for t in it:
        out = out.unionByName(t)
    return out.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    queries: DataFrame,
    col: str = "token",
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Point-estimate stream frequencies for the query items:
    ``est = min_r sketch[r][h_r(item)]`` (absent cell → 0). Always an
    overestimate of the true count — the CMS guarantee, asserted in tests
    and carried as a witness column by q97.

    The sketch side is ≤ d·w rows by construction, so the probe is a
    broadcast join regardless of corpus size; the query side stays
    partitioned. One groupBy on the query key folds the d probes.
    """
    probes = queries.select(F.col(col).alias("_q")).distinct()
    rows = F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r")
    keyed = probes.select("_q", rows).select(
        "_q",
        F.col("r"),
        (md5_hash64(F.concat(F.col("_q"), F.lit("#cms"), F.col("r").cast("string"))) % w)
        .cast("int")
        .alias("bucket"),
    )
    joined = keyed.join(F.broadcast(sketch), ["r", "bucket"], "left")
    return (
        joined.groupBy("_q")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
        .select(F.col("_q").alias(col), "cm_est")
    )
