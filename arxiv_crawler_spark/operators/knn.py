"""Similarity search over embedding columns (array<float>).

Reference analog: FAISS ``IndexFlatIP`` exact top-k (search.py:60-96) and
the overfetch-then-filter-self pattern (browser/app.py:177-189). Here:

* ``brute_force_topk`` — the exact baseline: broadcast the (small) query
  side as a dense float64 matrix, score whole Arrow batches of the corpus
  with one BLAS matmul each (mapInPandas), emit only per-batch top-k
  candidates, per-query window top-k in the JVM. This is the oracle-
  checkable operator (W6 in SURVEY.md §2.5).
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets with
  multi-probe (Hamming-≤1 buckets). The corpus is scored only inside
  probed buckets, so cost drops from |Q|·|C| to |Q|·|C|/2^p·(p+1).
  Recall vs the exact baseline is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine",
    "brute_force_topk",
    "lsh_topk",
    "lsh_near_pairs",
    "AnnIndex",
    "ivf_build",
    "ivf_search",
    "ivf_topk",
    "pq_build",
    "pq_search",
    "pq_topk",
    "ivfpq_build",
    "ivfpq_search",
    "ivf_pq_topk",
    "recall_at_k",
    "save_index",
    "load_index",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos, rank).

    Deterministic rank order: cosine desc, neighbor_id asc. Self-matches are
    excluded via the reference's overfetch+filter pattern (app.py:177-189)
    — here simply a predicate before ranking.
    """
    # Round-7 optimization (guide §4.2): the old shape broadcast the query
    # side and scored |Q|·|C| pairs with interpreted zip_with/aggregate
    # lambdas — ~100 ns per element-op, 31 s at |Q|≈4k, |C|=20k, d=64. The
    # query side is (by the operator's own contract) small enough to
    # broadcast, so ship it to every task as a dense float64 matrix and
    # score whole Arrow batches of the corpus with one BLAS matmul per
    # batch instead. Each batch emits only the rows that can possibly
    # reach the global top-k — everything ≥ the batch's k-th (k+1-th when
    # a self-match may be dropped later) largest cosine per query, ties at
    # the cut included — and the exact (cos desc, neighbor_id asc) rank
    # with its tie-break stays in the JVM window below, so ordering
    # semantics (including string-id collation) never depend on numpy.
    # Proof of exactness: if a global top-k row were cut in its batch,
    # ≥k rows in that batch alone would beat it strictly on cosine
    # (+1 spare absorbs the one self row filtered afterwards).
    spark = queries.sparkSession
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qid_type = dict(queries.dtypes)[id_col]
    nid_type = dict(corpus.dtypes)[id_col]
    qids = np.array([r[0] for r in q_rows])
    qm = np.array([r[1] for r in q_rows], dtype=np.float64)
    if qm.size:
        qn = np.sqrt((qm * qm).sum(axis=1))
    else:
        qm = qm.reshape(0, 1)
        qn = np.zeros(0)
    bq = spark.sparkContext.broadcast((qids, qm, qn))
    n_spare = 1 if exclude_self else 0
    kk = k + n_spare

    def score(batches):
        ids, mat, nq = bq.value
        m = len(ids)
        for pdf in batches:
            b = len(pdf)
            if b == 0 or m == 0:
                continue
            cm = np.array(pdf.iloc[:, 1].tolist(), dtype=np.float64)
            cn = np.sqrt((cm * cm).sum(axis=1))
            s = (cm @ mat.T) / (cn[:, None] * nq[None, :])
            if b > kk:
                cut = np.partition(s, b - kk, axis=0)[b - kk, :]
                ci, cj = np.nonzero(s >= cut[None, :])
            else:
                ci, cj = np.nonzero(np.ones_like(s, dtype=bool))
            yield pd.DataFrame(
                {
                    "query_id": ids[cj],
                    "neighbor_id": pdf.iloc[:, 0].values[ci],
                    "cos": s[ci, cj],
                }
            )

    c = _ensure_parallelism(corpus.select(F.col(id_col), F.col(vec_col)))
    scored = c.mapInPandas(
        score, schema=f"query_id {qid_type}, neighbor_id {nid_type}, cos double"
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    return _rank_topk(scored, k)


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin a corpus that arrives under-partitioned (a small
    parquet file reads as ONE partition, serializing the whole broadcast
    scoring join onto one core). A corpus that already has ≥ the session's
    parallelism — any real-scale input — passes through untouched, so no
    shuffle is added where Catalyst's layout is already right."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float)


def _bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """LSH bucket id = sign bits of projections onto fixed random planes —
    planes are baked into the plan as array literals (JVM-side dot products,
    deterministic across runs and executors)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec, plane) > 0, F.lit(1 << i).cast("int")).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 3,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table, multi-probe hyperplane LSH.

    ``n_tables`` independent hash tables (each ``n_planes`` random
    hyperplanes); a corpus vector is a candidate if it lands in the query's
    bucket — or any Hamming-distance-1 probe of it — in *any* table.
    Candidates are deduplicated across tables before ranking, so each pair
    is scored once. Recall vs the exact baseline rises roughly as
    1-(1-p)^L with table count L; the default (4 planes × 3 tables, H≤1
    probes) is tuned to ≥0.8 recall@5 on the synthetic embeddings
    (asserted in tests/test_operators.py) while scoring only a fraction of
    the corpus per query.
    """
    c0 = _ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            _norm(F.col(vec_col)).alias("_cn"),  # norm once per side, per table
        )
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    per_table = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1009 * t)
        c = c0.withColumn("bucket", _bucket_expr(F.col("cv"), planes))
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        q = q0.withColumn("qbucket", _bucket_expr(F.col("qv"), planes)).withColumn(
            "probe", F.explode(probes)
        )
        per_table.append(
            F.broadcast(q)
            .join(c, q.probe == c.bucket)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn(
                "cos", _dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))
            )
            .select("query_id", "neighbor_id", "cos")
        )
    scored = per_table[0]
    for s in per_table[1:]:
        scored = scored.unionByName(s)
    # dedup candidates found by several tables/probes (cos is identical)
    scored = scored.groupBy("query_id", "neighbor_id").agg(F.max("cos").alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _lloyd_kmeans(x: np.ndarray, k: int, iters: int = 12, seed: int = 42) -> np.ndarray:
    """Seeded Lloyd's k-means on L2-normalized vectors (spherical k-means —
    the IVF coarse quantizer). Deterministic: fixed init, fixed iteration
    count. Runs driver-side on a bounded SAMPLE, exactly like FAISS trains
    its IVF quantizer on a training subset (search.py:60-75's IndexFlatIP
    generalized)."""
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def _cell_dots(vec: Column, cents: np.ndarray) -> Column:
    """Array of cosine(vec, centroid_i) — centroids are unit-norm literals,
    so dot/|vec| is the cosine; |vec| cancels inside argmax either way."""
    return F.array(
        *[_dot(vec, F.array(*[F.lit(float(v)) for v in c])) for c in cents]
    )


def _probes_expr(vec: Column, cents: np.ndarray, n_probe: int) -> Column:
    """The ``n_probe`` closest cell ids for a query vector: sort
    (dot desc, idx asc) structs, slice, project the ids."""
    pairs = F.transform(
        _cell_dots(vec, cents),
        lambda v, i: F.struct(v.alias("v"), i.cast("int").alias("i")),
    )
    ordered = F.array_sort(
        pairs,
        lambda a, b: F.when(a["v"] > b["v"], F.lit(-1))
        .when(a["v"] < b["v"], F.lit(1))
        .otherwise((a["i"] - b["i"]).cast("int")),
    )
    return F.transform(F.slice(ordered, 1, n_probe), lambda s: s["i"])


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _train_sample(
    corpus: DataFrame, id_col: str, vec_col: str, sample_size: int
) -> np.ndarray:
    """Deterministic hash-pruned training sample: a pmod(xxhash64(id), p)
    predicate keeps an expected 4·sample_size pseudo-random rows at the
    scan, so the ordering that pins determinism sorts ~8k rows — never a
    full-corpus TakeOrdered (the count is a cheap metadata/column-pruned
    pass; the kmeans stays a bounded driver-side collect, FAISS-style)."""
    n_corpus = corpus.count()
    p = max(1, n_corpus // (4 * sample_size))
    cand = corpus.select(id_col, vec_col)
    if p > 1:
        cand = cand.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(p)) == 0)
    return np.array(
        [
            r[0]
            for r in cand.select(vec_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )


class AnnIndex:
    """A built ANN index — the FAISS ``train``/``add`` vs ``search`` split.

    Building runs the expensive one-offs (corpus count, bounded sample
    collect, driver-side k-means, full-corpus encode) ONCE; every
    subsequent ``*_search`` call reuses the encoded index DataFrame and the
    quantizer literals with zero driver-side work. At 100 TB the index is
    what you persist (4+m bytes/vector for IVFPQ) and share across query
    batches — retraining per query batch would re-scan the corpus every
    time (round-4 verdict, What's wrong #3).

    ``index`` (the encoded corpus): ivf → (neighbor_id, cv, cell);
    pq → (neighbor_id, codes); ivfpq → (neighbor_id, cell, codes).
    ``vectors``: (neighbor_id, cv), fetched only for the bounded exact
    re-rank (pq/ivfpq). ``cents``/``books``: quantizer parameters, baked
    into each search plan as array literals (JVM-side, deterministic).
    """

    def __init__(
        self,
        kind: str,
        index: DataFrame,
        vectors: DataFrame | None = None,
        cents: np.ndarray | None = None,
        books: list[np.ndarray] | None = None,
        sub: int = 0,
        persisted: bool = False,
    ):
        self.kind = kind
        self.index = index
        self.vectors = vectors
        self.cents = cents
        self.books = books
        self.sub = sub
        self._persisted = persisted

    def unpersist(self) -> "AnnIndex":
        if self._persisted:
            self.index.unpersist()
            self._persisted = False
        return self


def ivf_build(
    corpus: DataFrame,
    n_cells: int = 16,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
) -> AnnIndex:
    """Train the IVF coarse quantizer (spherical k-means on a bounded
    sample) and encode the corpus into its cells. Like FAISS ``IVFFlat``,
    the inverted lists carry the full vectors — scoring happens inside
    probed cells without a second fetch."""
    sample = _train_sample(corpus, id_col, vec_col, sample_size)
    cents = _lloyd_kmeans(sample, n_cells, seed=seed)
    # vector norms are part of the index (computed once at build, not per
    # scored pair at search time)
    enc = _encode_udf(cents, None, 0, want_norm=True)
    st = enc(F.col(vec_col))
    index = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        st["nrm"].alias("_cn"),
        st["cell"].alias("cell"),
    )
    if persist:
        index = index.persist()
    return AnnIndex("ivf", index, cents=cents, persisted=persist)


def ivf_search(
    index: AnnIndex,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a prebuilt IVF index: score each query only against its
    ``n_probe`` argmax-cosine cells. Cost ≈ |Q|·|C|·n_probe/n_cells; no
    driver-side work, no training — reuse across query batches is free."""
    n_probe = min(n_probe, len(index.cents))
    probes = _probes_expr(F.col(vec_col), index.cents, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("_qn"),
        F.explode(probes).alias("cell"),
    )
    has_cn = "_cn" in index.index.columns  # older persisted indexes lack it
    scored = (
        F.broadcast(q)
        .join(index.index, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            _dot(F.col("qv"), F.col("cv"))
            / (F.col("_qn") * (F.col("_cn") if has_cn else _norm(F.col("cv")))),
        )
    )
    return _rank_topk(scored, k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot IVF convenience: ``ivf_build`` + ``ivf_search`` (identical
    plan and results to the split path — the wrapper exists for the
    query-shaped oracle surface). Production reuse is build-once/
    search-many via the split API; recall asserted ≥ 0.85 in
    tests/test_operators.py."""
    ix = ivf_build(
        corpus,
        n_cells=n_cells,
        sample_size=sample_size,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        persist=False,
    )
    return ivf_search(ix, queries, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col)


def lsh_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 4,
    n_tables: int = 3,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs WITHOUT the all-pairs join —
    the scale path behind q39's exact form.

    Candidate pairs = rows sharing a hyperplane-LSH bucket in ANY of the
    ``n_tables`` independent tables; only candidates get the cosine, and
    only the shuffle on (table, bucket) keys ever moves data. Expected cost
    ≈ n_tables · |C|² / 2^n_planes instead of |C|²; recall vs the exact
    all-pairs form is asserted ≥ 0.8 in tests/test_operators.py. Buckets
    larger than ``max_bucket`` are dropped (same boilerplate guard as
    operators/dedup.py — audit before raising).

    Returns (id_a, id_b, cos) with id_a < id_b and cos ≥ threshold.
    """
    tabled = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1009 * t)
        tabled.append(
            corpus.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
                F.lit(t).alias("table"),
                _bucket_expr(F.col(vec_col), planes).alias("bucket"),
            )
        )
    b = tabled[0]
    for s in tabled[1:]:
        b = b.unionByName(s)
    if max_bucket is not None:
        wc = Window.partitionBy("table", "bucket")
        b = (
            b.withColumn("_bsz", F.count(F.lit(1)).over(wc))
            .filter(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    l, r = b.alias("l"), b.alias("r")
    # Score INSIDE the bucket join (both vectors are already co-located in
    # the joined row — the cosine costs no extra shuffle), drop the vectors,
    # THEN dedupe the multi-table collisions. The dedupe is the only wide
    # exchange after the bucket join, and it carries (id_a, id_b, cos) —
    # 24 bytes — not two 64-float payloads; at 100-TB corpus scale the
    # vector payload would dominate that shuffle. cos is a deterministic
    # function of the pair, so deduping after scoring keeps one identical
    # row per pair; filtering cos < threshold *before* the dedupe shrinks
    # the exchange further without changing the result.
    return (
        l.join(
            r,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            cosine(F.col("l.v"), F.col("r.v")).alias("_cos"),
        )
        .filter(F.col("_cos") >= threshold)  # unrounded, same convention as q39
        # a pair can collide in several tables — keep each pair once
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", F.round("_cos", 6).alias("cos"))
    )


def _lloyd_kmeans_l2(x: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Plain Euclidean Lloyd's k-means (the PQ sub-quantizer trainer —
    subvectors are NOT unit-norm, so spherical k-means is wrong here).
    Deterministic: fixed init, fixed iterations."""
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _encode_udf(cents, books, sub: int, want_norm: bool = False):
    """Vectorized Arrow encode pass over the corpus — the FAISS-shaped
    build hot path (quantizer parameters closed over as numpy, one BLAS
    matmul per subspace per batch).

    The pure-expression formulation (argmax over m·k_sub ``_dot`` terms)
    cannot whole-stage-codegen — higher-order functions are interpreted,
    so the inlined normalization re-runs inside every dot term — and
    profiled ~34 ms/row; this batch path is ~µs/row, and a full-corpus
    encode is exactly where the input contract's "vectorized pandas/Arrow
    UDFs (no per-row Python)" rule bites at 10^10 vectors. Deterministic:
    float64, first-index argmax (the same tie-break as
    ``array_position(scores, array_max(scores))``).

    Returns a struct-valued UDF with the requested fields among
    ``cell:int`` (argmax-cosine coarse cell, 0-based), ``codes:
    array<int>`` (per-subspace PQ codes, 1-based / element_at-ready, from
    argmax of ⟨x_sub, c⟩ − |c|²/2 on the L2-normalized vector) and
    ``nrm:double`` (the vector's L2 norm)."""
    from pyspark.sql.functions import pandas_udf

    C = None if cents is None else np.asarray(cents, dtype=np.float64)
    B = None if books is None else [np.asarray(b, dtype=np.float64) for b in books]
    half = None if B is None else [0.5 * np.einsum("ij,ij->i", b, b) for b in B]
    fields = (
        ([] if C is None else ["cell int"])
        + ([] if B is None else ["codes array<int>"])
        + (["nrm double"] if want_norm else [])
    )

    @pandas_udf(", ".join(fields))
    def enc(v: pd.Series) -> pd.DataFrame:
        out = {}
        if len(v) == 0:
            if C is not None:
                out["cell"] = pd.Series([], dtype="int32")
            if B is not None:
                out["codes"] = pd.Series([], dtype=object)
            if want_norm:
                out["nrm"] = pd.Series([], dtype="float64")
            return pd.DataFrame(out)
        x = np.stack(v.to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(x, axis=1)
        if C is not None:
            out["cell"] = pd.Series((x @ C.T).argmax(axis=1).astype(np.int32))
        if B is not None:
            xn = x / np.maximum(nrm, 1e-12)[:, None]
            codes = np.empty((len(x), len(B)), dtype=np.int32)
            for j, b in enumerate(B):
                codes[:, j] = (xn[:, j * sub : (j + 1) * sub] @ b.T - half[j]).argmax(
                    axis=1
                ) + 1
            out["codes"] = pd.Series(list(codes))
        if want_norm:
            out["nrm"] = pd.Series(nrm)
        return pd.DataFrame(out)

    return enc


def _lut_udf(books, sub: int):
    """Per-query ADC lookup table (the classic FAISS precomputation):
    ``lut[m][c] = ⟨q_sub_m, codebook_m[c]⟩`` as array<array<double>>,
    computed once per QUERY row below the broadcast exchange — the
    per-candidate score is then ``m`` array lookups (``_adc_from_lut``)
    instead of ``m`` interpreted dot products per (query, candidate)
    pair, which profiled ~40× slower on the flat scan."""
    from pyspark.sql.functions import pandas_udf

    B = [np.asarray(b, dtype=np.float64) for b in books]

    @pandas_udf("array<array<double>>")
    def lut(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.stack(v.to_numpy()).astype(np.float64)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        tabs = [xn[:, j * sub : (j + 1) * sub] @ b.T for j, b in enumerate(B)]
        return pd.Series([[t[i] for t in tabs] for i in range(len(x))])

    return lut


def _adc_from_lut(m: int) -> Column:
    """Σₘ lut[m][code_m] — the per-pair half of the ADC score; same term
    order (and thus bit-identical doubles) as summing the dot products
    inline."""
    adc = None
    for j in range(m):
        term = F.element_at(F.col("_lut")[j], F.col("codes")[j])
        adc = term if adc is None else adc + term
    return adc


def pq_build(
    corpus: DataFrame,
    m: int = 8,
    k_sub: int = 16,
    dim: int = 64,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
) -> AnnIndex:
    """Train per-subspace Euclidean k-means codebooks on the (normalized)
    bounded sample and encode the corpus to ``m``-byte codes. The index
    DataFrame carries (id, codes) only — 32× smaller than the vectors at
    m=8/dim=64; ``vectors`` stays a lazy reference used solely for the
    bounded exact re-rank."""
    sub = dim // m
    assert sub * m == dim, "dim must divide into m equal subspaces"
    sample = _train_sample(corpus, id_col, vec_col, sample_size)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    books = [
        _lloyd_kmeans_l2(sample[:, j * sub : (j + 1) * sub], k_sub, seed=seed + j)
        for j in range(m)
    ]
    enc = _encode_udf(None, books, sub)
    index = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        enc(F.col(vec_col))["codes"].alias("codes"),
    )
    vectors = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    if persist:
        index = index.persist()
    return AnnIndex("pq", index, vectors=vectors, books=books, sub=sub, persisted=persist)


def pq_search(
    index: AnnIndex,
    queries: DataFrame,
    k: int = 5,
    overfetch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a prebuilt PQ index: flat ADC scan over the codes (never the
    vectors), then exact re-rank of the ``overfetch·k`` shortlist. Output:
    exact cosine of the winners — same contract as ``brute_force_topk``."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _lut_udf(index.books, index.sub)(F.col(vec_col)).alias("_lut"),
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("_adc"), F.asc("neighbor_id"))
    shortlist = (
        F.broadcast(q)
        .crossJoin(index.index)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_adc", _adc_from_lut(len(index.books)))
        .withColumn("_ar", F.row_number().over(wa))
        .filter(F.col("_ar") <= overfetch * k)
        .select("query_id", "qv", "neighbor_id")
    )
    scored = shortlist.join(index.vectors, "neighbor_id").withColumn(
        "cos", cosine(F.col("qv"), F.col("cv"))
    )
    return _rank_topk(scored, k)


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    k_sub: int = 16,
    overfetch: int = 4,
    dim: int = 64,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot PQ (ADC + exact re-rank) — the MEMORY scale path next to
    ``lsh_topk`` (bucketing) and ``ivf_topk`` (cell pruning): a 64-float
    embedding is 256 B, its PQ code ``m`` bytes (m=8 → 32× smaller), so
    the scoring join ships (id, codes) only. Identical plan and results to
    ``pq_build`` + ``pq_search``; production reuse is the split API.
    Recall + re-rank exactness asserted in tests/test_operators.py."""
    ix = pq_build(
        corpus,
        m=m,
        k_sub=k_sub,
        dim=dim,
        sample_size=sample_size,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        # persist even in the one-shot path: an unmaterialized codes column
        # gets fused into the scan and the 128-dot encode re-runs per
        # (query, candidate) pair — profiled ~20× slower than the m-byte
        # cached codes.
        persist=True,
    )
    return pq_search(ix, queries, k=k, overfetch=overfetch, id_col=id_col, vec_col=vec_col)


def ivfpq_build(
    corpus: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    k_sub: int = 16,
    dim: int = 64,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
) -> AnnIndex:
    """FAISS-``IVFPQ`` build: one training sample, one encode pass — the
    index DataFrame carries (id, cell, codes), 4+m bytes of index per
    vector. Coarse centroids from spherical k-means on the raw sample, PQ
    codebooks from Euclidean k-means on the normalized sample."""
    sub = dim // m
    assert sub * m == dim, "dim must divide into m equal subspaces"
    sample = _train_sample(corpus, id_col, vec_col, sample_size)
    cents = _lloyd_kmeans(sample, n_cells, seed=seed)
    nsample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    books = [
        _lloyd_kmeans_l2(nsample[:, j * sub : (j + 1) * sub], k_sub, seed=seed + j)
        for j in range(m)
    ]
    enc = _encode_udf(cents, books, sub)
    st = enc(F.col(vec_col))
    index = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        st["cell"].alias("cell"),
        st["codes"].alias("codes"),
    )
    vectors = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    if persist:
        index = index.persist()
    return AnnIndex(
        "ivfpq", index, vectors=vectors, cents=cents, books=books, sub=sub, persisted=persist
    )


def ivfpq_search(
    index: AnnIndex,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    overfetch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a prebuilt IVFPQ index: BOTH pruning axes composed — the
    coarse quantizer prunes candidates to ``n_probe``/``n_cells`` of the
    corpus (compute axis), ADC scores ship ``m``-byte codes (memory axis),
    and a bounded exact re-rank restores true cosines. Per-query cost ≈
    |C|·(n_probe/n_cells) ADC lookups + ``overfetch·k`` vector fetches; at
    10^10 vectors neither the vectors nor an uncompressed index ever flow
    through the search plan."""
    n_probe = min(n_probe, len(index.cents))
    probes = _probes_expr(F.col(vec_col), index.cents, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probes).alias("cell"),
        _lut_udf(index.books, index.sub)(F.col(vec_col)).alias("_lut"),
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("_adc"), F.asc("neighbor_id"))
    shortlist = (
        F.broadcast(q)
        .join(index.index, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_adc", _adc_from_lut(len(index.books)))
        .withColumn("_ar", F.row_number().over(wa))
        .filter(F.col("_ar") <= overfetch * k)
        .select("query_id", "qv", "neighbor_id")
    )
    scored = shortlist.join(index.vectors, "neighbor_id").withColumn(
        "cos", cosine(F.col("qv"), F.col("cv"))
    )
    return _rank_topk(scored, k)


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_sub: int = 16,
    overfetch: int = 4,
    dim: int = 64,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot IVFPQ convenience: ``ivfpq_build`` + ``ivfpq_search``
    (identical plan and results to the split path). Production reuse is
    build-once/search-many; recall asserted in tests/test_operators.py."""
    ix = ivfpq_build(
        corpus,
        n_cells=n_cells,
        m=m,
        k_sub=k_sub,
        dim=dim,
        sample_size=sample_size,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        # persist even one-shot — see pq_topk: in-plan code re-encode per
        # candidate pair dominates otherwise.
        persist=True,
    )
    return ivfpq_search(
        ix, queries, k=k, n_probe=n_probe, overfetch=overfetch, id_col=id_col, vec_col=vec_col
    )


def recall_at_k(
    truth: DataFrame,
    topk: DataFrame,
    ks: tuple[int, ...] = (1, 5, 10),
) -> DataFrame:
    """Retrieval eval: recall@k of a top-k result against ground-truth
    relevance pairs — the queryable analog of the reference's eval harness
    (arxiv_search/scripts/eval.py + training.py:167-259, which reports KNN
    retrieval quality over the held-out citation split).

    ``truth``: (query_id, relevant_id) ground-truth pairs (e.g. the test
    split of the citation graph). ``topk``: (query_id, neighbor_id, rank)
    from any of the search operators (exact or ANN — evaluating an ANN
    index against the same truth measures its end-to-end recall).

    One left join truth→topk on (query, relevant) and ONE aggregation pass
    computes every k via conditional sums; the per-k rows are unpivoted
    with ``stack`` driver-free. Scale shape: |truth| rows through a single
    shuffle join against |Q|·k result rows — no per-k rescans.
    """
    ks = tuple(sorted(ks))
    ranked = topk.select(
        "query_id", F.col("neighbor_id").alias("relevant_id"), "rank"
    )
    joined = truth.select("query_id", "relevant_id").join(
        ranked, ["query_id", "relevant_id"], "left"
    )
    aggs = [
        F.count(F.when(F.col("rank") <= k, F.lit(1))).alias(f"hits_{k}") for k in ks
    ]
    row = joined.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_pairs"),
        *aggs,
    )
    stack_args = ", ".join(f"{k}, hits_{k}" for k in ks)
    return (
        row.select(
            "n_queries",
            "n_pairs",
            F.expr(f"stack({len(ks)}, {stack_args}) as (k, hits)"),
        )
        .withColumn("recall", F.round(F.col("hits") / F.col("n_pairs"), 6))
        .select("k", "n_queries", "n_pairs", "hits", "recall")
    )


def save_index(index: AnnIndex, path: str) -> None:
    """Persist a built index for reuse ACROSS jobs (FAISS ``write_index``):
    the encoded corpus as parquet (partitioned by cell where present, so a
    probe-join scan prunes to the probed cells) plus the quantizer
    parameters as a one-row JSON text file. Vectors are NOT duplicated —
    pq/ivfpq re-rank reads them from the corpus the caller passes to
    ``load_index`` (the index stays 4+m bytes/vector on disk)."""
    import json

    spark = index.index.sparkSession
    w = index.index.write.mode("overwrite")
    if "cell" in index.index.columns:
        w = w.partitionBy("cell")
    w.parquet(path + "/index")
    meta = {
        "kind": index.kind,
        "sub": index.sub,
        "cents": index.cents.tolist() if index.cents is not None else None,
        "books": [b.tolist() for b in index.books] if index.books is not None else None,
    }
    spark.createDataFrame([(json.dumps(meta),)], "v string").coalesce(1).write.mode(
        "overwrite"
    ).text(path + "/meta")


def load_index(
    spark,
    path: str,
    corpus: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> AnnIndex:
    """Load a persisted index. ``corpus`` re-attaches the vector source for
    the pq/ivfpq exact re-rank (ivf indexes carry their vectors inline)."""
    import json

    meta = json.loads(spark.read.text(path + "/meta").collect()[0]["value"])
    index = spark.read.parquet(path + "/index")
    vectors = None
    if corpus is not None:
        vectors = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
    return AnnIndex(
        meta["kind"],
        index,
        vectors=vectors,
        cents=np.array(meta["cents"]) if meta["cents"] is not None else None,
        books=[np.array(b) for b in meta["books"]] if meta["books"] is not None else None,
        sub=int(meta["sub"]),
    )
