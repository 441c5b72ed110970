"""Pure-numpy/python reference twin of the k-means ANN searches — the
VALUES-oracle builder for x61 (IVF), x68 (PQ), x69 (IVFPQ) and x71
(SemDeDup on the production quantizer).

The engine paths (operators/knn.py, operators/dedup.py::semdedup) mix two
float habitats, and this twin mirrors each op IN the habitat where the
engine computes it, so results are bit-identical, not just close:

* **Spark expression side** (``_dot``/``_norm``/``cosine``,
  ``_probes_expr``, the per-pair ADC sum): a sequential left fold over
  float64 — mirrored by :func:`seq_dot`/:func:`seq_norm` (plain
  ``acc += a_i*b_i`` loops; IEEE ops in the same order round the same).
* **Arrow UDF side** (``_encode_udf``/``_lut_udf``): numpy batch ops —
  mirrored by calling the *same* numpy expressions on the same float64
  matrices (per-row reductions are independent of batch composition, so
  micro-batch boundaries don't change bits).
* The k-means trainers themselves (``_lloyd_kmeans``/``_lloyd_kmeans_l2``)
  already run driver-side in the engine; the twin calls them directly —
  the x51 shared-kernel precedent (the oracle checks the distributed
  SEARCH plan against reference semantics, exactly like
  oracle/refcrawler.py checks the scheduler).

Reference anchor: the FAISS IndexFlatIP / IVF / PQ searches these model
(/root/reference/arxiv_search/src/arxiv_search/search.py:60-166).

Because the embeddings tables differ per sf dir, each oracle emits one
VALUES branch per known gate sf (0.001, 0.01), dispatched by an md5
signature of the ``embeddings`` view computed inside the SQL — an unknown
sf matches no branch and fails LOUDLY (0 rows) instead of passing silently.
"""

from __future__ import annotations

import functools
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

GATE_SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")

# must match the expression embedded in the oracle SQL (DuckDB side)
SIG_SQL = (
    "md5(string_agg(vec_id || ':' || embedding::VARCHAR, '|' ORDER BY vec_id))"
)


def seq_dot(a, b) -> float:
    """Spark's ``_dot``: left fold of elementwise float64 products."""
    acc = 0.0
    for p in (np.asarray(a, dtype=np.float64) * np.asarray(b, dtype=np.float64)).tolist():
        acc += p
    return acc


def seq_norm(a) -> float:
    """Spark's ``_norm``: sqrt of the left-folded square sum."""
    import math

    acc = 0.0
    for p in (np.asarray(a, dtype=np.float64) ** 2).tolist():
        acc += p
    return math.sqrt(acc)


def spark_round6(v: float) -> float:
    """Spark ``F.round(col, 6)``: BigDecimal.valueOf(double) (= shortest
    round-trip decimal, which is what ``repr`` gives in Python) rounded
    HALF_UP at scale 6, back to double."""
    return float(Decimal(repr(float(v))).quantize(Decimal("0.000001"), ROUND_HALF_UP))


@functools.lru_cache(maxsize=4)
def _load(sf_dir: str):
    """(ids int64 asc, X float64 (n,64) stacked from the float32 parquet —
    the exact widening both the engine collect and the Arrow UDFs apply),
    plus the DuckDB content signature the SQL dispatches on."""
    import duckdb
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    vecs = t.column("embedding").to_pylist()
    order = np.argsort(ids, kind="stable")
    ids = ids[order].astype(np.int64)
    X = np.stack([np.asarray(vecs[i], dtype=np.float32) for i in order]).astype(
        np.float64
    )
    sig = duckdb.sql(
        f"SELECT {SIG_SQL} FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    return ids, X, sig


def _sample(X: np.ndarray, sample_size: int = 2048) -> np.ndarray:
    """knn._train_sample at gate scale: n ≤ 4·sample_size ⇒ p = 1 (no hash
    pruning branch), so the sample is simply the first ``sample_size``
    vectors in id order."""
    n = len(X)
    assert n <= 4 * sample_size, (
        "gate tables are expected below the hash-pruning threshold; the "
        "pmod(xxhash64) branch is not replicated here"
    )
    return X[:sample_size].copy()


def _rank_topk_py(scored: list[tuple[int, float]], k: int) -> list[tuple[int, float, int]]:
    """knn._rank_topk: (cos desc, neighbor_id asc), row_number ≤ k."""
    scored.sort(key=lambda t: (-t[1], t[0]))
    return [(nid, cos, r + 1) for r, (nid, cos) in enumerate(scored[:k])]


def _probes(qv: np.ndarray, cents: np.ndarray, n_probe: int) -> list[int]:
    """knn._probes_expr: seq-fold dot per centroid, (dot desc, idx asc)."""
    dots = [(i, seq_dot(qv, cents[i])) for i in range(len(cents))]
    dots.sort(key=lambda t: (-t[1], t[0]))
    return [i for i, _ in dots[:n_probe]]


def ivf_topk_ref(
    sf_dir: str, k: int = 5, n_cells: int = 16, n_probe: int = 6, query_max: int = 10
):
    """x61's plan replayed: ivf_build (numpy cell assign + numpy norms,
    mirroring _encode_udf) + ivf_search (seq-fold probes and cosines).
    ``query_max``/``n_probe``/``k`` parameterize the x62 core too."""
    from arxiv_crawler_spark.operators.knn import _lloyd_kmeans

    ids, X, _ = _load(sf_dir)
    cents = _lloyd_kmeans(_sample(X), n_cells)
    cells = (X @ cents.T).argmax(axis=1)  # _encode_udf cell
    cn = np.linalg.norm(X, axis=1)  # _encode_udf nrm
    n_probe = min(n_probe, len(cents))
    out = []
    for qi in np.where(ids < query_max)[0]:
        qid, qv = int(ids[qi]), X[qi]
        qn = seq_norm(qv)  # query norm is SPARK-side in ivf_search
        probe = set(_probes(qv, cents, n_probe))
        scored = [
            (int(ids[j]), seq_dot(qv, X[j]) / (qn * cn[j]))
            for j in range(len(ids))
            if cells[j] in probe and ids[j] != qid
        ]
        out += [(qid, nid, spark_round6(c), r) for nid, c, r in _rank_topk_py(scored, k)]
    return out


def _codes(Xn: np.ndarray, books: list[np.ndarray], sub: int) -> np.ndarray:
    """_encode_udf PQ codes (1-based) on pre-normalized rows."""
    half = [0.5 * np.einsum("ij,ij->i", b, b) for b in books]
    codes = np.empty((len(Xn), len(books)), dtype=np.int64)
    for j, b in enumerate(books):
        codes[:, j] = (Xn[:, j * sub : (j + 1) * sub] @ b.T - half[j]).argmax(axis=1) + 1
    return codes


def _adc_shortlist(
    ids, qid, lut_rows, codes, cand_idx, cap: int
) -> list[int]:
    """The ADC window: seq-fold the m LUT terms per candidate, rank by
    (_adc desc, neighbor_id asc), keep ``cap``. Returns corpus indices."""
    adcs = []
    for j in cand_idx:
        acc = 0.0
        for sb in range(codes.shape[1]):
            acc += float(lut_rows[sb][codes[j, sb] - 1])
        adcs.append((int(ids[j]), acc, j))
    adcs.sort(key=lambda t: (-t[1], t[0]))
    return [j for _, _, j in adcs[:cap]]


def _rerank(ids, X, qv, short_idx, k):
    """pq/ivfpq exact re-rank: cosine() — BOTH norms seq-fold here."""
    qn = seq_norm(qv)
    scored = [
        (int(ids[j]), seq_dot(qv, X[j]) / (qn * seq_norm(X[j]))) for j in short_idx
    ]
    return _rank_topk_py(scored, k)


def _lut(qmat_n: np.ndarray, books: list[np.ndarray], sub: int):
    """_lut_udf tables for a batch of normalized query rows."""
    return [qmat_n[:, j * sub : (j + 1) * sub] @ b.T for j, b in enumerate(books)]


def pq_topk_ref(
    sf_dir: str, k: int = 5, m: int = 8, k_sub: int = 16, overfetch: int = 4, dim: int = 64
):
    """x68's plan replayed: pq_build (books on the normalized sample,
    numpy codes) + pq_search (numpy LUT, seq-fold ADC, exact re-rank)."""
    from arxiv_crawler_spark.operators.knn import _lloyd_kmeans_l2

    ids, X, _ = _load(sf_dir)
    sub = dim // m
    sample = _sample(X)
    nsample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    books = [
        _lloyd_kmeans_l2(nsample[:, j * sub : (j + 1) * sub], k_sub, seed=42 + j)
        for j in range(m)
    ]
    Xn = X / np.maximum(np.linalg.norm(X, axis=1), 1e-12)[:, None]
    codes = _codes(Xn, books, sub)
    qsel = np.where(ids < 10)[0]
    qmat_n = X[qsel] / np.maximum(
        np.linalg.norm(X[qsel], axis=1, keepdims=True), 1e-12
    )
    tabs = _lut(qmat_n, books, sub)
    out = []
    for row, qi in enumerate(qsel):
        qid, qv = int(ids[qi]), X[qi]
        cand = [j for j in range(len(ids)) if ids[j] != qid]
        lut_rows = [tabs[sb][row] for sb in range(m)]
        short = _adc_shortlist(ids, qid, lut_rows, codes, cand, overfetch * k)
        out += [
            (qid, nid, spark_round6(c), r) for nid, c, r in _rerank(ids, X, qv, short, k)
        ]
    return out


def ivfpq_topk_ref(
    sf_dir: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 6,
    m: int = 8,
    k_sub: int = 16,
    overfetch: int = 4,
    dim: int = 64,
):
    """x69's plan replayed: ivfpq_build (spherical cents on the raw sample,
    books on the normalized one) + ivfpq_search (probes → ADC → re-rank)."""
    from arxiv_crawler_spark.operators.knn import _lloyd_kmeans, _lloyd_kmeans_l2

    ids, X, _ = _load(sf_dir)
    sub = dim // m
    sample = _sample(X)
    cents = _lloyd_kmeans(sample, n_cells)
    nsample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    books = [
        _lloyd_kmeans_l2(nsample[:, j * sub : (j + 1) * sub], k_sub, seed=42 + j)
        for j in range(m)
    ]
    cells = (X @ cents.T).argmax(axis=1)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1), 1e-12)[:, None]
    codes = _codes(Xn, books, sub)
    n_probe = min(n_probe, len(cents))
    qsel = np.where(ids < 10)[0]
    qmat_n = X[qsel] / np.maximum(
        np.linalg.norm(X[qsel], axis=1, keepdims=True), 1e-12
    )
    tabs = _lut(qmat_n, books, sub)
    out = []
    for row, qi in enumerate(qsel):
        qid, qv = int(ids[qi]), X[qi]
        probe = set(_probes(qv, cents, n_probe))
        cand = [
            j for j in range(len(ids)) if cells[j] in probe and ids[j] != qid
        ]
        lut_rows = [tabs[sb][row] for sb in range(m)]
        short = _adc_shortlist(ids, qid, lut_rows, codes, cand, overfetch * k)
        out += [
            (qid, nid, spark_round6(c), r) for nid, c, r in _rerank(ids, X, qv, short, k)
        ]
    return out


def semdedup_kmeans_ref(sf_dir: str, n_cells: int = 8, tau: float = 0.30):
    """x71's plan replayed: ivf_build's quantizer (spherical k-means,
    centroid doubles exactly as createDataFrame receives them) +
    operators/dedup.py::semdedup — relational cosine assignment (seq
    folds, lowest-cluster tie-break) and the lower-id tau-close drop rule."""
    from arxiv_crawler_spark.operators.knn import _lloyd_kmeans

    ids, X, _ = _load(sf_dir)
    cents = _lloyd_kmeans(_sample(X), n_cells)
    cents = np.asarray(
        [[float(v) for v in c] for c in cents], dtype=np.float64
    )  # x71 materializes the centroids through python floats
    cnorm = [seq_norm(c) for c in cents]
    vnorm = [seq_norm(X[j]) for j in range(len(ids))]
    assign = []
    for j in range(len(ids)):
        best = max(
            range(len(cents)),
            key=lambda c: (seq_dot(X[j], cents[c]) / (vnorm[j] * cnorm[c]), -c),
        )
        assign.append(best)
    by_cluster: dict[int, list[int]] = {}
    for j, c in enumerate(assign):
        by_cluster.setdefault(c, []).append(j)
    dropped: set[int] = set()
    for members in by_cluster.values():
        members.sort(key=lambda j: ids[j])
        for bi in range(1, len(members)):
            b = members[bi]
            for a in members[:bi]:
                if seq_dot(X[a], X[b]) / (vnorm[a] * vnorm[b]) >= tau:
                    dropped.add(int(ids[b]))
                    break
    return [
        (int(ids[j]), int(assign[j]), int(ids[j]) not in dropped)
        for j in range(len(ids))
    ]


def _values_sql(
    branches: list[tuple[str, list[str]]],
    colnames: str,
    sig_from: str = f"SELECT {SIG_SQL} AS s FROM embeddings",
) -> str:
    """One VALUES branch per sf signature, dispatched inside the SQL."""
    parts = []
    for sig, rows in branches:
        parts.append(
            "SELECT * FROM (VALUES\n  "
            + ",\n  ".join(rows)
            + f")\n AS t({colnames})\nWHERE (SELECT s FROM _sig) = '{sig}'"
        )
    return f"WITH _sig AS ({sig_from})\n" + "\nUNION ALL\n".join(parts)


def _topk_rows(recs) -> list[str]:
    return [
        f"({q}::BIGINT, {n}::BIGINT, CAST({repr(c)} AS DOUBLE), {r}::BIGINT)"
        for q, n, c, r in recs
    ]


def sql_ivf_topk() -> str:
    return _values_sql(
        [(_load(d)[2], _topk_rows(ivf_topk_ref(d))) for d in GATE_SF_DIRS],
        "query_id, neighbor_id, cos, rank",
    )


def sql_pq_topk() -> str:
    return _values_sql(
        [(_load(d)[2], _topk_rows(pq_topk_ref(d))) for d in GATE_SF_DIRS],
        "query_id, neighbor_id, cos, rank",
    )


def sql_ivfpq_topk() -> str:
    return _values_sql(
        [(_load(d)[2], _topk_rows(ivfpq_topk_ref(d))) for d in GATE_SF_DIRS],
        "query_id, neighbor_id, cos, rank",
    )


DOC_SIG_SQL = (
    "md5(string_agg(doc_id || ':' || coalesce(text, ''), '|' ORDER BY doc_id))"
)


@functools.lru_cache(maxsize=4)
def _load_docs(sf_dir: str):
    """(doc_ids int64 asc, texts) for doc_id < 200 plus the documents
    content signature — x66's encode-input slice."""
    import duckdb
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    keep = np.where(ids < 200)[0]
    order = keep[np.argsort(ids[keep], kind="stable")]
    sig = duckdb.sql(
        f"SELECT {DOC_SIG_SQL} FROM '{sf_dir}/documents.parquet' WHERE doc_id < 200"
    ).fetchone()[0]
    return (
        ids[order].astype(np.int64),
        ["" if texts[i] is None else str(texts[i]) for i in order],
        sig,
    )


def encode_search_ref(sf_dir: str, dim: int = 32, k: int = 5):
    """x66's plan replayed: the encoder STUB (md5-seeded unit vectors,
    float32 round-trip like the Arrow schema) + brute_force_topk (both
    norms Spark-side seq folds)."""
    from arxiv_crawler_spark.operators.encoder import _stub_vector

    ids, texts, _ = _load_docs(sf_dir)
    X = np.stack([_stub_vector(t, dim) for t in texts]).astype(np.float64)
    cn = [seq_norm(X[j]) for j in range(len(ids))]
    out = []
    for qi in np.where(ids < 5)[0]:
        qid, qv = int(ids[qi]), X[qi]
        qn = seq_norm(qv)
        scored = [
            (int(ids[j]), seq_dot(qv, X[j]) / (qn * cn[j]))
            for j in range(len(ids))
            if ids[j] != qid
        ]
        out += [(qid, nid, spark_round6(c), r) for nid, c, r in _rank_topk_py(scored, k)]
    return out


def sql_encode_search() -> str:
    return _values_sql(
        [
            (_load_docs(d)[2], _topk_rows(encode_search_ref(d)))
            for d in GATE_SF_DIRS
        ],
        "query_id, neighbor_id, cos, rank",
        sig_from=f"SELECT {DOC_SIG_SQL} AS s FROM documents WHERE doc_id < 200",
    )


def sql_semantic_ann_core() -> str:
    """x62's retrieval core (ivf_search k=6/n_probe=8 over queries < 5,
    final_rank ≤ 5) as dispatched VALUES — plans/analytics.py wraps it
    with the q42 relational label/metadata joins."""
    branches = []
    for d in GATE_SF_DIRS:
        recs = [
            (q, n, c, r)
            for q, n, c, r in ivf_topk_ref(d, k=6, n_cells=16, n_probe=8, query_max=5)
            if r <= 5
        ]
        branches.append((_load(d)[2], _topk_rows(recs)))
    return _values_sql(branches, "query_id, neighbor_id, cos, final_rank")


def sql_semdedup_kmeans() -> str:
    return _values_sql(
        [
            (
                _load(d)[2],
                [
                    f"({i}::BIGINT, {c}, {'TRUE' if k else 'FALSE'})"
                    for i, c, k in semdedup_kmeans_ref(d)
                ],
            )
            for d in GATE_SF_DIRS
        ],
        "vec_id, cluster, is_kept",
    )
