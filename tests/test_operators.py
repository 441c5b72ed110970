"""Operator-level tests: dedup family, KNN recall, text heuristics,
multimodal plumbing, Bloom filter behavior."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arxiv_crawler_spark.crawl.bloom import ShardedBloom
from arxiv_crawler_spark.operators import dedup as DD
from arxiv_crawler_spark.operators import knn as KNN
from arxiv_crawler_spark.operators.multimodal import extract_features, sample_frames, synth_media


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "completely different content about spark engines here"),
        (4, "unrelated words zebra xylophone quartz vortex jumble"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = {r["keeper_id"]: r["dup_count"] for r in DD.exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 2 collapse
    assert out[3] == 1


def test_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in DD.jaccard_pairs(docs, threshold=0.2).collect()}
    assert pairs[(0, 2)] == 1.0  # identical
    assert (0, 1) in pairs and 0.4 < pairs[(0, 1)] < 1.0  # near-dup
    assert (0, 4) not in pairs


def test_minhash_lsh_finds_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in DD.lsh_candidate_pairs(docs, k=8, bands=4).collect()}
    assert (0, 2) in pairs  # exact dup always collides in every band
    assert (3, 4) not in pairs


def test_simhash_near(docs):
    sims = {r["id"]: r["simhash"] for r in DD.simhash32(docs).collect()}
    assert sims[0] == sims[2]
    d01 = bin(sims[0] ^ sims[1]).count("1")
    d04 = bin(sims[0] ^ sims[4]).count("1")
    assert d01 < d04  # near-dup closer than unrelated


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    """Seeded corpus with planted near-duplicates: 20 base sentences, each
    with 2 variants differing by a one-or-two-word edit (small simhash
    Hamming distance), plus filler docs."""
    import random

    rng = random.Random(42)
    words = [f"w{i}" for i in range(120)]
    rows = []
    did = 0
    for b in range(20):
        base = [rng.choice(words) for _ in range(30)]
        rows.append((did, " ".join(base)))
        did += 1
        for _v in range(2):
            var = list(base)
            for _ in range(rng.randint(1, 2)):
                var[rng.randrange(len(var))] = rng.choice(words)
            rows.append((did, " ".join(var)))
            did += 1
    for _f in range(20):
        rows.append((did, " ".join(rng.choice(words) for _ in range(30))))
        did += 1
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.parametrize("max_dist", [4, 6, 8])
def test_simhash_near_pairs_full_recall(near_dup_corpus, max_dist):
    """Banded candidate generation must find EVERY pair at Hamming distance
    ≤ max_dist (pigeonhole over max_dist+1 bands) — verified against a
    brute-force all-pairs Hamming oracle."""
    sims = {r["id"]: r["simhash"] for r in DD.simhash32(near_dup_corpus).collect()}
    ids = sorted(sims)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= max_dist
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_near_pairs(near_dup_corpus, max_dist=max_dist).collect()
    }
    assert banded == brute, (
        f"missed {sorted(brute - banded)[:5]}..., spurious {sorted(banded - brute)[:5]}"
    )
    assert brute, "oracle found no near pairs — fixture is broken"


@pytest.mark.parametrize("max_dist", [5, 7])
def test_simhash64_near_pairs_full_recall(near_dup_corpus, max_dist):
    """64-bit banding carries the same pigeonhole guarantee as the 32-bit
    path — every pair at Hamming distance ≤ max_dist found — with bands
    selective enough for web-scale corpora (8-10 bits, not 3-4)."""
    sims = {
        r["id"]: (r["sim_hi"] << 32) | r["sim_lo"]
        for r in DD.simhash64(near_dup_corpus).collect()
    }
    ids = sorted(sims)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= max_dist
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash64_near_pairs(near_dup_corpus, max_dist=max_dist).collect()
    }
    assert banded == brute
    assert brute, "oracle found no 64-bit near pairs — fixture is broken"


def test_lsh_bucket_cap_bounds_boilerplate(spark):
    """Adversarial boilerplate corpus: 200 identical docs would create a
    200-member band bucket (→ ~20k pairs per band). The cap drops the
    oversized buckets, bounds the output, and the drop is auditable."""
    boiler = [(i, "this exact boilerplate footer text repeated verbatim on every page") for i in range(200)]
    distinct = [(1000 + i, f"unique content number {i} alpha beta gamma delta {i}") for i in range(5)]
    df = spark.createDataFrame(boiler + distinct, ["doc_id", "text"])
    capped = DD.lsh_candidate_pairs(df, k=8, bands=4, max_bucket=50).collect()
    assert len(capped) < 100  # without the cap: 200*199/2 = 19900 boiler pairs
    assert not any(r["id_a"] < 1000 and r["id_b"] < 1000 for r in capped)
    dropped = DD.lsh_oversized_buckets(df, k=8, bands=4, max_bucket=50).collect()
    assert dropped and all(r["bucket_size"] == 200 for r in dropped)
    # uncapped path still available and complete
    full = DD.lsh_candidate_pairs(df.filter("doc_id >= 1000 or doc_id < 5"), max_bucket=None).collect()
    assert any(r["id_a"] < 5 and r["id_b"] < 5 for r in full)


def test_jaccard_max_df_bounds_hot_shingles(spark):
    """A shingle present in every doc is removed by the df ceiling; pair
    volume collapses from all-pairs to only truly-overlapping docs."""
    # 12-token boilerplate → without the df ceiling every doc pair shares
    # 10 of ~14 shingles (jaccard ≈ 0.55 > threshold) and 50 docs → 1225 pairs
    common = "the same header boilerplate line appears right here on every single page"
    rows = [(i, f"{common} unique{i} tail{i} word{i} extra{i}") for i in range(50)]
    rows.append((100, f"{common} unique1 tail1 word1 extra1"))  # true dup of doc 1
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = DD.jaccard_pairs(df, n=3, threshold=0.5, max_df=10).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert (1, 100) in pairs and pairs[(1, 100)] == 1.0
    assert all(p == (1, 100) for p in pairs), f"hot-shingle pairs leaked: {sorted(pairs)[:5]}"


def test_knn_brute_force_self_similarity(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(20, 16).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(20)]
    # vec 19 = tiny perturbation of vec 0 → must be its top neighbor
    rows[19] = (19, (base[0] + 0.01 * rng.randn(16)).astype("float32").tolist())
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = KNN.brute_force_topk(emb.filter("vec_id = 0"), emb, k=3).collect()
    assert out[0]["neighbor_id"] == 19 and out[0]["rank"] == 1
    assert out[0]["cos"] > 0.99


def test_knn_brute_force_matches_jvm_reference(spark):
    """Round-7 contract for the vectorized scorer: the mapInPandas BLAS
    path (per-batch candidate pruning + JVM window rank) must reproduce
    the straightforward JVM crossJoin reference exactly — including the
    (cos desc, neighbor_id asc) tie-break on DUPLICATE vectors, and with
    the corpus split over many partitions so per-batch cuts are
    exercised."""
    from pyspark.sql import Window as W

    rng = np.random.RandomState(11)
    base = rng.randn(120, 8).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(120)]
    # exact duplicate vectors → cosine ties the rank must break by id
    rows[50] = (50, base[7].tolist())
    rows[90] = (90, base[7].tolist())
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(16)
    q = emb.filter("vec_id < 15")
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cos"], 9))
        for r in KNN.brute_force_topk(q, emb, k=6).collect()
    }

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    qn = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    cn = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    ref = (
        qn.crossJoin(cn)
        .withColumn(
            "cos",
            dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(dot(F.col("qv"), F.col("qv")))
                * F.sqrt(dot(F.col("cv"), F.col("cv")))
            ),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
            ),
        )
        .filter(F.col("rank") <= 6)
        .collect()
    )
    want = {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cos"], 9)) for r in ref}
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], (key, got[key], want[key])
        assert abs(got[key][1] - want[key][1]) < 1e-9


def test_lsh_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = KNN.brute_force_topk(q, emb, k=5).collect()
    approx = KNN.lsh_topk(q, emb, k=5, n_planes=4, n_tables=3, dim=64).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, f"multi-table multi-probe LSH recall too low: {recall}"


def test_lsh_near_pairs_recall_on_planted_dups(spark, sf_dir):
    """The bucketed near-pair path must recover ≥ 0.9 of PLANTED
    near-duplicates (cos ≥ 0.9 — the regime LSH prunes for; hyperplane
    collision probability (1-θ/π)^p decays fast below cos ~0.7, which is
    why the operator targets near-dup detection, not low-similarity
    retrieval) — and never emit a false pair (candidates are verified by
    true cosine)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 100)
    base = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    rng = np.random.RandomState(11)
    rows = [(i, v.tolist()) for i, v in base.items()]
    planted = set()
    for i in sorted(base)[:40]:
        v = base[i]
        dup = v + 0.05 * np.linalg.norm(v) / 8 * rng.randn(len(v))
        rows.append((10_000 + i, dup.astype("float32").tolist()))
        planted.add((i, 10_000 + i))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["id_a"], r["id_b"])
        for r in KNN.lsh_near_pairs(df, threshold=0.9, dim=len(next(iter(base.values())))).collect()
    }
    found = {p for p in planted if p in got}
    recall = len(found) / len(planted)
    assert recall >= 0.9, f"LSH near-dup recall too low: {recall}"
    # verification step means no pair below the threshold sneaks through
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", KNN.cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= 0.9)
        .collect()
    }
    assert got <= exact


def test_ivf_recall(spark, sf_dir):
    """The IVF path (spherical-k-means coarse quantizer + n_probe cells)
    must find ≥ 0.9 of true near neighbors (perturbed queries → their
    source vector) while probing only 4/16 cells, keep useful recall even
    on near-random data, and be deterministic (fixed-seed quantizer)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    rng = np.random.RandomState(3)
    qrows = [
        (10_000 + i, (base[i] + 0.05 * np.linalg.norm(base[i]) / 8 * rng.randn(len(base[i]))).astype("float32").tolist())
        for i in sorted(base)[:30]
    ]
    queries = spark.createDataFrame(qrows, ["vec_id", "embedding"])
    hits = KNN.ivf_topk(queries, emb, k=5, n_cells=16, n_probe=4, dim=len(base[0]))
    by_q = {}
    for r in hits.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    found = sum(1 for qid, ns in by_q.items() if (qid - 10_000) in ns)
    recall = found / len(qrows)
    assert recall >= 0.9, f"IVF planted-neighbor recall too low: {recall}"

    # near-random data floor: recall@5 well above the scored fraction
    q20 = emb.filter(F.col("vec_id") < 20)
    exact = {(r["query_id"], r["neighbor_id"]) for r in KNN.brute_force_topk(q20, emb, k=5).collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in
          KNN.ivf_topk(q20, emb, k=5, n_cells=16, n_probe=6, dim=64).collect()}
    assert len(exact & ap) / len(exact) >= 0.6  # ~0.37 of corpus scored
    again = {(r["query_id"], r["neighbor_id"]) for r in
             KNN.ivf_topk(q20, emb, k=5, n_cells=16, n_probe=6, dim=64).collect()}
    assert again == ap  # deterministic index + search


def test_multimodal_features(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["features"]) == 8 for r in feats)
    # determinism: same payload → same features across runs
    feats2 = {r["media_id"]: r["features"] for r in extract_features(media, dim=8).collect()}
    assert feats2[0] == by_id[0]["features"]
    assert by_id[0]["n_bytes"] > 0


def test_multimodal_real_backend_stubbed(spark):
    media = synth_media(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|real decode"):
        extract_features(media, dim=8, backend="real").collect()


def test_sample_frames(spark):
    media = synth_media(spark, n=12)
    frames = sample_frames(media, every_n=8).collect()
    assert frames and all(r["frame_idx"] % 8 == 0 for r in frames)


def test_bloom_no_false_negatives():
    b = ShardedBloom(n_shards=8, bits_per_shard=1 << 16, n_hashes=5)
    added = np.arange(-5000, 5000, dtype=np.int64) * 2_654_435_761
    b.add(added)
    assert b.contains(added).all()  # Bloom property: no false negatives
    other = (np.arange(20000, 40000, dtype=np.int64) * 40_503 + 17)
    fpp = b.contains(other).mean()
    assert fpp < 0.05, f"false-positive rate too high: {fpp}"


def test_bloom_save_load(tmp_path):
    b = ShardedBloom(n_shards=4, bits_per_shard=1 << 12, n_hashes=3)
    keys = np.array([1, 2, 3, -9, 2**62], dtype=np.int64)
    b.add(keys)
    p = str(tmp_path / "bloom.npz")
    b.save(p)
    b2 = ShardedBloom.load(p)
    assert b2.contains(keys).all()
    assert b2.m == b.m and b2.k == b.k


def test_encode_texts_stub_deterministic_unit_norm(spark):
    """U3 encoder hook: the stub backend yields per-text deterministic
    unit-norm vectors across separate jobs (executor-independent), with the
    (id, embedding array<float>) contract the ANN operators consume."""
    import numpy as np

    from arxiv_crawler_spark.operators.encoder import encode_texts

    df = spark.createDataFrame(
        [(i, f"document text {i % 5}") for i in range(20)], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["embedding"] for r in encode_texts(df, dim=16).collect()}
    b = {r["doc_id"]: r["embedding"] for r in encode_texts(df.repartition(7), dim=16).collect()}
    assert a == b  # deterministic under any partitioning
    assert a[0] == a[5] and a[0] != a[1]  # equal text → equal vector
    for v in a.values():
        assert len(v) == 16
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_encode_texts_real_backend_fails_loudly_without_library(spark):
    """Requesting a real sentence-transformers model where the library is
    absent must fail the job with the missing-module error (silently
    falling back to the stub would poison a production index)."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from arxiv_crawler_spark.operators.encoder import encode_texts

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(PythonException, match="sentence_transformers"):
        encode_texts(df, model="sentence-transformers/all-MiniLM-L6-v2").collect()


def test_pagerank_matches_dense_reference(spark):
    """operators/graph.py::pagerank vs a dense numpy power iteration on a
    small digraph with a dangling node and a multi-edge — same damping,
    same iteration count, same no-dangling-redistribution semantics."""
    import numpy as np

    from arxiv_crawler_spark.operators.graph import pagerank

    #           0→1, 0→2, 1→2, 2→0, 2→0 (multi-edge), 3 dangling
    E = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 0)]
    n, d, iters = 4, 0.85, 4
    edges = spark.createDataFrame(E, "citer long, cited long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(edges, nodes, iterations=iters, damping=d).collect()
    }

    r = np.full(n, 1.0 / n)
    od = {0: 2, 1: 1, 2: 2}
    for _ in range(iters):
        c = np.zeros(n)
        for s_, t_ in E:
            c[t_] += r[s_] / od[s_]
        r = (1 - d) / n + d * c
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])
    # structural sanity: 0 and 2 reinforce each other above the dangling node
    assert got[2] > got[1] > got[3]


def test_pq_recall_and_rerank_exactness(spark, sf_dir):
    """The PQ (ADC + exact re-rank) path: planted near neighbors are found
    at ≥ 0.9 recall while the scoring join carries m-byte codes instead of
    vectors; the cosines it returns are EXACT (re-rank computes them on
    the true vectors, so every (query, neighbor) it shares with brute
    force carries the identical rounded score); deterministic."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    rng = np.random.RandomState(5)
    qrows = [
        (10_000 + i, (base[i] + 0.05 * np.linalg.norm(base[i]) / 8 * rng.randn(len(base[i]))).astype("float32").tolist())
        for i in sorted(base)[:30]
    ]
    queries = spark.createDataFrame(qrows, ["vec_id", "embedding"])
    hits = KNN.pq_topk(queries, emb, k=5, m=8, k_sub=16, dim=len(base[0]))
    by_q = {}
    for r in hits.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    found = sum(1 for qid, ns in by_q.items() if (qid - 10_000) in ns)
    assert found / len(qrows) >= 0.9, f"PQ planted-neighbor recall too low: {found / len(qrows)}"

    q20 = emb.filter(F.col("vec_id") < 20)
    exact = {(r["query_id"], r["neighbor_id"]): round(r["cos"], 6)
             for r in KNN.brute_force_topk(q20, emb, k=5).collect()}
    pq = {(r["query_id"], r["neighbor_id"]): round(r["cos"], 6)
          for r in KNN.pq_topk(q20, emb, k=5, overfetch=8).collect()}
    shared = set(exact) & set(pq)
    assert len(shared) / len(exact) >= 0.6  # ADC shortlist quality on near-random data
    for key in shared:
        assert exact[key] == pq[key]  # re-ranked scores are the true cosines
    again = {(r["query_id"], r["neighbor_id"]): round(r["cos"], 6)
             for r in KNN.pq_topk(q20, emb, k=5, overfetch=8).collect()}
    assert again == pq  # deterministic codebooks + search


def test_ivf_pq_recall(spark, sf_dir):
    """The composed IVFPQ path (cell pruning × code compression): planted
    near neighbors found at ≥ 0.85 recall while only n_probe/n_cells of
    the corpus is ADC-scored and the scoring join carries codes, not
    vectors; deterministic."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    rng = np.random.RandomState(11)
    qrows = [
        (10_000 + i, (base[i] + 0.05 * np.linalg.norm(base[i]) / 8 * rng.randn(len(base[i]))).astype("float32").tolist())
        for i in sorted(base)[:30]
    ]
    queries = spark.createDataFrame(qrows, ["vec_id", "embedding"])
    hits = KNN.ivf_pq_topk(queries, emb, k=5, n_cells=16, n_probe=4, dim=len(base[0]))
    by_q = {}
    for r in hits.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    found = sum(1 for qid, ns in by_q.items() if (qid - 10_000) in ns)
    assert found / len(qrows) >= 0.85, f"IVFPQ planted-neighbor recall too low: {found / len(qrows)}"
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in KNN.ivf_pq_topk(queries, emb, k=5, n_cells=16, n_probe=4, dim=len(base[0])).collect()
    }
    assert again == {(q_, n_) for q_, ns in by_q.items() for n_ in ns}


def test_recall_at_k_exact_counts(spark):
    """recall_at_k over a hand-built truth/topk pair: known hit ranks →
    exact recall fractions at every k, pairs missing from topk count
    against the denominator (eval.py analog semantics)."""
    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30)],
        "query_id int, relevant_id int",
    )
    topk = spark.createDataFrame(
        # q1: 10 at rank 1, 11 at rank 7; q2: 20 at rank 4; 21 absent;
        # q3: 30 absent entirely
        [(1, 10, 1), (1, 11, 7), (2, 20, 4), (2, 99, 1)],
        "query_id int, neighbor_id int, rank int",
    )
    rows = {
        r["k"]: r
        for r in KNN.recall_at_k(truth, topk, ks=(1, 5, 10)).collect()
    }
    assert rows[1]["n_pairs"] == 5 and rows[1]["n_queries"] == 3
    assert rows[1]["hits"] == 1 and abs(rows[1]["recall"] - 0.2) < 1e-9
    assert rows[5]["hits"] == 2 and abs(rows[5]["recall"] - 0.4) < 1e-9
    assert rows[10]["hits"] == 3 and abs(rows[10]["recall"] - 0.6) < 1e-9


def test_recall_at_k_ann_vs_exact(spark, sf_dir):
    """Evaluating an ANN index through the same harness: exact top-k recall
    is an upper bound, and LSH multi-probe stays within its tested recall
    band — the eval operator works for any topk-shaped input."""
    from arxiv_crawler_spark.plans.analytics import load

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    queries = emb.filter(F.col("vec_id") < 20)
    exact = KNN.brute_force_topk(queries, emb, k=5)
    truth = exact.filter(F.col("rank") <= 3).select(
        "query_id", F.col("neighbor_id").alias("relevant_id")
    )
    r_exact = {r["k"]: r["recall"] for r in KNN.recall_at_k(truth, exact, ks=(5,)).collect()}
    assert r_exact[5] == 1.0  # truth drawn from exact top-3 ⊂ top-5
    ann = KNN.lsh_topk(queries, emb, k=5)
    r_ann = {r["k"]: r["recall"] for r in KNN.recall_at_k(truth, ann, ks=(5,)).collect()}
    assert r_ann[5] >= 0.6


def test_ann_build_once_search_many(spark, sf_dir, monkeypatch):
    """The FAISS-shaped split: *_build trains the quantizer and encodes the
    corpus exactly once; repeated *_search calls over the prebuilt index do
    no training and no corpus.count() (round-4 verdict #3). Counted by
    instrumenting the k-means trainers and the sampled collect."""
    from arxiv_crawler_spark.operators import knn as knn_mod
    from arxiv_crawler_spark.plans.analytics import load

    calls = {"kmeans": 0, "sample": 0}
    real_km, real_km_l2, real_sample = (
        knn_mod._lloyd_kmeans,
        knn_mod._lloyd_kmeans_l2,
        knn_mod._train_sample,
    )
    monkeypatch.setattr(
        knn_mod, "_lloyd_kmeans",
        lambda *a, **k: (calls.__setitem__("kmeans", calls["kmeans"] + 1), real_km(*a, **k))[1],
    )
    monkeypatch.setattr(
        knn_mod, "_lloyd_kmeans_l2",
        lambda *a, **k: (calls.__setitem__("kmeans", calls["kmeans"] + 1), real_km_l2(*a, **k))[1],
    )
    monkeypatch.setattr(
        knn_mod, "_train_sample",
        lambda *a, **k: (calls.__setitem__("sample", calls["sample"] + 1), real_sample(*a, **k))[1],
    )

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    ix = knn_mod.ivfpq_build(emb, n_cells=8, m=8)
    after_build = dict(calls)
    assert after_build["sample"] == 1  # one bounded sample, one count

    q1 = knn_mod.ivfpq_search(ix, emb.filter(F.col("vec_id") < 5), k=3, n_probe=4)
    q2 = knn_mod.ivfpq_search(ix, emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)), k=3, n_probe=4)
    r1, r2 = q1.collect(), q2.collect()
    assert len(r1) and len(r2)
    # searches trained nothing and sampled nothing
    assert calls == after_build

    # split path ≡ one-shot wrapper on the same inputs
    ix.unpersist()
    wrapper = knn_mod.ivf_pq_topk(
        emb.filter(F.col("vec_id") < 5), emb, k=3, n_cells=8, n_probe=4, m=8
    ).collect()
    assert sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in r1) == \
        sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in wrapper)


def test_encode_texts_real_backend_roundtrip(spark):
    """The documented REAL encoder path, executed wherever the dependency
    exists (skips in this sandbox): same mapInPandas plumbing as the stub,
    but vectors come from sentence_transformers.encode with
    normalize_embeddings=True — assert unit norms, determinism across two
    runs, and model-defined dimensionality."""
    pytest.importorskip("sentence_transformers")
    from arxiv_crawler_spark.operators.encoder import encode_texts

    df = spark.createDataFrame(
        [(1, "minhash lsh dedup"), (2, "citation graph pagerank"), (3, "")],
        "doc_id long, text string",
    )
    model = "sentence-transformers/all-MiniLM-L6-v2"
    out1 = {r["doc_id"]: r["embedding"] for r in encode_texts(df, model=model).collect()}
    out2 = {r["doc_id"]: r["embedding"] for r in encode_texts(df, model=model).collect()}
    assert set(out1) == {1, 2, 3}
    for k, v in out1.items():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-3  # normalized
        assert v == out2[k]  # deterministic
    dims = {len(v) for v in out1.values()}
    assert len(dims) == 1 and dims.pop() >= 128  # model-defined dim, not the stub's 64


def test_ann_index_save_load_roundtrip(spark, sf_dir, tmp_path_factory):
    """Persisted-index reuse across jobs (FAISS write_index/read_index):
    save a built IVFPQ index, load it fresh, search — identical results to
    the in-memory index, with the cell partitioning preserved on disk."""
    import os

    from arxiv_crawler_spark.plans.analytics import load

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    ix = KNN.ivfpq_build(emb, n_cells=8, m=8, persist=False)
    path = str(tmp_path_factory.mktemp("ann_ix"))
    KNN.save_index(ix, path)
    assert any(d.startswith("cell=") for d in os.listdir(path + "/index"))

    ix2 = KNN.load_index(spark, path, corpus=emb)
    q = emb.filter(F.col("vec_id") < 5)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in KNN.ivfpq_search(ix2, q, k=3, n_probe=4).collect()
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in KNN.ivfpq_search(ix, q, k=3, n_probe=4).collect()
    )
    assert got == want and len(got) > 0


def test_connected_components_designed_graph(spark):
    """Chain (diameter 4), triangle, 2-node edge, bridge-merged pair —
    exact cluster labels vs hand computation."""
    from arxiv_crawler_spark.operators.graph import connected_components

    E = [
        (10, 11), (11, 12), (12, 13), (13, 14),   # chain → cluster 10
        (20, 21), (21, 22), (22, 20),             # triangle → cluster 20
        (30, 31),                                 # pair → cluster 30
        (40, 41), (50, 51), (41, 50),             # bridged → cluster 40
        (60, 60),                                 # self-loop only → dropped
    ]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {r["node"]: r["cluster_id"] for r in connected_components(edges).collect()}
    want = {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
            20: 20, 21: 20, 22: 20,
            30: 30, 31: 30,
            40: 40, 41: 40, 50: 40, 51: 40}
    assert got == want


def test_connected_components_random_vs_union_find(spark):
    """Random sparse graph vs a pure-Python union-find oracle."""
    import random

    from arxiv_crawler_spark.operators.graph import connected_components

    rng = random.Random(7)
    n = 400
    E = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    E = [(a, b) for a, b in E if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in E:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for e in E for x in e}
    want = {x: find(x) for x in touched}
    # union-find roots are not necessarily component minima; normalize
    by_root: dict[int, int] = {}
    for x, r in want.items():
        by_root[r] = min(by_root.get(r, x), x)
    want = {x: by_root[r] for x, r in want.items()}

    edges = spark.createDataFrame(E, "src long, dst long")
    got = {r["node"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == want


def test_connected_components_over_lsh_pairs(docs):
    """Composition: LSH candidate pairs → duplicate clusters. Docs 0/1/2
    are mutual near-dups (one cluster keyed by 0); 3 and 4 share nothing."""
    from arxiv_crawler_spark.operators.graph import connected_components

    pairs = DD.lsh_candidate_pairs(docs, k=8, bands=4)
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs, "id_a", "id_b").collect()
    }
    assert got[0] == got[1] == got[2] == 0
    assert 3 not in got and 4 not in got


def test_decontaminate_planted_overlap(spark):
    """Doc sharing a benchmark 3-gram is flagged with exact gram/doc
    counts; clean docs and the min_hits gate both respected."""
    bench = spark.createDataFrame(
        [(1000, "the capital of france is paris"),
         (1001, "water boils at one hundred degrees")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [(1, "he said the capital of france is paris obviously"),   # 4 shared 3-grams w/ 1000
         (2, "water boils at altitude lower than usual"),           # 1 shared w/ 1001
         (3, "entirely clean document about spark plans")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in DD.decontaminate(train, bench, n=3).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_hit_grams"] == 4 and out[1]["n_bench_docs"] == 1
    assert out[2]["n_hit_grams"] == 1 and out[2]["n_bench_docs"] == 1
    strict = DD.decontaminate(train, bench, n=3, min_hits=2).collect()
    assert {r["doc_id"] for r in strict} == {1}
    # non-broadcast fallback is semantically identical
    nb = {r["doc_id"]: r["n_hit_grams"]
          for r in DD.decontaminate(train, bench, n=3, broadcast_benchmark=False).collect()}
    assert nb == {1: 4, 2: 1}


def test_duplicate_spans_designed_corpus(spark):
    """ExactSubstr span detection on a hand-built corpus: cross-doc shared
    runs slide into merged spans, within-doc repetition flags itself as two
    islands, unique text yields nothing, and overlapping covered windows
    collapse to one maximal span."""
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 a3 a4 a5 a6"),                # fully unique — no spans
            (2, "x1 x2 p q r x3 x4"),                # shares "p q r" with doc 3
            (3, "y1 p q r y2 y3"),
            (4, "m n o z1 z2 z3 m n o"),             # self-repeat, two islands
            (5, "e1 s t u v w e2 e3"),               # 5-token run shared with 6:
            (6, "s t u v w f1 f2"),                  #   3 sliding grams merge to one span
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["span_tokens"])
        for r in DD.duplicate_spans(docs, n=3).collect()
    }
    assert out == {
        (2, 3): (5, 3),   # "p q r" at tokens 3-5
        (3, 2): (4, 3),   # "p q r" at tokens 2-4
        (4, 1): (3, 3),   # "m n o" opening
        (4, 7): (9, 3),   # "m n o" again — separate island (gap at 4-6)
        (5, 2): (6, 5),   # covered pos {2,3,4} merge into tokens 2-6
        (6, 1): (5, 5),
    }


def test_duplicate_spans_adjacent_windows_merge(spark):
    """Covered windows that tile without overlapping (pos 1 and pos 4 at
    n=3: tokens [1,3] + [4,6]) are one contiguous duplicated range and must
    come back as ONE span — the islands break requires a ≥1-token gap."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f t1 t2"),   # "a b c" and "d e f" dup, bridge grams unique
            (2, "a b c u1 u2 d e f"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in DD.duplicate_spans(docs, n=3).collect()
    }
    assert got == {(1, 1, 6), (2, 1, 3), (2, 6, 8)}


def test_duplicate_spans_min_count_and_positions(spark):
    """min_count raises the occurrence bar; duplicate_span_positions exposes
    the raw covered gram starts the spans are assembled from."""
    docs = spark.createDataFrame(
        [(1, "k l m q1"), (2, "k l m q2"), (3, "k l m q3")],
        ["doc_id", "text"],
    )
    pos = {(r["doc_id"], r["pos"]) for r in DD.duplicate_span_positions(docs, n=3).collect()}
    assert pos == {(1, 1), (2, 1), (3, 1)}
    assert DD.duplicate_spans(docs, n=3, min_count=4).count() == 0
    assert DD.duplicate_spans(docs, n=3, min_count=3).count() == 3


def test_remove_duplicate_spans_cuts_and_passthrough(spark):
    """ExactSubstr removal: cut docs lose exactly their spans (order kept),
    untouched docs pass through byte-identical (double space preserved),
    and a fully-duplicated doc survives with empty text and full cut count."""
    docs = spark.createDataFrame(
        [
            (1, "a1  a2 a3"),                 # unique; double space must survive
            (2, "x1 x2 p q r x3 x4"),         # shares "p q r" with doc 3
            (3, "y1 p q r y2 y3"),
            (4, "m n o z1 z2 z3 m n o"),      # self-repeat: both islands cut
            (5, "k l m"),                     # fully covered (dups doc 6)
            (6, "k l m"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in DD.remove_duplicate_spans(docs, n=3).collect()
    }
    assert out == {
        1: ("a1  a2 a3", 0),
        2: ("x1 x2 x3 x4", 3),
        3: ("y1 y2 y3", 3),
        4: ("z1 z2 z3", 6),
        5: ("", 3),
        6: ("", 3),
    }


def test_lsh_index_probe_incremental_equivalence(spark):
    """Build-once/probe-many: banding the corpus once and probing a delta
    against the stored index, plus the delta's internal pairs, must equal
    a from-scratch lsh_candidate_pairs run over corpus+delta minus the
    corpus-internal pairs (which the index build already surfaced)."""
    base = "shared boilerplate text that repeats across many documents here"
    rows = []
    for i in range(12):  # corpus: ids 0-11, two near-dup families
        rows.append((i, base + (" alpha tail" if i % 2 else " beta tail") + f" u{i}"))
    for i in range(12, 20):  # delta: ids 12-19, same families + one unique
        rows.append((i, base + (" alpha tail" if i % 2 else " beta tail") + f" v{i}"))
    rows.append((20, "completely unrelated singleton content with nothing shared"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = docs.filter("doc_id < 12")
    delta = docs.filter("doc_id >= 12")

    idx = DD.lsh_index_build(corpus)
    incr = {
        (r["id_a"], r["id_b"])
        for r in DD.lsh_index_probe(idx, delta, max_bucket=None)
        .unionByName(DD.lsh_candidate_pairs(delta, max_bucket=None))
        .collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in DD.lsh_candidate_pairs(docs, max_bucket=None).collect()
    }
    old = {
        (r["id_a"], r["id_b"])
        for r in DD.lsh_candidate_pairs(corpus, max_bucket=None).collect()
    }
    assert incr == full - old
    assert incr  # the families really do produce cross-boundary candidates
    assert all(b >= 12 for _, b in incr) and 20 not in {i for p in incr for i in p}


def test_winnow_fingerprints_guarantee_and_ties(spark):
    """Winnowing invariants: (a) a token run of >= w+n-1 tokens shared by
    two docs yields at least one identical (hash) fingerprint; (b) short
    docs (< w full windows... fewer grams than w) emit nothing; (c) a
    window whose minimum gram repeats picks the RIGHTMOST occurrence; (d)
    selection is ~1 fingerprint per window span, far fewer than grams."""
    shared = "s1 s2 s3 s4 s5 s6 s7"  # w+n-1 = 7 tokens at n=4, w=4
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 a3 " + shared + " a4 a5 a6"),
            (2, "b1 " + shared + " b2 b3 b4 b5"),
            (3, "c1 c2 c3 c4 c5 c6"),              # 3 grams < w → no full window
            (4, "t x t x t x t x t x"),            # periodic: repeated grams, ties
        ],
        ["doc_id", "text"],
    )
    fp = DD.winnow_fingerprints(docs, n=4, w=4)
    rows = fp.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["gram_hash"]))
    # (b): doc 3 has 3 grams — no window of 4 — nothing emitted
    assert 3 not in by_doc
    # (a): docs 1 and 2 share at least one fingerprint HASH from the run
    h1 = {h for _, h in by_doc[1]}
    h2 = {h for _, h in by_doc[2]}
    assert h1 & h2
    # (c)+(d): doc 4's grams alternate between two values; every window of
    # 4 contains both, so the rightmost minimal occurrence is always at
    # window-end or one before — selection collapses to few fingerprints
    assert 1 <= len(by_doc[4]) <= 4
    # rightmost-tie: recompute driver-side and compare exactly
    toks = "t x t x t x t x t x".split()
    import hashlib
    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
    grams = [(i + 1, h(" ".join(toks[i:i + 4]))) for i in range(len(toks) - 3)]
    want = set()
    for e in range(3, len(grams)):
        win = grams[e - 3:e + 1]
        m = min(g for _, g in win)
        pos = max(p for p, g in win if g == m)
        want.add((pos, m))
    got_md5 = {
        (r["pos"], r["gram_hash"])
        for r in DD.winnow_fingerprints(
            docs.filter("doc_id = 4"), n=4, w=4,
            hash_fn=lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
        ).collect()
    }
    assert got_md5 == want


def test_select_token_budget_matches_global_rule(spark):
    """The two-phase histogram selection must equal the naive global rule
    (sort by score desc, id asc; keep prefix with cumsum <= budget) at
    any nbins — including nbins=1, where EVERY doc lands in the cutoff
    bin and the partial-prefix window does all the work — and the
    everything-fits path returns the whole corpus."""
    from arxiv_crawler_spark.functions.text import quality_score, token_count
    from arxiv_crawler_spark.operators.sampling import select_token_budget

    texts = [
        (i, " ".join(f"w{i}x{j}" for j in range(5 + (i * 7) % 23)) + (" the of and" if i % 3 else ""))
        for i in range(40)
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    scored = sorted(
        docs.select(
            "doc_id",
            F.round(quality_score(F.col("text")), 6).alias("s"),
            token_count(F.col("text")).cast("long").alias("t"),
        ).collect(),
        key=lambda r: (-r["s"], r["doc_id"]),
    )
    budget = sum(r["t"] for r in scored) // 3
    want, cum = set(), 0
    for r in scored:
        cum += r["t"]
        if cum > budget:
            break
        want.add(r["doc_id"])
    for nbins in (1, 7, 1000):
        got = {
            r["doc_id"]
            for r in select_token_budget(docs, budget, nbins=nbins).collect()
        }
        assert got == want, nbins
    n_all = docs.count()
    assert select_token_budget(docs, 10**9).count() == n_all


def test_lm_perplexity_matches_hand_model(spark):
    """Bigram-LM scoring vs a hand-built Laplace model: counts, vocab,
    smoothing, and the bits-per-bigram average all reproduce exactly;
    sub-2-token docs are dropped; an external reference scores unseen
    bigrams at the smoothing floor."""
    import math

    from arxiv_crawler_spark.operators.search import lm_perplexity

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "z"), (4, "c a b")],
        ["doc_id", "text"],
    )
    # corpus bigram stream: doc1: (a,b)(b,a)(a,b)(b,c)  doc2: (a,b)  doc4: (c,a)(a,b)
    cb = {("a","b"): 4, ("b","a"): 1, ("b","c"): 1, ("c","a"): 1}
    cu = {"a": 4, "b": 2, "c": 1}
    V = 3  # distinct continuations {b, a, c}
    def bits(pairs):
        return round(
            sum(-math.log2((cb.get(p, 0) + 1.0) / (cu[p[0]] + V)) for p in pairs)
            / len(pairs), 6)
    out = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_bigram"])
        for r in lm_perplexity(docs).collect()
    }
    assert out == {
        1: (4, bits([("a","b"), ("b","a"), ("a","b"), ("b","c")])),
        2: (1, bits([("a","b")])),
        4: (2, bits([("c","a"), ("a","b")])),
    }
    # external reference: doc with a bigram the model never saw (w1 unseen)
    ref = spark.createDataFrame([(10, "a b a b c")], ["doc_id", "text"])
    ext = {
        r["doc_id"]: r["bits_per_bigram"]
        for r in lm_perplexity(
            spark.createDataFrame([(5, "q r")], ["doc_id", "text"]), reference=ref
        ).collect()
    }
    # model from ref alone: cb/cu over doc10, V = |{b,a,c}| = 3; unseen w1 → p = 1/V
    assert ext == {5: round(-math.log2(1.0 / 3.0), 6)}


def test_select_token_budget_null_text_is_zero_tokens(spark):
    """NULL text scores as the empty string with zero tokens: the driver
    histogram never sees NULL sums (previously a TypeError when a bin held
    only NULL-text rows) and null docs never consume budget."""
    from arxiv_crawler_spark.operators.sampling import select_token_budget

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "the of and in w1 w2 w3")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_tokens"] for r in select_token_budget(docs, 7).collect()}
    assert out[3] == 7 and out[1] == 0 and out[2] == 0


def test_redact_pii_families_order_and_counts(spark):
    """PII scrubbing: each family redacts independently, passes apply in
    spec order (emails first protects dotted domains from the IP pattern;
    IPs before phones stops 3-3-4 digit runs matching IP remnants), counts
    follow the sequential semantics, and clean text is untouched."""
    from arxiv_crawler_spark.functions.text import pii_counts, redact_pii

    rows = [
        (1, "mail a.b+c@ex-1.co.uk or x@y.io today"),
        (2, "gateway 10.0.255.7 and 192.168.1.1; not 1234.5.6.7"),
        (3, "call +44 555-123-4567 or 555.123.4567"),
        (4, "mixed u@v.org on 8.8.8.8 tel 555-000-1111"),
        (5, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r["id"]: (r["clean"], r["n_email"], r["n_ip"], r["n_phone"])
        for r in df.select(
            "id",
            redact_pii(F.col("text")).alias("clean"),
            *pii_counts(F.col("text")),
        ).collect()
    }
    assert out == {
        1: ("mail <EMAIL> or <EMAIL> today", 2, 0, 0),
        2: ("gateway <IP> and <IP>; not 1234.5.6.7", 0, 2, 0),
        3: ("call <PHONE> or <PHONE>", 0, 0, 2),
        4: ("mixed <EMAIL> on <IP> tel <PHONE>", 1, 1, 1),
        5: ("no pii here at all", 0, 0, 0),
    }


def test_bm25_matches_hand_computation(spark):
    import math

    from arxiv_crawler_spark.operators.search import bm25_topk

    corpus = spark.createDataFrame(
        [(1, "spark join spark"), (2, "spark table table"), (3, "other words here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bm25_topk(corpus, ["spark", "join"], k=10).collect()}
    # N=3, avgdl=3, df(spark)=2, df(join)=1; dl=avgdl so tf term = tf*2.2/(tf+1.2)
    idf_s, idf_j = math.log(1 + 1.5 / 2.5), math.log(1 + 2.5 / 1.5)
    want1 = (2 * 2.2 / 3.2) * idf_s + (2.2 / 2.2) * idf_j
    want2 = (2.2 / 2.2) * idf_s
    assert set(out) == {1, 2}
    assert abs(out[1]["score"] - round(want1, 6)) < 1e-9
    assert abs(out[2]["score"] - round(want2, 6)) < 1e-9
    assert out[1]["n_hit_terms"] == 2 and out[2]["n_hit_terms"] == 1


def test_repetition_signals_designed_docs(spark):
    from arxiv_crawler_spark.operators.search import repetition_signals

    corpus = spark.createDataFrame(
        [(1, "a b a b a b"),        # top 2-gram "a b"×3 (len 3), dup 3-grams ×2 each
         (2, "x\nx\ny"),            # 3 lines, 2 distinct; no 2-grams (1 token)
         (3, "all unique tokens only once here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_signals(corpus, n_top=2, n_dup=3).collect()}
    assert out[1]["top_ngram_char_frac"] == round(9 / 11, 6)
    assert out[1]["dup_ngram_char_frac"] == round(20 / 11, 6)  # overlap-counted occurrences
    assert out[1]["dup_line_frac"] == 0.0
    assert out[2]["top_ngram_char_frac"] == 0.0
    assert out[2]["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert out[3]["dup_ngram_char_frac"] == 0.0 and out[3]["top_ngram_char_frac"] > 0.0


def test_repetition_signals_empty_text_scores_zero(spark):
    """The docstring contract on the degenerate edge: an empty document
    scores 0.0 on every char-frac signal (greatest(len,1) denominator),
    never NULL."""
    from arxiv_crawler_spark.operators.search import repetition_signals

    corpus = spark.createDataFrame([(1, ""), (2, "a b a b")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_signals(corpus).collect()}
    assert out[1]["top_ngram_char_frac"] == 0.0
    assert out[1]["dup_ngram_char_frac"] == 0.0
    assert out[1]["dup_line_frac"] == 0.0
    assert out[2]["top_ngram_char_frac"] > 0.0


def test_temperature_sample_rebalances_mix(spark):
    """T=2 halves the log-imbalance: the head key is subsampled at
    sqrt(n_min/n_head), the rarest key keeps everything (rate 1.0)."""
    from arxiv_crawler_spark.operators.sampling import temperature_sample

    rows = [(i, "en" if i < 800 else ("de" if i < 950 else "sw")) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_sample(df, "lang", temperature=2.0, seed=42).toPandas()
    rates = out.groupby("lang")["rate"].first().to_dict()
    assert rates["sw"] == 1.0
    assert abs(rates["en"] - round((50 / 800) ** 0.5, 6)) < 1e-9
    assert abs(rates["de"] - round((50 / 150) ** 0.5, 6)) < 1e-9
    kept = out.groupby("lang")["doc_id"].count().to_dict()
    assert kept["sw"] == 50                     # rarest key fully kept
    assert abs(kept["en"] / 800 - rates["en"]) < 0.05   # hash acceptance ≈ rate
    # determinism
    again = temperature_sample(df, "lang", temperature=2.0, seed=42).toPandas()
    assert sorted(again["doc_id"]) == sorted(out["doc_id"])


def test_dsir_select_prefers_target_like_docs(spark):
    """DSIR weights separate the pool by target affinity: with disjoint
    vocabularies, every target-vocabulary doc outweighs every
    off-vocabulary doc (the ~30-gram weight gap dwarfs the Gumbel noise,
    whose range is bounded by the md5 micro-grid at ±~15 nats), so the
    top-k selection is exactly the target-like set. Untokenizable docs
    are unscoreable and dropped."""
    from arxiv_crawler_spark.operators.sampling import dsir_select

    a_words = "spark sql join shuffle partition broadcast catalyst agg"
    b_words = "tide harbor gull anchor brine mast kelp drift"
    target = spark.createDataFrame(
        [(1000 + i, " ".join([a_words] * 2)) for i in range(5)],
        ["doc_id", "text"],
    )
    pool = spark.createDataFrame(
        [(i, " ".join([a_words] * 2)) for i in range(10)]
        + [(100 + i, " ".join([b_words] * 2)) for i in range(10)]
        + [(999, "   ")],  # no tokens -> no grams -> unscoreable
        ["doc_id", "text"],
    )
    allw = dsir_select(pool, target, n_buckets=1024, k=50, seed=7).toPandas()
    assert len(allw) == 20 and 999 not in set(allw["doc_id"])
    wa = allw[allw["doc_id"] < 100]["logw_micro"]
    wb = allw[allw["doc_id"] >= 100]["logw_micro"]
    assert wa.min() > wb.max()
    top = dsir_select(pool, target, n_buckets=1024, k=10, seed=7).toPandas()
    assert set(top["doc_id"]) == set(range(10))
    again = dsir_select(pool, target, n_buckets=1024, k=10, seed=7).toPandas()
    assert top.values.tolist() == again.values.tolist()


def test_pack_sequences_chunks_and_offsets(spark):
    """Offsets are the exact per-bucket running token sums in doc-id
    order; pack boundaries land every budget tokens."""
    from arxiv_crawler_spark.operators.sampling import pack_sequences

    rows = [(i, " ".join(["w"] * (10 + i))) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, budget_tokens=64, n_buckets=4).toPandas()
    assert len(out) == 40
    for b, grp in out.groupby("bucket"):
        grp = grp.sort_values("doc_id")
        run = 0
        for _, r in grp.iterrows():
            assert r["start_offset"] == run
            assert r["pack_id"] == run // 64
            run += r["n_tokens"]


def test_pagerank_dangling_redistribute_matches_dense_reference(spark):
    """dangling='redistribute' spreads dangling mass uniformly each step
    (classic convention): matches a dense numpy iteration and sums to 1."""
    import numpy as np

    from arxiv_crawler_spark.operators.graph import pagerank

    E = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 0)]
    n, d, iters = 4, 0.85, 4
    edges = spark.createDataFrame(E, "citer long, cited long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(
            edges, nodes, iterations=iters, damping=d, dangling="redistribute"
        ).collect()
    }
    r = np.full(n, 1.0 / n)
    od = {0: 2, 1: 1, 2: 2}
    for _ in range(iters):
        c = np.zeros(n)
        for s_, t_ in E:
            c[t_] += r[s_] / od[s_]
        dm = r[3]  # node 3 is dangling
        r = (1 - d) / n + d * (c + dm / n)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_semdedup_assignment_and_keeper_rule(spark):
    # Two obvious clusters on the axes plus one vector tau-close to an
    # earlier one: 1 and 2 are near-dups in cluster 0 (keep 1, drop 2);
    # 3 sits alone in cluster 1; 4 is in cluster 0 but below tau.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.98, 0.199, 0.0]),     # cos(1,2) ~ 0.98
        (3, [0.0, 1.0, 0.0]),
        (4, [0.7, -0.714, 0.0]),     # cluster 0, cos(1,4) ~ 0.7 < tau
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cluster int, centroid array<double>",
    )
    got = {
        r["vec_id"]: (r["cluster"], r["is_kept"])
        for r in DD.semdedup(emb, cents, tau=0.9).collect()
    }
    assert got == {1: (0, True), 2: (0, False), 3: (1, True), 4: (0, True)}


def test_semdedup_argmax_tiebreak_prefers_lowest_cluster(spark):
    # A vector equidistant from two identical centroids must land in the
    # lower cluster id (the max_by struct tie-break the oracle's
    # row_number(order by cos desc, cluster asc) mirrors).
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [1.0, 0.0])], "cluster int, centroid array<double>"
    )
    [row] = DD.semdedup(emb, cents, tau=0.999999).collect()
    assert (row["cluster"], row["is_kept"]) == (3, True)


def test_semdedup_max_cluster_cap_skips_hot_cluster(spark):
    """The 100-TB skew guard: a cluster over max_cluster is skipped by the
    quadratic pairwise stage — every member stays kept (the boilerplate
    cluster is exact/LSH dedup's job) — while small clusters still dedup.
    The same inputs with the cap disabled drop the near-dups, proving the
    cap (not the data) changed the outcome."""
    rows = [
        (1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0]),  # hot cluster 0
        (10, [0.0, 1.0]), (11, [0.0, 1.0]),                 # small cluster 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cluster int, centroid array<double>"
    )
    capped = {
        r["vec_id"]: r["is_kept"]
        for r in DD.semdedup(emb, cents, tau=0.9, max_cluster=2).collect()
    }
    assert capped == {1: True, 2: True, 3: True, 10: True, 11: False}
    uncapped = {
        r["vec_id"]: r["is_kept"]
        for r in DD.semdedup(emb, cents, tau=0.9, max_cluster=None).collect()
    }
    assert uncapped == {1: True, 2: False, 3: False, 10: True, 11: False}


def test_semdedup_oversized_clusters_audit(spark):
    rows = [
        (1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0]),
        (10, [0.0, 1.0]), (11, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cluster int, centroid array<double>"
    )
    audit = DD.semdedup_oversized_clusters(emb, cents, max_cluster=2).collect()
    assert [(r["cluster"], r["cluster_size"]) for r in audit] == [(0, 3)]
    # default cap is far above any test cluster: audit empty, q91 unchanged
    assert DD.semdedup_oversized_clusters(emb, cents).count() == 0


def test_url_quality_signals_families(spark):
    from arxiv_crawler_spark.functions.urls import url_quality_signals

    urls = [
        ("https://h1.example.com/research/paper/1", True),      # clean
        ("https://h1.example.com/casino-bonus/2", False),       # hard word
        ("https://h1.example.com/promo/3", True),               # one soft = 0.5
        ("https://h1.example.com/promo/free-download/4", False),# two softs = 1.0
        ("https://h1.example.com/files/123456789/5", False),    # digit ratio
        ("https://ads.h1.example.com/blog/6", False),           # ad subdomain
        ("https://h1.example.com/" + "x" * 90, False),          # too long
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    got = {
        r["url"]: r["s"]["keep"]
        for r in df.select("url", url_quality_signals(F.col("url")).alias("s")).collect()
    }
    for u, keep in urls:
        assert got[u] == keep, u


def test_chunk_documents_overlap_and_empty_doc(spark):
    from arxiv_crawler_spark.operators.sampling import chunk_documents

    words = " ".join(str(i) for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(1, words), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tok"], r["chunk_text"])
        for r in chunk_documents(df, size=4, stride=3).collect()
    }
    # doc 1: starts 1,4,7,10 → windows [0..3],[3..6],[6..9],[9]
    assert got[(1, 0)] == (4, "0 1 2 3")
    assert got[(1, 1)] == (4, "3 4 5 6")
    assert got[(1, 2)] == (4, "6 7 8 9")
    assert got[(1, 3)] == (1, "9")
    # empty / whitespace-only docs emit exactly one empty chunk
    assert got[(2, 0)] == (0, "")
    assert got[(3, 0)] == (0, "")
    assert len(got) == 6


def test_paragraph_dedup_first_wins_and_reassembly(spark):
    # Block size 2: doc 1 = [a b][c d], doc 2 = [c d][e f] (shares "c d",
    # keeps "e f"), doc 3 duplicates doc 1 entirely -> deduped to empty,
    # doc 4 is empty -> zero paragraphs, still present in the output.
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "c d e f"), (3, "a b c d"), (4, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_deduped"])
        for r in DD.paragraph_dedup(df, block_tokens=2).collect()
    }
    assert got == {
        1: (2, 2, "a b c d"),
        2: (2, 1, "e f"),
        3: (2, 0, ""),
        4: (0, 0, ""),
    }


def test_paragraph_dedup_in_doc_repeat_and_tail_block(spark):
    # A paragraph repeated INSIDE one doc keeps only its first occurrence,
    # and a short tail block (len < block_tokens) is a paragraph too.
    df = spark.createDataFrame([(7, "x y x y z")], "doc_id long, text string")
    [r] = DD.paragraph_dedup(df, block_tokens=2).collect()
    assert (r["n_paras"], r["n_kept"], r["text_deduped"]) == (3, 2, "x y z")


def test_remove_boilerplate_drops_hot_blocks_keeps_copies(spark):
    # Block size 2, max_df 2: "h f" appears in 3 docs -> boilerplate,
    # ALL copies dropped; "c d" appears in 2 docs -> kept in BOTH
    # (the contrast with paragraph_dedup's first-wins); empty doc stays.
    df = spark.createDataFrame(
        [
            (1, "h f a b"),
            (2, "h f c d"),
            (3, "h f c d"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_clean"])
        for r in DD.remove_boilerplate(df, block_tokens=2, max_df=2).collect()
    }
    assert got == {
        1: (2, 1, "a b"),
        2: (2, 1, "c d"),
        3: (2, 1, "c d"),
        4: (0, 0, ""),
    }


def test_remove_boilerplate_df_is_document_frequency(spark):
    # A block repeated 5x INSIDE one doc is df=1 -> never boilerplate.
    df = spark.createDataFrame(
        [(1, "x y x y x y x y x y"), (2, "p q")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"])
        for r in DD.remove_boilerplate(df, block_tokens=2, max_df=2).collect()
    }
    assert got == {1: (5, 5), 2: (1, 1)}
