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


def test_lsh_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = KNN.brute_force_topk(q, emb, k=5).collect()
    approx = KNN.lsh_topk(q, emb, k=5, n_planes=4, dim=64).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.4, f"multi-probe LSH recall too low: {recall}"


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
