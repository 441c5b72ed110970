"""t4: checkpoint/resume equivalence — stop the engine mid-crawl, build a
fresh engine over the same store, and the continued trace must be
byte-identical to an uninterrupted run (north_rule: "resume exactly from a
checkpoint with per-partition lineage counters"; reference analog:
_load_state + papers_processed restoration, crawler.py:63-74,238 — the
BFS→citations phase switch must survive resume)."""

import shutil

import pytest

from arxiv_crawler_spark.crawl import CrawlConfig, CrawlEngine
from arxiv_crawler_spark.fixtures import gen_seeds, gen_world, spark_pages

N_DOCS = 40
MAX_PAPERS = 16  # phase switch at 8 → stop at 10 lands after the switch


@pytest.fixture(scope="module")
def pages(spark):
    return spark_pages(spark, gen_world(n_docs=N_DOCS, seed=42)).cache()


def _cfg():
    return CrawlConfig(mode="replay", max_papers=MAX_PAPERS, n_buckets=8)


def test_resume_equivalence(spark, pages, tmp_path_factory):
    seeds = gen_seeds(N_DOCS)

    # uninterrupted run
    full_dir = str(tmp_path_factory.mktemp("full"))
    full = CrawlEngine(spark, full_dir, pages, _cfg())
    full.bootstrap(seeds)
    full.run()
    want = [tuple(r) for r in full.trace().collect()]

    # interrupted run: 10 rounds, then a brand-new engine object resumes
    part_dir = str(tmp_path_factory.mktemp("part"))
    eng1 = CrawlEngine(spark, part_dir, pages, _cfg())
    eng1.bootstrap(seeds)
    eng1.run(max_rounds=10)
    m_mid = eng1.store.manifest()
    assert m_mid["processed_count"] + m_mid["failed_count"] == m_mid["total_pops"]
    del eng1

    eng2 = CrawlEngine(spark, part_dir, pages, _cfg())  # no bootstrap: pure resume
    eng2.run()
    got = [tuple(r) for r in eng2.trace().collect()]
    assert got == want

    m1, m2 = full.store.manifest(), eng2.store.manifest()
    assert m1["processed_count"] == m2["processed_count"] == MAX_PAPERS
    assert m1["frontier_size"] == m2["frontier_size"]

    seen_full = sorted(tuple(r) for r in full.seen_statuses().collect())
    seen_part = sorted(tuple(r) for r in eng2.seen_statuses().collect())
    assert seen_full == seen_part


def test_crash_mid_commit_recovers(spark, pages, tmp_path_factory):
    """A torn snapshot directory without a flipped manifest must be ignored:
    the store resumes from the previous manifest and re-runs the round."""
    seeds = gen_seeds(N_DOCS)
    d = str(tmp_path_factory.mktemp("crash"))
    eng = CrawlEngine(spark, d, pages, _cfg())
    eng.bootstrap(seeds)
    eng.run(max_rounds=5)
    m5 = eng.store.manifest()

    # simulate a crash: half-written next snapshot, manifest NOT flipped
    import os

    torn = os.path.join(d, "snapshots/r000006")
    os.makedirs(os.path.join(torn, "frontier"), exist_ok=True)
    with open(os.path.join(torn, "frontier/_partial"), "w") as f:
        f.write("torn write")

    eng2 = CrawlEngine(spark, d, pages, _cfg())
    assert eng2.store.manifest() == m5  # previous snapshot intact
    r = eng2.run_round()  # re-runs round 6, clobbering the torn dir
    assert r is not None and r.round_no == 6
    assert eng2.store.manifest()["round"] == 6


def test_crash_after_data_writes_no_duplicates(spark, pages, tmp_path_factory):
    """Crash in the window AFTER the round's data writes (frontier, seen,
    fetched, edges) but BEFORE the manifest flip: the re-run of the same
    round must not duplicate fetched/edges rows (all deltas live inside the
    snapshot dir and are only visible via the flipped manifest)."""
    import json
    import os

    seeds = gen_seeds(N_DOCS)
    d = str(tmp_path_factory.mktemp("crash2"))
    eng = CrawlEngine(spark, d, pages, _cfg())
    eng.bootstrap(seeds)
    eng.run(max_rounds=5)
    m5 = eng.store.manifest()

    # run round 6 fully, then simulate the crash by reverting the manifest
    # to the round-5 state — exactly as if we died between the data writes
    # and the os.replace flip
    r6 = eng.run_round()
    assert r6 is not None and r6.round_no == 6
    n_fetched_clean = eng.store.fetched().count()
    n_edges_clean = eng.store.edges().count()
    with open(os.path.join(d, "manifest.json"), "w") as f:
        json.dump(m5, f)

    eng2 = CrawlEngine(spark, d, pages, _cfg())
    assert eng2.store.manifest() == m5
    r = eng2.run_round()  # re-runs round 6, clobbering the orphan snapshot
    assert r is not None and r.round_no == 6
    m6 = eng2.store.manifest()

    fetched = eng2.store.fetched()
    assert fetched.count() == m6["total_pops"] == n_fetched_clean  # no duplicated appends
    dup_orders = (
        fetched.groupBy("global_order").count().filter("count > 1").count()
    )
    assert dup_orders == 0
    assert eng2.store.edges().count() == n_edges_clean


def test_rebootstrap_is_idempotent(spark, pages, tmp_path_factory):
    """Re-seeding a finished store must not re-queue processed/failed seeds
    (crawler.py:217-220) — queued seeds get a depth reset only."""
    seeds = gen_seeds(N_DOCS)
    d = str(tmp_path_factory.mktemp("reboot"))
    eng = CrawlEngine(spark, d, pages, _cfg())
    eng.bootstrap(seeds)
    eng.run(max_rounds=6)
    size_before = eng.store.manifest()["frontier_size"]
    eng.bootstrap(seeds)  # same seeds again
    m = eng.store.manifest()
    assert m["frontier_size"] == size_before  # nothing re-queued
    # all original seeds are either seen or still queued — never duplicated
    got = eng.seen_statuses().groupBy("url").count().filter("count > 1").count()
    assert got == 0


def test_wave_mode_resume_equivalence(spark, pages, tmp_path_factory):
    """Wave mode is deterministic too: interrupt + resume must land on the
    same final seen set and manifest counters as an uninterrupted run."""
    seeds = gen_seeds(N_DOCS)
    cfg = lambda: CrawlConfig(  # noqa: E731
        mode="wave", max_papers=1000, wave_size=6, round_seconds=18.0, n_buckets=8
    )

    full = CrawlEngine(spark, str(tmp_path_factory.mktemp("wfull")), pages, cfg())
    full.bootstrap(seeds)
    full.run(max_rounds=40)

    part_dir = str(tmp_path_factory.mktemp("wpart"))
    e1 = CrawlEngine(spark, part_dir, pages, cfg())
    e1.bootstrap(seeds)
    e1.run(max_rounds=4)
    del e1
    e2 = CrawlEngine(spark, part_dir, pages, cfg())
    e2.run(max_rounds=40)

    m1, m2 = full.store.manifest(), e2.store.manifest()
    assert m1["processed_count"] == m2["processed_count"]
    assert m1["failed_count"] == m2["failed_count"]
    assert m1["total_pops"] == m2["total_pops"]
    s1 = sorted(tuple(r) for r in full.seen_statuses().collect())
    s2 = sorted(tuple(r) for r in e2.seen_statuses().collect())
    assert s1 == s2
