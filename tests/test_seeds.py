"""Seed-list mining (S12): regex extraction over real files, first-wins
multi-source merge, and a crawl bootstrapped from the mined list
(reference: initialize_list.py:13-94, extract_best_papers_ids.py:10-39)."""

from arxiv_crawler_spark.crawl import CrawlConfig, CrawlEngine
from arxiv_crawler_spark.crawl.seeds import mine_seed_files, mine_seed_ids, seed_lines_df
from arxiv_crawler_spark.fixtures import arxiv_id_of, gen_world, spark_pages


def test_mine_seed_files_first_wins(spark, tmp_path):
    a0, a1, a2 = arxiv_id_of(0), arxiv_id_of(3), arxiv_id_of(7)
    md1 = tmp_path / "readme.md"
    md1.write_text(
        "# models\n"
        f"see the paper at https://arxiv.org/abs/{a0} for details\n"
        "nothing on this line\n"
        f"also http://www.arxiv.org/abs/{a1}v2 (versioned link)\n"
    )
    md2 = tmp_path / "best_papers.md"
    md2.write_text(
        f"journal = {{arXiv preprint arXiv:{a0}}}\n"  # dup of file 1 → dropped
        f"journal = {{arXiv preprint arXiv:{a2}}}\n"
    )
    got = mine_seed_files(spark, [str(md1), str(md2)])
    assert got == [a0, f"{a1}v2", a2]  # source order, first occurrence wins

    rows = mine_seed_ids(seed_lines_df(spark, [str(md1), str(md2)])).collect()
    by_id = {r["arxiv_id"]: r for r in rows}
    assert by_id[a0]["src_rank"] == 0 and by_id[a0]["seed_idx"] == 0
    assert by_id[a2]["src_rank"] == 1


def test_crawl_bootstrapped_from_mined_seeds(spark, tmp_path):
    n_docs = 24
    pages = spark_pages(spark, gen_world(n_docs=n_docs, seed=42))
    md = tmp_path / "seeds.md"
    md.write_text(
        f"https://arxiv.org/abs/{arxiv_id_of(0)}\n"
        f"arXiv preprint arXiv:{arxiv_id_of(5)}\n"
    )
    seeds = mine_seed_files(spark, [str(md)])
    assert len(seeds) == 2
    eng = CrawlEngine(
        spark,
        str(tmp_path / "store"),
        pages,
        CrawlConfig(mode="replay", max_papers=4, n_buckets=8),
    )
    eng.bootstrap(seeds)
    results = eng.run()
    assert results and results[0].waved == 1
    trace = eng.trace().collect()
    assert trace[0]["url"].endswith(arxiv_id_of(0))  # first mined seed pops first
