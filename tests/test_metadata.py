"""Paper-metadata modeling (ProcessedPaper parity, models.py:38-56) and the
browser views over live crawl state: /search's three-field predicate
(app.py:268-276) and the paper page's cited-by contexts (app.py:387-405)."""

import pytest

from arxiv_crawler_spark.crawl import CrawlConfig, CrawlEngine
from arxiv_crawler_spark.extraction.tei import extract_citations, extract_paper_metadata
from arxiv_crawler_spark.fixtures import gen_seeds, gen_world, spark_pages

N_DOCS = 24
MAX_PAPERS = 8


@pytest.fixture(scope="module")
def world_pdf():
    return gen_world(n_docs=N_DOCS, seed=42)


@pytest.fixture(scope="module")
def engine(spark, world_pdf, tmp_path_factory):
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("store_meta")),
        spark_pages(spark, world_pdf).cache(),
        CrawlConfig(mode="replay", max_papers=MAX_PAPERS, n_buckets=8),
    )
    eng.bootstrap(gen_seeds(N_DOCS))
    eng.run()
    return eng


def test_fetched_carries_paper_metadata(engine, world_pdf):
    """Every processed row's title/authors/abstract/published/categories
    equal the per-document header metadata (row-oracle parity, like the
    extracted_text byte-identity invariant)."""
    want = {
        row["url"]: extract_paper_metadata(row["html"]) for _, row in world_pdf.iterrows()
    }
    rows = engine.store.fetched().filter("status = 'processed'").collect()
    assert rows
    for r in rows:
        w = want[r["url"]]
        assert r["title"] == w["title"] and r["title"].startswith("Document ")
        assert list(r["authors"]) == w["authors"] and len(w["authors"]) >= 1
        assert r["abstract"] == w["abstract"] and w["abstract"]
        assert r["published"] == w["published"] and len(w["published"]) == 10
        assert list(r["categories"]) == w["categories"] and len(w["categories"]) >= 1


def test_search_papers_three_field_predicate(engine, world_pdf):
    """search_papers(q) must equal the reference predicate computed row-wise:
    contains(lower(title)) OR contains(lower(abstract)) OR any author —
    and must not match anything else."""
    meta = {
        row["url"]: extract_paper_metadata(row["html"]) for _, row in world_pdf.iterrows()
    }
    processed = {
        r["url"] for r in engine.store.fetched().filter("status = 'processed'").collect()
    }
    for q in ("fox", "doe", "dataflow", "zzz-no-such-term"):
        want = {
            u
            for u in processed
            if q in (meta[u]["title"] or "").lower()
            or q in (meta[u]["abstract"] or "").lower()
            or any(q in a.lower() for a in meta[u]["authors"])
        }
        got = {r["url"] for r in engine.search_papers(q).collect()}
        assert got == want, q
    assert engine.search_papers("").count() == 0  # empty query → no results


def test_search_papers_is_case_insensitive_with_count(engine):
    rows_lower = engine.search_papers("document").collect()
    rows_upper = engine.search_papers("DOCUMENT").collect()
    assert {r["url"] for r in rows_lower} == {r["url"] for r in rows_upper}
    assert rows_lower  # titles all start with "Document "
    assert all(r["cited_by_count"] >= 0 for r in rows_lower)


def test_cited_by_contexts_first_match(engine, world_pdf):
    """For every (cited, citer) pair: the emitted contexts equal the FIRST
    citation entry of the citer whose arxiv_id is the cited id (the
    reference's break at app.py:399), in position order."""
    extractions = {
        row["url"]: extract_citations(row["html"]) for _, row in world_pdf.iterrows()
    }
    processed = {
        r["url"] for r in engine.store.fetched().filter("status = 'processed'").collect()
    }
    got: dict[tuple, list] = {}
    for r in engine.cited_by_contexts().collect():
        got.setdefault((r["cited_url"], r["citing_url"]), []).append(
            (r["ctx_pos"], r["reference_context"], r["citing_title"])
        )
    assert got
    for (cited_url, citing_url), rows in got.items():
        assert cited_url in processed and citing_url in processed
        cited_id = cited_url.rsplit("/", 1)[1]
        first = next(
            c["references"]
            for c in extractions[citing_url].values()
            if c["details"]["arxiv_id"] == cited_id
        )
        rows.sort()
        want = first if first else [None]
        assert [ctx for _, ctx, _ in rows] == want, (cited_url, citing_url)
        meta = extract_paper_metadata(
            world_pdf[world_pdf["url"] == citing_url].iloc[0]["html"]
        )
        assert all(t == meta["title"] for _, _, t in rows)


def test_near_dup_report_finds_planted_pair_incrementally(spark, tmp_path):
    """near_dup_report over live store state: a planted content twin (doc
    B's html copied from doc A) is surfaced as an LSH candidate pair, the
    incremental path (index = rounds before B, probe = B's round onward)
    finds the SAME pair without re-banding the archive, and incremental ∪
    old-internal equals the full report exactly."""
    from arxiv_crawler_spark.extraction.tei import extract_citations
    from arxiv_crawler_spark.extraction.tei import canonical_extraction_json
    from arxiv_crawler_spark.fixtures import arxiv_id_of, url_of

    pdf = gen_world(n_docs=10, seed=42)
    a_i, b_i = 1, 4
    pdf.loc[b_i, "html"] = pdf.loc[a_i, "html"]
    pdf.loc[b_i, "text"] = canonical_extraction_json(
        extract_citations(pdf.loc[b_i, "html"])
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "store_neardup"),
        spark_pages(spark, pdf),
        CrawlConfig(mode="replay", max_papers=2, n_buckets=8),
    )
    eng.bootstrap([arxiv_id_of(a_i), arxiv_id_of(b_i)])
    eng.run()

    fetched = {
        r["url"]: r["round"]
        for r in eng.store.fetched().filter("status = 'processed'").collect()
    }
    u_a, u_b = url_of(a_i), url_of(b_i)
    assert set(fetched) == {u_a, u_b}
    pair = tuple(sorted((u_a, u_b)))

    full = {(r["id_a"], r["id_b"]) for r in eng.near_dup_report().collect()}
    assert pair in full

    since = max(fetched.values())  # B's round: index side is A alone
    assert fetched[u_b] == since and fetched[u_a] < since
    incr = {
        (r["id_a"], r["id_b"])
        for r in eng.near_dup_report(since_round=since).collect()
    }
    assert pair in incr
    old = eng.store.fetched().filter(
        f"status = 'processed' and round < {since}"
    )
    from arxiv_crawler_spark.operators.dedup import lsh_candidate_pairs

    old_internal = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            old.select("url", "extracted_text"), id_col="url", text_col="extracted_text"
        ).collect()
    }
    assert incr | old_internal == full
