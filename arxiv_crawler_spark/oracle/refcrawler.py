"""Pure-Python re-statement of the reference crawl-scheduler semantics —
the *spec* the Spark engine's replay mode is tested against. Never imported
by the engine itself.

Mirrors ``ArxivCrawler`` (/root/reference/arxiv_crawler/src/arxiv_crawler/
crawler.py) exactly:

* state triple: ``processed_ids`` set / ``failed_ids`` set / ``queued_ids``
  insertion-ordered dict id → (count, depth)  (crawler.py:57-59)
* seed merge: skip processed/failed; already-queued → keep count, reset
  depth to 0; else enqueue (0, 0) in seed order  (crawler.py:215-226)
* phase: forced BFS priority ("depth","num_citations") at crawl start
  (crawler.py:236); switches to ("num_citations","depth") once
  ``papers_processed > max_papers // 2``  (crawler.py:243-246), where
  ``papers_processed`` starts at ``len(processed_ids)`` (crawler.py:238)
* pop = Python ``max`` over the dict → *first* maximal in insertion order
  (crawler.py:195-205); BFS key (-depth, count), greedy key (count, -depth)
* frontier update per extracted citation **occurrence** (duplicate bib
  entries count twice — the loop is over citations.values(),
  crawler.py:134,154): unseen+unqueued → (1, depth+1); queued →
  (count+1, original depth)  (crawler.py:149-157)
* failure → failed_ids, never retried  (crawler.py:261-263)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


def normalize_arxiv_id(arxiv_id: str) -> str:
    """arxiv_util.py:16-23 semantics."""
    if not arxiv_id:
        return arxiv_id
    if "v" in arxiv_id and arxiv_id.split("v")[-1].isdigit():
        return arxiv_id.rsplit("v", 1)[0]
    return arxiv_id


@dataclass
class TraceRow:
    order: int
    arxiv_id: str
    depth: int
    count_at_pop: int
    phase: str  # 'bfs' | 'citations'
    status: str  # 'processed' | 'failed'


@dataclass
class OracleState:
    processed_ids: set[str] = field(default_factory=set)
    failed_ids: set[str] = field(default_factory=set)
    queued_ids: dict[str, tuple[int, int]] = field(default_factory=dict)


def crawl_oracle(
    world: dict[str, list[str | None]],
    seeds: list[str],
    max_papers: int = 100,
    state: OracleState | None = None,
) -> tuple[list[TraceRow], OracleState]:
    """Run the reference crawl loop over a synthetic world.

    ``world`` maps arxiv_id → ordered list of cited arXiv ids per bib entry
    *occurrence* (None for bib entries without an arXiv id). An id absent
    from ``world`` fails to fetch (crawler.py:98-100 / :181-186 paths).
    """
    st = state or OracleState()
    trace: list[TraceRow] = []

    # seed merge — crawler.py:215-226
    for raw in seeds:
        aid = normalize_arxiv_id(raw)
        if aid in st.processed_ids or aid in st.failed_ids:
            continue
        if aid in st.queued_ids:
            count, _ = st.queued_ids[aid]
            st.queued_ids[aid] = (count, 0)
        else:
            st.queued_ids[aid] = (0, 0)

    priority = ("depth", "num_citations")  # crawler.py:236
    papers_processed = len(st.processed_ids)  # crawler.py:238

    while st.queued_ids and papers_processed < max_papers:
        if papers_processed > max_papers // 2:  # crawler.py:244-246
            priority = ("num_citations", "depth")

        # _pop_next_paper — crawler.py:195-205
        if priority == ("num_citations", "depth"):
            aid, (count, depth) = max(st.queued_ids.items(), key=lambda x: (x[1][0], -x[1][1]))
        else:
            aid, (count, depth) = max(st.queued_ids.items(), key=lambda x: (-x[1][1], x[1][0]))
        del st.queued_ids[aid]

        phase = "citations" if priority == ("num_citations", "depth") else "bfs"
        cited_list = world.get(aid)
        if cited_list is None:
            st.failed_ids.add(aid)  # crawler.py:261-263
            trace.append(TraceRow(len(trace), aid, depth, count, phase, "failed"))
            continue

        # frontier update — crawler.py:134-157, per occurrence
        for cited in cited_list:
            if not cited:
                continue
            cid = normalize_arxiv_id(cited)
            if cid not in st.processed_ids and cid not in st.failed_ids:
                if cid not in st.queued_ids:
                    st.queued_ids[cid] = (1, depth + 1)
                else:
                    c, original_depth = st.queued_ids[cid]
                    st.queued_ids[cid] = (c + 1, original_depth)

        st.processed_ids.add(aid)  # crawler.py:253-257
        papers_processed += 1
        trace.append(TraceRow(len(trace), aid, depth, count, phase, "processed"))

    return trace, st


def seen_set(st: OracleState) -> dict[str, str]:
    """Final URL-seen statuses: processed ∪ failed ∪ still-queued
    (crawler.py:57-59; FIXTURES.md §4)."""
    seen = {aid: "processed" for aid in st.processed_ids}
    seen.update({aid: "failed" for aid in st.failed_ids})
    seen.update({aid: "queued" for aid in st.queued_ids})
    return seen


def extraction_world(pages_extractions: dict[str, dict[str, Any]]) -> dict[str, list[str | None]]:
    """Build the oracle world from per-id extraction dicts
    (``extract_citations`` output): bib order, one entry per occurrence."""
    return {
        aid: [c["details"]["arxiv_id"] for c in cits.values()]
        for aid, cits in pages_extractions.items()
    }
