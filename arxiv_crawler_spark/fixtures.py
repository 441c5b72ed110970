"""Deterministic synthetic crawl world (seed=42) — FIXTURES.md §§1-4.

Generates the authoritative ``pages`` input table of BASELINE.json's
``input_hint`` — ``(url string, warc_ts timestamp, html binary, text string,
lang string)`` — where ``html`` is a gzip-compressed TEI-XML document
mirroring the Grobid output structure the reference extractor walks
(arxiv_util.py:214-265) and ``text`` is the canonical extraction JSON for
that html (so the byte-identical invariant can be asserted against the
input itself).

The implied citation graph deliberately contains (FIXTURES.md §3):
  a. duplicate bib entries citing the same id within one doc
     (per-occurrence count rule, crawler.py:134,154)
  b. cross-links creating count ties (pins the insertion-order tie-break,
     crawler.py:195-205)
  c. cycles (incl. occasional self-citations)
  d. dangling ids absent from ``pages`` (fetch-failure path,
     crawler.py:261-263)
and rotates all four arXiv-id embedding strategies of
arxiv_util.py:132-185 across bib entries, plus entries with no arXiv id,
bibs without xml:id (skipped), refs inside <s> and bare-<p> fallback refs.
"""

from __future__ import annotations

import gzip
import random
from datetime import datetime, timedelta, timezone

import pandas as pd

from arxiv_crawler_spark.extraction.tei import canonical_extraction_json, extract_citations

BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)


def arxiv_id_of(i: int) -> str:
    return f"{2100 + i // 10000:04d}.{10000 + i % 10000:05d}"


N_HOSTS = 8


def host_of_id(aid: str) -> int:
    """Deterministic host assignment for the multi-host world: last two
    digits of the id modulo N_HOSTS (derivable from the id string alone, so
    the engine-side resolver and the fixture agree by construction)."""
    return int(aid[-2:]) % N_HOSTS


def url_of(i: int, multi_host: bool = False) -> str:
    aid = arxiv_id_of(i)
    if multi_host:
        return f"https://mirror{host_of_id(aid)}.example.org/abs/{aid}"
    return f"https://arxiv.org/abs/{aid}"


def multihost_resolver(c):
    """Column link-resolver for the multi-host world (CrawlEngine
    link_resolver): id → https://mirror{last2 % N_HOSTS}.example.org/abs/id.
    Pure JVM expressions."""
    from pyspark.sql import functions as F

    from arxiv_crawler_spark.functions.urls import normalize_arxiv_id_col

    aid = normalize_arxiv_id_col(c)
    host_k = F.pmod(F.substring(aid, -2, 2).cast("int"), F.lit(N_HOSTS))
    return F.concat(
        F.lit("https://mirror"), host_k.cast("string"), F.lit(".example.org/abs/"), aid
    )


_LOREM = (
    "the quick brown fox jumps over the lazy dog while learning representations "
    "of citation graphs at web scale with distributed dataflow engines"
).split()


def _sentence(rng: random.Random, k: int) -> str:
    words = [rng.choice(_LOREM) for _ in range(6 + k % 5)]
    return " ".join(words)


def _bib_entry(rng: random.Random, bib_id: str, cited_id: str | None, strategy: int, year: int) -> str:
    """One <biblStruct>; strategy ∈ 0..3 picks the arXiv-id embedding form
    (arxiv_util.py:132-185), 4 = no arXiv id, 5 = no xml:id (skipped)."""
    n_auth = 1 + rng.randrange(3)
    authors = "".join(
        f'<author><persName><forename>F{rng.randrange(50)}</forename>'
        f"<surname>Sur{rng.randrange(90)}</surname></persName></author>"
        for _ in range(n_auth)
    )
    title = f"Title {bib_id} on {rng.choice(_LOREM)} {rng.choice(_LOREM)}"
    idno = ptr = ""
    venue = f"Journal of {rng.choice(_LOREM).title()}"
    if cited_id is not None:
        if strategy == 0:
            idno = f'<idno type="arXiv">arXiv:{cited_id}</idno>'
        elif strategy == 1:
            idno = f"<idno>CoRR, abs/{cited_id}</idno>"
        elif strategy == 2:
            ptr = f'<ptr target="https://arxiv.org/abs/{cited_id}" />'
        else:
            venue = f"arXiv preprint arXiv:{cited_id}"
    xmlid = "" if strategy == 5 else f' xml:id="{bib_id}"'
    return (
        f"<biblStruct{xmlid}>"
        f'<analytic><title level="a">{title}</title>{authors}{idno}{ptr}</analytic>'
        f"<monogr><title>{venue}</title>"
        f'<imprint><date type="published" when="{year}" /></imprint></monogr>'
        f"</biblStruct>"
    )


_CATEGORIES = ["cs.CL", "cs.LG", "cs.IR", "stat.ML", "cs.DC", "math.OC"]


def _tei_header(rng: random.Random, doc_idx: int) -> str:
    """Grobid-shaped teiHeader carrying the ProcessedPaper metadata fields
    (models.py:38-56): title, authors (sourceDesc persNames), abstract
    (profileDesc), published date (publicationStmt), categories (textClass
    keywords — stand-in for the arXiv API's categories)."""
    w1, w2 = rng.choice(_LOREM), rng.choice(_LOREM)
    title = f"Document {doc_idx} on {w1} {w2}"
    n_auth = 1 + rng.randrange(3)
    authors = "".join(
        f"<author><persName><forename>A{rng.randrange(40)}</forename>"
        f"<surname>Doe{rng.randrange(60)}</surname></persName></author>"
        for _ in range(n_auth)
    )
    published = f"{2019 + doc_idx % 6:04d}-{1 + doc_idx % 12:02d}-{1 + doc_idx % 28:02d}"
    cats = "".join(
        f"<term>{_CATEGORIES[(doc_idx + j) % len(_CATEGORIES)]}</term>"
        for j in range(1 + doc_idx % 2)
    )
    abstract = f"{_sentence(rng, doc_idx)}. {_sentence(rng, doc_idx + 3)}."
    return (
        f"<teiHeader><fileDesc>"
        f"<titleStmt><title>{title}</title></titleStmt>"
        f'<publicationStmt><date type="published" when="{published}" /></publicationStmt>'
        f"<sourceDesc><biblStruct><analytic>{authors}</analytic></biblStruct></sourceDesc>"
        f"</fileDesc>"
        f"<profileDesc>"
        f"<textClass><keywords>{cats}</keywords></textClass>"
        f"<abstract><div><p>{abstract}</p></div></abstract>"
        f"</profileDesc></teiHeader>"
    )


def _tei_doc(rng: random.Random, doc_idx: int, bib_entries: list[str], n_cited: int) -> bytes:
    """Well-formed TEI skeleton: header, listBibl, body with <s>-wrapped and
    bare-<p> in-text references to the bib ids, plus figures / table-figures
    / formulas and in-text figure refs (rotated by doc_idx) for the
    renderer's tei_parser.py:321-379 branches."""
    body_parts = []
    for k in range(min(n_cited, 6)):
        target = f"b{k}"
        s1 = _sentence(rng, k)
        s2 = _sentence(rng, k + 1)
        if k % 3 == 2:
            # bare-paragraph fallback path (arxiv_util.py:119-128)
            body_parts.append(
                f"<p>{s1} as shown in <ref type=\"bibr\" target=\"#{target}\">[{k}]</ref>. "
                f"{s2}.</p>"
            )
        else:
            body_parts.append(
                f"<p><s>{s1} following <ref type=\"bibr\" target=\"#{target}\">[{k}]</ref>.</s>"
                f"<s>{s2}.</s></p>"
            )
    if doc_idx % 2 == 0:
        body_parts.append(
            f"<p>{_sentence(rng, doc_idx)} (see <ref type=\"figure\" target=\"#fig_0\">"
            f"Figure {doc_idx % 4 + 1}</ref>), where "
            f"<formula xml:id=\"f{doc_idx}\">x_{{{doc_idx}}} &gt; 0</formula> holds.</p>"
        )
        body_parts.append(
            f"<figure xml:id=\"fig_0\"><head>{_sentence(rng, doc_idx + 1)}</head>"
            f"<label>Figure {doc_idx % 4 + 1}</label>"
            f"<figDesc>{_sentence(rng, doc_idx + 2)} &amp; more</figDesc></figure>"
        )
    if doc_idx % 3 == 0:
        cells = "".join(
            f"<row><cell>r{r} c{c}</cell><cell>{(doc_idx + r) * (c + 1)}</cell></row>"
            for r in range(2)
            for c in range(1)
        )
        body_parts.append(
            f"<figure type=\"table\" xml:id=\"tab_0\"><head>{_sentence(rng, doc_idx + 3)}</head>"
            f"<label>Table 1</label><table>{cells}</table></figure>"
        )
    if doc_idx % 4 == 0:
        body_parts.append(
            f"<formula xml:id=\"fb{doc_idx}\">\\sum_i w_i x_i + {doc_idx}</formula>"
        )
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<TEI xmlns="http://www.tei-c.org/ns/1.0">'
        f"{_tei_header(rng, doc_idx)}"
        f"<text><body>{''.join(body_parts)}</body>"
        f"<back><div><listBibl>{''.join(bib_entries)}</listBibl></div></back></text>"
        f"</TEI>"
    )
    return gzip.compress(xml.encode("utf-8"), compresslevel=1)


def gen_world(
    n_docs: int = 200, seed: int = 42, frac_dangling: float = 0.08, multi_host: bool = False
) -> pd.DataFrame:
    """Build the pages table as pandas (caller lifts to Spark).

    Returns columns (url, warc_ts, html, text, lang) for every *fetchable*
    doc; ~frac_dangling of cited ids point outside [0, n_docs) (dangling).
    """
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n_bib = 6 + rng.randrange(5)
        bibs, cited_ids = [], []
        # hub-biased citation targets → count ties and hubs
        for k in range(n_bib):
            r = rng.random()
            if r < 0.60:
                if rng.random() < frac_dangling:
                    cited = arxiv_id_of(n_docs + rng.randrange(n_docs))  # dangling
                elif rng.random() < 0.25:
                    cited = arxiv_id_of(rng.randrange(max(1, n_docs // 10)))  # hub
                elif rng.random() < 0.05:
                    cited = arxiv_id_of(i)  # self-citation (cycle)
                else:
                    cited = arxiv_id_of(rng.randrange(n_docs))
                strategy = k % 4
            else:
                cited = None
                strategy = 5 if (k == n_bib - 1 and rng.random() < 0.3) else 4
            if cited is not None and cited_ids and rng.random() < 0.15:
                cited = cited_ids[-1]  # duplicate bib entry, same target (rule a)
            bibs.append(_bib_entry(rng, f"b{k}", cited, strategy, 1990 + rng.randrange(35)))
            if strategy != 5:
                cited_ids.append(cited)
        html = _tei_doc(rng, i, bibs, sum(c is not None for c in cited_ids))
        text = canonical_extraction_json(extract_citations(html))
        rows.append(
            {
                "url": url_of(i, multi_host),
                "warc_ts": BASE_TS + timedelta(seconds=37 * i),
                "html": html,
                "text": text,
                "lang": "de" if i % 29 == 0 else "en",
            }
        )
    return pd.DataFrame(rows)


def gen_seeds(n_docs: int, n_seeds: int = 5, seed: int = 42) -> list[str]:
    """Seed arXiv ids (FIXTURES.md §2): spread over the graph, one duplicate,
    one versioned id, one dangling."""
    rng = random.Random(seed + 1)
    picks = rng.sample(range(n_docs), n_seeds)
    seeds = [arxiv_id_of(p) for p in picks]
    seeds.append(seeds[0])  # duplicate-of-queued → depth reset rule (crawler.py:221-224)
    seeds.append(arxiv_id_of(picks[1]) + "v2")  # versioned (normalize_arxiv_id path)
    seeds.append(arxiv_id_of(n_docs * 3 + 1))  # dangling seed → failure path
    return seeds


def spark_pages(spark, pdf: pd.DataFrame):
    """Lift the pandas world to the input_hint Spark schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return spark.createDataFrame(pdf, schema=schema)
