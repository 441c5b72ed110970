"""Seed-list mining (S12): regex-mine arXiv ids out of markdown / bibtex /
README text and merge multiple sources first-wins into a bootstrap list.

Reference analog: scripts/initialize_list.py:13-94 (bibtex `journal` fields
+ raw arXiv URLs out of README markdown) and
scripts/extract_best_papers_ids.py:10-39 (URL regex over best_papers.md,
then the ordered initial+best merge with first-occurrence dedupe).

The files themselves are small config inputs (a handful of READMEs), so
the line loader is driver-side; everything after — the regex extraction
cascade and the first-wins merge — is declarative DataFrame code and runs
the same over millions of lines (``spark.read.text`` + a line index would
feed the identical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["ARXIV_URL_RE", "ARXIV_PREPRINT_RE", "seed_lines_df", "mine_seed_ids", "mine_seed_files"]

# ≙ arxiv_util.py arxiv_url_pattern / extract_best_papers_ids.py:8
ARXIV_URL_RE = r"(?:https?://)?(?:www\.)?arxiv\.org/abs/(\d{4}\.\d{4,}(?:v\d+)?|\d{7})"
# ≙ initialize_list.py's journal-field mining ('arXiv preprint arXiv:...')
ARXIV_PREPRINT_RE = r"arXiv[: ](\d{4}\.\d{4,}(?:v\d+)?)"


def seed_lines_df(spark: SparkSession, paths: list[str]) -> DataFrame:
    """(src_rank, line_no, line) rows for a list of seed files, in source
    order — src order is the reference's merge precedence
    (extract_best_papers_ids.py:27-33: initial ids before best-papers ids)."""
    rows = []
    for rank, p in enumerate(paths):
        with open(p, encoding="utf-8") as f:
            for i, line in enumerate(f):
                rows.append((rank, i, line.rstrip("\n")))
    return spark.createDataFrame(rows, "src_rank int, line_no int, line string")


def mine_seed_ids(lines: DataFrame) -> DataFrame:
    """Extract every arXiv id from every line (URL form first, then the
    'arXiv preprint' form — the reference's two mining passes), dedupe
    first-occurrence-wins over (source, line, pattern, position), and
    return (arxiv_id, src_rank, line_no, seed_idx) in merged seed order.

    T1 union + ordered dedupe: the window keeps the first discovery of
    each id; ``seed_idx`` is the dense position in the merged list
    (feeds ``CrawlEngine.bootstrap`` directly).
    """
    hits = lines.select(
        "src_rank",
        "line_no",
        F.posexplode_outer(
            F.concat(
                F.regexp_extract_all("line", F.lit(ARXIV_URL_RE), F.lit(1)),
                F.regexp_extract_all("line", F.lit(ARXIV_PREPRINT_RE), F.lit(1)),
            )
        ).alias("pos", "arxiv_id"),
    ).filter(F.col("arxiv_id").isNotNull())
    w = Window.partitionBy("arxiv_id").orderBy("src_rank", "line_no", "pos")
    firsts = hits.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    wseq = Window.orderBy("src_rank", "line_no", "pos")
    return firsts.withColumn("seed_idx", F.row_number().over(wseq) - 1).select(
        "arxiv_id", "src_rank", "line_no", "seed_idx"
    )


def mine_seed_files(spark: SparkSession, paths: list[str]) -> list[str]:
    """End-to-end: files → ordered seed-id list for ``bootstrap``."""
    return [
        r["arxiv_id"]
        for r in mine_seed_ids(seed_lines_df(spark, paths)).orderBy("seed_idx").collect()
    ]
