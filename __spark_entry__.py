"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end slice: a replay-mode crawl over the
deterministic synthetic TEI world (frontier → wave → fetch-join → Arrow
extraction → anti-join dedupe → frontier merge → snapshot), returning the
pop-ordered crawl trace.

``queries()`` (106) / ``oracle_sql()`` (106) — the operator surface of SURVEY.md §2 plus
the training-data-pipeline operators (dedup / similarity search / text
analysis / multimodal), checked against DuckDB at sf=0.01. As of round 6
EVERY entry is oracle-backed (hash/value-checked): the former rows-only
set now replays its deterministic semantics driver-side — pure-numpy ANN
twins (oracle/refann.py), the reference-crawl recount for the store-tail
stream, render/multimodal/encoder VALUES, and the streaming HLL driven
availableNow against the relational HLL SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: mini crawl (replay mode) on the synthetic world; the
    sf0.001 tables are also touched so the driver smoke covers the parquet
    scan path."""
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from arxiv_crawler_spark.crawl import CrawlConfig, CrawlEngine
    from arxiv_crawler_spark.fixtures import gen_seeds, gen_world, spark_pages

    # smoke the parquet scan path on the driver tables
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(1).collect()

    pages = spark_pages(spark, gen_world(n_docs=24, seed=42))
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="entry_crawl_"),
        pages,
        CrawlConfig(mode="replay", max_papers=6, n_buckets=8, use_bloom=True),
    )
    eng.bootstrap(gen_seeds(24, n_seeds=3))
    eng.run()
    return eng.trace()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from arxiv_crawler_spark.plans.analytics import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from arxiv_crawler_spark.plans.analytics import ORACLE_SQL

    return dict(ORACLE_SQL)
