"""Structured-Streaming tail over the crawl store's append logs.

The snapshot store's ``fetched``/``edges``/``seen`` logs are append-only
chains of per-round delta directories (``snapshots/r*/<name>``,
crawl/store.py). That layout IS a file-stream source: a live crawl commits
one new directory per round, and a ``readStream`` over the glob picks each
round's rows up exactly once (the file source tracks seen files in its
checkpoint) — incremental analytics (running cited-by counts, per-status
rates, freshness dashboards) over a crawl *while it runs*, without
re-scanning the whole log each round. The reference's closest analog is
re-reading ``citations.jsonl`` per browser request (app.py); here the same
view maintains itself incrementally.

Contracts and caveats (documented, not hidden):

* The glob matches ONLY raw per-round deltas — tier-compaction output
  (``<name>_compacted_t*``) rewrites rows the stream already consumed, and
  its suffix keeps it out of the glob, so folds never double-count.
* ``store.gc()`` deletes round dirs once compaction dereferences them. The
  tail is built for LIVE consumption: keep the stream's processing lag
  well under the first-fold horizon (``compact_seen_after`` rounds — 48 by
  default), or run the crawl with ``gc_every_rounds=0`` while tailing.
* Data files land BEFORE the manifest flip. On a torn commit the stream
  may ingest rows whose round was never committed and will re-ingest the
  round's rewrite — at-least-once under crashes, exactly-once on clean
  runs. Downstream aggs that must be exact dedupe on (round, url) /
  (round, citing_url, bib_index), which the logs carry for this reason.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["stream_log", "stream_fetched", "stream_edges", "cited_by_counts_stream"]


def _log_schema(spark: SparkSession, store_path: str, name: str):
    """File streams need an explicit schema — infer it from the committed
    log once (manifest-referenced paths, so a torn round can't poison it)."""
    from arxiv_crawler_spark.crawl.store import SnapshotStore

    store = SnapshotStore(store_path, spark)
    df = {"fetched": store.fetched, "edges": store.edges, "seen": store.seen}[name]()
    return df.schema


def stream_log(
    spark: SparkSession,
    store_path: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over one append log (``fetched`` | ``edges`` |
    ``seen``). One micro-batch ingests whole round-delta files — rounds are
    the natural batch granularity of the store."""
    reader = (
        spark.readStream.schema(_log_schema(spark, store_path, name))
        # a fresh round dir appears atomically from the reader's view only
        # after its files are fully written (write.parquet is staged by
        # Spark's file committer); latestFirst stays False so round order
        # is preserved under backlog
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(os.path.join(store_path, "snapshots", "r*", name))


def stream_fetched(spark: SparkSession, store_path: str) -> DataFrame:
    return stream_log(spark, store_path, "fetched")


def stream_edges(spark: SparkSession, store_path: str) -> DataFrame:
    return stream_log(spark, store_path, "edges")


def cited_by_counts_stream(edges: DataFrame) -> DataFrame:
    """Running cited-by counts over the edges tail — the incrementally
    maintained form of the browser's cited-by view (app.py cited_by
    enrichment; plans/analytics q34/J7), keyed on the resolved arXiv id
    (edges without one cannot be cited-by targets). Complete-mode
    aggregation: state is O(|distinct cited ids|), the same cardinality
    the batch view materializes."""
    return (
        edges.filter(F.col("cited_arxiv_id").isNotNull())
        .groupBy("cited_arxiv_id")
        .agg(F.count(F.lit(1)).alias("cited_by_count"))
    )
