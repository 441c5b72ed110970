"""arxiv_crawler_spark — a from-scratch PySpark-native crawl-frontier +
extraction + analytics engine with the query/data-processing capabilities of
the reference repo ``arnoldkalmbach/arxiv_crawler`` (see SURVEY.md).

Everything here is idiomatic Spark DataFrame code: declarative plans for
Catalyst, Arrow-batched pandas UDFs where Python is unavoidable, and explicit
partitioning only where the crawl semantics demand determinism.

Layout
------
``functions/``   scalar column builders: URL canonicalization, 64-bit hashing,
                 text heuristics (all JVM-side expressions unless noted).
``extraction/``  TEI citation extraction — the per-row invariant of the
                 reference (arxiv_util.py:187-271) as a mapInPandas UDF plus a
                 row-at-a-time oracle used for byte-identical golden tests.
``crawl/``       frontier store, scheduler (replay + wave modes), politeness,
                 checkpoint/resume — the distributed re-statement of
                 crawler.py:195-279.
``oracle/``      pure-Python re-statement of the reference crawl loop, used as
                 the trace-replay spec (never imported by the engine).
``operators/``   scale ops: dedup (exact/minhash/simhash/jaccard/embedding),
                 KNN similarity search, multimodal plumbing.
``plans/``       analytics query surface (times-cited, cited-by, search,
                 top-k, stats) wired into ``__spark_entry__``.
``streaming/``   event-time windowed aggregation + sessionization (batch and
                 Structured Streaming forms).
"""

__version__ = "0.1.0"
