"""Embeddings dataset-build pipeline — the reference's second headline
workload (arxiv_search/scripts/build_embeddings_dataset.py), re-expressed
as composable DataFrame operators.

* ``process_citations`` ≙ build_embeddings_dataset.py:72-96: explode the
  nested citations → keep only citations whose target is itself a valid
  paper (semi-join) → rename/unnest → explode reference contexts → global
  row index → null-fill → base64(md5) reference_id. One linear DataFrame
  pipeline; Catalyst fuses the projections.
* ``hash_split`` ≙ split_citations_by_papers (:137-175): train/test split
  **by citing paper** (the reference's generalization-to-new-sources
  rationale). The reference permutes citer ids with a seeded rng; a
  permutation is inherently single-node, so at scale we split by a
  deterministic 64-bit hash of the citer id — same statistical contract
  (each citer lands wholly in one split, expected test fraction =
  ``test_size``), embarrassingly parallel, stable under re-runs and data
  growth (documented divergence, SURVEY.md §3.2).
* ``semantic_search`` ≙ browser/app.py:148-211: encode the query context
  (stub encoder — the vectors come in pre-encoded, U3), overfetch top_k+1,
  filter the context paper itself, join metadata back, and label every
  match "existing" (already cited by the query paper) vs "proposed".

Scale notes: the global row index in ``process_citations`` is assigned by
``operators.rank.global_row_index`` — the generalized form of
crawl/frontier.py ``_bucketed_rank`` (value-boundary literals + per-bucket
offsets) — so there is **no single-partition window** in the plan: every
window is partitioned by a bounded bucket of the (citer, citation
position, context position) key space. Same dense 0-based semantics as
the reference's ``with_row_index`` (build_embeddings_dataset.py:91).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from arxiv_crawler_spark.functions.hashing import md5_hash64
from arxiv_crawler_spark.operators import knn as KNN
from arxiv_crawler_spark.operators.rank import global_row_index

__all__ = ["process_citations", "hash_split", "semantic_search"]


def process_citations(
    papers: DataFrame,
    valid_ids: DataFrame,
    id_col: str = "arxiv_id",
    citations_col: str = "citations",
) -> DataFrame:
    """Flatten nested citations into the embeddings-dataset rows.

    ``papers``: (id_col, citations_col: array<struct{arxiv_id,
    reference_contexts: array<string>, ...}>) — the shape the crawl
    engine's extraction emits (extraction/tei.py) and the reference reads
    from papers.jsonl. ``valid_ids``: one column ``arxiv_id`` of ids that
    count as in-corpus (build_embeddings_dataset.py:85's ``is_in``).

    Returns (citer_arxiv_id, cited_arxiv_id, reference_context, idx,
    reference_id) with ``idx`` a dense 0-based global index over the
    deterministic (citer, citation position, context position) order and
    ``reference_id = base64(md5(context))`` (the reference's 64-bit
    hash→binary→base64 id, :94, on a DuckDB-reproducible hash family).
    """
    exploded = papers.select(
        F.col(id_col).alias("citer_arxiv_id"),
        F.posexplode(citations_col).alias("cit_pos", "cit"),
    ).select(
        "citer_arxiv_id",
        "cit_pos",
        F.col("cit.arxiv_id").alias("cited_arxiv_id"),
        F.col("cit.reference_contexts").alias("reference_contexts"),
    )
    # valid_ids is corpus-derived (every crawled paper,
    # build_embeddings_dataset.py:85) — at a 10^10-URL crawl it is the
    # corpus, so a forced broadcast would demand a multi-GB build side on
    # every executor. No hint: AQE still picks a broadcast when the side
    # is actually small; otherwise the semi-join shuffles on the key.
    valid = exploded.join(
        valid_ids.select(F.col("arxiv_id").alias("cited_arxiv_id")).distinct(),
        "cited_arxiv_id",
        "left_semi",
    )
    ctx = valid.select(
        "citer_arxiv_id",
        "cited_arxiv_id",
        "cit_pos",
        F.posexplode("reference_contexts").alias("ctx_pos", "reference_context"),
    )
    return (
        global_row_index(ctx, ["citer_arxiv_id", "cit_pos", "ctx_pos"], index_col="idx")
        .withColumn("reference_context", F.coalesce("reference_context", F.lit("")))
        .withColumn("reference_id", F.base64(F.md5("reference_context").cast("binary")))
        .select("citer_arxiv_id", "cited_arxiv_id", "reference_context", "idx", "reference_id")
    )


def split_col(citer: Column, test_size: float = 0.2, seed: int = 42) -> Column:
    """Deterministic split label for a citing-paper id: every citation of
    one citer lands in the same split; expected test fraction = test_size."""
    bucket = F.pmod(md5_hash64(F.concat(citer.cast("string"), F.lit(f"#{seed}"))), F.lit(100))
    return F.when(bucket < int(round((1 - test_size) * 100)), F.lit("train")).otherwise(
        F.lit("test")
    )


def hash_split(citations: DataFrame, test_size: float = 0.2, seed: int = 42) -> DataFrame:
    """Tag each processed citation with its train/test split (by citer)."""
    return citations.withColumn(
        "split", split_col(F.col("citer_arxiv_id"), test_size, seed)
    )


def semantic_search(
    query_papers: DataFrame,
    corpus: DataFrame,
    cited_edges: DataFrame,
    metadata: DataFrame,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk_fn=None,
) -> DataFrame:
    """Composed semantic-search query (app.py:148-211).

    ``query_papers``/``corpus``: (id, embedding) — already stub-encoded
    (U3). ``cited_edges``: (citer, cited) — the query papers' existing
    citation sets. ``metadata``: joined back onto every match.

    Overfetch ``top_k + 1`` (app.py:177), drop the context paper itself,
    keep the first ``top_k`` in rank order, and label each match
    "existing" if the query paper already cites it, else "proposed"
    (app.py:196-199).

    ``topk_fn(queries, corpus, k)`` swaps the retrieval core: default is
    the exact brute-force scorer (the reference's IndexFlatIP); pass a
    closure over ``operators.knn.ivf_topk`` / ``lsh_topk`` for the ANN
    100-TB path (same output contract: query_id, neighbor_id, cos, rank).
    """
    if topk_fn is None:
        def topk_fn(q, c, k):
            return KNN.brute_force_topk(
                q, c, k=k, id_col=id_col, vec_col=vec_col, exclude_self=False
            )

    over = topk_fn(query_papers, corpus, top_k + 1)
    w = Window.partitionBy("query_id").orderBy("rank")
    matches = (
        over.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("final_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("final_rank") <= top_k)
    )
    cited = cited_edges.select(
        F.col("citer").alias("query_id"), F.col("cited").alias("neighbor_id"), F.lit(1).alias("_c")
    ).distinct()
    labeled = matches.join(F.broadcast(cited), ["query_id", "neighbor_id"], "left").withColumn(
        "citation_type",
        F.when(F.col("_c").isNotNull(), F.lit("existing")).otherwise(F.lit("proposed")),
    )
    meta = metadata.withColumnRenamed(id_col, "neighbor_id") if id_col in metadata.columns else metadata
    return (
        labeled.join(meta, "neighbor_id", "left")
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cos"),
            "final_rank",
            "citation_type",
            *[c for c in meta.columns if c != "neighbor_id"],
        )
    )
