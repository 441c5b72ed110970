"""Text → embedding encoding (U3) with a pluggable model backend.

Reference analog: the sentence-transformers batch encoder of
build_embeddings_dataset.py:116-121 (paper title+abstract contexts,
``normalize_embeddings=True``) and its sharded citation-context form
(:204-210, ``batch_size``-chunked ``encoder.encode``). The reference runs
the model on one node over a Polars frame; here the SAME per-batch call
runs inside ``mapInPandas``, so encoding scales with the cluster and the
model loads once per python worker, not once per row.

Backends:

* ``model=None`` (default, sandbox): the deterministic stub — a seeded
  unit-norm vector per text (md5-keyed, the U3/U5 pattern shared with
  ``operators/multimodal.py``). Downstream operators (ANN, near-dup,
  semantic search) exercise real plumbing on fake vectors.
* ``model="sentence-transformers/all-MiniLM-L6-v2"`` (any ST name): the
  REAL path. Lazily imports ``sentence_transformers`` inside the UDF,
  caches the model per executor process, and calls
  ``model.encode(texts, batch_size=..., normalize_embeddings=True,
  convert_to_numpy=True)`` per Arrow batch — the exact call the reference
  makes. Raises ``ModuleNotFoundError`` at task time where the library is
  absent (this sandbox), which is the honest failure: the plumbing is
  identical either way and is what the tests pin down.

At 100-TB scale the encode stage is GPU/compute-bound, not shuffle-bound:
the operator adds no exchange (narrow mapInPandas over whatever
partitioning the input already has) — co-locate it after the dedup stage
so only surviving documents pay inference.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["encode_texts"]

_MODEL_CACHE: dict[str, object] = {}  # per-python-worker (one load per executor)


def _stub_vector(text: str, dim: int) -> np.ndarray:
    """Deterministic unit-norm embedding (U5 pattern): md5(text) seeds a
    generator, so equal texts encode equally across runs and executors."""
    seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:8], "big") % (2**32)
    v = np.random.RandomState(seed).standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _load_model(name: str):
    if name not in _MODEL_CACHE:
        import sentence_transformers  # absent in this sandbox — real clusters ship it

        _MODEL_CACHE[name] = sentence_transformers.SentenceTransformer(name)
    return _MODEL_CACHE[name]


def encode_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: str | None = None,
    dim: int = 64,
    batch_size: int = 32,
) -> DataFrame:
    """``(id, text)`` → ``(id, embedding array<float>)``.

    One ``mapInPandas`` stage; each Arrow batch is encoded with ONE model
    call (build_embeddings_dataset.py:204-210's shard loop, expressed as
    Spark's own batching). ``dim`` applies to the stub only — a real model
    defines its own dimension."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            if model is None:
                vecs = [_stub_vector(t, dim).tolist() for t in texts]
            else:
                m = _load_model(model)
                out = m.encode(
                    texts,
                    batch_size=batch_size,
                    normalize_embeddings=True,  # build_embeddings_dataset.py:120
                    convert_to_numpy=True,
                )
                vecs = [row.astype(np.float32).tolist() for row in out]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, embedding array<float>"
    )
