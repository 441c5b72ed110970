"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature-extraction kernels themselves are STUBBED (no
image/audio libraries in this container — ``decode_backend='real'`` raises
``NotImplementedError`` with the intended library call documented), but
every Spark-side piece is real and tested: the schema, the Arrow batch
path (``mapInPandas``), partitioning by media type, the UDF signature, and
a deterministic fake decoder so downstream operators (dedup by feature,
ANN over features) can be exercised end-to-end.

Reference analog: the gzip blob-per-document store (crawler.py:123-128)
generalized to typed binary payload columns, and the batch encoder pattern
of build_embeddings_dataset.py:116-121 (U3: model inference inside Arrow
batches).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "FEATURES_SCHEMA", "synth_media", "extract_features", "sample_frames"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # 'image' | 'audio' | 'video'
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        meta = {
            "width": 64 + (i % 8) * 16 if mt != "audio" else None,
            "height": 48 + (i % 8) * 12 if mt != "audio" else None,
            "n_frames": 24 + i % 100 if mt == "video" else None,
            "sample_rate": 16000 if mt == "audio" else None,
        }
        rows.append((i, mt, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4, "media_type")


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5-seeded feature vector
    (the U5 pattern of iterable_coupling_dataset.py:111-136)."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    return np.random.RandomState(seed).randn(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16, backend: str = "fake") -> DataFrame:
    """Decode + featurize media payloads in Arrow batches.

    ``backend='real'`` is where PIL/torchaudio/pyav decode would run — not
    available in this container, so it raises with the intended call
    documented; ``backend='fake'`` produces deterministic features with the
    exact same batch shape, schema, and partitioning as the real path.
    """
    if backend not in ("fake", "real"):
        raise ValueError(backend)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "real":
                raise NotImplementedError(
                    "real decode needs PIL.Image.open / torchaudio.load / av.open"
                    " — not present in this container; use backend='fake'"
                )
            feats = [_fake_decode(bytes(p), dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per selected frame
    index — pure JVM (sequence + explode); the frame *decode* itself would
    live in extract_features' real backend."""
    v = media.filter(F.col("media_type") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
