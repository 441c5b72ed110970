"""Custom stateful streaming operators: gap-based sessionization in BOTH
Spark stateful APIs.

The batch form (streaming/events.py::sessionize) is two window functions;
on an unbounded stream the same semantics need per-key state: the last
event time and running session index survive across micro-batches so a
session can span batch boundaries. State is one tuple per user —
(last_ts_us, session_idx, n, sum_value, start_ts_us) — and each
micro-batch emits *updated* session aggregates for every session it
touched (output mode "update": downstream consumers key on
(user_id, session_idx) and keep the latest row).

Two implementations over one shared vectorized core (``_advance``):

* ``streaming_sessionize`` — ``applyInPandasWithState`` (GroupState), the
  long-stable API.
* ``streaming_sessionize_tws`` — ``transformWithStateInPandas``
  (StatefulProcessor + ValueState, Spark 4.x), the successor API with
  composable state variables and timers; requires the RocksDB state store.

Inside each group the computation is vectorized pandas (diff/cumsum), not a
Python row loop — the per-row work stays in numpy even though state
handling is per key. Both forms are parity-tested against the batch
sessionizer in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

__all__ = [
    "streaming_sessionize",
    "streaming_sessionize_tws",
    "streaming_exact_dedup",
    "tws_available",
]

OUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, sum_value double, "
    "session_start string, session_end string"
)
STATE_SCHEMA = "last_ts_us long, session_idx long, n long, sum_value double, start_ts_us long"


def _fmt(epoch_us: int) -> str:
    return pd.Timestamp(int(epoch_us), unit="us").strftime("%Y-%m-%d %H:%M:%S.%f")


def _advance(
    user_id: int,
    batch: pd.DataFrame,
    prior: tuple | None,
    gap_seconds: float,
) -> tuple[list[dict], tuple]:
    """Advance one user's session state by one micro-batch of events.

    Returns (emitted session rows, new state tuple). Pure function of
    (batch, prior state) — shared verbatim by both stateful APIs.
    """
    batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
    # exact integer microseconds — float epoch seconds would lose the
    # microsecond digit at 2024-scale epochs
    ts = batch["ts"].astype("datetime64[us]").astype("int64")
    val = batch["value"].astype(float)

    if prior is not None:
        last_ts, sidx, n0, sum0, start0 = prior
    else:
        last_ts, sidx, n0, sum0, start0 = None, 0, 0, 0.0, 0.0

    prev = ts.shift(1)
    if last_ts is not None:
        prev.iloc[0] = last_ts
    is_new = (prev.isna()) | ((ts - prev) > gap_seconds * 1_000_000)
    sess = is_new.cumsum() + (sidx if last_ts is not None else 0)
    if last_ts is None:
        sess = is_new.cumsum()  # fresh user: sessions 1..k

    out = []
    for s_idx, grp in batch.assign(_s=sess, _ts=ts, _v=val).groupby("_s"):
        g_ts = grp["_ts"]
        cont = prior is not None and s_idx == sidx  # continues the open session
        n = int(len(grp)) + (n0 if cont else 0)
        sv = float(grp["_v"].sum()) + (sum0 if cont else 0.0)
        start = start0 if cont else int(g_ts.iloc[0])
        out.append(
            {
                "user_id": int(user_id),
                "session_idx": int(s_idx),
                "n_events": n,
                "sum_value": round(sv, 2),
                "session_start": _fmt(start),
                "session_end": _fmt(int(g_ts.iloc[-1])),
            }
        )
    last = out[-1]
    new_state = (
        int(ts.iloc[-1]),
        int(last["session_idx"]),
        int(last["n_events"]),
        float(last["sum_value"]),
        int(pd.Timestamp(last["session_start"]).value // 1000),
    )
    return out, new_state


def _session_fn(gap_seconds: float):
    def fn(key, pdfs, state: GroupState):
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        out, new_state = _advance(
            key[0], batch, state.get if state.exists else None, gap_seconds
        )
        state.update(new_state)
        yield pd.DataFrame(out)

    return fn


class _SessionProcessor(StatefulProcessor):
    """transformWithStateInPandas form: the open-session tail lives in a
    named ValueState variable instead of the monolithic GroupState tuple."""

    def __init__(self, gap_seconds: float):
        self.gap_seconds = gap_seconds

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.session = handle.getValueState("open_session", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        batch = pd.concat(list(rows), ignore_index=True)
        if len(batch) == 0:
            return
        prior = tuple(self.session.get()) if self.session.exists() else None
        out, new_state = _advance(key[0], batch, prior, self.gap_seconds)
        self.session.update(new_state)
        yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def _event_stream(spark: SparkSession, events_parquet: str) -> DataFrame:
    schema = spark.read.parquet(events_parquet).schema
    if os.path.isfile(events_parquet):
        staged = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(os.path.abspath(events_parquet), os.path.join(staged, "part-0.parquet"))
        events_parquet = staged
    return (
        spark.readStream.schema(schema)
        .parquet(events_parquet)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def streaming_sessionize(
    spark: SparkSession, events_parquet: str, gap_minutes: int = 30
) -> DataFrame:
    """Streaming DataFrame of session aggregates (output mode 'update'),
    applyInPandasWithState form."""
    return _event_stream(spark, events_parquet).groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60.0),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas talks to the JVM over a protobuf state
    protocol; this container ships pyspark 4.1 but NOT google.protobuf, so
    the API exists yet cannot run here. The operator below is the real
    implementation (parity test gated on this probe); on any normal Spark
    deployment protobuf ships with pyspark's own requirements."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def streaming_sessionize_tws(
    spark: SparkSession, events_parquet: str, gap_minutes: int = 30
) -> DataFrame:
    """Streaming DataFrame of session aggregates (output mode 'update'),
    transformWithStateInPandas form. Needs the RocksDB state store
    provider (set here; it serves applyInPandasWithState equally well)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        _event_stream(spark, events_parquet)
        .groupBy("user_id")
        .transformWithStateInPandas(
            _SessionProcessor(gap_minutes * 60.0),
            outputStructType=OUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


# ---------------------------------------------------------------------------
# streaming exact dedup: first-wins keeper per content hash across batches
# ---------------------------------------------------------------------------

DEDUP_OUT_SCHEMA = "content_hash string, keeper_id long, dup_count long"
DEDUP_STATE_SCHEMA = "keeper_id long, n long"


def _dedup_fn():
    def fn(key, pdfs, state: GroupState):
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        ids = batch["doc_id"].to_numpy()
        keeper, n = state.get if state.exists else (None, 0)
        mn = int(ids.min())
        keeper = mn if keeper is None or mn < keeper else int(keeper)
        n = int(n) + len(ids)
        state.update((keeper, n))
        yield pd.DataFrame(
            {"content_hash": [key[0]], "keeper_id": [keeper], "dup_count": [n]}
        )

    return fn


def streaming_exact_dedup(spark: SparkSession, docs_parquet: str) -> DataFrame:
    """Streaming form of operators/dedup.py::exact_dedup: per content hash,
    the min-id keeper and running dup count survive across micro-batches
    (output mode 'update' — downstream keys on content_hash and keeps the
    latest row; the final row per hash equals the batch result exactly,
    which the built-in ``dropDuplicates`` cannot promise because it keeps
    the arrival-ordered first row).

    At 100 TB the state is one (hash, keeper, n) tuple per distinct
    document — the same cardinality the batch groupBy shuffles — sharded
    by the state store; bound retention with
    ``dropDuplicatesWithinWatermark``-style TTL (GroupStateTimeout) when
    the stream is unbounded."""
    schema = spark.read.parquet(docs_parquet).schema
    src = docs_parquet
    if os.path.isfile(src):
        staged = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(os.path.abspath(src), os.path.join(staged, "part-0.parquet"))
        src = staged
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("content_hash", F.md5(F.col("text")))
        .select("content_hash", "doc_id")
    )
    return stream.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn(),
        DEDUP_OUT_SCHEMA,
        DEDUP_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
