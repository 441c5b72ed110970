"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch form (streaming/events.py::sessionize) is two window functions;
on an unbounded stream the same semantics need per-key state: the last
event time and running session index survive across micro-batches so a
session can span batch boundaries. State is one tuple per user —
(last_ts_epoch, last_session_idx, n, sum_value, start_ts, has_open) — and
each micro-batch emits *updated* session aggregates for every session it
touched (output mode "update": downstream consumers key on
(user_id, session_idx) and keep the latest row).

Inside each group the computation is vectorized pandas (diff/cumsum), not a
Python row loop — the per-row work stays in numpy even though state
handling is per key.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_sessionize"]

OUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, sum_value double, "
    "session_start string, session_end string"
)
STATE_SCHEMA = "last_ts_us long, session_idx long, n long, sum_value double, start_ts_us long"


def _fmt(epoch_us: int) -> str:
    return pd.Timestamp(int(epoch_us), unit="us").strftime("%Y-%m-%d %H:%M:%S.%f")


def _session_fn(gap_seconds: float):
    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
        # exact integer microseconds — float epoch seconds would lose the
        # microsecond digit at 2024-scale epochs
        ts = batch["ts"].astype("datetime64[us]").astype("int64")
        val = batch["value"].astype(float)

        if state.exists:
            last_ts, sidx, n0, sum0, start0 = state.get
        else:
            last_ts, sidx, n0, sum0, start0 = None, 0, 0, 0.0, 0.0

        prev = ts.shift(1)
        if last_ts is not None:
            prev.iloc[0] = last_ts
        is_new = (prev.isna()) | ((ts - prev) > gap_seconds * 1_000_000)
        sess = is_new.cumsum() + (sidx if last_ts is not None else 0)
        # continuing the open session: first rows with is_new False belong
        # to session sidx; cumsum starts at 0 for them only if is_new[0] is
        # False — handled by the offset above either way
        if last_ts is not None and not is_new.iloc[0]:
            pass  # rows before the first boundary stay in session sidx
        elif last_ts is None:
            sess = is_new.cumsum()  # fresh user: sessions 1..k

        out = []
        for s_idx, grp in batch.assign(_s=sess, _ts=ts, _v=val).groupby("_s"):
            g_ts = grp["_ts"]
            cont = state.exists and s_idx == sidx  # continues the open session
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
        # persist the tail (open) session
        last = out[-1]
        state.update(
            (
                int(ts.iloc[-1]),
                int(last["session_idx"]),
                int(last["n_events"]),
                float(last["sum_value"]),
                int(pd.Timestamp(last["session_start"]).value // 1000),
            )
        )
        yield pd.DataFrame(out)

    return fn


def streaming_sessionize(
    spark: SparkSession, events_parquet: str, gap_minutes: int = 30
) -> DataFrame:
    """Streaming DataFrame of session aggregates (output mode 'update')."""
    schema = spark.read.parquet(events_parquet).schema
    if os.path.isfile(events_parquet):
        staged = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(os.path.abspath(events_parquet), os.path.join(staged, "part-0.parquet"))
        events_parquet = staged
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_parquet)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60.0),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
