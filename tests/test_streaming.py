"""Structured Streaming parity: the streaming tumbling rollup must produce
exactly the batch rollup once the source is fully consumed."""

import pytest

from arxiv_crawler_spark.streaming.events import streaming_tumbling_rollup, tumbling_rollup


def test_stream_equals_batch(spark, sf_dir):
    events_path = f"{sf_dir}/events.parquet"
    batch = tumbling_rollup(spark.read.parquet(events_path), "6 hours")
    want = sorted(tuple(r) for r in batch.collect())

    stream_df = streaming_tumbling_rollup(spark, events_path, "6 hours")
    q = (
        stream_df.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from rollup_test").collect())
    assert got == want


def test_stateful_streaming_sessionize_equals_batch(spark, sf_dir):
    """applyInPandasWithState sessionization must converge to the batch
    sessionizer's result once the source is drained (latest row per
    (user, session) in update mode)."""
    from arxiv_crawler_spark.streaming.events import sessionize
    from arxiv_crawler_spark.streaming.stateful import streaming_sessionize

    events_path = f"{sf_dir}/events.parquet"
    want = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["sum_value"], r["session_start"], r["session_end"]
        )
        for r in sessionize(spark.read.parquet(events_path)).collect()
    }

    stream = streaming_sessionize(spark, events_path)
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    rows = spark.sql("select * from sess_test").collect()
    got = {}
    for r in rows:  # update mode: last emission per key wins
        got[(r["user_id"], r["session_idx"])] = (
            r["n_events"], r["sum_value"], r["session_start"], r["session_end"]
        )
    assert got == want


def test_stateful_state_spans_microbatches(spark, sf_dir, tmp_path):
    """Split the events into three time-ordered files and feed them one per
    micro-batch — sessions that straddle a batch boundary must still merge
    (the per-key state carries the open session across batches)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from arxiv_crawler_spark.streaming.events import sessionize
    from arxiv_crawler_spark.streaming.stateful import _session_fn, OUT_SCHEMA, STATE_SCHEMA
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["sum_value"])
        for r in sessionize(events).collect()
    }

    src = tmp_path / "src"
    src.mkdir()
    ordered = events.orderBy("ts").collect()
    thirds = [ordered[: len(ordered) // 3], ordered[len(ordered) // 3 : 2 * len(ordered) // 3],
              ordered[2 * len(ordered) // 3 :]]
    for i, chunk in enumerate(thirds):
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.parquet(
            str(tmp_path / f"stage{i}")
        )
        part = glob.glob(str(tmp_path / f"stage{i}" / "part-*.parquet"))[0]
        os.rename(part, str(src / f"{i:03d}.parquet"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(30 * 60.0), OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
    q = (
        out.writeStream.format("memory").queryName("sess_mb")
        .outputMode("update").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(240)
    finally:
        q.stop()
    got = {}
    for r in spark.sql("select * from sess_mb order by user_id, session_idx").collect():
        got[(r["user_id"], r["session_idx"])] = (r["n_events"], r["sum_value"])
    assert got == want
