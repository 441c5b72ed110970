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
