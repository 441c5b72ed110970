"""Event-time analytics over the ``events`` stream table — batch form (used
by the oracle-checked queries) and Structured Streaming form (same
transformations over ``readStream``, tested for batch/stream equality).

The reference has no event-time processing (SURVEY.md §2.8: its "stream" is
a synchronous loop), so these are the forward-looking stream operators a
crawl/training-data pipeline needs: tumbling-window rollups and gap-based
sessionization.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["tumbling_rollup", "sessionize", "streaming_tumbling_rollup"]


def tumbling_rollup(events: DataFrame, width: str = "6 hours") -> DataFrame:
    """Tumbling event-time windows per event_type: count + value sum.
    Epoch-aligned, identical to DuckDB's time_bucket."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds the gap. Pure window functions
    (lag → boundary flag → running sum), shuffling once on user_id."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps arrive as TIMESTAMP_NTZ; epoch seconds (with
    # microsecond fraction) = gap arithmetic identical to DuckDB's epoch()
    epoch = F.unix_micros(F.col("ts").cast("timestamp")).cast("double") / 1e6
    gap = epoch - F.lag(epoch).over(by_user)
    with_flag = events.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    with_session = with_flag.withColumn(
        "session_idx", F.sum("is_new").over(by_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_session.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        )
    )


def streaming_tumbling_rollup(
    spark: SparkSession, events_parquet: str, width: str = "6 hours", watermark: str = "1 hour"
) -> DataFrame:
    """The same tumbling rollup as a Structured Streaming query over a
    parquet source with an event-time watermark for late data; caller
    attaches the sink. Used by tests to assert batch/stream parity."""
    schema = spark.read.parquet(events_parquet).schema
    if os.path.isfile(events_parquet):
        # the file stream source requires a directory — stage single files
        staged = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(os.path.abspath(events_parquet), os.path.join(staged, "part-0.parquet"))
        events_parquet = staged
    stream = spark.readStream.schema(schema).parquet(events_parquet)
    # watermarks need zoned timestamps; session tz is UTC so NTZ→TZ is exact
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
