"""Watermarked windowed aggregation over the events stream (SURVEY §2.7
streaming; training-pipeline: tumbling windows + late-data handling).

The batch twin (`queries/streamq.py::stream_tumbling_window_agg`) is
oracle-checked; this is the same aggregation as a Structured Streaming
query: event-time tumbling windows with a watermark, so late rows within
the lateness bound still land in their window and older state is evicted
— the standard unbounded-stream shape.

Scale notes: state is one row per (window, event_type) per partition
until the watermark passes; the aggregation is a streaming partial+final
hash aggregate keyed by (window, event_type), i.e. exactly the batch
plan plus state eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """events stream -> per-(window, event_type) counts and value sums.

    Append-mode compatible: results for a window emit once its end
    passes the watermark.  Columns mirror the batch twin so downstream
    consumers (and tests) can compare directly.
    """
    # watermarks require TIMESTAMP (LTZ); parquet event times may read as
    # TIMESTAMP_NTZ — the cast is value-preserving under the session's
    # fixed UTC timezone (session.py)
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
