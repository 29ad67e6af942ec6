"""Incremental (Structured Streaming) parse: new src files are picked up
exactly once across restarts via the streaming checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from xmltoldmigration_spark.session import get_spark

    return get_spark("kg-stream-test", master="local[4]", shuffle_partitions=4)


def test_stream_parse_exactly_once(spark, tmp_path):
    from xmltoldmigration_spark.sources.corpus import load_synthetic_src
    from xmltoldmigration_spark.streaming.incremental import stream_parse

    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    load_synthetic_src(spark, 50, num_partitions=2).write.parquet(src_dir)
    q = stream_parse(spark, src_dir, out_dir, ckpt)
    assert q.awaitTermination(120), "streaming query timed out"
    n1 = spark.read.parquet(out_dir).filter(F.col("stream") == "triple").count()
    assert n1 > 0

    # drop more files; restart drains ONLY the delta
    load_synthetic_src(spark, 30, seed=7, num_partitions=1).write.mode("append").parquet(src_dir)
    q = stream_parse(spark, src_dir, out_dir, ckpt)
    assert q.awaitTermination(120), "streaming query timed out"
    n2 = spark.read.parquet(out_dir).filter(F.col("stream") == "triple").count()
    assert n2 > n1

    # a third restart with no new input must add nothing (exactly-once)
    q = stream_parse(spark, src_dir, out_dir, ckpt)
    assert q.awaitTermination(120), "streaming query timed out"
    n3 = spark.read.parquet(out_dir).filter(F.col("stream") == "triple").count()
    assert n3 == n2


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over a 2-batch stream equals
    the oracle-checked batch lag+cumsum query: sessions span micro-batch
    boundaries via the carried (last_epoch, session) state."""
    import time

    from pyspark.sql.window import Window as W
    from xmltoldmigration_spark.streaming.stateful import sessionize_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        F.col("user_id") < 40
    )
    # split by TIME into two files so the session state must carry over
    # (event-time order across batches is what the state contract assumes)
    cut = ev.select(F.unix_timestamp("ts").alias("e")).approxQuantile("e", [0.5], 0.0)[0]
    src_dir = tmp_path / "events_stream"
    ev.filter(F.unix_timestamp("ts") <= cut).coalesce(1).write.parquet(str(src_dir))
    time.sleep(1.1)  # file source orders batches by modification time
    ev.filter(F.unix_timestamp("ts") > cut).coalesce(1).write.mode("append").parquet(str(src_dir))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query timed out"
    # update semantics: within one (user, session) the n_events of
    # successive updates only grows and first_event only shrinks, so the
    # final row is (max n_events, min first_event)
    finals = (
        spark.table("sess_updates")
        .groupBy("user_id", "session_id")
        .agg(F.max("n_events").alias("n_events"), F.min("first_event").alias("first_event"))
    )
    got = {
        (r.user_id, r.session_id): (r.n_events, r.first_event)
        for r in finals.collect()
    }

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    batch = (
        ev.withColumn("new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("event_id").alias("first_event"))
    )
    want = {
        (r.user_id, r.session_id): (r.n_events, r.first_event)
        for r in batch.collect()
    }
    assert got == want and len(want) > 20


def test_windowed_counts_matches_batch(spark, tmp_path):
    """Watermarked tumbling-window aggregation over a finite stream equals
    the oracle-checked batch twin (complete-mode drain, availableNow)."""
    import uuid

    from xmltoldmigration_spark.streaming.windowed import windowed_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        F.col("user_id") < 30
    )
    src_dir = str(tmp_path / "ev_win")
    ev.coalesce(2).write.parquet(src_dir)
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    name = "win_" + uuid.uuid4().hex[:8]
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query timed out"
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in spark.table(name).collect()
    }
    batch = (
        ev.groupBy(
            (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("bigint").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in batch.collect()
    }
    assert got == want and len(want) > 50
