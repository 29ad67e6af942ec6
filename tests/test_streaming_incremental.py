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
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).filter(F.col("stream") == "triple").count()
    assert n1 > 0

    # drop more files; restart drains ONLY the delta
    load_synthetic_src(spark, 30, seed=7, num_partitions=1).write.mode("append").parquet(src_dir)
    q = stream_parse(spark, src_dir, out_dir, ckpt)
    q.awaitTermination(120)
    n2 = spark.read.parquet(out_dir).filter(F.col("stream") == "triple").count()
    assert n2 > n1

    # a third restart with no new input must add nothing (exactly-once)
    q = stream_parse(spark, src_dir, out_dir, ckpt)
    q.awaitTermination(120)
    n3 = spark.read.parquet(out_dir).filter(F.col("stream") == "triple").count()
    assert n3 == n2
