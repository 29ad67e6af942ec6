"""SparkSession factory tuned for this engine.

Local mode is the test stand-in for a multi-executor cluster: shuffle
partitioning, AQE, and Arrow settings are chosen so the same plans scale to a
1000-executor cluster reading 100 TB (see SURVEY.md §3.4 / §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xmltoldmigration_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract) or
    ``local[*]``. ``shuffle_partitions`` defaults to the local core count so
    small-scale runs aren't over-parallelized; on a real cluster this should
    be ~2-3x total executor cores (set via spark-submit conf).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    # Module-level UDFs (e.g. operators/simhash._simhash_hex) pickle by
    # module REFERENCE, so Python workers must be able to import this
    # package regardless of the driver's cwd.  PYTHONPATH set before the
    # JVM spawns reaches local-mode workers; spark.executorEnv covers the
    # cluster case.  (Nested closures instead capture the path string and
    # bootstrap sys.path inside — see kg/transfers/rkts.py.)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + pp if pp else "")
        )
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(cpus) if cpus.isdigit() else min(n, 32)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE can COALESCE shuffle partitions but never split a too-coarse
        # aggregate shuffle: start wide and let it shrink to the advisory
        # size, so a 10x data growth can't spill a fixed partition count
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(shuffle_partitions * 8, 64)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # mega-records (outlines emit 1e4-1e5 triples) must not blow one
        # Arrow batch: cap batch size in the parse stage (SURVEY.md §7.3)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
