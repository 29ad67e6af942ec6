#!/usr/bin/env python
"""One scaling-probe run: the full KG pipeline at a given local[N] level.

Prints one JSON line {"cpus": N, "wall_s": ..., "triples": ...}.
The N-vs-4N comparison (BASELINE.json north_rule) runs this twice via
kg/bench.run_scaling_probe — fresh JVM per level so executor-thread count
is the only variable.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--src", choices=["parquet", "generate"], default="parquet",
                    help="parquet: pre-materialized columnar source (the "
                         "Iceberg-scan stand-in, default); generate: "
                         "in-job synthetic generation (round-1/2 method)")
    ap.add_argument("--n-files", type=int, default=None,
                    help="parquet mode: file count of the materialized "
                         "source (default max(16, 2*cpus)). One file = one "
                         "row group = the parse-parallelism floor, so a "
                         "PAIR of runs must pass the same value sized for "
                         "the HIGHER leg (run_scaling_probe does).")
    args = ap.parse_args()

    from xmltoldmigration_spark.plans.pipeline import Pipeline
    from xmltoldmigration_spark.session import get_spark
    from xmltoldmigration_spark.sources.corpus import load_synthetic_src

    import os

    extra = {}
    if os.path.isdir("/dev/shm"):
        # shuffle/spill to RAM-disk: the single-VM stand-in for the
        # executor-local NVMe a real cluster node has — otherwise all N
        # "executors" contend for one virtio disk and the write stages
        # cap at ~2x regardless of cores
        os.makedirs("/dev/shm/spark", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark"
    spark = get_spark(
        app_name=f"kg-scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
        extra_conf=extra,
    )
    out_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = tempfile.mkdtemp(prefix=f"kgscale{args.cpus}_", dir=out_base)
    src_dir = None
    try:
        # fixed file count in parquet mode: both parallelism levels of a
        # pair scan the IDENTICAL byte layout, so cores are the only
        # variable; default floors parse parallelism at >= 2 tasks/core
        # for THIS run — pairs above 8 cores must pin --n-files to the
        # higher leg's value on both runs
        if args.src == "parquet":
            n_parts = args.n_files or max(16, 2 * args.cpus)
        else:
            n_parts = args.cpus * 2
        src = load_synthetic_src(spark, args.n, num_partitions=n_parts)
        if args.src == "parquet":
            # Materialize the source table OUTSIDE the timed window and
            # read it back as a columnar scan: the engine's real input is
            # an Iceberg/parquet table of raw records (BASELINE north
            # star / TESTDATA shape), not an in-job Python generator —
            # inline generation rides the Python-RDD pickle path and its
            # cost/scaling belongs to the harness, not the pipeline.
            # (--src generate keeps the round-1/2 methodology.)
            src_dir = tempfile.mkdtemp(prefix=f"kgsrc{args.cpus}_", dir=out_base)
            src.write.mode("overwrite").parquet(src_dir)
            # size scan splits for the bench corpus: the default 128 MB
            # bins a small corpus into a couple of partitions and the
            # shuffle-free parse stage loses its parallelism (at 100 TB
            # the default gives thousands of splits and this knob is moot)
            total = sum(
                f.stat().st_size for f in Path(src_dir).glob("*.parquet")
            )
            split = max(total // (2 * max(args.cpus, 8)), 1024 * 1024)
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
            src = spark.read.parquet(src_dir)
        t0 = time.perf_counter()
        pipe = Pipeline(spark, out)
        final = pipe.run(src, resume=False)
        triples = next(
            r["rows"] for r in pipe.lineage() if r["stage"] == "graph"
        )
        wall = time.perf_counter() - t0
        # self-bracketing controls (AFTER the timed window): scalar CPU and
        # memory-bandwidth windows proved INDEPENDENT on this VM (round 4:
        # scalar at its floor while 4-stream bandwidth ran ~100x inflated),
        # so a leg is only comparable to another leg when BOTH match
        from tools.cpu_control import parallel, single

        print(json.dumps({
            "cpus": args.cpus, "wall_s": round(wall, 3), "triples": triples,
            "src": args.src,
            "stages": {r["stage"]: r.get("wall_s", "fused") for r in pipe.lineage()},
            "ctl_cpu_s": single(),
            "ctl_mem_s": parallel(min(args.cpus, 8), mem=True, small=True)["mean"],
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        if src_dir:
            shutil.rmtree(src_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
