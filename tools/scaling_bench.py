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
    try:
        src = load_synthetic_src(spark, args.n, num_partitions=args.cpus * 2)
        t0 = time.perf_counter()
        pipe = Pipeline(spark, out)
        final = pipe.run(src, resume=False)
        triples = next(
            r["rows"] for r in pipe.lineage() if r["stage"] == "graph"
        )
        wall = time.perf_counter() - t0
        print(json.dumps({
            "cpus": args.cpus, "wall_s": round(wall, 3), "triples": triples,
            "stages": {r["stage"]: r.get("wall_s", "fused") for r in pipe.lineage()},
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
