#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect). Set BENCH_SCALING=1 to additionally run the scaling
probe (same job at local[8] vs local[32]) — that variant spawns two fresh
JVMs, so it is opt-in.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# scale-meaningful subset (dedup_ngram_jaccard is deliberately excluded at
# sf0.1: the exact inverted-index pair join is the quadratic baseline that
# minhash_lsh exists to replace)
HEADLINE = [
    "q1_pricing_summary",
    "j7_shuffle_join_revenue",
    "j1_redirect_rewrite",
    "a1_symmetric_completion",
    "a2_preflabel_window",
    "window_topk_orders",
    "skew_salted_two_phase_agg",
    "g1_connected_components",
    "g2_representative_rewrite",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "text_token_count",
    "text_quality_score",
    "text_fingerprint",
    "stream_tumbling_window_agg",
    "stream_sessionization",
    "multimodal_binary_metadata",
    "c12_imagelist_rle",
    "dedup_embedding_cosine",
    "stream_stateful_sessionization",
]


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_queries(spark, names: list[str]) -> dict[str, float]:
    from xmltoldmigration_spark.queries import registry

    reg = registry()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        _force(reg[name].fn(spark, SF_DIR))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def _host_ctl() -> float:
    """Single-core CPU control: this VM's effective speed swings 1.5-2x
    across hours, so the bench JSON carries the host window it ran in —
    cross-round comparisons must normalize by it.  Shared with the scaling
    legs via tools/cpu_control.py so the two probes can't drift."""
    from tools.cpu_control import single

    return single()


def _mem_ctl(procs: int) -> float:
    """Parallel memory-streaming control: mean per-proc seconds for a
    128 MB copy loop run CPUS-wide.  The single-core control misses
    memory-bandwidth saturation entirely, and that is the dimension this
    VM degrades hardest (round 4 measured 5.5x per-proc inflation at 32
    streams in a window where the integer loop inflated only 1.4x) —
    which is what throttles the 32-wide Arrow/BLAS-heavy queries here.
    Same probe as tools/cpu_control.py --mem (small) so BENCH.md numbers
    normalize across rounds.  Called AFTER spark.stop(): 32 children x
    ~190 MB transient next to a resident 100 GiB-heap JVM risks the OOM
    killer taking out the bench after its measurements."""
    from tools.cpu_control import parallel

    try:
        return parallel(procs, mem=True, small=True)["mean"]
    except Exception:
        # the control is context, never a reason for the bench to fail
        return -1.0


def main() -> None:
    from xmltoldmigration_spark.session import get_spark

    ctl_before = _host_ctl()
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    # warm the JVM/parquet footers so per-query numbers measure the queries
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # KG pipeline throughput first (before 23 queries churn the JVM heap)
    # and best-of-2: this VM shows up to ±40% run variance, and the
    # steady-state number is the one that predicts cluster throughput
    kg_extra = {}
    try:
        from xmltoldmigration_spark.kg.bench import bench_kg_pipeline

        runs = [bench_kg_pipeline(spark) for _ in range(2)]
        kg_extra = min(runs, key=lambda r: r["kg_wall_s"])
    except ImportError:
        pass

    t0 = time.perf_counter()
    times = run_queries(spark, HEADLINE)
    total = round(time.perf_counter() - t0, 3)

    ctl_after = _host_ctl()
    spark.stop()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "host_ctl_s": [ctl_before, ctl_after],
        "mem_ctl_s": _mem_ctl(int(CPUS)),
        **kg_extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
