"""Regenerate the committed golden fixtures for the deterministic
rows-only queries (tests/fixtures/golden/*.csv).

These entries have no DuckDB oracle (simhash bit votes, binary resize,
sha256 serialization are not SQL) but ARE pure functions of the seeded
inputs — the reference pins byte-exact content goldens for exactly this
class (MigrationTest.java:520-558).  Run only when the operator semantics
intentionally change:

    python tools/gen_golden.py
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
OUT = REPO / "tests" / "fixtures" / "golden"


def rows_for(name: str, spark):
    from xmltoldmigration_spark.queries import registry

    df = registry()[name].fn(spark, SF_DIR)
    out = []
    for r in df.collect():
        vals = []
        for c in df.columns:
            v = r[c]
            if isinstance(v, (bytes, bytearray)):
                v = "md5:" + hashlib.md5(bytes(v)).hexdigest()
            vals.append(str(v))
        out.append(vals)
    return df.columns, sorted(out)


def main():
    from xmltoldmigration_spark.session import get_spark

    spark = get_spark(app_name="gen-golden", master="local[8]",
                      shuffle_partitions=8)
    OUT.mkdir(parents=True, exist_ok=True)
    for name in ("dedup_simhash", "multimodal_resize",
                 "kg_canonical_serialization", "kg_parse_triple_extraction",
                 "kg_symmetric_completion", "kg_dangling_link_report",
                 "kg_full_pipeline_by_type", "kg_title_export",
                 "kg_rkts_transfer", "ann_lsh_bucketed"):
        cols, rows = rows_for(name, spark)
        p = OUT / f"{name}.csv"
        with open(p, "w") as f:
            f.write(",".join(cols) + "\n")
            for r in rows:
                f.write(",".join(r) + "\n")
        print(f"{p}: {len(rows)} rows")
    spark.stop()


if __name__ == "__main__":
    main()
