"""Value-level golden checks for deterministic rows-only queries.

These have no DuckDB oracle (simhash bit votes, binary resize, sha256
serialization are not SQL), but each is a pure function of the seeded
inputs, so its full output is PINNED as a committed fixture — the same
self-oracle pattern as the reference's byte-exact content goldens
(MigrationTest.java:520-558).  Binary columns compare by md5.

Regenerate after an intentional semantics change:
    python tools/gen_golden.py
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import pytest

SF_DIR = "/root/testdata/sf0.01"
GOLDEN = Path(__file__).parent / "fixtures" / "golden"
# Every deterministic rows-only entry is pinned; the one exception is
# ann_ivf_probe, whose BLAS-matmul tie-breaks are float-rounding-
# sensitive across numpy builds (it has its own determinism + recall
# tests instead, tests/test_kg_pipeline.py).
NAMES = (
    "dedup_simhash", "multimodal_resize", "kg_canonical_serialization",
    "kg_parse_triple_extraction", "kg_symmetric_completion",
    "kg_dangling_link_report", "kg_full_pipeline_by_type",
    "kg_title_export", "kg_rkts_transfer", "ann_lsh_bucketed",
)


def _load_fixture(name: str):
    lines = (GOLDEN / f"{name}.csv").read_text().splitlines()
    cols = lines[0].split(",")
    return cols, [line.split(",") for line in lines[1:]]


@pytest.mark.parametrize("name", NAMES)
def test_golden_values(spark, name):
    from xmltoldmigration_spark.queries import registry

    df = registry()[name].fn(spark, SF_DIR)
    cols, want = _load_fixture(name)
    assert df.columns == cols, f"{name}: columns {df.columns} != {cols}"
    got = []
    for r in df.collect():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, (bytes, bytearray)):
                v = "md5:" + hashlib.md5(bytes(v)).hexdigest()
            vals.append(str(v))
        got.append(vals)
    got.sort()
    assert len(got) == len(want), f"{name}: {len(got)} rows vs {len(want)}"
    diffs = [(a, b) for a, b in zip(got, want) if a != b]
    assert not diffs, f"{name}: first value diffs {diffs[:3]}"
