"""Shared fixture logic for the golden rows-only checks.

One source of truth for WHICH queries are pinned and HOW rows
canonicalize — tools/gen_golden.py writes fixtures with it and
tests/test_golden_rowsonly.py asserts with it, so a new deterministic
query can't end up pinned in one place and stale in the other.
Fixtures are real CSV (csv module), so values containing commas or
quotes round-trip instead of silently corrupting the field count.
"""

from __future__ import annotations

import csv
import hashlib
from pathlib import Path

# Every deterministic rows-only queries() entry.  ann_ivf_probe joined
# the list once its cell assignment / probe order / final ranking all
# quantize similarities to 6 decimals (operators/similarity.py), which
# removed the BLAS-matmul tie-break sensitivity; partition-invariance is
# verified in tests/test_kg_pipeline.py alongside its recall floor.
GOLDEN_NAMES = (
    "dedup_simhash", "multimodal_resize", "kg_canonical_serialization",
    "kg_parse_triple_extraction", "kg_symmetric_completion",
    "kg_dangling_link_report", "kg_full_pipeline_by_type",
    "kg_title_export", "kg_rkts_transfer", "ann_lsh_bucketed",
    "ann_ivf_probe",
)

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "golden"
SF_DIR = "/root/testdata/sf0.01"


def canonicalize(df) -> tuple[list[str], list[list[str]]]:
    """(columns, sorted stringified rows); binary values compare by md5."""
    cols = df.columns
    out = []
    for r in df.collect():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, (bytes, bytearray)):
                v = "md5:" + hashlib.md5(bytes(v)).hexdigest()
            vals.append(str(v))
        out.append(vals)
    out.sort()
    return cols, out


def write_fixture(name: str, cols: list[str], rows: list[list[str]]) -> Path:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    p = GOLDEN_DIR / f"{name}.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(cols)
        w.writerows(rows)
    return p


def read_fixture(name: str) -> tuple[list[str], list[list[str]]]:
    with open(GOLDEN_DIR / f"{name}.csv", newline="") as f:
        rd = csv.reader(f)
        cols = next(rd)
        return cols, [row for row in rd]
