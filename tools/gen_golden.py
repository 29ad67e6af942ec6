"""Regenerate the committed golden fixtures for the deterministic
rows-only queries (tests/fixtures/golden/*.csv).

These entries have no DuckDB oracle (simhash bit votes, binary resize,
sha256 serialization, XML/TTL parse are not SQL) but ARE pure functions
of the seeded inputs — the reference pins byte-exact content goldens for
exactly this class (MigrationTest.java:520-558).  Run only when the
operator semantics intentionally change:

    python tools/gen_golden.py

The name list and row canonicalization live in tools/golden_common.py,
shared with tests/test_golden_rowsonly.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.golden_common import GOLDEN_NAMES, SF_DIR, canonicalize, write_fixture


def main():
    from xmltoldmigration_spark.queries import registry
    from xmltoldmigration_spark.session import get_spark

    spark = get_spark(app_name="gen-golden", master="local[8]",
                      shuffle_partitions=8)
    reg = registry()
    for name in GOLDEN_NAMES:
        cols, rows = canonicalize(reg[name].fn(spark, SF_DIR))
        p = write_fixture(name, cols, rows)
        print(f"{p}: {len(rows)} rows")
    spark.stop()


if __name__ == "__main__":
    main()
