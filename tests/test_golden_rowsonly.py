"""Value-level golden checks for deterministic rows-only queries.

These have no DuckDB oracle (simhash bit votes, binary resize, sha256
serialization, XML/TTL parse are not SQL), but each is a pure function
of the seeded inputs, so its full output is PINNED as a committed
fixture — the same self-oracle pattern as the reference's byte-exact
content goldens (MigrationTest.java:520-558).  Binary columns compare
by md5.  The pinned-name list and canonicalization are shared with the
generator (tools/golden_common.py).

Regenerate after an intentional semantics change:
    python tools/gen_golden.py
"""

from __future__ import annotations

import pytest

from tools.golden_common import GOLDEN_NAMES, SF_DIR, canonicalize, read_fixture


@pytest.mark.parametrize("name", GOLDEN_NAMES)
def test_golden_values(spark, name):
    from xmltoldmigration_spark.queries import registry

    cols, want = read_fixture(name)
    got_cols, got = canonicalize(registry()[name].fn(spark, SF_DIR))
    assert got_cols == cols, f"{name}: columns {got_cols} != {cols}"
    assert len(got) == len(want), f"{name}: {len(got)} rows vs {len(want)}"
    diffs = [(a, b) for a, b in zip(got, want) if a != b]
    assert not diffs, f"{name}: first value diffs {diffs[:3]}"


def test_golden_covers_all_deterministic_rows_only():
    """Every rows-only queries() entry must be either golden-pinned or on
    the documented exception list — a new rows-only query can't ship
    without a value-level check."""
    import __spark_entry__ as e

    rows_only = set(e.queries()) - set(e.oracle_sql())
    exceptions: set[str] = set()  # none — every rows-only entry is pinned
    unpinned = rows_only - set(GOLDEN_NAMES) - exceptions
    assert not unpinned, f"rows-only entries without a value check: {unpinned}"
