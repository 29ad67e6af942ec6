"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle must match DuckDB on row count, column names, and
order-insensitive values at sf0.01 (TESTDATA.md: t2 correctness scale).

Value comparison is strict: floats must match to near-bit precision (the
queries are designed for determinism — decimal-cast aggregation, sequential
double folds), everything else exactly.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(rows, cols):
    """Sort columns by name, then rows; normalize values for comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return ("\x00null",)
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", f"{v:.10g}")
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def _spec_items():
    from xmltoldmigration_spark.queries import registry

    return sorted(registry().items())


@pytest.mark.parametrize("name", [n for n, s in _spec_items() if s.oracle is not None])
def test_query_matches_oracle(spark, ddb, name):
    from xmltoldmigration_spark.queries import registry

    spec = registry()[name]
    sdf = spec.fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    ores = ddb.execute(spec.oracle)
    ocols = [d[0].lower() for d in ores.description]
    orows = ores.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    sc, oc = _canon(srows, scols), _canon(orows, ocols)
    mismatches = [(a, b) for a, b in zip(sc, oc) if a != b]
    assert not mismatches, f"{name}: first value mismatch {mismatches[:3]}"


@pytest.mark.parametrize("name", [n for n, s in _spec_items() if s.oracle is None])
def test_rows_only_queries_run(spark, name):
    from xmltoldmigration_spark.queries import registry

    spec = registry()[name]
    sdf = spec.fn(spark, SF_DIR)
    # force FULL evaluation (count() would prune unreferenced UDF columns)
    rows = sdf.collect()
    assert len(rows) >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # every oracle key must exist in queries()
    q, o = e.queries(), e.oracle_sql()
    assert set(o).issubset(set(q))
