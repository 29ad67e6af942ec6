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


def test_hashed_shingles_equal_string_shingles(spark):
    """The dedup pipeline carries shingles as xxhash64 longs; that is only
    oracle-equivalent if jaccard over hashed-shingle sets equals jaccard
    over the joined-string sets for every doc pair.  Pin it on a crafted
    corpus that exercises repeats, multi-space runs, <3-token docs, and
    token-boundary-shift lookalikes ("a b"+"c" vs "a"+"b c" can't occur —
    tokens are whitespace-split — but near-identical docs can)."""
    from pyspark.sql import functions as F

    from xmltoldmigration_spark.queries.dedup import _SHINGLES_EXPR

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the  quick   brown fox jumps over the lazy dog"),  # same tokens
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "one two"),  # <3 tokens: no shingles
        (5, "x y z x y z x y z"),  # repeated shingles collapse via distinct
        (6, "completely different text with no overlap at all here"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    toks = docs.select(
        "doc_id", F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("toks")
    )
    string_expr = """
    CASE WHEN size(toks) >= 3 THEN
      transform(sequence(0, size(toks) - 3),
                j -> concat_ws(' ', toks[j], toks[j+1], toks[j+2]))
    ELSE array() END
    """

    def jaccards(expr):
        sh = toks.select(
            "doc_id", F.explode(F.expr(expr)).alias("shingle")
        ).distinct()
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        a = sh.select(F.col("doc_id").alias("a"), F.col("shingle").alias("s"))
        b = sh.select(F.col("doc_id").alias("b"), F.col("shingle").alias("s"))
        inter = (
            a.join(b, ["s"])
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("i"))
        )
        rows = (
            inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
            .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
            .select("a", "b", (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"))
            .collect()
        )
        return {(r["a"], r["b"]): r["j"] for r in rows}

    j_str, j_hash = jaccards(string_expr), jaccards(_SHINGLES_EXPR)
    assert j_str == j_hash
    assert (1, 2) in j_str and j_str[(1, 2)] == 1.0  # whitespace runs collapse
    assert all(v <= 1.0 for v in j_str.values())


def test_no_quadratic_joins_in_any_plan(spark):
    """Scale gate: no registry query may plan a CartesianProduct, and
    BroadcastNestedLoopJoin is allowed only where the build side is a
    literal prop-inverse dim (tools/plan_audit.py allowlist).  Plans are
    compiled at sf0.001 — join strategy shape doesn't depend on sf, and
    a strategy flip (e.g. a lost equi-join condition turning a join
    quadratic) fails here before it ships."""
    from tools.plan_audit import _BNLJ_OK, _SKIP, audit_plan
    from xmltoldmigration_spark.queries import registry

    sf = "/root/testdata/sf0.001"
    bad = []
    for name, spec in sorted(registry().items()):
        if name in _SKIP:
            continue
        plan = spec.fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        facts = audit_plan(plan)
        if facts["cartesian"]:
            bad.append(f"{name}: CartesianProduct")
        if facts["bnlj"] and name not in _BNLJ_OK:
            bad.append(f"{name}: BroadcastNestedLoopJoin outside allowlist")
    assert not bad, bad
