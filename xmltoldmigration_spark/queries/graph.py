"""Graph operator embodiments: A1 symmetric completion, G1 connected
components, G2 representative rewrite (SURVEY §2.5/2.6) over the synthetic
star schema.

Node-id space for G1/G2: region r_regionkey, nation 1000+n_nationkey,
customer 10000+c_custkey. The customer->nation->region edges form one tree
per region, so the ground-truth component representative of every node is
its region key (regions hold the minimum ids) — which is exactly what the
SQL oracle states, while the Spark side computes it with the generic
iterative min-propagation operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmltoldmigration_spark.operators.connected_components import connected_components
from xmltoldmigration_spark.queries import register
from xmltoldmigration_spark.tables import load_table


def _hierarchy_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    c_n = cust.select(
        (F.col("c_custkey") + 10000).cast("bigint").alias("src"),
        (F.col("c_nationkey") + 1000).cast("bigint").alias("dst"),
    )
    n_r = nation.select(
        (F.col("n_nationkey") + 1000).cast("bigint").alias("src"),
        F.col("n_regionkey").cast("bigint").alias("dst"),
    )
    return c_n.union(n_r)


@register(
    "a1_symmetric_completion",
    oracle="""
    WITH e AS (SELECT DISTINCT l_orderkey AS src, 'linkedTo' AS pred,
                               l_suppkey + 1000000 AS dst
               FROM lineitem)
    SELECT src, pred, dst FROM e
    UNION
    SELECT dst AS src, 'linkedFrom' AS pred, src AS dst FROM e
    """,
    survey_ref="A1 (SymetricNormalization inverse completion)",
)
def a1_symmetric_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xmltoldmigration_spark.operators.symmetric import complete_symmetric

    li = load_table(spark, sf_dir, "lineitem")
    # no pre-distinct: complete_symmetric ends in a full dropDuplicates,
    # which subsumes it — one shuffle (with map-side partial dedup)
    # instead of two
    edges = li.select(
        F.col("l_orderkey").alias("src"),
        F.lit("linkedTo").alias("pred"),
        (F.col("l_suppkey") + 1000000).alias("dst"),
    )
    return complete_symmetric(edges, {"linkedTo": "linkedFrom"})


@register(
    "a1_one_direction_normalize",
    oracle="""
    WITH e AS (
      SELECT o_custkey AS src,
             CASE WHEN o_orderkey % 2 = 0 THEN 'teacherOf' ELSE 'studentOf' END AS pred,
             o_orderkey + 5000000 AS dst
      FROM orders
    )
    SELECT DISTINCT src, pred, dst FROM e WHERE pred = 'studentOf'
    UNION
    SELECT DISTINCT dst AS src, 'studentOf' AS pred, src AS dst FROM e WHERE pred = 'teacherOf'
    """,
    survey_ref="A1 one-direction mode (normalizeOneDirection)",
)
def a1_one_direction_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xmltoldmigration_spark.operators.symmetric import normalize_one_direction

    orders = load_table(spark, sf_dir, "orders")
    edges = orders.select(
        F.col("o_custkey").alias("src"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("teacherOf"))
        .otherwise(F.lit("studentOf"))
        .alias("pred"),
        (F.col("o_orderkey") + 5000000).alias("dst"),
    )
    return normalize_one_direction(edges, {"teacherOf": "studentOf"})


@register(
    "g1_connected_components",
    oracle="""
    SELECT c_custkey + 10000 AS node, CAST(r_regionkey AS BIGINT) AS comp
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    UNION ALL
    SELECT n_nationkey + 1000 AS node, CAST(n_regionkey AS BIGINT) AS comp FROM nation
    UNION ALL
    SELECT CAST(r_regionkey AS BIGINT) AS node, CAST(r_regionkey AS BIGINT) AS comp FROM region
    WHERE r_regionkey IN (SELECT n_regionkey FROM nation)
    """,
    survey_ref="G1 (duplicate-work clustering via connected components)",
)
def g1_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _hierarchy_edges(spark, sf_dir)
    return connected_components(edges).select("node", "comp")


@register(
    "g2_representative_rewrite",
    oracle="""
    WITH rep AS (
      SELECT c_custkey, MIN(c_custkey) OVER (PARTITION BY c_nationkey) AS canonical
      FROM customer
    )
    SELECT o.o_orderkey AS subj, 'placedBy' AS pred, r.canonical AS obj
    FROM orders o JOIN rep r ON o.o_custkey = r.c_custkey
    """,
    survey_ref="G2 (representative rewrite of subject/object columns)",
)
def g2_representative_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rep = cust.select(
        "c_custkey",
        F.min("c_custkey").over(W.partitionBy("c_nationkey")).alias("canonical"),
    )
    triples = orders.select(
        F.col("o_orderkey").alias("subj"),
        F.lit("placedBy").alias("pred"),
        F.col("o_custkey").alias("obj"),
    )
    return (
        triples.join(F.broadcast(rep), triples.obj == rep.c_custkey, "inner")
        .select("subj", "pred", F.col("canonical").alias("obj"))
    )
