"""Connected components via iterative min-label propagation (G1, SURVEY §2.6).

The reference ships duplicate-work clusters as precomputed pair lists
(clusters.csv et al., loaded in CommonMigration.initClusters,
reference CommonMigration.java:152-157); in this engine clustering is a real
distributed stage: cluster pairs form an undirected edge list, each node's
component representative is the minimum node id reachable from it.

Algorithm: large-star/small-star-style min propagation —
    label(v) <- min(label(v), min over neighbors u of label(u))
iterated to fixpoint. Each iteration is one shuffle join + one aggregation;
convergence is O(log d) iterations for diameter d (cluster pair lists are
shallow: star-shaped around the canonical id, so 2-4 iterations in
practice). `localCheckpoint` truncates the lineage each iteration so the
plan doesn't grow exponentially — mandatory for iterative DataFrame jobs.

No GraphFrames dependency: plain joins keep this runnable anywhere and let
AQE handle skewed hub nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    driver_threshold: int = 250_000,
) -> DataFrame:
    """Return DataFrame[node, component] where component = min node id
    reachable from `node` over the undirected edge set.

    Size-adaptive: an edge list under `driver_threshold` rows (default
    250k — comfortably above the ~130k-row authority cluster lists this
    pipeline feeds it, and small enough that the collect can't strain the
    driver) is broadcast-scale authority data — a driver-side union-find
    computes components in one pass with zero shuffles, exactly like any
    other broadcast side-table.  Above the threshold the distributed
    min-propagation loop below takes over (each iteration one shuffle
    join + aggregation, lineage truncated by localCheckpoint).

    `edges` must have two columns of the same orderable type. Isolated
    nodes appear only if present as a self-edge or in both columns.
    """
    approx = edges.limit(driver_threshold + 1).count()
    if approx <= driver_threshold:
        rows = edges.select(src, dst).collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min so the representative is the min id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = {n for row in rows for n in row}
        out = [(n, find(n)) for n in sorted(nodes)]
        import pandas as pd

        # pandas -> Arrow path avoids per-row Py4J conversion
        return edges.sparkSession.createDataFrame(
            pd.DataFrame(out, columns=["node", "comp"])
        )
    # cluster pair lists are tiny relative to the triple table; bound the
    # task count so each min-propagation iteration isn't scheduling-bound
    n = edges.rdd.getNumPartitions()
    if n > 16:
        edges = edges.coalesce(16)
    # undirected: symmetrize once, dedup
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .union(edges.select(F.col(src).alias("a"), F.col(src).alias("b")))
        .union(edges.select(F.col(dst).alias("a"), F.col(dst).alias("b")))
        .distinct()
    )
    # initial label = min direct neighbor (includes self via self-edges)
    labels = sym.groupBy("a").agg(F.min("b").alias("comp")).select(
        F.col("a").alias("node"), "comp"
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # propagate: candidate label for node v = min over neighbors u of label(u)
        neighbor_labels = (
            sym.join(labels, sym.b == labels.node, "inner")
            .select(F.col("a").alias("node"), F.col("comp"))
        )
        new_labels = (
            labels.select("node", "comp")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        # fixpoint test: any node whose label shrank this round?
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
