"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — broadcast the (small) query set
  against the full corpus; the dot product stays JVM-side via
  zip_with/aggregate (no Python in the hot path). At 100 TB the corpus side
  streams partition-parallel; only the query set is broadcast.
- lsh_topk: random-hyperplane LSH bucketing — queries only probe their own
  bucket (plus optional multi-probe), turning the scan into a bucket-local
  join. The hyperplanes are a deterministic md5-seeded matrix so results are
  reproducible across retries/executors.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _cosine(a: str, b: str):
    """Column expr: cosine similarity of two array<double> columns, computed
    with sequential double folds (bit-stable across partitionings)."""
    dot = F.aggregate(F.zip_with(F.col(a), F.col(b), lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.aggregate(F.col(a), F.lit(0.0), lambda s, x: s + x * x)
    nb = F.aggregate(F.col(b), F.lit(0.0), lambda s, x: s + x * x)
    return dot / (F.sqrt(na) * F.sqrt(nb))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame[query_id, neighbor_id, rk] — exact cosine top-k, self excluded."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", _cosine("qv", "cv"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk")
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplane matrix (md5 counter-mode)."""
    vals = []
    i = 0
    while len(vals) < dim * n_planes:
        h = hashlib.md5(f"lsh-plane:{i}".encode()).digest()
        for off in range(0, 16, 4):
            vals.append(int.from_bytes(h[off : off + 4], "big") / 2**31 - 1.0)
        i += 1
    return np.array(vals[: dim * n_planes]).reshape(n_planes, dim)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: sign-of-projection bucket per vector; queries only
    score candidates in their own bucket. Bucket id is computed JVM-side as
    a sum of sign bits over the broadcast plane matrix (array literals)."""
    planes = _hyperplanes(dim, n_planes)

    def bucket_expr(vec: str):
        bits = []
        for p in range(n_planes):
            lit = F.array(*[F.lit(float(x)) for x in planes[p]])
            proj = F.aggregate(
                F.zip_with(F.col(vec), lit, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
            )
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("bucket", bucket_expr("cv"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("bucket", bucket_expr("qv"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", _cosine("qv", "cv"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk")
    )


def exact_cosine_pairs(
    df,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 16,
):
    """Exact all-pairs cosine >= threshold via BLOCKED numpy matmul.

    The naive pair join evaluates an interpreted higher-order-function
    dot product per pair (no codegen for HOFs) — ~50x slower than BLAS.
    Here vectors group into `n_blocks` blocks, the (upper-triangle)
    block-pair grid crosses, and ONE Arrow batch per block pair computes
    the full cosine submatrix with a normalized matmul.  Work stays
    O(n^2/blocks) per task and O(n^2) total — it is the exact baseline;
    the LSH-bucketed path (lsh_bucket_topk) is the subquadratic one.
    Each emitted pair is oriented (min_id, max_id), cosine rounded to 3
    decimals (cross-engine float noise ~1e-7).
    """
    from pyspark.sql import functions as F

    blocks = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .withColumn("blk", F.pmod(F.col("id"), F.lit(n_blocks)))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("id", "vec")).alias("vs"))
    )
    grid = (
        blocks.select(F.col("blk").alias("blk_a"), F.col("vs").alias("vs_a"))
        .crossJoin(
            blocks.select(F.col("blk").alias("blk_b"), F.col("vs").alias("vs_b"))
        )
        .filter(F.col("blk_a") <= F.col("blk_b"))
    )

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for vs_a, vs_b, same in zip(
                pdf["vs_a"], pdf["vs_b"], pdf["blk_a"] == pdf["blk_b"]
            ):
                ids_a = np.array([r["id"] for r in vs_a], dtype=np.int64)
                ids_b = np.array([r["id"] for r in vs_b], dtype=np.int64)
                A = np.array([r["vec"] for r in vs_a], dtype=np.float64)
                B = np.array([r["vec"] for r in vs_b], dtype=np.float64)
                A /= np.linalg.norm(A, axis=1, keepdims=True)
                B /= np.linalg.norm(B, axis=1, keepdims=True)
                cos = A @ B.T
                ii, jj = np.nonzero(cos >= threshold)
                ia, ib = ids_a[ii], ids_b[jj]
                keep = ia != ib
                ia, ib, cv = ia[keep], ib[keep], cos[ii, jj][keep]
                lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
                if same.item() if hasattr(same, "item") else same:
                    # same block: the matrix contains each pair twice
                    keep2 = ia < ib
                    lo, hi, cv = lo[keep2], hi[keep2], cv[keep2]
                out_a.append(lo)
                out_b.append(hi)
                out_c.append(cv)
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "cos_sim": np.round(np.concatenate(out_c), 3),
                    }
                )

    return grid.mapInPandas(compute, "id_a bigint, id_b bigint, cos_sim double")


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build a deterministic IVF (inverted-file) index: (centroids, cells).

    Coarse quantizer = n_centroids seed vectors chosen by a content-free
    deterministic order (xxhash64 of the id), refined by ONE Lloyd
    iteration whose per-cell means sum members in sorted-id order inside
    `applyInPandas` — bit-stable across partitionings and retries.

    Returns (centroids: list[(cell_id, np.ndarray)] driver-side — the
    quantizer is tiny by construction — and cells: DataFrame[id, vec,
    cell] with every corpus vector assigned to its nearest centroid).
    At 100 TB the corpus never leaves the cluster: assignment is one
    mapInPandas pass against the broadcast quantizer, and each query
    probes only n_probe cells (the classic IVF trade of recall for a
    1/n_centroids scan fraction).
    """
    import pandas as pd

    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<float>").alias("vec")
    )
    seeds = [
        np.asarray(r["vec"], dtype=np.float64)
        for r in c.orderBy(F.xxhash64(F.col("id")), "id").limit(n_centroids).collect()
    ]

    def normalize(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    cmat = normalize(np.stack(seeds))

    def assign_df(df, cmat):
        cm = cmat

        def op(batches):
            import numpy as _np
            import pandas as _pd

            for pdf in batches:
                A = normalize(_np.stack([_np.asarray(v, dtype=_np.float64) for v in pdf["vec"]]))
                cell = (A @ cm.T).argmax(axis=1)
                yield _pd.DataFrame(
                    {"id": pdf["id"], "vec": pdf["vec"], "cell": cell.astype("int32")}
                )

        return df.mapInPandas(op, schema="id long, vec array<float>, cell int")

    assigned = assign_df(c, cmat)

    # one Lloyd iteration: deterministic per-cell mean (members summed in
    # sorted-id order), then re-assign
    def cell_mean(key, pdf):
        import numpy as _np
        import pandas as _pd

        pdf = pdf.sort_values("id")
        m = _np.stack([_np.asarray(v, dtype=_np.float64) for v in pdf["vec"]]).mean(axis=0)
        return _pd.DataFrame({"cell": [key[0]], "centroid": [m.tolist()]})

    means = {
        r["cell"]: np.asarray(r["centroid"], dtype=np.float64)
        for r in assigned.groupBy("cell")
        .applyInPandas(cell_mean, "cell int, centroid array<double>")
        .collect()
    }
    cmat2 = normalize(
        np.stack([means.get(i, cmat[i]) for i in range(n_centroids)])
    )
    cells = assign_df(c, cmat2)
    centroids = [(i, cmat2[i]) for i in range(n_centroids)]
    return centroids, cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF probing (the second scale path
    next to the LSH buckets): each query scores only the vectors in its
    n_probe nearest cells — a fraction n_probe/n_centroids of the corpus.
    Deterministic ties: (sim desc, neighbor_id)."""
    centroids, cells = ivf_index(corpus, n_centroids, id_col, vec_col)
    cmat = np.stack([m for _, m in centroids])

    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).collect()
    probe_rows = []
    for r in q_rows:
        v = np.asarray(r["qv"], dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        for cell in np.argsort(-(cmat @ v))[:n_probe]:
            probe_rows.append((r["query_id"], r["qv"], int(cell)))
    import pandas as pd

    spark = corpus.sparkSession
    probes = spark.createDataFrame(
        pd.DataFrame(probe_rows, columns=["query_id", "qv", "cell"])
    )

    scored = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .withColumn("cv", F.col("vec").cast("array<double>"))
        .withColumn("sim", _cosine("qv", "cv"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "rk")
    )
