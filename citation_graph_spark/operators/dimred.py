"""Dimension-reduction serving (reference parity: per-article pca/tsne/
umap coordinates, reference schemas.py:137-139 + run_umap.py:27-37 —
the engine materializes the PCA pair natively; UMAP/t-SNE stay out of
scope per SURVEY §7.3).

Spark-first shape: the only non-distributed object is the d×d second-
moment matrix — a classic two-level aggregation output (d=64 → 4096
cells), collected to the driver for a numpy eigh exactly the way
k-means collects k centroids. Everything row-scale (the n×d explode,
the projections) stays distributed.

Determinism: moments are EXACT bigint sums of milli-quantized vectors
(identical on any engine / partitioning); eigh runs on those exact
integers, eigenvector sign is fixed by convention (largest-|loading|
coordinate positive, index tie-break); eigenvectors are re-quantized
to 1e-6 ints so every projection is again an exact integer dot —
tests/test_dimred.py reproduces the whole pipeline in numpy and
asserts EXACT equality.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.operators.clustering import quantized_vectors


def _pca_eigvecs(moments: np.ndarray, sums: np.ndarray, n: int) -> np.ndarray:
    """Top-2 eigenvectors (rows) of the covariance implied by exact
    integer moments; deterministic sign convention."""
    mu = sums / n
    cov = moments / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)  # ascending
    top = v[:, np.argsort(-w)[:2]].T
    for i in range(2):
        j = int(np.argmax(np.abs(top[i])))  # first index on exact ties
        if top[i, j] < 0:
            top[i] = -top[i]
    return top


@register("pca_xy")  # rows-only: eigendecomposition has no SQL oracle;
# exactness is covered by the numpy pipeline-replay in tests/test_dimred.py
def pca_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, x_milli, y_milli) — every embedding projected onto the
    top-2 principal components. The distributed part is two plans:
    (1) exact integer moment aggregation (posexplode self-join on
    vec_id → groupBy (i, j) sum), (2) broadcast-join projection; the
    d×d eigh in between is driver-side by design (output of a full
    reduce, size d², independent of n)."""
    q = quantized_vectors(spark, sf_dir).select("vec_id", "qv")
    vex = q.select("vec_id", F.posexplode("qv").alias("pos", "v")).persist()

    # outer products via chained posexplode — a narrow pipeline straight
    # into map-side partial aggregation; the only shuffle is d² rows per
    # task (never the n·d² intermediate)
    mom_rows = (
        q.select("qv", F.posexplode("qv").alias("i", "vi"))
        .select("i", "vi", F.posexplode("qv").alias("j", "vj"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("vi") * F.col("vj")).alias("m"))
        .collect()
    )
    sum_rows = vex.groupBy("pos").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()

    d = max(r["pos"] for r in sum_rows) + 1
    n = sum_rows[0]["c"]
    moments = np.zeros((d, d), dtype=np.float64)
    for r in mom_rows:
        moments[r["i"], r["j"]] = r["m"]
    sums = np.zeros(d, dtype=np.float64)
    for r in sum_rows:
        sums[r["pos"]] = r["s"]

    top = _pca_eigvecs(moments, sums, n)
    eq = np.floor(top * 1_000_000 + 0.5).astype(np.int64)  # 1e-6 grid
    mq = np.floor(sums / n + 0.5).astype(np.int64)  # milli grid center

    proj = spark.createDataFrame(
        [(int(p), int(mq[p]), int(eq[0, p]), int(eq[1, p])) for p in range(d)],
        "pos int, mq long, e1 long, e2 long",
    )
    dots = (
        vex.join(F.broadcast(proj), "pos")
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("v") - F.col("mq")) * F.col("e1")).alias("d1"),
            F.sum((F.col("v") - F.col("mq")) * F.col("e2")).alias("d2"),
        )
    )
    # qv is milli (1e-3), eq is 1e-6 → dot is 1e-9 of original units;
    # x_milli = round(x * 1000) = floor(dot / 1e6 + 0.5)
    out = dots.select(
        "vec_id",
        F.floor(F.col("d1") / 1_000_000 + F.lit(0.5)).cast("long").alias("x_milli"),
        F.floor(F.col("d2") / 1_000_000 + F.lit(0.5)).cast("long").alias("y_milli"),
    ).localCheckpoint(eager=True)  # materialize while vex is cached,
    vex.unpersist()  # then release the pinned explode
    return out
