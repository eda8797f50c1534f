"""Dimension-reduction serving (reference parity: per-article pca/tsne/
umap coordinates, reference schemas.py:137-139 + run_umap.py:27-37 —
the engine materializes the PCA pair natively and serves t-SNE
coordinates via a landmark fit + distributed interpolation; UMAP stays
out of scope per SURVEY §7.3 / COVERAGE.md).

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


# ---------------------------------------------------------------------------
# t-SNE coordinate serving (reference run_umap.py:27-37 fits a driver-
# side manifold embedding over the full collected vector matrix;
# schemas.py:137-139 materializes per-article tsne coords).
#
# Scale shape — the piece that must NOT be a collect-everything port:
#   1. landmark sample: deterministic md5-rank top-m (TakeOrdered, no
#      full sort materialization) with m FIXED (256) regardless of n;
#   2. exact t-SNE (van der Maaten & Hinton 2008) fits the m landmarks
#      on the driver — O(m^2 * iters), independent of corpus size, the
#      same driver-budget rule as pca_xy's d x d eigh and k-means' k
#      centroids;
#   3. every other row gets coordinates from its K nearest landmarks
#      (inverse-distance-weighted average, the standard landmark /
#      out-of-sample extension) via mapInPandas over the scan — zero
#      shuffles, broadcast of an m x (d+2) int matrix, Arrow-batched
#      integer matmul. At 100 TB this is an embarrassingly parallel
#      map; nothing grows with n except the scan itself.
#
# Determinism: landmark selection is the engine-independent md5 device
# (operators/sampling.py); all distances are exact int64 arithmetic on
# milli-quantized vectors; nearest-landmark ties break by landmark
# rank; the driver fit is seedless (PCA init with the pca_xy sign
# convention, fixed iteration schedule). tests/test_dimred.py replays
# the full pipeline from the parquet file and asserts EXACT equality.
# ---------------------------------------------------------------------------

_TSNE_M = 256  # landmarks (must stay <= 1024: tie-break key packs rank)
_TSNE_K = 5  # nearest landmarks per out-of-sample point


def _tsne_cond_probs(d2: np.ndarray, perplexity: float) -> np.ndarray:
    """Row-stochastic P via per-row binary search on the Gaussian
    bandwidth to hit log(perplexity) entropy (standard exact t-SNE)."""
    m = d2.shape[0]
    p_out = np.zeros((m, m))
    log_u = np.log(perplexity)
    for i in range(m):
        idx = np.concatenate([np.arange(i), np.arange(i + 1, m)])
        di = d2[i, idx]
        beta, beta_lo, beta_hi = 1.0, -np.inf, np.inf
        pn = np.full(m - 1, 1.0 / max(m - 1, 1))
        for _ in range(50):
            p = np.exp(-di * beta)
            sump = p.sum()
            if sump <= 0.0:
                h = 0.0
            else:
                pn = p / sump
                h = np.log(sump) + beta * float(di @ p) / sump
            diff = h - log_u
            if abs(diff) < 1e-5:
                break
            if diff > 0:
                beta_lo = beta
                beta = beta * 2.0 if beta_hi == np.inf else (beta + beta_hi) / 2.0
            else:
                beta_hi = beta
                beta = beta / 2.0 if beta_lo == -np.inf else (beta + beta_lo) / 2.0
        p_out[i, idx] = pn
    return p_out


def _tsne_fit(
    lq: np.ndarray,
    perplexity: float = 30.0,
    iters: int = 300,
    exag: float = 12.0,
    exag_iters: int = 100,
    eta: float = 200.0,
) -> np.ndarray:
    """Exact t-SNE on the milli-quantized landmark matrix; returns
    m x 2 float coords. Deterministic: PCA init (pca_xy's sign
    convention), no RNG anywhere, fixed schedule (early exaggeration
    then momentum 0.8), gain adaptation per the original algorithm."""
    x = lq.astype(np.float64) / 1000.0
    m = x.shape[0]
    if m == 1:
        return np.zeros((1, 2))
    perplexity = max(2.0, min(perplexity, (m - 1) / 3.0))
    ss = (x * x).sum(axis=1)
    d2 = np.maximum(ss[:, None] + ss[None, :] - 2.0 * (x @ x.T), 0.0)
    p = _tsne_cond_probs(d2, perplexity)
    p = p + p.T
    p = np.maximum(p / p.sum(), 1e-12)

    xc = x - x.mean(axis=0)
    evals, evecs = np.linalg.eigh(xc.T @ xc)
    top = evecs[:, np.argsort(-evals)[:2]]
    for i in range(top.shape[1]):
        j = int(np.argmax(np.abs(top[:, i])))
        if top[j, i] < 0:
            top[:, i] = -top[:, i]
    y = xc @ top
    spread = y.std(axis=0).max()
    if spread > 0:
        y = y / spread * 1e-2

    dy = np.zeros_like(y)
    gains = np.ones_like(y)
    pe = p * exag
    for it in range(iters):
        if it == exag_iters:
            pe = p
        ssy = (y * y).sum(axis=1)
        num = 1.0 / (
            1.0 + np.maximum(ssy[:, None] + ssy[None, :] - 2.0 * (y @ y.T), 0.0)
        )
        np.fill_diagonal(num, 0.0)
        q = np.maximum(num / num.sum(), 1e-12)
        pqn = (pe - q) * num
        grad = 4.0 * ((np.diag(pqn.sum(axis=1)) - pqn) @ y)
        mom = 0.5 if it < exag_iters else 0.8
        gains = np.where(np.sign(grad) != np.sign(dy), gains + 0.2, gains * 0.8)
        gains = np.maximum(gains, 0.01)
        dy = mom * dy - eta * gains * grad
        y = y + dy
        y = y - y.mean(axis=0)
    return y


def _interp_landmarks(
    xq: np.ndarray, lq: np.ndarray, yq: np.ndarray, k: int = _TSNE_K
) -> np.ndarray:
    """Out-of-sample extension: each row of ``xq`` (b x d milli ints)
    gets the inverse-distance-weighted average of its k nearest
    landmarks' fitted coords (``yq``, m x 2 milli ints). Distances are
    exact int64; ties break by landmark rank (key = d2 * 1024 + rank,
    exact while m <= 1024). Pure function — the Arrow batch kernel and
    the pytest replay call the same code."""
    m = lq.shape[0]
    # rank is packed into the low bits of the sort key; m beyond that
    # would silently corrupt the distance ordering instead of tie-breaks
    assert m <= 1024, f"landmark count {m} exceeds the 1024 tie-break bound"
    k = min(k, m)
    xs = (xq * xq).sum(axis=1)
    ls = (lq * lq).sum(axis=1)
    d2 = xs[:, None] + ls[None, :] - 2 * (xq @ lq.T)  # exact int64
    key = d2 * np.int64(1024) + np.arange(m, dtype=np.int64)
    idx = np.argsort(key, axis=1)[:, :k]
    dsel = np.take_along_axis(d2, idx, axis=1).astype(np.float64) / 1e6
    w = 1.0 / (1.0 + dsel)
    ysel = yq[idx].astype(np.float64) / 1000.0
    y = (w[..., None] * ysel).sum(axis=1) / w.sum(axis=1)[:, None]
    return np.floor(y * 1000 + 0.5).astype(np.int64)


def _tsne_landmarks(q: DataFrame):
    """Deterministic landmark matrix: md5-rank top-m of the quantized
    vectors, returned as (ids, matrix) numpy arrays in md5 order."""
    import hashlib

    rows = (
        q.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(_TSNE_M)
        .select("vec_id", "qv")
        .collect()
    )
    # re-sort driver-side so landmark RANK (the tie-break) never depends
    # on the engine's sort, only on the md5 device itself
    rows.sort(
        key=lambda r: (hashlib.md5(str(r["vec_id"]).encode()).hexdigest(), r["vec_id"])
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["qv"] for r in rows], dtype=np.int64)
    return ids, mat


def tsne_coords(q: DataFrame) -> DataFrame:
    """(vec_id, qv) → (vec_id, x_milli, y_milli) — t-SNE plane for
    every quantized vector: exact t-SNE on m=256 deterministic
    landmarks (driver, O(m^2), independent of n), all other rows
    interpolated from their K=5 nearest landmarks in one zero-shuffle
    mapInPandas pass."""
    import pandas as pd

    spark = q.sparkSession
    lm_ids, lm_mat = _tsne_landmarks(q)
    if lm_ids.size == 0:  # empty input: empty result, same schema
        return spark.createDataFrame([], "vec_id long, x_milli long, y_milli long")
    yq = np.floor(_tsne_fit(lm_mat) * 1000 + 0.5).astype(np.int64)

    b = spark.sparkContext.broadcast((lm_ids, lm_mat, yq))

    def part(batches):
        ids_, lq_, yq_ = b.value
        pos = {int(v): i for i, v in enumerate(ids_)}
        for pdf in batches:
            xq = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            out = _interp_landmarks(xq, lq_, yq_)
            vids = pdf["vec_id"].to_numpy()
            for r in range(len(vids)):  # landmarks keep their exact fit
                j = pos.get(int(vids[r]))
                if j is not None:
                    out[r] = yq_[j]
            yield pd.DataFrame(
                {
                    "vec_id": vids.astype(np.int64),
                    "x_milli": out[:, 0],
                    "y_milli": out[:, 1],
                }
            )

    return q.mapInPandas(part, "vec_id long, x_milli long, y_milli long")


@register("tsne_xy")  # rows-only: iterative KL-gradient fit has no SQL
# oracle; exactness is the full-pipeline replay in tests/test_dimred.py
def tsne_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark t-SNE coordinates for the embeddings table."""
    return tsne_coords(quantized_vectors(spark, sf_dir).select("vec_id", "qv"))
