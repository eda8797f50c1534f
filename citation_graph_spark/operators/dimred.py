"""Dimension-reduction serving (reference parity: per-article pca/tsne/
umap coordinates, reference schemas.py:137-139 + run_umap.py:27-37 —
the engine materializes the PCA pair natively and serves t-SNE
coordinates via a landmark fit + distributed interpolation; UMAP stays
out of scope per SURVEY §7.3 / COVERAGE.md).

Spark-first shape: the only non-distributed object is the d×d second-
moment matrix — a per-partition numpy Gram (mapInPandas over Arrow
batches) reduced by one tiny groupBy-sum, collected to the driver for
a numpy eigh exactly the way k-means collects k centroids. Everything
row-scale (the scan, the zip_with/aggregate projections) stays
distributed and shuffle-free; nothing anywhere materializes more than
d² rows per partition, so the shape survives the reference's real
1536/3072-dim vectors (integrate_batch.py:128,154).

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


def _moment_partials(batches):
    """Arrow-batch Gram kernel: accumulate the exact int64 second-moment
    matrix AᵀA, the column sums Σv, and the row count across every batch
    of the partition, then emit ONE compact partial — the upper triangle
    of the (symmetric) Gram (d(d+1)/2 rows), d sum rows (j = -1), and a
    count row (i = j = -1). Integer addition is order-independent, so
    the final groupBy-sum is bit-identical under any partitioning.

    This replaces the r3 chained-posexplode shape (n·d² generated rows —
    fine at the d=64 fixture, infeasible at the reference's 1536/3072-dim
    vectors, integrate_batch.py:128,154): per-partition work is a numpy
    int64 matmul over the Arrow batch, and nothing leaving the partition
    grows with n."""
    import pandas as pd

    g = None
    s = None
    c = 0
    for pdf in batches:
        if len(pdf) == 0:
            continue
        x = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
        if g is None:
            d = x.shape[1]
            g = np.zeros((d, d), dtype=np.int64)
            s = np.zeros(d, dtype=np.int64)
        g += x.T @ x  # exact: milli ints, |cell| << 2^63 at any real n
        s += x.sum(axis=0)
        c += x.shape[0]
    if g is None:
        return
    d = g.shape[0]
    iu, ju = np.triu_indices(d)
    yield pd.DataFrame(
        {
            "i": np.concatenate([iu, np.arange(d), [-1]]).astype(np.int32),
            "j": np.concatenate([ju, np.full(d, -1), [-1]]).astype(np.int32),
            "m": np.concatenate([g[iu, ju], s, [c]]).astype(np.int64),
        }
    )


@register("pca_xy")  # rows-only: eigendecomposition has no SQL oracle;
# exactness is covered by the numpy pipeline-replay in tests/test_dimred.py
def pca_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, x_milli, y_milli) — every embedding projected onto the
    top-2 principal components. The distributed part is two plans:
    (1) exact integer moment aggregation — a per-partition numpy Gram in
    mapInPandas emitting d(d+1)/2 + d + 1 partial rows per partition,
    then one tiny groupBy-sum; (2) the projection itself, a pure column
    expression (zip_with/aggregate dot with the eigenvectors as array
    literals — the centering term folds into a scalar: Σ(v−μ)·e =
    Σv·e − Σμ·e), zero shuffles. The d×d eigh in between is driver-side
    by design (output of a full reduce, size d², independent of n)."""
    q = quantized_vectors(spark, sf_dir).select("vec_id", "qv")

    mom_rows = (
        q.select("qv")
        .mapInPandas(_moment_partials, "i int, j int, m long")
        .groupBy("i", "j")
        .agg(F.sum("m").alias("m"))
        .collect()
    )
    if not mom_rows:  # empty input: empty result, same schema
        return spark.createDataFrame([], "vec_id long, x_milli long, y_milli long")

    d = max(r["i"] for r in mom_rows) + 1
    n = 0
    moments = np.zeros((d, d), dtype=np.float64)
    sums = np.zeros(d, dtype=np.float64)
    for r in mom_rows:
        if r["i"] == -1:
            n = r["m"]
        elif r["j"] == -1:
            sums[r["i"]] = r["m"]
        else:
            moments[r["i"], r["j"]] = r["m"]
            moments[r["j"], r["i"]] = r["m"]  # mirror the upper triangle

    top = _pca_eigvecs(moments, sums, n)
    eq = np.floor(top * 1_000_000 + 0.5).astype(np.int64)  # 1e-6 grid
    mq = np.floor(sums / n + 0.5).astype(np.int64)  # milli grid center

    # Σ_p (v_p − mq_p)·e_p  ==  Σ_p v_p·e_p − C  with C = Σ_p mq_p·e_p —
    # same exact integers as the r3 join shape, but the mean-centering is
    # a scalar literal and the dot is a JVM-side higher-order function:
    # no explode, no join, no shuffle.
    c1 = int((mq * eq[0]).sum())
    c2 = int((mq * eq[1]).sum())
    e1 = F.array(*[F.lit(int(v)) for v in eq[0]])
    e2 = F.array(*[F.lit(int(v)) for v in eq[1]])
    zero = F.lit(0).cast("long")

    def dot(evec, cshift):
        acc = F.aggregate(
            F.zip_with(F.col("qv"), evec, lambda v, e: v * e),
            zero,
            lambda a, x: a + x,
        ) - F.lit(cshift)
        # qv is milli (1e-3), eq is 1e-6 → dot is 1e-9 of original units;
        # x_milli = round(x * 1000) = floor(dot / 1e6 + 0.5)
        return F.floor(acc / 1_000_000 + F.lit(0.5)).cast("long")

    return q.select(
        "vec_id", dot(e1, c1).alias("x_milli"), dot(e2, c2).alias("y_milli")
    )


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

_TSNE_M = 256  # landmarks (driver fit is O(m²·iters); raise freely —
# the kNN tie-break is a stable argsort, no encoding bound on m)
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
    exact int64; ties break by landmark rank — the column order IS the
    md5 rank, so a stable argsort breaks ties by rank with no bound on
    m (r3 packed rank into the key's low 10 bits, capping m at 1024).
    Pure function — the Arrow batch kernel and the pytest replay call
    the same code."""
    m = lq.shape[0]
    k = min(k, m)
    xs = (xq * xq).sum(axis=1)
    ls = (lq * lq).sum(axis=1)
    d2 = xs[:, None] + ls[None, :] - 2 * (xq @ lq.T)  # exact int64
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
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


def _landmark_coords(q: DataFrame, fit) -> DataFrame:
    """(vec_id, qv) → (vec_id, x_milli, y_milli) — shared landmark
    serving shape for the 2-D embedding family (t-SNE, UMAP): ``fit``
    maps the m×d milli landmark matrix to m×2 float coords on the
    driver (O(m²·iters), independent of n); every other row is
    interpolated from its K nearest landmarks in one zero-shuffle
    mapInPandas pass over a broadcast m×(d+2) int matrix."""
    import pandas as pd

    spark = q.sparkSession
    lm_ids, lm_mat = _tsne_landmarks(q)
    if lm_ids.size == 0:  # empty input: empty result, same schema
        return spark.createDataFrame([], "vec_id long, x_milli long, y_milli long")
    yq = np.floor(fit(lm_mat) * 1000 + 0.5).astype(np.int64)

    b = spark.sparkContext.broadcast((lm_ids, lm_mat, yq))

    def part(batches):
        ids_, lq_, yq_ = b.value
        pos = {int(v): i for i, v in enumerate(ids_)}
        for pdf in batches:
            if len(pdf) == 0:  # upstream filters can hand us empty
                continue  # Arrow batches; np.stack([]) would raise
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


def tsne_coords(q: DataFrame) -> DataFrame:
    """Landmark t-SNE serving: exact t-SNE fit on m deterministic
    landmarks, zero-shuffle interpolation for everyone else."""
    return _landmark_coords(q, _tsne_fit)


@register("tsne_xy")  # rows-only: iterative KL-gradient fit has no SQL
# oracle; exactness is the full-pipeline replay in tests/test_dimred.py
def tsne_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark t-SNE coordinates for the embeddings table."""
    return tsne_coords(quantized_vectors(spark, sf_dir).select("vec_id", "qv"))


# ---------------------------------------------------------------------------
# UMAP coordinate serving (reference run_umap.py:27-37, the third of the
# ExtendedArticle coordinate fields, schemas.py:137-139). umap-learn's
# layout phase is stochastic-gradient with negative sampling and no seed
# discipline; the engine instead descends the SAME cross-entropy
# objective (McInnes, Healy & Melville 2018, eqn 12 — negative sampling
# is an estimator of exactly this gradient) in deterministic full batch:
#   1. the fuzzy simplicial set over the landmark kNN graph (rho = NN
#      distance, per-point sigma by binary search to hit log2(k) mass,
#      probabilistic t-conorm symmetrization a + aT - a∘aT);
#   2. spectral init (normalized-Laplacian eigenvectors, pca_xy's sign
#      convention);
#   3. full-batch gradient of the cross-entropy under the standard
#      low-dim curve 1/(1 + a·d^{2b}), per-pair displacement clipped to
#      ±4 and a linearly decaying step, exactly umap-learn's schedule —
#      minus the RNG.
# Same scale/distribution story as t-SNE above: the fit is O(m²·iters)
# on the driver, independent of n; serving is the shared zero-shuffle
# interpolation pass. Determinism: no RNG anywhere; exactness is the
# full-pipeline replay in tests/test_dimred.py (same same-environment
# BLAS contract as the t-SNE pin).
# ---------------------------------------------------------------------------

_UMAP_K = 15  # kNN-graph degree (umap-learn's n_neighbors default)
# curve constants for min_dist=0.1, spread=1.0 (umap-learn's published
# defaults for find_ab_params — fixed here so no scipy fit is needed)
_UMAP_A = 1.5769434603113077
_UMAP_B = 0.8950608779109733


def _umap_graph(lq: np.ndarray, k: int = _UMAP_K) -> np.ndarray:
    """Symmetric fuzzy-simplicial-set weights over the landmark kNN
    graph. Distances are exact int64 squared milli distances; kNN ties
    break by landmark rank (stable argsort on the int matrix)."""
    m = lq.shape[0]
    k = min(k, m - 1)
    if k <= 0:
        return np.zeros((m, m))
    ls = (lq * lq).sum(axis=1)
    d2 = ls[:, None] + ls[None, :] - 2 * (lq @ lq.T)  # exact int64
    dist = np.sqrt(np.maximum(d2, 0).astype(np.float64)) / 1000.0
    a = np.zeros((m, m))
    target = np.log2(k + 1)
    for i in range(m):
        order = np.argsort(d2[i], kind="stable")
        nbrs = order[order != i][:k]
        di = dist[i, nbrs]
        pos = di[di > 0]
        rho = float(pos.min()) if pos.size else 0.0
        gap = np.maximum(di - rho, 0.0)
        # binary search sigma so Σ exp(-gap/sigma) == log2(k+1)
        lo, hi, sigma = 0.0, np.inf, 1.0
        for _ in range(64):
            s = float(np.exp(-gap / sigma).sum())
            if abs(s - target) < 1e-5:
                break
            if s > target:
                hi = sigma
                sigma = (lo + hi) / 2.0
            else:
                lo = sigma
                sigma = sigma * 2.0 if hi == np.inf else (lo + hi) / 2.0
        sigma = max(sigma, 1e-12)
        a[i, nbrs] = np.exp(-gap / sigma)
    return a + a.T - a * a.T  # probabilistic t-conorm


def _umap_spectral_init(w: np.ndarray) -> np.ndarray:
    """Deterministic init: eigenvectors 2..3 of the symmetric
    normalized Laplacian (ascending eigh order), pca_xy sign
    convention, scaled to umap-learn's 10-unit init box."""
    deg = np.maximum(w.sum(axis=1), 1e-12)
    dinv = 1.0 / np.sqrt(deg)
    lap = np.eye(w.shape[0]) - dinv[:, None] * w * dinv[None, :]
    evals, evecs = np.linalg.eigh(lap)
    y = evecs[:, np.argsort(evals)[1:3]].copy()
    for i in range(y.shape[1]):
        j = int(np.argmax(np.abs(y[:, i])))
        if y[j, i] < 0:
            y[:, i] = -y[:, i]
    amax = np.abs(y).max()
    if amax > 0:
        y = y / amax * 10.0
    return y


_UMAP_NEG_RATE = 5  # umap-learn's negative_sample_rate default


def _umap_fit(lq: np.ndarray, k: int = _UMAP_K, iters: int = 400) -> np.ndarray:
    """Deterministic full-batch UMAP layout of the milli landmark
    matrix; returns m x 2 float coords. No RNG: the negative-sampling
    estimator is replaced by the (1-w)-weighted repulsive term of the
    same cross-entropy gradient, scaled by neg_rate·k/(m−1) — the
    expected fraction of pairs umap-learn's sampler actually repels per
    epoch (5 negatives per positive edge vs all m−1 in full batch), so
    the attraction/repulsion balance matches the reference algorithm
    rather than the unsampled objective, which over-inflates clusters."""
    m = lq.shape[0]
    if m <= 2:
        return np.zeros((m, 2))
    w = _umap_graph(lq, k)
    y = _umap_spectral_init(w)
    a, b = _UMAP_A, _UMAP_B
    rep_scale = min(1.0, _UMAP_NEG_RATE * min(k, m - 1) / (m - 1))
    for it in range(iters):
        alpha = 1.0 - it / iters
        diff = y[:, None, :] - y[None, :, :]
        d2 = (diff * diff).sum(axis=-1)
        d2s = np.maximum(d2, 1e-12)
        d2b = d2s**b
        att = -2.0 * a * b * d2s ** (b - 1.0) / (1.0 + a * d2b)
        rep = 2.0 * b / ((0.001 + d2s) * (1.0 + a * d2b))
        coef = w * att + rep_scale * (1.0 - w) * rep
        np.fill_diagonal(coef, 0.0)
        coef[d2 == 0.0] = 0.0  # coincident points: no direction
        disp = np.clip(coef[:, :, None] * diff, -4.0, 4.0).sum(axis=1)
        y = y + alpha * disp
        y = y - y.mean(axis=0)
    return y


def umap_coords(q: DataFrame) -> DataFrame:
    """Landmark UMAP serving: deterministic full-batch UMAP fit on m
    deterministic landmarks, zero-shuffle interpolation for everyone
    else (the shared `_landmark_coords` pass)."""
    return _landmark_coords(q, _umap_fit)


@register("umap_xy")  # rows-only: cross-entropy layout descent has no
# SQL oracle; exactness is the full-pipeline replay in tests/test_dimred.py
def umap_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark UMAP coordinates for the embeddings table."""
    return umap_coords(quantized_vectors(spark, sf_dir).select("vec_id", "qv"))
