"""Numpy pipeline-replay oracle for pca_xy (no SQL oracle exists for an
eigendecomposition; this is the exactness check the gate's rows-only
row points at)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from citation_graph_spark import operators
from citation_graph_spark.operators.dimred import _pca_eigvecs

SF_DIR = "/root/testdata/sf0.001"

operators.load_all()


def test_pca_xy_matches_numpy_exactly(spark):
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    x = np.stack(pdf["embedding"].to_numpy())
    qv = np.floor(x.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    n, d = qv.shape

    moments = (qv.T @ qv).astype(np.float64)  # exact: |m| << 2^53
    sums = qv.sum(axis=0).astype(np.float64)
    top = _pca_eigvecs(moments, sums, n)
    eq = np.floor(top * 1_000_000 + 0.5).astype(np.int64)
    mq = np.floor(sums / n + 0.5).astype(np.int64)
    dots = (qv - mq) @ eq.T  # exact integer
    want = {
        int(v): (
            int(np.floor(dots[i, 0] / 1_000_000 + 0.5)),
            int(np.floor(dots[i, 1] / 1_000_000 + 0.5)),
        )
        for i, v in enumerate(pdf["vec_id"])
    }

    got = {
        r["vec_id"]: (r["x_milli"], r["y_milli"])
        for r in operators.QUERIES["pca_xy"](spark, SF_DIR).collect()
    }
    assert got == want

    # the projection must actually spread the data (catches a degenerate
    # all-zero eigenvector or sign bug silently zeroing a column)
    xs = np.array([v[0] for v in want.values()])
    assert xs.std() > 0


def test_tsne_xy_matches_full_pipeline_replay(spark):
    """Full replay from the parquet file: md5-rank landmark selection,
    driver t-SNE fit, int64 kNN-landmark interpolation — exact match
    (sf0.01: 500 rows, so 256 landmarks AND 244 interpolated rows both
    exercise their paths).

    Exactness contract is SAME-ENVIRONMENT only: the landmark fit rests
    on np.linalg.eigh + 300 float64 gradient steps, whose last bits can
    differ across numpy/BLAS builds. Engine and replay share one
    process here, so equality is exact; on a different BLAS both sides
    move together (the fit is driver-side, broadcast once), so the
    engine stays self-consistent — only this cross-process pin would
    need a tolerance."""
    import hashlib

    from citation_graph_spark.operators.dimred import (
        _TSNE_M,
        _interp_landmarks,
        _tsne_fit,
    )

    sf = "/root/testdata/sf0.01"
    pdf = pd.read_parquet(f"{sf}/embeddings.parquet")
    x = np.stack(pdf["embedding"].to_numpy())
    qv = np.floor(x.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    vids = pdf["vec_id"].to_numpy().astype(np.int64)

    order = sorted(
        range(len(vids)),
        key=lambda i: (hashlib.md5(str(vids[i]).encode()).hexdigest(), vids[i]),
    )[:_TSNE_M]
    lm_ids = vids[order]
    lm_mat = qv[order]
    yq = np.floor(_tsne_fit(lm_mat) * 1000 + 0.5).astype(np.int64)

    out = _interp_landmarks(qv, lm_mat, yq)
    pos = {int(v): i for i, v in enumerate(lm_ids)}
    for r in range(len(vids)):
        j = pos.get(int(vids[r]))
        if j is not None:
            out[r] = yq[j]
    want = {int(vids[r]): (int(out[r, 0]), int(out[r, 1])) for r in range(len(vids))}

    got = {
        r["vec_id"]: (r["x_milli"], r["y_milli"])
        for r in operators.QUERIES["tsne_xy"](spark, sf).collect()
    }
    assert got == want
    assert len(got) == len(vids)


def test_tsne_fit_separates_clusters_and_is_deterministic():
    """Quality invariant on the fit itself: well-separated Gaussian
    blobs must come out far tighter within than across clusters in the
    t-SNE plane. (The testdata embeddings' label clusters are nearly
    unseparated in raw space — intra 1.408 vs inter 1.412 mean distance
    — so they cannot anchor this check; synthetic blobs can.)"""
    from citation_graph_spark.operators.dimred import _tsne_fit

    rng = np.random.RandomState(0)
    centers = rng.randn(3, 16) * 8.0
    labels = np.repeat(np.arange(3), 60)
    x = centers[labels] + rng.randn(180, 16)
    qv = np.floor(x * 1000 + 0.5).astype(np.int64)

    y = _tsne_fit(qv)
    d = np.sqrt(((y[:, None, :] - y[None, :, :]) ** 2).sum(-1))
    same = labels[:, None] == labels[None, :]
    np.fill_diagonal(same, False)
    intra = d[same].mean()
    inter = d[~same & ~np.eye(len(y), dtype=bool)].mean()
    assert intra * 3 < inter  # clearly separated, not marginally

    # and the fit is deterministic run-to-run
    assert np.array_equal(y, _tsne_fit(qv))


def test_interp_landmarks_unbounded_m_and_rank_tiebreak():
    """r4: the kNN tie-break is a stable argsort on exact int64
    distances (column order = md5 rank), so m is no longer capped at
    1024. Property-check at m=2048 against an explicit per-row oracle
    that sorts (d2, rank) pairs."""
    from citation_graph_spark.operators.dimred import _TSNE_K, _interp_landmarks

    rng = np.random.RandomState(7)
    m, d, b = 2048, 16, 64
    lq = rng.randint(-50, 50, size=(m, d)).astype(np.int64)  # dense grid
    lq[100] = lq[200]  # force exact distance ties at distinct ranks
    lq[5] = lq[1500]
    yq = rng.randint(-5000, 5000, size=(m, 2)).astype(np.int64)
    xq = rng.randint(-50, 50, size=(b, d)).astype(np.int64)
    xq[0] = lq[100]  # query exactly on the tied pair

    got = _interp_landmarks(xq, lq, yq)

    for r in range(b):
        d2 = ((lq - xq[r]) ** 2).sum(axis=1)
        order = sorted(range(m), key=lambda j: (int(d2[j]), j))[:_TSNE_K]
        w = 1.0 / (1.0 + d2[order].astype(np.float64) / 1e6)
        y = (w[:, None] * (yq[order].astype(np.float64) / 1000.0)).sum(
            axis=0
        ) / w.sum()
        want = np.floor(y * 1000 + 0.5).astype(np.int64)
        assert np.array_equal(got[r], want), r

    # deterministic run-to-run
    assert np.array_equal(got, _interp_landmarks(xq, lq, yq))


def test_tsne_coords_empty_input_returns_empty(spark):
    from citation_graph_spark.operators.dimred import tsne_coords

    q = spark.createDataFrame([], "vec_id long, qv array<bigint>")
    out = tsne_coords(q)
    assert out.count() == 0
    assert out.columns == ["vec_id", "x_milli", "y_milli"]


def test_umap_xy_matches_full_pipeline_replay(spark):
    """Full replay from the parquet file: md5-rank landmark selection,
    driver UMAP fit, int64 kNN-landmark interpolation — exact match
    (same same-environment BLAS contract as the t-SNE pin above)."""
    import hashlib

    from citation_graph_spark.operators.dimred import (
        _TSNE_M,
        _interp_landmarks,
        _umap_fit,
    )

    sf = "/root/testdata/sf0.01"
    pdf = pd.read_parquet(f"{sf}/embeddings.parquet")
    x = np.stack(pdf["embedding"].to_numpy())
    qv = np.floor(x.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    vids = pdf["vec_id"].to_numpy().astype(np.int64)

    order = sorted(
        range(len(vids)),
        key=lambda i: (hashlib.md5(str(vids[i]).encode()).hexdigest(), vids[i]),
    )[:_TSNE_M]
    lm_ids = vids[order]
    lm_mat = qv[order]
    yq = np.floor(_umap_fit(lm_mat) * 1000 + 0.5).astype(np.int64)

    out = _interp_landmarks(qv, lm_mat, yq)
    pos = {int(v): i for i, v in enumerate(lm_ids)}
    for r in range(len(vids)):
        j = pos.get(int(vids[r]))
        if j is not None:
            out[r] = yq[j]
    want = {int(vids[r]): (int(out[r, 0]), int(out[r, 1])) for r in range(len(vids))}

    got = {
        r["vec_id"]: (r["x_milli"], r["y_milli"])
        for r in operators.QUERIES["umap_xy"](spark, sf).collect()
    }
    assert got == want
    assert len(got) == len(vids)


def test_umap_fit_separates_clusters_and_is_deterministic():
    """Same blob invariant as the t-SNE fit: well-separated Gaussian
    blobs must come out far tighter within than across clusters in the
    UMAP plane, and the fit must be bit-identical run-to-run."""
    from citation_graph_spark.operators.dimred import _umap_fit

    rng = np.random.RandomState(0)
    centers = rng.randn(3, 16) * 8.0
    labels = np.repeat(np.arange(3), 60)
    x = centers[labels] + rng.randn(180, 16)
    qv = np.floor(x * 1000 + 0.5).astype(np.int64)

    y = _umap_fit(qv)
    d = np.sqrt(((y[:, None, :] - y[None, :, :]) ** 2).sum(-1))
    same = labels[:, None] == labels[None, :]
    np.fill_diagonal(same, False)
    intra = d[same].mean()
    inter = d[~same & ~np.eye(len(y), dtype=bool)].mean()
    assert intra * 3 < inter

    assert np.array_equal(y, _umap_fit(qv))


def test_umap_graph_fuzzy_set_invariants():
    """Output invariants of the fuzzy simplicial set (UMAP §3.1):
    symmetric, weights in [0, 1], every row supports at least its k
    nearest neighbors, and each point's nearest neighbor carries weight
    exactly 1 (gap = d − rho = 0 at the NN ⇒ exp(0) = 1, preserved by
    the t-conorm a + aT − a·aT since 1 + x − x = 1)."""
    from citation_graph_spark.operators.dimred import _UMAP_K, _umap_graph

    rng = np.random.RandomState(3)
    qv = rng.randint(-4000, 4000, size=(120, 24)).astype(np.int64)
    m = qv.shape[0]
    k = min(_UMAP_K, m - 1)
    w = _umap_graph(qv)
    assert np.allclose(w, w.T)
    assert w.min() >= 0.0 and w.max() <= 1.0 + 1e-12
    assert np.all((w > 0).sum(axis=1) >= k)
    ls = (qv * qv).sum(axis=1)
    d2 = ls[:, None] + ls[None, :] - 2 * (qv @ qv.T)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    nn = np.argmin(d2, axis=1)
    assert np.allclose(w[np.arange(m), nn], 1.0)
