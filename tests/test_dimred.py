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
