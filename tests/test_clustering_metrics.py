"""Numpy oracles for the A11 clustering metrics.

The registered queries are oracle-checked vs DuckDB (test_operators);
this file independently recomputes every metric in pure numpy — same
integer quantization — and asserts EXACT equality, both on the seed
assignment and on MLlib k-means output (which has no SQL oracle; the
metrics make it checkable, VERDICT r1 item 3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from citation_graph_spark import operators
from citation_graph_spark.operators.clustering import (
    calinski_harabasz,
    davies_bouldin,
    quantized_vectors,
    seed_assign,
    silhouette,
)

SF_DIR = "/root/testdata/sf0.001"

operators.load_all()


@pytest.fixture(scope="module")
def emb():
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    x = np.stack(pdf["embedding"].to_numpy())
    qv = np.floor(x.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    return pdf["vec_id"].to_numpy(), pdf["label"].to_numpy(), qv


def np_seed_assign(vec_ids, labels, qv):
    k = sorted(set(labels))
    cents = {
        c: np.floor(qv[labels == c].mean(axis=0) + 0.5).astype(np.int64) for c in k
    }
    d2 = np.stack([((qv - cents[c]) ** 2).sum(axis=1) for c in k], axis=1)
    return np.array(k)[np.argmin(d2, axis=1)]  # argmin takes first on ties


def np_metrics(vec_ids, qv, assign):
    ks = sorted(set(assign))
    out = {}
    n = len(qv)
    acent = {
        c: np.floor(qv[assign == c].mean(axis=0) + 0.5).astype(np.int64) for c in ks
    }
    nk = {c: int((assign == c).sum()) for c in ks}
    wk = {c: int(((qv[assign == c] - acent[c]) ** 2).sum()) for c in ks}
    gq = np.floor(qv.mean(axis=0) + 0.5).astype(np.int64)
    bk = {c: nk[c] * int(((acent[c] - gq) ** 2).sum()) for c in ks}
    W, B, kk = sum(wk.values()), sum(bk.values()), len(ks)
    out["ch"] = (n, kk, W, B, int(np.floor((B * (n - kk)) / (W * (kk - 1)) * 1000 + 0.5)))
    s = {c: np.sqrt(wk[c] / nk[c]) for c in ks}
    db = {}
    for ci in ks:
        rmax = max(
            (s[ci] + s[cj]) / np.sqrt(int(((acent[ci] - acent[cj]) ** 2).sum()))
            for cj in ks
            if cj != ci
        )
        db[ci] = (
            nk[ci],
            int(np.floor(s[ci] * 1e6 + 0.5)),
            int(np.floor(rmax * 1e6 + 0.5)),
        )
    out["db"] = db
    sv = {c: qv[assign == c].sum(axis=0) for c in ks}
    qc = {c: int((qv[assign == c].astype(object) ** 2).sum()) for c in ks}
    sil_micro = np.zeros(n, dtype=np.int64)
    for i in range(n):
        nsq = int((qv[i] ** 2).sum())
        own = assign[i]
        if nk[own] > 1:
            m = {}
            for c in ks:
                ssq = nk[c] * nsq - 2 * int(qv[i] @ sv[c]) + qc[c]
                m[c] = ssq / (nk[c] - 1 if c == own else nk[c])
            a = m[own]
            b = min(v for c, v in m.items() if c != own)
            sil_micro[i] = int(np.floor((b - a) / max(a, b) * 1e6 + 0.5))
    sil = {
        c: (
            nk[c],
            int(np.floor(sil_micro[assign == c].sum() / nk[c] + 0.5)),
        )
        for c in ks
    }
    out["sil"] = sil
    return out


def _spark_assign_rows(spark, name):
    rows = operators.QUERIES[name](spark, SF_DIR).collect()
    return {r["vec_id"]: r["cluster"] for r in rows}


def _check_all(spark, q, assign_df, vec_ids, qv, np_assign):
    want = np_metrics(vec_ids, qv, np_assign)
    ch = calinski_harabasz(q, assign_df).collect()[0]
    assert (
        ch["n_vectors"], ch["k"], ch["within_ssq"], ch["between_ssq"], ch["ch_milli"]
    ) == want["ch"]
    db = {
        r["cluster"]: (r["n_vectors"], r["scatter_micro"], r["r_max_micro"])
        for r in davies_bouldin(q, assign_df).collect()
    }
    assert db == want["db"]
    sil = {
        r["cluster"]: (r["n_vectors"], r["mean_silhouette_micro"])
        for r in silhouette(q, assign_df).collect()
    }
    assert sil == want["sil"]


def test_seed_assignment_matches_numpy(spark, emb):
    vec_ids, labels, qv = emb
    got = _spark_assign_rows(spark, "cluster_assign_seed")
    want = dict(zip(vec_ids, np_seed_assign(vec_ids, labels, qv)))
    assert got == want


def test_metrics_on_seed_assignment(spark, emb):
    vec_ids, labels, qv = emb
    q = quantized_vectors(spark, SF_DIR)
    _check_all(
        spark, q, seed_assign(q), vec_ids, qv, np_seed_assign(vec_ids, labels, qv)
    )


def test_kmeans_model_selection_sweep(spark):
    rows = operators.QUERIES["kmeans_model_selection"](spark, SF_DIR).collect()
    ks = [r["k"] for r in rows]
    assert ks == [4, 6, 8, 10, 12]
    assert all(r["ch_milli"] > 0 for r in rows)
    best = [r for r in rows if r["is_best"]]
    assert len(best) == 1
    assert best[0]["ch_milli"] == max(r["ch_milli"] for r in rows)


def test_metrics_on_kmeans_assignment(spark, emb):
    """MLlib k-means output scored by the same distributed metrics and
    verified against numpy on the SAME assignment — the clustering run
    is now checkable even though k-means itself has no SQL oracle."""
    import pyspark.sql.functions as F

    vec_ids, labels, qv = emb
    kdf = operators.QUERIES["embedding_kmeans"](spark, SF_DIR)
    assign_df = kdf.select("vec_id", F.col("cluster"))
    got = {r["vec_id"]: r["cluster"] for r in assign_df.collect()}
    np_assign = np.array([got[v] for v in vec_ids])
    q = quantized_vectors(spark, SF_DIR)
    _check_all(spark, q, assign_df, vec_ids, qv, np_assign)


def test_pareto_front_logic():
    from citation_graph_spark.operators.clustering import _pareto_front

    # b dominated by a on all three; c trades off → front = {a, c}
    a, b, c = (4, 100, 50, 900), (6, 90, 60, 800), (8, 120, 70, 850)
    assert _pareto_front([a, b, c]) == {4, 8}
    # identical points dominate nothing (no strict improvement) → both stay
    assert _pareto_front([(4, 1, 1, 1), (6, 1, 1, 1)]) == {4, 6}
    # a single point is always the front
    assert _pareto_front([a]) == {4}


def test_kmeans_pareto_front_query(spark):
    from citation_graph_spark.operators.clustering import _pareto_front

    rows = operators.QUERIES["kmeans_pareto_front"](spark, SF_DIR).collect()
    ks = [r["k"] for r in rows]
    assert ks == [4, 6, 8, 10, 12]
    # replaying the front logic on the returned scalars must reproduce
    # the on_front flags exactly (the query is deterministic end-to-end)
    scal = [(r["k"], r["sil_micro"], r["db_micro"], r["ch_milli"]) for r in rows]
    want = _pareto_front(scal)
    assert {r["k"] for r in rows if r["on_front"]} == want
    assert len(want) >= 1
    # no on-front point may be dominated by any other point
    for r in rows:
        if not r["on_front"]:
            assert any(
                o["sil_micro"] >= r["sil_micro"]
                and o["db_micro"] <= r["db_micro"]
                and o["ch_milli"] >= r["ch_milli"]
                and (
                    o["sil_micro"] > r["sil_micro"]
                    or o["db_micro"] < r["db_micro"]
                    or o["ch_milli"] > r["ch_milli"]
                )
                for o in rows
            ), f"k={r['k']} off-front but undominated"
