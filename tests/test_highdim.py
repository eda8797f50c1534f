"""High-dimension (d=512) coverage for the whole vector stack.

Every embedding operator is otherwise only exercised at the fixture's
d=64; the reference's real vectors are 1536/3072-dim (neo4j/loader.py:
50-74, integrate_batch.py:128,154). This module builds a deterministic
d=512 embeddings table shaped so the registered constants stay
meaningful (within-cluster dist² ≈ 0.64e6 milli² < ε² = 1.35e6 <
cross-cluster ≈ 7.2e6; planted near-duplicates at cosine ≈ 0.999) and
runs the oracle-backed vector queries through the SAME gate semantics
as the driver (citation_graph_spark.compare), plus the exact dimred
replays and an IVF-vs-exact recall check — surfacing any int64-dot
overflow, quantization cliff, or recall collapse at high dim before a
user does.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from citation_graph_spark import operators
from citation_graph_spark.compare import compare_results
from citation_graph_spark.tables import TABLE_NAMES

operators.load_all()

BASE_SF = "/root/testdata/sf0.001"
D = 512
N_CLUSTERS = 10
PER_CLUSTER = 28  # 280 base points
N_DUP = 20  # near-duplicate copies of the first 20 points

# the oracle-backed queries whose semantics live on the embeddings table
VECTOR_QUERIES = [
    "dedup_embedding_cosine",
    "dedup_embedding_ivf",
    "dbscan_embedding",
    "dbscan_embedding_ivf",
    "single_linkage_embedding",
    "single_linkage_embedding_ivf",
    "hdbscan_embedding",
    "hdbscan_embedding_ivf",
    "knn_cosine_topk",
    "ann_sign_lsh",
    "ann_ivf",
    "embedding_centroids",
    "cluster_assign_seed",
    "cluster_silhouette",
    "cluster_davies_bouldin",
    "cluster_calinski_harabasz",
]


def _highdim_embeddings() -> pd.DataFrame:
    """Deterministic d=512 corpus: 10 well-separated Gaussian blobs
    (centers σ=0.08/coord, noise σ=0.025/coord) + 20 near-duplicate
    copies (σ=0.002) of the first 20 points, same label as their
    original so IVF blocking can find them."""
    rng = np.random.RandomState(512)
    centers = rng.randn(N_CLUSTERS, D) * 0.08
    labels = np.repeat(np.arange(N_CLUSTERS), PER_CLUSTER)
    x = centers[labels] + rng.randn(len(labels), D) * 0.025
    dup = x[:N_DUP] + rng.randn(N_DUP, D) * 0.002
    x = np.vstack([x, dup]).astype(np.float32)
    labels = np.concatenate([labels, labels[:N_DUP]])
    return pd.DataFrame(
        {
            "vec_id": np.arange(len(x), dtype=np.int64),
            "embedding": list(x),
            "label": labels.astype(np.int32),
        }
    )


@pytest.fixture(scope="module")
def hd_dir(tmp_path_factory):
    """An sf-style directory: the d=512 embeddings plus symlinks to the
    sf0.001 copies of every other table (load_tables reads all ten)."""
    d = tmp_path_factory.mktemp("sf_hd512")
    pdf = _highdim_embeddings()
    arr = pa.array([np.asarray(v) for v in pdf["embedding"]], pa.list_(pa.float32()))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(pdf["vec_id"], pa.int64()),
                "embedding": arr,
                "label": pa.array(pdf["label"], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    for t in TABLE_NAMES:
        if t != "embeddings":
            os.symlink(f"{BASE_SF}/{t}.parquet", d / f"{t}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def hd_duck(hd_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{hd_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", VECTOR_QUERIES)
def test_vector_query_matches_oracle_at_d512(spark, hd_dir, hd_duck, name):
    rows = [tuple(r) for r in operators.QUERIES[name](spark, hd_dir).collect()]
    cols = list(operators.QUERIES[name](spark, hd_dir).columns)
    res = hd_duck.sql(operators.ORACLES[name])
    ocols = [c[0] for c in res.description]
    orows = res.fetchall()
    assert not compare_results(rows, cols, orows, ocols), compare_results(
        rows, cols, orows, ocols
    )
    assert len(rows) > 0


def test_d512_structure_is_actually_exercised(spark, hd_dir):
    """Guard against a vacuous pass: the constants must produce real
    structure at d=512 — dedup finds the planted duplicates, DBSCAN
    recovers ~10 clusters, and the IVF ε-graph path agrees with the
    exact one on nearly every point (recall, not precision, is all
    blocking can cost)."""
    dup_pairs = {
        (int(v), int(v) + N_CLUSTERS * PER_CLUSTER) for v in range(N_DUP)
    }
    found = {
        (min(r["v1"], r["v2"]), max(r["v1"], r["v2"]))
        for r in operators.QUERIES["dedup_embedding_cosine"](spark, hd_dir)
        .select("v1", "v2")
        .collect()
    }
    assert dup_pairs <= found  # every planted near-dup surfaces

    exact = {
        r["vec_id"]: r["cluster"]
        for r in operators.QUERIES["dbscan_embedding"](spark, hd_dir).collect()
    }
    n_clusters = len({c for c in exact.values() if c != -1})
    assert n_clusters == N_CLUSTERS  # blobs are separated at eps

    ivf = {
        r["vec_id"]: r["cluster"]
        for r in operators.QUERIES["dbscan_embedding_ivf"](spark, hd_dir).collect()
    }
    agree = sum(ivf[v] == exact[v] for v in exact) / len(exact)
    assert agree >= 0.95, f"IVF ε-graph recall collapsed at d=512: {agree:.3f}"


def test_pca_xy_exact_at_d512(spark, hd_dir):
    """The r4 Gram kernel's whole purpose is high dim — replay the
    integer pipeline in numpy at d=512 and demand exact equality."""
    from citation_graph_spark.operators.dimred import _pca_eigvecs

    pdf = pd.read_parquet(f"{hd_dir}/embeddings.parquet")
    qv = np.floor(
        np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1000 + 0.5
    ).astype(np.int64)
    n = len(qv)
    moments = (qv.T @ qv).astype(np.float64)
    sums = qv.sum(axis=0).astype(np.float64)
    top = _pca_eigvecs(moments, sums, n)
    eq = np.floor(top * 1_000_000 + 0.5).astype(np.int64)
    mq = np.floor(sums / n + 0.5).astype(np.int64)
    dots = (qv - mq) @ eq.T
    want = {
        int(v): (
            int(np.floor(dots[i, 0] / 1_000_000 + 0.5)),
            int(np.floor(dots[i, 1] / 1_000_000 + 0.5)),
        )
        for i, v in enumerate(pdf["vec_id"])
    }
    got = {
        r["vec_id"]: (r["x_milli"], r["y_milli"])
        for r in operators.QUERIES["pca_xy"](spark, hd_dir).collect()
    }
    assert got == want
    # the 10-blob structure must separate along the top components
    xs = np.array([v[0] for v in want.values()], dtype=np.float64)
    assert xs.std() > 0


def test_tsne_xy_exact_replay_at_d512(spark, hd_dir):
    import hashlib

    from citation_graph_spark.operators.dimred import (
        _TSNE_M,
        _interp_landmarks,
        _tsne_fit,
    )

    pdf = pd.read_parquet(f"{hd_dir}/embeddings.parquet")
    qv = np.floor(
        np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1000 + 0.5
    ).astype(np.int64)
    vids = pdf["vec_id"].to_numpy().astype(np.int64)
    order = sorted(
        range(len(vids)),
        key=lambda i: (hashlib.md5(str(vids[i]).encode()).hexdigest(), vids[i]),
    )[:_TSNE_M]
    lm_ids, lm_mat = vids[order], qv[order]
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
        for r in operators.QUERIES["tsne_xy"](spark, hd_dir).collect()
    }
    assert got == want
