"""Distributed DBSCAN vs a sequential numpy oracle of the identical
deterministic spec (ε-join, core degree, core components by min id,
min-border-attach, noise = -1)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from citation_graph_spark.operators.dbscan import dbscan_assign


def dbscan_oracle(X: np.ndarray, eps2: int, min_samples: int) -> dict[int, int]:
    Q = np.floor(X * 1000 + 0.5)
    n = len(Q)
    nrm = (Q * Q).sum(1)
    d2 = nrm[:, None] + nrm[None, :] - 2 * Q @ Q.T
    adj = (d2 <= eps2) & ~np.eye(n, dtype=bool)
    core = adj.sum(1) + 1 >= min_samples

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in np.where(adj[i] & core)[0]:
            ri, rj = find(i), find(int(j))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    lab: dict[int, int] = {}
    for i in range(n):
        if core[i]:
            lab[i] = find(i)
    for i in range(n):
        if not core[i]:
            cn = [lab[int(j)] for j in np.where(adj[i])[0] if core[j]]
            lab[i] = min(cn) if cn else -1
    return lab


def _blobs(seed: int = 3):
    """Three tight blobs + far-flung noise points, 2-d."""
    rng = np.random.Generator(np.random.PCG64(seed))
    centers = np.array([[0.0, 0.0], [5.0, 5.0], [-5.0, 4.0]])
    pts = np.vstack(
        [c + rng.normal(0, 0.3, size=(30, 2)) for c in centers]
        + [rng.uniform(15, 30, size=(5, 2))]
    )
    return pts


def test_dbscan_matches_oracle_and_finds_blobs(spark):
    X = _blobs()
    eps2 = 1_000_000  # eps = 1.0 in milli units
    min_samples = 4
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(X)), "embedding": [list(map(float, r)) for r in X]}
        )
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in dbscan_assign(emb, eps2=eps2, min_samples=min_samples).collect()
    }
    want = dbscan_oracle(X, eps2, min_samples)
    assert got == want
    clusters = {c for c in got.values() if c >= 0}
    assert len(clusters) == 3
    assert sum(1 for c in got.values() if c == -1) >= 5


def test_dbscan_all_noise_when_sparse(spark):
    X = _blobs(seed=9)[:8] * 50  # blow points apart
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(X)), "embedding": [list(map(float, r)) for r in X]}
        )
    )
    got = dbscan_assign(emb, eps2=100, min_samples=3).collect()
    assert all(r["cluster"] == -1 for r in got)


SF_DIR = "/root/testdata/sf0.001"


def test_ivf_eps_pairs_subset_and_recall(spark):
    """Blocked ε-pairs are exact-verified, so they must be a SUBSET of
    the all-pairs ε-graph (precision 1.0 by construction); the blocking
    may only cost recall, floored at the measured 0.98 @ nprobe=4."""
    from citation_graph_spark.operators.dbscan import eps_pairs
    from citation_graph_spark.tables import load_tables

    emb = load_tables(spark, SF_DIR)["embeddings"]
    exact = {(r.v1, r.v2) for r in eps_pairs(emb, candidates="all_pairs").collect()}
    blocked = {(r.v1, r.v2) for r in eps_pairs(emb, candidates="ivf").collect()}
    assert blocked <= exact, "blocked pairs must pass the same exact verify"
    assert len(blocked) / max(len(exact), 1) >= 0.95, (
        f"ε-graph recall collapsed: {len(blocked)}/{len(exact)}"
    )


def test_dbscan_auto_candidate_routing(spark):
    """auto = all_pairs below the threshold (bit-identical to the
    baseline) and the IVF path above it (bit-identical to explicit
    candidates='ivf')."""
    from citation_graph_spark.tables import load_tables

    emb = load_tables(spark, SF_DIR)["embeddings"]
    base = {r.vec_id: r.cluster for r in dbscan_assign(emb, candidates="all_pairs").collect()}
    auto = {r.vec_id: r.cluster for r in dbscan_assign(emb, candidates="auto").collect()}
    assert auto == base, "auto below threshold must equal the all-pairs baseline"

    ivf = {r.vec_id: r.cluster for r in dbscan_assign(emb, candidates="ivf").collect()}
    forced = {
        r.vec_id: r.cluster
        for r in dbscan_assign(emb, candidates="auto", auto_threshold=10).collect()
    }
    assert forced == ivf, "auto above threshold must route to the IVF blocking"

    # the quality trade the routing makes: ≥95% of assignments identical
    exact_agree = sum(1 for k in base if base[k] == ivf[k]) / len(base)
    assert exact_agree >= 0.95, f"blocked assignment agreement: {exact_agree:.3f}"


def test_dbscan_rejects_unknown_candidates_mode(spark):
    import pytest as _pytest

    from citation_graph_spark.tables import load_tables

    emb = load_tables(spark, SF_DIR)["embeddings"]
    with _pytest.raises(ValueError, match="candidates"):
        dbscan_assign(emb, candidates="nonsense")


def test_external_candidates_duplicates_and_self_pairs_are_hygienic(spark):
    """A caller-supplied blocking DataFrame with duplicates, both
    orientations, and self-pairs must give the SAME clustering as the
    exact baseline when it covers every true ε-pair — duplicate votes
    must not inflate core degrees."""
    from citation_graph_spark.operators.dbscan import eps_pairs

    X = _blobs()
    eps2, min_samples = 1_000_000, 4
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(X)), "embedding": [list(map(float, r)) for r in X]}
        )
    )
    n = len(X)
    import pyspark.sql.functions as F

    ids = spark.range(n).select(F.col("id").alias("v1"))
    # full cross product INCLUDING self-pairs and both orientations,
    # then unioned with itself → every pair appears at least 4 ways
    allp = ids.crossJoin(ids.select(F.col("v1").alias("v2")))
    dirty = allp.unionByName(allp)

    base = {
        r["vec_id"]: r["cluster"]
        for r in dbscan_assign(
            emb, eps2=eps2, min_samples=min_samples, candidates="all_pairs"
        ).collect()
    }
    via_dirty = {
        r["vec_id"]: r["cluster"]
        for r in dbscan_assign(
            emb, eps2=eps2, min_samples=min_samples, candidates=dirty
        ).collect()
    }
    assert via_dirty == base

    # and eps_pairs itself emits each symmetric pair exactly once
    pairs = eps_pairs(emb, eps2=eps2, candidates=dirty).collect()
    keys = [(r.v1, r.v2) for r in pairs]
    assert len(keys) == len(set(keys))
    assert all(v1 != v2 for v1, v2 in keys)
