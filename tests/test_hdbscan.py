"""HDBSCAN-class density hierarchy vs a sequential numpy replay of the
identical deterministic spec (ε-bounded core distances →
mutual-reachability graph → threshold-cut components → min-cluster-size
noise), plus the hierarchy-nesting invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd

from citation_graph_spark.operators.density import hdbscan_cut_labels


def hdbscan_oracle(
    X: np.ndarray,
    levels: tuple[int, ...],
    eps2_max: int,
    min_samples: int,
    min_cluster_size: int,
) -> dict[tuple[int, int], int]:
    Q = np.floor(X * 1000 + 0.5).astype(np.int64)
    n = len(Q)
    nrm = (Q * Q).sum(1)
    d2 = nrm[:, None] + nrm[None, :] - 2 * Q @ Q.T
    np.fill_diagonal(d2, 2**62)

    k = min_samples - 1
    core2 = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        nb = np.sort(d2[i][d2[i] <= eps2_max])
        if len(nb) >= k:
            core2[i] = nb[k - 1]

    edges = [
        (max(int(d2[i, j]), int(core2[i]), int(core2[j])), i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if d2[i, j] <= eps2_max and core2[i] >= 0 and core2[j] >= 0
    ]

    out: dict[tuple[int, int], int] = {}
    for lv in levels:
        parent = list(range(n))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for w, i, j in edges:
            if w <= lv:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
        members: dict[int, list[int]] = {}
        for i in range(n):
            if core2[i] >= 0:
                members.setdefault(find(i), []).append(i)
        for mem in members.values():
            lab = min(mem) if len(mem) >= min_cluster_size else -1
            for i in mem:
                out[(lv, i)] = lab
        for i in range(n):
            if core2[i] < 0:
                out[(lv, i)] = -1
    return out


def _blobs(seed: int = 5, per: int = 18):
    rng = np.random.Generator(np.random.PCG64(seed))
    centers = np.array([[0.0, 0.0], [6.0, 6.0], [-6.0, 5.0]])
    return np.vstack(
        [c + rng.normal(0, 0.5, size=(per, 2)) for c in centers]
        + [rng.uniform(18, 30, size=(4, 2))]  # sparse → undefined core
    )


LEVELS = (600_000, 1_200_000, 2_400_000)
EPS2_MAX = 3_000_000
MIN_SAMPLES = 4
MIN_CLUSTER = 5


def _engine(spark, X):
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(X)), "embedding": [list(map(float, r)) for r in X]}
        )
    )
    got = hdbscan_cut_labels(
        emb,
        levels=LEVELS,
        eps2_max=EPS2_MAX,
        min_samples=MIN_SAMPLES,
        min_cluster_size=MIN_CLUSTER,
    )
    return {(r.level, r.vec_id): r.cluster for r in got.collect()}


def test_hdbscan_matches_sequential_oracle(spark):
    X = _blobs()
    got = _engine(spark, X)
    want = hdbscan_oracle(X, LEVELS, EPS2_MAX, MIN_SAMPLES, MIN_CLUSTER)
    assert got == want
    # the fixture is built so every level is non-trivial: three blobs
    # resolve as clusters at the top level, far-flung points stay noise
    top = {v for (lv, i), v in got.items() if lv == LEVELS[-1] and v >= 0}
    assert len(top) == 3
    assert sum(1 for (lv, i), v in got.items() if lv == LEVELS[-1] and v == -1) >= 4


def test_hdbscan_levels_nest(spark):
    """Raising the cut level only MERGES clusters: the partition at a
    lower level (restricted to clustered points) refines the partition
    at any higher level — components of graph≤t are monotone in t."""
    X = _blobs(seed=8)
    got = _engine(spark, X)
    for lo, hi in zip(LEVELS, LEVELS[1:]):
        mapping: dict[int, int] = {}
        for i in range(len(X)):
            lab_lo, lab_hi = got[(lo, i)], got[(hi, i)]
            if lab_lo < 0:
                continue
            # a point clustered at the low level stays clustered above
            # (its component only grows; size can only increase)
            assert lab_hi >= 0
            assert mapping.setdefault(lab_lo, lab_hi) == lab_hi, (
                "low-level cluster split across high-level clusters"
            )


def test_hdbscan_sparse_points_noise_at_all_levels(spark):
    X = _blobs(seed=13)
    got = _engine(spark, X)
    sparse_ids = range(len(X) - 4, len(X))  # the uniform far-flung tail
    for lv in LEVELS:
        for i in sparse_ids:
            assert got[(lv, i)] == -1


def test_core_distances_min_samples_one_is_zero_for_all(spark):
    """min_samples=1: the point itself satisfies the density rule, so
    every pair endpoint has core² = 0 (sklearn semantics) rather than
    the k=0 rank matching nothing and everything becoming noise."""
    from citation_graph_spark.operators.dbscan import eps_pairs
    from citation_graph_spark.operators.density import core_distances

    X = _blobs()
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(X)), "embedding": [list(map(float, r)) for r in X]}
        )
    )
    pairs = eps_pairs(emb, eps2=1_000_000, candidates="all_pairs", keep_dist2=True)
    got = core_distances(pairs, min_samples=1).collect()
    endpoints = {r.v1 for r in pairs.collect()}
    assert {r["vec_id"] for r in got} == endpoints
    assert all(r["core2"] == 0 for r in got)
