"""Sampled betweenness vs an exact sequential Brandes oracle — same
pivot set, same level cap, micro-integer equality."""

from __future__ import annotations

from collections import deque

import pytest

from citation_graph_spark.graph import betweenness_sampled
from tests.conftest import edges_df, vertices_df
from tests.oracles import random_graph


def brandes_oracle(n, edge_list, sources, max_depth=10**9):
    """Sequential Brandes (Algorithm 1, Brandes 2001) restricted to the
    given pivot set and BFS depth cap; returns dependency sums."""
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    bc = [0.0] * n
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in adj[w]:
                if v in dist and dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


GRAPHS = {
    "path_5": (5, [(0, 1), (1, 2), (2, 3), (3, 4)]),
    "star_plus_tail": (7, [(0, 1), (0, 2), (0, 3), (0, 4), (4, 5), (5, 6)]),
    "random_200": (
        200,
        [(s, d) for s, d, _ in random_graph(200, 900, seed=5)],
    ),
    "random_400_skew": (
        400,
        [(s, d) for s, d, _ in random_graph(400, 2600, seed=23)],
    ),
}


def _micro(x):
    import math

    return math.floor(x * 1000000 + 0.5)


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_betweenness_matches_brandes(spark, name):
    n, el = GRAPHS[name]
    in_graph = sorted({v for e in el for v in e})
    pivots = in_graph[:8]
    verts = vertices_df(spark, n)
    got = {
        r["vid"]: r["bc_micro"]
        for r in betweenness_sampled(
            edges_df(spark, el), verts.filter(verts["vid"].isin(pivots))
        ).collect()
    }
    want = brandes_oracle(n, el, pivots)
    assert set(got) == set(in_graph)  # exactly the vertices in edges
    for v in in_graph:
        assert got[v] == _micro(want[v]), f"vid {v}"


def test_betweenness_path_known_values(spark):
    """On a path 0-1-2-3-4 with ALL vertices as pivots, bc(center)=4
    per direction... the classic closed form: bc(v_i) = 2·i·(n-1-i)
    (unnormalized, both endpoints as pivots counted)."""
    n, el = GRAPHS["path_5"]
    got = {
        r["vid"]: r["bc_micro"]
        for r in betweenness_sampled(
            edges_df(spark, el), vertices_df(spark, n)
        ).collect()
    }
    for i in range(n):
        assert got[i] == 2 * i * (n - 1 - i) * 1000000


def test_betweenness_depth_cap_matches_oracle(spark):
    """A capped BFS is a well-defined estimator state on both sides
    (the SQL-oracle contract): dependencies over the ≤cap-hop DAG."""
    n, el = GRAPHS["star_plus_tail"]
    got = {
        r["vid"]: r["bc_micro"]
        for r in betweenness_sampled(
            edges_df(spark, el),
            vertices_df(spark, n).filter("vid = 1"),
            max_iter=2,
        ).collect()
    }
    want = brandes_oracle(n, el, [1], max_depth=2)
    for v, bcv in got.items():
        assert bcv == _micro(want[v]), f"vid {v}"


# ---- edge betweenness (Girvan–Newman scores) ------------------------


def edge_brandes_oracle(n, edge_list, sources, max_depth=10**9):
    """Sequential Brandes with edge accumulation: the dependency routed
    through DAG edge v→w from pivot s is sigma_v/sigma_w·(1+delta_w)."""
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    eb: dict[tuple[int, int], float] = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in adj[w]:
                if v in dist and dist[v] == dist[w] - 1:
                    c = sigma[v] / sigma[w] * (1 + delta[w])
                    delta[v] += c
                    key = (min(v, w), max(v, w))
                    eb[key] = eb.get(key, 0.0) + c
    return eb


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_edge_betweenness_matches_brandes(spark, name):
    from citation_graph_spark.graph import edge_betweenness_sampled

    n, el = GRAPHS[name]
    in_graph = sorted({v for e in el for v in e})
    pivots = in_graph[:8]
    verts = vertices_df(spark, n)
    got = {
        (r["a"], r["b"]): r["eb_micro"]
        for r in edge_betweenness_sampled(
            edges_df(spark, el), verts.filter(verts["vid"].isin(pivots))
        ).collect()
    }
    want = edge_brandes_oracle(n, el, pivots)
    canon = {(min(a, b), max(a, b)) for a, b in el if a != b}
    assert set(got) == canon  # one row per canonical undirected edge
    for k in canon:
        assert got[k] == _micro(want.get(k, 0.0)), f"edge {k}"


def test_edge_betweenness_path_known_values(spark):
    """Path 0-1-2-3-4, all pivots: edge (i,i+1) carries every shortest
    path crossing it — closed form 2·(i+1)·(n-1-i) ordered-pair count."""
    from citation_graph_spark.graph import edge_betweenness_sampled

    n, el = GRAPHS["path_5"]
    got = {
        (r["a"], r["b"]): r["eb_micro"]
        for r in edge_betweenness_sampled(
            edges_df(spark, el), vertices_df(spark, n)
        ).collect()
    }
    for i in range(n - 1):
        assert got[(i, i + 1)] == 2 * (i + 1) * (n - 1 - i) * 1000000


def test_edge_betweenness_depth_cap_matches_oracle(spark):
    from citation_graph_spark.graph import edge_betweenness_sampled

    n, el = GRAPHS["star_plus_tail"]
    got = {
        (r["a"], r["b"]): r["eb_micro"]
        for r in edge_betweenness_sampled(
            edges_df(spark, el),
            vertices_df(spark, n).filter("vid = 1"),
            max_iter=2,
        ).collect()
    }
    want = edge_brandes_oracle(n, el, [1], max_depth=2)
    for k, v in got.items():
        assert v == _micro(want.get(k, 0.0)), f"edge {k}"
