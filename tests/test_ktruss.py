"""k-truss vs a sequential synchronous-peel oracle — exact edge sets
and supports, plus the classic structural invariants (truss nesting,
truss ⊆ support-threshold subgraph of itself = fixpoint)."""

from __future__ import annotations

from itertools import combinations

import pytest

from citation_graph_spark.graph import k_truss
from tests.conftest import edges_df
from tests.oracles import random_graph


def _canon(edge_list):
    return {
        (min(a, b), max(a, b)) for a, b in edge_list if a != b
    }


def ktruss_oracle(edge_list, k, max_iter=50):
    """Sequential synchronous peel: identical schedule to the engine.
    Returns {(a, b): support_at_fixpoint}."""
    alive = _canon(edge_list)
    for _ in range(max_iter):
        adj: dict[int, set[int]] = {}
        for a, b in alive:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in alive
        }
        nxt = {e for e in alive if sup[e] >= k - 2}
        if nxt == alive:
            return {e: sup[e] for e in alive}
        alive = nxt
        if not alive:
            return {}
    # cap hit: recompute support over the capped state (engine contract)
    adj = {}
    for a, b in alive:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {(a, b): len(adj[a] & adj[b]) for a, b in alive}


GRAPHS = {
    "two_cliques_bridge": [
        *combinations(range(5), 2),          # K5
        *combinations(range(5, 9), 2),       # K4
        (4, 5),                              # bridge (in no triangle)
    ],
    "random_200": [(s, d) for s, d, _ in random_graph(200, 1400, seed=3)],
    "random_400_skew": [
        (s, d) for s, d, _ in random_graph(400, 3200, seed=19)
    ],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
@pytest.mark.parametrize("k", [3, 4])
def test_ktruss_matches_oracle(spark, name, k):
    el = list(GRAPHS[name])
    got = {
        (r["a"], r["b"]): r["support"]
        for r in k_truss(edges_df(spark, el), k=k).collect()
    }
    want = ktruss_oracle(el, k)
    assert got == want


def test_ktruss_nesting_and_known_structure(spark):
    """K5 ∪ K4 ∪ bridge: the 4-truss is exactly K5 ∪ K4 (every K_n
    edge has support n−2), the 5-truss is exactly K5, and trusses
    nest; the bridge edge (support 0) never survives k ≥ 3."""
    el = list(GRAPHS["two_cliques_bridge"])
    e = edges_df(spark, el)
    t3 = {(r["a"], r["b"]) for r in k_truss(e, k=3).collect()}
    t4 = {(r["a"], r["b"]) for r in k_truss(e, k=4).collect()}
    t5 = {(r["a"], r["b"]) for r in k_truss(e, k=5).collect()}
    k5 = set(combinations(range(5), 2))
    k4 = set(combinations(range(5, 9), 2))
    assert t4 == k5 | k4
    assert t5 == k5
    assert t5 <= t4 <= t3
    assert (4, 5) not in t3


def test_ktruss_round_cap_is_welldefined(spark):
    """A chain of triangles sharing edges peels one layer per round;
    capping the rounds must return the exact capped synchronous state
    (the SQL-oracle contract), not the fixpoint."""
    # path of triangles: (i, i+1, i+2) for i in 0..6 — 3-truss support
    # erodes from the ends inward under k=4
    el = [(i, i + 1) for i in range(8)] + [(i, i + 2) for i in range(7)]
    got1 = {
        (r["a"], r["b"]): r["support"]
        for r in k_truss(edges_df(spark, el), k=4, max_iter=1).collect()
    }
    want1 = ktruss_oracle(el, 4, max_iter=1)
    assert got1 == want1
    # and the uncapped fixpoint of this graph is empty
    assert ktruss_oracle(el, 4) == {}
    assert k_truss(edges_df(spark, el), k=4).count() == 0


def test_ktruss_rejects_k_below_3(spark):
    with pytest.raises(ValueError):
        k_truss(edges_df(spark, [(0, 1)]), k=2)
