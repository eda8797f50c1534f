"""Spectral bisection: exact numpy replay of the integer kernel plus
semantic checks (barbell split, kill-resume bit-equality)."""

from __future__ import annotations

import numpy as np
import pytest

from citation_graph_spark.graph.spectral import (
    FIEDLER_SAFE_SPREAD,
    FIEDLER_SCALE,
    FIEDLER_SHIFT,
    fiedler_scores,
    spectral_bisect,
)
from tests.conftest import edges_df


def numpy_replay(n, edge_list, iters):
    """Bit-exact sequential replay of the integer deflated power
    iteration (same σ, seed, projection, min-shift rescale)."""
    adj = [set() for _ in range(n)]
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = np.array([len(adj[v]) for v in range(n)], dtype=np.int64)
    sigma = int(deg.max()) + 1
    x = np.array([(v % 7) - 3 for v in range(n)], dtype=np.int64)
    for _ in range(iters):
        y = np.array(
            [
                (sigma - deg[v]) * x[v] + sum(x[u] for u in adj[v])
                for v in range(n)
            ],
            dtype=np.int64,
        )
        z = n * y - y.sum()
        if z.max() == z.min():
            x = np.zeros(n, dtype=np.int64)
        else:
            spread = int(z.max()) - int(z.min())
            if spread <= FIEDLER_SAFE_SPREAD:
                x = (z - z.min()) * (2 * FIEDLER_SCALE) // spread - FIEDLER_SCALE
            else:  # the engine's int64-overflow guard (2^16 pre-shift)
                x = (
                    (z - z.min()) // FIEDLER_SHIFT
                ) * (2 * FIEDLER_SCALE) // max(
                    spread // FIEDLER_SHIFT, 1
                ) - FIEDLER_SCALE
    return x


def barbell(k):
    """Two k-cliques joined by a single bridge edge."""
    el = []
    for i in range(k):
        for j in range(i + 1, k):
            el.append((i, j))
            el.append((k + i, k + j))
    el.append((k - 1, k))
    return el


def test_fiedler_matches_numpy_replay(spark):
    el = barbell(6)
    got = {
        r["vid"]: r["score_q4"]
        for r in fiedler_scores(edges_df(spark, el), max_iter=25).collect()
    }
    want = numpy_replay(12, el, 25)
    for v in range(12):
        assert got[v] == want[v], v


def test_bisect_splits_barbell(spark):
    el = barbell(8)
    rows = spectral_bisect(edges_df(spark, el), max_iter=40).collect()
    side = {r["vid"]: r["side"] for r in rows}
    left = {side[v] for v in range(8)}
    right = {side[v] for v in range(8, 16)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_bisect_picks_largest_component(spark):
    el = barbell(5) + [(100, 101), (101, 102)]  # small second component
    rows = spectral_bisect(edges_df(spark, el), max_iter=30).collect()
    vids = {r["vid"] for r in rows}
    assert vids == set(range(10))  # the 3-vertex path emits no rows


def test_fiedler_resume_bit_identical(spark, tmp_path):
    el = [(s, d) for s, d, _ in __import__(
        "tests.oracles", fromlist=["random_graph"]
    ).random_graph(60, 170, seed=11)]
    e = edges_df(spark, el)
    ck = str(tmp_path / "fied")
    # interrupted run: 10 rounds checkpointed...
    fiedler_scores(e, max_iter=10, checkpoint_dir=ck,
                   checkpoint_interval=5).collect()
    # ...resumed to 20, vs uninterrupted 20
    resumed = {
        r["vid"]: r["score_q4"]
        for r in fiedler_scores(
            e, max_iter=20, checkpoint_dir=ck, resume=True
        ).collect()
    }
    cold = {
        r["vid"]: r["score_q4"]
        for r in fiedler_scores(e, max_iter=20).collect()
    }
    assert resumed == cold


def test_degenerate_single_edge(spark):
    rows = fiedler_scores(edges_df(spark, [(0, 1)]), max_iter=8).collect()
    got = {r["vid"]: r["score_q4"] for r in rows}
    want = numpy_replay(2, [(0, 1)], 8)
    assert got == {0: int(want[0]), 1: int(want[1])}


def test_multilevel_projection_consistency(spark):
    """Matched pairs must land on the same side (they share a
    supervertex), and the side labels must agree with bisecting the
    quotient directly."""
    from citation_graph_spark.operators.graphq import (
        graph_part_multilevel_partition,
        part_graph_edges,
    )
    from citation_graph_spark.graph import maximal_matching

    sf = "/root/testdata/sf0.001"
    side = {
        r["vid"]: r["side"]
        for r in graph_part_multilevel_partition(spark, sf).collect()
    }
    assert set(side.values()) == {0, 1}  # a genuine bisection
    m = maximal_matching(part_graph_edges(spark, sf), max_iter=100)
    for r in m.filter("matched = 1").collect():
        if r["vid"] in side and r["mate"] in side:
            assert side[r["vid"]] == side[r["mate"]], (r["vid"], r["mate"])


def python_refine(n, edge_list, sides, rounds):
    """Sequential replay of the synchronized refinement schedule."""
    adj = [set() for _ in range(n)]
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    P = 2**33
    side = dict(sides)
    for _ in range(rounds):
        gain = {
            v: sum(1 if side[u] != side[v] else -1 for u in adj[v])
            for v in side
        }
        pri = {v: gain[v] * P + (P - v) for v in side}
        flip = {
            v
            for v in side
            if gain[v] > 0
            and all(
                not (gain.get(u, 0) > 0 and pri[u] > pri[v])
                for u in adj[v]
            )
        }
        for v in flip:
            side[v] = 1 - side[v]
    return side


def cut_size(edge_list, side):
    return sum(
        1 for a, b in edge_list
        if a != b and a in side and b in side and side[a] != side[b]
    )


def test_refine_matches_python_replay_and_decreases_cut(spark):
    from citation_graph_spark.graph.spectral import refine_bisection
    from tests.oracles import random_graph

    el = [(s, d) for s, d, _ in random_graph(80, 300, seed=7)]
    n = 80
    verts = sorted({v for e in el for v in e})
    init = {v: v % 2 for v in verts}  # deliberately bad partition
    sides_df = spark.createDataFrame(
        [(v, s) for v, s in init.items()], "vid long, side int"
    )
    got = {
        r["vid"]: r["side"]
        for r in refine_bisection(
            edges_df(spark, el), sides_df, rounds=4
        ).collect()
    }
    want = python_refine(n, el, init.items(), 4)
    assert got == want
    # cut must not increase — and on this bad start it strictly improves
    assert cut_size(el, got) < cut_size(el, init)
    # per-round monotone non-increase
    prev = cut_size(el, init)
    for r in range(1, 5):
        cur = cut_size(el, python_refine(n, el, init.items(), r))
        assert cur <= prev
        prev = cur


def test_fiedler_wide_spread_branch_matches_replay(spark, monkeypatch):
    """Force the overflow-guard branch (found by the 1.8M-vertex
    partition stress: (z − zmin)·2·10⁴ overflows long past ~2^45
    spread) and demand the engine still equals the sequential replay
    bit-for-bit. Patch the threshold to 0 on BOTH sides so every
    round takes the 2^16 pre-shift path on a small graph."""
    from citation_graph_spark.graph import spectral as sp

    monkeypatch.setattr(sp, "FIEDLER_SAFE_SPREAD", 0)
    # patch the replay's own globals — pytest may import this file
    # under a different module name, so attribute-patching a fresh
    # import would miss the copy actually running
    monkeypatch.setitem(numpy_replay.__globals__, "FIEDLER_SAFE_SPREAD", 0)
    el = [(s, d) for s, d, _ in __import__(
        "tests.oracles", fromlist=["random_graph"]
    ).random_graph(60, 170, seed=23)]
    got = {
        r["vid"]: r["score_q4"]
        for r in fiedler_scores(edges_df(spark, el), max_iter=12).collect()
    }
    want = numpy_replay(60, el, 12)
    for v in range(60):
        assert got[v] == want[v], v
    assert max(abs(v) for v in got.values()) <= FIEDLER_SCALE


def test_fiedler_guard_sql_parity_wide_regime():
    """The oracle CASE branch must equal the engine formula in the
    genuinely-wide regime: synthetic z values with spread > 2^45,
    DuckDB int128 arithmetic vs the Python int formula."""
    import duckdb

    zs = [
        -(3 << 50), -(1 << 46), -12345, 0, 7, 1 << 44, (5 << 50) + 991
    ]
    zmin, zmax = min(zs), max(zs)
    spread = zmax - zmin
    assert spread > FIEDLER_SAFE_SPREAD
    want = [
        ((z - zmin) // FIEDLER_SHIFT) * (2 * FIEDLER_SCALE)
        // max(spread // FIEDLER_SHIFT, 1) - FIEDLER_SCALE
        for z in zs
    ]
    rows = duckdb.sql(
        f"""
        SELECT CASE WHEN {zmax} - {zmin} <= {FIEDLER_SAFE_SPREAD}
               THEN (z - {zmin}) * {2 * FIEDLER_SCALE}
                    // ({zmax} - {zmin}) - {FIEDLER_SCALE}
               ELSE ((z - {zmin}) // {FIEDLER_SHIFT})
                    * {2 * FIEDLER_SCALE}
                    // greatest(({zmax} - {zmin}) // {FIEDLER_SHIFT}, 1)
                    - {FIEDLER_SCALE} END
        FROM (VALUES {','.join(f'({z})' for z in zs)}) t(z)
        """
    ).fetchall()
    got = [int(r[0]) for r in rows]
    assert got == want
    assert all(-FIEDLER_SCALE <= v <= FIEDLER_SCALE for v in got)
