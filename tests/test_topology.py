"""Topology kernels vs single-node replays: generations (SCC
condensation layering), deterministic walks, Louvain local moves,
exact neighborhood function, HyperBall accuracy."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest

from citation_graph_spark.graph import (
    deterministic_walks,
    exact_balls,
    hyperball,
    louvain_local_moves,
)
from citation_graph_spark.graph.anf import _RHO_CAP, _SIGN_MASK
from citation_graph_spark.graph.walks import (
    WALK_HASH_A,
    WALK_HASH_B,
    WALK_HASH_C,
    WALK_HASH_P,
)
from tests.conftest import edges_df, vertices_df
from tests.oracles import random_graph, scc_oracle, xxhash64_long

DG = {
    "diamond_dag": (6, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (0, 5)]),
    "cycle_tail": (5, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]),
    "random_200": (200, [(s, d) for s, d, _ in random_graph(200, 800, seed=7)]),
    "random_500_skew": (
        500,
        [(s, d) for s, d, _ in random_graph(500, 3000, seed=11)],
    ),
}


# ---------------------------------------------------------------- replays
def balls_replay(n, el, radius):
    adj = defaultdict(set)
    for s, d in el:
        adj[s].add(d)
    verts = {s for s, _ in el} | {d for _, d in el}
    out = {}
    for v in verts:
        reached = {v}
        frontier = {v}
        out[(v, 0)] = 1
        for r in range(1, radius + 1):
            frontier = {w for u in frontier for w in adj[u]} - reached
            reached |= frontier
            out[(v, r)] = len(reached)
    return out


def hll_replay(n, el, radius, log2m=6):
    """Bit-exact register fixpoint + the estimate formula."""
    m = 1 << log2m
    verts = sorted({s for s, _ in el} | {d for _, d in el})
    adj = defaultdict(set)
    for s, d in el:
        adj[s].add(d)

    def reg(v):
        h = xxhash64_long(v) & _SIGN_MASK
        idx = h % m
        z = h >> log2m
        if z == 0:
            return idx, _RHO_CAP
        rho = 1 + (z & -z).bit_length() - 1
        return idx, min(rho, _RHO_CAP)

    regs = {v: dict([reg(v)]) for v in verts}
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else 0.709

    def estimate(rv):
        zeros = m - len(rv)
        s = zeros + sum(2.0 ** -r for r in sorted(rv.values(), reverse=True))
        raw = alpha * m * m / s
        if raw <= 2.5 * m and zeros > 0:
            return float(m) * np.log(float(m) / zeros)
        return raw

    est = {(v, 0): estimate(regs[v]) for v in verts}
    for r in range(1, radius + 1):
        new = {}
        for v in verts:
            rv = dict(regs[v])
            for w in adj[v]:
                for idx, rho in regs[w].items():
                    if rv.get(idx, 0) < rho:
                        rv[idx] = rho
            new[v] = rv
        regs = new
        for v in verts:
            est[(v, r)] = estimate(regs[v])
    return est


def walks_replay(seeds, el, steps):
    adj = defaultdict(list)
    for s, d in el:
        adj[s].append(d)
    rows = set()
    for wid in seeds:
        v = wid
        rows.add((wid, 0, v))
        for t in range(1, steps + 1):
            if not adj[v]:
                break
            v = min(
                adj[v],
                key=lambda w: (
                    (v * WALK_HASH_A + t * WALK_HASH_B + w * WALK_HASH_C)
                    % WALK_HASH_P,
                    w,
                ),
            )
            rows.add((wid, t, v))
    return rows


def louvain_replay(el, rounds):
    edges = {(min(s, d), max(s, d)) for s, d in el if s != d}
    m = len(edges)
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    deg = {v: len(adj[v]) for v in adj}
    comm = {v: v for v in adj}
    for _ in range(rounds):
        vol = defaultdict(int)
        for v in adj:
            vol[comm[v]] += deg[v]
        new = {}
        for v in adj:
            k = defaultdict(int)
            for w in adj[v]:
                k[comm[w]] += 1
            own = comm[v]
            k_own = k.get(own, 0)
            cands = [(0, own)]
            for c, kc in k.items():
                if c == own:
                    continue
                s = 2 * m * (kc - k_own) - deg[v] * (vol[c] - vol[own] + deg[v])
                cands.append((s, c))
            cands.sort(key=lambda t: (-t[0], t[1]))
            new[v] = cands[0][1]
        comm = new
    return comm


def generations_replay(n, el):
    scc = scc_oracle(n, el)
    q = defaultdict(set)
    indeg_comps = set()
    comps = set(scc)
    for s, d in el:
        if scc[s] != scc[d]:
            q[scc[s]].add(scc[d])
            indeg_comps.add(scc[d])
    gen = {c: 0 for c in comps}
    # Kahn-free relaxation (depth-bounded, matches the kernel rule)
    for _ in range(len(comps) + 1):
        changed = False
        for c, outs in q.items():
            for d in outs:
                if gen[d] < gen[c] + 1:
                    gen[d] = gen[c] + 1
                    changed = True
        if not changed:
            break
    return {v: gen[scc[v]] for v in range(n)}


# ----------------------------------------------------------------- tests
def test_xxhash64_replay_is_bit_equal(spark):
    from pyspark.sql import functions as F

    vals = [0, 1, 5, 999, -7, 123456789, (1 << 40) + 3]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.select(F.xxhash64(F.col("v"))).toPandas().iloc[:, 0].tolist()
    for v, g in zip(vals, got):
        u = xxhash64_long(v)
        assert (u - (1 << 64) if u >= (1 << 63) else u) == g


@pytest.mark.parametrize("name", sorted(DG))
def test_exact_balls_matches_replay(spark, name):
    n, el = DG[name]
    got = exact_balls(edges_df(spark, [(s, d, 1.0) for s, d in el]), 3).toPandas()
    want = balls_replay(n, el, 3)
    assert len(got) == len(want)
    for row in got.itertuples():
        assert want[(row.vid, row.r)] == row.ball


@pytest.mark.parametrize("name", ["random_200", "random_500_skew"])
def test_hyperball_registers_and_accuracy(spark, name):
    n, el = DG[name]
    got = hyperball(
        edges_df(spark, [(s, d, 1.0) for s, d in el]), 3, log2m=6
    ).toPandas()
    want = hll_replay(n, el, 3, log2m=6)
    # same register fixpoint ⇒ estimates agree to the last rounding
    # step; allow ±1 for float summation-order in the 2^-rho sum
    for row in got.itertuples():
        assert abs(row.est - round(want[(row.vid, row.r)])) <= 1
    # and the estimate is actually accurate vs the exact balls
    exact = balls_replay(n, el, 3)
    rel = [
        abs(row.est - exact[(row.vid, row.r)]) / exact[(row.vid, row.r)]
        for row in got.itertuples()
        if exact[(row.vid, row.r)] >= 8
    ]
    assert np.median(rel) < 0.25


@pytest.mark.parametrize("name", sorted(DG))
def test_deterministic_walks_match_replay(spark, name):
    n, el = DG[name]
    seeds = [v for v in range(n) if v % 5 == 0]
    got = deterministic_walks(
        edges_df(spark, [(s, d, 1.0) for s, d in el]),
        vertices_df(spark, n).filter("vid % 5 = 0"),
        steps=6,
    ).toPandas()
    want = walks_replay(seeds, el, 6)
    assert {(r.wid, r.step, r.vid) for r in got.itertuples()} == want


@pytest.mark.parametrize("name", sorted(DG))
def test_louvain_moves_match_replay(spark, name):
    n, el = DG[name]
    got = louvain_local_moves(
        edges_df(spark, [(s, d, 1.0) for s, d in el]), rounds=2
    ).toPandas()
    want = louvain_replay(el, 2)
    assert {r.vid: r.community for r in got.itertuples()} == want


def test_louvain_merges_cliques(spark):
    # two 4-cliques joined by one bridge edge: the move rounds must
    # put each clique in a single community and not merge across
    el = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    el += [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    el += [(3, 4)]
    got = louvain_local_moves(
        edges_df(spark, [(s, d, 1.0) for s, d in el]), rounds=2
    ).toPandas()
    comm = {r.vid: r.community for r in got.itertuples()}
    assert len({comm[v] for v in range(4)}) == 1
    assert len({comm[v] for v in range(4, 8)}) == 1
    assert comm[0] != comm[7]


@pytest.mark.parametrize("name", sorted(DG))
def test_generations_match_replay(spark, name):
    from citation_graph_spark.graph import strongly_connected_components
    from citation_graph_spark.operators.topology import generation_relax_lineage
    from pyspark.sql import functions as F

    n, el = DG[name]
    e = edges_df(spark, [(s, d, 1.0) for s, d in el]).select("src", "dst")
    scc = strongly_connected_components(e, vertices_df(spark, n))
    q = (
        e.join(scc.select(F.col("vid").alias("src"), F.col("scc").alias("csrc")), "src")
        .join(scc.select(F.col("vid").alias("dst"), F.col("scc").alias("cdst")), "dst")
        .filter(F.col("csrc") != F.col("cdst"))
        .select("csrc", "cdst")
        .distinct()
    )
    gen = (
        scc.select(F.col("scc").alias("c")).distinct().withColumn("generation", F.lit(0))
    )
    for _ in range(n + 1):
        new = generation_relax_lineage(q, gen).localCheckpoint(eager=True)
        if (
            new.alias("a")
            .join(gen.alias("b"), "c")
            .filter(F.col("a.generation") != F.col("b.generation"))
            .isEmpty()
        ):
            gen = new
            break
        gen = new
    got = (
        scc.join(gen, scc["scc"] == gen["c"]).select("vid", "generation").toPandas()
    )
    want = generations_replay(n, el)
    assert {r.vid: r.generation for r in got.itertuples()} == want


def test_generation_zero_is_source_components(spark):
    n, el = DG["cycle_tail"]
    want = generations_replay(n, el)
    # the 0-1-2 cycle is one SCC with no external in-edge → generation 0
    assert want[0] == want[1] == want[2] == 0
    assert want[3] == 1 and want[4] == 2


def wl_replay(el, rounds):
    from citation_graph_spark.graph.wl import WL_C1, WL_C2, WL_C3, WL_P

    adj = defaultdict(set)
    for s, d in el:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    color = {v: len(adj[v]) for v in adj}
    for _ in range(rounds):
        color = {
            v: (
                color[v] * WL_C1
                + sum((color[w] * WL_C2 + WL_C3) % WL_P for w in adj[v])
            )
            % WL_P
            for v in adj
        }
    return color


@pytest.mark.parametrize("name", sorted(DG))
def test_wl_refinement_matches_replay(spark, name):
    from citation_graph_spark.graph import wl_refinement

    n, el = DG[name]
    got = wl_refinement(
        edges_df(spark, [(s, d, 1.0) for s, d in el]), rounds=3
    ).toPandas()
    want = wl_replay(el, 3)
    assert {r.vid: r.color for r in got.itertuples()} == want


def test_wl_separates_structure_and_respects_symmetry(spark):
    from citation_graph_spark.graph import wl_refinement

    # path 0-1-2-3-4: ends {0,4} and mid-pairs {1,3} are WL-equivalent
    # by symmetry; the center 2 differs from both after refinement
    el = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = wl_refinement(
        edges_df(spark, [(s, d, 1.0) for s, d in el]), rounds=3
    ).toPandas()
    c = {r.vid: r.color for r in got.itertuples()}
    assert c[0] == c[4] and c[1] == c[3]
    assert len({c[0], c[1], c[2]}) == 3


def test_distance_distribution_micro(spark):
    """The distance-distribution aggregation rule on a 4-path
    0->1->2->3 with a known distribution: pairs(r) = sum_v N(v,r) =
    4,7,9,10; floor'd nano fractions; effective diameter (first r
    covering >= 90% of reachable pairs) lands on r=2 because
    9/10 == 90% exactly."""
    from pyspark.sql import functions as F

    el = [(0, 1), (1, 2), (2, 3)]
    balls = exact_balls(edges_df(spark, [(s, d, 1.0) for s, d in el]), 3)
    per_r = balls.groupBy("r").agg(F.sum("ball").alias("pairs"))
    rows = {r.r: r.pairs for r in per_r.collect()}
    assert rows == {0: 4, 1: 7, 2: 9, 3: 10}
    fr = {r: (rows[r] * 1000000000) // rows[3] for r in rows}
    assert fr == {0: 400000000, 1: 700000000, 2: 900000000, 3: 1000000000}
    assert min(r for r in rows if fr[r] >= 900000000) == 2


def ns_replay(seeds, el, fanouts):
    adj = defaultdict(set)
    for s, d in el:
        adj[s].add(d)
    rows = set()
    frontier = {(s, s) for s in seeds}
    for hop, fanout in enumerate(fanouts, start=1):
        samp = {
            v: sorted(
                adj[v],
                key=lambda w: (
                    (v * WALK_HASH_A + hop * WALK_HASH_B + w * WALK_HASH_C)
                    % WALK_HASH_P,
                    w,
                ),
            )[:fanout]
            for v in adj
        }
        new = {
            (seed, hop, v, w)
            for seed, v in frontier
            for w in samp.get(v, ())
        }
        rows |= new
        frontier = {(seed, w) for seed, _, _, w in new}
    return rows


@pytest.mark.parametrize("name", sorted(DG))
def test_neighbor_sample_matches_replay(spark, name):
    from citation_graph_spark.graph import neighbor_sample

    n, el = DG[name]
    seeds = [v for v in range(n) if v % 5 == 0]
    got = neighbor_sample(
        edges_df(spark, [(s, d, 1.0) for s, d in el]),
        vertices_df(spark, n).filter("vid % 5 = 0"),
        fanouts=[3, 2],
    ).toPandas()
    want = ns_replay(seeds, el, [3, 2])
    assert {
        (r.seed, r.hop, r.src, r.dst) for r in got.itertuples()
    } == want


def test_neighbor_sample_fanout_bound(spark):
    """No (seed, hop, src) group may exceed its fanout, and hop h+1
    sources must be hop h destinations of the same seed."""
    from citation_graph_spark.graph import neighbor_sample

    n, el = DG["random_200"]
    got = neighbor_sample(
        edges_df(spark, [(s, d, 1.0) for s, d in el]),
        vertices_df(spark, n).filter("vid % 7 = 0"),
        fanouts=[4, 2],
    ).toPandas()
    sizes = got.groupby(["seed", "hop", "src"]).size()
    for (_, hop, _), k in sizes.items():
        assert k <= [4, 2][hop - 1]
    h1 = got[got.hop == 1]
    h2 = got[got.hop == 2]
    d1 = {(r.seed, r.dst) for r in h1.itertuples()}
    assert all((r.seed, r.src) in d1 for r in h2.itertuples())
