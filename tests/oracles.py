"""Single-node reference implementations (numpy / pure python).

These are the golden oracles SURVEY.md §5.2 calls for — the layer the
reference repo lacks (its data_checks/ suite validates invariants, not
numeric results). Spark kernels must match: PageRank allclose(1e-6),
components/communities/triangles exactly.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_oracle(n, edges, alpha=0.85, tol=1e-6, max_iter=200):
    """edges: iterable of (src, dst, weight). Mirrors the Spark update
    rule exactly (same dangling handling, same convergence placement)."""
    wout = np.zeros(n)
    for s, d, w in edges:
        wout[s] += w
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        d_mass = r[wout == 0].sum()
        contrib = np.zeros(n)
        for s, d, w in edges:
            contrib[d] += r[s] * w / wout[s]
        new = (1 - alpha) / n + alpha * (contrib + d_mass / n)
        l1 = np.abs(new - r).sum()
        r = new
        if l1 < tol:
            break
    return r


def components_oracle(n, edges):
    """Union-find; component id = min vid in component."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, *_ in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            lo, hi = min(rs, rd), max(rs, rd)
            parent[hi] = lo
    return np.array([find(i) for i in range(n)])


def label_propagation_oracle(n, edges, max_iter=10):
    """Synchronous LP, min-label tie-break, keep own label if isolated."""
    nbrs = defaultdict(list)
    for s, d, *_ in edges:
        if s != d:
            nbrs[s].append(d)
            nbrs[d].append(s)
    # dedup neighbor multi-edges the same way undirect() does (distinct)
    nbrs = {k: sorted(set(v)) for k, v in nbrs.items()}
    labels = np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if v not in nbrs:
                continue
            cnt = Counter(labels[u] for u in nbrs[v])
            best_n = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best_n)
        if (new == labels).all():
            labels = new
            break
        labels = new
    return labels


def triangles_oracle(n, edges):
    """Exact per-vertex triangle participation counts."""
    adj = defaultdict(set)
    for s, d, *_ in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    counts = np.zeros(n, dtype=np.int64)
    for v in range(n):
        ns = sorted(adj[v])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if ns[j] in adj[ns[i]]:
                    if v < ns[i]:  # count each triangle once at its min vertex
                        counts[v] += 1
                        counts[ns[i]] += 1
                        counts[ns[j]] += 1
    return counts


# -- known micro-graphs (FIXTURES.md §2) --------------------------------

MICRO_GRAPHS = {
    # 4-cycle + isolated vertex: CC = 2 components, PR uniform on cycle
    "cycle4_isolated": (5, [(0, 1), (1, 2), (2, 3), (3, 0)]),
    # star K1,5: hub degree 5, triangles all 0
    "star_k15": (6, [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5)]),
    # triangle + pendant edge: triangle counts 1,1,1,0
    "triangle_pendant": (4, [(0, 1), (1, 2), (2, 0), (2, 3)]),
    # two K4 cliques joined by one bridge
    "two_cliques_bridge": (
        8,
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)],
    ),
}


def random_graph(n, m, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    src = rng.integers(0, n, m)
    dst = (rng.zipf(1.3, m) - 1) % n  # skewed in-degree
    mask = src != dst
    pairs = sorted({(int(s), int(d)) for s, d in zip(src[mask], dst[mask])})
    return [(s, d, 1.0) for s, d in pairs]


def scc_oracle(n, edge_list):
    """Iterative Tarjan: scc label = max vid in the component —
    an algorithm-independent check on graph/scc.py's coloring."""
    adj = [[] for _ in range(n)]
    for s, d in edge_list:
        if s != d:
            adj[s].append(d)
    index = [-1] * n
    low = [0] * n
    onstk = [False] * n
    stk: list[int] = []
    out = [0] * n
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stk.append(v)
                onstk[v] = True
            descended = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    descended = True
                    break
                if onstk[w]:
                    low[v] = min(low[v], index[w])
            if descended:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = max(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


# xxHash64 of one little-endian long, seed 42 — bit-equal to Spark's
# F.xxhash64(col.cast("long")) (public xxHash spec; verified against
# the JVM value in tests/test_topology.py)
_XXP1 = 11400714785074694791
_XXP2 = 14029467366897019727
_XXP3 = 1609587929392839161
_XXP4 = 9650029242287828579
_XXP5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl64(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_long(v, seed=42):
    """Unsigned xxHash64 of the 8-byte little-endian signed long v."""
    k1 = v & _M64
    acc = (seed + _XXP5 + 8) & _M64
    k1 = (k1 * _XXP2) & _M64
    k1 = _rotl64(k1, 31)
    k1 = (k1 * _XXP1) & _M64
    acc ^= k1
    acc = (_rotl64(acc, 27) * _XXP1 + _XXP4) & _M64
    acc ^= acc >> 33
    acc = (acc * _XXP2) & _M64
    acc ^= acc >> 29
    acc = (acc * _XXP3) & _M64
    acc ^= acc >> 32
    return acc
