"""Distributed minimum spanning forest via Borůvka rounds.

The kernel behind the HDBSCAN-class density clustering
(operators/density.py): HDBSCAN is, at its core, an MST of the
mutual-reachability graph (reference: clustering/hdbscan.py:36-42
fits sklearn's HDBSCAN, whose fit is Prim/Borůvka over mutual
reachability).  Prim is inherently sequential; Borůvka is the
textbook distributed form — every component picks its minimum-weight
outgoing edge, the picked edges merge components, repeat.  Components
at least halve per round, so O(log n) rounds regardless of graph
diameter, each round a constant number of joins/aggregations — the
right shape for a 1000-executor cluster.

Determinism: ties are broken by the total order ``(w, src, dst)``.
Under any strict total order on edges the MSF is *unique* (the
classic distinct-weights argument applied to the lexicographic
perturbation), so Borůvka here returns exactly the same edge set as
sequential Kruskal with the same tie-break — pinned by
tests/test_msf.py — and is an MSF of the unperturbed weights.

The property density clustering leans on: for ANY threshold t, the
connected components of ``forest.filter(w <= t)`` equal the
components of ``edges.filter(w <= t)`` — a spanning forest preserves
connectivity at every weight level, which lets one MSF serve every
hierarchy cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from citation_graph_spark.graph.components import connected_components
from citation_graph_spark.session import iterative_kernel_conf


def boruvka_msf(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 40,
) -> DataFrame:
    """Minimum spanning forest of an undirected weighted graph.

    ``edges``: (src, dst, w) with integer-comparable weights; treated
    as undirected (one row per unordered pair is enough — symmetry is
    handled internally).  ``vertices``: optional (vid) frame; isolated
    vertices simply contribute no forest edges.  Returns the forest as
    (src, dst, w) — per connected component, |C|-1 edges.
    """
    with iterative_kernel_conf(edges.sparkSession):
        return _boruvka_msf(edges, vertices, max_rounds)


def normalize_edges(edges: DataFrame) -> DataFrame:
    """Undirected-canonical (src<dst) edge lineage with parallel edges
    collapsed to their cheapest weight — the per-call preamble of the
    Borůvka loop, exposed unchecked-pointed so the plan-regression
    suite can pin its shape (one groupBy exchange, no joins)."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("w"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))  # parallel edges: cheapest wins
    )


def nomination_lineage(e: DataFrame, labels: DataFrame) -> DataFrame:
    """One Borůvka nomination as pure lineage: label both endpoints,
    keep cross-component edges, and let every component nominate its
    minimum outgoing edge under the strict total order (w, src, dst) —
    the determinism contract.  Returns (comp, w, src, dst, other).

    Exposed so tests/test_plan_regressions.py can pin the per-round
    plan (bounded exchanges, no cartesian product): the loop below
    runs exactly this lineage between localCheckpoints, so the pinned
    shape IS the per-round cost at any scale."""
    ls = labels.select(F.col("vid").alias("src"), F.col("comp").alias("cs"))
    ld = labels.select(F.col("vid").alias("dst"), F.col("comp").alias("cd"))
    live = e.join(ls, "src").join(ld, "dst").filter(F.col("cs") != F.col("cd"))
    sym = live.select(
        F.col("cs").alias("comp"), "w", "src", "dst", F.col("cd").alias("other")
    ).unionByName(
        live.select(
            F.col("cd").alias("comp"), "w", "src", "dst", F.col("cs").alias("other")
        )
    )
    win = Window.partitionBy("comp").orderBy("w", "src", "dst")
    return sym.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") == 1)


def _boruvka_msf(
    edges: DataFrame, vertices: DataFrame | None, max_rounds: int
) -> DataFrame:
    spark = edges.sparkSession
    e = normalize_edges(edges).localCheckpoint(eager=True)
    if vertices is None:
        vertices = (
            e.select(F.col("src").alias("vid"))
            .unionByName(e.select(F.col("dst").alias("vid")))
            .distinct()
        )
    labels = vertices.select("vid", F.col("vid").alias("comp")).localCheckpoint(
        eager=True
    )

    forest_parts: list[DataFrame] = []
    for _ in range(max_rounds):
        sel = nomination_lineage(e, labels).localCheckpoint(eager=True)
        if sel.isEmpty():  # no cross-component edge left anywhere
            break
        forest_parts.append(sel.select("src", "dst", "w").distinct())

        # contract: components joined by nominated edges merge.  The
        # merge graph has one node per live component (≥ halves each
        # round) and ≤1 nominated edge per node — min-label CC over it
        # reuses the engine's own kernel.
        comp_edges = sel.select(
            F.col("comp").alias("src"),
            F.col("other").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        merged = connected_components(
            comp_edges, vertices=sel.select(F.col("comp").alias("vid")).distinct()
        ).select(F.col("vid").alias("comp"), F.col("component").alias("newc"))
        labels = (
            labels.join(merged, "comp", "left")
            .select("vid", F.coalesce("newc", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"boruvka_msf did not converge in {max_rounds} rounds")

    if not forest_parts:
        return spark.createDataFrame([], e.schema)
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.unionByName(p)
    return out.distinct().localCheckpoint(eager=True)
