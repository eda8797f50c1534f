"""Greedy graph coloring — Jones–Plassmann deterministic-priority rounds.

Jones & Plassmann (1993): each round every uncolored vertex draws a
priority; a vertex beating all uncolored neighbors colors itself with
the minimum color absent from its already-colored neighborhood (the
"mex"). Winners of one round are pairwise non-adjacent (strict-minimum
argument, as in Luby MIS — graph/mis.py), so the coloring is proper;
with per-round rehash the schedule finishes in O(log n) rounds w.h.p.
Colors used ≤ degeneracy-ish greedy bound (≤ Δ+1 always). Coloring is
THE conflict-free scheduling primitive over an edge table — register
allocation, parallel sweep ordering, mutual-exclusion batching — and
the single-node reference has nothing like it (its Neo4j layer serves
lookups, not fixpoints).

Determinism contract (cross-engine, float-free): the round-r priority
is the MIS kernel's injective Lehmer hash ``q_r(v)`` verbatim
(mis.py:45-53 — folded 23-bit hash, vid packed in the low 40 bits),
and the mex is a fold over the sorted distinct neighbor colors — both
exactly replayable in the DuckDB recursive-CTE oracle
(operators/graphq.py), which carries vertex cards + the symmetric
adjacency and computes winner flags and the mex with stacked window
functions over that one working set.

Scale posture: adjacency hash-partitioned on ``src`` once and
persisted (it never shrinks — colored vertices keep serving their
color to neighbors); each round is the MIS winner plan (two semi-joins
+ neighbor-min groupBy) plus one winner-keyed neighbor-color groupBy
for the mex. Colored rows accumulate via per-round localCheckpoint;
the driver sees only scalar counts.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citation_graph_spark.checkpointing import CheckpointManager
from citation_graph_spark.graph.degrees import auto_partitions, undirect
from citation_graph_spark.graph.mis import mis_round_lineage
from citation_graph_spark.metrics import MetricsLogger
from citation_graph_spark.session import (
    iterative_kernel_conf,
    shuffle_partitions_conf,
)

# mex of a sorted ascending distinct color array: first gap, else size
_MEX_FOLD = (
    "aggregate(cs, cast(0 as bigint),"
    " (acc, c) -> if(c = acc, acc + cast(1 as bigint), acc))"
)


def greedy_coloring(
    edges: DataFrame,
    max_iter: int = 100,
    num_partitions: int | None = None,
    metrics_path: str | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 4,
    resume: bool = False,
) -> DataFrame:
    """Returns ``(vid, color, color_round)`` over the edge-derived
    vertex set: a proper coloring (no edge joins equal colors) that is
    exactly the greedy mex along the deterministic priority schedule.
    With a ``max_iter`` cap the result is the state after exactly that
    many synchronous rounds — still-uncolored vertices report
    ``color = -1, color_round = 0`` (which the SQL oracle mirrors).

    ``checkpoint_dir`` persists the colored set every
    ``checkpoint_interval`` rounds (CheckpointManager manifest);
    ``resume=True`` continues from the newest snapshot with the
    IDENTICAL final coloring — the uncolored frontier is exactly
    vertices-minus-colored and the schedule is a pure function of
    (vid, round), and the state is int64, so the parquet round-trip is
    exact by construction."""
    with iterative_kernel_conf(edges.sparkSession):
        return _coloring(
            edges,
            max_iter,
            num_partitions,
            metrics_path,
            checkpoint_dir,
            checkpoint_interval,
            resume,
        )


def _coloring(
    edges: DataFrame,
    max_iter: int,
    num_partitions: int | None,
    metrics_path: str | None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 4,
    resume: bool = False,
) -> DataFrame:
    spark = edges.sparkSession
    metrics = MetricsLogger(metrics_path, "coloring")
    ckpt = (
        CheckpointManager(checkpoint_dir, "coloring")
        if checkpoint_dir
        else None
    )

    und0 = undirect(edges).select("src", "dst").persist()
    n_sym = und0.count()
    if num_partitions is None:
        num_partitions = auto_partitions(spark, n_sym)
    e = und0.repartition(num_partitions, "src").persist()
    e.count()
    und0.unpersist()

    verts = (
        e.select(F.col("src").alias("vid"))
        .distinct()
        .repartition(num_partitions, "vid")
        .localCheckpoint(eager=True)
    )
    colored = spark.createDataFrame(
        [], "vid long, color long, color_round long"
    )
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load(spark)
        if loaded is not None:
            saved, manifest = loaded
            start_iter = manifest["iteration"]
            colored = saved.repartition(num_partitions, "vid")
    colored = colored.localCheckpoint(eager=True)
    active = verts.join(colored, "vid", "left_anti").repartition(
        num_partitions, "vid"
    ).localCheckpoint(eager=True)
    n_active = active.count()

    with shuffle_partitions_conf(spark, num_partitions):
        for it in range(start_iter + 1, max_iter + 1):
            if n_active == 0:
                break
            t0 = time.monotonic()
            winners = mis_round_lineage(e, active, it).localCheckpoint(
                eager=True
            )
            # mex over already-colored neighbors of each winner
            nb_colors = (
                e.join(
                    winners.select(F.col("vid").alias("src")),
                    "src",
                    "left_semi",
                )
                .join(
                    colored.select(F.col("vid").alias("dst"), "color"),
                    "dst",
                )
                .groupBy("src")
                .agg(F.sort_array(F.collect_set("color")).alias("cs"))
                .select(
                    F.col("src").alias("vid"),
                    F.expr(_MEX_FOLD).alias("mex"),
                )
            )
            won = winners.join(nb_colors, "vid", "left").select(
                "vid",
                F.coalesce("mex", F.lit(0)).cast("long").alias("color"),
                F.lit(it).cast("long").alias("color_round"),
            )
            colored = colored.unionByName(won)
            colored = colored.repartition(
                num_partitions, "vid"
            ).localCheckpoint(eager=True)
            active = (
                active.join(winners, "vid", "left_anti")
                .repartition(num_partitions, "vid")
                .localCheckpoint(eager=True)
            )
            n_next = active.count()
            metrics.log(
                it,
                winners=n_active - n_next,
                active=n_next,
                wall_s=round(time.monotonic() - t0, 4),
            )
            n_active = n_next
            if ckpt and (
                it % checkpoint_interval == 0 or n_active == 0
            ):
                ckpt.save(colored, it, {"n_active": n_active})

    return verts.join(colored, "vid", "left").select(
        "vid",
        F.coalesce("color", F.lit(-1)).cast("long").alias("color"),
        F.coalesce("color_round", F.lit(0)).cast("long").alias("color_round"),
    )
