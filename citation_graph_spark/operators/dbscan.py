"""Distributed DBSCAN over the embeddings table.

Reference parity: clustering/dbscan.py runs sklearn DBSCAN on the
whole embedding dict in driver memory (dbscan.py:39-46) and scores it.
Here the same density clustering is a composition of the engine's own
distributed pieces — an ε-neighborhood join, a degree aggregate, and
``connected_components`` over the core-core graph:

1. ε-join: pairs with squared euclidean distance ≤ eps² on
   milli-quantized integer vectors (dist² = |a|² + |b|² − 2a·b — all
   int64, exact cross-engine);
2. core points: ≥ min_samples points (self included) inside ε;
3. clusters: connected components of core points under ε-adjacency
   (cluster id = min core vec_id — deterministic);
4. border points attach to the MIN cluster id among their core
   neighbors (sklearn assigns border points to whichever core claims
   them first, an explicitly order-dependent choice; min is the
   order-insensitive determinization, per SURVEY §7.2(c));
5. everything else is noise, cluster = -1.

The ε-join here is the all-pairs correctness baseline (the gate-scale
embeddings table is 500 vectors); the sub-quadratic scale path is the
same IVF bucket candidate generation used by dedup_embedding_ivf —
candidates from shared inverted lists, exact integer dist² verify.
Steps 2-5 are all linear joins/aggs over the pair table and the
O(diameter) component rounds, so at 100 TB the candidate generator is
the only piece that changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citation_graph_spark.graph import connected_components
from citation_graph_spark.operators import register
from citation_graph_spark.operators.clustering import (
    DOT_BIGINT as _DOT,
    QUANT_MILLI,
)
from citation_graph_spark.tables import load_tables

# eps² in milli-quantized units; min_samples counts the point itself.
# Chosen on the synthetic embeddings so the density structure is real:
# 10 clusters / 139 noise / 165 core of 500 at sf0.01 — matching the
# fixture's 10 generating labels.
_EPS2 = 1_350_000
_MIN_SAMPLES = 4


def dbscan_assign(
    emb: DataFrame,
    eps2: int = _EPS2,
    min_samples: int = _MIN_SAMPLES,
) -> DataFrame:
    """(vec_id, embedding) → (vec_id, cluster); cluster = -1 is noise."""
    q = emb.select(
        "vec_id",
        F.expr(QUANT_MILLI).alias("qv"),
    ).withColumn("nrm", F.expr(_DOT.format(a="qv", b="qv")))

    a = q.select(
        F.col("vec_id").alias("v1"), F.col("qv").alias("qa"), F.col("nrm").alias("na")
    )
    b = q.select(
        F.col("vec_id").alias("v2"), F.col("qv").alias("qb"), F.col("nrm").alias("nb")
    )
    dist2 = F.col("na") + F.col("nb") - 2 * F.expr(_DOT.format(a="qa", b="qb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("v1") != F.col("v2"))
        .withColumn("dist2", dist2)
        .filter(F.col("dist2") <= eps2)
        .select("v1", "v2")
        .persist()
    )

    deg = pairs.groupBy("v1").agg(F.count(F.lit(1)).alias("nbrs"))
    core = (
        q.select("vec_id")
        .join(deg, q["vec_id"] == deg["v1"], "left")
        .filter(F.coalesce(F.col("nbrs"), F.lit(0)) + 1 >= min_samples)
        .select("vec_id")
        .persist()
    )

    core_edges = (
        pairs.join(core.select(F.col("vec_id").alias("v1")), "v1", "left_semi")
        .join(core.select(F.col("vec_id").alias("v2")), "v2", "left_semi")
        .filter(F.col("v1") < F.col("v2"))
        .select(
            F.col("v1").alias("src"),
            F.col("v2").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    comp = connected_components(
        core_edges, vertices=core.select(F.col("vec_id").alias("vid"))
    ).select(F.col("vid").alias("vec_id"), F.col("component").alias("cluster"))

    border = (
        pairs.join(core.select(F.col("vec_id").alias("v1")), "v1", "left_anti")
        .join(
            comp.select(
                F.col("vec_id").alias("v2"), F.col("cluster").alias("c2")
            ),
            "v2",
        )
        .groupBy("v1")
        .agg(F.min("c2").alias("cluster"))
        .select(F.col("v1").alias("vec_id"), "cluster")
    )

    assigned = comp.unionByName(border)
    noise = (
        q.select("vec_id")
        .join(assigned.select("vec_id"), "vec_id", "left_anti")
        .withColumn("cluster", F.lit(-1).cast("long"))
    )
    # materialize while pairs/core are still cached — unpersisting
    # first would recompute the ε cross-join on every downstream action
    out = assigned.unionByName(noise).localCheckpoint(eager=True)
    pairs.unpersist()
    core.unpersist()
    return out


@register(
    "dbscan_embedding",
    oracle=f"""
    WITH RECURSIVE q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> cast(floor(cast(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
      FROM embeddings
    ),
    n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nrm FROM q),
    pairs AS (
      SELECT a.vec_id AS v1, b.vec_id AS v2
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
      WHERE a.nrm + b.nrm - 2 * list_dot_product(a.qv, b.qv) <= {_EPS2}
    ),
    deg AS (SELECT v1, count(*) AS nbrs FROM pairs GROUP BY v1),
    core AS (
      SELECT n.vec_id FROM n LEFT JOIN deg ON n.vec_id = deg.v1
      WHERE coalesce(deg.nbrs, 0) + 1 >= {_MIN_SAMPLES}
    ),
    ce AS (
      SELECT p.v1, p.v2 FROM pairs p
      WHERE p.v1 IN (SELECT vec_id FROM core)
        AND p.v2 IN (SELECT vec_id FROM core)
    ),
    reach(v, l) AS (
      SELECT vec_id, vec_id FROM core
      UNION
      SELECT ce.v2, reach.l FROM reach JOIN ce ON reach.v = ce.v1
    ),
    comp AS (SELECT v AS vec_id, min(l) AS cluster FROM reach GROUP BY v),
    border AS (
      SELECT p.v1 AS vec_id, min(c.cluster) AS cluster
      FROM pairs p JOIN comp c ON p.v2 = c.vec_id
      WHERE p.v1 NOT IN (SELECT vec_id FROM core)
      GROUP BY p.v1
    ),
    assigned AS (
      SELECT * FROM comp UNION ALL SELECT * FROM border
    )
    SELECT vec_id, cluster FROM assigned
    UNION ALL
    SELECT vec_id, cast(-1 AS BIGINT) AS cluster FROM n
    WHERE vec_id NOT IN (SELECT vec_id FROM assigned)
    """,
)
def dbscan_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN assignment for every embedding, vs a DuckDB oracle that
    runs the identical deterministic spec (ε-join → core degree →
    reachability-CTE components → min-border-attach → noise)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return dbscan_assign(emb)


@register(
    "single_linkage_embedding",
    oracle=f"""
    WITH RECURSIVE q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> cast(floor(cast(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
      FROM embeddings
    ),
    n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nrm FROM q),
    pairs AS (
      SELECT a.vec_id AS v1, b.vec_id AS v2
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
      WHERE a.nrm + b.nrm - 2 * list_dot_product(a.qv, b.qv) <= {_EPS2}
    ),
    reach(v, l) AS (
      SELECT vec_id, vec_id FROM n
      UNION
      SELECT pairs.v2, reach.l FROM reach JOIN pairs ON reach.v = pairs.v1
    )
    SELECT v AS vec_id, min(l) AS cluster FROM reach GROUP BY v
    """,
)
def single_linkage_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat single-linkage agglomerative clustering at distance cutoff
    eps — reference clustering/agglomerative.py parity for the one
    linkage that distributes honestly: cutting a single-linkage
    dendrogram at threshold t IS connected components of the
    ε-threshold graph, so this is ``dbscan_assign`` with
    ``min_samples=1`` (every point core, no noise). Complete/ward
    linkage are inherently sequential merges and stay out of scope
    (COVERAGE.md)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return dbscan_assign(emb, min_samples=1)
