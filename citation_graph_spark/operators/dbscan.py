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

The ε-join is PLUGGABLE: ``candidates`` picks the pair source — the
all-pairs crossJoin correctness baseline, the IVF shared-inverted-list
candidate generator proven by dedup_embedding_ivf (exact integer dist²
verify keeps precision at 1.0; blocking only costs recall), any
caller-supplied (v1, v2) blocking DataFrame, or ``"auto"`` (the
default: all-pairs below ``auto_threshold`` rows, IVF above). Steps
2-5 are all linear joins/aggs over the pair table and the O(diameter)
component rounds, so at 100 TB the candidate generator is the only
piece that changes — and it now actually does.
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

# above this many vectors, "auto" swaps the all-pairs ε-join for IVF
# bucketed candidates (the crossJoin is quadratic; IVF is the scale
# path with a measured recall trade, tests/test_dbscan.py)
_AUTO_ALLPAIRS_MAX = 100_000

# probes for the ε-graph blocking: the ε radius spans several coarse
# cells (unlike the near-identical cosine band dedup probes with
# nprobe=2), so the density queries probe 4 lists — measured recall on
# the exact ε-graph: 0.64 @ nprobe=2 → 0.98 @ nprobe=4 at both fixture
# scales; still sub-quadratic (nprobe²·n²/k with k grown ~√n)
_IVF_NPROBE_EPS = 4


def eps_pairs(
    emb: DataFrame,
    eps2: int = _EPS2,
    candidates: DataFrame | str = "auto",
    auto_threshold: int = _AUTO_ALLPAIRS_MAX,
    nprobe: int = _IVF_NPROBE_EPS,
    keep_dist2: bool = False,
) -> DataFrame:
    """Symmetric ε-neighborhood pairs (v1, v2[, dist2]), dist² ≤ eps².

    ``candidates``: ``"all_pairs"`` (exact crossJoin baseline —
    quadratic, correctness only), ``"ivf"`` (shared-inverted-list
    blocking from dedup.ivf_candidate_pairs; needs a ``label`` column
    to seed the coarse quantizer), ``"auto"`` (all_pairs below
    ``auto_threshold`` rows, ivf above), or a DataFrame of unordered
    candidate pairs (v1, v2) from any blocking scheme. Every candidate
    is exact-integer verified, so a blocked source only trades recall.

    ``"auto"`` decides with one count() job at call time — at corpus
    scale pass an explicit mode (registered queries pin theirs: the
    oracle-backed baselines are ``"all_pairs"`` so engine and exact
    oracle can never diverge, the ``_ivf`` variants are the scale
    path). Caller-supplied candidate DataFrames are deduplicated and
    self-pair-filtered after the symmetric closure, so duplicated or
    bidirectional blocking output cannot inflate neighbor counts."""
    external_candidates = not isinstance(candidates, str)
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

    if isinstance(candidates, str):
        if candidates == "auto":
            candidates = "all_pairs" if emb.count() <= auto_threshold else "ivf"
        if candidates == "all_pairs":
            out = (
                a.crossJoin(b)
                .filter(F.col("v1") != F.col("v2"))
                .withColumn("dist2", dist2)
                .filter(F.col("dist2") <= eps2)
            )
            return out.select("v1", "v2", "dist2") if keep_dist2 else out.select("v1", "v2")
        if candidates == "ivf":
            from citation_graph_spark.operators.dedup import ivf_candidate_pairs

            candidates = ivf_candidate_pairs(
                emb.select("vec_id", "label", F.expr(QUANT_MILLI).alias("qv")),
                nprobe,
            )
        else:
            raise ValueError(f"unknown candidates mode: {candidates!r}")

    # unordered candidate pairs → symmetric closure → exact verify
    sym = candidates.select("v1", "v2").unionByName(
        candidates.select(F.col("v2").alias("v1"), F.col("v1").alias("v2"))
    )
    if external_candidates:
        # a caller's blocking scheme may emit duplicates, both
        # orientations, or self-pairs; any of those would double-count
        # ε-neighbors downstream (degree → core status → clusters).
        # The internal IVF source already emits distinct v1 < v2 pairs.
        sym = sym.filter(F.col("v1") != F.col("v2")).distinct()
    out = (
        sym.join(a, "v1")
        .join(b, "v2")
        .withColumn("dist2", dist2)
        .filter(F.col("dist2") <= eps2)
    )
    return out.select("v1", "v2", "dist2") if keep_dist2 else out.select("v1", "v2")


def dbscan_assign(
    emb: DataFrame,
    eps2: int = _EPS2,
    min_samples: int = _MIN_SAMPLES,
    candidates: DataFrame | str = "auto",
    auto_threshold: int = _AUTO_ALLPAIRS_MAX,
    nprobe: int = _IVF_NPROBE_EPS,
) -> DataFrame:
    """(vec_id, embedding) → (vec_id, cluster); cluster = -1 is noise."""
    q = emb.select(
        "vec_id",
        F.expr(QUANT_MILLI).alias("qv"),
    )
    pairs = eps_pairs(emb, eps2, candidates, auto_threshold, nprobe).persist()

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


# ---- shared DuckDB CTE text: the DBSCAN steps over a ``pairs`` ε-pair
# CTE and an ``n(vec_id, qv, nrm)`` CTE — ONE spec for the all-pairs and
# every blocked variant (only the candidate CTEs upstream differ)
def _dbscan_steps_sql(min_samples: int) -> str:
    return f"""
    deg AS (SELECT v1, count(*) AS nbrs FROM pairs GROUP BY v1),
    core AS (
      SELECT n.vec_id FROM n LEFT JOIN deg ON n.vec_id = deg.v1
      WHERE coalesce(deg.nbrs, 0) + 1 >= {min_samples}
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
    """


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
    {_dbscan_steps_sql(_MIN_SAMPLES)}
    """,
)
def dbscan_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN assignment for every embedding, vs a DuckDB oracle that
    runs the identical deterministic spec (ε-join → core degree →
    reachability-CTE components → min-border-attach → noise)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    # pinned: the oracle is exact all-pairs, so the engine side must be
    # too at every scale — "auto" would silently route to IVF blocking
    # above its threshold and diverge from the gate's oracle; the
    # blocked scale path is the separate dbscan_embedding_ivf query
    return dbscan_assign(emb, candidates="all_pairs")


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
    # pinned exact for the same reason as dbscan_embedding
    return dbscan_assign(emb, min_samples=1, candidates="all_pairs")


# ---- blocked (sub-quadratic) variants: same DBSCAN spec, IVF candidates
def _ivf_q_cte() -> str:
    return """q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> cast(floor(cast(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
      FROM embeddings
    )"""


def _ivf_eps_oracle(eps2: int, min_samples: int) -> str:
    from citation_graph_spark.operators.dedup import ivf_cand_ctes

    return f"""
    WITH RECURSIVE {_ivf_q_cte()},
    {ivf_cand_ctes(_IVF_NPROBE_EPS)},
    n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nrm FROM q),
    sym AS (
      SELECT v1, v2 FROM cand
      UNION ALL
      SELECT v2 AS v1, v1 AS v2 FROM cand
    ),
    pairs AS (
      SELECT s.v1, s.v2
      FROM sym s JOIN n a ON s.v1 = a.vec_id JOIN n b ON s.v2 = b.vec_id
      WHERE a.nrm + b.nrm - 2 * list_dot_product(a.qv, b.qv) <= {eps2}
    ),
    {_dbscan_steps_sql(min_samples)}
    """


@register("dbscan_embedding_ivf", oracle=_ivf_eps_oracle(_EPS2, _MIN_SAMPLES))
def dbscan_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the IVF-blocked ε-graph — the 100 TB path for what
    ``dbscan_embedding`` proves by brute force: candidate pairs from
    shared inverted lists (dedup.ivf_candidate_pairs — the generator
    already gate-proven by dedup_embedding_ivf), exact integer dist²
    verify, then the identical core/component/border/noise steps. The
    DuckDB oracle replays the same blocking, so this row checks the
    blocked pipeline end-to-end; the recall trade vs the exact ε-graph
    is pinned separately in tests/test_dbscan.py."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return dbscan_assign(emb, candidates="ivf")


@register("single_linkage_embedding_ivf", oracle=_ivf_eps_oracle(_EPS2, 1))
def single_linkage_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-linkage cut over the IVF-blocked ε-graph (min_samples=1:
    every point core, no noise) — the scale path for
    ``single_linkage_embedding``, same shared blocking + oracle spec."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return dbscan_assign(emb, min_samples=1, candidates="ivf")
