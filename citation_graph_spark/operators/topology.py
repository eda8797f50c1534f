"""Graph-topology queries: citation generations (SCC-condensation DAG
layering), deterministic random walks, degree assortativity, the exact
neighborhood function, and its HyperBall scale path.

These extend the bibliometrics pack (operators/bibliometrics.py) with
the structural questions a citation-graph owner asks next — "how deep
do citation chains run", "how far does influence reach", "do
well-cited modules cite well-cited modules" — over the SAME extracted
corpus edge table the north-rule kernels run on, each hash-checked
against a DuckDB oracle that re-derives the pipeline from the raw
documents parquet (the corpus_* oracle discipline of
operators/graphq.py).

Reference parity anchors (public reference repo, cited file:line):
- generations: the reference's timeview perspective orders papers by
  citation depth/era (perspectives/timeview_perspective.json); the SCC
  condensation is the only well-defined depth on a cyclic module graph
  (corpus_scc's docstring).
- walks: the Bloom scene "expand from this node" chain
  (bloom/perspective.json) generalized to batch embedding-corpus prep.
- neighborhood function / HyperBall: batch generalization of the
  interactive k-hop fan-out (neo4j/loader.py relationship expansion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from citation_graph_spark.graph import strongly_connected_components, undirect
from citation_graph_spark.graph.anf import exact_balls, hyperball
from citation_graph_spark.graph.louvain import louvain_local_moves
from citation_graph_spark.graph.wl import WL_C1, WL_C2, WL_C3, WL_P, wl_refinement
from citation_graph_spark.graph.walks import (
    WALK_HASH_A,
    WALK_HASH_B,
    WALK_HASH_C,
    WALK_HASH_P,
    deterministic_walks,
    neighbor_sample,
)
from citation_graph_spark.operators import register
from citation_graph_spark.operators.graphq import (
    _CORPUS_CTE,
    _GRAPH_CTE,
    corpus_tables,
    part_graph_edges,
)

_WALK_STEPS = 6
_WALK_SEED_MOD = 37
_BALL_RADIUS = 3
# the SQL twin of range(_BALL_RADIUS + 1) — interpolated so a radius
# bump can never desync the oracle's radii from the Spark side's
_RADII_VALUES = ", ".join(f"({r})" for r in range(_BALL_RADIUS + 1))
_LOUVAIN_ROUNDS = 2

# SCC of the corpus graph as max-vid labels — the same derivation the
# corpus_scc oracle uses (transitive closure + mutual-reachability)
_SCC_CTE = """
    ced AS (SELECT DISTINCT src, dst FROM cedges),
    reach(v, w) AS (
      SELECT src, dst FROM ced
      UNION
      SELECT r.v, e.dst FROM reach r JOIN ced e ON r.w = e.src
    ),
    mutual AS (
      SELECT a.v AS v, a.w AS w
      FROM reach a JOIN reach b ON a.v = b.w AND a.w = b.v
    ),
    sccm AS (
      SELECT vt.vid, greatest(vt.vid, coalesce(max(m.w), vt.vid)) AS scc
      FROM verts vt LEFT JOIN mutual m ON vt.vid = m.v
      GROUP BY vt.vid
    )
"""


def generation_relax_lineage(q: DataFrame, gen: DataFrame) -> DataFrame:
    """One longest-path relaxation round over condensation edges
    ``q(csrc, cdst)`` and current ``gen(c, generation)`` — equi-join,
    grouped max, left-join merge. Exposed for the plan-regression
    suite and the micro-graph pytest replay."""
    msg = (
        q.join(gen, q["csrc"] == gen["c"])
        .groupBy(F.col("cdst").alias("c"))
        .agg((F.max("generation") + 1).alias("up"))
    )
    return gen.join(msg, "c", "left").select(
        "c",
        F.greatest(
            F.col("generation"), F.coalesce(F.col("up"), F.lit(0))
        ).alias("generation"),
    )


# --------------------------------------------------------------------------
@register(
    "corpus_generations",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_CTE},
    {_SCC_CTE},
    q AS (SELECT DISTINCT s1.scc AS csrc, s2.scc AS cdst
          FROM ced e JOIN sccm s1 ON e.src = s1.vid
                     JOIN sccm s2 ON e.dst = s2.vid
          WHERE s1.scc <> s2.scc),
    comps AS (SELECT DISTINCT scc AS c FROM sccm),
    g(c, d) AS (
      SELECT c, 0 FROM comps WHERE c NOT IN (SELECT cdst FROM q)
      UNION
      SELECT q.cdst, g.d + 1 FROM g JOIN q ON g.c = q.csrc
    ),
    cg AS (SELECT c, max(d) AS generation FROM g GROUP BY c)
    SELECT s.vid, cg.generation
    FROM sccm s JOIN cg ON s.scc = cg.c
    """,
)
def corpus_generations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Citation generations: longest-path layering of the SCC
    condensation DAG — generation 0 is the set of source components
    (cited-by-construction roots), generation g cites only earlier
    generations plus at least one at g-1. Engine: SCC kernel
    (graph/scc.py) → quotient edges → monotone max-relaxation to
    fixpoint (depth-bounded rounds, per-round localCheckpoint). Oracle:
    transitive-closure SCC + UNION-dedup recursive longest path —
    a fully independent derivation."""
    vertices, edges = corpus_tables(spark)
    e = edges.select("src", "dst").distinct()
    scc = strongly_connected_components(e, vertices.select("vid"))

    q = (
        e.join(
            scc.select(F.col("vid").alias("src"), F.col("scc").alias("csrc")),
            "src",
        )
        .join(
            scc.select(F.col("vid").alias("dst"), F.col("scc").alias("cdst")),
            "dst",
        )
        .filter(F.col("csrc") != F.col("cdst"))
        .select("csrc", "cdst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    gen = (
        scc.select(F.col("scc").alias("c"))
        .distinct()
        .withColumn("generation", F.lit(0))
        .localCheckpoint(eager=True)
    )
    # longest-path relaxation on the condensation DAG: gen(v) =
    # max(gen(v), 1 + max over predecessors) until fixpoint; the DAG
    # guarantees convergence within its depth
    for _ in range(10_000):
        new = generation_relax_lineage(q, gen).localCheckpoint(eager=True)
        changed = (
            new.alias("n")
            .join(gen.alias("o"), "c")
            .filter(F.col("n.generation") != F.col("o.generation"))
            .isEmpty()
        )
        gen = new
        if changed:
            break
    return (
        scc.join(gen, scc["scc"] == gen["c"])
        .select("vid", "generation")
    )


# --------------------------------------------------------------------------
@register(
    "corpus_random_walks",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_CTE},
    ced AS (SELECT DISTINCT src, dst FROM cedges),
    wk(wid, step, v) AS (
      SELECT vid, 0, vid FROM verts WHERE vid % {_WALK_SEED_MOD} = 0
      UNION ALL
      SELECT wid, step, v FROM (
        SELECT w.wid, w.step + 1 AS step, e.dst AS v,
               row_number() OVER (
                 PARTITION BY w.wid
                 ORDER BY (w.v * {WALK_HASH_A}
                           + (w.step + 1) * {WALK_HASH_B}
                           + e.dst * {WALK_HASH_C}) % {WALK_HASH_P},
                          e.dst) AS rn
        FROM wk w JOIN ced e ON w.v = e.src
        WHERE w.step < {_WALK_STEPS}
      ) WHERE rn = 1
    )
    SELECT wid, step, v AS vid FROM wk
    """,
)
def corpus_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derandomized random-walk corpus (graph/walks.py) from every
    37th vertex, 6 steps, vs a recursive-CTE oracle replaying the
    identical hash-argmin next-step rule."""
    vertices, edges = corpus_tables(spark)
    seeds = vertices.select("vid").filter(
        F.col("vid") % _WALK_SEED_MOD == 0
    )
    return deterministic_walks(
        edges.select("src", "dst"), seeds, steps=_WALK_STEPS
    )


# --------------------------------------------------------------------------
_NS_FANOUTS = [4, 2]
_NS_SEED_MOD = 50


@register(
    "corpus_neighbor_sample",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_CTE},
    ced AS (SELECT DISTINCT src, dst FROM cedges),
    sd AS (SELECT vid AS seed FROM verts WHERE vid % {_NS_SEED_MOD} = 0),
    s1 AS (SELECT src, dst FROM (
        SELECT src, dst, row_number() OVER (
            PARTITION BY src
            ORDER BY (src * {WALK_HASH_A} + 1 * {WALK_HASH_B}
                      + dst * {WALK_HASH_C}) % {WALK_HASH_P}, dst) AS rn
        FROM ced) t WHERE rn <= {_NS_FANOUTS[0]}),
    s2 AS (SELECT src, dst FROM (
        SELECT src, dst, row_number() OVER (
            PARTITION BY src
            ORDER BY (src * {WALK_HASH_A} + 2 * {WALK_HASH_B}
                      + dst * {WALK_HASH_C}) % {WALK_HASH_P}, dst) AS rn
        FROM ced) t WHERE rn <= {_NS_FANOUTS[1]}),
    h1 AS (SELECT sd.seed, 1 AS hop, s1.src, s1.dst
           FROM sd JOIN s1 ON s1.src = sd.seed),
    f1 AS (SELECT DISTINCT seed, dst AS v FROM h1),
    h2 AS (SELECT f1.seed, 2 AS hop, s2.src, s2.dst
           FROM f1 JOIN s2 ON s2.src = f1.v)
    SELECT * FROM h1 UNION ALL SELECT * FROM h2
    """,
)
def corpus_neighbor_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style deterministic 2-hop neighbor sampling
    (graph/walks.py neighbor_sample) with fanouts [4, 2] from every
    50th vertex — the GNN minibatch-subgraph prep primitive, vs an
    oracle replaying the identical per-(vertex, hop) hash-ranked
    sample and frontier joins."""
    vertices, edges = corpus_tables(spark)
    seeds = vertices.select("vid").filter(
        F.col("vid") % _NS_SEED_MOD == 0
    )
    return neighbor_sample(
        edges.select("src", "dst"), seeds, fanouts=_NS_FANOUTS
    )


# --------------------------------------------------------------------------
@register(
    "corpus_assortativity",
    oracle=f"""
    WITH {_CORPUS_CTE},
    deg AS (SELECT src AS vid, count(*) AS d FROM csym GROUP BY src),
    je AS (SELECT ds.d AS j, dt.d AS k
           FROM csym e JOIN deg ds ON e.src = ds.vid
                       JOIN deg dt ON e.dst = dt.vid),
    s AS (SELECT count(*) AS m_edges, sum(j * k) AS sjk,
                 sum(j) AS s1, sum(j * j) AS s2
          FROM je)
    SELECT m_edges,
           cast(floor(
             ((cast(m_edges AS DOUBLE) * cast(sjk AS DOUBLE)
                 - cast(s1 AS DOUBLE) * cast(s1 AS DOUBLE))
              / (cast(m_edges AS DOUBLE) * cast(s2 AS DOUBLE)
                 - cast(s1 AS DOUBLE) * cast(s1 AS DOUBLE)))
             * 1000000000 + 0.5) AS BIGINT) AS r_nano
    FROM s
    """,
)
def corpus_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002 Pearson form) of the
    undirected citation graph: integer moment sums distributed, one
    identical double expression on both engines, quantized at 1e-9.
    Positive r = hubs cite hubs; citation/web graphs are typically
    disassortative."""
    _, edges = corpus_tables(spark)
    sym = undirect(edges.select("src", "dst"))
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("d")
    )
    je = (
        sym.join(deg.select(F.col("vid").alias("src"), F.col("d").alias("j")), "src")
        .join(deg.select(F.col("vid").alias("dst"), F.col("d").alias("k")), "dst")
        .select("j", "k")
    )
    s = je.agg(
        F.count(F.lit(1)).alias("m_edges"),
        F.sum(F.col("j") * F.col("k")).alias("sjk"),
        F.sum("j").alias("s1"),
        F.sum(F.col("j") * F.col("j")).alias("s2"),
    )
    md = F.col("m_edges").cast("double")
    s1d = F.col("s1").cast("double")
    num = md * F.col("sjk").cast("double") - s1d * s1d
    den = md * F.col("s2").cast("double") - s1d * s1d
    return s.select(
        "m_edges",
        F.floor(num / den * 1000000000 + F.lit(0.5))
        .cast("long")
        .alias("r_nano"),
    )


# --------------------------------------------------------------------------
@register(
    "corpus_neighborhood_function",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_CTE},
    ced AS (SELECT DISTINCT src, dst FROM cedges),
    av AS (SELECT DISTINCT vid FROM (
        SELECT src AS vid FROM ced UNION ALL SELECT dst AS vid FROM ced)),
    reach(v, u, d) AS (
      SELECT vid, vid, 0 FROM av
      UNION
      SELECT r.v, e.dst, r.d + 1
      FROM reach r JOIN ced e ON r.u = e.src
      WHERE r.d < {_BALL_RADIUS}
    ),
    radii(r) AS (SELECT * FROM (VALUES {_RADII_VALUES}) t(r))
    SELECT reach.v AS vid, radii.r, count(DISTINCT reach.u) AS ball
    FROM reach JOIN radii ON reach.d <= radii.r
    GROUP BY 1, 2
    """,
)
def corpus_neighborhood_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact neighborhood function N(v, r) for r = 0..3
    over the directed citation graph (graph/anf.py exact_balls) vs a
    bounded-depth transitive-closure oracle. This is the CORRECTNESS
    twin of corpus_hyperball — quadratic state, oracle scale only."""
    _, edges = corpus_tables(spark)
    return exact_balls(edges.select("src", "dst"), radius=_BALL_RADIUS)


# --------------------------------------------------------------------------
@register("corpus_hyperball")  # rows-only: HLL estimates have no SQL twin;
# accuracy vs exact_balls is pinned in tests/test_topology.py
def corpus_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall (HLL-counter) approximate neighborhood function —
    the 100-TB path for corpus_neighborhood_function: O(n·m) state,
    O(E·m) rows per round, vertex id the only shuffle key
    (graph/anf.py hyperball docstring for the full account)."""
    _, edges = corpus_tables(spark)
    return hyperball(edges.select("src", "dst"), radius=_BALL_RADIUS, log2m=6)


# --------------------------------------------------------------------------
@register(
    "corpus_distance_distribution",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_CTE},
    ced AS (SELECT DISTINCT src, dst FROM cedges),
    av AS (SELECT DISTINCT vid FROM (
        SELECT src AS vid FROM ced UNION ALL SELECT dst AS vid FROM ced)),
    reach(v, u, d) AS (
      SELECT vid, vid, 0 FROM av
      UNION
      SELECT r.v, e.dst, r.d + 1
      FROM reach r JOIN ced e ON r.u = e.src
      WHERE r.d < {_BALL_RADIUS}
    ),
    radii(r) AS (SELECT * FROM (VALUES {_RADII_VALUES}) t(r)),
    per_r AS (
      SELECT radii.r AS r, count(*) AS pairs
      FROM (SELECT v, u, min(d) AS d FROM reach GROUP BY 1, 2) p
      JOIN radii ON p.d <= radii.r
      GROUP BY 1
    ),
    dist AS (
      SELECT r, pairs,
             pairs - coalesce(lag(pairs) OVER (ORDER BY r), 0)
               AS delta_pairs,
             -- floor, not CAST: DuckDB's double->BIGINT cast rounds
             -- half-away while Spark's cast truncates
             CAST(floor(pairs * 1000000000
               / (SELECT pairs FROM per_r WHERE r = {_BALL_RADIUS}))
               AS BIGINT) AS frac_nano
      FROM per_r
    )
    SELECT r, pairs, delta_pairs, frac_nano,
           r = (SELECT min(r) FROM dist WHERE frac_nano >= 900000000)
             AS is_eff_diam90
    FROM dist
    """,
)
def corpus_distance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance distribution of the directed citation graph for
    r = 0.._BALL_RADIUS (3): total reachable (v, u) pairs within r,
    new pairs at exactly r, cumulative fraction of the max-radius
    total (nano-quantized integer division — identical in both
    engines), and the interpolation-free effective-diameter flag
    (first r covering >= 90% of reachable pairs; Boldi & Vigna 2013
    §5, the headline statistic HyperBall exists to estimate). Exact
    twin at oracle scale: aggregates graph/anf.py exact_balls. The
    100-TB path is the SAME four-row aggregation over
    corpus_hyperball's per-vertex HLL estimates (sum of estimates
    replaces sum of exact balls; the shuffle key stays the radius)."""
    _, edges = corpus_tables(spark)
    balls = exact_balls(edges.select("src", "dst"), radius=_BALL_RADIUS)
    per_r = balls.groupBy("r").agg(F.sum("ball").alias("pairs"))
    w = Window.orderBy("r")
    total = per_r.filter(F.col("r") == _BALL_RADIUS).select("pairs")
    dist = (
        per_r.withColumn(
            "delta_pairs",
            F.col("pairs") - F.coalesce(F.lag("pairs").over(w), F.lit(0)),
        )
        # radius+1 rows: the scalar total broadcast-crossJoins for free
        .crossJoin(F.broadcast(total.select(F.col("pairs").alias("tp"))))
        .withColumn(
            "frac_nano",
            F.floor(F.col("pairs") * F.lit(1000000000) / F.col("tp")),
        )
    )
    eff = (
        dist.filter(F.col("frac_nano") >= 900000000)
        .agg(F.min("r").alias("eff_r"))
    )
    return (
        dist.crossJoin(F.broadcast(eff))
        .select(
            "r",
            "pairs",
            "delta_pairs",
            "frac_nano",
            (F.col("r") == F.col("eff_r")).alias("is_eff_diam90"),
        )
    )


# --------------------------------------------------------------------------
_WL_ROUNDS = 3


@register(
    "corpus_wl_refinement",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_CTE},
    deg AS (SELECT src AS vid, count(*) AS color FROM csym GROUP BY src),
    -- flagged self-loops: the single recursive reference delivers each
    -- vertex its OWN previous color through the same join (the
    -- corpus_pagerank oracle's trick)
    csym2 AS (SELECT src, dst, 0 AS own FROM csym
              UNION ALL SELECT vid, vid, 1 FROM deg),
    wl(it, vid, color) AS (
      SELECT 0, vid, color FROM deg
      UNION ALL
      SELECT x.it, x.vid, x.color FROM (
        SELECT w.it + 1 AS it, s.src AS vid,
               (max(CASE WHEN s.own = 1 THEN w.color END) * {WL_C1}
                + coalesce(sum(CASE WHEN s.own = 0
                               THEN (w.color * {WL_C2} + {WL_C3}) % {WL_P}
                               END), 0)) % {WL_P} AS color
        FROM wl w JOIN csym2 s ON w.vid = s.dst
        WHERE w.it < {_WL_ROUNDS}
        GROUP BY 1, 2
      ) x
    )
    SELECT vid, color FROM wl WHERE it = {_WL_ROUNDS}
    """,
)
def corpus_wl_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weisfeiler-Leman color refinement, 3 rounds from degree colors,
    on the undirected citation graph (graph/wl.py) — the WL-subtree
    structural feature per document, vs a recursive-CTE oracle
    replaying the identical order-insensitive integer hash."""
    _, edges = corpus_tables(spark)
    return wl_refinement(edges.select("src", "dst"), rounds=_WL_ROUNDS)


# --------------------------------------------------------------------------
def _louvain_round_sql(i: int) -> str:
    """One synchronous integer local-move round as SQL CTEs
    (lab{i-1} -> lab{i}) — the exact rule of graph/louvain.py."""
    p = i - 1
    return f"""
    vol{i} AS (SELECT l.c AS c, sum(d.d) AS vol
               FROM lab{p} l JOIN deg d ON l.vid = d.vid GROUP BY l.c),
    k{i} AS (SELECT s.src AS vid, l.c AS c, count(*) AS k
             FROM sym s JOIN lab{p} l ON s.dst = l.vid GROUP BY 1, 2),
    cand{i} AS (
      SELECT k.vid AS vid, k.c AS c,
             2 * (SELECT m FROM mm) * (k.k - coalesce(ko.k, 0))
               - d.d * (v.vol - vo.vol + d.d) AS score
      FROM k{i} k
        JOIN lab{p} o ON k.vid = o.vid
        LEFT JOIN k{i} ko ON ko.vid = k.vid AND ko.c = o.c
        JOIN deg d ON d.vid = k.vid
        JOIN vol{i} v ON v.c = k.c
        JOIN vol{i} vo ON vo.c = o.c
      WHERE k.c <> o.c
      UNION ALL
      SELECT vid, c, 0 FROM lab{p}
    ),
    lab{i} AS (
      SELECT vid, c FROM (
        SELECT vid, c,
               row_number() OVER (PARTITION BY vid
                                  ORDER BY score DESC, c) AS rn
        FROM cand{i}) WHERE rn = 1
    )"""


@register(
    "graph_part_louvain_move",
    oracle=f"""
    WITH {_GRAPH_CTE},
    deg AS (SELECT src AS vid, count(*) AS d FROM sym GROUP BY src),
    mm AS (SELECT count(*) AS m FROM edges),
    lab0 AS (SELECT vid, vid AS c FROM verts),
    {_louvain_round_sql(1)},
    {_louvain_round_sql(2)}
    SELECT vid, c AS community FROM lab{_LOUVAIN_ROUNDS}
    """,
)
def graph_part_louvain_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous Louvain local-move rounds
    (graph/louvain.py — exact-integer modularity gains, singleton
    start) on the part graph, vs an oracle replaying the identical
    integer rule round by round."""
    edges = part_graph_edges(spark, sf_dir).select("src", "dst")
    return louvain_local_moves(edges, rounds=_LOUVAIN_ROUNDS)


def _louvain_round_weighted_sql(i: int) -> str:
    """One weighted local-move round over the community quotient
    (qlab{i-1} -> qlab{i}) — sum(w) in place of count(*), total volume
    T in place of 2m (graph/louvain.py weighted path)."""
    p = i - 1
    return f"""
    qvol{i} AS MATERIALIZED (
      SELECT l.c AS c, sum(d.d) AS vol
      FROM qlab{p} l JOIN qdeg d ON l.vid = d.vid GROUP BY l.c),
    qk{i} AS MATERIALIZED (
      SELECT s.src AS vid, l.c AS c, sum(s.w) AS k
      FROM qsymw s JOIN qlab{p} l ON s.dst = l.vid GROUP BY 1, 2),
    qcand{i} AS MATERIALIZED (
      SELECT k.vid AS vid, k.c AS c,
             (SELECT t FROM qt) * (k.k - coalesce(ko.k, 0))
               - d.d * (v.vol - vo.vol + d.d) AS score
      FROM qk{i} k
        JOIN qlab{p} o ON k.vid = o.vid
        LEFT JOIN qk{i} ko ON ko.vid = k.vid AND ko.c = o.c
        JOIN qdeg d ON d.vid = k.vid
        JOIN qvol{i} v ON v.c = k.c
        JOIN qvol{i} vo ON vo.c = o.c
      WHERE k.c <> o.c
      UNION ALL
      SELECT vid, c, 0 FROM qlab{p}
    ),
    qlab{i} AS MATERIALIZED (
      SELECT vid, c FROM (
        SELECT vid, c,
               row_number() OVER (PARTITION BY vid
                                  ORDER BY score DESC, c) AS rn
        FROM qcand{i}) WHERE rn = 1
    )"""


@register(
    "graph_part_louvain_two_level",
    oracle=f"""
    WITH {_GRAPH_CTE},
    deg AS (SELECT src AS vid, count(*) AS d FROM sym GROUP BY src),
    mm AS (SELECT count(*) AS m FROM edges),
    lab0 AS (SELECT vid, vid AS c FROM verts),
    {_louvain_round_sql(1)},
    {_louvain_round_sql(2)},
    -- phase 2 of the Louvain method: contract the level-1 communities
    -- into a WEIGHTED quotient (self-loop = 2x intra count) and run
    -- the same integer rule with sum(w) and total volume T
    qle AS MATERIALIZED (
      SELECT la.c AS ca, lb.c AS cb
      FROM edges e
        JOIN lab{_LOUVAIN_ROUNDS} la ON la.vid = e.src
        JOIN lab{_LOUVAIN_ROUNDS} lb ON lb.vid = e.dst),
    qinter AS MATERIALIZED (
      SELECT least(ca, cb) AS src, greatest(ca, cb) AS dst,
             count(*) AS w
      FROM qle WHERE ca <> cb GROUP BY 1, 2),
    qintra AS MATERIALIZED (
      SELECT ca AS vid, 2 * count(*) AS sw
      FROM qle WHERE ca = cb GROUP BY ca),
    qsymw AS MATERIALIZED (
      SELECT src, dst, w FROM qinter
      UNION ALL SELECT dst, src, w FROM qinter),
    qdeg AS MATERIALIZED (
      SELECT coalesce(a.vid, b.vid) AS vid,
             coalesce(a.dw, 0) + coalesce(b.sw, 0) AS d
      FROM (SELECT src AS vid, sum(w) AS dw FROM qsymw GROUP BY src) a
        FULL JOIN qintra b ON a.vid = b.vid),
    qt AS (SELECT sum(d) AS t FROM qdeg),
    qlab0 AS (SELECT vid, vid AS c FROM qdeg),
    {_louvain_round_weighted_sql(1)},
    {_louvain_round_weighted_sql(2)}
    SELECT l1.vid, q2.c AS community
    FROM lab{_LOUVAIN_ROUNDS} l1
      JOIN qlab2 q2 ON q2.vid = l1.c
    """,
)
def graph_part_louvain_two_level(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FULL Louvain loop, one level deeper than the local-move
    query: 2 local-move rounds from singletons, community contraction
    into a weighted quotient (inter-community edge counts; self-loop =
    2x intra count, so quotient modularity equals the original
    partition's), then 2 WEIGHTED local-move rounds on the quotient
    (graph/louvain.py ``louvain_local_moves_weighted``), labels
    projected back to every vertex. The oracle replays both phases —
    the unweighted chain is the louvain_move oracle verbatim, the
    weighted chain swaps count(*) for sum(w) and 2m for T."""
    from citation_graph_spark.graph.louvain import (
        louvain_local_moves_weighted,
    )

    edges = part_graph_edges(spark, sf_dir).select("src", "dst")
    lab1 = louvain_local_moves(edges, rounds=_LOUVAIN_ROUNDS)
    lab1 = lab1.localCheckpoint(eager=True)
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    le = (
        e.join(
            lab1.select(F.col("vid").alias("src"), F.col("community").alias("ca")),
            "src",
        )
        .join(
            lab1.select(F.col("vid").alias("dst"), F.col("community").alias("cb")),
            "dst",
        )
    )
    inter = (
        le.filter(F.col("ca") != F.col("cb"))
        .select(
            F.least("ca", "cb").alias("src"),
            F.greatest("ca", "cb").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    intra = (
        le.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("vid"))
        .agg((2 * F.count(F.lit(1))).cast("long").alias("sw"))
    )
    lab2 = louvain_local_moves_weighted(
        inter, intra, rounds=_LOUVAIN_ROUNDS
    )
    return lab1.join(
        lab2.select(
            F.col("vid").alias("community"),
            F.col("community").alias("community2"),
        ),
        "community",
    ).select("vid", F.col("community2").alias("community"))


# --------------------------------------------------------------------------
@register(
    "corpus_rich_club",
    oracle=f"""
    WITH {_CORPUS_CTE},
    deg AS (SELECT src AS vid, count(*) AS d FROM csym GROUP BY src),
    ks AS (SELECT DISTINCT d AS k FROM deg),
    nodes AS (
      SELECT k.k, count(*) AS n_k
      FROM ks k JOIN deg ON deg.d > k.k
      GROUP BY k.k
    ),
    rich_edges AS (
      SELECT k.k, count(*) AS e2_k   -- symmetric: 2x undirected count
      FROM ks k
        JOIN csym e ON TRUE
        JOIN deg ds ON e.src = ds.vid AND ds.d > k.k
        JOIN deg dt ON e.dst = dt.vid AND dt.d > k.k
      GROUP BY k.k
    )
    SELECT n.k, n.n_k,
           CAST(coalesce(r.e2_k, 0) // 2 AS BIGINT) AS e_k,
           CAST(CASE WHEN n.n_k >= 2 THEN
                  1000000 * coalesce(r.e2_k, 0)
                    // (n.n_k * (n.n_k - 1))
                ELSE 0 END AS BIGINT) AS phi_micro
    FROM nodes n LEFT JOIN rich_edges r ON n.k = r.k
    WHERE n.n_k >= 2
    """,
)
def corpus_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) (Zhou & Mondragón 2004) of the
    undirected citation graph at every realized degree threshold:
    among the n_k vertices of degree > k, the fraction of possible
    pairs actually linked — exact integers (φ in micro, floor
    division). Whether the corpus's hub documents form an
    interciting elite or a star periphery.

    Scale shape: degree table (one groupBy), then a threshold×degree
    join — |ks| is the distinct-degree count (≤ a few hundred on any
    power-law graph), so the threshold side BROADCASTS and edges are
    scanned once per realized threshold batch; never an n² pair
    join."""
    _, edges = corpus_tables(spark)
    sym = undirect(edges.select("src", "dst"))
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("d")
    )
    ks = deg.select(F.col("d").alias("k")).distinct()
    nodes = (
        F.broadcast(ks)
        .join(deg, deg["d"] > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_k"))
    )
    ds = deg.select(F.col("vid").alias("src"), F.col("d").alias("d_s"))
    dt = deg.select(F.col("vid").alias("dst"), F.col("d").alias("d_t"))
    e2 = (
        sym.join(ds, "src")
        .join(dt, "dst")
        .join(
            F.broadcast(ks),
            (F.col("d_s") > F.col("k")) & (F.col("d_t") > F.col("k")),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e2_k"))
    )
    return (
        nodes.join(e2, "k", "left")
        .filter(F.col("n_k") >= 2)
        .select(
            "k",
            "n_k",
            (F.coalesce("e2_k", F.lit(0)) / 2).cast("long").alias("e_k"),
            F.expr(
                "CASE WHEN n_k >= 2 THEN"
                " 1000000 * coalesce(e2_k, 0)"
                " div (n_k * (n_k - 1)) ELSE 0 END"
            )
            .cast("long")
            .alias("phi_micro"),
        )
    )
