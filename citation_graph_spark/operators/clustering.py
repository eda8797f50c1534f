"""Clustering quality metrics (SURVEY §2 A11) — distributed, oracle-checked.

The reference computes silhouette, Davies-Bouldin and Calinski-Harabasz
on every clustering run (reference clustering/kmeans.py:47-60, same
block in dbscan.py:48-64 / hdbscan.py:45-64 / agglomerative.py:50-65;
stored in ClusterAnalysis, schemas.py:80-89). Here each metric is a
join/agg plan over (vec_id, cluster, embedding) — no driver-side
matrix, no collect:

- assignment: every vector to its nearest integer-quantized per-label
  centroid (one Lloyd step from the label means — deterministic and
  SQL-expressible, so the metric queries are fully gate-checkable; the
  same functions run on any assignment, e.g. MLlib k-means output —
  tests/test_clustering_metrics.py does both);
- silhouette: the exact O(n·k) centroid formulation for squared
  Euclidean (Σ_j ||x_i − x_j||² = n_c·||x_i||² − 2·x_i·S_c + Q_c — the
  same identity MLlib's ClusteringEvaluator uses), not the O(n²)
  pairwise form;
- Davies-Bouldin: per-cluster scatter + centroid-separation ratios;
- Calinski-Harabasz: between/within sum-of-squares ratio.

Cross-engine determinism: vectors are milli-quantized bigints and
centroids are re-quantized to the same grid, so every sum-of-squares,
dot product and count is EXACT integer arithmetic on both engines;
doubles appear only in final single divisions / sqrt of identical
exact integers (IEEE-identical), and any value that crosses another
aggregation is floor(x*scale+0.5)-quantized first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables

# THE milli-quantization expression — single source for every operator
# that does exact-integer vector arithmetic (clustering metrics, DBSCAN,
# embedding dedup): change the grid here and everywhere moves together
QUANT_MILLI = (
    "transform(embedding, x -> cast(floor(cast(x as double) * 1000 + 0.5) as bigint))"
)
_QUANT = QUANT_MILLI

# ...and the exact-integer dot product over two quantized columns —
# same single-source rule
DOT_BIGINT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as bigint), "
    "(acc, v) -> acc + v)"
)

# ---- shared DuckDB CTEs: quantize → label centroids → assignment ---------
_ASSIGN_CTES = """
    q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> cast(floor(cast(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
      FROM embeddings
    ),
    vex AS (
      SELECT vec_id, label, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
      FROM q
    ),
    lcent AS (
      SELECT label AS cl, pos,
             cast(floor(sum(v) * 1.0 / count(*) + 0.5) AS BIGINT) AS cq
      FROM vex GROUP BY label, pos
    ),
    d2 AS (
      SELECT vec_id, cl, sum((v - cq) * (v - cq)) AS d2
      FROM vex JOIN lcent ON vex.pos = lcent.pos
      GROUP BY vec_id, cl
    ),
    assign AS (
      SELECT vec_id, cl AS cluster FROM (
        SELECT vec_id, cl,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
        FROM d2
      ) WHERE rn = 1
    )
"""

# assigned-cluster integer centroids + sizes + within-cluster SSQ
_ACENT_CTES = """
    avex AS (
      SELECT a.cluster, vex.vec_id, vex.pos, vex.v
      FROM vex JOIN assign a ON vex.vec_id = a.vec_id
    ),
    acent AS (
      SELECT cluster, pos,
             cast(floor(sum(v) * 1.0 / count(*) + 0.5) AS BIGINT) AS cq
      FROM avex GROUP BY cluster, pos
    ),
    csize AS (SELECT cluster, count(*) AS n_k FROM assign GROUP BY cluster),
    wk AS (
      SELECT avex.cluster, sum((v - cq) * (v - cq)) AS w_k
      FROM avex JOIN acent
        ON avex.cluster = acent.cluster AND avex.pos = acent.pos
      GROUP BY avex.cluster
    )
"""


# ---- Spark-side shared plan ----------------------------------------------
def quantized_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, qv) — milli-quantized bigint vectors."""
    e = load_tables(spark, sf_dir)["embeddings"]
    return e.select("vec_id", "label", F.expr(_QUANT).alias("qv"))


def seed_assign(q: DataFrame) -> DataFrame:
    """(vec_id, cluster): nearest integer-quantized per-label centroid
    (squared-Euclidean argmin, cluster-id tie-break) — one deterministic
    Lloyd step from the label means."""
    vex = q.select("vec_id", "label", F.posexplode("qv").alias("pos", "v"))
    lcent = vex.groupBy(F.col("label").alias("cl"), "pos").agg(
        F.floor(F.sum("v") * 1.0 / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("cq")
    )
    d2 = (
        vex.join(F.broadcast(lcent), "pos")
        .groupBy("vec_id", "cl")
        .agg(F.sum((F.col("v") - F.col("cq")) * (F.col("v") - F.col("cq"))).alias("d2"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cl"))
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cl").alias("cluster"))
    )


def _assigned_vex(q: DataFrame, assign: DataFrame):
    """avex (cluster, vec_id, pos, v), acent (cluster, pos, cq),
    csize (cluster, n_k), wk (cluster, w_k) — the shared aggregates."""
    vex = q.select("vec_id", F.posexplode("qv").alias("pos", "v"))
    avex = vex.join(assign, "vec_id").select("cluster", "vec_id", "pos", "v")
    acent = avex.groupBy("cluster", "pos").agg(
        F.floor(F.sum("v") * 1.0 / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("cq")
    )
    csize = assign.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_k"))
    wk = (
        avex.join(F.broadcast(acent), ["cluster", "pos"])
        .groupBy("cluster")
        .agg(F.sum((F.col("v") - F.col("cq")) * (F.col("v") - F.col("cq"))).alias("w_k"))
    )
    return avex, acent, csize, wk


def calinski_harabasz(q: DataFrame, assign: DataFrame) -> DataFrame:
    """Single row (n_vectors, k, within_ssq, between_ssq, ch_milli).
    CH = (B/(k−1)) / (W/(n−k)) over exact integer SSQs."""
    avex, acent, csize, wk = _assigned_vex(q, assign)
    vex = q.select("vec_id", F.posexplode("qv").alias("pos", "v"))
    gcent = vex.groupBy("pos").agg(
        F.floor(F.sum("v") * 1.0 / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("gq")
    )
    bk = (
        acent.join(F.broadcast(gcent), "pos")
        .groupBy("cluster")
        .agg(F.sum((F.col("cq") - F.col("gq")) * (F.col("cq") - F.col("gq"))).alias("b1"))
        .join(csize, "cluster")
        .select((F.col("b1") * F.col("n_k")).alias("b_k"))
    )
    totals = (
        wk.agg(F.sum("w_k").alias("within_ssq"), F.count(F.lit(1)).alias("k"))
        .crossJoin(bk.agg(F.sum("b_k").alias("between_ssq")))
        .crossJoin(assign.agg(F.count(F.lit(1)).alias("n_vectors")))
    )
    ch = (F.col("between_ssq") * (F.col("n_vectors") - F.col("k"))) / (
        F.col("within_ssq") * (F.col("k") - 1)
    )
    return totals.select(
        "n_vectors",
        "k",
        "within_ssq",
        "between_ssq",
        F.floor(ch * 1000 + F.lit(0.5)).cast("long").alias("ch_milli"),
    )


def davies_bouldin(q: DataFrame, assign: DataFrame) -> DataFrame:
    """Per-cluster (cluster, n_vectors, scatter_micro, r_max_micro):
    scatter s_k = sqrt(W_k/n_k); R_ij = (s_i+s_j)/d(c_i,c_j); the DB
    index is mean(r_max) — left as integer micro per cluster so no
    cross-cluster float sum enters the result."""
    _, acent, csize, wk = _assigned_vex(q, assign)
    s = (
        wk.join(csize, "cluster")
        .select("cluster", "n_k", F.sqrt(F.col("w_k") / F.col("n_k")).alias("s"))
    )
    a = acent.select(F.col("cluster").alias("ci"), "pos", F.col("cq").alias("cqi"))
    b = acent.select(F.col("cluster").alias("cj"), "pos", F.col("cq").alias("cqj"))
    dij = (
        a.join(b, "pos")
        .filter(F.col("ci") != F.col("cj"))
        .groupBy("ci", "cj")
        .agg(F.sum((F.col("cqi") - F.col("cqj")) * (F.col("cqi") - F.col("cqj"))).alias("dsq"))
    )
    si = s.select(F.col("cluster").alias("ci"), F.col("s").alias("s_i"))
    sj = s.select(F.col("cluster").alias("cj"), F.col("s").alias("s_j"))
    r = (
        dij.join(si, "ci")
        .join(sj, "cj")
        .withColumn("r", (F.col("s_i") + F.col("s_j")) / F.sqrt(F.col("dsq")))
        .groupBy("ci")
        .agg(F.max("r").alias("r_max"))
    )
    return (
        s.join(r, s["cluster"] == r["ci"])
        .select(
            "cluster",
            F.col("n_k").alias("n_vectors"),
            F.floor(F.col("s") * 1000000 + F.lit(0.5)).cast("long").alias("scatter_micro"),
            F.floor(F.col("r_max") * 1000000 + F.lit(0.5)).cast("long").alias("r_max_micro"),
        )
    )


def silhouette(q: DataFrame, assign: DataFrame) -> DataFrame:
    """Per-cluster (cluster, n_vectors, mean_silhouette_micro) — exact
    squared-Euclidean silhouette via the centroid identity (O(n·k·d),
    never O(n²)): meanSqDist(i, c) = (n_c·||x_i||² − 2·x_i·S_c + Q_c)
    / n_c (own cluster: /(n_c − 1)); a(i)=own, b(i)=min other,
    s(i)=(b−a)/max(a,b); singleton clusters get s=0."""
    vex = q.select("vec_id", F.posexplode("qv").alias("pos", "v"))
    norms = vex.groupBy("vec_id").agg(F.sum(F.col("v") * F.col("v")).alias("nsq"))
    avex = vex.join(assign, "vec_id")
    svs = avex.groupBy(F.col("cluster").alias("c"), "pos").agg(F.sum("v").alias("sv"))
    cstats = (
        norms.join(assign, "vec_id")
        .groupBy(F.col("cluster").alias("c"))
        .agg(F.sum("nsq").alias("q_c"), F.count(F.lit(1)).alias("n_c"))
    )
    dots = (
        vex.join(F.broadcast(svs), "pos")
        .groupBy("vec_id", "c")
        .agg(F.sum(F.col("v") * F.col("sv")).alias("dot"))
    )
    per = (
        dots.join(F.broadcast(cstats), "c")
        .join(norms, "vec_id")
        .join(assign, "vec_id")
    )
    ssq = F.col("n_c") * F.col("nsq") - 2 * F.col("dot") + F.col("q_c")
    meansq = F.when(
        F.col("c") == F.col("cluster"),
        F.when(F.col("n_c") > 1, ssq / (F.col("n_c") - 1)),
    ).otherwise(ssq / F.col("n_c"))
    ab = (
        per.withColumn("m", meansq)
        .groupBy("vec_id", "cluster")
        .agg(
            F.max(F.when(F.col("c") == F.col("cluster"), F.col("m"))).alias("a"),
            F.min(F.when(F.col("c") != F.col("cluster"), F.col("m"))).alias("b"),
        )
    )
    s_i = F.when(
        F.col("a").isNull(), F.lit(0.0)  # singleton cluster convention
    ).otherwise((F.col("b") - F.col("a")) / F.greatest("a", "b"))
    quant = ab.select(
        "cluster",
        F.floor(s_i * 1000000 + F.lit(0.5)).cast("long").alias("s_micro"),
    )
    return quant.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.floor(F.sum("s_micro") * 1.0 / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("mean_silhouette_micro"),
    )


# --------------------------------------------------------------------------
@register(
    "cluster_assign_seed",
    oracle=f"""
    WITH {_ASSIGN_CTES}
    SELECT vec_id, cluster FROM assign
    """,
)
def cluster_assign_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic assignment the metric queries score: nearest
    quantized label-centroid (one Lloyd step from label means)."""
    q = quantized_vectors(spark, sf_dir)
    return seed_assign(q)


@register(
    "cluster_calinski_harabasz",
    oracle=f"""
    WITH {_ASSIGN_CTES},
    {_ACENT_CTES},
    gcent AS (
      SELECT pos, cast(floor(sum(v) * 1.0 / count(*) + 0.5) AS BIGINT) AS gq
      FROM vex GROUP BY pos
    ),
    bk AS (
      SELECT acent.cluster, sum((cq - gq) * (cq - gq)) * max(n_k) AS b_k
      FROM acent JOIN gcent ON acent.pos = gcent.pos
                JOIN csize ON acent.cluster = csize.cluster
      GROUP BY acent.cluster
    ),
    tot AS (
      SELECT (SELECT cast(sum(w_k) AS BIGINT) FROM wk) AS within_ssq,
             (SELECT cast(sum(b_k) AS BIGINT) FROM bk) AS between_ssq,
             (SELECT count(*) FROM wk) AS k,
             (SELECT count(*) FROM assign) AS n_vectors
    )
    SELECT n_vectors, k, within_ssq, between_ssq,
           cast(floor((between_ssq * (n_vectors - k) * 1.0)
                      / (within_ssq * (k - 1)) * 1000 + 0.5) AS BIGINT) AS ch_milli
    FROM tot
    """,
)
def cluster_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — Calinski-Harabasz over the seed assignment (reference
    clustering/kmeans.py:56-58 calinski_harabasz_score)."""
    q = quantized_vectors(spark, sf_dir)
    return calinski_harabasz(q, seed_assign(q))


@register(
    "cluster_davies_bouldin",
    oracle=f"""
    WITH {_ASSIGN_CTES},
    {_ACENT_CTES},
    s AS (
      SELECT wk.cluster, n_k, sqrt(w_k * 1.0 / n_k) AS s
      FROM wk JOIN csize ON wk.cluster = csize.cluster
    ),
    dij AS (
      SELECT a.cluster AS ci, b.cluster AS cj,
             sum((a.cq - b.cq) * (a.cq - b.cq)) AS dsq
      FROM acent a JOIN acent b ON a.pos = b.pos AND a.cluster <> b.cluster
      GROUP BY a.cluster, b.cluster
    ),
    r AS (
      SELECT ci, max((si.s + sj.s) / sqrt(dsq)) AS r_max
      FROM dij JOIN s si ON dij.ci = si.cluster
               JOIN s sj ON dij.cj = sj.cluster
      GROUP BY ci
    )
    SELECT s.cluster, n_k AS n_vectors,
           cast(floor(s.s * 1000000 + 0.5) AS BIGINT) AS scatter_micro,
           cast(floor(r.r_max * 1000000 + 0.5) AS BIGINT) AS r_max_micro
    FROM s JOIN r ON s.cluster = r.ci
    """,
)
def cluster_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — Davies-Bouldin components over the seed assignment
    (reference clustering/kmeans.py:53-55 davies_bouldin_score); the
    global index is mean(r_max_micro)/1e6."""
    q = quantized_vectors(spark, sf_dir)
    return davies_bouldin(q, seed_assign(q))


def _kmeans_sweep(spark, sf_dir, score, ks=(4, 6, 8, 10, 12)):
    """Shared deterministic MLlib k-sweep (seed 42, maxIter 20,
    k-means||) behind both model-selection queries: fits each k with
    the feature/quantized tables persisted, calls ``score(q, assign)``
    → tuple of ints per k, and returns [(k, *scores)]. One definition
    so the grid/seed/scoring inputs can never drift between the
    single-objective and Pareto queries."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_tables(spark, sf_dir)["embeddings"]
    feat = e.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    ).persist()
    q = quantized_vectors(spark, sf_dir).select("vec_id", "qv").persist()
    rows = []
    for k in ks:
        model = KMeans(k=k, seed=42, maxIter=20, initMode="k-means||").fit(feat)
        assign = model.transform(feat).select(
            "vec_id", F.col("prediction").cast("long").alias("cluster")
        )
        rows.append((k, *score(q, assign)))
    feat.unpersist()
    q.unpersist()
    return rows


@register("kmeans_model_selection")  # rows-only: k-means fits have no SQL
# oracle; the scoring metrics themselves are oracle-checked separately and
# numpy-verified per assignment in tests/test_clustering_metrics.py
def kmeans_model_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model selection over k (reference workflow parity:
    scripts/optimize_clustering.py:65 runs 50 Optuna trials scoring
    each clustering with the same three metrics; here a deterministic
    sweep k ∈ {4,6,8,10,12} scored by distributed Calinski-Harabasz —
    higher is better). The driver loop is over HYPERPARAMETERS (5
    fits), never over data; each fit and each scoring is a distributed
    job. Returns (k, ch_milli, is_best) sorted by k."""

    def score(q, assign):
        return (int(calinski_harabasz(q, assign).collect()[0]["ch_milli"]),)

    rows = _kmeans_sweep(spark, sf_dir, score)
    best_k = max(rows, key=lambda r: (r[1], -r[0]))[0]
    out = spark.createDataFrame(rows, "k long, ch_milli long")
    return out.withColumn("is_best", F.col("k") == F.lit(best_k)).orderBy("k")


@register(
    "cluster_silhouette",
    oracle=f"""
    WITH {_ASSIGN_CTES},
    norms AS (SELECT vec_id, sum(v * v) AS nsq FROM vex GROUP BY vec_id),
    svs AS (
      SELECT a.cluster AS c, pos, sum(v) AS sv
      FROM vex JOIN assign a ON vex.vec_id = a.vec_id
      GROUP BY a.cluster, pos
    ),
    cstats AS (
      SELECT a.cluster AS c, sum(nsq) AS q_c, count(*) AS n_c
      FROM norms JOIN assign a ON norms.vec_id = a.vec_id
      GROUP BY a.cluster
    ),
    dots AS (
      SELECT vec_id, c, sum(v * sv) AS dot
      FROM vex JOIN svs ON vex.pos = svs.pos
      GROUP BY vec_id, c
    ),
    per AS (
      SELECT d.vec_id, d.c, a.cluster,
             CASE WHEN d.c = a.cluster THEN
               CASE WHEN n_c > 1
                    THEN (n_c * nsq - 2 * dot + q_c) * 1.0 / (n_c - 1) END
             ELSE (n_c * nsq - 2 * dot + q_c) * 1.0 / n_c END AS m
      FROM dots d
        JOIN cstats ON d.c = cstats.c
        JOIN norms ON d.vec_id = norms.vec_id
        JOIN assign a ON d.vec_id = a.vec_id
    ),
    ab AS (
      SELECT vec_id, cluster,
             max(CASE WHEN c = cluster THEN m END) AS a,
             min(CASE WHEN c <> cluster THEN m END) AS b
      FROM per GROUP BY vec_id, cluster
    ),
    quant AS (
      SELECT cluster,
             CASE WHEN a IS NULL THEN 0
                  ELSE cast(floor((b - a) / greatest(a, b) * 1000000 + 0.5)
                            AS BIGINT) END AS s_micro
      FROM ab
    )
    SELECT cluster, count(*) AS n_vectors,
           cast(floor(sum(s_micro) * 1.0 / count(*) + 0.5) AS BIGINT)
             AS mean_silhouette_micro
    FROM quant GROUP BY cluster
    """,
)
def cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — exact squared-Euclidean silhouette over the seed
    assignment (reference clustering/kmeans.py:47-52
    silhouette_score), O(n·k·d) via the centroid identity."""
    q = quantized_vectors(spark, sf_dir)
    return silhouette(q, seed_assign(q))


# --------------------------------------------------------------------------
def _pareto_front(rows: list[tuple[int, int, int, int]]) -> set[int]:
    """k-values of the non-dominated set over (sil↑, db↓, ch↑).

    rows: (k, sil_micro, db_micro, ch_milli). a dominates b iff a is ≥
    on every maximized objective, ≤ on every minimized one, and
    strictly better on at least one."""

    def dominates(a, b) -> bool:
        ge = a[1] >= b[1] and a[2] <= b[2] and a[3] >= b[3]
        strict = a[1] > b[1] or a[2] < b[2] or a[3] > b[3]
        return ge and strict

    return {r[0] for r in rows if not any(dominates(o, r) for o in rows)}


@register("kmeans_pareto_front")  # rows-only: k-means fits have no SQL
# oracle; the three scoring metrics are each oracle-checked standalone
# and the front logic is exact-pinned in tests/test_clustering_metrics.py
def kmeans_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-objective model selection (reference parity:
    scripts/run_mo_opt_clustering.py:33-99 runs NSGA-II over
    silhouette↑ / davies-bouldin↓ / calinski-harabasz↑ with 50 trials;
    here the same three metrics — the engine's distributed,
    oracle-checked implementations — score a deterministic k grid and
    the non-dominated set is computed on the driver). The driver loop
    is over HYPERPARAMETERS and per-k scalar metric rows (k rows of 3
    ints each), never over data; every fit and every metric is a
    distributed job. Scalarization is deterministic-integer: weighted
    mean of per-cluster silhouette micros (floor), mean of per-cluster
    r_max micros (floor), CH milli as-is. Returns
    (k, sil_micro, db_micro, ch_milli, on_front) sorted by k."""

    def score(q, assign):
        assign = assign.persist()
        sil_rows = silhouette(q, assign).collect()
        db_rows = davies_bouldin(q, assign).collect()
        ch = calinski_harabasz(q, assign).collect()[0]["ch_milli"]
        assign.unpersist()
        n_tot = sum(r["n_vectors"] for r in sil_rows)
        sil = (
            sum(r["n_vectors"] * r["mean_silhouette_micro"] for r in sil_rows)
            // n_tot
        )
        db = sum(r["r_max_micro"] for r in db_rows) // len(db_rows)
        return (int(sil), int(db), int(ch))

    rows = _kmeans_sweep(spark, sf_dir, score)
    front = _pareto_front(rows)
    out = spark.createDataFrame(
        rows, "k long, sil_micro long, db_micro long, ch_milli long"
    )
    return out.withColumn("on_front", F.col("k").isin(*front)).orderBy("k")
