"""Deterministic splitting & sampling for training-data pipelines.

A 100 TB corpus feeding model training needs reproducible, engine-
independent assignment of every document to train/val/test and
reproducible stratified subsampling — `rand()` is banned (not stable
across runs/partitionings) and engine-native `hash()` differs between
engines. The device here is the md5 hex digest of the stable key,
compared lexicographically: each hex prefix is uniform, the digest is
bit-identical in every engine (Spark `md5` and DuckDB `md5` both emit
lowercase hex), and assignment is a pure column expression — no
shuffle, no state, embarrassingly parallel, and any engine can
recompute membership later (the property that matters when a sample
taken by the Spark pipeline must be audited by another stack).

Reference analog: the pipeline scripts process fixed CSV snapshots
(scripts/gather_articles.py) — identity-stable subsets by
construction. At stream scale the hash split is the same contract
without materializing a snapshot.

Thresholds: md5 first two hex chars, 256 equally-likely values.
`<= '66'` is 103/256 ≈ 40.2%; the split uses `'cb'` (204/256 ≈ 79.7%
train) and `'e5'` (26/256 ≈ 10.2% val), remainder test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables

_TRAIN_HI = "cb"  # 204/256
_VAL_HI = "e5"  # 230/256


def split_col(key_col, train_hi: str = _TRAIN_HI, val_hi: str = _VAL_HI):
    """Stable train/val/test label from any string-able key column."""
    h2 = F.substring(F.md5(key_col.cast("string")), 1, 2)
    return (
        F.when(h2 <= train_hi, F.lit("train"))
        .when(h2 <= val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


@register(
    "doc_split_assign",
    oracle=f"""
    SELECT split, count(*) AS n_docs,
           cast(sum(n_chars) AS BIGINT) AS chars
    FROM (
      SELECT CASE
               WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) <= '{_TRAIN_HI}'
                 THEN 'train'
               WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) <= '{_VAL_HI}'
                 THEN 'val'
               ELSE 'test'
             END AS split,
             n_chars
      FROM documents
    )
    GROUP BY split
    """,
)
def doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment rollup (per-split doc + char counts).
    The per-doc labels are ``split_col``; the rollup keeps the gate
    row small while hashing every assignment."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.withColumn("split", split_col(F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
    )


@register(
    "lang_stratified_sample",
    oracle="""
    SELECT lang, doc_id
    FROM documents
    WHERE substr(md5(cast(doc_id AS VARCHAR)), 1, 2) <= '18'
    """,
)
def lang_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample (`<= '18'` is 25/256 ≈ 9.8%), emitted
    with the stratum key. Uniform hash → per-language sampling fraction
    is equal across strata without a per-stratum pass; membership is
    recomputable by any engine. Returns the full sampled id list so the
    gate hashes exact membership, not just counts."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= "18"
    ).select("lang", "doc_id")


# --------------------------------------------------------------------------
# Weighted (token-budget-proportional) systematic sampling — the
# integer-exact alternative to Efraimidis–Spirakis exponential keys
# (whose pow/log floats are NOT bit-identical across engines): lay the
# documents on a line in doc_id order, each owning a segment of width
# = its weight, and take every (total/k)-th point. Long documents can
# be hit multiple times — n_hits IS the importance weight a sampler
# must carry. Everything is int64, so both engines agree exactly.
_SAMPLE_K = 100


def _global_cumsum(df: DataFrame, w_col: str, n_parts: int) -> DataFrame:
    """Exact inclusive global prefix sum of ``w_col`` in doc_id order
    with no single-partition window: range-repartition on doc_id,
    local cumsum per range, broadcast per-partition prefix offsets
    (one row per partition is the only driver-sized state)."""
    from pyspark.sql import Window

    part = df.repartitionByRange(n_parts, F.col("doc_id"))
    part = part.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy("doc_id")
    local = part.withColumn("_lcum", F.sum(w_col).over(w))
    tots = local.groupBy("_pid").agg(F.max("_lcum").alias("_tot"))
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = tots.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(wo), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn("cum", (F.col("_lcum") + F.col("_off")).cast("long"))
        .drop("_pid", "_lcum", "_off")
    )


@register(
    "doc_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS wt FROM documents
    ),
    c AS (
      SELECT doc_id, wt,
             CAST(sum(wt) OVER (ORDER BY doc_id) AS BIGINT) AS cum
      FROM w
    ),
    t AS (SELECT greatest(CAST(sum(wt) AS BIGINT) // {_SAMPLE_K}, 1)
            AS step FROM w)
    SELECT doc_id, wt, cum,
           cum // step - (cum - wt) // step AS n_hits
    FROM c CROSS JOIN t
    WHERE cum // step - (cum - wt) // step >= 1
    """,
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic length-weighted sample of ~100 documents: every
    (total_chars/k)-th character position selects its owning document;
    ``n_hits`` (multiplicity) is the exact importance weight. Pure
    integer arithmetic on an exact distributed prefix sum — any engine
    recomputes the identical sample (the auditability contract of
    doc_split_assign, extended to weighted draws).

    Physical shape: one range exchange + per-range cumsum window, one
    broadcast of per-partition offsets, one scalar total."""
    d = load_tables(spark, sf_dir)["documents"]
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = d.select("doc_id", F.col("n_chars").cast("long").alias("wt"))
    cum = _global_cumsum(w, "wt", parts)
    total = cum.agg(F.max("cum")).first()[0] or 0
    step = max(total // _SAMPLE_K, 1)
    n_hits = F.expr(f"cum div {step} - (cum - wt) div {step}")
    return (
        cum.withColumn("n_hits", n_hits.cast("long"))
        .filter(F.col("n_hits") >= 1)
        .select("doc_id", "wt", "cum", "n_hits")
    )
