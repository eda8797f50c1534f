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
