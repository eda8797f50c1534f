"""Parquet table catalog for the serving layer.

The driver's testdata is a TPC-H-ish star schema plus ``documents`` /
``embeddings`` / ``events`` (TESTDATA.md). The reference keeps its
tables as loose CSVs read with pinned dtypes (reference:
scripts/gather_articles.py:157-171, scripts/integrate_batch.py:35-45);
here every table is parquet and the schema travels with the file, so
scans get column pruning + predicate pushdown for free.

Scale note: at 100 TB these would be Iceberg tables with hidden
partitioning; ``load_tables`` isolates that choice to one place — swap
``spark.read.parquet`` for ``spark.read.format("iceberg")`` and nothing
downstream changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLE_NAMES}
