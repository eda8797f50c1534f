"""Parquet table catalog for the serving layer.

The driver's testdata is a TPC-H-ish star schema plus ``documents`` /
``embeddings`` / ``events`` (TESTDATA.md). The reference keeps its
tables as loose CSVs read with pinned dtypes (reference:
scripts/gather_articles.py:157-171, scripts/integrate_batch.py:35-45);
here every table is parquet and the schema travels with the file, so
scans get column pruning + predicate pushdown for free.

Scale note: at 100 TB these are Iceberg tables with hidden
partitioning; ``load_tables`` isolates that choice to one place. The
seam is executable, not aspirational: set
``SPARK_GRAFT_TABLE_FORMAT=iceberg`` and
``SPARK_GRAFT_ICEBERG_NAMESPACE=<catalog.db>`` and every query reads
``spark.read.table("<catalog.db>.<name>")`` instead of parquet paths —
nothing downstream changes (this sandbox ships no Iceberg runtime jar,
so the path is exercised as construction-only in tests).
"""

from __future__ import annotations

import os

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


def load_tables(
    spark: SparkSession, sf_dir: str, fmt: str | None = None
) -> dict[str, DataFrame]:
    """Catalog seam: one place decides how the ten logical tables load.

    ``fmt`` (or ``$SPARK_GRAFT_TABLE_FORMAT``): ``parquet`` (default)
    reads ``{sf_dir}/{name}.parquet``; ``iceberg`` reads catalog tables
    ``$SPARK_GRAFT_ICEBERG_NAMESPACE.{name}`` (sf_dir is ignored — at
    warehouse scale the scale factor IS the catalog namespace)."""
    fmt = fmt or os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    if fmt == "iceberg":
        ns = os.environ.get("SPARK_GRAFT_ICEBERG_NAMESPACE", "iceberg.graft")
        return {t: spark.read.table(f"{ns}.{t}") for t in TABLE_NAMES}
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLE_NAMES}
