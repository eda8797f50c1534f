"""Sources and sinks — the reference's I/O surface, schema-pinned.

The reference reads dtype-pinned CSVs (scripts/gather_articles.py:157-171,
scripts/integrate_batch.py:35-45), JSONL (scripts/combine_serp.py:32-36,
embed/__init__.py:7-28), directories of one-JSON-per-entity files with
the filename as key (scripts/gather_articles.py:126-152), raw binary
documents (scripts/extract_affiliations_from_papers.py:209-258), and
writes deterministically-sorted CSV (scripts/gather_articles.py:253-259,
data_sources/utils.py:148-182) and JSONL
(scripts/create_extended_article.py:169-171).

Engine rules carried over:
- **schemas are declared, never inferred** (reference pydantic
  ``extra="forbid"``, schemas.py:14 — here an explicit StructType per
  reader; ``inferSchema`` would silently drift at 10^12 rows and scan
  the data twice);
- **sink determinism is explicit**: sorted output is a golden-file
  device, so the sort is in the writer, not hoped for from partition
  order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S1 — dtype-pinned CSV scan (header expected)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S2 — line-delimited JSON with explicit schema."""
    return spark.read.schema(schema).json(path)


def read_json_dir(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S3 — one JSON file per entity; the filename (sans extension) is
    the entity key, carried as ``entity_key`` via input_file_name()."""
    return (
        spark.read.schema(schema)
        .option("multiLine", "true")
        .json(path)
        .withColumn(
            "entity_key",
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.json$", 1),
        )
    )


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S5 — binary documents (PDFs in the reference) as
    (path, modificationTime, length, content:binary); decode happens in
    a downstream mapInPandas stage (operators/multimodal.py)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.input_file_name().alias("source_path"),
            F.col("length"),
            F.col("content"),
        )
    )


def write_sorted_csv(df: DataFrame, path: str, sort_cols: list[str]) -> None:
    """S8 — deterministic CSV sink: total order, single header file.

    The global sort range-partitions; ``coalesce(1)`` is the golden-file
    concession (the reference writes one CSV) — at warehouse scale drop
    it and keep per-partition sorted files."""
    df.orderBy(*sort_cols).coalesce(1).write.mode("overwrite").option(
        "header", "true"
    ).csv(path)


def write_jsonl(df: DataFrame, path: str, sort_cols: list[str] | None = None) -> None:
    """S9 — JSONL sink (optionally sorted for golden files)."""
    if sort_cols:
        df = df.orderBy(*sort_cols).coalesce(1)
    df.write.mode("overwrite").json(path)


def upsert_partitioned(
    df: DataFrame, path: str, partition_col: str
) -> None:
    """S10 analog — the reference's batched Neo4j MERGE
    (scripts/integrate_batch.py:84-109) becomes idempotent dynamic
    partition overwrite: only partitions present in ``df`` are
    replaced, the rest of the table is untouched. Re-running a batch is
    a no-op (the MERGE property)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        # restore: leaving 'dynamic' session-wide would silently change
        # every later partitioned overwrite from truncate-table to
        # keep-unmatched-partitions semantics
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_orc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """ORC scan, schema-pinned like every other reader. ORC is the
    second columnar format a warehouse migration meets (Hive-era
    tables); same pushdown/pruning properties as parquet through the
    same DataSource V2 scan machinery."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, sort_cols: list[str] | None = None) -> None:
    """ORC sink (optionally sorted for golden files)."""
    if sort_cols:
        df = df.orderBy(*sort_cols)
    df.write.mode("overwrite").orc(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed (hash-clustered) managed table — the co-located-join
    storage layout.

    Writing both sides of a recurring fact-fact equi-join bucketed on
    the join key with the same bucket count makes every subsequent join
    and aggregation on that key exchange-free: Catalyst recognizes the
    bucket spec as a satisfied HashClusteredDistribution and plans a
    sort-merge join with ZERO shuffle on either side
    (tests/test_sources.py asserts no Exchange in the physical plan).
    At 100 TB this is the difference between re-shuffling the fact
    table on every query and shuffling it once at write time — the
    same role Iceberg's bucket partition transform plays on the
    catalog seam (tables.py)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
