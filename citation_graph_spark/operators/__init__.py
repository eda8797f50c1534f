"""Named-query registry for the serving layer.

Each operator module registers ``name -> fn(spark, sf_dir) -> DataFrame``
plus (where SQL-expressible) a DuckDB oracle SQL string with IDENTICAL
output column names — the driver's correctness gate compares row count,
schema and an order-insensitive value hash (README driver contract).

Cross-engine determinism rules every registered query follows:
- every computed column is aliased the same on both sides;
- double aggregates are ``round()``-ed identically on both sides
  (float summation order differs between engines; rounding absorbs the
  last-bit noise);
- timestamps are emitted as formatted strings (parquet stores
  isAdjustedToUTC=false; strings are timezone-proof on both engines);
- every top-k / LIMIT is a window ``row_number`` with a total
  tie-break order — never a bare LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from citation_graph_spark.operators import (  # noqa: F401
        behavior,
        bibliometrics,
        clustering,
        curation,
        dbscan,
        dedup,
        density,
        dimred,
        functions_lib,
        graphq,
        multimodal,
        relational,
        sampling,
        similarity,
        textops,
        tokenization,
        topics,
        topology,
    )
