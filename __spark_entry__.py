"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query: build the same-brand co-order part
graph from sf0.001, PageRank it with the engine's iterative kernel,
return the top-20 parts by score with names.

``queries()`` / ``oracle_sql()`` — the full registry from
``citation_graph_spark.operators`` (relational §2 inventory, text
analysis, dedup family, similarity search, graph kernels). Queries
without an oracle entry are the iterative-kernel runs on the
synthesized corpus (non-SQL-expressible; exactness covered by pytest
oracles in tests/oracles.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citation_graph_spark import operators  # noqa: E402

operators.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the part co-order graph at sf0.001."""
    from citation_graph_spark.operators.graphq import part_graph_edges
    from citation_graph_spark.graph import pagerank
    from citation_graph_spark.tables import load_tables

    sf_dir = "/root/testdata/sf0.001"
    edges = part_graph_edges(spark, sf_dir)
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    ranks = pagerank(sym, alpha=0.85, tol=1e-8, max_iter=50)
    part = load_tables(spark, sf_dir)["part"]
    top = (
        ranks.join(part, ranks["vid"] == part["p_partkey"])
        .select("vid", "p_name", "p_brand", F.col("score"))
        .orderBy(F.desc("score"), F.asc("vid"))
        .limit(20)
    )
    return top


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(operators.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(operators.ORACLES)
