"""Scaling-evidence job: extraction + fixed PageRank rounds on a
pre-materialized corpus parquet.

Launched via ``spark-submit --py-files`` (north-rule launch mode) by
tools/scaling_bench.py at two parallelism levels; prints one JSON line
with phase walls so the bench can compute N→4N scaling efficiency.

Usage: scaling_job.py <docs_parquet> <cores> <pagerank_iters>
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    docs_path, cores, iters = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"cgs-scaling-{cores}")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from citation_graph_spark.graph.ids import build_vertices
    from citation_graph_spark.extraction import build_edges
    from citation_graph_spark.graph import pagerank

    docs = spark.read.parquet(docs_path).repartition(cores * 4)

    t0 = time.monotonic()
    verts = build_vertices(docs).cache()
    edges = build_edges(docs, verts).cache()
    n_edges = edges.count()
    n_verts = verts.count()
    extract_s = time.monotonic() - t0

    t0 = time.monotonic()
    pagerank(edges, verts.select("vid"), tol=0.0, max_iter=iters).count()
    pr_s = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "vertices": n_verts,
                "edges": n_edges,
                "iterations": iters,
                "extract_s": round(extract_s, 3),
                "pagerank_s": round(pr_s, 3),
                "total_s": round(extract_s + pr_s, 3),
                "edges_per_sec": round(iters * n_edges / pr_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
