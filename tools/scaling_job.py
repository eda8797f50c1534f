"""Scaling-evidence job: extraction + fixed PageRank rounds on a
pre-materialized corpus parquet.

Master, memory and JVM flags come from the spark-submit command line
(tools/scaling_bench.py for local[N] levels, tools/cluster_bench.py for
a real standalone cluster at N vs 4N executors). Prints one JSON line
with phase walls.

Usage: scaling_job.py <docs_parquet> <shuffle_partitions> <pagerank_iters>
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    docs_path, parts, iters = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("cgs-scaling")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.default.parallelism", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        # coalescing off, matching session.py and cluster_bench: AQE's
        # 64MB post-shuffle byte target throttles the Arrow/Python
        # extraction stage (measured 2.9x) and would cap both scaling
        # legs toward the same parallelism, understating the series
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # split the corpus scan at row-group granularity: the Arrow
        # extraction stage then parallelizes off the files directly —
        # no full-content shuffle
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from citation_graph_spark.graph.ids import build_vertices
    from citation_graph_spark.extraction import build_edges
    from citation_graph_spark.graph import pagerank

    docs = spark.read.parquet(docs_path)

    # Warm-up OUTSIDE the measured window: executors spawn lazily on the
    # first action, so without this the timer absorbs executor-JVM
    # launch + AlwaysPreTouch heap zeroing (~48 GB at 4 workers on this
    # slow-page-fault kernel) and the input's cold page-cache read.
    # Cluster executors are long-running; startup is not job throughput.
    docs.count()

    t0 = time.monotonic()
    verts = build_vertices(docs).cache()
    edges = build_edges(docs, verts).cache()
    n_edges = edges.count()
    n_verts = verts.count()
    extract_s = time.monotonic() - t0

    # per-iteration walls via the kernel's own metrics log: a mid-leg
    # host dip is then visible INSIDE the leg (iteration time series),
    # not just inferable from the pre/post bandwidth probes — closes
    # the r5b ambiguity where a narrow-leg slowdown could only be
    # attributed by its post-leg probe
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".jsonl", delete=False) as f:
        metrics_path = f.name
    t0 = time.monotonic()
    pagerank(
        edges,
        verts.select("vid"),
        tol=0.0,
        max_iter=iters,
        num_partitions=parts,
        metrics_path=metrics_path,
    ).count()
    pr_s = time.monotonic() - t0
    iter_walls = []
    try:
        with open(metrics_path) as f:
            recs = [json.loads(ln) for ln in f]
        iter_walls = [
            r.get("wall_s")
            for r in sorted(
                (r for r in recs if r.get("iteration", -1) >= 0),
                key=lambda r: r["iteration"],
            )
        ]
    except Exception:  # noqa: BLE001 — evidence-only, never fail the leg
        pass

    print(
        json.dumps(
            {
                "shuffle_partitions": parts,
                "vertices": n_verts,
                "edges": n_edges,
                "iterations": iters,
                "extract_s": round(extract_s, 3),
                "pagerank_s": round(pr_s, 3),
                "total_s": round(extract_s + pr_s, 3),
                "edges_per_sec": round(iters * n_edges / pr_s, 1),
                "iter_walls_s": iter_walls,
            }
        )
    )


if __name__ == "__main__":
    main()
