"""Partition-pack stress run on the big synthesized citation graph.

The multilevel partitioner's largest committed evidence is the sf0.1
part graph (~20k vertices). This drives the full METIS-recipe chain —
maximal matching coarsening → quotient → Fiedler spectral bisection of
the largest coarse component → projection → FM-style refinement — on
the SAME 1.8M-doc / 31M-edge extracted citation graph the scaling
series measures, and records phase walls + cut quality, so "would the
partitioner hold at 100×" is answered with a number, not a shape
argument.

Usage: python tools/stress_partition.py [corpus_parquet] [out_json]
Defaults: bench_out/scaling_corpus_1800k.parquet →
bench_out/stress_partition_1800k.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    corpus = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "bench_out/scaling_corpus_1800k.parquet"
    )
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "bench_out/stress_partition_1800k.json"
    )
    from membw_bench import run as membw

    from pyspark.sql import functions as F

    from citation_graph_spark.session import get_spark
    from citation_graph_spark.extraction import build_edges
    from citation_graph_spark.graph import maximal_matching
    from citation_graph_spark.graph.degrees import undirect
    from citation_graph_spark.graph.ids import build_vertices
    from citation_graph_spark.graph.spectral import (
        refine_bisection,
        spectral_bisect,
    )

    rec: dict = {"corpus": corpus, "probe_pre": round(membw(2, 4.0), 1)}
    spark = get_spark(app_name="stress-partition")
    docs = spark.read.parquet(corpus)
    docs.count()  # warm page cache outside the timed phases

    t0 = time.monotonic()
    verts = build_vertices(docs).cache()
    edges = build_edges(docs, verts).cache()
    rec["edges"] = edges.count()
    rec["vertices"] = verts.count()
    rec["extract_s"] = round(time.monotonic() - t0, 1)

    e = edges.select("src", "dst")

    t0 = time.monotonic()
    m = maximal_matching(e, max_iter=100)
    svmap = m.select(
        "vid",
        F.when(F.col("matched") == 1, F.least(F.col("vid"), F.col("mate")))
        .otherwise(F.col("vid"))
        .cast("long")
        .alias("sv"),
    ).localCheckpoint(eager=True)
    rec["matched_vertices"] = m.filter(F.col("matched") == 1).count()
    rec["matching_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    sa = svmap.select(F.col("vid").alias("src"), F.col("sv").alias("sva"))
    sb = svmap.select(F.col("vid").alias("dst"), F.col("sv").alias("svb"))
    qedges = (
        e.join(sa, "src")
        .join(sb, "dst")
        .filter(F.col("sva") != F.col("svb"))
        .select(
            F.least("sva", "svb").alias("src"),
            F.greatest("sva", "svb").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    rec["quotient_edges"] = qedges.count()
    rec["quotient_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    coarse = spectral_bisect(qedges, max_iter=40).localCheckpoint(eager=True)
    rec["coarse_component_vertices"] = coarse.count()
    rec["fiedler_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    proj = (
        svmap.join(coarse.select(F.col("vid").alias("sv"), "side"), "sv")
        .select("vid", "side")
        .localCheckpoint(eager=True)
    )
    comp_edges = e.join(
        proj.select(F.col("vid").alias("src")), "src", "left_semi"
    ).localCheckpoint(eager=True)
    sides0 = proj
    refined = refine_bisection(comp_edges, sides0, rounds=5).localCheckpoint(
        eager=True
    )
    rec["refine_s"] = round(time.monotonic() - t0, 1)

    def cut_and_balance(sides):
        a = sides.select(F.col("vid").alias("src"), F.col("side").alias("sa"))
        b = sides.select(F.col("vid").alias("dst"), F.col("side").alias("sb"))
        cut = (
            comp_edges.join(a, "src")
            .join(b, "dst")
            .filter(F.col("sa") != F.col("sb"))
            .count()
        )
        n0 = sides.filter(F.col("side") == 0).count()
        n1 = sides.filter(F.col("side") == 1).count()
        return cut, n0, n1

    cut0, a0, b0 = cut_and_balance(sides0)
    cut1, a1, b1 = cut_and_balance(refined)
    rec["projected"] = {"cut": cut0, "side0": a0, "side1": b0}
    rec["refined"] = {"cut": cut1, "side0": a1, "side1": b1}
    rec["probe_post"] = round(membw(2, 4.0), 1)
    rec["total_s"] = round(
        rec["matching_s"] + rec["quotient_s"] + rec["fiedler_s"] + rec["refine_s"],
        1,
    )
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
