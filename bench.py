"""Bench harness — one JSON line per run (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and the
north-rule PageRank pipeline (synthesized corpus → vectorized
extraction → iterative kernel) at bench scale, then prints ONE JSON
line::

    {"metric": "headline_total_wall", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <float>,
     "pagerank": {iterations, iters_per_sec, edges, edges_per_sec}}

The per-query set deliberately spans the engine surface: scan+agg,
multi-join star, as-of join, sessionization, MinHash LSH, shingle
Jaccard, brute-force kNN, text profiling, and the four graph kernels
on the co-order part graph. Quadratic correctness baselines
(all-pairs cosine/simhash joins) are excluded — LSH is the scale path.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "top_revenue_customers",
    "nation_trade_pairs",
    "asof_view_before_purchase",
    "event_sessions",
    "text_quality",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "knn_cosine_topk",
    "graph_part_degrees",
    "graph_part_components",
    "graph_part_pagerank",
    "graph_part_triangles",
    # r4: the density family's scale paths — regressions in the IVF
    # ε-join or the Borůvka MSF show up as numbers, not just plans
    "dbscan_embedding_ivf",
    "hdbscan_embedding_ivf",
    # r4 late additions: the curation/tokenization pipeline stages —
    # pii_redaction measures JVM regex throughput (pure codegen map),
    # context_packing the shard-window packing shuffle
    "pii_redaction",
    "context_packing",
    # r4 bibliometrics: the wedge self-join (co-citation) and the
    # fixed-round attenuated-walk kernel (Katz) get their own numbers
    "corpus_cocitation",
    "corpus_katz",
    # r4 topology pack: HyperBall's per-round register shuffle and the
    # SCC→condensation-relaxation composition get their own numbers
    "corpus_hyperball",
    "corpus_generations",
    # r4 session 4: the symmetry-breaking round kernel (JP coloring =
    # MIS winner plan + mex per round) and the sort-order dedup rung
    # (range-exchange global rank + block-keyed window pairing)
    "graph_part_coloring",
    "dedup_sorted_neighborhood",
    # r5: the round-4 heavyweight additions get regression-visible
    # numbers (VERDICT r4 "What's missing" #2). The three partition
    # queries share a per-session memo of the matching/Fiedler chain,
    # so multilevel carries the chain cost and refine/quality measure
    # their own incremental stages.
    "graph_part_multilevel_partition",
    "graph_part_partition_refine",
    "graph_part_louvain_two_level",
    "graph_part_edge_betweenness",
    "graph_part_msf",
]

BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))


def _membw_worker(q, seconds: float) -> None:
    # module-level so mp works under spawn/forkserver start methods too
    import numpy as np

    a = np.random.rand(64 * 1024 * 1024 // 8)
    t0 = time.monotonic()
    t_end = t0 + seconds
    n = 0
    s = 0.0
    while time.monotonic() < t_end:
        s += float(a.sum())
        n += 1
    elapsed = time.monotonic() - t0  # divide by MEASURED time: the last
    q.put(n * 64 / elapsed)  # pass may overrun the nominal budget


def _host_membw_probe(seconds: float = 4.0) -> float:
    """Aggregate 2-process streaming-read MB/s — the host-drift context
    for this run. The sandbox host's visible DRAM bandwidth drifts
    ~30-50% between sessions and every memory-bound query moves with
    it (BASELINE.md "Host-drift caveat"), so each BENCH record carries
    its own bandwidth reading: compare rounds via queries÷bandwidth,
    not raw seconds."""
    import multiprocessing as mp

    q: "mp.Queue" = mp.Queue()
    procs = [
        mp.Process(target=_membw_worker, args=(q, seconds)) for _ in range(2)
    ]
    for x in procs:
        x.start()
    rates = [q.get() for _ in procs]
    for x in procs:
        x.join()
    return round(sum(rates), 1)


def main() -> None:
    from citation_graph_spark.session import get_spark
    from citation_graph_spark import operators

    operators.load_all()
    membw = _host_membw_probe()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="cgs-bench")
    t_all = time.monotonic()
    query_secs: dict[str, float] = {}
    for name in HEADLINE:
        fn = operators.QUERIES[name]
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        query_secs[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {n} rows in {query_secs[name]}s", file=sys.stderr)

    # north-rule metric: PageRank iterations/sec + edges/sec to 1e-6
    # convergence on the extracted corpus edge table
    from citation_graph_spark.fixtures.corpus import documents_spark_df
    from citation_graph_spark.graph.ids import build_vertices
    from citation_graph_spark.extraction import build_edges
    from citation_graph_spark.graph import pagerank

    # pre-materialize the corpus as parquet OUTSIDE the timed window so
    # corpus_extraction measures scan + extract (the engine), not
    # driver-side fixture serialization
    corpus_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bench_out",
        f"corpus_{BENCH_DOCS}",
    )
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        documents_spark_df(spark, BENCH_DOCS, seed=42).write.mode(
            "overwrite"
        ).parquet(corpus_dir)

    t0 = time.monotonic()
    docs = spark.read.parquet(corpus_dir)
    verts = build_vertices(docs).cache()
    edges = build_edges(docs, verts).cache()
    n_edges = edges.count()
    extract_s = time.monotonic() - t0

    with tempfile.NamedTemporaryFile(suffix=".jsonl", delete=False) as f:
        metrics_path = f.name
    t0 = time.monotonic()
    pagerank(edges, verts.select("vid"), tol=1e-6, metrics_path=metrics_path).count()
    pr_s = time.monotonic() - t0
    with open(metrics_path) as f:
        recs = [json.loads(ln) for ln in f]
    iters = max(r["iteration"] for r in recs)
    query_secs["corpus_extraction"] = round(extract_s, 3)
    query_secs["corpus_pagerank"] = round(pr_s, 3)

    total = time.monotonic() - t_all
    out = {
        "metric": "headline_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": query_secs,
        "sf": sf,
        "pagerank": {
            "bench_docs": BENCH_DOCS,
            "edges": n_edges,
            "iterations": iters,
            "iters_per_sec": round(iters / pr_s, 3),
            "edges_per_sec": round(iters * n_edges / pr_s, 1),
        },
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
        "host_membw_2proc_mb_s": membw,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
