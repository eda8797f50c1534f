"""Per-edge shuffle-byte account for the PageRank kernel at two
parallelism levels.

The north rule's scaling criterion is about ENGINE overhead: does the
job do more work per edge when the cluster is 4x wider? The wall-clock
series (tools/cluster_bench.py) answers that indirectly, confounded by
the host's shared DRAM bus. This tool answers it directly from Spark's
own accounting: it runs the identical extraction + fixed-round
PageRank job at two parallelism levels in fresh JVMs, scrapes the
driver's REST status API (/api/v1/applications/<id>/stages) for the
completed stages' shuffle read/write and input bytes, and reports
bytes per edge-iteration at both levels.

If the engine's partitioning is sound, bytes/edge/iter is invariant to
the level (message volume is a function of the graph, not the worker
count) — any wall-clock efficiency below 1.0 is then attributable to
shared hardware, because Spark moved the SAME number of bytes. A
partitioning bug (e.g. a join that degrades to a broadcast-then-
recompute or a cartesian at higher parallelism) would show up as a
bytes blow-up at 4N, which no probe-paired wall series can separate
from bus noise.

Usage:
  python tools/shuffle_account.py [n_docs] [iters]          # orchestrate
  python tools/shuffle_account.py --leg local[N] docs.pq K  # one leg

Writes bench_out/shuffle_account.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_leg(master: str, docs_path: str, iters: int) -> None:
    """Child-process mode: run the job, print one JSON line with the
    stage-level byte totals split at the extraction/pagerank boundary."""
    from pyspark.sql import SparkSession

    cores = int(master.split("[")[1].rstrip("]"))
    parts = int(os.environ.get("CGS_PARTS_OVERRIDE", cores * 2))
    spark = (
        SparkSession.builder.master(master)
        .appName("cgs-shuffle-account")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.default.parallelism", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl  # e.g. http://host:4040
    app_id = spark.sparkContext.applicationId

    from citation_graph_spark.graph.ids import build_vertices
    from citation_graph_spark.extraction import build_edges
    from citation_graph_spark.graph import pagerank

    def stages() -> list[dict]:
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.load(r)

    def totals(recs: list[dict]) -> dict:
        keys = ("shuffleWriteBytes", "shuffleReadBytes", "inputBytes", "outputBytes")
        return {k: sum(int(s.get(k, 0)) for s in recs) for k in keys}

    docs = spark.read.parquet(docs_path)
    docs.count()  # warm executors / page cache outside the account

    verts = build_vertices(docs).cache()
    edges = build_edges(docs, verts).cache()
    n_edges = edges.count()
    n_verts = verts.count()
    pre = stages()
    pre_ids = {s["stageId"] for s in pre}

    pagerank(
        edges, verts.select("vid"), tol=0.0, max_iter=iters, num_partitions=parts
    ).count()

    post = stages()
    pr_stages = [s for s in post if s["stageId"] not in pre_ids]
    acct = {
        "master": master,
        "shuffle_partitions": parts,
        "vertices": n_verts,
        "edges": n_edges,
        "iterations": iters,
        "extract_phase": totals(pre),
        "pagerank_phase": totals(pr_stages),
        "pagerank_stage_count": len(pr_stages),
    }
    w = acct["pagerank_phase"]["shuffleWriteBytes"]
    acct["pagerank_shuffle_write_bytes_per_edge_iter"] = round(
        w / (n_edges * iters), 3
    )
    print("ACCT " + json.dumps(acct))
    spark.stop()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    levels = ["local[8]", "local[32]"]

    workdir = tempfile.mkdtemp(prefix="cgs-shufacct-")
    docs_path = os.path.join(workdir, "corpus.parquet")
    from citation_graph_spark.fixtures.corpus import generate_documents
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(generate_documents(n_docs, seed=42)),
        docs_path,
        row_group_size=25_000,
    )

    legs = []
    # third leg: wide master, NARROW partition count — a control that
    # separates "more workers" from "more shuffle partitions" as the
    # cause of any byte growth (combine dilution follows partitions)
    layouts = [(m, None) for m in levels] + [(levels[-1], "16")]
    for master, override in layouts:
        env = dict(os.environ)
        if override is not None:
            env["CGS_PARTS_OVERRIDE"] = override
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", master,
             docs_path, str(iters)],
            capture_output=True, text=True, cwd=REPO, timeout=3600, env=env,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("ACCT ")]
        if not line:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
            raise SystemExit(f"leg {master} produced no account")
        legs.append(json.loads(line[-1][5:]))
        print(f"# {master}: {legs[-1]['pagerank_phase']}", file=sys.stderr)

    a, b, ctrl = legs
    summary = {
        "job": "extraction + fixed-round PageRank, Spark REST stage account",
        "n_docs": n_docs,
        "levels": legs,
        "pagerank_shuffle_write_ratio_4x_vs_1x": round(
            b["pagerank_phase"]["shuffleWriteBytes"]
            / max(1, a["pagerank_phase"]["shuffleWriteBytes"]),
            4,
        ),
        "pagerank_shuffle_write_ratio_ctrl_vs_1x": round(
            ctrl["pagerank_phase"]["shuffleWriteBytes"]
            / max(1, a["pagerank_phase"]["shuffleWriteBytes"]),
            4,
        ),
        "interpretation": (
            "bytes/edge/iter is bounded by the uncombined message size (a "
            "constant independent of cluster width); growth between the "
            "narrow and wide legs is map-side-combine dilution, which the "
            "control leg (wide master, narrow partition count) isolates "
            "from worker count"
        ),
    }
    out_path = os.path.join(REPO, "bench_out", "shuffle_account.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        run_leg(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    else:
        main()
