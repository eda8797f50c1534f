"""N vs 4N scaling-efficiency evidence (north rule: ≥0.8).

A real multi-executor cluster is unavailable in the sandbox, so — per
the driver instruction — the same job runs at two parallelism levels
(``local[8]`` vs ``local[32]``) on the SAME materialized input, each in
a fresh JVM via ``spark-submit --py-files`` (the north-rule launch
mode). Efficiency = (T_N / T_4N) / 4.

The job is the engine's critical path: vectorized edge extraction over
the corpus + a fixed number of PageRank rounds. Corpus size is chosen
so per-task compute dominates fixed per-round scheduling overhead —
the same regime a 1000-executor run at 100 TB lives in.

Usage: python tools/scaling_bench.py [n_docs] [iters]
Writes bench_out/scaling.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
LEVELS = (8, 32)


def materialize_corpus(path: str) -> None:
    from citation_graph_spark.fixtures.corpus import generate_documents
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_documents(N_DOCS, seed=42)
    pq.write_table(pa.Table.from_pandas(pdf), path)


def build_pyfiles_zip(workdir: str) -> str:
    base = os.path.join(workdir, "cgs")
    shutil.make_archive(base, "zip", REPO, "citation_graph_spark")
    return base + ".zip"


def spark_submit(zip_path: str, docs_path: str, cores: int) -> dict:
    env = dict(os.environ)
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        # memory/JVM flags must be on the submit line: the driver JVM is
        # already running by the time SparkSession.builder confs are read.
        # Fixed-size pre-touched heap: this kernel's page-fault path is
        # ~10x slow (see session.py).
        "--driver-memory",
        "24g",
        "--conf",
        "spark.driver.extraJavaOptions=-Xms24g -XX:+AlwaysPreTouch -XX:+UseParallelGC",
        "--conf",
        "spark.local.dir=/dev/shm/spark-local",
        "--py-files",
        zip_path,
        os.path.join(REPO, "tools", "scaling_job.py"),
        docs_path,
        str(cores),
        str(ITERS),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, check=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in output:\n{out.stdout}\n{out.stderr[-2000:]}")


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="cgs-scaling-")
    docs_path = os.path.join(workdir, "corpus.parquet")
    print(f"# materializing corpus n={N_DOCS} → {docs_path}", file=sys.stderr)
    materialize_corpus(docs_path)
    zip_path = build_pyfiles_zip(workdir)

    results = {}
    for cores in LEVELS:
        print(f"# spark-submit local[{cores}] ...", file=sys.stderr)
        results[cores] = spark_submit(zip_path, docs_path, cores)
        print(f"#   {results[cores]}", file=sys.stderr)

    n, n4 = LEVELS
    speedup = {
        k: results[n][k] / results[n4][k] for k in ("total_s", "pagerank_s", "extract_s")
    }
    eff = {k: round(v / (n4 / n), 4) for k, v in speedup.items()}
    summary = {
        "job": "extraction + pagerank",
        "n_docs": N_DOCS,
        "iterations": ITERS,
        "levels": results,
        "speedup": {k: round(v, 3) for k, v in speedup.items()},
        "scaling_efficiency": eff,
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    with open(os.path.join(REPO, "bench_out", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
