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

Round-4 hardening: levels and repeats are parameters, legs are
INTERLEAVED (N, 4N, N, 4N, ...) with the 2-proc/8-proc streaming
probe recorded before and after every leg, and EVERY leg is reported —
the same all-runs-reported discipline as tools/cluster_bench.py. On
this host the per-core-throttled regime makes the hardware's own
bandwidth scaling level-dependent (bench_out/membw_poll.jsonl); the
recorded probes let a reader condition each pair on the bus state it
actually ran under.

Usage: python tools/scaling_bench.py [n_docs] [iters] [n] [n4] [repeats]
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
sys.path.insert(0, os.path.join(REPO, "tools"))

from membw_bench import run as membw_probe  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
LEVELS = (
    (int(sys.argv[3]), int(sys.argv[4])) if len(sys.argv) > 4 else (8, 32)
)
REPEATS = int(sys.argv[5]) if len(sys.argv) > 5 else 1


def materialize_corpus(path: str) -> None:
    from citation_graph_spark.fixtures.corpus import generate_documents
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_documents(N_DOCS, seed=42)
    # small row groups → the scan splits across cores instead of
    # serializing on one reader task (same fix as cluster_bench.py:
    # pyarrow's default is 1Mi rows = ONE row group at these sizes,
    # which silently caps the extraction stage at parallelism 1 and
    # fabricates a scaling ceiling that is the HARNESS, not the engine)
    pq.write_table(
        pa.Table.from_pandas(pdf),
        path,
        row_group_size=max(N_DOCS // 64, 5_000),
    )


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
        # Plain grow-on-demand heap — the late-r4 host regime reclaims
        # pre-touched pages and re-faults them slowly mid-job; the A/B
        # in bench_out/extract_ab_jvm.json measured AlwaysPreTouch at
        # 2-6x extraction slowdown (see session.py for the history).
        "--driver-memory",
        "24g",
        "--conf",
        "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
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
    # SPARK_GRAFT_CORPUS_PATH: reuse a pre-materialized corpus parquet
    # (same N_DOCS!) across gated retries — materialization is a
    # single-threaded ~7 min driver cost at 1.8M docs and sits OUTSIDE
    # every timed window, so reuse changes nothing measured
    docs_path = os.environ.get("SPARK_GRAFT_CORPUS_PATH", "")
    if not (docs_path and os.path.exists(docs_path)):
        docs_path = os.path.join(workdir, "corpus.parquet")
        print(
            f"# materializing corpus n={N_DOCS} → {docs_path}",
            file=sys.stderr,
        )
        materialize_corpus(docs_path)
    else:
        print(f"# reusing corpus at {docs_path}", file=sys.stderr)
    zip_path = build_pyfiles_zip(workdir)

    n, n4 = LEVELS
    factor = n4 / n

    def probe() -> dict:
        return {
            "mb_s_2proc": round(membw_probe(2), 1),
            "mb_s_8proc": round(membw_probe(8), 1),
        }

    def cpu_snap() -> list[int]:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]

    def cpu_delta(a: list[int], b: list[int]) -> dict:
        names = ("user", "nice", "system", "idle", "iowait",
                 "irq", "softirq", "steal", "guest", "gnice")
        d = [y - x for x, y in zip(a, b)]
        tot = sum(d) or 1
        # whole-box %, over ALL visible cpus for the leg's wall time —
        # steal/iowait here is the hypervisor/IO weather the leg ran
        # under; a leg with high steal measured the host, not the engine
        return {
            n: round(100.0 * v / tot, 2)
            for n, v in zip(names, d)
            if n in ("user", "system", "idle", "iowait", "steal") or v
        }

    runs = []
    for rep in range(1, REPEATS + 1):
        rec = {"run": rep, "probe_pre": probe()}
        results = {}
        for cores in LEVELS:  # interleaved within a run: n then n4
            print(f"# run {rep}: spark-submit local[{cores}] ...", file=sys.stderr)
            c0 = cpu_snap()
            results[cores] = spark_submit(zip_path, docs_path, cores)
            results[cores]["cpu_leg_pct"] = cpu_delta(c0, cpu_snap())
            print(f"#   {results[cores]}", file=sys.stderr)
            results[cores]["probe_post_leg"] = probe()
        eff = {
            k: round(results[n][k] / results[n4][k] / factor, 4)
            for k in ("total_s", "pagerank_s", "extract_s")
        }
        rec["levels"] = results
        rec["scaling_efficiency"] = eff
        print(f"# run {rep} efficiency: {eff}", file=sys.stderr)
        runs.append(rec)

    def med(key: str) -> float:
        vals = sorted(r["scaling_efficiency"][key] for r in runs)
        return vals[len(vals) // 2]

    summary = {
        "job": "extraction + pagerank",
        "protocol": (
            "interleaved legs, fresh JVM per leg (spark-submit), all runs"
            " reported; 2/8-proc streaming probe before each run and after"
            " every leg"
        ),
        "n_docs": N_DOCS,
        "iterations": ITERS,
        "levels_cores": list(LEVELS),
        "repeats": REPEATS,
        "runs": runs,
        "median_scaling_efficiency": {
            k: med(k) for k in ("total_s", "pagerank_s", "extract_s")
        },
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    with open(os.path.join(REPO, "bench_out", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
