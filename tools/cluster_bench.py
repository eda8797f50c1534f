"""N vs 4N executor scaling on a REAL (local) standalone cluster.

The north rule asks for throughput scaling efficiency ≥0.8 between
cluster sizes N and 4N executors. The sandbox has one machine, so this
harness launches an actual Spark standalone cluster on it — a master
process plus separate worker JVMs (each worker hosts one executor JVM
with its own heap, GC, shuffle server and Python workers) — and runs
the SAME job (spark-submit --py-files, the north-rule launch mode)
against 1 worker and 4 workers with identical per-executor resources.

This is materially closer to multi-executor scaling than local[N]
thread counts: executors are independent processes exchanging shuffle
blocks over the network stack, exactly as on a 1000-node cluster. The
one shared resource the sandbox cannot split is DRAM bandwidth —
reported numbers therefore UNDERSTATE what 4 physically separate hosts
would do.

Protocol (round-2 hardening, VERDICT r1 item 6): legs are INTERLEAVED
(1, 4, 1, 4, ...) with a fresh set of worker JVMs launched and torn
down for every leg, repeated ``repeats`` times, and EVERY leg is
reported — no favorable-pair selection. Interleaving distributes
turbo/thermal/page-cache drift symmetrically across both levels
instead of letting it accumulate into one.

Round-4 hardening (VERDICT r3 item 6): the series is BANDWIDTH-GATED.
The host's visible DRAM bandwidth oscillates 27-45 GB/s on 30-60 min
timescales (bench_out/membw_drift_20260817.json); a series started on
a sick bus measures the neighbor's workload, not the engine. Before
every repeat the harness polls the streaming probe and fires when
EITHER condition clears (or the poll budget
``$SPARK_GRAFT_MEMBW_GATE_TIMEOUT_S``, default 3600 s, runs out — in
which case the repeat still runs and is still reported, marked
cleared=false). EVERY probe is recorded; nothing is silently retried
or dropped. The two clearing conditions correspond to the two healthy
regimes this host exhibits:

- absolute: 2-proc probe ≥ ``$SPARK_GRAFT_MEMBW_GATE_MB_S`` (default
  40000) — the full-bus regime, where a few threads can already pull
  the machine's entire bandwidth.
- gain: bw(8 procs)/bw(2 procs)/4 ≥ ``$SPARK_GRAFT_MEMBW_GATE_GAIN_EFF``
  (default 0.8) AND bw(8 procs) ≥ ``$SPARK_GRAFT_MEMBW_GATE_MIN8_MB_S``
  (default 40000) — the per-core-throttled regime, where each core's
  bandwidth is capped well below the bus total so quadrupling threads
  quadruples aggregate bandwidth. What confounds an N→4N *scaling*
  measurement is bus SATURATION (both legs compete for one fixed
  total), not a low absolute level; a throttled-but-linear bus is
  exactly the resource shape of 4 physically separate hosts, each
  bringing its own memory controller — the regime the docstring above
  says these numbers should model. The gain gate certifies the
  hardware itself can sustain ≥0.8 weak bandwidth scaling at 4×
  threads, so an engine efficiency below that is attributable to the
  engine, and one at/above it is a true pass. The absolute 8-proc
  floor exists because the r4c series showed gain-eff alone is not
  sufficient: a bus collapsed to a 9.9 GB/s aggregate still probed
  gain-eff 1.02 (bench_out/cluster_scaling_r4c.json run 3), and legs
  run on such a bus take 2-4x longer, exposing them to the host's
  30-60 min bandwidth oscillation mid-leg — the exact confound the
  gate exists to exclude.

Usage: python tools/cluster_bench.py [n_docs] [iters] [mode] [repeats]
Writes bench_out/cluster_scaling.json.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from membw_bench import run as membw_probe  # noqa: E402

MEMBW_GATE_MB_S = float(os.environ.get("SPARK_GRAFT_MEMBW_GATE_MB_S", "40000"))
MEMBW_GATE_GAIN_EFF = float(
    os.environ.get("SPARK_GRAFT_MEMBW_GATE_GAIN_EFF", "0.8")
)
MEMBW_GATE_MIN8_MB_S = float(
    os.environ.get("SPARK_GRAFT_MEMBW_GATE_MIN8_MB_S", "40000")
)
MEMBW_GATE_TIMEOUT_S = float(
    os.environ.get("SPARK_GRAFT_MEMBW_GATE_TIMEOUT_S", "3600")
)
MEMBW_GATE_POLL_S = float(os.environ.get("SPARK_GRAFT_MEMBW_GATE_POLL_S", "120"))


def wait_for_healthy_bus() -> dict:
    """Poll the streaming probe (2-proc and 8-proc) until either gate
    condition clears or the budget runs out. Every probe is recorded
    and returned — the honesty contract: a repeat that ran on a sick
    bus says so in the artifact, it is never silently retried or
    dropped."""
    probes: list[dict] = []
    t0 = time.time()
    while True:
        bw2 = round(membw_probe(2, seconds=4.0), 1)
        bw8 = round(membw_probe(8, seconds=4.0), 1)
        gain_eff = round(bw8 / bw2 / 4.0, 4)
        probes.append(
            {
                "t_s": round(time.time() - t0, 1),
                "mb_s": bw2,
                "mb_s_8proc": bw8,
                "gain_eff_4x": gain_eff,
            }
        )
        cleared_abs = bw2 >= MEMBW_GATE_MB_S
        cleared_gain = (
            gain_eff >= MEMBW_GATE_GAIN_EFF and bw8 >= MEMBW_GATE_MIN8_MB_S
        )
        cleared = cleared_abs or cleared_gain
        print(
            f"# membw gate: 2p {bw2:.0f} MB/s (abs need {MEMBW_GATE_MB_S:.0f}), "
            f"8p {bw8:.0f} MB/s → gain-eff {gain_eff:.2f} "
            f"(need {MEMBW_GATE_GAIN_EFF:.2f} and 8p ≥ {MEMBW_GATE_MIN8_MB_S:.0f})"
            f"{' — firing' if cleared else ''}",
            file=sys.stderr,
        )
        if cleared or (time.time() - t0) > MEMBW_GATE_TIMEOUT_S:
            return {
                "gate_mb_s": MEMBW_GATE_MB_S,
                "gate_gain_eff": MEMBW_GATE_GAIN_EFF,
                "gate_min8_mb_s": MEMBW_GATE_MIN8_MB_S,
                "cleared": cleared,
                "cleared_by": (
                    "absolute" if cleared_abs
                    else "gain" if cleared_gain
                    else None
                ),
                "probes": probes,
            }
        time.sleep(MEMBW_GATE_POLL_S)

# sized so steady-state per-round compute dominates fixed per-round
# driver latency (~0.2s) and JIT warmup — the regime a real cluster
# job at 100 TB lives in
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
# weak scaling: per-executor load held constant (N_DOCS at 1 worker,
# 4*N_DOCS at 4 workers); strong scaling: same N_DOCS at both levels
MODE = sys.argv[3] if len(sys.argv) > 3 else "both"
REPEATS = int(sys.argv[4]) if len(sys.argv) > 4 else 3

HOST = "127.0.0.1"
MASTER_PORT = 7077
MASTER_UI = 8080
# 2-core executors: 4N = 8 concurrent threads, below this machine's
# DRAM-bandwidth saturation point (~12 threads, measured) — the regime
# that faithfully models adding physically separate executors, which
# bring their own memory bus. Larger per-executor shapes on this one
# box measure the shared bus, not Spark's scaling.
CORES_PER_EXEC = 2
EXEC_MEM = "12g"
LEVELS = (1, 4)

SPARK_CLASS = "/opt/spark/bin/spark-class"
ENV = dict(
    os.environ,
    SPARK_LOCAL_IP=HOST,
    SPARK_MASTER_HOST=HOST,
    SPARK_NO_DAEMONIZE="1",
)


def wait_for(url: str, pred, timeout_s: int = 60):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            with urllib.request.urlopen(url, timeout=5) as r:
                data = json.loads(r.read())
            if pred(data):
                return data
        except Exception:
            pass
        time.sleep(1)
    raise TimeoutError(url)


def launch(args, logfile):
    return subprocess.Popen(
        args, env=ENV, stdout=logfile, stderr=subprocess.STDOUT,
        preexec_fn=os.setsid,
    )


def stop(proc):
    if proc and proc.poll() is None:
        os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)


def materialize_corpus(path: str, n_docs: int) -> None:
    from citation_graph_spark.fixtures.corpus import generate_documents
    import pyarrow as pa
    import pyarrow.parquet as pq

    # small row groups -> the scan splits across executors instead of
    # serializing on one reader task
    pq.write_table(
        pa.Table.from_pandas(generate_documents(n_docs, seed=42)),
        path,
        row_group_size=25_000,
    )


def submit(zip_path: str, docs_path: str, n_workers: int) -> dict:
    parts = CORES_PER_EXEC * n_workers * 2
    cmd = [
        "spark-submit",
        "--master", f"spark://{HOST}:{MASTER_PORT}",
        "--deploy-mode", "client",
        "--driver-memory", "4g",
        # plain grow-on-demand heaps: AlwaysPreTouch is 2-6x slower in
        # the late-r4 host regime (bench_out/extract_ab_jvm.json)
        "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", f"spark.executor.cores={CORES_PER_EXEC}",
        "--conf", f"spark.executor.memory={EXEC_MEM}",
        "--conf", f"spark.executor.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        # AQE's partition coalescing starves Arrow/Python stages
        # (measured 2.6x extraction slowdown) and adds per-round stage
        # re-planning latency to the iterative kernels
        "--conf", "spark.sql.adaptive.enabled=false",
        "--conf", "spark.sql.join.preferSortMergeJoin=false",
        # loopback shuffle: compression costs CPU (the contended
        # resource) and saves no real network
        "--conf", "spark.shuffle.compress=false",
        "--conf", "spark.shuffle.spill.compress=false",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "scaling_job.py"),
        docs_path, str(parts), str(ITERS),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=ENV, check=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON in output:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


_LEG_SEQ = [0]  # distinct worker ports per leg (avoid TIME_WAIT reuse)


def run_leg(zip_path: str, docs_path: str, n_workers: int, log) -> dict:
    """Launch a FRESH set of worker JVMs, run the job, tear them down."""
    leg = _LEG_SEQ[0] = _LEG_SEQ[0] + 1
    workers = [
        launch(
            [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
             "--host", HOST, "--port", str(9100 + 8 * (leg % 100) + i),
             "--webui-port", str(8180 + 8 * (leg % 100) + i),
             "--cores", str(CORES_PER_EXEC), "--memory", "14g",
             f"spark://{HOST}:{MASTER_PORT}"],
            log,
        )
        for i in range(n_workers)
    ]
    try:
        wait_for(
            f"http://{HOST}:{MASTER_UI}/json/",
            lambda d: len([w for w in d.get("workers", []) if w["state"] == "ALIVE"])
            >= n_workers,
        )
        return submit(zip_path, docs_path, n_workers)
    finally:
        for w in workers:
            stop(w)
        wait_for(
            f"http://{HOST}:{MASTER_UI}/json/",
            lambda d: not [w for w in d.get("workers", []) if w["state"] == "ALIVE"],
            timeout_s=90,
        )


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="cgs-cluster-")
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    corpus_n = os.path.join(workdir, "corpus_n.parquet")
    print(f"# materializing corpus n={N_DOCS}", file=sys.stderr)
    materialize_corpus(corpus_n, N_DOCS)
    corpus_4n = None
    if MODE in ("weak", "both"):
        corpus_4n = os.path.join(workdir, "corpus_4n.parquet")
        print(f"# materializing corpus n={4 * N_DOCS} (weak-scaling leg)", file=sys.stderr)
        materialize_corpus(corpus_4n, 4 * N_DOCS)
    zip_base = os.path.join(workdir, "cgs")
    shutil.make_archive(zip_base, "zip", REPO, "citation_graph_spark")
    zip_path = zip_base + ".zip"

    log = open(os.path.join(workdir, "cluster.log"), "w")
    master = launch(
        [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
         "--host", HOST, "--port", str(MASTER_PORT), "--webui-port", str(MASTER_UI)],
        log,
    )
    n, n4 = LEVELS
    runs: list[dict] = []
    try:
        wait_for(f"http://{HOST}:{MASTER_UI}/json/", lambda d: d.get("status") == "ALIVE")
        for rep in range(REPEATS):
            rec: dict = {"run": rep + 1, "membw_gate": wait_for_healthy_bus()}
            # interleaved: 1-worker leg immediately followed by 4-worker
            # leg, fresh worker JVMs for each — symmetric warmth
            if MODE in ("strong", "both"):
                s1 = run_leg(zip_path, corpus_n, n, log)
                s4 = run_leg(zip_path, corpus_n, n4, log)
                rec["strong"] = {
                    "levels": {str(n): s1, str(n4): s4},
                    "scaling_efficiency": {
                        k: round(s1[k] / s4[k] / (n4 / n), 4)
                        for k in ("total_s", "pagerank_s", "extract_s")
                    },
                }
                print(f"# run {rep + 1} strong: {rec['strong']['scaling_efficiency']}",
                      file=sys.stderr)
            if MODE in ("weak", "both"):
                w1 = run_leg(zip_path, corpus_n, n, log)
                w4 = run_leg(zip_path, corpus_4n, n4, log)
                rec["weak"] = {
                    "levels": {str(n): w1, str(n4): w4},
                    "scaling_efficiency": {
                        k: round(w1[k] / w4[k], 4)
                        for k in ("total_s", "pagerank_s", "extract_s")
                    },
                }
                print(f"# run {rep + 1} weak: {rec['weak']['scaling_efficiency']}",
                      file=sys.stderr)
            rec["membw_post_mb_s"] = round(membw_probe(2, seconds=4.0), 1)
            runs.append(rec)
    finally:
        stop(master)
        log.close()

    def median_eff(mode: str) -> dict | None:
        vals = [r[mode]["scaling_efficiency"] for r in runs if mode in r]
        if not vals:
            return None
        out = {}
        for k in ("total_s", "pagerank_s", "extract_s"):
            xs = sorted(v[k] for v in vals)
            out[k] = xs[len(xs) // 2] if len(xs) % 2 else round(
                (xs[len(xs) // 2 - 1] + xs[len(xs) // 2]) / 2, 4
            )
        return out

    summary = {
        "job": "extraction + pagerank (standalone cluster, separate executor JVMs)",
        "protocol": (
            "interleaved legs, fresh worker JVMs per leg, all runs reported; "
            "bandwidth-gated: 2-proc probe must clear gate_mb_s before each "
            "repeat (or the poll budget expires — marked cleared=false), "
            "every probe recorded"
        ),
        "n_docs": N_DOCS,
        "iterations": ITERS,
        "cores_per_executor": CORES_PER_EXEC,
        "executor_memory": EXEC_MEM,
        "repeats": REPEATS,
        "runs": runs,
        "median_scaling_efficiency": {
            m: v for m in ("strong", "weak") if (v := median_eff(m))
        },
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    with open(os.path.join(REPO, "bench_out", "cluster_scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
