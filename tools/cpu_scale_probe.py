"""Pure-CPU parallel-scaling probe (scaling-evidence context).

Discriminates the two host-side explanations for a low N→4N Spark
scaling number on this sandbox:

- DRAM-side: per-core/aggregate bandwidth throttling (what
  tools/membw_bench.py measures with a streaming read), vs
- CPU-side: the compute allocation itself not scaling with process
  count (cgroup CPU quota, oversubscription by a noisy neighbor,
  frequency capping under multi-core load).

The kernel is cache-resident integer/float arithmetic over a 16 KiB
buffer — it touches effectively zero DRAM bandwidth, so its 2-proc →
8-proc throughput ratio isolates the CPU axis. A healthy host scores
gain_eff_4x ≈ 1.0; a host whose visible CPU is quota-capped below 8
cores scores proportionally less, and a Spark job on it cannot scale
regardless of engine quality.

Usage: python tools/cpu_scale_probe.py [secs_per_leg]
Prints one JSON line; appends to bench_out/cpu_scale_probe.jsonl.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SECS = 6.0


def _worker(secs: float, out) -> None:
    # 2048 float64 = 16 KiB — resident in L1; pure FMA-ish arithmetic
    import array

    buf = array.array("d", range(2048))
    t_end = time.monotonic() + secs
    iters = 0
    acc = 0.0
    while time.monotonic() < t_end:
        for i in range(0, 2048, 8):
            acc += buf[i] * 1.0000001 + buf[i + 4]
        iters += 1
    out.put((iters, acc))


def run(procs: int, secs: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_worker, args=(secs, q)) for _ in range(procs)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    total = sum(q.get()[0] for _ in ps)
    for p in ps:
        p.join()
    wall = time.monotonic() - t0
    return total / wall  # aggregate kernel-iterations/sec


def main() -> None:
    import sys

    secs = float(sys.argv[1]) if len(sys.argv) > 1 else SECS
    series = []
    for procs in (2, 8, 2, 8, 2, 8):
        series.append({"procs": procs, "agg_iters_s": round(run(procs, secs), 1)})
    two = sorted(r["agg_iters_s"] for r in series if r["procs"] == 2)[1]
    eight = sorted(r["agg_iters_s"] for r in series if r["procs"] == 8)[1]
    rec = {
        "t_unix": round(time.time(), 1),
        "series": series,
        "median_2proc_iters_s": two,
        "median_8proc_iters_s": eight,
        "cpu_gain_4x_procs": round(eight / two, 3),
        "cpu_gain_eff": round(eight / two / 4.0, 3),
    }
    with open(os.path.join(REPO, "bench_out", "cpu_scale_probe.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
