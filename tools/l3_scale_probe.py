"""Shared-LLC (L3) contention probe (scaling-evidence context).

Third axis of the host-attribution account, alongside
tools/membw_bench.py (DRAM streaming) and tools/cpu_scale_probe.py
(cache-resident arithmetic): a kernel whose per-process working set is
sized to the last-level cache. At 2 processes the working sets fit in
the shared L3 and run at cache speed; at 8 they exceed it and every
process is demoted to DRAM latency. The 2-proc → 8-proc throughput
ratio of THIS kernel therefore measures the one single-box resource
that neither of the other probes sees: LLC capacity contention.

Why it matters for the north rule: on N physically separate hosts each
executor brings its own L3, so a 2→8-core demotion measured here is a
sandbox artifact, not engine overhead. A Spark leg pair whose per-core
throughput drop matches this probe's is bounded by the box.

The kernel is a strided read-modify-write sweep over a per-process
float64 buffer (default 12 MiB) — enough reuse to live in cache when
it fits, no streaming-prefetch friendliness that would hide the miss
cost.

Usage: python tools/l3_scale_probe.py [buf_mib] [secs_per_leg]
Prints one JSON line; appends to bench_out/l3_scale_probe.jsonl.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUF_MIB = 12.0
SECS = 6.0


def _worker(buf_mib: float, secs: float, out) -> None:
    import numpy as np

    n = int(buf_mib * 1024 * 1024 // 8)
    buf = np.arange(n, dtype=np.float64)
    # stride of 8 doubles = one 64B cache line per access → every access
    # is a distinct line; the sweep reuses the same lines every pass
    idx = np.arange(0, n, 8)
    t_end = time.monotonic() + secs
    sweeps = 0
    while time.monotonic() < t_end:
        buf[idx] += 1.0  # numpy fancy-index RMW, C-speed
        sweeps += 1
    out.put(sweeps * len(idx) * 64)  # bytes of cache lines touched


def run(procs: int, buf_mib: float, secs: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(buf_mib, secs, q))
        for _ in range(procs)
    ]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / (time.monotonic() - t0) / 1e6  # MB/s of lines touched


def main() -> None:
    import sys

    buf_mib = float(sys.argv[1]) if len(sys.argv) > 1 else BUF_MIB
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else SECS
    series = []
    for procs in (2, 8, 2, 8, 2, 8):
        series.append(
            {"procs": procs, "line_mb_s": round(run(procs, buf_mib, secs), 1)}
        )
    two = sorted(r["line_mb_s"] for r in series if r["procs"] == 2)[1]
    eight = sorted(r["line_mb_s"] for r in series if r["procs"] == 8)[1]
    rec = {
        "t_unix": round(time.time(), 1),
        "buf_mib_per_proc": buf_mib,
        "series": series,
        "median_2proc_line_mb_s": two,
        "median_8proc_line_mb_s": eight,
        "per_proc_ratio_8_vs_2": round((eight / 4.0) / two, 3),
        "llc_gain_eff_4x": round(eight / two / 4.0, 3),
    }
    with open(os.path.join(REPO, "bench_out", "l3_scale_probe.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
