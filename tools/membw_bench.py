"""Shared-DRAM ceiling microbenchmark (scaling-evidence context).

Measures aggregate streaming-read bandwidth at 2 vs 8 single-threaded
processes — the thread counts of the 1-worker and 4-worker legs of
tools/cluster_bench.py (2 cores per executor). If the box's bus gives
8 threads only ~1.7x the bandwidth of 2, a fully bandwidth-bound phase
can never show weak-scaling efficiency above ~0.44 on ONE box, while
four physically separate hosts would hold per-executor bandwidth
constant. Quantifies why single-box 4-worker numbers bound the
multi-host result from below.

Usage: python tools/membw_bench.py   (writes bench_out/membw.json)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(q, seconds: float) -> None:
    a = np.random.rand(64 * 1024 * 1024 // 8)  # 64 MB streamed per pass
    t0 = time.monotonic()
    t_end = t0 + seconds
    n = 0
    s = 0.0
    while time.monotonic() < t_end:
        s += float(a.sum())
        n += 1
    elapsed = time.monotonic() - t0
    # divide by MEASURED elapsed (the last pass overruns the nominal
    # budget) — same estimator as bench.py's embedded probe
    q.put(n * 64 / elapsed)  # MB/s for this process


def run(p: int, seconds: float = 6.0) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q, seconds)) for _ in range(p)]
    for x in procs:
        x.start()
    rates = [q.get() for _ in procs]
    for x in procs:
        x.join()
    return sum(rates)


def main() -> None:
    series = []
    for p in (2, 8, 2, 8, 2, 8):  # interleaved, same discipline as cluster_bench
        mbs = run(p)
        series.append({"procs": p, "aggregate_mb_s": round(mbs, 1)})
        print(series[-1], flush=True)
    med2 = sorted(r["aggregate_mb_s"] for r in series if r["procs"] == 2)[1]
    med8 = sorted(r["aggregate_mb_s"] for r in series if r["procs"] == 8)[1]
    out = {
        "series": series,
        "median_2proc_mb_s": med2,
        "median_8proc_mb_s": med8,
        "bandwidth_gain_4x_threads": round(med8 / med2, 3),
        "bandwidth_bound_weak_efficiency": round(med8 / med2 / 4, 3),
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    # default target is membw_latest.json — bench_out/membw.json is the
    # committed full-bandwidth BASELINE recording (cited by BASELINE.md)
    # and must not be clobbered by drift re-measurements; pass an
    # explicit filename to write elsewhere
    import sys

    name = sys.argv[1] if len(sys.argv) > 1 else "membw_latest.json"
    with open(os.path.join(REPO, "bench_out", name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
