"""Background DRAM-bus poller (scaling-evidence context).

Samples the 2-proc streaming-read probe (tools/membw_bench.py `run`)
every POLL_S seconds and appends one JSON line per sample to
bench_out/membw_poll.jsonl. When a sample clears THRESH_MB_S it also
touches bench_out/MEMBW_HEALTHY.flag — a cheap signal that the host
has re-entered the full-bus regime and a bandwidth-gated scaling
series (tools/cluster_bench.py) is worth firing NOW.

Unlike cluster_bench.py's built-in gate, this never launches the heavy
legs itself, so it can run for hours alongside foreground work: each
sample costs ~6 s of 2-core streaming.

Usage: python tools/membw_poll.py [poll_s] [thresh_mb_s]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from membw_bench import REPO, run  # noqa: E402

POLL_S = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
THRESH_MB_S = float(sys.argv[2]) if len(sys.argv) > 2 else 38000.0

OUT = os.path.join(REPO, "bench_out", "membw_poll.jsonl")
FLAG = os.path.join(REPO, "bench_out", "MEMBW_HEALTHY.flag")


def main() -> None:
    t_start = time.time()
    while True:
        mbs = run(2)
        rec = {"t_s": round(time.time() - t_start, 1), "mb_s_2proc": round(mbs, 1)}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if mbs >= THRESH_MB_S:
            with open(FLAG, "a") as f:
                f.write(json.dumps(rec) + "\n")
        time.sleep(POLL_S)


if __name__ == "__main__":
    main()
