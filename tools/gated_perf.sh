#!/bin/bash
# Bandwidth-gated perf runner: polls the 2-proc streaming membw probe
# (tools/membw_bench.py) and fires bench.py + a 2v8 fixed-JVM scaling
# series (tools/scaling_bench.py) only on a healthy bus — the
# BASELINE.md probe-pairing discipline, automated. All probes logged.
cd "$(dirname "$0")/.."
LOG=${SPARK_GRAFT_GATE_LOG:-bench_out/gated_perf.log}
GATE=${SPARK_GRAFT_MEMBW_GATE_MB_S:-33000}
for i in $(seq 1 "${SPARK_GRAFT_GATE_TRIES:-40}"); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
  if [ "$LOAD" -ge 6 ]; then
    echo "$(date +%H:%M:%S) busy load=$LOAD" >> "$LOG"; sleep 240; continue
  fi
  BW=$(python -c "
import sys; sys.path.insert(0,'tools')
from membw_bench import run
print(int(run(2, seconds=4.0)))" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe2 $BW" >> "$LOG"
  if [ -n "$BW" ] && [ "$BW" -ge "$GATE" ]; then
    echo "$(date +%H:%M:%S) firing bench" >> "$LOG"
    python bench.py > bench_out/bench_gated.json 2>/dev/null
    echo "$(date +%H:%M:%S) bench done; firing 2v8 series" >> "$LOG"
    python tools/scaling_bench.py 1800000 20 2 8 2 \
      > bench_out/scaling_gated.log 2>&1
    echo "$(date +%H:%M:%S) series done" >> "$LOG"
    exit 0
  fi
  sleep 240
done
echo "$(date +%H:%M:%S) gave_up" >> "$LOG"
