#!/bin/bash
# Probe-gated 2v8 scaling retry (round 5): poll the 2-proc streaming
# probe; when the bus reads >= $GATE MB/s (default 16000 — the r4o
# 0.886-efficiency run fired at 17.4 GB/s), run ONE fresh-JVM
# interleaved 2v8 repeat at 1.8M docs and stop. All probes + runs
# logged; the corpus parquet is reused across tries (materialization
# is outside every timed window).
cd "$(dirname "$0")/.."
LOG=${SPARK_GRAFT_GATE_LOG:-bench_out/gated_scaling_r5.log}
GATE=${SPARK_GRAFT_MEMBW_GATE_MB_S:-16000}
TRIES=${SPARK_GRAFT_GATE_TRIES:-30}
for i in $(seq 1 "$TRIES"); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
  if [ "$LOAD" -ge 6 ]; then
    echo "$(date +%H:%M:%S) busy load=$LOAD" >> "$LOG"; sleep 200; continue
  fi
  BW=$(python -c "
import sys; sys.path.insert(0,'tools')
from membw_bench import run
print(int(run(2, seconds=4.0)))" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe2 $BW" >> "$LOG"
  if [ -n "$BW" ] && [ "$BW" -ge "$GATE" ]; then
    echo "$(date +%H:%M:%S) firing 2v8 single-repeat series" >> "$LOG"
    python tools/scaling_bench.py 1800000 20 2 8 1 \
      > bench_out/scaling_r5_gated.log 2>&1
    cp bench_out/scaling.json bench_out/scaling_r5b_2v8_1800k_gated.json
    echo "$(date +%H:%M:%S) series done" >> "$LOG"
    exit 0
  fi
  sleep 200
done
echo "$(date +%H:%M:%S) gave_up" >> "$LOG"
