#!/bin/bash
# Dual-probe-gated perf re-run (round 5). The r5 first-pass bench ran
# 1.5-2x slower than BENCH_r04 at EQUAL 2-proc streaming bandwidth
# (16.8 vs 17.4 GB/s) — the divergent axis is the dependent
# pointer-chase probe (bench_out/memlat_scale_probe.jsonl: 2-proc
# median 36-52 M chases/s during the r4 recordings, 19.6 today), i.e.
# the latency/mem-parallelism regime a JVM actually lives in. So gate
# on BOTH axes: 2-proc streaming >= $GATE_BW MB/s AND 2-proc chase
# median >= $GATE_LAT M/s, then fire bench.py and one fresh-JVM 2v8
# series at 1.8M docs (corpus reused — outside every timed window).
# All probes logged; every fired run keeps its own probe pairing.
cd "$(dirname "$0")/.."
LOG=${SPARK_GRAFT_GATE_LOG:-bench_out/gated_scaling_r5.log}
GATE_BW=${SPARK_GRAFT_MEMBW_GATE_MB_S:-16500}
GATE_LAT=${SPARK_GRAFT_MEMLAT_GATE_M_S:-35}
TRIES=${SPARK_GRAFT_GATE_TRIES:-40}
for i in $(seq 1 "$TRIES"); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
  if [ "$LOAD" -ge 6 ]; then
    echo "$(date +%H:%M:%S) busy load=$LOAD" >> "$LOG"; sleep 200; continue
  fi
  BW=$(python -c "
import sys; sys.path.insert(0,'tools')
from membw_bench import run
print(int(run(2, seconds=4.0)))" 2>/dev/null)
  LAT=$(python tools/memlat_scale_probe.py 2>/dev/null | python -c "
import json,sys
print(int(json.loads(sys.stdin.readline())['median_2proc_m_chases_s']))" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe2 bw=$BW lat=$LAT" >> "$LOG"
  if [ -n "$BW" ] && [ -n "$LAT" ] && [ "$BW" -ge "$GATE_BW" ] && [ "$LAT" -ge "$GATE_LAT" ]; then
    echo "$(date +%H:%M:%S) gates clear — firing bench" >> "$LOG"
    python bench.py > bench_out/bench_local_r5_gated4.json 2>/dev/null
    echo "$(date +%H:%M:%S) bench done — firing 2v8 single-repeat series" >> "$LOG"
    SPARK_GRAFT_CORPUS_PATH=bench_out/scaling_corpus_1800k.parquet \
      python tools/scaling_bench.py 1800000 20 2 8 1 \
      > bench_out/scaling_r5_gated4.log 2>&1
    cp bench_out/scaling.json bench_out/scaling_r5e_2v8_1800k_gated4.json
    echo "$(date +%H:%M:%S) series done" >> "$LOG"
    exit 0
  fi
  sleep 200
done
echo "$(date +%H:%M:%S) gave_up" >> "$LOG"
