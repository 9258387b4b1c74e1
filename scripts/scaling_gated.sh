#!/bin/bash
# Load-gated scaling measurement: the sandbox has co-tenant load spikes
# (loadavg 2 -> 28 on ~10-min periods) that corrupt wall-clock benchmarks.
# This harness only starts an interleaved local[8]/local[32] pair when the
# 1-min load is low, tags each leg with the load at start AND end, and
# appends JSON lines to $OUT. Pairs whose both legs ran under load<GATE
# are the valid sample. (awk for float math — no bc in this image.)
set -u
OUT=${OUT:-/tmp/scaling_results.jsonl}
DOCS=${DOCS:-600000}
PAIRS=${PAIRS:-3}
GATE=${GATE:-6}
cd /root/repo
mkdir -p /dev/shm/spark-local
gt() { awk -v a="$1" -v b="$2" 'BEGIN{exit !(a>b)}'; }
collected=0
while [ "$collected" -lt "$PAIRS" ]; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  if gt "$load" "$GATE"; then
    sleep 60
    continue
  fi
  ok=1
  t8=0; t32=0
  for c in 8 32; do
    l0=$(cut -d' ' -f1 /proc/loadavg)
    # best of 2 trials in ONE JVM: excludes first-trial JVM/page-cache
    # warmup (measured ~90s at 600k/local[32]), which is amortized noise
    # at the design point, not a scaling property
    line=$(SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_DRIVER_MEM=${MEM:-48g} \
      SPARK_GRAFT_CPUS=$c SPARK_GRAFT_TRIALS=2 \
      sbt -batch "runMain graft.tools.BuildProfile $DOCS" 2>/dev/null \
      | grep -oE 'BEST [0-9.]+' | awk '{printf "%d", $2*1000}')
    l1=$(cut -d' ' -f1 /proc/loadavg)
    echo "{\"docs\":$DOCS,\"cpus\":$c,\"buildMillis\":${line:-0},\"load0\":$l0,\"load1\":$l1}" >> "$OUT"
    if [ "$c" = "8" ]; then t8=${line:-0}; else t32=${line:-0}; fi
    # gate on PRE-leg load only: the leg itself (local[32]) raises loadavg,
    # so post-leg load measures our own work, not co-tenants
    if gt "$l0" "$GATE" || [ -z "$line" ]; then ok=0; fi
    sleep 45  # let our own load decay before reading the next gate
  done
  if [ "$ok" = "1" ]; then
    collected=$((collected+1))
    eff=$(awk -v a="$t8" -v b="$t32" 'BEGIN{printf "%.3f", a/(4*b)}')
    echo "{\"pair\":$collected,\"t8_ms\":$t8,\"t32_ms\":$t32,\"efficiency\":$eff}" >> "$OUT"
  fi
done
rm -rf /dev/shm/spark-local
echo DONE >> "$OUT"
