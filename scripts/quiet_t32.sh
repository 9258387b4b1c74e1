#!/bin/bash
# Opportunistic quiet-window 32-core leg: waits for 1-min loadavg < GATE,
# then runs one TRIALS-trial BuildProfile leg and appends the result to
# $OUT with pre/post load tags. One shot — rerun for more samples.
set -u
OUT=${OUT:-/root/repo/BENCH/scaling_r3_runs.jsonl}
DOCS=${DOCS:-600000}
GATE=${GATE:-2.0}
TRIALS=${TRIALS:-4}
CPUS=${CPUS:-32}
cd /root/repo
mkdir -p /dev/shm/spark-local
gt() { awk -v a="$1" -v b="$2" 'BEGIN{exit !(a>b)}'; }
while :; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  gt "$load" "$GATE" || break
  sleep 45
done
l0=$(cut -d' ' -f1 /proc/loadavg)
out=$(SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_TRIALS=$TRIALS \
  sbt -batch "runMain graft.tools.BuildProfile $DOCS" 2>/dev/null)
l1=$(cut -d' ' -f1 /proc/loadavg)
best=$(echo "$out" | grep -oE 'BEST [0-9.]+' | awk '{printf "%d", $2*1000}')
series=$(echo "$out" | grep -oE 'TOTAL trial=[0-9]+ [0-9.]+' | awk '{printf "%s%d", sep, $3*1000; sep=","}')
echo "{\"docs\":$DOCS,\"cpus\":$CPUS,\"buildMillis\":${best:-0},\"load0\":$l0,\"load1\":$l1,\"trials\":$TRIALS,\"series\":[$series],\"note\":\"quiet-window watcher\"}" >> "$OUT"
