#!/bin/bash
# Cluster launcher — the spark-submit shape the north rule deploys with
# (BASELINE.json: "run via spark-submit on a multi-executor cluster at N
# and 4N executors"). The sandbox has no cluster manager (driver
# instruction: local[N] is the proxy, measured in scaling_gated.sh), so
# this script documents the real invocation and also works against
# --master local[*].
#
#   MASTER=yarn EXECUTORS=32 scripts/submit.sh graft.Bench
#   MASTER=yarn EXECUTORS=128 scripts/submit.sh graft.Bench   # the 4N leg
#
# Sizing rationale (matches the engine's design assumptions):
#  - 5 cores/executor: HDFS-client sweet spot, keeps per-task memory sane.
#  - 20g + 4g overhead: a build partition's sort buffers + the tf cache
#    slice fit without spill at the default numPartitions = total cores.
#  - AQE on: runtime skew-join/partition handling backs up the explicit
#    salting (SURVEY §2.3 I4); shuffle.partitions starts at 2x total
#    cores and AQE coalesces down.
#  - Dynamic allocation OFF for benchmarks: fixed N is the point.
set -eu
MAIN=${1:?usage: [MASTER=...] [EXECUTORS=N] scripts/submit.sh <mainClass> [args...]}
shift
MASTER=${MASTER:-"local[32]"}
EXECUTORS=${EXECUTORS:-32}
CORES=${CORES:-5}
JAR=${JAR:-target/scala-2.13/informationretrievalspark_2.13-0.1.0.jar}
TOTAL_CORES=$((EXECUTORS * CORES))

exec "${SPARK_HOME:-/opt/spark}"/bin/spark-submit \
  --class "$MAIN" \
  --master "$MASTER" \
  --deploy-mode "${DEPLOY_MODE:-client}" \
  --num-executors "$EXECUTORS" \
  --executor-cores "$CORES" \
  --executor-memory "${EXECUTOR_MEM:-20g}" \
  --conf spark.executor.memoryOverhead=4g \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --conf spark.dynamicAllocation.enabled=false \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions=$((TOTAL_CORES * 2)) \
  --conf spark.sql.files.maxPartitionBytes=256m \
  --conf spark.serializer=org.apache.spark.serializer.KryoSerializer \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.extensions=graft.functions.GraftExtensions \
  "$JAR" "$@"
