#!/usr/bin/env bash
# Multi-executor validation leg (VERDICT r10 missing #1): run selected
# bench queries on `local-cluster[W,C,M]` — REAL worker/executor JVMs on
# this box, exercising the three mechanisms local[32] structurally
# cannot: serialized netty shuffle fetch between processes, PER-EXECUTOR
# memory pools (heap + off-heap), and inter-process broadcast. This is
# the closest single-box approximation of the 1000-executor claim the
# SCALE.md cluster-transfer argument rests on: plan BYTES should match
# local[32] exactly (same plan), while per-executor working sets shrink
# to 1/W of the monolithic JVM's.
#
# Usage: tools/lcbench.sh <query> <sfdir> <reps> <outbase>
#   e.g. tools/lcbench.sh q85 /root/repo/.scale/sf1 3 BENCH_r11_lc_sf1_q85
#
# Knobs (env):
#   LC_WORKERS / LC_CORES / LC_MEM_MB  cluster shape (default 4, 8, 8192)
#   LC_EXEC_MEM     executor heap (default 6g; must fit LC_MEM_MB)
#   LC_OFFHEAP      per-executor off-heap pool, e.g. 8g (default off)
#   LC_DRIVER_MEM   driver heap (default 8g)
#
# Launches through spark-submit so the worker/executor JVMs inherit
# SPARK_HOME and the packaged graft jar (spark.jars ships it to every
# executor); graft.Bench picks the master up via SPARK_GRAFT_MASTER
# (an explicit .master() in code would silently override --master).
# Run `sbt -batch package` first — this script does not rebuild.
set -euo pipefail
q=$1; sf=$2; reps=$3; out=$4
W="${LC_WORKERS:-4}"; C="${LC_CORES:-8}"; M="${LC_MEM_MB:-8192}"
cd /root/repo
JAR=target/scala-2.13/clickhouse_etlspark_2.13-0.1.0.jar
[ -f "$JAR" ] || { echo "missing $JAR — run: sbt -batch package" >&2; exit 2; }
export SPARK_HOME=/opt/spark
master="local-cluster[$W,$C,$M]"
SPARK_GRAFT_MASTER="$master" \
SPARK_GRAFT_CPUS=$((W * C)) \
SPARK_GRAFT_BENCH_REPS="$reps" \
SPARK_GRAFT_BENCH_ONLY="$q" \
SPARK_GRAFT_SF_DIR="$sf" \
"$SPARK_HOME/bin/spark-submit" \
  --master "$master" \
  --driver-memory "${LC_DRIVER_MEM:-8g}" \
  --conf spark.executor.memory="${LC_EXEC_MEM:-6g}" \
  --conf spark.ui.enabled=false \
  ${LC_OFFHEAP:+--conf spark.memory.offHeap.enabled=true \
    --conf spark.memory.offHeap.size="$LC_OFFHEAP"} \
  --class graft.Bench "$JAR" 2>"$out.stderr.log" \
  | grep -o '{"metric".*' > "$out.json"
echo "== $out ($master exec=${LC_EXEC_MEM:-6g} offheap=${LC_OFFHEAP:-none})"
tail -1 "$out.json"
