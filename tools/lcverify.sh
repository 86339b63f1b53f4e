#!/usr/bin/env bash
# Multi-executor CORRECTNESS leg (round 11): run graft.Verify — the full
# oracle-gated query set — on `local-cluster[W,C,M]`, i.e. real
# worker/executor JVMs with serialized shuffle fetch, per-executor memory
# pools, and inter-process broadcast. tools/lcbench.sh already pins that
# PLAN BYTES are identical across masters; this leg pins the stronger
# property the 1000-executor story actually needs: every query's RESULT
# hashes identically when execution moves off the single shared-memory
# JVM. Operators whose output could conceivably depend on topology —
# sampling mixtures, LSH banding, collect_list orderings, rank-model
# collects, streaming micro-batches — all go through the same DuckDB
# oracle as the local[32] gate.
#
# Usage: tools/lcverify.sh <sfdir> <outdir> [query-filter]
#   e.g. tools/lcverify.sh /root/testdata/sf0.01 /root/repo/.scale/verify_lc
# then: python3 tools/check.py <sfdir> <outdir>
#
# Knobs (env): LC_WORKERS/LC_CORES/LC_MEM_MB/LC_EXEC_MEM/LC_DRIVER_MEM
# Run `sbt -batch package` first — this script does not rebuild.
set -euo pipefail
sf=$1; out=$2; only="${3:-}"
W="${LC_WORKERS:-4}"; C="${LC_CORES:-8}"; M="${LC_MEM_MB:-8192}"
cd /root/repo
JAR=target/scala-2.13/clickhouse_etlspark_2.13-0.1.0.jar
[ -f "$JAR" ] || { echo "missing $JAR — run: sbt -batch package" >&2; exit 2; }
export SPARK_HOME=/opt/spark
# the stderr redirect below opens before Verify's in-process mkdirs runs —
# a fresh checkout path like .scale/verify_lc needs its parent NOW
mkdir -p "$(dirname "$out")"
master="local-cluster[$W,$C,$M]"
SPARK_GRAFT_MASTER="$master" \
SPARK_GRAFT_CPUS=$((W * C)) \
"$SPARK_HOME/bin/spark-submit" \
  --master "$master" \
  --driver-memory "${LC_DRIVER_MEM:-8g}" \
  --conf spark.executor.memory="${LC_EXEC_MEM:-6g}" \
  --conf spark.ui.enabled=false \
  --class graft.Verify "$JAR" "$sf" "$out" ${only:+"$only"} \
  2>"$out.stderr.log" || { tail -5 "$out.stderr.log" >&2; exit 1; }
echo "== lcverify done: $out ($master exec=${LC_EXEC_MEM:-6g})"
