#!/usr/bin/env bash
# Round-11 evidence chain — STRICTLY SERIAL, host-gated per timed leg.
#
# Closes VERDICT r10's remaining asks:
#   LC  (#1) multi-executor validation: the same queries on local[32] and
#       local-cluster[4,8,8192] (REAL executor JVMs: serialized netty
#       shuffle fetch, per-executor memory pools, inter-process
#       broadcast) at sf1, plus q85 at sf10 with 4x12g+off-heap. Plan
#       bytes (io_mb) should MATCH local[32]; wall tests the
#       constant-per-executor-data argument in SCALE.md.
#   ISO (#2) settle the q138/q81/q140/q52 cross-host watch cluster:
#       3-rep isolated legs at sf0.1 and sf1.
#   GR  (#3) sf10 correctness for the re-planned graph family
#       (q85/q106/q122/q132/q135 — the shuffle_hash hint changed
#       q85/q135's physical plan in round 10): Verify on the sf10
#       corpus, DuckDB oracle on the same parquet, generous timeout
#       (the q85 oracle triple-joins the full co-purchase edge set).
#   AB  (#6) full-bench off-heap A/B at sf0.1 (expect ~neutral at 8g
#       heaps — the round-10 win was big-heap-specific; pin it).
#
# Prereqs (run before this script):
#   sbt -batch package
#   sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /root/repo/.scale/sf1 10"
#   sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /root/repo/.scale/sf10 100"
set -euo pipefail
cd /root/repo

gate() { bash tools/hostgate.sh "$1" || echo "GATE GAVE UP before $1 (leg runs anyway; judge by its probes)"; }

echo "=== ISO: q138/q81/q140/q52 watch cluster, sf0.1 then sf1 (8g, 3 reps)"
for q in q138 q81 q140 q52; do
  gate "ISO-$q-sf0.1"
  SPARK_DRIVER_MEM=8g bash tools/isobench.sh "$q" /root/testdata/sf0.1 3 "BENCH_r11_sf0.1_iso_$q"
done
for q in q138 q81 q140 q52; do
  gate "ISO-$q-sf1"
  SPARK_DRIVER_MEM=8g bash tools/isobench.sh "$q" /root/repo/.scale/sf1 3 "BENCH_r11_sf1_iso_$q"
done

echo "=== LC: local[32] baselines at sf1 (24g heap + 20g off-heap — the r10 config)"
gate LC-base-sf1
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g \
  bash tools/isobench.sh q85,q120,q63,q31 /root/repo/.scale/sf1 3 BENCH_r11_sf1_local32
echo "=== LC: local-cluster[4,8,8192] at sf1 (4 x 6g heap + 5g off-heap = same totals)"
gate LC-lc-sf1
LC_WORKERS=4 LC_CORES=8 LC_MEM_MB=8192 LC_EXEC_MEM=6g LC_OFFHEAP=5g \
  bash tools/lcbench.sh q85,q120,q63,q31 /root/repo/.scale/sf1 3 BENCH_r11_sf1_lc
echo "=== LC: q85 sf10 local-cluster (4 x 12g heap + 8g off-heap)"
gate LC-lc-sf10
LC_WORKERS=4 LC_CORES=8 LC_MEM_MB=12800 LC_EXEC_MEM=12g LC_OFFHEAP=8g LC_DRIVER_MEM=12g \
  bash tools/lcbench.sh q85 /root/repo/.scale/sf10 3 BENCH_r11_sf10_lc_q85

echo "=== AB: full-bench off-heap A/B at sf0.1 (8g heap both sides)"
gate AB-onheap
SPARK_DRIVER_MEM=8g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*' > BENCH_r11_sf0.1_onheap.json
gate AB-offheap
SPARK_DRIVER_MEM=8g SPARK_GRAFT_OFFHEAP=8g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*' > BENCH_r11_sf0.1_offheap.json
python3 tools/benchcmp.py BENCH_r11_sf0.1_onheap.json BENCH_r11_sf0.1_offheap.json \
  --label-old onheap --label-new offheap || true

echo "=== GR: sf10 graph-family correctness (untimed — runs after all timed legs)"
Q="q85_triangle_counts,q106_kcore,q122_connected_components"
Q="$Q,q132_label_propagation,q135_clustering_coef"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/repo/.scale/sf10 /root/repo/.scale/verify_sf10graph $Q" \
  2>/dev/null | tail -2
python3 tools/check.py /root/repo/.scale/sf10 /root/repo/.scale/verify_sf10graph \
  --oracle-timeout=5400 \
  --subset-label="FULL sf10 corpus (60M-row lineitem co-purchase graph; re-planned SHJ family)" \
  | tee /tmp/check_r11_sf10_body.txt
echo "=== r11 evidence chain complete"
