#!/usr/bin/env bash
# Round-10 evidence chain, part 2 — the q85 growth adjudication legs.
#  E1: q85 sf10 @8g  — the SAME-CONFIG pair for the clean sf1 @8g 9.3 s
#      baseline: growth with the heap variable held fixed.
#  E2: q85 sf10 @24g heap + 20g off-heap — retry of B1, whose reading
#      (435 s) self-identified mid-run contamination (end calib 1.27 s
#      vs 0.205 idle).
#  E3: q85 sf1 @24g ON-heap — decomposes the 28.4 s off-heap sf1 reading:
#      memory-size execution effect vs GC evacuation effect.
set -euo pipefail
cd /root/repo
gate() { bash tools/hostgate.sh "$1" || echo "GATE GAVE UP before $1 (leg runs anyway; judge by its probes)"; }

gate E1; echo "=== E1: q85 sf10 @8g"
SPARK_DRIVER_MEM=8g bash tools/isobench.sh q85 /root/repo/.scale/sf10 3 BENCH_r10_sf10_iso8g_q85
gate E2; echo "=== E2: q85 sf10 @24g+20g off-heap (B1 retry)"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q85 /root/repo/.scale/sf10 3 BENCH_r10_sf10_iso_offheap2_q85
gate E3; echo "=== E3: q85 sf1 @24g on-heap"
SPARK_DRIVER_MEM=24g bash tools/isobench.sh q85 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso24g_q85
echo "=== part-2 chain complete"
