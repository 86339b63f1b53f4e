#!/usr/bin/env bash
# Round-10 evidence chain, part 3 — run on the FRESH host (the part-1/2
# machine instance was recycled mid-round; .scale regenerates
# deterministically, but cross-host raw seconds don't compare, so every
# growth pair below is measured ON THIS HOST in one chain).
#
#  F1: q85 sf1  @8g               — baseline for F2 (heap held fixed)
#  F2: q85 sf10 @8g               — growth with NO config change; if 8g
#                                   starves the MemoryStore at sf10, that
#                                   is itself the finding (document, don't
#                                   hide behind a bigger heap)
#  F3: q85 sf10 @24g+20g off-heap — retry of part-1 B1 (435 s reading
#                                   self-identified end-calib 1.27 s
#                                   contamination)
#  F4: q85 sf1  @24g ON-heap      — decomposes part-1's 28.4 s off-heap
#                                   sf1 reading: heap-size effect vs GC
#                                   evacuation effect vs off-heap path
#  F5: q120 sf1 @24g+20g off-heap — same-config sf1 twin for the part-1
#                                   sf10 off-heap reading (69.0 s)
#  F6: q169 sf1 @24g+20g off-heap — same, for 38.5 s
set -euo pipefail
cd /root/repo
gate() { bash tools/hostgate.sh "$1" || echo "GATE GAVE UP before $1 (leg runs anyway; judge by its probes)"; }

gate F1; echo "=== F1: q85 sf1 @8g"
SPARK_DRIVER_MEM=8g bash tools/isobench.sh q85 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso8g_q85_h2
gate F2; echo "=== F2: q85 sf10 @8g"
SPARK_DRIVER_MEM=8g bash tools/isobench.sh q85 /root/repo/.scale/sf10 2 BENCH_r10_sf10_iso8g_q85
gate F3; echo "=== F3: q85 sf10 @24g+20g off-heap (B1 retry)"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q85 /root/repo/.scale/sf10 2 BENCH_r10_sf10_iso_offheap2_q85
gate F4; echo "=== F4: q85 sf1 @24g on-heap"
SPARK_DRIVER_MEM=24g bash tools/isobench.sh q85 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso24g_q85
gate F5; echo "=== F5: q120 sf1 @24g+20g off-heap"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q120 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso_offheap_q120
gate F6; echo "=== F6: q169 sf1 @24g+20g off-heap"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q169 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso_offheap_q169
echo "=== part-3 chain complete"
