#!/usr/bin/env bash
# Round-10 evidence chain, part 4 — same-host config-fixed growth pairs.
# The part-1 sf10 off-heap legs (q120 69.0 s, q169 38.5 s) ran on the
# recycled machine instance; F5/F6 measured their sf1 twins on THIS host.
# These legs complete every pair on one host:
#  G1: q85  sf1  @24g+20g off-heap — same-config twin for F3 (sf10 225.5 s)
#  G2: q85  sf10 @24g ON-heap      — does the GC knee need 48g, or does it
#                                    bite at 24g too once the sf10
#                                    adjacency lives on-heap?
#  G3: q120 sf10 @24g+20g off-heap — this-host twin for F5 (sf1 4.29 s)
#  G4: q169 sf10 @24g+20g off-heap — this-host twin for F6 (sf1 11.06 s)
set -uo pipefail
cd /root/repo
gate() { bash tools/hostgate.sh "$1" || echo "GATE GAVE UP before $1 (leg runs anyway; judge by its probes)"; }

gate G1; echo "=== G1: q85 sf1 @24g+20g off-heap"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q85 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso_offheap2_q85
gate G2; echo "=== G2: q85 sf10 @24g on-heap"
SPARK_DRIVER_MEM=24g bash tools/isobench.sh q85 /root/repo/.scale/sf10 2 BENCH_r10_sf10_iso24g_q85
gate G3; echo "=== G3: q120 sf10 @24g+20g off-heap"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q120 /root/repo/.scale/sf10 2 BENCH_r10_sf10_iso_offheap2_q120
gate G4; echo "=== G4: q169 sf10 @24g+20g off-heap"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q169 /root/repo/.scale/sf10 2 BENCH_r10_sf10_iso_offheap2_q169
echo "=== part-4 chain complete"
