#!/usr/bin/env bash
# Round-10 evidence chain v2 — STRICTLY SERIAL, host-gated per leg.
#
# Restructured after leg 1 of v1 cracked the q85 flag: at 48 GB heap the
# triangle join's on-heap Tungsten pages cost G1 6-16 s PER young
# evacuation (BENCH_r10_sf1_iso_q85: 47 s vs the 10.8 s 8-GB r9
# comparable, zero host contention, GC log smoking gun) — and ALL r9
# sf10 legs ran 48 GB while their sf1 baselines ran 8 GB, so the 16.79x
# "flag" compared heap configs, not data growth. The chain now measures
# the decomposition directly:
#   A: q85 sf1  @8g (r9 parity) and @24g heap + 20g OFF-HEAP (the fix)
#   B: q85/q120/q169 sf10 @24g+20g off-heap (vs r9's 48g on-heap readings)
#   C: q168 sf0.1 + sf1 @8g (like-for-like with the r8/r9 driver numbers)
#   D: 2000-doc SubCorpus of sf10 -> Verify -> DuckDB subset check
set -euo pipefail
cd /root/repo

gate() { bash tools/hostgate.sh "$1" || echo "GATE GAVE UP before $1 (leg runs anyway; judge by its probes)"; }

gate A1; echo "=== A1: q85 sf1 @8g"
SPARK_DRIVER_MEM=8g bash tools/isobench.sh q85 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso8g_q85
gate A2; echo "=== A2: q85 sf1 @24g heap + 20g off-heap"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q85 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso_offheap_q85
gate B1; echo "=== B1: q85 sf10 @24g heap + 20g off-heap"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q85 /root/repo/.scale/sf10 3 BENCH_r10_sf10_iso_offheap_q85
gate B2; echo "=== B2: q120 sf10 @24g heap + 20g off-heap"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q120 /root/repo/.scale/sf10 3 BENCH_r10_sf10_iso_offheap_q120
gate B3; echo "=== B3: q169 sf10 @24g heap + 20g off-heap"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_OFFHEAP=20g bash tools/isobench.sh q169 /root/repo/.scale/sf10 3 BENCH_r10_sf10_iso_offheap_q169
gate C1; echo "=== C1: q168 sf0.1 @8g"
SPARK_DRIVER_MEM=8g bash tools/isobench.sh q168 /root/testdata/sf0.1 3 BENCH_r10_sf0.1_iso_q168
gate C2; echo "=== C2: q168 sf1 @8g"
SPARK_DRIVER_MEM=8g bash tools/isobench.sh q168 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso_q168

echo "=== D: sf10 subset correctness"
SPARK_DRIVER_MEM=16g sbt -batch \
  "runMain graft.SubCorpus /root/repo/.scale/sf10 /root/repo/.scale/sf10sub 2000" \
  2>/dev/null | tail -2
Q="q31_dedup_ngram_jaccard,q32_dedup_minhash_lsh,q48_dedup_clusters"
Q="$Q,q56_dedup_corpus,q157_dup_source_matrix,q159_dup_cluster_sizes"
Q="$Q,q163_dedup_source_stats,q165_dedup_threshold_sweep,q166_ingest_dedup"
Q="$Q,q63_window_ranks,q140_rfm_segments"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/repo/.scale/sf10sub /root/repo/.scale/verify_sf10sub $Q" \
  2>/dev/null | tail -2
python3 tools/check.py /root/repo/.scale/sf10sub /root/repo/.scale/verify_sf10sub \
  --oracle-timeout=900 \
  --subset-label="2000-doc md5-stable subcorpus of sf10 (q63/q140 read the FULL hardlinked sf10 lineitem/orders)" \
  | tee /tmp/check_r10_sf10_body.txt
echo "=== evidence chain complete"
