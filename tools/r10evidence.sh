#!/usr/bin/env bash
# Round-10 evidence chain — STRICTLY SERIAL (bench isolation is absolute:
# BENCH_r09_sf1_isolated.json is the committed negative exhibit of what a
# concurrent side job does to timed reps). Each leg finishes before the
# next starts; nothing else may run on the box.
#
#  1. q85  sf1 + sf10, isolated, GC-logged  (VERDICT r9 ask #1 — the flag)
#  2. q120 / q169 sf10, isolated, GC-logged (GC-storm-probe cases)
#  3. q168 sf0.1 + sf1, isolated            (ask #6 — retroactive-session cost)
#  4. 2000-doc SubCorpus of sf10 -> Verify -> DuckDB subset check
#     for the 9 brute-force families + q63/q140  (ask #5)
set -euo pipefail
cd /root/repo

# Each timed leg starts only when the host-health gate passes (round-10
# lesson: leg 1's first attempt started inside a neighbor-contention
# window — calib_pq read 4x its r9 norm and q85 sf1 read 74.5 s vs the
# 10.8 s clean comparable). If the gate gives up, the leg still runs —
# its own in-run probes adjudicate — but the giving-up is logged.
gate() { bash tools/hostgate.sh "$1" || echo "GATE GAVE UP before $1 (leg runs anyway; judge by its probes)"; }

gate leg1; echo "=== leg 1: q85 sf1 (iso, gc-logged)"
bash tools/isobench.sh q85 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso_q85
gate leg2; echo "=== leg 2: q85 sf10 (iso, gc-logged)"
bash tools/isobench.sh q85 /root/repo/.scale/sf10 3 BENCH_r10_sf10_iso_q85
gate leg3; echo "=== leg 3: q120 sf10 (iso, gc-logged)"
bash tools/isobench.sh q120 /root/repo/.scale/sf10 3 BENCH_r10_sf10_iso_q120
gate leg4; echo "=== leg 4: q169 sf10 (iso, gc-logged)"
bash tools/isobench.sh q169 /root/repo/.scale/sf10 3 BENCH_r10_sf10_iso_q169
gate leg5; echo "=== leg 5: q168 sf0.1 (iso)"
bash tools/isobench.sh q168 /root/testdata/sf0.1 3 BENCH_r10_sf0.1_iso_q168
gate leg6; echo "=== leg 6: q168 sf1 (iso)"
bash tools/isobench.sh q168 /root/repo/.scale/sf1 3 BENCH_r10_sf1_iso_q168

echo "=== leg 7: sf10 subset correctness"
SPARK_DRIVER_MEM=16g sbt -batch \
  "runMain graft.SubCorpus /root/repo/.scale/sf10 /root/repo/.scale/sf10sub 2000" \
  2>/dev/null | tail -2
Q="q31_dedup_ngram_jaccard,q32_dedup_minhash_lsh,q48_dedup_clusters"
Q="$Q,q56_dedup_corpus,q157_dup_source_matrix,q159_dup_cluster_sizes"
Q="$Q,q163_dedup_source_stats,q165_dedup_threshold_sweep,q166_ingest_dedup"
Q="$Q,q63_window_ranks,q140_rfm_segments"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/repo/.scale/sf10sub /root/repo/.scale/verify_sf10sub $Q" \
  2>/dev/null | tail -2
python3 tools/check.py /root/repo/.scale/sf10sub /root/repo/.scale/verify_sf10sub \
  --oracle-timeout=900 \
  --subset-label="2000-doc md5-stable subcorpus of sf10 (q63/q140 read the FULL hardlinked sf10 lineitem/orders)" \
  | tee /tmp/check_r10_sf10_body.txt
echo "=== evidence chain complete"
