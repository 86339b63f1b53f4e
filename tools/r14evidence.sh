#!/usr/bin/env bash
# Round-14 evidence chain — STRICTLY SERIAL (never overlap a timed leg
# with anything; the r9 isolation lesson).
#
#   A: negative window exhibit — Bench under tools/contend.sh must stamp
#      window=degraded (the synthetic twin of the r13/r14 real windows)
#   B: SessionChurn — 40 dropped connection sessions through the memo
#      path at sf0.1, global budget 330 MB (~3 coPurchase tables)
#   C: MemoCompose 3-session global-cap demo at sf10 (27 GB cap: A+B fit,
#      C trips it -> coldest session's tables evicted, sum stays bounded)
#   D: sf1 oracle close-out — full-corpus check (165 runnable) plus the 9
#      brute-force twins on a 2000-doc md5-stable SubCorpus of sf1
#      -> CHECK_r14_sf1.txt with all 174 verified, 0 unverified
set -euo pipefail
cd /root/repo

echo "=== A: negative window exhibit (deliberate contention)"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_ONLY=q01,q02,q03,q04,q05,q06,q07,q08 \
  bash tools/contend.sh 24 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_r14_contended.log 2>&1 || true
grep -o '{"metric".*' /tmp/bench_r14_contended.log | sed 's/\x1b\[[0-9;]*[A-Za-z]//g' \
  > BENCH_r14_sf0.1_window_negative.json
grep -o '"window":"[a-z]*","window_ratio":[0-9.]*' BENCH_r14_sf0.1_window_negative.json | head -1

echo "=== B: SessionChurn (40 connections, sf0.1, global budget 330 MB)"
GRAFT_MEMO_GLOBAL_BUDGET_MB=330 sbt -batch \
  "runMain graft.SessionChurn /root/testdata/sf0.1 MEMOCHURN_r14_sessions.json 40" \
  2>&1 | tail -3

echo "=== C: MemoCompose 3-session global-cap demo at sf10"
SPARK_DRIVER_MEM=48g GRAFT_MEMO_GLOBAL_BUDGET_MB=27000 sbt -batch \
  "runMain graft.MemoCompose /root/repo/.scale/sf10 MEMOCOMPOSE_r14_sf10_3s.json q122,q111,q132 3" \
  2>&1 | tail -3

echo "=== D1: sf1 full-corpus verify + oracle check (brute-force twins time out)"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/repo/.scale/sf1 /root/repo/.scale/verify_r14_sf1" \
  2>&1 | tail -2
python3 tools/check.py /root/repo/.scale/sf1 /root/repo/.scale/verify_r14_sf1 \
  --oracle-timeout=300 | tee /tmp/check_r14_sf1_full.txt | tail -3

echo "=== D2: the 9 brute-force twins on a 2000-doc SubCorpus of sf1"
SPARK_DRIVER_MEM=16g sbt -batch \
  "runMain graft.SubCorpus /root/repo/.scale/sf1 /root/repo/.scale/sf1sub 2000" \
  2>&1 | tail -2
Q="q31_dedup_ngram_jaccard,q32_dedup_minhash_lsh,q48_dedup_clusters"
Q="$Q,q56_dedup_corpus,q157_dup_source_matrix,q159_dup_cluster_sizes"
Q="$Q,q163_dedup_source_stats,q165_dedup_threshold_sweep,q166_ingest_dedup"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/repo/.scale/sf1sub /root/repo/.scale/verify_r14_sf1sub $Q" \
  2>&1 | tail -2
python3 tools/check.py /root/repo/.scale/sf1sub /root/repo/.scale/verify_r14_sf1sub \
  --oracle-timeout=900 \
  --subset-label="2000-doc md5-stable subcorpus of sf1 (the r10 sf10 playbook applied to the last 9 sf1 skips)" \
  | tee /tmp/check_r14_sf1_subset.txt | tail -3

echo "=== evidence chain complete"
