#!/usr/bin/env bash
# Round pre-flight (VERDICT r5 ask #7): the full local gate in ONE command,
# run before ending a round — encodes the round-4 lesson (a regression
# shipped because no end-to-end pass ran after the last source change).
#
#   tools/preflight.sh            # ~6-8 min on a healthy host
#
# Runs, in one sbt JVM: SmokeGateSpec (catalog + streaming tripwires),
# graft.Verify at sf0.001, then a 1-rep calibrated mini-bench at sf0.01;
# then the DuckDB oracle compare over the Verify output. Exits non-zero on
# ANY red: test failure, Verify-recorded query error, oracle mismatch, or
# bench-recorded query error.
set -u -o pipefail
cd "$(dirname "$0")/.."

OUT=/tmp/graft_preflight_out
LOG=/tmp/graft_preflight.log
: > "$LOG"
echo "preflight @ HEAD $(git rev-parse --short HEAD) ($(date -u +%FT%TZ))"

# One cold sbt JVM for all three stages (a warm `sbt --client` server would
# not see these env vars). sf dir/reps only affect the Bench stage; Verify
# takes explicit args.
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
SPARK_GRAFT_BENCH_REPS=1 \
SPARK_GRAFT_BENCH_ADAPTIVE=0 \
  sbt -batch \
    "testOnly graft.SmokeGateSpec" \
    "runMain graft.Verify /root/testdata/sf0.001 $OUT" \
    "runMain graft.Bench" >> "$LOG" 2>&1
rc=$?
if [ $rc -ne 0 ]; then
  echo "FAIL: sbt stage rc=$rc (SmokeGateSpec / Verify / Bench) -- see $LOG"
  tail -n 30 "$LOG"
  exit 1
fi

if [ "$(cat "$OUT/_errors.json")" != "{}" ]; then
  echo "FAIL: Verify recorded query errors:"
  cat "$OUT/_errors.json"
  exit 1
fi

if ! python3 tools/check.py /root/testdata/sf0.001 "$OUT" | tail -n 3; then
  echo "FAIL: oracle mismatch (tools/check.py) -- rerun for the full list"
  exit 1
fi

BENCH_LINE=$(grep -o '{"metric".*}' "$LOG" | tail -n 1)
if [ -z "$BENCH_LINE" ]; then
  echo "FAIL: no bench JSON line in $LOG"
  exit 1
fi
python3 - "$BENCH_LINE" <<'EOF'
import json, sys
d = json.loads(sys.argv[1])
if "qt" in d:
    # round-12 compact twin: dense "qNN:sec;..." string + n_errors count
    if d.get("n_errors", 0):
        print(f"FAIL: mini-bench recorded {d['n_errors']} query errors "
              f"(see the full line in the log)")
        sys.exit(1)
    n = len([e for e in d["qt"].split(";") if e])
else:
    errs = d.get("errors", {})
    if errs:
        print(f"FAIL: mini-bench recorded {len(errs)} query errors: "
              f"{', '.join(sorted(errs))}")
        sys.exit(1)
    n = len(d["queries"])
print(f"mini-bench ok: {n} queries, total "
      f"{float(d['value']):.1f}s raw, calib_sec {d.get('calib_sec', 0):.3f}")
EOF
rc=$?
[ $rc -ne 0 ] && exit 1

echo "PREFLIGHT GREEN"
