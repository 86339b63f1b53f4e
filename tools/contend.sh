#!/usr/bin/env bash
# Deliberate whole-box contention wrapper (round 14): runs CMD while N
# busy-spin shell processes steal cores — the synthetic twin of the
# r13 "parallel-capacity window" — so the Bench host-health gate can be
# demonstrated NEGATIVELY (a run under this wrapper must stamp
# "window":"degraded" while its single-thread calib stays ~flat).
# Usage: tools/contend.sh <nSpinners> <cmd...>
set -euo pipefail
N="$1"; shift
pids=()
for _ in $(seq "$N"); do
  ( while :; do :; done ) &
  pids+=($!)
done
trap 'kill "${pids[@]}" 2>/dev/null || true' EXIT
"$@"
