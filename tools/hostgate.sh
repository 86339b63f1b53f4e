#!/usr/bin/env bash
# Block until the host reads healthy: N consecutive probes (10 s apart)
# with single-thread <= $GATE_ST s and 32-thread parallel <= $GATE_PT s.
# Usage: tools/hostgate.sh [label]   (env: GATE_ST=0.125 GATE_PT=0.125
# GATE_N=3 GATE_MAX_MIN=45 — gives up after GATE_MAX_MIN minutes and
# exits 1 so the caller can decide)
set -euo pipefail
label="${1:-gate}"
st_max="${GATE_ST:-0.125}"
pt_max="${GATE_PT:-0.125}"
need="${GATE_N:-3}"
deadline=$(( $(date +%s) + 60 * ${GATE_MAX_MIN:-45} ))
cd /root/repo
[ -f tools/HostGate.class ] || javac -d tools tools/HostGate.java
ok=0
while true; do
  read -r st pt < <(java -cp tools HostGate 32)
  if awk -v s="$st" -v p="$pt" -v sm="$st_max" -v pm="$pt_max" \
       'BEGIN { exit !(s <= sm && p <= pm) }'; then
    ok=$((ok + 1))
    echo "[$label] probe ok ($ok/$need): single=${st}s par=${pt}s"
    [ "$ok" -ge "$need" ] && exit 0
  else
    ok=0
    echo "[$label] host busy: single=${st}s par=${pt}s (need <=${st_max}/<=${pt_max})"
  fi
  [ "$(date +%s)" -gt "$deadline" ] && {
    echo "[$label] gave up after ${GATE_MAX_MIN:-45} min"; exit 1; }
  sleep 10
done
