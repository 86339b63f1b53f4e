#!/usr/bin/env python3
"""Summarize a unified-GC log (-Xlog:gc*:...:time,uptime,level,tags) into
the numbers the isolated scale-bench adjudication needs: was the JVM in a
GC storm during the timed window, or idle-but-slow (host theft)?

Reports, overall and per 60 s uptime window: pause count, total pause
seconds, max single pause, and the share of wall time spent paused.
A memory-hierarchy knee shows up as pause share climbing with uptime
(heap pressure grows with the query); host theft shows healthy GC but
long wall time.
"""
import re
import sys


def main(path: str) -> int:
    # e.g. "[2026-08-15T ...][123.456s][info][gc] GC(42) Pause Young
    #       (Normal) (G1 Evacuation Pause) 1234M->567M(4096M) 12.345ms"
    pat = re.compile(r"\[(\d+\.\d+)s\]\[info\s*\]\[gc\s*\] GC\(\d+\) "
                     r"(Pause [^)]*\([^)]*\)[^0-9]*).* (\d+\.\d+)ms")
    pauses = []  # (uptime_s, kind, pause_ms)
    last_uptime = 0.0
    with open(path, errors="replace") as fh:
        for line in fh:
            m = re.search(r"\[(\d+\.\d+)s\]", line)
            if m:
                last_uptime = max(last_uptime, float(m.group(1)))
            pm = pat.search(line)
            if pm:
                pauses.append((float(pm.group(1)), pm.group(2).strip(),
                               float(pm.group(3))))
    if not pauses:
        print(f"gc-summary: no pauses parsed from {path} "
              f"(uptime {last_uptime:.0f}s)")
        return 0
    tot = sum(p[2] for p in pauses) / 1000.0
    mx = max(pauses, key=lambda p: p[2])
    full = [p for p in pauses if "Full" in p[1]]
    print(f"gc-summary: {len(pauses)} pauses, {tot:.1f}s total paused over "
          f"{last_uptime:.0f}s uptime ({100 * tot / max(last_uptime, 1e-9):.1f}%), "
          f"max {mx[2]:.0f}ms at {mx[0]:.0f}s"
          + (f", {len(full)} FULL GCs" if full else ", 0 full GCs"))
    # per-minute pause share: the storm-vs-steady fingerprint
    buckets = {}
    for up, _, ms in pauses:
        buckets.setdefault(int(up // 60), [0, 0.0])
        buckets[int(up // 60)][0] += 1
        buckets[int(up // 60)][1] += ms
    for b in sorted(buckets):
        n, ms = buckets[b]
        share = ms / 1000.0 / 60.0 * 100
        print(f"  min {b:3d}: {n:4d} pauses {ms / 1000.0:6.1f}s paused "
              f"({share:4.1f}%)" + ("  <-- STORM" if share > 20 else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
