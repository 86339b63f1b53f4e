#!/usr/bin/env python3
"""Calibration-normalized bench comparison (VERDICT r5 ask #2).

The bench host's effective CPU speed swings ~3x with invisible host
contention (verified 2026-08-12: identical-code totals of 35 s and 95 s an
hour apart), so raw round-over-round deltas are mostly noise. Every
`graft.Bench` JSON line carries `calib_sec` -- the wall time of a FIXED
single-thread integer workload on the same host at the same moment -- and
this tool compares two bench snapshots in calibrated units:

    norm_time(q) = time(q) / calib_sec
    ratio(q)     = norm_time_new(q) / norm_time_old(q)

Usage:
    benchcmp.py OLD.json NEW.json [--flag 1.5] [--label-old r5 --label-new r6]

Exit code 1 iff any query's calibrated ratio exceeds --flag (default 1.5,
the VERDICT threshold for a real regression). For cross-SCALE comparisons
(e.g. sf0.1 vs sf1 at 10x data) pass the growth budget instead, e.g.
--flag 15.

Queries present on only one side are listed but never flagged (new queries
have no baseline; removed ones no current cost).
"""
import argparse
import json
import re
import signal
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        txt = fh.read().strip()
    # either one JSON line (graft.Bench stdout, possibly amid log lines)
    # or a pretty-printed driver wrapper spanning the whole file
    candidates = []
    try:
        candidates.append(json.loads(txt))
    except json.JSONDecodeError:
        pass
    for line in txt.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            candidates.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    for d in candidates:
        if "queries" in d:
            return d
    for d in candidates:
        # driver wrapper: {"n":..,"rc":..,"tail":"<truncated bench line>",
        # "parsed":null} -- salvage whatever (query, time) pairs and the
        # calib_sec survived truncation; PARTIAL data, flagged as such.
        if "tail" in d:
            tail = d["tail"]
            # round-12 dense twin: "qt":"q01:.454;q02:1.058;..." (qNN keys,
            # 3-decimal seconds, leading zero stripped) -- fits all 174
            # entries in the driver's ~2 KB tail; prefer it when present
            qt = re.search(r'"qt":"([^"]*)"', tail)
            if qt:
                qs = {m.group(1): float(m.group(2)) for m in re.finditer(
                    r'(q\w+):(-?[0-9]*\.?[0-9]+)', qt.group(1))}
            else:
                qs = {m.group(1): float(m.group(2)) for m in re.finditer(
                    r'"(q\w+)":([0-9][0-9.eE+-]*)', tail)}
            calib = re.search(r'"calib_sec":([0-9][0-9.eE+-]*)', tail)
            cont = re.search(r'"contended":"([^"]*)"', tail)
            cmax = re.search(r'"contend_max":([0-9][0-9.eE+-]*)', tail)
            spill = re.search(r'"spill_top":"([^"]*)"', tail)
            window = re.search(r'"window":"([^"]*)"', tail)
            print(f"NOTE: {path} is a truncated driver wrapper; salvaged "
                  f"{len(qs)} query timings from its tail", file=sys.stderr)
            out = {"queries": qs,
                   "calib_sec": float(calib.group(1)) if calib else None}
            if cont:
                out["contended"] = cont.group(1)
            if cmax:
                out["contend_max"] = float(cmax.group(1))
            if spill:
                out["spill_top"] = spill.group(1)
            if window:
                out["window"] = window.group(1)
            return out
    raise SystemExit(f"{path}: no bench JSON line found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag", type=float, default=1.5,
                    help="flag calibrated ratios above this (default 1.5)")
    ap.add_argument("--label-old", default="old")
    ap.add_argument("--label-new", default="new")
    ap.add_argument("--allow-degraded", action="store_true",
                    help="compare anyway when a side is stamped "
                         "window=degraded (the comparison is then "
                         "host-window-contaminated by construction)")
    args = ap.parse_args()

    a, b = load(args.old), load(args.new)
    # the compact tail twin self-identifies mid-run host storms (r10:
    # "contended" = range-compressed queries whose parallel-probe
    # degradation exceeded 2x the run median) -- surface it FIRST, because
    # a stormed side invalidates every per-query conclusion below
    for side, d, label in (("old", a, args.label_old), ("new", b, args.label_new)):
        if d.get("contended"):
            print(f"WARNING: {label} ({side}) self-reports host contention "
                  f"during {d['contended']} (max probe degradation "
                  f"{d.get('contend_max', '?')}x median) -- its timings for "
                  f"those queries are contaminated, not code", file=sys.stderr)
        # top per-rep disk spillers (r11: the evidence class that settled
        # the q85 flag, carried by the tail twin so the one archived
        # artifact shows WHICH queries hit the disk and by how much)
        if d.get("spill_top"):
            print(f"{label} ({side}) top disk spillers (MB/rep): "
                  f"{d['spill_top']}")
    # whole-run host-health stamp (VERDICT r13 ask #2): a run whose
    # MEDIAN parallel-probe ratio deviated >25% from the probes'
    # constructed prediction (0.5) measured a degraded host window, and
    # per-query flags cannot see it (the median moves with the storm).
    # Refuse to let such a run become lineage silently: comparing
    # requires the explicit --allow-degraded acknowledgment.
    degraded = [label for _, d, label in
                (("old", a, args.label_old), ("new", b, args.label_new))
                if d.get("window") == "degraded"]
    if degraded:
        print(f"WINDOW: {', '.join(degraded)} stamped window=degraded "
              "(whole-run parallel-capacity loss; see Bench.windowSummary)",
              file=sys.stderr)
        if not args.allow_degraded:
            print("refusing to compare a degraded-window run "
                  "(pass --allow-degraded to override)", file=sys.stderr)
            return 2
    ca, cb = a.get("calib_sec"), b.get("calib_sec")
    if not ca or not cb:
        print("WARNING: calib_sec missing on one side; comparing RAW times "
              "(host noise uncorrected)", file=sys.stderr)
        ca = cb = 1.0
    # per-query calibration probes (sampled right before each query's reps)
    # correct MID-RUN contention storms the single global constant cannot;
    # prefer them whenever both sides carry a probe for the query
    cqa, cqb = a.get("calib_q", {}), b.get("calib_q", {})
    # parallel (all-cores) probe twins: the 1-thread probe reads healthy
    # during whole-window core theft, so per query we also compute how much
    # the PARALLEL probe degraded beyond the single-thread one -- queries
    # whose swing tracks that degradation are host windows, not regressions
    pqa, pqb = a.get("calib_pq", {}), b.get("calib_pq", {})
    qa, qb = a.get("queries", {}), b.get("queries", {})
    # the driver's archived tail keys queries by their qNN prefix while
    # full bench lines use long names -- when the two sides' key sets are
    # disjoint but agree after prefixing, compare on prefixes (r14: lets
    # a fresh full-format run be compared against an old driver tail)
    def shorten(d):
        return {k.split("_")[0]: v for k, v in d.items()}
    if qa and qb and not (set(qa) & set(qb)) \
            and (set(shorten(qa)) & set(shorten(qb))):
        qa, qb = shorten(qa), shorten(qb)
        cqa, cqb = shorten(cqa), shorten(cqb)
        pqa, pqb = shorten(pqa), shorten(pqb)
        print("NOTE: key formats differ (driver-tail qNN vs full names); "
              "comparing on qNN prefixes", file=sys.stderr)
    common = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))

    rows = []
    n_perq = 0
    for q in common:
        ta, tb = qa[q], qb[q]
        if ta <= 0:  # degenerate timing; ratio meaningless
            continue
        if cqa.get(q) and cqb.get(q):
            ratio = (tb / cqb[q]) / (ta / cqa[q])
            n_perq += 1
        else:
            ratio = (tb / cb) / (ta / ca)
        par_deg = None
        if all((pqa.get(q), pqb.get(q), cqa.get(q), cqb.get(q))):
            # lost-core factor: parallel slowdown beyond single-thread
            par_deg = (pqb[q] / pqa[q]) / (cqb[q] / cqa[q])
        rows.append((ratio, q, ta, tb, par_deg))
    rows.sort(key=lambda r: r[0], reverse=True)
    if n_perq:
        print(f"per-query calibration used for {n_perq}/{len(rows)} queries")

    host = cb / ca if ca else 1.0
    print(f"calib {args.label_old}={ca:.3f}s {args.label_new}={cb:.3f}s "
          f"(host speed ratio {host:.2f}x -- raw times divided out)")
    tot_a = sum(qa[q] for q in common)
    tot_b = sum(qb[q] for q in common)
    tot_ratio = (tot_b / cb) / (tot_a / ca) if tot_a > 0 else float("nan")
    print(f"total over {len(common)} common queries: "
          f"{tot_a:.1f}s -> {tot_b:.1f}s raw; calibrated ratio "
          f"{tot_ratio:.2f}x (flag threshold {args.flag}x)")
    print()

    flagged = [r for r in rows if r[0] > args.flag]
    print(f"{'calibrated':>10} {'raw ' + args.label_old:>10} "
          f"{'raw ' + args.label_new:>10}  query")
    n_suspect = 0
    for ratio, q, ta, tb, par_deg in rows[:25]:
        mark = ""
        if ratio > args.flag:
            mark = " <-- FLAG"
            # a flagged query measured while the parallel probe showed the
            # host down >=1.3x beyond single-thread speed is a host-window
            # suspect: divide its ratio by the lost-core factor mentally
            # before believing it
            if par_deg and par_deg >= 1.3:
                mark += f" [host-window suspect: parallel probe {par_deg:.2f}x degraded]"
                n_suspect += 1
        print(f"{ratio:9.2f}x {ta:9.2f}s {tb:9.2f}s  {q}{mark}")
    if len(rows) > 25:
        print(f"  ... {len(rows) - 25} more (all below the top 25)")
    pars = [r[4] for r in rows if r[4]]
    if pars:
        print(f"\nparallel probe coverage: {len(pars)}/{len(rows)} queries; "
              f"median lost-core factor "
              f"{sorted(pars)[len(pars) // 2]:.2f}x"
              + (f"; {n_suspect} flagged queries are host-window suspects"
                 if n_suspect else ""))
    def brief(names):
        return ", ".join(names[:12]) + \
            (f", ... {len(names) - 12} more" if len(names) > 12 else "")
    if only_b:
        print(f"\nonly in {args.label_new} ({len(only_b)}, no baseline): "
              f"{brief(only_b)}")
    if only_a:
        print(f"only in {args.label_old} ({len(only_a)}, gone): "
              f"{brief(only_a)}")

    print(f"\n{len(flagged)} flagged of {len(rows)} compared "
          f"(> {args.flag}x calibrated)")
    return 1 if flagged else 0


if __name__ == "__main__":
    # head-friendly: a closed stdout pipe is normal usage, not a crash
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    sys.exit(main())
