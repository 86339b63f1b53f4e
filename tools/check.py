#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev feedback loop only —
the shipped library is pure Scala/Spark; this script just mirrors what the
driver's DuckDB oracle will do so mismatches surface before a round ends).

Faithful-mirror rules (the round-3 lesson — VERDICT r03 "What's missing" #1;
the previous version of this script read BOTH sides through DuckDB and
canonicalized array cells, which laundered exactly the encodings the driver
hashes, and 6 red rows shipped silently):

- The Spark side is read the way the driver reads it: pyarrow -> pandas.
  Never through DuckDB (that coerces decimal128 and nested columns into
  DuckDB's own representation, masking serialization drift).
- No canonicalization. If a cell would break the driver's multi-column row
  sort (numpy.ndarray / dict are unhashable), this mirror reports the same
  failure instead of papering over it.
- The output-encoding contract (SURVEY §2.12) is enforced directly: every
  final column must be a hash-stable type — string / int / float / bool /
  date / timestamp. decimal.Decimal or nested cells on EITHER side fail,
  even when the values are numerically equal, because the driver's typed
  hasher serializes them engine-specifically. Pinned exceptions only via
  NESTED_ALLOWLIST (kept in sync with OutputContractSpec's allowlist).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--oracle-timeout=SECS]

--oracle-timeout bounds EACH DuckDB oracle query (for scale-factor runs
where the deliberately brute-force twins — all-pairs Jaccard, recursive
closures — are intractable); a timed-out oracle reports as an explicit
`skip` line and is excluded from ok/fail, never silently passed.
"""
import sys, os, glob, json, threading
import decimal
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# Queries whose nested output column is pinned as a driver-accepted
# exception (must match OutputContractSpec's allowlist on the Scala side).
# Currently empty: every query ships portable scalars (q16 already emits
# its collected list as a joined string).
NESTED_ALLOWLIST = set()

PORTABLE_SCALARS = (str, bytes, bool, int, float, np.integer, np.floating,
                    np.bool_)


def read_spark(res_dir: str) -> pd.DataFrame:
    """Driver path: pyarrow -> pandas, no type laundering."""
    files = sorted(glob.glob(f"{res_dir}/*.parquet"))
    if not files:
        raise RuntimeError("no parquet part files")
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()


def unportable_cells(df: pd.DataFrame):
    """Columns holding non-hash-stable cells (Decimal / list / dict /
    ndarray), with the offending type name."""
    bad = []
    for c in df.columns:
        if df[c].dtype != object:
            continue  # numeric/datetime dtypes are portable by construction
        for v in df[c]:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                continue
            if isinstance(v, decimal.Decimal):
                bad.append((c, "decimal.Decimal")); break
            if isinstance(v, (list, dict, np.ndarray)):
                bad.append((c, type(v).__name__)); break
            if not isinstance(v, PORTABLE_SCALARS):
                bad.append((c, type(v).__name__)); break
    return bad


def main(sfdir: str, outdir: str, oracle_timeout: float = 0.0,
         subset_label: str = "") -> int:
    con = duckdb.connect()
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    with open(f"{outdir}/oracle_sql.json") as fh:
        oracle = json.load(fh)
    # Verify records each query that ERRORED (vs merely missing) here —
    # surface those as explicit `err` rows so failed and undeclared are
    # distinguishable (VERDICT r04 ask #4).
    errors = {}
    err_path = f"{outdir}/_errors.json"
    if os.path.exists(err_path):
        with open(err_path) as fh:
            errors = json.load(fh)

    def oracle_df(sql):
        """Run one oracle query; with --oracle-timeout, interrupt it after
        the budget. Some oracle twins are DELIBERATELY brute-force
        (all-pairs Jaccard, recursive-CTE closures) — independent
        derivations that are quadratic/iterative by design and tractable
        only at gate scale (sf<=0.1). At larger scale factors the SPARK
        side is the measurement target and a timed-out oracle is reported
        as an explicit skip, never as ok.

        Timer-race discipline: the timer callback sets this query's
        timed_out flag BEFORE interrupting. A cancel() that loses the race
        (the timer fires between query completion and cancel) leaves a
        stale interrupt pending in the connection, which would kill the
        NEXT query; an interrupt arriving WITHOUT the flag set is therefore
        treated as stale and the query re-runs once instead of being
        misreported as an over-budget skip."""
        if not oracle_timeout:
            return con.sql(sql).df()
        for _ in range(2):  # at most one stale-interrupt retry
            timed_out = threading.Event()

            def fire():
                timed_out.set()
                con.interrupt()

            timer = threading.Timer(oracle_timeout, fire)
            timer.start()
            try:
                return con.sql(sql).df()
            except duckdb.InterruptException:
                if timed_out.is_set():
                    raise
                continue  # stale interrupt from a previous query's timer
            except Exception as e:
                # splitlines() is [] on an empty message — guard, or the
                # IndexError would replace the original oracle error
                first = (str(e).splitlines() or [""])[0]
                if "INTERRUPT" in first.upper() and not timed_out.is_set():
                    continue
                raise
            finally:
                timer.cancel()
        # unreachable: one pending stale interrupt at most, consumed above
        raise RuntimeError("interrupted twice without the timeout flag set")

    n_ok = n_fail = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{outdir}/{name}"
        if name in errors:
            # getMessage can be "" (not null) — splitlines() is then []
            first = (errors[name].splitlines() or ["<empty message>"])[0]
            print(f"err  {name}: Verify raised: {first[:160]}")
            n_fail += 1
            continue
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = read_spark(res_dir)
            exp = oracle_df(sql)
        except duckdb.InterruptException:
            print(f"skip {name}: oracle exceeded {oracle_timeout:g}s "
                  "(brute-force twin; verified at gate scale)")
            n_skip += 1
            continue
        except Exception as e:
            msg = (str(e).splitlines() or ["<empty message>"])[0]
            if "INTERRUPT" in msg.upper():
                print(f"skip {name}: oracle exceeded {oracle_timeout:g}s "
                      "(brute-force twin; verified at gate scale)")
                n_skip += 1
                continue
            print(f"FAIL {name}: {msg}")
            n_fail += 1
            continue

        # mirror the driver: sort columns by name, then compare values
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue

        # encoding contract: non-portable cells on either side = the class
        # of failure the driver's typed hasher flags even when values match
        if name not in NESTED_ALLOWLIST:
            drift = [("spark", c, t) for c, t in unportable_cells(got)] + \
                    [("oracle", c, t) for c, t in unportable_cells(exp)]
            if drift:
                print(f"FAIL {name}: non-hash-stable output cells {drift}")
                n_fail += 1
                continue

        # dtype KIND drift (int vs float vs object) — the driver's hasher is
        # width-tolerant (int32 vs int64 passed in round 1) but kind-strict
        def kind(dt):
            return dt.kind if hasattr(dt, "kind") else "O"
        dt_drift = [(c, str(got[c].dtype), str(exp[c].dtype))
                    for c in got.columns
                    if kind(got[c].dtype) != kind(exp[c].dtype)]
        if dt_drift:
            print(f"FAIL {name}: dtype drift (driver hash would differ): {dt_drift}")
            n_fail += 1
            continue

        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue

        # the driver sorts rows by every column with NO canonicalization;
        # an unhashable cell (ndarray/dict) raises here exactly as it does
        # there — except for the pinned allowlist, which sorts by its
        # scalar columns and compares nested cells via repr of tolist()
        try:
            if name in NESTED_ALLOWLIST:
                scalar_cols = [c for c in got.columns
                               if not unportable_cells(got[[c]])
                               and not unportable_cells(exp[[c]])]
                gs = got.sort_values(by=scalar_cols).reset_index(drop=True)
                es = exp.sort_values(by=scalar_cols).reset_index(drop=True)
                for c in got.columns:
                    if c not in scalar_cols:
                        gs[c] = gs[c].map(lambda v: repr(
                            v.tolist() if isinstance(v, np.ndarray) else v))
                        es[c] = es[c].map(lambda v: repr(
                            v.tolist() if isinstance(v, np.ndarray) else v))
            else:
                gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
                es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        except TypeError as e:
            print(f"FAIL {name}: driver row sort would crash: {e}")
            n_fail += 1
            continue

        try:
            pd.testing.assert_frame_equal(gs, es, check_dtype=False,
                                          check_exact=True)
            if subset_label:
                # sampled-oracle pass (VERDICT r8 ask #3): both sides ran on
                # the same stable-hash subcorpus; distinguishable from a
                # full-corpus ok so a reader can't mistake the coverage
                print(f"subset-ok {name} ({len(gs)} rows; {subset_label})")
            else:
                print(f"ok   {name} ({len(gs)} rows)")
            n_ok += 1
        except AssertionError:
            print(f"FAIL {name}: value mismatch")
            neq = (gs != es) & ~(gs.isna() & es.isna())
            bad = neq.any(axis=1)
            print(pd.concat([gs[bad].head(3).add_suffix("_got"),
                             es[bad].head(3).add_suffix("_exp")], axis=1)
                  .to_string())
            n_fail += 1
    skip_note = f", {n_skip} oracle-skipped" if n_skip else ""
    print(f"\n{n_ok} ok, {n_fail} fail{skip_note}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(
        description="local replica of the driver's DuckDB correctness gate")
    ap.add_argument("sfdir", help="testdata scale-factor directory")
    ap.add_argument("outdir", help="graft.Verify output directory")
    ap.add_argument("--oracle-timeout", type=float, default=0.0,
                    metavar="SECS",
                    help="budget per DuckDB oracle query; over-budget "
                         "queries report as explicit skips")
    ap.add_argument("--subset-label", default="", metavar="TEXT",
                    help="mark passing rows as subset-ok with this "
                         "provenance note (sampled-oracle runs where both "
                         "sides read a graft.SubCorpus directory)")
    ns = ap.parse_args()  # unknown flags / extra positionals: usage error
    sys.exit(main(ns.sfdir, ns.outdir, ns.oracle_timeout, ns.subset_label))
