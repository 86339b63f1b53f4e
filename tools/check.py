#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev feedback loop only —
the shipped library is pure Scala/Spark; this script just mirrors what the
driver's DuckDB oracle will do so mismatches surface before a round ends).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, glob, json
import duckdb
import pandas as pd

def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    with open(f"{outdir}/oracle_sql.json") as fh:
        oracle = json.load(fh)

    n_ok = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{outdir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        # mirror the driver: sort columns by name, then compare values
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        # the driver hashes TYPED values: a DuckDB HUGEINT (sum of BIGINT,
        # surfaces as float64/object in pandas) vs Spark int64
        # hash-mismatches even when values are equal. Integer WIDTH drift
        # (int32 vs int64) hashed fine in round 1, so only flag kind drift:
        # int vs float vs object.
        def kind(dt):
            return dt.kind if hasattr(dt, "kind") else "O"
        dt_drift = [(c, str(got[c].dtype), str(exp[c].dtype))
                    for c in got.columns
                    if kind(got[c].dtype) != kind(exp[c].dtype)]
        if dt_drift:
            print(f"FAIL {name}: dtype drift (driver hash would differ): {dt_drift}")
            n_fail += 1
            continue
        # array/struct columns (duckdb -> numpy ndarrays / dicts) are
        # unhashable, which breaks the multi-key sort — canonicalize them
        # to their python repr on BOTH sides before sorting/comparing
        import numpy as np
        def canon(v):
            if isinstance(v, np.ndarray):
                v = v.tolist()
            if isinstance(v, (list, dict)):
                return repr(v)
            return v
        for c in got.columns:
            if got[c].dtype == object or exp[c].dtype == object:
                got[c] = got[c].map(canon)
                exp[c] = exp[c].map(canon)
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if len(gs) != len(es):
            print(f"FAIL {name}: rows {len(gs)} != {len(es)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(gs, es, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name} ({len(gs)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch")
            neq = (gs != es) & ~(gs.isna() & es.isna())
            bad = neq.any(axis=1)
            print(pd.concat([gs[bad].head(3).add_suffix("_got"),
                             es[bad].head(3).add_suffix("_exp")], axis=1)
                  .to_string())
            n_fail += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
