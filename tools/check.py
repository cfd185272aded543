#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: tools/check.py [sfDir] [verifyOutDir]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
sf tables, sorts columns by name, and compares values exactly (NaN==NaN,
lists compared element-wise). Exit code = number of mismatching queries.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def cell_eq(a, b):
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a, b = np.asarray(a, dtype=object), np.asarray(b, dtype=object)
        if a.shape != b.shape:
            return False
        return all(cell_eq(x, y) for x, y in zip(a.tolist(), b.tolist()))
    if a is None or b is None or (isinstance(a, float) and np.isnan(a)) or \
       (isinstance(b, float) and np.isnan(b)):
        an = a is None or (isinstance(a, float) and np.isnan(a))
        bn = b is None or (isinstance(b, float) and np.isnan(b))
        return an and bn
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b

fails = 0
# union of dumped dirs and DECLARED oracles: a query whose Verify run threw
# writes no dir at all — it must count as a failure here, not silently
# drop out of the denominator
dumped = set(d for d in os.listdir(OUT) if os.path.isdir(os.path.join(OUT, d)))
names = sorted(dumped | set(oracle.keys()))
for name in names:
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no output parquet"); fails += 1; continue
    got = canon(pd.read_parquet(f"{OUT}/{name}"))
    if name not in oracle:
        status = "NOORACLE" if len(got) > 0 else "EMPTY(no-oracle)"
        print(f"{status:>9} {name}: rows={len(got)}")
        if len(got) == 0: fails += 1
        continue
    try:
        exp = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fails += 1; continue
    dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
    if dt_bad:
        print(f"FAIL {name}: dtype mismatch {dt_bad}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue
    bad = None
    for ci, c in enumerate(got.columns):
        gv, ev = got[c].tolist(), exp[c].tolist()
        for ri in range(len(gv)):
            if not cell_eq(gv[ri], ev[ri]):
                bad = (c, ri, gv[ri], ev[ri]); break
        if bad: break
    if bad:
        c, ri, g, e = bad
        print(f"FAIL {name}: first diff col={c} row={ri} got={g!r} exp={e!r}")
        fails += 1
    else:
        print(f"{'OK':>9} {name}: rows={len(got)}")
print(f"\n{len(names) - fails}/{len(names)} queries OK")
sys.exit(fails)
