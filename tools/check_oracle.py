#!/usr/bin/env python3
"""Dev-only emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
sorts columns by name and rows by all columns, and compares cell-by-cell.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL (no output) {name}: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP (no oracle, rows={len(got)})  {name}")
            n_skip += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL (oracle error) {name}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, exp)
        if ok:
            print(f"PASS  {name}  ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

def compare(got, exp):
    import pandas as pd
    if sorted(got.columns) != sorted(exp.columns):
        return False, f"columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
    g = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    e = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    if len(g) != len(e):
        return False, f"row count {len(g)} vs {len(e)}"
    for c in g.columns:
        gc, ec = g[c], e[c]
        if gc.dtype.kind == 'f' or ec.dtype.kind == 'f':
            import numpy as np
            a, b = gc.astype(float).values, ec.astype(float).values
            nan_ok = (pd.isna(a) == pd.isna(b)).all()
            both = ~pd.isna(a) & ~pd.isna(b)
            if not nan_ok or not np.allclose(a[both], b[both], rtol=0, atol=0):
                # report first exact mismatch + whether it's within 1e-9
                bad = (a != b) & both
                if bad.any() or not nan_ok:
                    i = int(bad.argmax()) if bad.any() else int((pd.isna(a) != pd.isna(b)).argmax())
                    close = np.allclose(a[both], b[both], rtol=1e-9, atol=1e-12)
                    return False, (f"col {c} row {i}: {a[i]!r} vs {b[i]!r}"
                                   f" (within 1e-9: {close})")
        else:
            ne = (gc.astype(str).values != ec.astype(str).values)
            if ne.any():
                i = int(ne.argmax())
                return False, f"col {c} row {i}: {gc.iloc[i]!r} vs {ec.iloc[i]!r}"
    return True, ""

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
