#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate (SURVEY.md §5.2).

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Loads each <out>/<name> parquet dump written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB 1.0.0 over views
named after the tables in <sfDir>, and diffs cell-by-cell after sorting
columns by name (mirrors the driver's compare). Dev tool only — not
shipped in the jar; the engine itself has no python dependency.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures, passes, skipped = [], [], []
    names = sorted([os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
                    if os.path.isdir(p)])
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            failures.append((name, "no parquet written")); continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        # The driver sort_values()s every column before hashing — even for
        # no-oracle (rows-only) queries; array/binary cells make pandas
        # lexsort throw "unhashable type" and the query scores as an error.
        # Reproduce that here so it fails locally too.
        try:
            got.sort_values(list(got.columns))
        except TypeError as e:
            failures.append((name, f"driver-sort would fail: {e}")); continue
        if name not in oracle:
            skipped.append((name, len(got)))
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}")); continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            failures.append((name, f"columns differ: got {list(got.columns)} exp {list(exp.columns)}")); continue
        if len(got) != len(exp):
            failures.append((name, f"row count: got {len(got)} exp {len(exp)}")); continue
        bad = None
        for c in got.columns:
            g, e = got[c], exp[c]
            gd, ed = str(g.dtype), str(e.dtype)
            if gd != ed:
                # dtype drift that the driver's schema check would flag
                bad = f"col {c}: dtype got {gd} exp {ed}"
                break
            if g.dtype == object:
                eq = (g.astype(str) == e.astype(str)) | (g.isna() & e.isna())
            elif np.issubdtype(g.dtype, np.floating):
                eq = (g == e) | (g.isna() & e.isna())
            else:
                eq = (g == e) | (g.isna() & e.isna())
            if not eq.all():
                i = int(np.argmin(eq.values))
                bad = f"col {c}: first diff at row {i}: got {g.iloc[i]!r} exp {e.iloc[i]!r}"
                break
        if bad:
            failures.append((name, bad))
        else:
            passes.append((name, len(got)))
    for n, r in passes:
        print(f"PASS  {n}  ({r} rows)")
    for n, r in skipped:
        print(f"SKIP  {n}  (no oracle, {r} rows)")
    for n, msg in failures:
        print(f"FAIL  {n}: {msg}")
    print(f"\n{len(passes)} pass, {len(skipped)} no-oracle, {len(failures)} fail")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
