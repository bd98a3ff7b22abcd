#!/usr/bin/env python3
"""Cross-parallelism determinism check: diff two graft.Verify dumps.

Every graded query must produce the SAME canonical result regardless of
parallelism (shuffle partition count / core count) — hidden order or
float-accumulation nondeterminism shows up exactly here, and a same-config
re-run can never catch it. Usage:

    sbt "runMain graft.Verify <sfDir> /tmp/vout"               # default cpus
    SPARK_GRAFT_CPUS=7 sbt "runMain graft.Verify <sfDir> /tmp/vout7"
    python3 tools/xpartition.py /tmp/vout /tmp/vout7           # expect 0 differ

Canonical form: columns sorted by name, rows rendered cell-by-cell and
sorted — the same shape the driver's t2 hash uses.
"""
import duckdb, os, sys, hashlib

A, B = sys.argv[1], sys.argv[2]
con = duckdb.connect()

def canon(d):
    rel = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    cols = [c[0] for c in rel.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted("|".join(repr(r[i]) for i in order) for r in rel.fetchall())
    return hashlib.md5(("\n".join([",".join(sorted(cols))] + rows)).encode()).hexdigest()

# iterate the UNION of both dumps' directory sets: a query present only
# in the second dump (stale/truncated first dump) must be reported, not
# silently skipped (round-9 ADVICE)
def dirs(base):
    return {d for d in os.listdir(base) if os.path.isdir(os.path.join(base, d))}

diffs, n = [], 0
for name in sorted(dirs(A) | dirs(B)):
    da, db = os.path.join(A, name), os.path.join(B, name)
    n += 1
    if not os.path.isdir(da):
        diffs.append((name, "missing in first dump"))
    elif not os.path.isdir(db):
        diffs.append((name, "missing in second dump"))
    elif canon(da) != canon(db):
        diffs.append((name, "content differs"))

print(f"{n} queries compared, {len(diffs)} differ")
for name, why in diffs:
    print(f"  {name}: {why}")
sys.exit(1 if diffs else 0)
