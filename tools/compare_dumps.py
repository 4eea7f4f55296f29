#!/usr/bin/env python
"""Value-compare two graft.Verify output dirs (the determinism sweep):
every query dump must be value-identical across two consecutive runs —
columns sorted by name, rows sorted by all columns, exact equality.

Usage: python tools/compare_dumps.py <outDirA> <outDirB>
Exit 0 = identical. NOT part of the shipped library — driver-side
tooling only.
"""
import sys, os
import duckdb

a, b = sys.argv[1], sys.argv[2]
names_a = {n for n in os.listdir(a) if os.path.isdir(os.path.join(a, n))}
names_b = {n for n in os.listdir(b) if os.path.isdir(os.path.join(b, n))}
if names_a != names_b:
    print(f"query sets differ: only-A={sorted(names_a - names_b)} "
          f"only-B={sorted(names_b - names_a)}")
    sys.exit(1)

con = duckdb.connect()
def norm(path):
    df = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

bad = []
for n in sorted(names_a):
    da, db = norm(os.path.join(a, n)), norm(os.path.join(b, n))
    if list(da.columns) != list(db.columns):
        bad.append((n, "columns differ"))
    elif len(da) != len(db):
        bad.append((n, f"rows {len(da)} vs {len(db)}"))
    elif not da.equals(db):
        bad.append((n, "values differ"))

if bad:
    print(f"NON-DETERMINISTIC {len(bad)}: {bad}")
    sys.exit(1)
print(f"identical: {len(names_a)}/{len(names_a)} dumps value-equal")
