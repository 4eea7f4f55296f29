#!/usr/bin/env python
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python tools/check.py [sfDir] [outDir]

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"` has produced
<outDir>/<name>/ parquet dirs + oracle_sql.json. Registers each
/root/testdata table as a DuckDB view, runs every oracle SQL, and compares
against the Spark result: columns sorted by name, rows sorted, exact value
equality (floats compared by repr after float64 cast). NOT part of the
shipped library — driver-side tooling only.
"""
import json, sys, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok, bad, noora = [], [], []
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        noora.append((name, len(got)))
        continue
    want = con.sql(oracle[name]).df()
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith(("float", "int")):
                df[c] = df[c].astype("float64")
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]")
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # dtype-FAMILY strictness BEFORE the float64 normalization: the driver
    # hashes typed values (0 != 0.0), so an int-vs-float skew must fail
    # locally too — r4's one driver red (q96) shipped because this gate
    # normalized both sides to float64 first and couldn't see the skew.
    def family(dt):
        s = str(dt)
        if s.startswith(("int", "uint", "Int", "UInt")): return "int"
        if s.startswith(("float", "Float")): return "float"
        if s.startswith("datetime"): return "datetime"
        if s.startswith("bool"): return "bool"
        return "other"
    tybad = None
    for c in sorted(set(got.columns) & set(want.columns)):
        fg, fw = family(got[c].dtype), family(want[c].dtype)
        if fg != fw:
            tybad = (f"dtype family differs on col {c}: "
                     f"got {got[c].dtype} ({fg}) want {want[c].dtype} ({fw})")
            break
    g, w = norm(got), norm(want)
    if tybad:
        bad.append((name, tybad))
    elif list(g.columns) != list(w.columns):
        bad.append((name, f"columns differ: got {list(g.columns)} want {list(w.columns)}"))
    elif len(g) != len(w):
        bad.append((name, f"rowcount differ: got {len(g)} want {len(w)}"))
    else:
        diff = None
        for c in g.columns:
            a, b = g[c], w[c]
            if str(a.dtype).startswith("float"):
                import numpy as np
                # NaN/NULL must match NaN/NULL, never 0.0: compare the na
                # masks first, then values only where both sides are present
                both = ~(a.isna() | b.isna())
                neq = (a.isna() != b.isna()) | (
                    both & ~np.isclose(a.fillna(0), b.fillna(0), rtol=0, atol=0))
            else:
                neq = ~((a.isna() & b.isna()) | (a == b))
            if neq.any():
                i = neq.idxmax()
                diff = f"col {c} row {i}: got {a[i]!r} want {b[i]!r}"
                break
        if diff: bad.append((name, diff))
        else: ok.append(name)

print(f"PASS {len(ok)}: {' '.join(ok)}")
for n, r in noora:
    print(f"ROWS-ONLY {n}: {r} rows")
for n, msg in bad:
    print(f"FAIL {n}: {msg}")
sys.exit(1 if bad else 0)
