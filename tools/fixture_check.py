#!/usr/bin/env python
"""Round-start fixture drift check (driver-side tooling, not shipped code).

The driver regenerates /root/testdata each round and physical types have
changed across generations (events.ts: TIMESTAMP(NANOS) in rounds 1-3,
TIMESTAMP(MICROS)-NTZ since round 4 — the round-3 red wave). Run this
FIRST each round:

    python tools/fixture_check.py            # compare vs recorded baseline
    python tools/fixture_check.py --record   # re-record after verifying

Exit 0 = schemas match the recorded baseline; nonzero prints the diff.
The adaptive layer (Tables.normalizeEventTime) should absorb timestamp
changes — a diff here means: re-run the PlansSpec pushdown guard and one
streaming query BEFORE trusting the battery.
"""
import json, sys, glob, os
import pyarrow.parquet as pq

BASELINE = os.path.join(os.path.dirname(__file__), "fixture_schemas.json")

def snapshot():
    out = {}
    for sf in sorted(glob.glob("/root/testdata/sf*")):
        for f in sorted(glob.glob(f"{sf}/*.parquet")):
            s = pq.read_schema(f)
            key = f"{os.path.basename(sf)}/{os.path.basename(f)}"
            out[key] = {fld.name: str(fld.type) for fld in s}
    return out

cur = snapshot()
if "--record" in sys.argv:
    json.dump(cur, open(BASELINE, "w"), indent=1, sort_keys=True)
    print(f"recorded {len(cur)} file schemas -> {BASELINE}")
    sys.exit(0)

if not os.path.exists(BASELINE):
    print(f"no baseline at {BASELINE}; run with --record first")
    sys.exit(2)

base = json.load(open(BASELINE))
diffs = []
for k in sorted(set(base) | set(cur)):
    if k not in cur:
        diffs.append(f"MISSING {k}")
    elif k not in base:
        diffs.append(f"NEW {k}: {cur[k]}")
    elif base[k] != cur[k]:
        for c in sorted(set(base[k]) | set(cur[k])):
            b, n = base[k].get(c), cur[k].get(c)
            if b != n:
                diffs.append(f"CHANGED {k}.{c}: {b} -> {n}")
if diffs:
    print("\n".join(diffs))
    print(f"\n{len(diffs)} fixture schema change(s) since last record.")
    sys.exit(1)

# Data-level invariants the battery assumes (beyond schemas). The ingest
# round-trip queries (q45/q47/q278-q281) write events through overwrite-mode
# series tables keyed on (event_type, ms): a regenerated fixture with
# same-millisecond duplicates within one series would silently dedup on the
# Spark side while the DuckDB oracle reads every raw row.
try:
    import duckdb
    bad = []
    for sf in sorted(glob.glob("/root/testdata/sf*")):
        f = f"{sf}/events.parquet"
        if not os.path.exists(f):
            continue
        n = duckdb.sql(
            f"SELECT count(*) FROM (SELECT event_type, epoch_ns(ts)//1000000 AS ms,"
            f" count(*) c FROM '{f}' GROUP BY 1,2 HAVING c > 1)").fetchone()[0]
        if n:
            bad.append(f"{os.path.basename(sf)}: {n} (event_type, ms) collisions")
    if bad:
        print("\n".join(bad))
        print("\nevents fixture has same-ms series collisions — the ingest "
              "round-trip oracles (q45/q47/q278-q281) assume none; re-check "
              "those before trusting the battery.")
        sys.exit(1)
except ImportError:
    pass  # schema check alone still useful where duckdb is absent

print(f"fixtures unchanged ({len(cur)} files match baseline)")
