#!/usr/bin/env python
"""Time the DuckDB oracle bill for the CURRENT battery — the denominator
of the bench_vs_baseline ratio (engine battery seconds / oracle replay
seconds on the same queries, same parquet, same host).

Usage: python tools/oracle_bench.py [sfDir] [oracle_sql.json] [cap_sec]

Runs every declared oracle SQL against the sfDir parquet with DuckDB at
full thread count, each capped at `cap_sec` (default 45 s, the
established cap — a capped query is counted AT the cap and flagged, so
the reported total UNDERSTATES the true oracle cost). Interrupt is
duckdb's own (con.interrupt() from a watchdog thread). NOT part of the
shipped library — driver-side tooling only.
"""
import json, sys, glob, os, threading, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
osql = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
cap = float(sys.argv[3]) if len(sys.argv) > 3 else 45.0

oracle = json.load(open(osql))
results, capped, failed = {}, [], []
for name in sorted(oracle):
    con = duckdb.connect()  # fresh per query: a capped query can wedge state
    timer = None
    t0 = time.time()
    try:
        # view creation INSIDE the try: a previous query that overran its
        # interrupt (DuckDB polls interrupts coarsely inside recursive-CTE
        # phases) can leave the process allocator pressured enough that
        # even CREATE VIEW throws — that must count as that query failing,
        # not crash the whole bill. The timer and t0 start AFTER the DDL,
        # so per-query times stay comparable to earlier bills.
        for p in glob.glob(f"{sf}/*.parquet"):
            con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")
        timer = threading.Timer(cap, con.interrupt)
        timer.start()
        t0 = time.time()
        con.execute(oracle[name]).fetchall()
        results[name] = time.time() - t0
        if results[name] > cap:  # interrupt overrun: flag, keep honest time
            capped.append(name)
    except duckdb.InterruptException:
        results[name] = cap
        capped.append(name)
    except Exception as e:
        results[name] = time.time() - t0
        failed.append((name, (str(e).splitlines() or [""])[0][:120]))
    finally:
        if timer is not None:
            timer.cancel()
        con.close()
    print(f"{name}: {results[name]:.2f}s"
          + (" CAPPED" if name in capped else ""), flush=True)

# total_sec honors the documented convention (capped entries count AT
# the cap, including interrupt-overruns that ran past it); raw_total_sec
# carries the honest wall time for the record
total = sum(min(v, cap) if k in capped else v for k, v in results.items())
print(json.dumps({
    "sf": sf, "n_oracles": len(oracle), "total_sec": round(total, 1),
    "raw_total_sec": round(sum(results.values()), 1),
    "cap_sec": cap, "n_capped": len(capped), "capped": capped,
    "n_failed": len(failed), "failed": failed,
    "top": sorted(results.items(), key=lambda kv: -kv[1])[:15],
}, indent=1))
