#!/usr/bin/env python
"""Regenerate src/main/scala/graft/BenchRef.scala from a quiet
full-battery capture (target/bench_full.json, written by graft.Bench).

Run after a warm sf0.1 bench on an otherwise-idle host:
    python tools/gen_bench_ref.py [target/bench_full.json] [--merge-min]

--merge-min: per query, keep the MIN of the existing BenchRef entry and
the new capture (same sf/cpus stamp required) — the tightest honest
warm yardstick when the freshest capture ran on a contended host but an
earlier same-round capture was quieter. New queries take the new value.

The map feeds Bench's self-defending capture (re-run >2x outliers,
report min) — regenerate it each round so the yardstick tracks the
current battery, and only from a capture whose load average was quiet.
"""
import json
import sys

args = [a for a in sys.argv[1:] if a != "--merge-min"]
merge_min = "--merge-min" in sys.argv[1:]
src = args[0] if args else "target/bench_full.json"
out = "src/main/scala/graft/BenchRef.scala"

d = json.load(open(src))
failed = set(d.get("failed", []))
qs = {k: v for k, v in d["queries"].items()
      if k != "_rest" and k not in failed}
sf = d["sf"]
cpus = d.get("cpus") or "32"

if merge_min:
    import re
    old = open(out).read()
    old_sf = re.search(r'val sfDir = "([^"]*)"', old)
    old_cpus = re.search(r'val cpus = "([^"]*)"', old)
    if old_sf and old_sf.group(1) == sf and old_cpus and old_cpus.group(1) == cpus:
        prev = dict((k, float(v)) for k, v in
                    re.findall(r'"(q[^"]+)" -> ([0-9.]+)', old))
        merged = sum(1 for k in qs if k in prev and prev[k] < qs[k])
        qs = {k: min(v, prev.get(k, v)) for k, v in qs.items()}
        print(f"merge-min: {merged} entries kept the earlier (quieter) value")
    else:
        print("merge-min: existing BenchRef has a different sf/cpus stamp — ignored")

header = f'''package graft

/** Per-query warm reference times (seconds) for Bench's self-defending
  * capture: a query timing over ~2x its entry here is re-run in-session
  * and reports the min (see Bench). The map is ENVIRONMENT-SPECIFIC
  * (valid only at `sfDir`/`cpus` below — Bench falls back to a
  * battery-median yardstick elsewhere) and REGENERATED each round from a
  * quiet full-battery capture (`tools/gen_bench_ref.py` over
  * `target/bench_full.json`; failed queries excluded) — it is a
  * contention yardstick, not a performance contract; queries absent here
  * (new this round) fall back to the median yardstick too. */
object BenchRef {{
  val sfDir = "{sf}"
  val cpus = "{cpus}"
  val ref: Map[String, Double] = Map(
'''
rows = ",\n".join(
    f'    "{k}" -> {round(v, 3)}' for k, v in sorted(qs.items()))
with open(out, "w") as f:
    f.write(header + rows + ")\n}\n")
print(f"wrote {out}: {len(qs)} entries from {src} "
      f"(sf={sf} cpus={cpus} failed={len(failed)})")
