#!/usr/bin/env python
"""Regenerate src/main/scala/graft/BenchRef.scala from a quiet
full-battery capture (target/bench_full.json, written by graft.Bench).

Run after a warm sf0.1 bench on an otherwise-idle host:
    python tools/gen_bench_ref.py [target/bench_full.json]

The map feeds Bench's self-defending capture (re-run >2x outliers,
report min) — regenerate it each round so the yardstick tracks the
current battery, and only from a capture whose load average was quiet.
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "target/bench_full.json"
out = "src/main/scala/graft/BenchRef.scala"

d = json.load(open(src))
failed = set(d.get("failed", []))
qs = {k: v for k, v in d["queries"].items()
      if k != "_rest" and k not in failed}
sf = d["sf"]
cpus = d.get("cpus") or "32"

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
