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
qs = {k: v for k, v in d["queries"].items() if k != "_rest" and v >= 0}

header = '''package graft

/** Per-query warm reference times (seconds, sf0.1, local[32]) for
  * Bench's self-defending capture: a query timing over ~2x its entry
  * here is re-run in-session and reports the min (see Bench). The map is
  * REGENERATED each round from a quiet full-battery capture
  * (`tools/gen_bench_ref.py` over `target/bench_full.json`) — it is a
  * contention yardstick, not a performance contract; queries absent here
  * (new this round) fall back to a battery-median yardstick. */
object BenchRef {
  val ref: Map[String, Double] = Map(
'''
rows = ",\n".join(
    f'    "{k}" -> {round(v, 3)}' for k, v in sorted(qs.items()))
with open(out, "w") as f:
    f.write(header + rows + ")\n}\n")
print(f"wrote {out}: {len(qs)} entries from {src} (sf={d.get('sf')})")
