package graft

/** Per-query warm reference times (seconds, sf0.1, local[32]) for
  * Bench's self-defending capture: a query timing over ~2x its entry
  * here is re-run in-session and reports the min (see Bench). The map is
  * REGENERATED each round from a quiet full-battery capture
  * (`tools/gen_bench_ref.py` over `target/bench_full.json`) — it is a
  * contention yardstick, not a performance contract; queries absent here
  * (new this round) fall back to a battery-median yardstick. */
object BenchRef {
  val ref: Map[String, Double] = Map.empty
}
