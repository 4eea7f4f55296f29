package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation with EXACT cross-engine determinism.
  *
  * Floating-point PageRank is run-order sensitive (per-node contribution
  * sums re-associate across partitions), so a distributed run and a
  * reference implementation drift in ulps and every downstream ranking
  * becomes unverifiable. This variant keeps the fixed point exact: ranks
  * live in integer `1/scale` units, the damping factor 0.85 is the
  * rational 17/20 applied with integer division per edge, and each
  * iteration's per-node sum is a sum of INTEGERS — associative,
  * commutative, identical on any engine. The oracle replays it as ten
  * unrolled join+group CTEs in DuckDB with `//` arithmetic, bit-for-bit.
  *
  * 100 TB shape: one hash join + one hash agg per iteration, both keyed
  * on the node id (the same co-partitioning every BSP graph system uses);
  * out-weight is precomputed once; lineage is truncated with
  * localCheckpoint every few rounds (the [[graft.pipeline.Dedup]]
  * connected-components pattern). Dangling-node mass is dropped (the
  * simplified PageRank), documented and mirrored by the oracle.
  */
object Graph {

  /** `iters` rounds of integer PageRank over weighted directed edges.
    * Returns (node, rank_micro) with ranks in `1/scale` units.
    * Initial rank = scale/N, teleport term = (3*scale)/(20*N) — all
    * integer divisions, mirrored exactly by the oracle SQL. */
  def pageRankInt(
      edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      iters: Int = 10, scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(wCol).cast("long").as("__w")).localCheckpoint()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = scale / n
    val teleport = (3L * scale) / (20L * n)
    val outW = e.groupBy(col("__src")).agg(sum("__w").as("__ow"))
    var rank = nodes.select(col("node"), lit(base).as("r"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(rank.select(col("node").as("__src"), col("r")), "__src")
        .join(outW, "__src")
        .select(col("__dst").as("node"),
          expr("(17 * r * __w) div (20 * __ow)").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("s"), lit(0L))).as("r"))
      if (i % 3 == 0) rank = rank.localCheckpoint()
    }
    rank.select(col("node"), col("r").as("rank_micro"))
  }
}
