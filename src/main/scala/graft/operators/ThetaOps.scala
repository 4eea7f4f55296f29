package graft.operators

import graft.functions.{ThetaAgg, ThetaANotBEst, ThetaEstimate, ThetaIntersectEst, ThetaMergeAgg, ThetaUnionEst}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinct-set algebra over theta sketches ([[graft.functions.ThetaAgg]]):
  * per-group distinct counts PLUS intersection / union / difference
  * between groups — the audience-overlap analytics an HLL rollup cannot
  * answer (HLL only unions). One sketch per group (map-side mergeable
  * agg); the set operations run on the tiny compact sketches, joined
  * declaratively — nothing scales with row count.
  *
  * Below the sketch's k nominal entries the results are EXACT (theta
  * exact mode) — the q249 oracle hash-checks them; above k the ≤~2%
  * error envelope applies (spec-bound).
  */
object ThetaOps {

  /** Per-group distinct estimates plus set-op estimates for the given
    * (a, b) group pairs. Output: (a, op, est) with op ∈ distinct /
    * intersect_<b> / union_<b> / diff_<b>. */
  def setReport(
      df: DataFrame, groupCol: String, keyCol: String,
      pairs: Seq[(String, String)], lgK: Int = 12): DataFrame = {
    val sk = df.groupBy(col(groupCol).as("g"))
      .agg(ThetaAgg(col(keyCol), lgK).as("sk"))
      .localCheckpoint()
    val singles = sk.select(col("g").as("a"), lit("distinct").as("op"),
      ThetaEstimate(col("sk")).as("est"))
    val pairDf = pairs.map { case (a, b) =>
      val l = sk.filter(col("g") === a).select(col("sk").as("ska"))
      val r = sk.filter(col("g") === b).select(col("sk").as("skb"))
      val x = l.crossJoin(r)
      x.select(lit(a).as("a"), lit(s"intersect_$b").as("op"),
          ThetaIntersectEst(col("ska"), col("skb")).as("est"))
        .unionByName(x.select(lit(a).as("a"), lit(s"union_$b").as("op"),
          ThetaUnionEst(col("ska"), col("skb")).as("est")))
        .unionByName(x.select(lit(a).as("a"), lit(s"diff_$b").as("op"),
          ThetaANotBEst(col("ska"), col("skb")).as("est")))
    }.reduce(_ unionByName _)
    singles.unionByName(pairDf)
  }

  /** Theta rollup: one sketch per (group, time bucket) — the mergeable
    * distinct summary table. Coarser windows and CROSS-WINDOW overlap
    * (retention: "active in range A and still active in range B") are
    * answered from the rollup, never rescanning raw. */
  def buildRollup(
      df: DataFrame, groupCol: String, tsCol: String, keyCol: String,
      bucketSeconds: Long, lgK: Int = 12): DataFrame = {
    val bUs = bucketSeconds * 1000000L
    df.groupBy(col(groupCol).as("g"),
        timestamp_micros((floor(unix_micros(col(tsCol)) / bUs)
          .cast("long") * bUs)).as("bucket"))
      .agg(ThetaAgg(col(keyCol), lgK).as("sk"))
  }

  /** Distinct-overlap between two time ranges, per group, from the
    * rollup: merge each range's bucket sketches, then intersect/union/
    * difference. Output: (g, n_a, n_b, n_both, n_a_only, n_union). */
  def rangeOverlap(
      rollup: DataFrame,
      aFrom: java.sql.Timestamp, aUntil: java.sql.Timestamp,
      bFrom: java.sql.Timestamp, bUntil: java.sql.Timestamp,
      lgK: Int = 12): DataFrame = {
    def merged(from: java.sql.Timestamp, until: java.sql.Timestamp, out: String) =
      rollup.filter(col("bucket") >= lit(from) && col("bucket") < lit(until))
        .groupBy("g").agg(ThetaMergeAgg(col("sk"), lgK).as(out))
    merged(aFrom, aUntil, "ska").join(merged(bFrom, bUntil, "skb"), "g")
      .select(col("g"),
        ThetaEstimate(col("ska")).as("n_a"),
        ThetaEstimate(col("skb")).as("n_b"),
        ThetaIntersectEst(col("ska"), col("skb")).as("n_both"),
        ThetaANotBEst(col("ska"), col("skb")).as("n_a_only"),
        ThetaUnionEst(col("ska"), col("skb")).as("n_union"))
  }
}
