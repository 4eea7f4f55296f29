package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{MisraGriesAgg, MisraGriesMergeAgg, MisraGriesTopK}

/** Mergeable frequent-items rollups — the frequency member of the sketch
  * triad ([[SketchRollup]] = distinct, [[QuantileRollup]] = quantiles):
  * "top user_ids per day, and per month from the SAME precomputation".
  * Exact top-k does not roll up (a key can be top-k overall without being
  * top-k in any single bucket); Misra-Gries summaries do, with the
  * mergeable guarantee `true - N/(k+1) <= estimate <= true`.
  *
  * 100 TB posture: building is one partial-aggregating hash agg whose
  * shuffle carries a capacity-bounded summary per (keys, bucket) group —
  * never the full key universe; querying touches only sketch rows. With
  * capacity >= |universe| the summary is lossless and the result is
  * EXACT (how the battery oracle-checks q185); undersized capacities
  * keep the MG bound (spec-tested on zipf data).
  */
object FreqRollup {

  /** Per-(keys, bucketSeconds-aligned bucket) capacity-k MG summary of
    * `itemCol` (stringified), storable like any binary column. */
  def build(
      df: DataFrame, keys: Seq[String], tsCol: String, bucketSeconds: Long,
      itemCol: String, k: Int): DataFrame = {
    val bUs = bucketSeconds * 1000000L
    df.groupBy(keys.map(col) :+ timestamp_micros(
        floor(unix_micros(col(tsCol)) / bUs).cast("long") * bUs).as("bucket"): _*)
      .agg(MisraGriesAgg(col(itemCol).cast("string"), k).as("sketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Merge a rollup's summaries over an optional bucket predicate, grouped
    * by `keys`, and explode the top-n (item, est_count) rows. */
  def topK(
      rollup: DataFrame, keys: Seq[String], n: Int,
      bucketFilter: Option[Column] = None): DataFrame =
    bucketFilter.fold(rollup)(rollup.filter)
      .groupBy(keys.map(col): _*)
      .agg(MisraGriesMergeAgg(col("sketch")).as("merged"))
      .select(keys.map(col) :+
        explode(MisraGriesTopK(col("merged"), n)).as(Seq("item", "est_count")): _*)
}
