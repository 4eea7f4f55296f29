package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TDigestAgg, TDigestMergeAgg, TDigestQuantile}

/** Mergeable quantile-sketch rollups — the percentile counterpart of
  * [[SketchRollup]]: "p95 latency per day, and per month from the SAME
  * precomputation". Exact percentiles do not roll up (a percentile of
  * per-bucket percentiles is not the percentile of the union); t-digests
  * do — see [[graft.functions.TDigestSketch]].
  *
  * 100 TB posture: building is one partial-aggregating hash agg whose
  * shuffle carries ~one compression-bounded sketch (≤ a few KB) per
  * (keys, bucket) group; querying touches only |keys| x |buckets| sketch
  * rows and never rescans raw data. Estimates are sketch-approximations,
  * so correctness is spec-bound (rank-error contract + merge identity),
  * not SQL-oracle-bound — the same contract family as the reference's
  * thetasketch golden.
  */
object QuantileRollup {

  /** Per-(keys, bucketSeconds-aligned bucket) t-digest of `valueCol`,
    * storable in an engine table like any other binary column. */
  def build(
      df: DataFrame, keys: Seq[String], tsCol: String, bucketSeconds: Long,
      valueCol: String, compression: Double = 100.0): DataFrame = {
    val bUs = bucketSeconds * 1000000L
    df.groupBy(keys.map(col) :+ timestamp_micros(
        floor(unix_micros(col(tsCol)) / bUs).cast("long") * bUs).as("bucket"): _*)
      .agg(TDigestAgg(col(valueCol), compression).as("sketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Merge a rollup's sketches over an optional bucket predicate, grouped
    * by `keys`, and read off quantile estimates — any coarser window's
    * percentiles without rescanning raw data. */
  def quantiles(
      rollup: DataFrame, keys: Seq[String], qs: Seq[Double],
      bucketFilter: Option[Column] = None): DataFrame = {
    val merged = bucketFilter.fold(rollup)(rollup.filter)
      .groupBy(keys.map(col): _*)
      .agg(TDigestMergeAgg(col("sketch")).as("merged"), sum("n_rows").as("n"))
    val qCols = qs.map(q =>
      round(TDigestQuantile(col("merged"), q), 4).as(s"p${(q * 100).toInt}"))
    merged.select(keys.map(col) ++ Seq(col("n")) ++ qCols: _*)
  }
}
