package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch rollups — the TSDB pattern behind
  * "unique users per day, and per month from the SAME precomputation".
  * Exact distinct counts do not roll up (a user active on 30 days is 30 in
  * a summed daily rollup, 1 in the monthly truth); HLL sketches do: the
  * union of per-bucket sketches IS the sketch of the union, so one daily
  * rollup answers every coarser window by sketch merge, never rescanning
  * raw data. The reference's thetasketch_distinct
  * (df_operator/src/udfs/thetasketch_distinct.rs) is the per-query form of
  * the same idea; this operator adds the persistable, mergeable rollup.
  *
  * 100 TB posture: building is one partial-aggregating hash agg (sketches
  * merge map-side); querying touches only |keys| x |buckets| sketch rows.
  * Spark's Datasketches-backed hll_sketch_agg/hll_union_agg do the heavy
  * lifting — estimates are hash-dependent, so correctness is spec-bound
  * (merge-exactness + error contract), not SQL-oracle-bound.
  */
object SketchRollup {

  /** Per-(keys, bucketSeconds-aligned bucket) HLL sketch of `distinctCol`.
    * The sketch column is a binary Datasketches HLL, storable in an engine
    * table like any other column. */
  def build(
      df: DataFrame, keys: Seq[String], tsCol: String, bucketSeconds: Long,
      distinctCol: String, lgConfigK: Int = 12): DataFrame = {
    val bUs = bucketSeconds * 1000000L
    df.groupBy(keys.map(col) :+ timestamp_micros(
        floor(unix_micros(col(tsCol)) / bUs).cast("long") * bUs).as("bucket"): _*)
      .agg(hll_sketch_agg(col(distinctCol), lit(lgConfigK)).as("sketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Merge a rollup's sketches over an optional bucket predicate, grouped
    * by `keys`: the estimate any coarser window gets without rescanning
    * raw data. */
  def estimate(
      rollup: DataFrame, keys: Seq[String],
      bucketFilter: Option[Column] = None): DataFrame =
    bucketFilter.fold(rollup)(rollup.filter)
      .groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true)))
        .as("approx_distinct"))
}
