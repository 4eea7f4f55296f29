package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Visualization-grade time-series downsampling. M4 (Jugel et al., VLDB
  * 2014) keeps, per (series, time bucket), the four value extremes a
  * pixel-perfect line rendering needs: first, last, min, and max. It is the
  * standard server-side reduction for "plot a month of a metric" queries —
  * the reference serves the same dashboards through its `time_bucket` +
  * first/last aggregates (df_operator/src/udfs/time_bucket.rs); M4 is that
  * pattern with the error bound made explicit.
  *
  * 100 TB posture: a single hash aggregation on (series, bucket) with full
  * map-side partial aggregation — min/max/min_by/max_by all combine
  * associatively, so each task emits at most one row per (series, bucket)
  * into the shuffle regardless of input volume. Output cardinality is
  * |series| x |buckets|, independent of row count.
  */
object Downsample {

  /** M4 per `seriesCol` per `bucketSeconds`-wide epoch-aligned bucket:
    * (series, bucket_ts, n, v_min, v_max, v_first, v_last). Requires ts
    * uniqueness per series (the engine's dedup-on-read tables guarantee it;
    * `min_by`/`max_by` would otherwise tie-break nondeterministically). */
  def m4(
      df: DataFrame, seriesCol: String, tsCol: String, valueCol: String,
      bucketSeconds: Long): DataFrame = {
    val bucketUs = bucketSeconds * 1000000L
    df.groupBy(col(seriesCol),
        timestamp_micros(floor(unix_micros(col(tsCol)) / bucketUs)
          .cast("long") * bucketUs).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        min_by(col(valueCol), col(tsCol)).as("v_first"),
        max_by(col(valueCol), col(tsCol)).as("v_last"))
  }
}
