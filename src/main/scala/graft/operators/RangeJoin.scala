package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without an equi key — "which intervals
  * contain this timestamp" — the query shape behind concurrency counts,
  * maintenance-window attribution, and session-overlap analytics. Spark has
  * no range-join strategy: a naive `l.ts BETWEEN r.start AND r.end` join
  * plans as BroadcastNestedLoopJoin (or worse, CartesianProduct) and dies
  * at scale.
  *
  * The standard fix, implemented here: discretize time into buckets, expand
  * each interval to the buckets it covers (`sequence` + `explode`), bucket
  * each point, and equi-join on the bucket before applying the exact
  * containment filter. Each (point, interval) match is produced exactly
  * once — the point lives in exactly one bucket.
  *
  * 100 TB posture: one hash shuffle per side on the bucket key; the
  * expansion factor is interval_span / bucket width, so pick bucketSeconds
  * near the typical interval length (expansion O(1)) — the classic
  * space/selectivity trade. Hot buckets (many concurrent intervals) skew
  * like any hot key; AQE skew-join splitting applies.
  */
object RangeJoin {

  /** Inner-join `points` (at `tsCol`) with `intervals` ([startCol, endCol],
    * inclusive) on containment. Output: point columns + interval columns.
    * Column name collisions must be resolved by the caller beforehand. */
  def pointInInterval(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    val bUs = bucketSeconds * 1000000L
    val pb = points.withColumn("__pb",
      floor(unix_micros(col(tsCol)) / bUs).cast("long"))
    val ib = intervals.withColumn("__ib", explode(sequence(
      floor(unix_micros(col(startCol)) / bUs).cast("long"),
      floor(unix_micros(col(endCol)) / bUs).cast("long"))))
    pb.join(ib, pb("__pb") === ib("__ib") &&
        col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__pb", "__ib")
  }
}
