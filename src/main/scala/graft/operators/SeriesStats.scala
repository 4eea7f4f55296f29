package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-series statistics: MAD anomaly detection and lagged
  * cross-correlation — the analytics layer TSDB deployments bolt onto the
  * reference (Kapacitor-style alert rules over InfluxQL, recording rules
  * over PromQL). Both are plain declarative plans: Catalyst broadcasts the
  * tiny per-series stats frames and the raw scan stays one pass.
  */
object SeriesStats {

  /** Points whose robust z-score |v - median| / (1.4826 * MAD) exceeds
    * `k`. Median and MAD are exact here (two groupBy passes over the
    * series column + broadcast joins back); at 100 TB swap the exact
    * median for percentile_approx — the plan shape is unchanged. The
    * 1.4826 factor rescales MAD to σ under normality (the standard robust
    * z-score), folded into one literal so the oracle multiplies in the
    * same order. */
  def madOutliers(
      df: DataFrame, keys: Seq[String], valueCol: String,
      k: Double = 3.0): DataFrame = {
    val kc = keys.map(col)
    val med = df.groupBy(kc: _*).agg(median(col(valueCol)).as("__med"))
    val mad = df.join(broadcast(med), keys)
      .groupBy(kc: _*)
      .agg(median(abs(col(valueCol) - col("__med"))).as("__mad"))
    df.join(broadcast(med), keys).join(broadcast(mad), keys)
      .filter(abs(col(valueCol) - col("__med")) > lit(k * 1.4826) * col("__mad"))
  }

  /** Prometheus-style alert rule `avg(value) > threshold FOR k steps`:
    * per-series grain-bucket averages; an alert is ACTIVE at a bucket
    * when the condition held on that bucket and the k-1 immediately
    * preceding CONSECUTIVE buckets (a gap in the series resets the
    * streak, like a missing Prometheus sample ending the `for` window).
    * One keyed shuffle for the bucket aggregation; the streak logic is
    * two window functions over the already-small bucket frame. */
  def alertRule(
      df: DataFrame, seriesCol: String, tsCol: String, valueCol: String,
      grainUs: Long, threshold: Double, forSteps: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df
      .groupBy(col(seriesCol),
        (floor(unix_micros(col(tsCol)) / grainUs)).cast("long").as("__b"))
      .agg(avg(col(valueCol)).as("__v"))
    val frame = Window.partitionBy(seriesCol).orderBy("__b")
    val streak = g
      .withColumn("__o", when(col("__v") > threshold, 1).otherwise(0))
      .withColumn("__c",
        sum(col("__o")).over(frame.rowsBetween(-(forSteps - 1), 0)))
      .withColumn("__b0", lag(col("__b"), forSteps - 1).over(frame))
    streak
      .filter(col("__c") === forSteps &&
        col("__b") - col("__b0") === (forSteps - 1))
      .select(col(seriesCol),
        timestamp_micros(col("__b") * grainUs).as("fired_at"),
        col("__v").as("v")) // raw average: presentation rounding is the
                            // caller's (see the q187 scaled-integer note)
  }

  /** Time x value heatmap grid (the Grafana heatmap backend): per
    * (time bucket, equi-width value bin) point counts. The value range is
    * computed in one tiny stats pass broadcast back over the scan —
    * two passes total, both full-width; the grid output is
    * |buckets| x nBins rows regardless of input size. Bin arithmetic is
    * plain IEEE division+floor so an oracle reproduces it bit-for-bit. */
  def heatmap(
      df: DataFrame, tsCol: String, valueCol: String, grainUs: Long,
      nBins: Int): DataFrame = {
    val stats = df.agg(
      min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    df.crossJoin(broadcast(stats))
      .withColumn("__vb", least(greatest(
        floor((col(valueCol) - col("__lo")) /
          ((col("__hi") - col("__lo")) / nBins.toDouble)).cast("long"),
        lit(0L)), lit(nBins - 1L)))
      .groupBy(
        timestamp_micros((floor(unix_micros(col(tsCol)) / grainUs)
          .cast("long") * grainUs)).as("tb"),
        col("__vb").as("vb"))
      .agg(count(lit(1)).as("n"))
  }

  /** Pearson correlation between two bucketed series at each lag in
    * [0, maxLag]: series `a` at bucket t against series `b` at bucket
    * t + lag. Buckets are epoch-aligned `grainUs` averages; the join is a
    * broadcast of the lag axis against two already-aggregated series
    * frames (|buckets| rows each), so raw data is scanned once per side
    * regardless of how many lags are asked for. */
  def lagCorrelation(
      df: DataFrame, seriesCol: String, aSeries: String, bSeries: String,
      tsCol: String, valueCol: String, grainUs: Long,
      maxLag: Int): DataFrame = {
    def bucketed(name: String) = df
      .filter(col(seriesCol) === name)
      .groupBy((floor(unix_micros(col(tsCol)) / grainUs)).cast("long").as("__b"))
      .agg(avg(col(valueCol)).as("__v"))
    val a = bucketed(aSeries)
    val b = bucketed(bSeries)
    a.crossJoin(broadcast(
        a.sparkSession.createDataFrame(
          (0 to maxLag).map(Tuple1(_))).toDF("lag")))
      .join(b.withColumnRenamed("__v", "__w").withColumnRenamed("__b", "__bb"),
        col("__bb") === col("__b") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), round(corr(col("__v"), col("__w")), 3).as("r"))
  }
}
