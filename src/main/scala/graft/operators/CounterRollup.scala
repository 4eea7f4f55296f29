package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Counter-aware downsampling — the Thanos/Cortex "counter aggregation"
  * shape the plain sum/min/max rollup family cannot express: cumulative
  * counters RESET (process restarts drop the value to ~0), so a coarse
  * `last − first` over a bucket under-counts and a naive sum of raw
  * samples is meaningless. Each fine bucket therefore stores, besides the
  * usual envelope, the RESET-ADJUSTED increase (the PromQL `increase`
  * recurrence: Δ = v − prev if nonnegative, else v — on a reset the new
  * sample IS the post-reset accumulation), and coarse-grain rates are
  * served by summing adjusted increases — exact under re-aggregation,
  * because adjacency attribution (a Δ belongs to the LATER point's bucket)
  * makes bucket increases additive.
  *
  * All arithmetic is integer (callers pass integer counters, e.g.
  * milli-scaled), so rollup and serving are engine-exact. One keyed
  * shuffle for the lag window; the bucket aggregation reuses it.
  */
object CounterRollup {

  /** Per (series, bucket): sample count, first/last raw counter, reset
    * count, and the reset-adjusted increase. The series' first-ever sample
    * contributes no increase (PromQL: `increase` starts at the first
    * sample in range). */
  def rollup(
      df: DataFrame, seriesCol: String, tsCol: String, idCol: String,
      counterCol: String, grainUs: Long): DataFrame = {
    val byS = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(idCol))
    val withLag = df.select(
        col(seriesCol), col(tsCol), col(idCol),
        col(counterCol).cast("long").as("__v"),
        (floor(unix_micros(col(tsCol)) / grainUs)).cast("long").as("__b"))
      .withColumn("__prev", lag(col("__v"), 1).over(byS))
      .withColumn("__d", col("__v") - col("__prev"))
      .withColumn("__adj",
        when(col("__prev").isNull, lit(0L))
          .when(col("__d") >= 0, col("__d"))
          .otherwise(col("__v"))) // reset: post-reset accumulation counts
    withLag
      .groupBy(col(seriesCol), col("__b"))
      .agg(
        count(lit(1)).as("n"),
        min_by(col("__v"), struct(col(tsCol), col(idCol))).as("first_v"),
        max_by(col("__v"), struct(col(tsCol), col(idCol))).as("last_v"),
        sum(when(col("__d") < 0, 1L).otherwise(0L)).as("resets"),
        sum(col("__adj")).as("increase"))
      .select(col(seriesCol),
        timestamp_micros(col("__b") * grainUs).as("bucket"),
        col("n"), col("first_v"), col("last_v"), col("resets"),
        col("increase"))
  }

  /** Serve a COARSER grain from the fine rollup: increases and resets sum
    * (the additivity the adjacency attribution buys); the envelope merges
    * by bucket order. `rate_1e6` presents increase per second scaled 1e6
    * via exact truncating division. Never rescans raw data. */
  def serveCoarse(
      fine: DataFrame, seriesCol: String, coarseGrainUs: Long): DataFrame = {
    val b = (floor(unix_micros(col("bucket")) / coarseGrainUs)).cast("long")
    fine
      .groupBy(col(seriesCol), b.as("__cb"))
      .agg(
        sum(col("n")).as("n"),
        min_by(col("first_v"), col("bucket")).as("first_v"),
        max_by(col("last_v"), col("bucket")).as("last_v"),
        sum(col("resets")).as("resets"),
        sum(col("increase")).as("increase"))
      .select(col(seriesCol),
        timestamp_micros(col("__cb") * coarseGrainUs).as("bucket"),
        col("n"), col("first_v"), col("last_v"), col("resets"),
        col("increase"),
        {
          val a = col("increase") * 1000000L
          val denom = lit(coarseGrainUs / 1000000L)
          ((a - (a % denom)) / denom).cast("long").as("rate_1e6")
        })
  }
}
