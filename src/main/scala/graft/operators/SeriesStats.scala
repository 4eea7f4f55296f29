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

  /** Rolling-origin forecast backtest: one-step-ahead Holt (level+trend)
    * forecast errors per series over grain buckets — the "how good would
    * my forecast have been" evaluation a capacity planner runs before
    * trusting an alerting forecast. The bucket series uses MAX (order-
    * independent, so the recurrence input is engine-exact); the sequential
    * recurrence streams per series through the
    * [[graft.functions.TaStream]] kernel pattern — one hash-by-series
    * shuffle, O(1) state, a hot series spills through the sort instead of
    * materializing. Errors are presented as µ-scaled integers. */
  def holtBacktest(
      df: DataFrame, seriesCol: String, tsCol: String, valueCol: String,
      grainUs: Long, alpha: Double = 0.5, beta: Double = 0.5): DataFrame = {
    val g = df
      .groupBy(col(seriesCol),
        (floor(unix_micros(col(tsCol)) / grainUs).cast("long") * grainUs)
          .as("__bus"))
      .agg(max(col(valueCol)).cast("double").as("__v"))
    val parted = g.repartition(col(seriesCol))
      .sortWithinPartitions(col(seriesCol), col("__bus"))
    val outSchema = org.apache.spark.sql.types.StructType(
      parted.schema.fields.dropRight(1) :+
        org.apache.spark.sql.types.StructField(
          "__err", org.apache.spark.sql.types.DoubleType))
    parted.mapPartitions(
      graft.functions.TaStream.run(_, 1,
        () => new graft.functions.TaStream.HoltError(alpha, beta)))(
      org.apache.spark.sql.Encoders.row(outSchema))
      .select(col(seriesCol), timestamp_micros(col("__bus")).as("bucket"),
        round(col("__err") * 1000000.0, 0).cast("long").as("err_1e6"))
  }

  /** Multiwindow multi-burn-rate SLO alert (the SRE-workbook paging rule):
    * per key, bucket events to `grainUs` grains, compute error/total
    * counts over a SHORT and a LONG trailing window, and alert only when
    * BOTH windows burn error budget faster than the threshold — the long
    * window guards against flappy spikes, the short one ends the alert
    * quickly once the burn stops.
    *
    * Windows are RANGE frames over the bucket epoch, not ROWS frames:
    * event gaps leave missing buckets, and a rows-frame would silently
    * stretch the window over them (a 100 TB corpus of sparse series hits
    * this constantly). The alert predicate is integer cross-multiplied
    * (`err * thrDen >= thrNum * total` with threshold×budget = thrNum/
    * thrDen), so the output is engine-exact — no float division anywhere.
    *
    * One (key, bucket) aggregation shuffle; both window passes and the
    * final projection reuse the key partitioning. */
  def burnRateAlerts(
      df: DataFrame, keyCol: String, tsCol: String,
      errCond: org.apache.spark.sql.Column, grainUs: Long,
      shortBuckets: Int, longBuckets: Int,
      thrNum: Long, thrDen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df
      .groupBy(col(keyCol),
        (floor(unix_micros(col(tsCol)) / grainUs).cast("long") * grainUs).as("__bus"))
      .agg(count(lit(1)).as("__n"),
        sum(when(errCond, 1L).otherwise(0L)).as("__e"))
    def frame(buckets: Int) = Window.partitionBy(keyCol).orderBy("__bus")
      .rangeBetween(-(buckets - 1L) * grainUs, 0)
    g
      .withColumn("err_short", sum("__e").over(frame(shortBuckets)))
      .withColumn("n_short", sum("__n").over(frame(shortBuckets)))
      .withColumn("err_long", sum("__e").over(frame(longBuckets)))
      .withColumn("n_long", sum("__n").over(frame(longBuckets)))
      .select(col(keyCol), timestamp_micros(col("__bus")).as("bucket"),
        col("err_short"), col("n_short"), col("err_long"), col("n_long"),
        (col("err_short") * thrDen >= lit(thrNum) * col("n_short") &&
         col("err_long") * thrDen >= lit(thrNum) * col("n_long")).as("alert"))
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

  /** Integer division of two integer columns presented as an
    * engine-portable scaled value. Both DuckDB's `//` and Java's `/`
    * TRUNCATE toward zero, and both engines' `%` keeps the dividend's
    * sign, so `(a - a % b) / b` is the shared truncating quotient —
    * Spark has no integral-divide Column op, but `a - a % b` is exactly
    * divisible by `b`, making the double division exact whenever the
    * numerator stays under 2^53 (trivially true for the 1e4-scaled
    * analytics here). Bit-exact on both engines, any sign. */
  private[operators] def scaledTruncDiv(
      num: Column, denom: Column, scale: Long): Column = {
    val a = num * scale
    ((a - (a % denom)) / denom).cast("long")
  }

  /** Two-window mean-shift changepoint scan (CUSUM's windowed cousin):
    * flag points where the mean of the next `k` samples differs from the
    * mean of the previous `k` by more than `threshold` (value units).
    * Values are scaled to integer milli-units first, so the window sums —
    * and therefore the detection decision — are run-order independent and
    * engine-exact; `sum_delta_milli` = (leading sum − trailing sum) in
    * milli-units, i.e. k·1000·(mean shift). One key shuffle, two frame
    * sums over it. */
  def meanShiftChangepoints(
      df: DataFrame, seriesCol: String, tsCol: String, idCol: String,
      valueCol: String, k: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byS = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(idCol))
    val v = round(col(valueCol) * 1000).cast("long")
    val trail = sum(v).over(byS.rowsBetween(-k, -1))
    val lead = sum(v).over(byS.rowsBetween(0, k - 1))
    val nTrail = count(lit(1)).over(byS.rowsBetween(-k, -1))
    val nLead = count(lit(1)).over(byS.rowsBetween(0, k - 1))
    df.select(col(seriesCol), col(tsCol), col(idCol),
        trail.as("__t"), lead.as("__l"), nTrail.as("__nt"), nLead.as("__nl"))
      .filter(col("__nt") === k && col("__nl") === k &&
        abs(col("__l") - col("__t")) > lit(math.round(threshold * 1000) * k))
      .select(col(seriesCol), col(tsCol), col(idCol),
        (col("__l") - col("__t")).as("sum_delta_milli"))
  }

  /** Classical additive seasonal decomposition by moving averages
    * (the STL ancestor: trend = centered 2×m MA, seasonal = per-phase mean
    * of the detrended series, residual = remainder). Operates on per-bucket
    * SUMS of milli-scaled values so every intermediate is an exact integer
    * rational with a constant denominator: trend numerator is the
    * half-weighted window sum (denominator 2m), seasonal sums those
    * numerators per phase (denominator 2m·n_phase), and the residual is
    * recombined over the common denominator — all presented through
    * [[scaledTruncDiv]] at 1e-4 resolution, bit-identical across engines
    * and runs. Trend requires a CONTIGUOUS full window (a grid gap yields
    * no decomposition at that bucket, like a missing sample in R's
    * `decompose`). One bucket aggregation shuffle; windows and the phase
    * join operate on the grid-bounded bucket frame. */
  def seasonalDecompose(
      df: DataFrame, tsCol: String, valueCol: String, grainUs: Long,
      period: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(period % 2 == 0, "period must be even (2xm centered MA)")
    val h = period / 2
    val buckets = df
      .groupBy((floor(unix_micros(col(tsCol)) / grainUs)).cast("long").as("b"))
      .agg(sum(round(col(valueCol) * 1000).cast("long")).as("x"))
    val byB = Window.orderBy(col("b"))
    // half-weighted centered window: x[b-h] + 2*sum(x[b-h+1..b+h-1]) + x[b+h]
    // over denominator 2m; contiguity enforced via count + span.
    val w = buckets
      .withColumn("__lo", first(col("x")).over(byB.rowsBetween(-h, h)))
      .withColumn("__hi", last(col("x")).over(byB.rowsBetween(-h, h)))
      .withColumn("__mid2",
        sum(col("x") * 2).over(byB.rowsBetween(-h + 1, h - 1)))
      .withColumn("__n", count(lit(1)).over(byB.rowsBetween(-h, h)))
      .withColumn("__b0", first(col("b")).over(byB.rowsBetween(-h, h)))
      .withColumn("__b1", last(col("b")).over(byB.rowsBetween(-h, h)))
      .filter(col("__n") === period + 1 && col("__b1") - col("__b0") === period)
      .withColumn("trend_num", col("__lo") + col("__mid2") + col("__hi"))
      .select(col("b"), col("x"), col("trend_num"),
        pmod(col("b"), lit(period.toLong)).as("phase"),
        // detrended numerator over denominator 2m
        (col("x") * (2L * period) - col("trend_num")).as("det_num"))
    val seasonal = w.groupBy(col("phase"))
      .agg(sum(col("det_num")).as("s_num"), count(lit(1)).as("n_p"))
    w.join(broadcast(seasonal), "phase")
      .select(
        timestamp_micros(col("b") * grainUs).as("bucket"),
        col("x").as("sum_milli"),
        scaledTruncDiv(col("trend_num"), lit(2L * period), 10000L)
          .as("trend_1e4"),
        scaledTruncDiv(col("s_num"), lit(2L * period) * col("n_p"), 10000L)
          .as("seasonal_1e4"),
        scaledTruncDiv(
          col("x") * (lit(2L * period) * col("n_p")) -
            col("trend_num") * col("n_p") - col("s_num"),
          lit(2L * period) * col("n_p"), 10000L).as("residual_1e4"))
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

  /** Time-weighted average per (series, bucket): the irregular-sampling
    * mean every TSDB downsampler needs (InfluxDB `integral/elapsed`,
    * Timescale `time_weight('Linear',…)` with left-step interpolation).
    * Each in-bucket point holds its value until the next point
    * (last-observation-carried-forward), truncated at the bucket's own
    * first/last samples: twa = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first).
    * A bucket whose samples all share one timestamp (n=1 included)
    * degrades to their plain mean.
    *
    * Every intermediate is an exact integer (milli-value × µs area sums),
    * presented via [[scaledTruncDiv]] at 1e-4 — run-order independent and
    * engine-exact. One keyed shuffle on (series, bucket); the lead()
    * window rides the same partitioning (no second exchange). */
  def timeWeightedAvg(
      df: DataFrame, seriesCol: String, tsCol: String, idCol: String,
      valueCol: String, grainUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(
      col(seriesCol).as("__s"),
      unix_micros(col(tsCol)).as("__us"),
      (floor(unix_micros(col(tsCol)) / grainUs)).cast("long").as("__b"),
      col(idCol).as("__id"),
      round(col(valueCol) * 1000).cast("long").as("__v"))
    val w = Window.partitionBy("__s", "__b").orderBy(col("__us"), col("__id"))
    val g = pts
      .withColumn("__nextUs", lead(col("__us"), 1).over(w))
      .groupBy(col("__s"), col("__b"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__nextUs").isNotNull,
          col("__v") * (col("__nextUs") - col("__us"))).otherwise(lit(0L)))
          .as("__area"),
        min(col("__us")).as("__t0"), max(col("__us")).as("__t1"),
        sum(col("__v")).as("__sv"))
    g.select(
      col("__s").as(seriesCol),
      timestamp_micros(col("__b") * grainUs).as("bucket"),
      col("n"),
      when(col("__t1") === col("__t0"),
        scaledTruncDiv(col("__sv"), col("n"), 10L))
        .otherwise(scaledTruncDiv(col("__area"), col("__t1") - col("__t0"), 10L))
        .as("twa_1e4"))
  }

  /** Series-cardinality governance report: per grain bucket, how many
    * distinct series were ACTIVE, how many were seen for the FIRST time,
    * and the running total of distinct series ever seen — the churn view
    * an operator of a high-cardinality TSDB watches to catch tag-explosion
    * incidents (the reference bounds series via its tsid sampling; this is
    * the monitoring for when that bound is threatened).
    *
    * All counts are integers. Two keyed shuffles over the DISTINCT
    * (series, bucket) frame (partial aggregation absorbs the raw scan);
    * the running sum rides the grid-bounded bucket frame (|time range| /
    * grain rows — thousands, never data-scale, so the single-partition
    * window is safe at any corpus size). */
  def cardinalityReport(
      df: DataFrame, tagCols: Seq[String], tsCol: String,
      grainUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sb = df.select(
      concat_ws("\u0000", tagCols.map(c => col(c).cast("string")): _*).as("__series"),
      (floor(unix_micros(col(tsCol)) / grainUs)).cast("long").as("__b"))
      .distinct()
    val active = sb.groupBy(col("__b")).agg(count(lit(1)).as("active_series"))
    val fresh = sb.groupBy(col("__series")).agg(min(col("__b")).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("new_series"))
    active.join(fresh, Seq("__b"), "left")
      .withColumn("new_series", coalesce(col("new_series"), lit(0L)))
      .withColumn("cum_series",
        sum(col("new_series")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, 0)))
      .select(timestamp_micros(col("__b") * grainUs).as("bucket"),
        col("active_series"), col("new_series"), col("cum_series"))
  }

  /** Seasonal-adjusted anomalies: buckets whose [[seasonalDecompose]]
    * residual exceeds `thr1e4` (1e-4 value units) in absolute value —
    * level shifts and spikes that survive removal of trend AND the
    * periodic pattern, the detection a plain threshold or MAD scan
    * cannot do on strongly seasonal series. Purely integer comparisons
    * over the decomposition's exact-rational output. */
  def seasonalAnomalies(
      df: DataFrame, tsCol: String, valueCol: String, grainUs: Long,
      period: Int, thr1e4: Long): DataFrame =
    seasonalDecompose(df, tsCol, valueCol, grainUs, period)
      .filter(abs(col("residual_1e4")) > thr1e4)
      .select(col("bucket"), col("sum_milli"), col("trend_1e4"),
        col("seasonal_1e4"), col("residual_1e4"))

  /** Data-gap report: the `topK` largest inter-arrival gaps per series —
    * the "where is my data missing" scan every TSDB operator runs after
    * an ingest incident. One window pass per series (lag on the ordered
    * integer-µs timestamps), then a per-series top-k that Spark executes
    * with WindowGroupLimit (map-side partial top-k before the shuffle).
    * All-integer arithmetic — deterministic across engines.
    *
    * Ties in (ts, value) order pair equal timestamps arbitrarily, but any
    * pairing yields the same gap multiset (equal-ts gaps are 0 and
    * filtered), so the output is still deterministic. */
  def seriesGaps(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gaps = df
      .select(col(keyCol).as("series"), unix_micros(col(tsCol)).as("__us"),
        col(valueCol).as("__v"))
      .withColumn("__pu", lag(col("__us"), 1).over(
        Window.partitionBy(col("series")).orderBy(col("__us"), col("__v"))))
      .filter(col("__pu").isNotNull && col("__us") > col("__pu"))
      .select(col("series"), col("__pu").as("__s"), col("__us").as("__e"),
        (col("__us") - col("__pu")).as("gap_us"))
    val rank = Window.partitionBy(col("series"))
      .orderBy(desc("gap_us"), asc("__s"))
    gaps.withColumn("rn", row_number().over(rank))
      .filter(col("rn") <= topK)
      .select(col("series"),
        timestamp_micros(col("__s")).as("gap_start"),
        timestamp_micros(col("__e")).as("gap_end"),
        col("gap_us"))
  }

  /** Out-of-order-arrival report — the telemetry that sizes a streaming
    * watermark (and the engine's dedup-window): per series, how many
    * points arrived with an event time BEHIND the series' running
    * maximum (in arrival order = `arrivalCol`, the producer sequence),
    * and how far behind the worst one was. A watermark shorter than
    * `max_late_us` silently drops data; `late_bp` (basis points) says
    * whether lateness is endemic or a stray producer.
    *
    * One keyed window in arrival order — parallel across series, no
    * global sort; all integer µs arithmetic, engine-replayable. */
  def latenessReport(
      df: DataFrame, keyCol: String, tsCol: String,
      arrivalCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("series")).orderBy(col("__arr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(keyCol).as("series"), unix_micros(col(tsCol)).as("__us"),
        col(arrivalCol).as("__arr"))
      .withColumn("__mx", max("__us").over(w))
      .withColumn("__late", col("__mx").isNotNull && col("__us") < col("__mx"))
      .groupBy("series")
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("__late"), 1L).otherwise(0L)).as("n_late"),
        coalesce(max(when(col("__late"), col("__mx") - col("__us"))), lit(0L))
          .as("max_late_us"))
      .withColumn("late_bp", expr("(10000 * n_late) div n_points"))
  }

  /** SAX motif discovery (Lin et al. 2003, "A Symbolic Representation of
    * Time Series"): each series is discretized into an `alphabet`-symbol
    * string — here per POINT against the series' own [min, max] span
    * rather than PAA-mean buckets, so symbol assignment is single-value
    * IEEE arithmetic (bit-identical in any engine; a mean would make bin
    * edges depend on float summation order) — and every `wordLen`-point
    * sliding window becomes a word. Words recurring in two or more
    * DISTINCT series are the motifs: shared shapes (sawtooth resets,
    * load ramps, burst-decay) that cross-series alerting keys on.
    *
    * Output: one row per motif word — (word, n_series, n_occurrences).
    *
    * Scale shape: min/max are order-insensitive exact aggregates over the
    * series key (map-side combined, broadcast back); symbolization is
    * map-only; the sliding word is a per-series lead() window (keyed
    * shuffle, never global); the motif rollup keys on the word. Driver
    * state: none.
    */
  def saxMotifs(
      df: DataFrame, seriesCol: Column, tsCol: String, valueCol: String,
      idCol: String, alphabet: Int = 4, wordLen: Int = 6): DataFrame = {
    // symbols must be single characters: the full-window filter below
    // distinguishes complete words from trailing stubs by string LENGTH
    require(alphabet >= 2 && alphabet <= 10, s"alphabet $alphabet not in [2,10]")
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(seriesCol.as("series"), col(tsCol).as("__ts"),
      col(idCol).as("__id"), col(valueCol).cast("double").as("__v"))
    val span = pts.groupBy("series")
      .agg(min("__v").as("__lo"), max("__v").as("__hi"))
    val w = Window.partitionBy("series").orderBy(col("__ts"), col("__id"))
    val sym = pts.join(broadcast(span), "series")
      .withColumn("__sym",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(lit(alphabet - 1).cast("long"),
            floor((col("__v") - col("__lo")) * alphabet /
              (col("__hi") - col("__lo"))))))
    val word = concat_ws("",
      (0 until wordLen).map(i =>
        if (i == 0) col("__sym") else lead(col("__sym"), i).over(w)): _*)
    sym.withColumn("__word", word)
      // the trailing wordLen-1 points of each series have no full window:
      // their concat_ws silently skipped the null leads, leaving a short
      // word — drop by length, not null checks
      .filter(length(col("__word")) === wordLen)
      .groupBy(col("__word").as("word"))
      .agg(countDistinct(col("series")).as("n_series"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_series") >= 2)
  }
}
