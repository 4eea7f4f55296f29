package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-analytics operators over an append-only event stream table:
  * gap-based sessionization, ordered funnel matching, and cohort retention.
  * These are the query shapes an events table exists to answer; the
  * streaming side of the engine has their online twins
  * (streaming/Sessionize.scala session windows), these are the replayable
  * batch versions.
  *
  * 100 TB posture: every operator is one hash shuffle on the entity key
  * followed by key-local windows/aggregates — Spark reuses the exchange
  * across the window passes and the final aggregation, so adding funnel
  * steps or session statistics does not add shuffles. Skew is bounded by
  * the hottest single entity.
  */
object EventAnalytics {

  /** Gap-based session assignment: a new session starts when the key's
    * inter-event gap exceeds `gapSeconds` (the batch analogue of a
    * streaming session window). Adds `session_seq` (1-based per key) to
    * every input row. Two window passes (lag + running sum) over one key
    * shuffle. */
  def sessionize(
      df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(byKey)
    val brk = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_seq", sum(brk).over(run))
  }

  /** Ordered funnel: per key, the timestamp each step was first reached,
    * where step i counts only at-or-after step i-1's first occurrence
    * (the strict-ordering funnel semantics). Output: one row per key with
    * `step_1_ts .. step_N_ts` (null = never reached). One key shuffle;
    * one window pass per step reusing the same partitioning. */
  def funnelSteps(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val byKey = Window.partitionBy(keyCol)
    val withSteps = steps.zipWithIndex.foldLeft(df) { case (acc, (step, i)) =>
      val reached: Column =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step &&
          col(s"step_${i}_ts").isNotNull &&
          col(tsCol) >= col(s"step_${i}_ts")
      acc.withColumn(s"step_${i + 1}_ts",
        min(when(reached, col(tsCol))).over(byKey))
    }
    withSteps
      .groupBy(col(keyCol))
      .agg(min(col("step_1_ts")).as("step_1_ts"),
        (2 to steps.length).map(i =>
          min(col(s"step_${i}_ts")).as(s"step_${i}_ts")): _*)
  }

  /** Gaps-and-islands interval merge: collapse overlapping-or-touching
    * [start, end] intervals per key into maximal disjoint spans. A new
    * island starts when an interval's start exceeds the running max end of
    * every earlier interval of the key (strictly greater — touching
    * intervals merge). Timestamp comparisons are integer microseconds on
    * both engines, so the result is bit-deterministic. One key shuffle;
    * both windows and the final aggregation reuse it. */
  def mergeIntervals(
      df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val isl = df
      .withColumn("__new", when(prevMax.isNull ||
        col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col(keyCol), col("__isl"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__isl")
  }

  /** Cohort retention: keys grouped by the period of their first activity
    * (the cohort), counted as active per whole-period offset since that
    * first activity. Integer epoch-day arithmetic on both engines — no
    * float in sight. Two aggregations on the key partitioning + one final
    * rollup on (cohort, offset). */
  def retentionCohorts(
      df: DataFrame, keyCol: String, tsCol: String,
      periodDays: Int = 7): DataFrame = {
    val first = df.groupBy(keyCol).agg(min(col(tsCol)).as("__t0"))
    val ms = 86400000L
    df.join(first, keyCol)
      .select(col(keyCol),
        ((unix_millis(col(tsCol)) / ms).cast("long") -
         (unix_millis(col("__t0")) / ms).cast("long")).as("__day_off"),
        (unix_millis(col("__t0")) / ms).cast("long").as("__day0"))
      .groupBy((col("__day0") / periodDays).cast("long").as("cohort_period"),
        (col("__day_off") / periodDays).cast("long").as("period_offset"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }

  /** Top event-type paths — the product-analytics "user flow" view: per
    * key ordered by (ts, id), every window of `k` consecutive events is a
    * path `a>b>c`; paths are counted globally and the top `topN` returned
    * by (count desc, path). Truncated windows at a key's tail (fewer than
    * k events left) don't form paths, matching the n-gram convention.
    * One key-partitioned window shuffle for the leads, one count shuffle;
    * the top-n plans as TakeOrderedAndProject (per-partition top-n, no
    * global sort). */
  def topPaths(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, k: Int = 3, topN: Int = 20): DataFrame = {
    require(k >= 2, "a path needs at least 2 steps")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val steps = col(typeCol) +:
      (1 until k).map(i => lead(col(typeCol), i).over(w))
    df.select(concat_ws(">", steps: _*).as("path"),
        steps.last.isNotNull.as("__full"))
      .filter(col("__full"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topN)
  }

  /** RFM segmentation (recency / frequency / monetary): per-key purchase
    * stats quartiled into a 3-digit segment code. Quartiles assign by the
    * rank formula `(rank * 4) div n + 1` over a TOTAL order (metric +
    * key tiebreak) — deterministic, and computed with the distributed
    * two-phase rank ([[graft.pipeline.Sharding.ranked]]) instead of a
    * single-partition ntile window, so a billion-customer frame never
    * funnels through one task. Recency quartile orders oldest-first
    * (r_q 4 = most recent); frequency and monetary order ascending
    * (4 = highest). Reference time = the newest conversion in the data.
    *
    * All-integer arithmetic: recency in whole days via integer µs
    * division, monetary in milli-units. */
  def rfmSegments(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      valueCol: String, convType: String): DataFrame = {
    import graft.pipeline.Sharding
    val p = df.filter(col(typeCol) === convType)
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"),
        round(col(valueCol) * 1000, 0).cast("long").as("__vm"))
    val refUs = p.agg(max("__us")).head().getLong(0)
    val perKey = p.groupBy(col(keyCol)).agg(
        max(col("__us")).as("__mx"),
        count(lit(1)).as("f"),
        sum(col("__vm")).as("m"))
      .withColumn("r_days", expr(s"($refUs - __mx) div 86400000000"))
      .drop("__mx")
    val n = perKey.count()
    def quart(d: DataFrame, order: Seq[org.apache.spark.sql.Column],
        out: String): DataFrame =
      Sharding.ranked(d, order)
        .withColumn(out, expr(s"(seq * 4) div $n + 1"))
        .drop("seq")
    val scored = quart(quart(quart(perKey,
        Seq(col("r_days").desc, col(keyCol)), "r_q"),
        Seq(col("f"), col(keyCol)), "f_q"),
        Seq(col("m"), col(keyCol)), "m_q")
    scored.groupBy((col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
        .as("segment"))
      .agg(count(lit(1)).as("n_keys"), sum("m").as("m_milli"))
  }

  /** Marketing-attribution summary with journey-reset semantics: each
    * conversion's journey is the span since the key's previous conversion;
    * the journey's earliest touch wins under `first_touch`, the latest
    * under `last_touch`, and a journey with no touch attributes to
    * `direct`. Output: (model, touch_type, conversions).
    *
    * One key-partitioned window assigns journey ids (running count of
    * prior conversions); touches reduce per (key, journey) with
    * min_by/max_by over the total (ts, id) order — deterministic, no
    * second window pass — then a single left join back to conversions.
    * All-integer counts; scales as one key shuffle + one small join.
    */
  def attribution(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, convType: String, touchTypes: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val j = df.withColumn("__journey", coalesce(
        sum(when(col(typeCol) === convType, 1L).otherwise(0L)).over(w), lit(0L)))
    val touches = j.filter(col(typeCol).isin(touchTypes.map(x => x: Any): _*))
      .groupBy(col(keyCol), col("__journey"))
      .agg(
        min_by(col(typeCol), struct(col(tsCol), col(idCol))).as("__first"),
        max_by(col(typeCol), struct(col(tsCol), col(idCol))).as("__last"))
    val convs = j.filter(col(typeCol) === convType)
      .select(col(keyCol), col("__journey"))
      .join(touches, Seq(keyCol, "__journey"), "left")
    convs.select(lit("first_touch").as("model"),
        coalesce(col("__first"), lit("direct")).as("touch_type"))
      .unionByName(convs.select(lit("last_touch").as("model"),
        coalesce(col("__last"), lit("direct")).as("touch_type")))
      .groupBy("model", "touch_type")
      .agg(count(lit(1)).as("conversions"))
  }

  /** Event-type co-occurrence with lift (market-basket association over
    * behavioral baskets): a basket is the DISTINCT event types one user
    * produced inside one time bucket; for every unordered type pair,
    * support counts and lift = N·n_ab / (n_a·n_b), presented as an exact
    * scaled integer (`lift_micro`) so the statistic is engine-replayable.
    *
    * Scale shape: basket extraction is one distinct (keyed shuffle on
    * (user, bucket, type)); the pair join is a composite-key equi-join of
    * the basket table with itself — per-basket cost is quadratic only in
    * the number of DISTINCT types in that basket (bounded by the type
    * vocabulary, not by event volume); singles counts broadcast back.
    *
    * Integer headroom: `lift_micro` computes 1e6·n_baskets·n_ab in long
    * arithmetic, exact while that product stays under 2^63 — i.e.
    * n_baskets·n_ab < 9.2e12. Past that (trillions of basket-pair
    * observations) switch the presentation to a double ratio; the
    * supporting counts stay exact regardless. */
  def cooccurrenceLift(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      bucketUs: Long): DataFrame = {
    val baskets = df
      .select(col(userCol).as("__u"),
        expr(s"unix_micros($tsCol) div ${bucketUs}L").as("__b"),
        col(typeCol).as("__t"))
      .distinct()
      .localCheckpoint() // reused three times below; basket table is the
                         // distinct (user,bucket,type) frame, far smaller
                         // than the event stream
    val nBaskets = baskets.select(col("__u"), col("__b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val singles = baskets.groupBy(col("__t")).agg(count(lit(1)).as("__n1"))
    val x = baskets; val y = baskets.select(col("__u"), col("__b"),
      col("__t").as("__t2"))
    x.join(y, Seq("__u", "__b")).filter(col("__t") < col("__t2"))
      .groupBy(col("__t").as("type_a"), col("__t2").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(singles).withColumnRenamed("__t", "type_a")
        .withColumnRenamed("__n1", "n_a"), "type_a")
      .join(broadcast(singles).withColumnRenamed("__t", "type_b")
        .withColumnRenamed("__n1", "n_b"), "type_b")
      .crossJoin(broadcast(nBaskets))
      .withColumn("lift_micro",
        expr("(1000000 * n_baskets * n_ab) div (n_a * n_b)"))
      .select("type_a", "type_b", "n_ab", "n_a", "n_b", "n_baskets",
        "lift_micro")
  }
}
