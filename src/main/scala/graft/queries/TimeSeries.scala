package graft.queries

import graft.{GraftQuery, Tables}
import graft.functions.TimeBucket.timeBucket
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TSDB-semantics battery: the operators HoraeDB adds on top of DataFusion
  * (SURVEY.md §1, §2.1, §2.6) — time-range extraction, dedup-on-read for
  * overwrite-mode tables, time_bucket, series top-k — exercised over the
  * `events` stream table (ts = timestamp, event_type = tag, user_id = series
  * key, value = field, event_id = ingest sequence).
  */
object TimeSeries {
  import Tables.t

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  /** Build + register the 6h events rollup once per (session, fixture):
    * q178 then aggregates the RAW table and the RollupRewrite rule must
    * transparently serve it from this pre-aggregate (PlansSpec-style
    * assert in OperatorsSpec; the oracle still checks against raw). */
  private val rollupMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), java.lang.Boolean]()
  private def ensureEventsRollup(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    rollupMemo.computeIfAbsent((System.identityHashCode(s), dir), _ => {
      val grainUs = 21600000000L // 6h
      // materialize to DISK, not localCheckpoint: the rollup is shared by
      // many queries across the whole battery, and the harness unpersists
      // pinned blocks between queries (inter-query isolation). A stored
      // parquet table is also what a production rollup IS — the serving
      // rule splices a plain scan of the pre-aggregate.
      val rollupPath = graft.TempDirs.create("graft-rollup-6h").toString
      t(s, dir, "events")
        .groupBy(col("event_type"),
          timestamp_micros((floor(unix_micros(col("ts")) / grainUs)
            .cast("long") * grainUs)).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"),
          min("value").as("min_value"), max("value").as("max_value"))
        .write.mode("overwrite").parquet(rollupPath)
      val rollup = s.read.parquet(rollupPath)
      graft.plans.Rollups.register(s, s"events_6h:$dir",
        graft.plans.Rollups.RollupSpec(
          rawPathContains = s"$dir/events.parquet",
          tsCol = "ts", grainUs = grainUs, tags = Set("event_type"),
          bucketCol = "bucket", countCol = Some("n"),
          sums = Map("value" -> "sum_value"),
          mins = Map("value" -> "min_value"),
          maxs = Map("value" -> "max_value"),
          rollup = () => rollup))
      java.lang.Boolean.TRUE
    })

  val all: Seq[GraftQuery] = Seq(

    // ---- time-range scan: HoraeDB's Predicate{time_range} pushdown
    //      (reference: table_engine/src/predicate.rs:161-206). In Spark the
    //      range lands in PushedFilters on the parquet scan.
    GraftQuery("q30_time_range_scan",
      Some("""SELECT event_id, ts, user_id, "value"
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND ts <  TIMESTAMP '2024-01-11 00:00:00'""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .filter(col("ts") >= lit(ts("2024-01-10 00:00:00")) &&
                col("ts") <  lit(ts("2024-01-11 00:00:00")))
        .select("event_id", "ts", "user_id", "value")),

    // ---- tag group-by aggregate (the canonical HoraeDB query shape)
    GraftQuery("q31_tag_aggregate",
      Some("""SELECT event_type, count(*) AS n, round(sum("value"), 2) AS total,
             |  round(min("value"), 2) AS min_v, round(max("value"), 2) AS max_v
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
             |GROUP BY event_type""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .filter(col("ts") >= lit(ts("2024-01-05 00:00:00")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"),
             round(min("value"), 2).as("min_v"), round(max("value"), 2).as("max_v"))),

    // ---- time_bucket PT5M (reference df_operator/src/udfs/time_bucket.rs)
    GraftQuery("q32_time_bucket_pt5m",
      Some("""SELECT make_timestamp((epoch_ms(ts) // 300000) * 300000 * 1000) AS bucket,
             |  count(*) AS n, round(sum("value"), 2) AS total
             |FROM events GROUP BY 1""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy(timeBucket(col("ts"), "PT5M").as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))),

    // ---- time_bucket P1D with the reference's default +08:00 timezone
    //      (time_bucket.rs:83): day boundaries shift by 8 hours.
    GraftQuery("q33_time_bucket_p1d_tz8",
      Some("""SELECT make_timestamp((((epoch_ms(ts) + 28800000) // 86400000)
             |    * 86400000 - 28800000) * 1000) AS bucket,
             |  count(*) AS n
             |FROM events GROUP BY 1""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy(timeBucket(col("ts"), "P1D").as("bucket"))
        .agg(count(lit(1)).as("n"))),

    // ---- dedup-on-read: overwrite-mode semantics (reference merge-dedup read,
    //      analytic_engine row_iter/dedup.rs) — newest ingest sequence wins per
    //      primary key (user_id, ts); event_id stands in for the WAL sequence.
    GraftQuery("q34_dedup_overwrite_read",
      Some("""SELECT count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
             |  round(sum("value"), 2) AS total
             |FROM (
             |  SELECT user_id, ts, "value",
             |    row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)))
        .filter(col("rn") === 1)
        .agg(count(lit(1)).as("n_rows"), countDistinct("user_id").as("n_users"),
             round(sum("value"), 2).as("total"))),

    // ---- epoch-integer timestamp comparison (reference TypeConversion rule,
    //      query_frontend/src/logical_optimizer/type_conversion.rs): the filter
    //      literal arrives as epoch millis, not a timestamp.
    GraftQuery("q36_epoch_millis_filter",
      Some("""SELECT count(*) AS n, round(sum("value"), 2) AS total
             |FROM events WHERE ts > make_timestamp(1705276800000 * 1000)""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .filter(col("ts") > timestamp_millis(lit(1705276800000L)))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))),

    // ---- per-series top-k (hot series)
    GraftQuery("q37_top_series",
      Some("""SELECT user_id, count(*) AS n, round(sum("value"), 2) AS total
             |FROM events GROUP BY user_id
             |ORDER BY total DESC, user_id LIMIT 10""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy(col("total").desc, col("user_id"))
        .limit(10)),

    // ---- thetasketch_distinct ≈ approx_count_distinct (reference
    //      df_operator/src/udfs/thetasketch_distinct.rs, HLL err 0.01). Spark's
    //      HLL++ values differ from DuckDB's HLL, so the oracle is rows-only;
    //      ThetaSketchSpec asserts <1% relative error against exact counts.
    GraftQuery("q39_thetasketch_distinct",
      None,
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct("user_id", 0.01).as("approx_users"))),

    // ---- as-of join: each purchase enriched with the user's most recent
    //      prior click (graft.operators.AsofJoin — single-shuffle union +
    //      last-observation window; DuckDB replays it with native ASOF)
    GraftQuery("q164_asof_join",
      Some("""SELECT l.event_id, l.user_id, l.ts,
             |  round(l."value", 2) AS purchase_value,
             |  r.ts AS click_ts, round(r."value", 2) AS click_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value")
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "ts", "value")
        graft.operators.AsofJoin.asofJoin(purchases, clicks, Seq("user_id"), "ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            round(col("value"), 2).as("purchase_value"),
            col("right_ts").as("click_ts"),
            round(col("right_value"), 2).as("click_value"))
      }),

    // ---- M4 downsampling: per-series 6h buckets keeping first/last/min/max
    //      (graft.operators.Downsample — one partial-aggregating hash agg)
    GraftQuery("q165_m4_downsample",
      Some("""SELECT user_id,
             |  make_timestamp((epoch_ms(ts) // 21600000) * 21600000 * 1000) AS bucket,
             |  count(*) AS n,
             |  round(min("value"), 2) AS v_min, round(max("value"), 2) AS v_max,
             |  round(arg_min("value", ts), 2) AS v_first,
             |  round(arg_max("value", ts), 2) AS v_last
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, dir) => graft.operators.Downsample.m4(
          t(s, dir, "events"), "user_id", "ts", "value", bucketSeconds = 21600L)
        .select(col("user_id"), col("bucket"), col("n"),
          round(col("v_min"), 2).as("v_min"), round(col("v_max"), 2).as("v_max"),
          round(col("v_first"), 2).as("v_first"),
          round(col("v_last"), 2).as("v_last"))),

    // ---- batch sessionization: gap>4h starts a session; session summaries
    //      (graft.operators.EventAnalytics.sessionize — lag + running-sum
    //      windows and the summary agg all on ONE user_id shuffle)
    GraftQuery("q168_batch_sessionize",
      Some("""WITH o AS (SELECT user_id, ts, "value",
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 4 HOUR
             |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |      THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM o)
             |SELECT user_id, session_seq::BIGINT AS session_seq, min(ts) AS session_start,
             |  max(ts) AS session_end, count(*) AS n_events,
             |  round(sum("value"), 2) AS total
             |FROM s GROUP BY 1, 2""".stripMargin),
      (s, dir) => graft.operators.EventAnalytics.sessionize(
          t(s, dir, "events").select("user_id", "ts", "value"),
          "user_id", "ts", gapSeconds = 4 * 3600L)
        .groupBy("user_id", "session_seq")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))),

    // ---- ordered funnel: view -> click -> purchase, completion within 7
    //      days of the first view (EventAnalytics.funnelSteps — one window
    //      pass per step, all reusing the user_id partitioning)
    GraftQuery("q169_funnel",
      Some("""WITH f AS (SELECT user_id, min(ts) FILTER (WHERE event_type='view') AS t1
             |           FROM events GROUP BY 1),
             |c AS (SELECT f.user_id, t1,
             |        (SELECT min(ts) FROM events e WHERE e.user_id = f.user_id
             |           AND e.event_type='click' AND e.ts >= t1) AS t2 FROM f),
             |p AS (SELECT c.user_id, t1, t2,
             |        (SELECT min(ts) FROM events e WHERE e.user_id = c.user_id
             |           AND e.event_type='purchase' AND e.ts >= t2) AS t3 FROM c)
             |SELECT count(*) FILTER (WHERE t1 IS NOT NULL) AS step1_view,
             |  count(*) FILTER (WHERE t2 IS NOT NULL) AS step2_click,
             |  count(*) FILTER (WHERE t3 IS NOT NULL
             |    AND t3 <= t1 + INTERVAL 7 DAY) AS step3_purchase_7d
             |FROM p""".stripMargin),
      (s, dir) => graft.operators.EventAnalytics.funnelSteps(
          t(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .agg(
          count(when(col("step_1_ts").isNotNull, 1)).as("step1_view"),
          count(when(col("step_2_ts").isNotNull, 1)).as("step2_click"),
          count(when(col("step_3_ts").isNotNull &&
            col("step_3_ts") <= col("step_1_ts") + expr("INTERVAL 7 DAY"), 1))
            .as("step3_purchase_7d"))),

    // ---- weekly cohort retention: users bucketed by first-activity week,
    //      counted per week-offset (EventAnalytics.retentionCohorts —
    //      integer epoch-day arithmetic, no floats)
    GraftQuery("q170_retention_cohorts",
      Some("""WITH f AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1)
             |SELECT (epoch_ms(f.t0) // 86400000) // 7 AS cohort_period,
             |  ((epoch_ms(e.ts) // 86400000) - (epoch_ms(f.t0) // 86400000)) // 7
             |    AS period_offset,
             |  count(DISTINCT e.user_id) AS n_users
             |FROM events e JOIN f USING (user_id)
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) => graft.operators.EventAnalytics.retentionCohorts(
        t(s, dir, "events"), "user_id", "ts", periodDays = 7)),

    // ---- keyless point-in-interval range join: per error event, how many
    //      sessions (any user) were open at that instant. Spark plans a raw
    //      BETWEEN join as a nested-loop product; RangeJoin discretizes to
    //      day buckets and equi-joins (graft.operators.RangeJoin).
    GraftQuery("q171_interval_join",
      Some("""WITH o AS (SELECT user_id, ts,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 4 HOUR
             |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |      THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS seq FROM o),
             |sess AS (SELECT user_id, seq, min(ts) AS st, max(ts) AS en
             |         FROM s GROUP BY 1, 2),
             |err AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
             |SELECT e.event_id, count(x.st) AS n_open_sessions
             |FROM err e LEFT JOIN sess x ON e.ts >= x.st AND e.ts <= x.en
             |GROUP BY 1""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val sess = graft.operators.EventAnalytics.sessionize(
            ev.select("user_id", "ts"), "user_id", "ts", gapSeconds = 4 * 3600L)
          .groupBy("user_id", "session_seq")
          .agg(min("ts").as("s_start"), max("ts").as("s_end"))
        val errors = ev.filter(col("event_type") === "error")
          .select("event_id", "ts")
        val counts = graft.operators.RangeJoin.pointInInterval(
            errors, "ts", sess.select("s_start", "s_end"),
            "s_start", "s_end", bucketSeconds = 86400L)
          .groupBy("event_id").agg(count(lit(1)).as("__n"))
        errors.join(counts, Seq("event_id"), "left")
          .select(col("event_id"),
            coalesce(col("__n"), lit(0L)).as("n_open_sessions"))
      }),

    // ---- LTOB downsampling (Steinarsson 2013 §4.1): per-series top-1 by
    //      local triangle area within equal-count buckets — declarative,
    //      WindowGroupLimit-friendly; the oracle replays the same windows
    GraftQuery("q173_ltob_downsample",
      Some("""WITH p AS (SELECT user_id, ts, "value",
             |    epoch_us(ts)::DOUBLE AS x, "value"::DOUBLE AS y,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS i,
             |    count(*) OVER (PARTITION BY user_id) AS n,
             |    lag(epoch_us(ts)::DOUBLE)  OVER (PARTITION BY user_id ORDER BY ts) AS xp,
             |    lag("value"::DOUBLE)       OVER (PARTITION BY user_id ORDER BY ts) AS yp,
             |    lead(epoch_us(ts)::DOUBLE) OVER (PARTITION BY user_id ORDER BY ts) AS xn,
             |    lead("value"::DOUBLE)      OVER (PARTITION BY user_id ORDER BY ts) AS yn
             |  FROM events),
             |a AS (SELECT *, abs((xp - xn) * (y - yp) - (xp - x) * (yn - yp)) AS area,
             |    CASE WHEN i = 1 THEN 0 WHEN i = n THEN 49
             |      ELSE 1 + floor(((i - 2)::DOUBLE * 48) / (n - 2)::DOUBLE)::BIGINT
             |    END AS b
             |  FROM p),
             |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, b
             |        ORDER BY area DESC NULLS LAST, ts) AS rk FROM a)
             |SELECT user_id, ts, "value"
             |FROM r WHERE n <= 50 OR i = 1 OR i = n OR rk = 1""".stripMargin),
      (s, dir) => graft.operators.Downsample.ltob(
        t(s, dir, "events"), "user_id", "ts", "value", nOut = 50)),

    // ---- LTTB downsampling (Steinarsson 2013 §4.2): the greedy
    //      prev-selected/next-centroid recurrence as a per-partition
    //      streaming kernel. The oracle replays the sequential selection
    //      with a recursive CTE carrying (series, prev-selected point) and
    //      a correlated argmax per step (the q163 MMR pattern); the area
    //      expression mirrors the kernel's operand order exactly and bucket
    //      centroids sum in index order, so doubles agree bit-for-bit.
    //      OperatorsSpec additionally proves equality against an in-memory
    //      textbook implementation.
    GraftQuery("q174_lttb_downsample",
      Some("""WITH RECURSIVE pts AS (
             |  SELECT user_id AS s, ts, "value" AS v,
             |         epoch_us(ts)::DOUBLE AS x,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS i,
             |         count(*) OVER (PARTITION BY user_id) AS n
             |  FROM events),
             |small AS (SELECT s, ts, v FROM pts WHERE n <= 50),
             |mid AS (
             |  SELECT s, ts, v, x, i,
             |         1 + floor((i - 2)::DOUBLE * 48 / (n - 2)::DOUBLE)::BIGINT AS b
             |  FROM pts WHERE n > 50 AND i >= 2 AND i <= n - 1),
             |cent AS (
             |  SELECT s, b,
             |         list_sum(list(x ORDER BY i)) / count(*) AS cx,
             |         list_sum(list(v ORDER BY i)) / count(*) AS cy
             |  FROM mid GROUP BY s, b),
             |lastpt AS (SELECT s, ts, v, x FROM pts WHERE n > 50 AND i = n),
             |firstpt AS (SELECT s, ts, v, x FROM pts WHERE n > 50 AND i = 1),
             |anch AS (
             |  SELECT m.s, m.b AS k,
             |         coalesce(c.cx, l.x) AS ax, coalesce(c.cy, l.v) AS ay
             |  FROM (SELECT DISTINCT s, b FROM mid) m
             |  LEFT JOIN cent c ON c.s = m.s AND c.b = m.b + 1
             |  JOIN lastpt l ON l.s = m.s),
             |sel AS (
             |  SELECT s, 0::BIGINT AS k, x AS px, v AS py,
             |         CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS DOUBLE) AS v
             |  FROM firstpt
             |  UNION ALL
             |  SELECT sel.s, sel.k + 1, w.pt.x, w.pt.v, w.pt.ts, w.pt.v
             |  FROM sel, LATERAL (
             |    SELECT (
             |      SELECT {'ts': m.ts, 'v': m.v, 'x': m.x}
             |      FROM mid m JOIN anch a ON a.s = sel.s AND a.k = sel.k + 1
             |      WHERE m.s = sel.s AND m.b = sel.k + 1
             |      ORDER BY abs((sel.px - a.ax) * (m.v - sel.py)
             |                 - (sel.px - m.x) * (a.ay - sel.py)) DESC, m.i ASC
             |      LIMIT 1) AS pt) w
             |  WHERE sel.k < 48)
             |SELECT s AS user_id, ts, v AS "value" FROM small
             |UNION ALL
             |SELECT s, ts, v FROM firstpt
             |UNION ALL
             |SELECT s, ts, v FROM sel WHERE k >= 1
             |UNION ALL
             |SELECT s, ts, v FROM lastpt""".stripMargin),
      (s, dir) => graft.operators.Downsample.lttb(
        t(s, dir, "events"), "user_id", "ts", "value", nOut = 50)),

    // ---- mergeable HLL sketch rollup (graft.operators.SketchRollup):
    //      daily per-type sketches merged into whole-range distinct-user
    //      estimates without rescanning raw data. Estimates are
    //      hash-dependent (rows-only); OperatorsSpec binds the merge
    //      identity (merged rollup == direct sketch, bit-exact) and the
    //      HLL error contract vs exact counts.
    GraftQuery("q177_sketch_rollup",
      None,
      (s, dir) => {
        val rollup = graft.operators.SketchRollup.build(
          t(s, dir, "events"), Seq("event_type"), "ts",
          bucketSeconds = 86400L, distinctCol = "user_id")
        graft.operators.SketchRollup.estimate(rollup, Seq("event_type"))
      }),

    // ---- transparent rollup rewrite (plans/Rollups.scala): this query
    //      aggregates the RAW events table at 1-day grain; the registered
    //      6h rollup serves it via the Catalyst rule (count->sum(n),
    //      sum->sum(sum), min/max re-min/max). The oracle checks against
    //      raw data — the rewrite must be result-invisible.
    GraftQuery("q178_rollup_rewrite",
      Some("""SELECT event_type,
             |  make_timestamp((epoch_ms(ts) // 86400000) * 86400000 * 1000) AS day,
             |  count(*) AS n, round(sum("value"), 2) AS total,
             |  min("value") AS v_min, max("value") AS v_max
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        ensureEventsRollup(s, dir)
        val dayUs = 86400000000L
        t(s, dir, "events")
          .groupBy(col("event_type"),
            timestamp_micros((floor(unix_micros(col("ts")) / dayUs)
              .cast("long") * dayUs)).as("day"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"),
            min("value").as("v_min"), max("value").as("v_max"))
      }),

    // ---- rollup rewrite under a filter: the WHERE carries a time range
    //      whose bounds are 6h-aligned (to the ROLLUP grain — deliberately
    //      NOT day-aligned to the query's own bucket) plus a tag IN — all
    //      losslessly servable from the rollup, so the rule still fires.
    //      2024-01-05T06:00Z = 1704434400000000 µs; 2024-01-20T18:00Z =
    //      1705773600000000 µs; both % 21_600_000_000 == 0.
    GraftQuery("q179_rollup_rewrite_filtered",
      Some("""SELECT event_type,
             |  make_timestamp((epoch_ms(ts) // 86400000) * 86400000 * 1000) AS day,
             |  count(*) AS n, round(sum("value"), 2) AS total
             |FROM events
             |WHERE ts >= make_timestamp(1704434400000000)
             |  AND ts < make_timestamp(1705773600000000)
             |  AND event_type IN ('click', 'view', 'error')
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        ensureEventsRollup(s, dir)
        val dayUs = 86400000000L
        t(s, dir, "events")
          .filter(col("ts") >= timestamp_micros(lit(1704434400000000L)) &&
            col("ts") < timestamp_micros(lit(1705773600000000L)) &&
            col("event_type").isin("click", "view", "error"))
          .groupBy(col("event_type"),
            timestamp_micros((floor(unix_micros(col("ts")) / dayUs)
              .cast("long") * dayUs)).as("day"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      }),

    // ---- mergeable t-digest quantile rollup (operators/QuantileRollup,
    //      functions/TDigest.scala): daily per-type sketches merged into
    //      whole-range p50/p95/p99 without rescanning raw data. Estimates
    //      are sketch approximations (rows-only); OperatorsSpec binds the
    //      rank-error contract and the merge identity.
    GraftQuery("q180_quantile_rollup",
      None,
      (s, dir) => {
        val rollup = graft.operators.QuantileRollup.build(
          t(s, dir, "events"), Seq("event_type"), "ts",
          bucketSeconds = 86400L, valueCol = "value")
        graft.operators.QuantileRollup.quantiles(
          rollup, Seq("event_type"), Seq(0.5, 0.95, 0.99))
          .orderBy("event_type")
      }),

    // ---- robust anomaly detection (operators/SeriesStats.madOutliers):
    //      per-series median/MAD, flag |v-med| > 3*1.4826*MAD. Exact
    //      medians here; percentile_approx is the drop-in at 100 TB.
    GraftQuery("q181_anomaly_mad",
      Some("""WITH med AS (
             |  SELECT event_type, median("value") AS m FROM events GROUP BY 1),
             |mad AS (
             |  SELECT e.event_type, median(abs(e."value" - med.m)) AS d
             |  FROM events e JOIN med USING (event_type) GROUP BY 1)
             |SELECT e.event_type, e.event_id, round(e."value", 3) AS v
             |FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
             |WHERE abs(e."value" - med.m) > 4.4478 * mad.d""".stripMargin),
      (s, dir) => {
        graft.operators.SeriesStats.madOutliers(
          t(s, dir, "events"), Seq("event_type"), "value", k = 3.0)
          .select(col("event_type"), col("event_id"),
            round(col("value"), 3).as("v"))
      }),

    // ---- lagged cross-correlation between two bucketed series
    //      (operators/SeriesStats.lagCorrelation): click vs view 6h
    //      averages at lags 0..3 — the "does A lead B" diagnostic.
    GraftQuery("q182_lag_correlation",
      Some("""WITH c AS (
             |  SELECT epoch_ms(ts) // 21600000 AS b, avg("value") AS v
             |  FROM events WHERE event_type = 'click' GROUP BY 1),
             |v AS (
             |  SELECT epoch_ms(ts) // 21600000 AS b, avg("value") AS w
             |  FROM events WHERE event_type = 'view' GROUP BY 1),
             |l AS (SELECT unnest(generate_series(0, 3)) AS lag)
             |SELECT l.lag, count(*) AS n, round(corr(c.v, v.w), 3) AS r
             |FROM l, c JOIN v ON v.b = c.b + l.lag
             |GROUP BY 1""".stripMargin),
      (s, dir) => {
        graft.operators.SeriesStats.lagCorrelation(
          t(s, dir, "events"), "event_type", "click", "view",
          "ts", "value", grainUs = 21600000000L, maxLag = 3)
      }),

    // ---- mergeable frequent-items rollup (operators/FreqRollup,
    //      functions/FreqSketch.scala): daily per-type Misra-Gries
    //      summaries of user_id merged into whole-range top-5. Capacity
    //      100k >= the fixture's user universe, where MG is lossless and
    //      the exact top-k SQL is a true oracle (hash-checked); the
    //      undersized-capacity guarantee is OperatorsSpec-bound.
    GraftQuery("q185_freq_rollup",
      Some("""WITH c AS (SELECT event_type, user_id::VARCHAR AS item,
             |    count(*) AS est_count FROM events GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
             |    ORDER BY est_count DESC, item) AS rk FROM c)
             |SELECT event_type, item, est_count FROM r WHERE rk <= 5""".stripMargin),
      (s, dir) => {
        val rollup = graft.operators.FreqRollup.build(
          t(s, dir, "events"), Seq("event_type"), "ts",
          bucketSeconds = 86400L, itemCol = "user_id", k = 100000)
        graft.operators.FreqRollup.topK(rollup, Seq("event_type"), 5)
      }),

    // ---- time x value heatmap grid (operators/SeriesStats.heatmap):
    //      6h buckets x 20 equi-width value bins, range from a broadcast
    //      stats pass. Bin edges are raw IEEE floor((v-lo)/w) on both
    //      sides — bit-identical bucket assignment.
    GraftQuery("q186_value_heatmap",
      Some("""WITH s AS (SELECT min("value") AS lo, max("value") AS hi FROM events)
             |SELECT make_timestamp((epoch_ms(ts) // 21600000) * 21600000 * 1000) AS tb,
             |  least(greatest(floor(("value" - s.lo)
             |    / ((s.hi - s.lo) / 20.0))::BIGINT, 0), 19) AS vb,
             |  count(*) AS n
             |FROM events, s GROUP BY 1, 2""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.heatmap(
        t(s, dir, "events"), "ts", "value", grainUs = 21600000000L, nBins = 20)),

    // ---- alert rule `avg(value) > 52 FOR 3 consecutive 6h buckets`
    //      (operators/SeriesStats.alertRule) — the Prometheus `for`
    //      clause with gap-resets-streak semantics. The firing average is
    //      presented as a x10^4 scaled INTEGER (q145 convention): raw
    //      round(.,4) sat exactly on a 55.12125 boundary at sf0.01.
    GraftQuery("q187_alert_rule",
      Some("""WITH g AS (SELECT event_type, epoch_ms(ts) // 21600000 AS b,
             |    avg("value") AS v FROM events GROUP BY 1, 2),
             |w AS (SELECT *,
             |    sum(CASE WHEN v > 52 THEN 1 ELSE 0 END) OVER (
             |      PARTITION BY event_type ORDER BY b
             |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS c,
             |    lag(b, 2) OVER (PARTITION BY event_type ORDER BY b) AS b0
             |  FROM g)
             |SELECT event_type, make_timestamp(b * 21600000000) AS fired_at,
             |  CAST(round(v * 10000, 0) AS BIGINT) AS v4
             |FROM w WHERE c = 3 AND b - b0 = 2""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.alertRule(
          t(s, dir, "events"), "event_type", "ts", "value",
          grainUs = 21600000000L, threshold = 52.0, forSteps = 3)
        .select(col("event_type"), col("fired_at"),
          round(col("v") * 10000, 0).cast("long").as("v4"))),

    // ---- gaps-and-islands interval merge (EventAnalytics.mergeIntervals):
    //      per-user click intervals [ts, ts + value minutes] collapsed to
    //      maximal disjoint spans. Integer-microsecond comparisons on both
    //      engines; touching intervals merge (start > running-max-end
    //      starts an island).
    GraftQuery("q191_interval_merge",
      Some("""WITH iv AS (
             |  SELECT user_id, epoch_us(ts) AS s,
             |    epoch_us(ts) + CAST(round("value" * 60, 0) AS BIGINT) * 1000000 AS e
             |  FROM events WHERE event_type = 'click'),
             |m AS (SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM iv),
             |i AS (SELECT *, sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY s, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g FROM m)
             |SELECT user_id, make_timestamp(min(s)) AS span_start,
             |  make_timestamp(max(e)) AS span_end, count(*) AS n_merged
             |FROM i GROUP BY user_id, g""".stripMargin),
      (s, dir) => {
        val iv = t(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("s0"),
            timestamp_micros(unix_micros(col("ts")) +
              round(col("value") * 60, 0).cast("long") * 1000000L).as("e0"))
        graft.operators.EventAnalytics.mergeIntervals(iv, "user_id", "s0", "e0")
      }),

    // ---- two-window mean-shift changepoint scan
    //      (SeriesStats.meanShiftChangepoints): |mean(next 12) −
    //      mean(prev 12)| > 8 value units per event_type stream. Window
    //      sums over milli-scaled integers — run-order independent,
    //      engine-exact detection.
    GraftQuery("q192_changepoints",
      Some("""WITH v AS (SELECT event_type, ts, event_id,
             |    CAST(round("value" * 1000, 0) AS BIGINT) AS v FROM events),
             |w AS (SELECT event_type, ts, event_id,
             |    sum(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
             |      ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS st,
             |    count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
             |      ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS nt,
             |    sum(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
             |      ROWS BETWEEN CURRENT ROW AND 11 FOLLOWING) AS sl,
             |    count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
             |      ROWS BETWEEN CURRENT ROW AND 11 FOLLOWING) AS nl
             |  FROM v)
             |SELECT event_type, ts, event_id, (sl - st)::BIGINT AS sum_delta_milli
             |FROM w WHERE nt = 12 AND nl = 12 AND abs(sl - st) > 8000 * 12""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.meanShiftChangepoints(
        t(s, dir, "events"), "event_type", "ts", "event_id", "value",
        k = 12, threshold = 8.0)),

    // ---- classical seasonal decomposition by moving averages
    //      (SeriesStats.seasonalDecompose): hourly sum-of-milli series,
    //      daily season (m=24, 2xm centered MA). Every intermediate is an
    //      exact integer rational; presentation is the shared truncating
    //      division at 1e-4.
    GraftQuery("q193_seasonal_decompose",
      Some("""WITH g AS (SELECT epoch_ms(ts) // 3600000 AS b,
             |    sum(CAST(round("value" * 1000, 0) AS BIGINT)) AS x
             |  FROM events GROUP BY 1),
             |w AS (SELECT b, x,
             |    first_value(x) OVER w1 AS lo, last_value(x) OVER w1 AS hi,
             |    count(*) OVER w1 AS n,
             |    first_value(b) OVER w1 AS b0, last_value(b) OVER w1 AS b1,
             |    sum(2 * x) OVER (ORDER BY b
             |      ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING) AS mid2
             |  FROM g WINDOW w1 AS (ORDER BY b
             |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
             |d AS (SELECT b, x, lo + mid2 + hi AS tn, b % 24 AS phase,
             |    x * 48 - (lo + mid2 + hi) AS dn
             |  FROM w WHERE n = 25 AND b1 - b0 = 24),
             |s AS (SELECT phase, sum(dn) AS sn, count(*) AS np FROM d GROUP BY 1)
             |SELECT make_timestamp(b * 3600000000) AS bucket, x::BIGINT AS sum_milli,
             |  ((tn * 10000) // 48)::BIGINT AS trend_1e4,
             |  ((sn * 10000) // (48 * np))::BIGINT AS seasonal_1e4,
             |  (((x * 48 * np - tn * np - sn) * 10000) // (48 * np))::BIGINT AS residual_1e4
             |FROM d JOIN s USING (phase)""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.seasonalDecompose(
        t(s, dir, "events"), "ts", "value",
        grainUs = 3600000000L, period = 24)),

    // ---- z-order layout round-trip (operators/ZOrder): rewrite events
    //      clustered on (user_id, value), then answer a two-dimensional
    //      range predicate from the re-clustered copy. Result is
    //      layout-invariant (the oracle filters the raw table); the
    //      layout's pruning quality is asserted in OperatorsSpec.
    GraftQuery("q205_zorder_scan",
      Some("""SELECT event_id, user_id, "value" FROM events
             |WHERE user_id BETWEEN 2 AND 5
             |  AND "value" BETWEEN 50.0 AND 150.0""".stripMargin),
      (s, dir) => {
        val out = graft.TempDirs.create("graft-zorder").toString
        graft.operators.ZOrder.write(
          t(s, dir, "events"), Seq("user_id", "value"), out,
          bits = 4, nFiles = 8)
        s.read.parquet(out)
          .filter(col("user_id").between(2, 5) &&
            col("value").between(50.0, 150.0))
          .select("event_id", "user_id", "value")
      }),

    // ---- multiwindow multi-burn-rate SLO alert (SeriesStats
    //      .burnRateAlerts): 3h/24h trailing windows over 1h grains,
    //      threshold*budget = 144/10000, error = value >= 300. RANGE
    //      frames (sparse-bucket-correct) and an integer cross-multiplied
    //      predicate keep the whole output engine-exact.
    GraftQuery("q209_slo_burn_rate",
      Some("""WITH g AS (SELECT event_type,
             |    (epoch_us(ts) // 3600000000) * 3600000000 AS bus,
             |    count(*) AS n,
             |    sum(CASE WHEN "value" >= 300 THEN 1 ELSE 0 END) AS e
             |  FROM events GROUP BY 1, 2),
             |w AS (SELECT event_type, bus,
             |    sum(e) OVER s AS es, sum(n) OVER s AS ns,
             |    sum(e) OVER l AS el, sum(n) OVER l AS nl
             |  FROM g WINDOW
             |    s AS (PARTITION BY event_type ORDER BY bus
             |      RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW),
             |    l AS (PARTITION BY event_type ORDER BY bus
             |      RANGE BETWEEN 82800000000 PRECEDING AND CURRENT ROW))
             |SELECT event_type, make_timestamp(bus) AS bucket,
             |  es::BIGINT AS err_short, ns::BIGINT AS n_short,
             |  el::BIGINT AS err_long, nl::BIGINT AS n_long,
             |  (es * 10000 >= 144 * ns AND el * 10000 >= 144 * nl) AS alert
             |FROM w""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.burnRateAlerts(
        t(s, dir, "events"), "event_type", "ts",
        errCond = col("value") >= 300, grainUs = 3600000000L,
        shortBuckets = 3, longBuckets = 24, thrNum = 144L, thrDen = 10000L)),

    // ---- rolling-origin Holt forecast backtest (SeriesStats
    //      .holtBacktest): one-step-ahead level+trend forecast errors per
    //      hourly bucket. Bucket series = max (order-independent), α=β=0.5
    //      (exact binary halvings); the oracle's recursive CTE carries
    //      (l, b) with kernel-identical operand order, so the µ-scaled
    //      errors are bit-equal.
    GraftQuery("q210_holt_backtest",
      Some("""WITH RECURSIVE g AS (SELECT event_type,
             |    (epoch_us(ts) // 3600000000) * 3600000000 AS bus,
             |    max("value") AS v
             |  FROM events GROUP BY 1, 2),
             |o AS (SELECT event_type, bus, v,
             |    row_number() OVER (PARTITION BY event_type ORDER BY bus) AS rn
             |  FROM g),
             |rec AS (
             |  SELECT s2.event_type, CAST(2 AS BIGINT) AS rn, s2.v AS l,
             |    s2.v - s1.v AS b, CAST(NULL AS DOUBLE) AS err,
             |    CAST(NULL AS BIGINT) AS bus
             |  FROM o s1 JOIN o s2 ON s1.event_type = s2.event_type
             |    AND s1.rn = 1 AND s2.rn = 2
             |  UNION ALL
             |  SELECT r.event_type, r.rn + 1,
             |    0.5 * o.v + 0.5 * (r.l + r.b),
             |    0.5 * ((0.5 * o.v + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b,
             |    o.v - (r.l + r.b),
             |    o.bus
             |  FROM rec r JOIN o ON o.event_type = r.event_type
             |    AND o.rn = r.rn + 1)
             |SELECT event_type, make_timestamp(bus) AS bucket,
             |  CAST(round(err * 1000000.0, 0) AS BIGINT) AS err_1e6
             |FROM rec WHERE err IS NOT NULL""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.holtBacktest(
        t(s, dir, "events"), "event_type", "ts", "value",
        grainUs = 3600000000L)),

    // ---- time-weighted average per hourly bucket (SeriesStats
    //      .timeWeightedAvg): LOCF step interpolation truncated at the
    //      bucket's own first/last samples; same-timestamp buckets degrade
    //      to the plain mean. Milli-value × µs area sums are exact
    //      integers; presentation is the shared truncating division.
    GraftQuery("q214_time_weighted_avg",
      Some("""WITH p AS (SELECT event_type, epoch_us(ts) AS us,
             |    epoch_us(ts) // 3600000000 AS b, event_id AS id,
             |    CAST(round("value" * 1000, 0) AS BIGINT) AS v
             |  FROM events),
             |nx AS (SELECT *, lead(us) OVER (PARTITION BY event_type, b
             |    ORDER BY us, id) AS nus FROM p),
             |g AS (SELECT event_type, b, count(*) AS n,
             |    sum(CASE WHEN nus IS NOT NULL THEN v * (nus - us) ELSE 0 END) AS area,
             |    min(us) AS t0, max(us) AS t1, sum(v) AS sv
             |  FROM nx GROUP BY 1, 2)
             |SELECT event_type, make_timestamp(b * 3600000000) AS bucket,
             |  n::BIGINT AS n,
             |  (CASE WHEN t1 = t0 THEN ((sv * 10) - ((sv * 10) % n)) // n
             |        ELSE ((area * 10) - ((area * 10) % (t1 - t0))) // (t1 - t0)
             |   END)::BIGINT AS twa_1e4
             |FROM g""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.timeWeightedAvg(
        t(s, dir, "events"), "event_type", "ts", "event_id", "value",
        grainUs = 3600000000L)),

    // ---- series-cardinality churn report (SeriesStats
    //      .cardinalityReport): per hour, active / first-seen / cumulative
    //      distinct (event_type, user_id) series — tag-explosion
    //      monitoring. Integer-only.
    GraftQuery("q215_cardinality_report",
      Some("""WITH sb AS (SELECT DISTINCT
             |    event_type || ' ' || CAST(user_id AS VARCHAR) AS s,
             |    epoch_us(ts) // 3600000000 AS b FROM events),
             |a AS (SELECT b, count(*) AS active_series FROM sb GROUP BY 1),
             |f0 AS (SELECT s, min(b) AS b FROM sb GROUP BY 1),
             |f AS (SELECT b, count(*) AS new_series FROM f0 GROUP BY 1)
             |SELECT make_timestamp(a.b * 3600000000) AS bucket,
             |  a.active_series,
             |  coalesce(f.new_series, 0)::BIGINT AS new_series,
             |  (sum(coalesce(f.new_series, 0)) OVER (ORDER BY a.b
             |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_series
             |FROM a LEFT JOIN f ON a.b = f.b""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.cardinalityReport(
        t(s, dir, "events"), Seq("event_type", "user_id"), "ts",
        grainUs = 3600000000L)),

    // ---- seasonal-adjusted anomalies (SeriesStats.seasonalAnomalies):
    //      q193's exact-rational decomposition filtered to buckets whose
    //      |residual| clears 4e9 · 1e-4 milli-units — spikes that survive
    //      removal of trend and the daily pattern. Integer comparisons
    //      over q193's already-exact output.
    GraftQuery("q216_seasonal_anomaly",
      Some("""WITH g AS (SELECT epoch_ms(ts) // 3600000 AS b,
             |    sum(CAST(round("value" * 1000, 0) AS BIGINT)) AS x
             |  FROM events GROUP BY 1),
             |w AS (SELECT b, x,
             |    first_value(x) OVER w1 AS lo, last_value(x) OVER w1 AS hi,
             |    count(*) OVER w1 AS n,
             |    first_value(b) OVER w1 AS b0, last_value(b) OVER w1 AS b1,
             |    sum(2 * x) OVER (ORDER BY b
             |      ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING) AS mid2
             |  FROM g WINDOW w1 AS (ORDER BY b
             |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
             |d AS (SELECT b, x, lo + mid2 + hi AS tn, b % 24 AS phase,
             |    x * 48 - (lo + mid2 + hi) AS dn
             |  FROM w WHERE n = 25 AND b1 - b0 = 24),
             |s AS (SELECT phase, sum(dn) AS sn, count(*) AS np FROM d GROUP BY 1)
             |SELECT make_timestamp(b * 3600000000) AS bucket, x::BIGINT AS sum_milli,
             |  ((tn * 10000) // 48)::BIGINT AS trend_1e4,
             |  ((sn * 10000) // (48 * np))::BIGINT AS seasonal_1e4,
             |  (((x * 48 * np - tn * np - sn) * 10000) // (48 * np))::BIGINT AS residual_1e4
             |FROM d JOIN s USING (phase)
             |WHERE abs((((x * 48 * np - tn * np - sn) * 10000) // (48 * np))::BIGINT)
             |  > 4000000000""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.seasonalAnomalies(
        t(s, dir, "events"), "ts", "value",
        grainUs = 3600000000L, period = 24, thr1e4 = 4000000000L)),

    // ---- counter-aware rollup served at a coarser grain (operators/
    //      CounterRollup): a synthetic per-series cumulative counter with
    //      mod-1e9 resets, hourly reset-adjusted increases (PromQL
    //      `increase` recurrence: Δ if nonnegative, else the post-reset
    //      value), re-aggregated to 6h buckets PLUS a truncating-division
    //      per-second rate — all integers, the Thanos counter-downsampling
    //      shape a sum/min/max rollup cannot express.
    GraftQuery("q225_counter_rollup",
      Some("""WITH v AS (SELECT event_type, ts, event_id,
             |    greatest(CAST(round("value" * 1000, 0) AS BIGINT), 0) AS d
             |  FROM events),
             |c AS (SELECT event_type, ts, event_id,
             |    (sum(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING)) % 1000000000 AS c FROM v),
             |l AS (SELECT event_type, ts, event_id, c,
             |    epoch_us(ts) // 21600000000 AS cb,
             |    lag(c) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS p
             |  FROM c),
             |a AS (SELECT *,
             |    CASE WHEN p IS NULL THEN 0
             |         WHEN c - p >= 0 THEN c - p ELSE c END AS adj,
             |    CASE WHEN p IS NOT NULL AND c - p < 0 THEN 1 ELSE 0 END AS rst,
             |    first_value(c) OVER wb AS fv,
             |    last_value(c) OVER (PARTITION BY event_type, cb
             |      ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
             |  FROM l WINDOW wb AS (PARTITION BY event_type, cb ORDER BY ts, event_id))
             |SELECT event_type, make_timestamp(cb * 21600000000) AS bucket,
             |  count(*) AS n, min(fv)::BIGINT AS first_v, min(lv)::BIGINT AS last_v,
             |  sum(rst)::BIGINT AS resets, sum(adj)::BIGINT AS increase,
             |  ((sum(adj) * 1000000 - ((sum(adj) * 1000000) % 21600)) // 21600)::BIGINT
             |    AS rate_1e6
             |FROM a GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("event_type")
          .orderBy(col("ts"), col("event_id"))
        val counter = t(s, dir, "events").select(
          col("event_type"), col("ts"), col("event_id"),
          pmod(sum(greatest(round(col("value") * 1000).cast("long"), lit(0L)))
            .over(w), lit(1000000000L)).as("c"))
        val fine = graft.operators.CounterRollup.rollup(
          counter, "event_type", "ts", "event_id", "c",
          grainUs = 3600000000L)
        graft.operators.CounterRollup.serveCoarse(
          fine, "event_type", coarseGrainUs = 21600000000L)
      }),

    // ---- top event-type paths (EventAnalytics.topPaths): 3-step n-grams
    //      of each user's event sequence, counted globally, top 20 —
    //      the product-analytics "user flow" query. Integer counts,
    //      (count desc, path) total order.
    GraftQuery("q226_top_paths",
      Some("""WITH p AS (SELECT event_type,
             |    lead(event_type, 1) OVER w AS t1,
             |    lead(event_type, 2) OVER w AS t2
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT event_type || '>' || t1 || '>' || t2 AS path,
             |  count(*) AS n
             |FROM p WHERE t2 IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin),
      (s, dir) => graft.operators.EventAnalytics.topPaths(
        t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
        k = 3, topN = 20)),

    // ---- per-series data-gap report (SeriesStats.seriesGaps): the 5
    //      largest inter-arrival gaps per event_type — the post-incident
    //      "where is my data missing" scan. Integer-µs lag arithmetic,
    //      (gap desc, start asc) total order; WindowGroupLimit runs the
    //      per-series top-k map-side.
    GraftQuery("q228_series_gaps",
      Some("""WITH o AS (SELECT event_type AS series, epoch_us(ts) AS us,
             |    lag(epoch_us(ts)) OVER (PARTITION BY event_type
             |      ORDER BY ts, "value") AS pu
             |  FROM events),
             |g AS (SELECT series, pu AS s, us AS e, us - pu AS gap_us
             |  FROM o WHERE pu IS NOT NULL AND us > pu),
             |r AS (SELECT *, row_number() OVER (PARTITION BY series
             |    ORDER BY gap_us DESC, s) AS rn FROM g)
             |SELECT series, make_timestamp(s) AS gap_start,
             |  make_timestamp(e) AS gap_end, gap_us
             |FROM r WHERE rn <= 5""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.seriesGaps(
        t(s, dir, "events"), "event_type", "ts", "value", topK = 5)),

    // ---- out-of-order-arrival report (SeriesStats.latenessReport): per
    //      series, late-arrival count/fraction and worst lateness vs the
    //      running event-time max in producer order (event_id) — the
    //      telemetry that sizes a streaming watermark. One keyed window,
    //      all integer µs.
    GraftQuery("q265_lateness_report",
      Some("""WITH o AS (SELECT event_type AS series, epoch_us(ts) AS us,
             |    max(epoch_us(ts)) OVER (PARTITION BY event_type
             |      ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
             |  FROM events)
             |SELECT series, count(*) AS n_points,
             |  sum(CASE WHEN mx IS NOT NULL AND us < mx THEN 1 ELSE 0 END)::BIGINT AS n_late,
             |  coalesce(max(CASE WHEN mx IS NOT NULL AND us < mx
             |    THEN mx - us END), 0)::BIGINT AS max_late_us,
             |  ((10000 * sum(CASE WHEN mx IS NOT NULL AND us < mx THEN 1 ELSE 0 END))
             |    // count(*))::BIGINT AS late_bp
             |FROM o GROUP BY series""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.latenessReport(
        t(s, dir, "events"), "event_type", "ts", "event_id")),

    // ---- SAX motif discovery (SeriesStats.saxMotifs, round 6): per-point
    //      4-symbol discretization against each series' own [min,max]
    //      (single-value IEEE arithmetic — bit-identical across engines,
    //      unlike PAA means), 6-symbol sliding words via lead(), motifs =
    //      words recurring in >= 2 distinct series. Series key fans
    //      event_type out by user_id % 8 so shared shapes must cross
    //      users, not just rows.
    GraftQuery("q289_sax_motifs",
      Some("""WITH p AS (SELECT event_type || '#' || (user_id % 8)::VARCHAR AS series,
             |    ts, event_id, "value" AS v FROM events),
             |sp AS (SELECT series, min(v) AS lo, max(v) AS hi FROM p GROUP BY 1),
             |sym AS (SELECT p.series, ts, event_id,
             |    CASE WHEN hi = lo THEN 0
             |      ELSE least(3, floor(((v - lo) * 4) / (hi - lo))::BIGINT) END AS s
             |  FROM p JOIN sp ON sp.series = p.series),
             |wd AS (SELECT series,
             |    s::VARCHAR || (lead(s, 1) OVER w)::VARCHAR
             |      || (lead(s, 2) OVER w)::VARCHAR || (lead(s, 3) OVER w)::VARCHAR
             |      || (lead(s, 4) OVER w)::VARCHAR || (lead(s, 5) OVER w)::VARCHAR
             |      AS word
             |  FROM sym WINDOW w AS (PARTITION BY series ORDER BY ts, event_id))
             |SELECT word, count(DISTINCT series)::BIGINT AS n_series,
             |  count(*)::BIGINT AS n_occurrences
             |FROM wd WHERE word IS NOT NULL
             |GROUP BY 1 HAVING count(DISTINCT series) >= 2""".stripMargin),
      (s, dir) => graft.operators.SeriesStats.saxMotifs(
        t(s, dir, "events"),
        concat(col("event_type"), lit("#"), (col("user_id") % 8).cast("string")),
        "ts", "value", "event_id", alphabet = 4, wordLen = 6)),

    // ---- EXACT per-key quantiles (ExactQuantiles.perKey, round 6): the
    //      compliance-grade p50/p90/p99 a t-digest cannot serve — actual
    //      data values selected by nearest rank over ONE ranged two-phase
    //      global rank (never a per-key window partition). Values are
    //      picked, not aggregated, so doubles stay bit-exact.
    GraftQuery("q293_exact_quantiles",
      Some("""WITH r AS (SELECT event_type, "value" AS v, event_id,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY "value", event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events),
             |qs AS (SELECT unnest([50, 90, 99]) AS q)
             |SELECT r.event_type, qs.q::BIGINT AS q, r.v AS "value"
             |FROM r JOIN qs ON r.rn = (qs.q * r.n + 99) // 100""".stripMargin),
      (s, dir) => graft.operators.ExactQuantiles.perKey(
        t(s, dir, "events"), "event_type", "value", "event_id",
        Seq(50, 90, 99))),

    // ---- co-occurrence lift (EventAnalytics.cooccurrenceLift): market-
    //      basket association over (user, hour) baskets of distinct event
    //      types — support counts + lift as an exact scaled integer.
    //      Basket self-join is quadratic only in per-basket distinct
    //      types (vocabulary-bounded), singles broadcast.
    GraftQuery("q266_cooccurrence_lift",
      Some("""WITH b AS (SELECT DISTINCT user_id AS u,
             |    epoch_us(ts) // 3600000000 AS bk, event_type AS t
             |  FROM events),
             |n AS (SELECT count(*)::BIGINT AS n_baskets
             |  FROM (SELECT DISTINCT u, bk FROM b)),
             |s AS (SELECT t, count(*)::BIGINT AS n1 FROM b GROUP BY t),
             |p AS (SELECT x.t AS type_a, y.t AS type_b, count(*)::BIGINT AS n_ab
             |  FROM b x JOIN b y ON x.u = y.u AND x.bk = y.bk AND x.t < y.t
             |  GROUP BY 1, 2)
             |SELECT p.type_a, p.type_b, p.n_ab,
             |  sa.n1 AS n_a, sb.n1 AS n_b, n.n_baskets,
             |  ((1000000 * n.n_baskets * p.n_ab) // (sa.n1 * sb.n1))::BIGINT
             |    AS lift_micro
             |FROM p JOIN s sa ON sa.t = p.type_a
             |JOIN s sb ON sb.t = p.type_b CROSS JOIN n""".stripMargin),
      (s, dir) => graft.operators.EventAnalytics.cooccurrenceLift(
        t(s, dir, "events"), "user_id", "ts", "event_type",
        bucketUs = 3600000000L)),

    // ---- watermark audit (streaming/WatermarkAudit): replay events as 4
    //      deterministic micro-batches through a watermarked hourly rollup
    //      and report per-batch input vs watermark-dropped rows — how a
    //      watermark choice (q265) is validated against real arrival
    //      order. The fixture arrives perfectly ordered (q265: zero
    //      lateness), so the audit simulates the classic straggler
    //      producer: a deterministic 2% of events (xxhash64-selected)
    //      upload 2 days late — far past the 30-minute watermark, so
    //      they surface as per-batch drop counts. Engine progress
    //      metrics → rows-only at the gate; exact drop semantics spec'd
    //      in StreamingSpec.
    GraftQuery("q270_watermark_audit", None,
      (s, dir) => {
        val staged = graft.TempDirs.create("graft-wm").toString
        graft.streaming.WatermarkAudit.stageArrivalFiles(
          t(s, dir, "events")
            .withColumn("arrival_us", unix_micros(col("ts")) +
              when(pmod(xxhash64(col("event_id")), lit(50L)) === 0,
                lit(172800000000L)).otherwise(lit(0L)))
            .select("arrival_us", "ts", "event_type"),
          "arrival_us", nBatches = 4, staged)
        val schema = s.read.parquet(s"$staged/part000.parquet").schema
        // statePartitions = 4: state cardinality is hours x event types
        // (~1k groups); 32 store instances x 4 batches was 2x the query's
        // own work in commit round-trips (SCALING §8.21)
        graft.streaming.WatermarkAudit.audit(
          s, staged, schema, "ts", "event_type",
          delaySeconds = 1800L, windowSeconds = 3600, statePartitions = 4)
      }),

    // ---- first/last-touch attribution (EventAnalytics.attribution):
    //      journey-reset semantics — each purchase attributes to the
    //      earliest (first_touch) / latest (last_touch) click-or-view
    //      since the user's previous purchase; no touch => 'direct'.
    //      Integer counts; journey ids via one running-count window.
    GraftQuery("q232_attribution",
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
             |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS j
             |  FROM events),
             |tt AS (SELECT user_id, j, event_type,
             |    row_number() OVER (PARTITION BY user_id, j
             |      ORDER BY ts, event_id) AS ra,
             |    row_number() OVER (PARTITION BY user_id, j
             |      ORDER BY ts DESC, event_id DESC) AS rd
             |  FROM e WHERE event_type IN ('click', 'view')),
             |c AS (SELECT user_id, j FROM e WHERE event_type = 'purchase')
             |SELECT 'first_touch' AS model,
             |  coalesce(tt.event_type, 'direct') AS touch_type,
             |  count(*)::BIGINT AS conversions
             |FROM c LEFT JOIN tt ON tt.user_id = c.user_id AND tt.j = c.j
             |  AND tt.ra = 1
             |GROUP BY 1, 2
             |UNION ALL
             |SELECT 'last_touch', coalesce(tt.event_type, 'direct'),
             |  count(*)::BIGINT
             |FROM c LEFT JOIN tt ON tt.user_id = c.user_id AND tt.j = c.j
             |  AND tt.rd = 1
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) => graft.operators.EventAnalytics.attribution(
        t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
        convType = "purchase", touchTypes = Seq("click", "view"))),

    // ---- event-time RANGE window: trailing-6h moving count/sum per
    //      series over RAW (unbucketed) points — the frame is a time
    //      interval, not a row count, so irregular sampling is handled
    //      exactly. Integer-µs range bounds and milli-scaled integer
    //      sums; equal-ts peers are all in-frame on both engines, so no
    //      ordering ambiguity survives.
    GraftQuery("q236_range_window",
      Some("""SELECT event_type AS series, ts,
             |  count(*) OVER w AS n_6h,
             |  (sum(CAST(round("value" * 1000, 0) AS BIGINT)) OVER w)::BIGINT AS sum_milli_6h
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             |  RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-21600000000L, 0L)
        t(s, dir, "events").select(
          col("event_type").as("series"), col("ts"),
          count(lit(1)).over(w).as("n_6h"),
          sum(round(col("value") * 1000, 0).cast("long")).over(w)
            .as("sum_milli_6h"))
      }),

    // ---- semi-structured props: JSON field extraction + rollup — the
    //      annotation/field side-channel every event pipeline carries.
    //      Extraction stays inside codegen (get_json_object); integer
    //      field, deterministic buckets.
    GraftQuery("q246_json_rollup",
      Some("""SELECT event_type,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_band,
             |  count(*)::BIGINT AS n,
             |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k
             |FROM events
             |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        // extract $.k ONCE into a column — filter, group key, and agg all
        // reuse it (three separate get_json_object calls re-parsed the
        // JSON three times per row)
        t(s, dir, "events")
          .withColumn("__k", get_json_object(col("props"), "$.k").cast("long"))
          .filter(col("__k") >= 50)
          .groupBy(col("event_type"), expr("__k div 10").as("k_band"))
          .agg(count(lit(1)).as("n"), sum(col("__k")).as("sum_k"))
      }),

    // ---- JSON schema profile: per-key presence/type/value ranges over
    //      the props column — the schema-inference report a
    //      semi-structured ingest runs before promoting fields to
    //      columns. Key discovery via json_object_keys (no fixed schema
    //      assumed); all-integer output.
    GraftQuery("q247_json_profile",
      Some("""WITH kv AS (SELECT unnest(json_keys(props)) AS key,
             |    props FROM events),
             |t AS (SELECT key,
             |    json_extract_string(props, '$.' || key) AS v FROM kv)
             |SELECT key, count(*)::BIGINT AS n,
             |  sum(CASE WHEN regexp_matches(v, '^-?[0-9]+$')
             |    THEN 1 ELSE 0 END)::BIGINT AS n_int,
             |  min(CASE WHEN regexp_matches(v, '^-?[0-9]+$')
             |    THEN CAST(v AS BIGINT) END) AS min_int,
             |  max(CASE WHEN regexp_matches(v, '^-?[0-9]+$')
             |    THEN CAST(v AS BIGINT) END) AS max_int
             |FROM t GROUP BY 1""".stripMargin),
      (s, dir) => {
        val df = t(s, dir, "events")
          .select(explode(json_object_keys(col("props"))).as("key"),
            col("props"))
          .select(col("key"),
            expr("get_json_object(props, concat('$.', key))").as("v"))
        val isInt = col("v").rlike("^-?[0-9]+$")
        df.groupBy("key").agg(
          count(lit(1)).as("n"),
          sum(when(isInt, 1L).otherwise(0L)).as("n_int"),
          min(when(isInt, col("v").cast("long"))).as("min_int"),
          max(when(isInt, col("v").cast("long"))).as("max_int"))
      }),

    // ---- RFM segmentation (EventAnalytics.rfmSegments): purchase
    //      recency/frequency/monetary quartiles via the rank formula
    //      (rank*4 div n)+1 over total orders — assigned with the
    //      distributed two-phase rank, not a single-partition ntile.
    GraftQuery("q248_rfm_segments",
      Some("""WITH p AS (SELECT user_id, epoch_us(ts) AS us,
             |    CAST(round("value" * 1000, 0) AS BIGINT) AS vm
             |  FROM events WHERE event_type = 'purchase'),
             |u AS (SELECT user_id,
             |    ((SELECT max(us) FROM p) - max(us)) // 86400000000 AS r_days,
             |    count(*) AS f, sum(vm) AS m
             |  FROM p GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM u),
             |k AS (SELECT u.*,
             |    ((row_number() OVER (ORDER BY r_days DESC, user_id) - 1) * 4)
             |      // (SELECT n FROM n) + 1 AS r_q,
             |    ((row_number() OVER (ORDER BY f, user_id) - 1) * 4)
             |      // (SELECT n FROM n) + 1 AS f_q,
             |    ((row_number() OVER (ORDER BY m, user_id) - 1) * 4)
             |      // (SELECT n FROM n) + 1 AS m_q
             |  FROM u)
             |SELECT (r_q * 100 + f_q * 10 + m_q)::BIGINT AS segment,
             |  count(*)::BIGINT AS n_keys, sum(m)::BIGINT AS m_milli
             |FROM k GROUP BY 1""".stripMargin),
      (s, dir) => graft.operators.EventAnalytics.rfmSegments(
        t(s, dir, "events"), "user_id", "ts", "event_type", "value",
        convType = "purchase")),

    // ---- theta-sketch distinct-set algebra (operators/ThetaOps +
    //      functions/ThetaSketch): per-type distinct users plus
    //      click∩/∪/∖purchase overlap — the set operations HLL cannot
    //      do. The fixture's user universe (≤1500 at sf0.1) sits far
    //      below k=4096, so the sketches are in EXACT mode and the
    //      distinct-count oracle hash-checks; the estimate-mode error
    //      envelope is OperatorsSpec-bound.
    GraftQuery("q249_theta_set_ops",
      Some("""SELECT event_type AS a, 'distinct' AS op,
             |  count(DISTINCT user_id)::BIGINT AS est
             |FROM events GROUP BY 1
             |UNION ALL
             |SELECT 'click', 'intersect_purchase',
             |  (SELECT count(DISTINCT user_id) FROM events
             |   WHERE event_type = 'click' AND user_id IN
             |     (SELECT user_id FROM events WHERE event_type = 'purchase'))::BIGINT
             |UNION ALL
             |SELECT 'click', 'union_purchase',
             |  (SELECT count(DISTINCT user_id) FROM events
             |   WHERE event_type IN ('click', 'purchase'))::BIGINT
             |UNION ALL
             |SELECT 'click', 'diff_purchase',
             |  (SELECT count(DISTINCT user_id) FROM events
             |   WHERE event_type = 'click' AND user_id NOT IN
             |     (SELECT user_id FROM events WHERE event_type = 'purchase'))::BIGINT""".stripMargin),
      (s, dir) => graft.operators.ThetaOps.setReport(
        t(s, dir, "events"), "event_type", "user_id",
        pairs = Seq(("click", "purchase")), lgK = 12)),

    // ---- theta rollup + cross-window retention overlap (ThetaOps
    //      .buildRollup/rangeOverlap): daily per-type sketches; users
    //      active in Jan 1-10 vs Jan 20-30 answered by MERGING bucket
    //      sketches and intersecting — raw data is never rescanned.
    //      Exact mode below k ⇒ the distinct-overlap oracle hash-checks.
    GraftQuery("q250_theta_retention_overlap",
      Some("""WITH a AS (SELECT event_type AS g, user_id FROM events
             |  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
             |    AND ts < TIMESTAMP '2024-01-10 00:00:00'),
             |b AS (SELECT event_type AS g, user_id FROM events
             |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
             |    AND ts < TIMESTAMP '2024-01-30 00:00:00')
             |SELECT g,
             |  (SELECT count(DISTINCT user_id) FROM a WHERE a.g = x.g) AS n_a,
             |  (SELECT count(DISTINCT user_id) FROM b WHERE b.g = x.g) AS n_b,
             |  (SELECT count(DISTINCT a.user_id) FROM a
             |    WHERE a.g = x.g AND a.user_id IN
             |      (SELECT user_id FROM b WHERE b.g = x.g)) AS n_both,
             |  (SELECT count(DISTINCT a.user_id) FROM a
             |    WHERE a.g = x.g AND a.user_id NOT IN
             |      (SELECT user_id FROM b WHERE b.g = x.g)) AS n_a_only,
             |  (SELECT count(DISTINCT user_id) FROM (
             |    SELECT user_id FROM a WHERE a.g = x.g
             |    UNION SELECT user_id FROM b WHERE b.g = x.g)) AS n_union
             |FROM (SELECT DISTINCT g FROM a INTERSECT SELECT DISTINCT g FROM b) x""".stripMargin),
      (s, dir) => {
        val rollup = graft.operators.ThetaOps.buildRollup(
          t(s, dir, "events"), "event_type", "ts", "user_id",
          bucketSeconds = 86400L, lgK = 12)
        graft.operators.ThetaOps.rangeOverlap(rollup,
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
          java.sql.Timestamp.valueOf("2024-01-20 00:00:00"),
          java.sql.Timestamp.valueOf("2024-01-30 00:00:00"), lgK = 12)
      })
  )
}
