package graft.queries

import graft.{GraftQuery, Tables}
import graft.promql.{EvalParams, PromQL}
import org.apache.spark.sql.SparkSession

/** PromQL battery over the events table (metric `events` := value column,
  * label = event_type). Grid: 1-hour steps across 2024-01-10, the window
  * every scale factor covers.
  *
  * The rate/delta oracles re-derive the Prometheus extrapolation algorithm
  * in ANSI SQL (window lag for counter resets, ordered first/last, the
  * 1.1×avg-spacing extrapolation caps) so the hash check covers the math,
  * not just row counts.
  */
object Prom {

  private def table(s: SparkSession, dir: String): String => PromQL.SeriesTable = {
    case "events" => PromQL.SeriesTable(
      Tables.t(s, dir, "events"), "ts", "value", Seq("event_type"))
    case "events_bucket" =>
      // a Prometheus-style histogram derived from events: per hour-end and
      // event_type, CUMULATIVE counts of values under each le bucket (one
      // sample per bucket series at the hour boundary). Single hash-agg
      // shuffle on (hour, event_type); stack() is a map-side pivot.
      import org.apache.spark.sql.functions._
      val hourly = Tables.t(s, dir, "events")
        .select(expr(
          "timestamp_millis(CAST(ceil(unix_millis(ts) / 3600000.0) AS BIGINT) * 3600000)")
          .as("ts"), col("event_type"), col("value"))
        .groupBy("ts", "event_type")
        .agg(
          sum(when(col("value") <= 10, 1).otherwise(0)).cast("double").as("c10"),
          sum(when(col("value") <= 50, 1).otherwise(0)).cast("double").as("c50"),
          sum(when(col("value") <= 100, 1).otherwise(0)).cast("double").as("c100"),
          sum(when(col("value") <= 200, 1).otherwise(0)).cast("double").as("c200"),
          count(lit(1)).cast("double").as("cinf"))
        .selectExpr("ts", "event_type",
          "stack(5, '10', c10, '50', c50, '100', c100, '200', c200, '+Inf', cinf) AS (le, value)")
      PromQL.SeriesTable(hourly, "ts", "value", Seq("event_type", "le"))
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  private val p = EvalParams(
    startMs = 1704848400000L, // 2024-01-10 01:00:00 UTC
    endMs = 1704931200000L,   // 2024-01-11 00:00:00 UTC
    stepMs = 3600000L)

  private def q(name: String, promql: String, oracle: Option[String]): GraftQuery =
    GraftQuery(name, oracle, (s, dir) =>
      PromQL.eval(s, table(s, dir), promql, p)
        .withColumn("value", org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value"), 4)))

  /** Shared oracle scaffolding: hourly grid + per-step 1h sample windows. */
  private val gridSql =
    """grid AS (
      |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
      |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
      |win AS (
      |  SELECT g.gts, e.event_type, epoch_ms(e.ts) AS tms, e."value" AS v
      |  FROM grid g JOIN events e
      |    ON e.ts > g.gts - INTERVAL 1 HOUR AND e.ts <= g.gts)""".stripMargin

  /** Extrapolated rate/increase/delta in SQL. counter ⇒ reset correction +
    * extrapolate-to-zero cap; perSecond ⇒ divide by the 3600 s range. */
  private def extrapolatedSql(counter: Boolean, perSecond: Boolean): String = {
    val resets =
      if (counter) "sum(CASE WHEN pv IS NOT NULL AND v < pv THEN pv ELSE 0 END)"
      else "0"
    val dstart2 =
      if (counter)
        """CASE WHEN result0 > 0 AND v_first >= 0
          |      AND sampled * (v_first / result0) < d_start
          |     THEN sampled * (v_first / result0) ELSE d_start END""".stripMargin
      else "d_start"
    val divisor = if (perSecond) " / 3600.0" else ""
    s"""WITH $gridSql,
       |ordered AS (
       |  SELECT gts, event_type, tms, v,
       |    lag(v) OVER (PARTITION BY gts, event_type ORDER BY tms, v) AS pv
       |  FROM win),
       |agg AS (
       |  SELECT gts, event_type, count(*) AS n,
       |    min(tms) AS t_first, max(tms) AS t_last,
       |    first(v ORDER BY tms, v) AS v_first,
       |    last(v ORDER BY tms, v) AS v_last,
       |    $resets AS resets
       |  FROM ordered GROUP BY gts, event_type),
       |calc AS (
       |  SELECT gts, event_type, n,
       |    v_last - v_first + resets AS result0,
       |    (t_first - (epoch_ms(gts) - 3600000)) / 1000.0 AS d_start,
       |    (epoch_ms(gts) - t_last) / 1000.0 AS d_end,
       |    (t_last - t_first) / 1000.0 AS sampled,
       |    v_first
       |  FROM agg WHERE n >= 2),
       |calc2 AS (
       |  SELECT gts, event_type, result0, sampled,
       |    sampled / (n - 1) AS avg_dur,
       |    $dstart2 AS d_start2, d_end
       |  FROM calc WHERE sampled > 0),
       |calc3 AS (
       |  SELECT gts, event_type, result0, sampled,
       |    sampled
       |    + CASE WHEN d_start2 < avg_dur * 1.1 THEN d_start2 ELSE avg_dur / 2 END
       |    + CASE WHEN d_end < avg_dur * 1.1 THEN d_end ELSE avg_dur / 2 END
       |      AS extrap
       |  FROM calc2)
       |SELECT event_type, gts AS ts,
       |  result0 * (extrap / sampled)$divisor AS raw
       |FROM calc3""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(

    // ---- instant vector selection: newest sample per series within the
    //      5-minute lookback at each grid step (convert.rs default)
    q("q40_promql_instant", "events",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s)
             |SELECT event_type, gts AS ts, round(v, 4) AS "value"
             |FROM latest WHERE v IS NOT NULL""".stripMargin)),

    // ---- rate: counter extrapolation (prom_align.rs:711-906 semantics)
    q("q41_promql_rate", "rate(events[1h])",
      Some(s"""SELECT event_type, ts, round(raw, 4) AS "value"
              |FROM (${extrapolatedSql(counter = true, perSecond = true)})""".stripMargin)),

    // ---- delta: gauge extrapolation (no reset correction, no zero cap)
    q("q42_promql_delta", "delta(events[1h])",
      Some(s"""SELECT event_type, ts, round(raw, 4) AS "value"
              |FROM (${extrapolatedSql(counter = false, perSecond = false)})""".stripMargin)),

    // ---- increase + aggregation across series (convert.rs:274-347 shape);
    //      sums the per-series extrapolations per step
    q("q43_promql_sum_increase", "sum(increase(events[1h]))",
      Some(s"""SELECT ts, round(sum(raw), 4) AS "value"
              |FROM (${extrapolatedSql(counter = true, perSecond = false)})
              |GROUP BY ts""".stripMargin)),

    // ---- irate via last two samples + regex matcher (fully-anchored, as
    //      PromQL matchers are). The oracle replays lastTwo exactly:
    //      counter reset (last < prev → diff = last), Δt on integral ms
    //      before one division; presented as integer µ-rate (q145/q73
    //      convention) so no rounding boundary or -0.0 can split engines.
    GraftQuery("q44_promql_irate_regex",
      Some(s"""WITH $gridSql,
              |rk AS (
              |  SELECT gts, event_type, tms, v,
              |    row_number() OVER (PARTITION BY event_type, gts
              |      ORDER BY tms DESC, v DESC) AS rn
              |  FROM win
              |  WHERE regexp_matches(event_type, '^(?:err.*|sign.*)$$')),
              |pair AS (
              |  SELECT a.event_type, a.gts, a.tms AS t1, a.v AS v1,
              |    b.tms AS t0, b.v AS v0
              |  FROM rk a JOIN rk b
              |    ON a.event_type = b.event_type AND a.gts = b.gts
              |    AND a.rn = 1 AND b.rn = 2
              |  WHERE a.tms > b.tms)
              |SELECT event_type, gts AS ts,
              |  CAST(round(CASE WHEN v1 < v0 THEN v1 ELSE v1 - v0 END
              |    / ((t1 - t0) / 1000.0) * 1000000.0, 0) AS BIGINT) AS "value"
              |FROM pair""".stripMargin),
      (s, dir) => PromQL.eval(s, table(s, dir),
          """irate(events{event_type=~"err.*|sign.*"}[1h])""", p)
        .withColumn("value", org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 1000000.0, 0)
          .cast("long"))),

    // ---- subquery: inner instant eval on an absolute 15m grid (5m
    //      lookback), outer max over each trailing 1h window
    q("q91_promql_subquery", "max_over_time(events[1h:15m])",
      Some("""WITH grid15 AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 00:15:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 15 MINUTE)) AS g),
             |series AS (SELECT DISTINCT event_type FROM events),
             |inner_pts AS (
             |  SELECT g.g, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.g AND e.ts > g.g - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid15 g CROSS JOIN series s),
             |grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts)
             |SELECT i.event_type, g.gts AS ts, round(max(i.v), 4) AS "value"
             |FROM grid g JOIN inner_pts i
             |  ON i.g > g.gts - INTERVAL 1 HOUR AND i.g <= g.gts
             |WHERE i.v IS NOT NULL
             |GROUP BY i.event_type, g.gts""".stripMargin)),

    // ---- *_over_time range aggregations: plain window aggregates, no
    //      extrapolation (Prometheus promql/functions.go semantics)
    q("q85_promql_avg_over_time", "avg_over_time(events[1h])",
      Some(s"""WITH $gridSql
              |SELECT event_type, gts AS ts, round(avg(v), 4) AS "value"
              |FROM win GROUP BY event_type, gts""".stripMargin)),

    // quantile_over_time's linear interpolation between order statistics
    // is exactly a continuous quantile — DuckDB quantile_cont is the oracle
    q("q86_promql_quantile_over_time", "quantile_over_time(0.9, events[1h])",
      Some(s"""WITH $gridSql
              |SELECT event_type, gts AS ts,
              |  round(quantile_cont(v, 0.9), 4) AS "value"
              |FROM win GROUP BY event_type, gts""".stripMargin)),

    // ---- topk: k extreme series per grid step (beyond-reference PromQL
    //      surface; ties broken by label for determinism)
    q("q69_promql_topk", "topk(2, events)",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s),
             |ranked AS (
             |  SELECT event_type, gts, v,
             |    row_number() OVER (PARTITION BY gts
             |      ORDER BY v DESC, event_type) AS rk
             |  FROM latest WHERE v IS NOT NULL)
             |SELECT event_type, gts AS ts, round(v, 4) AS "value"
             |FROM ranked WHERE rk <= 2""".stripMargin)),

    // ---- quantile across series per step (linear interpolation — Spark
    //      exact percentile == DuckDB quantile_cont, the q21 pairing)
    q("q70_promql_quantile", "quantile(0.5, events)",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s)
             |SELECT gts AS ts, round(quantile_cont(v, 0.5), 4) AS "value"
             |FROM latest WHERE v IS NOT NULL GROUP BY gts""".stripMargin)),

    // ---- binary operations: vector-vector join on the shared label set
    //      (here: collapsed to ts) and a scalar divide
    q("q71_promql_binop",
      "(sum(rate(events[1h])) - avg(rate(events[1h]))) * 10",
      Some(s"""WITH rates AS (
              |  SELECT event_type, ts, raw FROM
              |    (${extrapolatedSql(counter = true, perSecond = true)})),
              |s AS (SELECT ts, sum(raw) AS sv FROM rates GROUP BY ts),
              |a AS (SELECT ts, avg(raw) AS av FROM rates GROUP BY ts)
              |SELECT s.ts, round((sv - av) * 10, 4) AS "value"
              |FROM s JOIN a ON s.ts = a.ts""".stripMargin)),

    // ---- @ modifier: pin evaluation to one instant, replicate across the
    //      grid (every step reports the state as of 2024-01-10 12:00:00)
    q("q74_promql_at_modifier", "events @ 1704888000",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |pinned AS (
             |  SELECT s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= TIMESTAMP '2024-01-10 12:00:00'
             |        AND e.ts > TIMESTAMP '2024-01-10 12:00:00' - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM series s)
             |SELECT p.event_type, g.gts AS ts, round(p.v, 4) AS "value"
             |FROM pinned p CROSS JOIN grid g WHERE p.v IS NOT NULL""".stripMargin)),

    // ---- element-wise math over a rate vector (clamp_max ∘ abs)
    q("q75_promql_math", "clamp_max(abs(rate(events[1h])), 0.02)",
      Some(s"""SELECT event_type, ts,
              |  round(least(abs(raw), 0.02), 4) AS "value"
              |FROM (${extrapolatedSql(counter = true, perSecond = true)})""".stripMargin)),

    // ---- label_replace: regex class label + aggregate over it
    q("q78_promql_label_replace",
      """sum by (cls) (label_replace(events, "cls", "ui", "event_type", "click|view"))""",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s)
             |SELECT CASE WHEN event_type IN ('click','view') THEN 'ui' ELSE '' END AS cls,
             |  gts AS ts, round(sum(v), 4) AS "value"
             |FROM latest WHERE v IS NOT NULL GROUP BY 1, 2""".stripMargin)),

    // ---- histogram_quantile over hour-end cumulative buckets
    //      (bucketQuantile interpolation re-derived in the oracle)
    q("q79_promql_histogram_quantile", "histogram_quantile(0.9, events_bucket)",
      Some("""WITH counts AS (
             |  SELECT make_timestamp(CAST(ceil(epoch_ms(ts) / 3600000.0) AS BIGINT)
             |           * 3600000 * 1000) AS hts,
             |    event_type,
             |    CAST(count(*) FILTER (WHERE "value" <= 10)  AS DOUBLE) AS n10,
             |    CAST(count(*) FILTER (WHERE "value" <= 50)  AS DOUBLE) AS n50,
             |    CAST(count(*) FILTER (WHERE "value" <= 100) AS DOUBLE) AS n100,
             |    CAST(count(*) FILTER (WHERE "value" <= 200) AS DOUBLE) AS n200,
             |    CAST(count(*) AS DOUBLE) AS total
             |  FROM events GROUP BY 1, 2),
             |ranked AS (SELECT *, 0.9 * total AS rank FROM counts WHERE total > 0)
             |SELECT event_type, hts AS ts,
             |  round(CASE
             |    WHEN n200 < rank THEN 200.0
             |    WHEN n10 >= rank THEN 10.0 * rank / n10
             |    WHEN n50 >= rank THEN 10.0 + 40.0 * (rank - n10) / (n50 - n10)
             |    WHEN n100 >= rank THEN 50.0 + 50.0 * (rank - n50) / (n100 - n50)
             |    ELSE 100.0 + 100.0 * (rank - n100) / (n200 - n100) END, 4) AS "value"
             |FROM ranked
             |WHERE hts >= TIMESTAMP '2024-01-10 01:00:00'
             |  AND hts <= TIMESTAMP '2024-01-11 00:00:00'""".stripMargin)),

    // ---- deriv: least-squares slope per series over each 1h window —
    //      DuckDB regr_slope is the same covariance/variance formula.
    //      Presented as an INTEGER micro-slope (the q145 convention):
    //      decimal rounding of a raw quotient can differ between engines at
    //      x.xxxx5 boundaries, and DuckDB round() keeps the sign of tiny
    //      negatives (-0.0) where Spark's BigDecimal HALF_UP does not —
    //      both classes vanish under round-to-integer + BIGINT cast.
    GraftQuery("q101_promql_deriv",
      Some(s"""WITH $gridSql
              |SELECT event_type, gts AS ts,
              |  CAST(round(regr_slope(v, tms / 1000.0) * 1000000.0, 0) AS BIGINT) AS "value"
              |FROM win GROUP BY event_type, gts
              |HAVING count(*) >= 2 AND var_pop(tms / 1000.0) > 0""".stripMargin),
      (s, dir) => PromQL.eval(s, table(s, dir), "deriv(events[1h])", p)
        .withColumn("value", org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 1000000.0, 0)
          .cast("long"))),

    // ---- count_values: per-step histogram of instant sample values
    q("q102_promql_count_values", """count_values("v", events)""",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s)
             |SELECT gts AS ts, v::VARCHAR AS v, count(*)::DOUBLE AS "value"
             |FROM latest WHERE v IS NOT NULL GROUP BY gts, v""".stripMargin)),

    // ---- predict_linear: regression-line value 30min past each step —
    //      the line passes through the sample centroid, so the oracle is
    //      avg(v) + regr_slope · (t+1800 − avg(t))
    q("q103_promql_predict_linear", "predict_linear(events[1h], 1800)",
      Some(s"""WITH $gridSql
              |SELECT event_type, gts AS ts,
              |  round(avg(v) + regr_slope(v, tms / 1000.0)
              |    * (epoch_ms(gts) / 1000.0 + 1800 - avg(tms / 1000.0)), 4) AS "value"
              |FROM win GROUP BY event_type, gts
              |HAVING count(*) >= 2 AND var_pop(tms / 1000.0) > 0""".stripMargin)),

    // ---- holt_winters: level/trend double exponential smoothing — the
    //      oracle replays the recurrence with a recursive CTE (sf=.5, tf=.3)
    q("q104_promql_holt_winters", "holt_winters(events[1h], 0.5, 0.3)",
      Some(s"""WITH RECURSIVE $gridSql,
              |ord AS (
              |  SELECT gts, event_type, v,
              |    row_number() OVER (PARTITION BY gts, event_type
              |      ORDER BY tms, v) AS rn,
              |    count(*) OVER (PARTITION BY gts, event_type) AS n
              |  FROM win),
              |hw AS (
              |  SELECT o2.gts, o2.event_type, 2 AS rn, o2.n,
              |    o1.v AS s0,
              |    0.5 * o2.v + 0.5 * (o1.v + (o2.v - o1.v)) AS s1,
              |    o2.v - o1.v AS b
              |  FROM ord o1 JOIN ord o2 USING (gts, event_type)
              |  WHERE o1.rn = 1 AND o2.rn = 2
              |  UNION ALL
              |  SELECT o.gts, o.event_type, o.rn, o.n,
              |    h.s1 AS s0,
              |    0.5 * o.v
              |      + 0.5 * (h.s1 + (0.3 * (h.s1 - h.s0) + 0.7 * h.b)) AS s1,
              |    0.3 * (h.s1 - h.s0) + 0.7 * h.b AS b
              |  FROM hw h JOIN ord o
              |    ON o.gts = h.gts AND o.event_type = h.event_type
              |   AND o.rn = h.rn + 1)
              |SELECT event_type, gts AS ts, round(s1, 4) AS "value"
              |FROM hw WHERE rn = n""".stripMargin)),

    // ---- absent_over_time: range-window absence (alerting primitive)
    q("q105_promql_absent_over_time",
      """absent_over_time(events{event_type="no_such_type"}[1h])""",
      Some("""SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS ts,
             |  1.0::DOUBLE AS "value"""".stripMargin)),

    // ---- scalar(): per-step share of the across-series total
    q("q106_promql_scalar_share", "events * 100 / scalar(sum(events))",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s),
             |tot AS (SELECT gts, sum(v) AS sv FROM latest WHERE v IS NOT NULL
             |        GROUP BY gts)
             |SELECT l.event_type, l.gts AS ts,
             |  round(l.v * 100 / t.sv, 4) AS "value"
             |FROM latest l JOIN tot t ON l.gts = t.gts
             |WHERE l.v IS NOT NULL""".stripMargin)),

    // ---- vector∘vector comparison: instant value above its own series'
    //      trailing-4h mean (matched one-to-one on event_type per step)
    q("q107_promql_vv_compare", "events > avg_over_time(events[4h])",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s),
             |winavg AS (
             |  SELECT g.gts, e.event_type, avg(e."value") AS av
             |  FROM grid g JOIN events e
             |    ON e.ts > g.gts - INTERVAL 4 HOUR AND e.ts <= g.gts
             |  GROUP BY g.gts, e.event_type)
             |SELECT l.event_type, l.gts AS ts, round(l.v, 4) AS "value"
             |FROM latest l JOIN winavg w
             |  ON l.gts = w.gts AND l.event_type = w.event_type
             |WHERE l.v IS NOT NULL AND l.v > w.av""".stripMargin)),

    // ---- timestamp(): each element's value becomes its grid instant (s)
    q("q108_promql_timestamp", "timestamp(events)",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s)
             |SELECT event_type, gts AS ts,
             |  round(epoch_ms(gts) / 1000.0, 4) AS "value"
             |FROM latest WHERE v IS NOT NULL""".stripMargin)),

    // ---- calendar family: day_of_week + hour folded into one value
    //      (dow*100 + hour) over timestamp(events) — value-as-unix-seconds
    //      semantics (functions.go dateWrapper)
    q("q126_promql_calendar",
      "day_of_week(timestamp(events)) * 100 + hour(timestamp(events))",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s)
             |SELECT event_type, gts AS ts,
             |  round(dayofweek(gts) * 100.0 + hour(gts), 4)::DOUBLE AS "value"
             |FROM latest WHERE v IS NOT NULL""".stripMargin)),

    // ---- resets + changes (counter analysis): folded into one value
    //      (changes*100 + resets); oracle replays the neighbor-pair scans
    //      with a lag window over each step's sample window
    q("q127_promql_resets_changes",
      "resets(events[1h]) + changes(events[1h]) * 100",
      Some(s"""WITH $gridSql,
              |ordered AS (
              |  SELECT gts, event_type, v,
              |    lag(v) OVER (PARTITION BY gts, event_type ORDER BY tms, v) AS pv
              |  FROM win)
              |SELECT event_type, gts AS ts,
              |  round(sum(CASE WHEN pv IS NOT NULL AND v < pv THEN 1 ELSE 0 END)
              |    + 100.0 * sum(CASE WHEN pv IS NOT NULL AND v <> pv THEN 1 ELSE 0 END), 4)
              |    ::DOUBLE AS "value"
              |FROM ordered GROUP BY event_type, gts""".stripMargin)),

    // ---- stddev aggregator (population, aggregations.go) over a trig
    //      transform: cross-series spread of sin(value) per step
    q("q128_promql_stddev_trig", "stddev(sin(events))",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s)
             |SELECT gts AS ts, round(stddev_pop(sin(v)), 4) AS "value"
             |FROM latest WHERE v IS NOT NULL GROUP BY gts""".stripMargin)),

    // ---- absent(): a never-matching selector is absent at every step
    q("q100_promql_absent", """absent(events{event_type="no_such_type"})""",
      Some("""SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS ts,
             |  1.0::DOUBLE AS "value"""".stripMargin)),

    // ---- comparison filter (alerting shape): instant values over 150
    q("q99_promql_threshold", "events > 150",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s)
             |SELECT event_type, gts AS ts, round(v, 4) AS "value"
             |FROM latest WHERE v > 150""".stripMargin)),

    // ---- vector matching: many-to-one group_left — each (event_type, le)
    //      bucket series divides by its event_type's across-le sum
    q("q98_promql_binop_group_left",
      "events_bucket / on(event_type) group_left sum by (event_type) (events_bucket)",
      Some("""WITH counts AS (
             |  SELECT make_timestamp(CAST(ceil(epoch_ms(ts) / 3600000.0) AS BIGINT)
             |           * 3600000 * 1000) AS hts,
             |    event_type,
             |    CAST(count(*) FILTER (WHERE "value" <= 10)  AS DOUBLE) AS n10,
             |    CAST(count(*) FILTER (WHERE "value" <= 50)  AS DOUBLE) AS n50,
             |    CAST(count(*) FILTER (WHERE "value" <= 100) AS DOUBLE) AS n100,
             |    CAST(count(*) FILTER (WHERE "value" <= 200) AS DOUBLE) AS n200,
             |    CAST(count(*) AS DOUBLE) AS total
             |  FROM events GROUP BY 1, 2),
             |b AS (
             |  SELECT hts, event_type, '10' AS le, n10 AS v FROM counts
             |  UNION ALL SELECT hts, event_type, '50', n50 FROM counts
             |  UNION ALL SELECT hts, event_type, '100', n100 FROM counts
             |  UNION ALL SELECT hts, event_type, '200', n200 FROM counts
             |  UNION ALL SELECT hts, event_type, '+Inf', total FROM counts),
             |s AS (SELECT hts, event_type, sum(v) AS sv FROM b GROUP BY 1, 2)
             |SELECT b.event_type, b.le, b.hts AS ts, round(b.v / s.sv, 4) AS "value"
             |FROM b JOIN s USING (hts, event_type)
             |WHERE b.hts >= TIMESTAMP '2024-01-10 01:00:00'
             |  AND b.hts <= TIMESTAMP '2024-01-11 00:00:00'""".stripMargin)),

    // ---- vector set op: instant vectors minus the per-step top-2
    q("q77_promql_unless", "events unless topk(2, events)",
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 01:00:00',
             |    TIMESTAMP '2024-01-11 00:00:00', INTERVAL 1 HOUR)) AS gts),
             |series AS (SELECT DISTINCT event_type FROM events),
             |latest AS (
             |  SELECT g.gts, s.event_type,
             |    (SELECT e."value" FROM events e
             |      WHERE e.event_type = s.event_type
             |        AND e.ts <= g.gts AND e.ts > g.gts - INTERVAL 5 MINUTE
             |      ORDER BY e.ts DESC, e."value" DESC LIMIT 1) AS v
             |  FROM grid g CROSS JOIN series s),
             |ranked AS (
             |  SELECT event_type, gts, v,
             |    row_number() OVER (PARTITION BY gts
             |      ORDER BY v DESC, event_type) AS rk
             |  FROM latest WHERE v IS NOT NULL)
             |SELECT event_type, gts AS ts, round(v, 4) AS "value"
             |FROM ranked WHERE rk > 2""".stripMargin)),

    // ---- Prometheus remote read (promql/remote.rs:44,60-120): __name__
    //      selects the table, matchers filter, raw samples ship unaligned —
    //      pure SQL selection, so the oracle is direct
    GraftQuery("q67_promql_remote_read",
      Some("""SELECT event_type, ts, "value" FROM events
             |WHERE ts >= make_timestamp(1704844800000 * 1000)
             |  AND ts <= make_timestamp(1704931200000 * 1000)
             |  AND regexp_matches(event_type, '^(?:error|signup)$')""".stripMargin),
      (s, dir) => graft.promql.PromQL.remoteRead(
        table(s, dir),
        Seq(graft.promql.EqMatcher("__name__", "events"),
            graft.promql.ReMatcher("event_type", "error|signup")),
        startMs = 1704844800000L, endMs = 1704931200000L)),

    // ---- recording rule (promql/Recording.scala — the PromQL analogue of
    //      InfluxQL continuous queries): the stored rate(events[1h]) rule
    //      is evaluated and materialized into an overwrite-mode engine
    //      table; the READ-BACK of that table must match q41's direct-eval
    //      oracle — materialization round-trips the series losslessly.
    GraftQuery("q189_recording_rule",
      Some(s"""SELECT event_type, ts, round(raw, 4) AS "value"
              |FROM (${extrapolatedSql(counter = true, perSecond = true)})""".stripMargin),
      (s, dir) => {
        val e = new graft.engine.TsdbEngine(s,
          graft.TempDirs.create("graft-rules").toString)
        graft.promql.Recording.create(e, "events_rate_1h", "rate(events[1h])")
        graft.promql.Recording.runRules(e, table(s, dir), p)
        e.read("events_rate_1h")
          .select(org.apache.spark.sql.functions.col("event_type"),
            org.apache.spark.sql.functions.col("ts"),
            org.apache.spark.sql.functions.round(
              org.apache.spark.sql.functions.col("value"), 4).as("value"))
      }),

    // ---- `without` grouping (Prometheus aggregation grammar): drop the
    //      listed labels, keep all others. Over the histogram metric
    //      (labels event_type+le), `sum without (le)` collapses the bucket
    //      dimension per event_type — the standard histogram-series sum.
    //      One hash-agg shuffle; label set shrinks before the shuffle.
    q("q190_promql_without", "sum without (le) (events_bucket)",
      Some("""WITH counts AS (
             |  SELECT make_timestamp(CAST(ceil(epoch_ms(ts) / 3600000.0) AS BIGINT)
             |           * 3600000 * 1000) AS hts,
             |    event_type,
             |    CAST(count(*) FILTER (WHERE "value" <= 10)  AS DOUBLE) AS n10,
             |    CAST(count(*) FILTER (WHERE "value" <= 50)  AS DOUBLE) AS n50,
             |    CAST(count(*) FILTER (WHERE "value" <= 100) AS DOUBLE) AS n100,
             |    CAST(count(*) FILTER (WHERE "value" <= 200) AS DOUBLE) AS n200,
             |    CAST(count(*) AS DOUBLE) AS total
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, hts AS ts,
             |  round(n10 + n50 + n100 + n200 + total, 4) AS "value"
             |FROM counts
             |WHERE hts >= TIMESTAMP '2024-01-10 01:00:00'
             |  AND hts <= TIMESTAMP '2024-01-11 00:00:00'""".stripMargin))
  )
}
