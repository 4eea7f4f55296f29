package graft.queries

import graft.{GraftQuery, Tables}
import graft.engine.TsdbEngine
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-verifiable end-to-end runs of the TSDB engine itself: DDL dialect →
  * catalog → write path (tsid/defaults/sequence) → dedup-on-read → SQL. The
  * oracles are constant SELECTs (hand-computed expectations), so DuckDB
  * checks the whole pipeline's output.
  */
object EngineE2E {

  val all: Seq[GraftQuery] = Seq(

    // F1/F2-shaped lifecycle: create, insert, overwrite a duplicate PK,
    // aggregate — exercises parser, catalog, tsid, seq, dedup window.
    GraftQuery("q63_engine_sql_e2e",
      Some("""SELECT 'a' AS name, CAST(3 AS BIGINT) AS n, CAST(15.0 AS DOUBLE) AS total
             |UNION ALL
             |SELECT 'b' AS name, CAST(3 AS BIGINT) AS n, CAST(15.0 AS DOUBLE) AS total""".stripMargin),
      (s, _) => {
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-e2e").toString)
        e.execute(
          """CREATE TABLE demo (
            |  name string TAG, value double NOT NULL, t timestamp NOT NULL,
            |  timestamp KEY(t)) ENGINE=Analytic WITH (enable_ttl='false');
            |INSERT INTO demo (t, name, value) VALUES
            |  (1702224000000, 'a', 1.0), (1702224060000, 'a', 2.0), (1702224120000, 'a', 3.0),
            |  (1702224000000, 'b', 4.0), (1702224060000, 'b', 5.0), (1702224120000, 'b', 6.0);
            |INSERT INTO demo (t, name, value) VALUES (1702224000000, 'a', 10.0)
            |""".stripMargin)
        e.execute(
          """SELECT name, count(*) AS n, round(sum(value), 2) AS total
            |FROM demo GROUP BY name""".stripMargin)
      }),

    // Time-travel snapshot reads (TsdbEngine.readAsOf): click events
    // ingested as version 0, overwritten with doubled values as version 1;
    // the snapshot at seq 0 still answers the original state while the
    // live read sees the overwrite — the engine's __seq axis doing
    // lakehouse-style versioning with zero extra storage. Keys are
    // pre-deduped to (user_id, ts) max so within-batch ordering cannot
    // leak into the oracle.
    GraftQuery("q217_time_travel",
      Some("""WITH c AS (SELECT user_id, ts, max("value") AS v
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT 'v0' AS version, count(*) AS n, round(sum(v), 2) AS total FROM c
             |UNION ALL
             |SELECT 'v1' AS version, count(*) AS n, round(sum(v * 2), 2) AS total FROM c""".stripMargin),
      (s, dir) => {
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-travel").toString)
        e.execute(
          """CREATE TABLE snap (
            |  ts timestamp NOT NULL, user_id uint64 TAG, value double,
            |  timestamp KEY(ts)) ENGINE=Analytic WITH (enable_ttl='false')""".stripMargin)
        val clicks = Tables.t(s, dir, "events")
          .filter(col("event_type") === "click")
          .groupBy("user_id", "ts").agg(max("value").as("value"))
          .select("ts", "user_id", "value")
        e.append("snap", clicks)                                      // seq 0
        e.append("snap", clicks.withColumn("value", col("value") * 2)) // seq 1
        def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
          df.agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
            .select(lit(tag).as("version"), col("n"), col("total"))
        agg(e.readAsOf("snap", 0), "v0").unionAll(agg(e.read("snap"), "v1"))
      }),

    // Streaming exactly-once dedup: the events stream delivered TWICE
    // (two file sources unioned — a replayed-producer model), watermarked
    // dropDuplicatesWithinWatermark on event_id, appended to an engine
    // table; the oracle aggregates the single-delivery source directly
    GraftQuery("q125_streaming_dedup",
      Some("""SELECT event_type, count(*) AS n, round(sum("value"), 2) AS total
             |FROM events GROUP BY event_type""".stripMargin),
      (s, dir) => {
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-sdedup").toString)
        e.execute(
          """CREATE TABLE events_dedup (
            |  ts timestamp NOT NULL, event_type string TAG, value double,
            |  event_id int64, timestamp KEY(ts))
            |ENGINE=Analytic WITH (update_mode='append', enable_ttl='false')""".stripMargin)
        // actual on-disk schema (fixture generations vary: nanos-long vs
        // µs-NTZ) — normalizeEventTime downstream handles either
        val schema = Tables.rawSchema(s, dir, "events")
        def src = Tables.normalizeEventTime(
            s.readStream.schema(schema)
              .option("pathGlobFilter", "events.parquet").parquet(dir), "ts")
          .select("ts", "event_type", "value", "event_id")
        graft.streaming.StreamDedup.dedupToTable(
          e, src.unionAll(src), "ts", "1 hour", Seq("event_id"), "events_dedup")
        e.runSql(
          """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
            |FROM events_dedup GROUP BY event_type""".stripMargin)
      }),

    // Streaming decontamination GATE (round 6): documents stream through a
    // stateless per-batch broadcast anti-join against a static benchmark
    // gram set; only clean rows reach the parquet sink — contamination is
    // blocked at ingest rather than scrubbed later. Oracle replays the
    // batch semantics (gate output == batch clean, by construction).
    GraftQuery("q290_streaming_decontaminate_gate",
      Some("""WITH corpus AS (SELECT doc_id, source, n_chars,
             |    string_split_regex(trim(lower(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id % 17 <> 0),
             |bench AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id % 17 = 0),
             |pos AS (SELECT unnest(generate_series(1,
             |  (SELECT max(len(string_split_regex(trim(text), '\s+')))
             |   FROM documents))) AS i),
             |bg AS (
             |  SELECT DISTINCT array_to_string(toks[pos.i : pos.i + 7], ' ') AS g
             |  FROM bench CROSS JOIN pos
             |  WHERE len(toks) >= 8 AND pos.i <= len(toks) - 7
             |  UNION
             |  SELECT array_to_string(toks, ' ') FROM bench WHERE len(toks) < 8),
             |cg AS (
             |  SELECT c.doc_id, array_to_string(c.toks[pos.i : pos.i + 7], ' ') AS g
             |  FROM corpus c CROSS JOIN pos
             |  WHERE len(c.toks) >= 8 AND pos.i <= len(c.toks) - 7
             |  UNION ALL
             |  SELECT doc_id, array_to_string(toks, ' ')
             |  FROM corpus WHERE len(toks) < 8),
             |hit AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (g))
             |SELECT doc_id, source, n_chars FROM corpus
             |WHERE doc_id NOT IN (SELECT doc_id FROM hit)""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val schema = Tables.rawSchema(s, dir, "documents")
        val out = graft.TempDirs.create("graft-gate-out").toString
        graft.streaming.StreamGate.decontaminateToParquet(
            s, dir, "documents.parquet", schema, "doc_id", "text",
            docs.filter(col("doc_id") % 17 === 0), "text", n = 8, out)
          .filter(col("doc_id") % 17 =!= 0) // bench rows gate themselves out; corpus view
          .select(col("doc_id"), col("source"), col("n_chars"))
          // pin dump order: the sink's part-file names are run-random
          // UUIDs, so the read-back row order would vary across runs
          .orderBy("doc_id")
      }),

    // Streaming ingest (reference WAL+memtable path → Structured Streaming
    // foreachBatch, SURVEY §2.9/§3.2): replay the events table through a
    // streaming source into an engine table, then query the table.
    GraftQuery("q64_streaming_ingest",
      Some("""SELECT event_type, count(*) AS n, round(sum("value"), 2) AS total
             |FROM events GROUP BY event_type""".stripMargin),
      (s, dir) => {
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-stream").toString)
        e.execute(
          """CREATE TABLE events_ingest (
            |  ts timestamp NOT NULL, event_type string TAG, user_id int64,
            |  value double, event_id int64,
            |  timestamp KEY(ts))
            |ENGINE=Analytic WITH (update_mode='append', enable_ttl='false')""".stripMargin)
        // actual on-disk schema (fixture generations vary: nanos-long vs
        // µs-NTZ) — normalizeEventTime downstream handles either
        val schema = Tables.rawSchema(s, dir, "events")
        // file streaming source wants a directory: stream the sf dir,
        // glob-filtered to the events table
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        val q = stream.writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation",
            graft.TempDirs.create("graft-ckpt").toString)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            e.append("events_ingest", Tables.normalizeEventTime(batch, "ts")
              .select("ts", "event_type", "user_id", "value", "event_id"))
          }
          .start()
        q.awaitTermination()
        e.execute(
          """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
            |FROM events_ingest GROUP BY event_type""".stripMargin)
      }),

    // Streaming tumbling-window rollup with watermark, materialized into an
    // engine table (SURVEY §2.9): update-mode emissions append to an
    // overwrite-mode table whose newest-wins dedup makes them an upsert —
    // state watermark-bounded, no driver-side sink. The table read must
    // equal the batch time-bucket rollup.
    GraftQuery("q66_streaming_window_rollup",
      Some("""SELECT make_timestamp((epoch_ms(ts) // 3600000) * 3600000 * 1000) AS bucket,
             |  event_type, count(*) AS n, round(sum("value"), 2) AS total
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        // actual on-disk schema (fixture generations vary: nanos-long vs
        // µs-NTZ) — normalizeEventTime downstream handles either
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-rollup").toString)
        graft.streaming.Rollup.windowedRollupToTable(
            e, dir, "events.parquet", schema, nanosTs = true,
            "ts", "event_type", "value", "1 hour", "2 hours", "events_rollup")
          .withColumn("total", round(col("total"), 2))
      }),

    // ---- streaming SLIDING-window rollup: 6h windows every 3h —
    //      overlapping windows, each point in two (map-side expansion);
    //      state/sink still keyed (window start, tag). Oracle expands the
    //      two slide-aligned starts per point with unnest.
    GraftQuery("q277_streaming_sliding_rollup",
      Some("""WITH p AS (SELECT event_type, epoch_us(ts) AS us, "value"
             |  FROM events),
             |w AS (SELECT event_type, "value",
             |    unnest(ARRAY[(us // 10800000000) * 10800000000,
             |                 (us // 10800000000) * 10800000000 - 10800000000]) AS s
             |  FROM p)
             |SELECT make_timestamp(s) AS bucket, event_type,
             |  count(*) AS n, round(sum("value"), 2) AS total
             |FROM w GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-sliding").toString)
        graft.streaming.Rollup.windowedRollupToTable(
            e, dir, "events.parquet", schema, nanosTs = true,
            "ts", "event_type", "value", "6 hours", "2 hours",
            "events_sliding", slide = Some("3 hours"))
          .withColumn("total", round(col("total"), 2))
      }),

    // TWO chained stateful operators in ONE streaming query (Spark's
    // multiple-stateful-operator support): 4h-gap sessions per user, then
    // an hourly rollup of closed sessions keyed on session end-time —
    // watermark propagation does the inter-stage handoff. The oracle
    // replays both stages' append cutoffs: a session participates once the
    // final watermark passed its end; an hour emits once the watermark
    // passed the hour end.
    GraftQuery("q222_streaming_session_rollup",
      Some("""WITH e AS (SELECT cast(user_id AS varchar) AS user_id,
             |    epoch_us(ts) AS us FROM events),
             |s AS (SELECT user_id, us,
             |    CASE WHEN lag(us) OVER w IS NULL
             |           OR us - lag(us) OVER w >= 14400000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
             |s2 AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us
             |    ROWS UNBOUNDED PRECEDING) AS sid FROM s),
             |sess AS (SELECT user_id, max(us) + 14400000000 AS end_us,
             |    count(*) AS n FROM s2 GROUP BY user_id, sid),
             |wm AS (SELECT ((max(us) // 1000) - 3600000) * 1000 AS wm_us FROM e),
             |closed AS (SELECT * FROM sess, wm WHERE end_us <= wm_us),
             |b AS (SELECT (end_us - 1) // 3600000000 AS h,
             |    count(*) AS n_sessions, sum(n) AS n_events
             |  FROM closed GROUP BY 1)
             |SELECT make_timestamp(h * 3600000000) AS bucket,
             |  n_sessions::BIGINT AS n_sessions, n_events::BIGINT AS n_events
             |FROM b, wm WHERE (h + 1) * 3600000000 <= wm_us""".stripMargin),
      (s, dir) => {
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-sessroll").toString)
        graft.streaming.Sessionize.sessionRollupToTable(
          e, dir, "events.parquet", schema,
          "ts", "user_id", "value", gap = "4 hours",
          watermarkDelay = "1 hour", grain = "1 hour",
          table = "session_rollup")
      }),

    // Streaming custom state (flatMapGroupsWithState): per-series gauge
    // rate with one-sample state, replayed into an engine table. The
    // oracle re-derives the chain with lag() windows — Δt mirrors the
    // kernel's µs arithmetic exactly (SeriesRate divides by ΔtUs/1e6) so
    // the raw quotient is bit-identical, and the rate is presented as an
    // INTEGER µ-rate (q145 convention): DuckDB round() preserves -0.0 on
    // tiny negatives where Spark's BigDecimal HALF_UP does not, and the
    // BIGINT cast erases that sign bit on both sides.
    GraftQuery("q73_streaming_series_rate",
      Some("""SELECT event_type AS series, make_timestamp(us) AS ts,
             |  CAST(round(("value" - pv) / ((us - pt) / 1e6) * 1000000.0, 0)
             |    AS BIGINT) AS rate
             |FROM (
             |  SELECT event_type, epoch_ns(ts) // 1000 AS us, "value",
             |    lag("value") OVER w AS pv,
             |    lag(epoch_ns(ts) // 1000) OVER w AS pt
             |  FROM events
             |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, "value"))
             |WHERE pv IS NOT NULL AND us > pt""".stripMargin),
      (s, dir) => {
        // actual on-disk schema (fixture generations vary: nanos-long vs
        // µs-NTZ) — normalizeEventTime downstream handles either
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-srate").toString)
        graft.streaming.SeriesRate.rateToTable(
            e, dir, "events.parquet", schema, nanosTs = true,
            "ts", "event_type", "value", "events_rate")
          .select(col("series"), col("ts"),
            round(col("rate") * 1000000.0, 0).cast("long").as("rate"))
      }),

    // Streaming EWMA anomaly detection (flatMapGroupsWithState): per-series
    // (n, ewma, ewmvar) state, flag |x − ewma| > 4σ against PRE-update
    // statistics after a 16-sample warm-up, replayed into an engine table.
    // α = 1/4 and k = 4 are exact binary; the oracle's recursive CTE
    // carries (mean, var) with kernel-identical operand order (q210
    // convention), so the flag decisions and the floor-scaled deviation
    // are bit-equal.
    GraftQuery("q213_streaming_anomaly",
      Some("""WITH RECURSIVE o AS (
             |  SELECT event_type AS series, epoch_us(ts) AS us, "value" AS v,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY ts, "value") AS rn
             |  FROM events),
             |rec AS (
             |  SELECT series, rn, CAST(1 AS BIGINT) AS n, v AS mean,
             |    CAST(0.0 AS DOUBLE) AS var, FALSE AS flag,
             |    CAST(0.0 AS DOUBLE) AS dev
             |  FROM o WHERE rn = 1
             |  UNION ALL
             |  SELECT o.series, o.rn, r.n + 1,
             |    r.mean + 0.25 * (o.v - r.mean),
             |    0.75 * (r.var + 0.25 * (o.v - r.mean) * (o.v - r.mean)),
             |    r.n >= 16 AND abs(o.v - r.mean) > 4.0 * sqrt(r.var),
             |    o.v - r.mean
             |  FROM rec r JOIN o ON o.series = r.series AND o.rn = r.rn + 1)
             |SELECT r.series, make_timestamp(o.us) AS ts,
             |  CAST(round(o.v * 1000, 0) AS BIGINT) AS value_milli,
             |  CAST(floor(r.dev * 10000) AS BIGINT) AS dev_1e4
             |FROM rec r JOIN o USING (series, rn) WHERE r.flag""".stripMargin),
      (s, dir) => {
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-sanom").toString)
        graft.streaming.AnomalyDetect.anomaliesToTable(
          e, dir, "events.parquet", schema,
          "ts", "event_type", "value",
          alpha = 0.25, k = 4.0, warm = 16, table = "events_anomaly")
      }),

    // Streaming session windows (gap-based, append mode): per-user sessions
    // with a 4h inactivity gap, closed by a 1h watermark, materialized into
    // an engine table. The oracle re-derives gap sessionization with
    // lag()+cumsum and applies the same closure cutoff (sessions whose
    // end = last event + gap has been passed by the final watermark
    // max event ms - delay — Spark tracks event-time stats at ms).
    GraftQuery("q113_streaming_session_window",
      Some("""WITH e AS (
             |  SELECT cast(user_id AS varchar) AS user_id,
             |         epoch_ns(ts) // 1000 AS us, "value"
             |  FROM events),
             |s AS (
             |  SELECT user_id, us, "value",
             |    CASE WHEN lag(us) OVER w IS NULL
             |           OR us - lag(us) OVER w >= 14400000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
             |s2 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us
             |    ROWS UNBOUNDED PRECEDING) AS sid FROM s),
             |sess AS (
             |  SELECT make_timestamp(min(us)) AS session_start,
             |         make_timestamp(max(us) + 14400000000) AS session_end,
             |         user_id, count(*) AS n, round(sum("value"), 2) AS total,
             |         max(us) + 14400000000 AS end_us
             |  FROM s2 GROUP BY user_id, sid)
             |SELECT session_start, session_end, user_id, n, total FROM sess
             |WHERE end_us <= (SELECT ((max(us) // 1000) - 3600000) * 1000 FROM e)
             |""".stripMargin),
      (s, dir) => {
        // actual on-disk schema (fixture generations vary: nanos-long vs
        // µs-NTZ) — normalizeEventTime downstream handles either
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-sess").toString)
        graft.streaming.Sessionize.sessionsToTable(
            e, dir, "events.parquet", schema, nanosTs = true,
            "ts", "user_id", "value", "4 hours", "1 hour", "user_sessions")
          .withColumn("total", round(col("total"), 2))
      }),

    // Watermarked stream-stream interval join (append mode): click→purchase
    // attribution within 2h per user, match rows appended to an engine
    // table. The oracle is the equivalent batch self-join on µs-truncated
    // event times (inner-join matches emit immediately; nothing is
    // watermark-gated on output, so the full pair set lands).
    GraftQuery("q114_stream_stream_join",
      Some("""SELECT make_timestamp(epoch_ns(c.ts) // 1000) AS left_ts,
             |  cast(c.user_id AS varchar) AS user_id,
             |  make_timestamp(epoch_ns(p.ts) // 1000) AS right_ts
             |FROM events c JOIN events p ON c.user_id = p.user_id
             |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
             |  AND epoch_ns(p.ts) // 1000 >= epoch_ns(c.ts) // 1000
             |  AND epoch_ns(p.ts) // 1000 <= epoch_ns(c.ts) // 1000 + 7200000000
             |""".stripMargin),
      (s, dir) => {
        // actual on-disk schema (fixture generations vary: nanos-long vs
        // µs-NTZ) — normalizeEventTime downstream handles either
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-ssjoin").toString)
        graft.streaming.StreamJoin.intervalJoinToTable(
          e, dir, "events.parquet", schema, nanosTs = true,
          "ts", "user_id", "event_type", "click", "purchase",
          "2 hours", "1 hour", "click_purchase")
      }),

    // Streaming rollup into a PARTITION BY KEY engine table: the sink table
    // is bucket-partitioned on the tag, so the tag-filtered read of the
    // materialization prunes to one bucket dir (BucketPruning plan assert
    // in StreamingSpec). Same rollup semantics as q66, sliced to one tag.
    GraftQuery("q115_streaming_partitioned_sink",
      Some("""SELECT make_timestamp((epoch_ms(ts) // 3600000) * 3600000 * 1000) AS bucket,
             |  event_type, count(*) AS n, round(sum("value"), 2) AS total
             |FROM events WHERE event_type = 'click' GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        // actual on-disk schema (fixture generations vary: nanos-long vs
        // µs-NTZ) — normalizeEventTime downstream handles either
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-psink").toString)
        graft.streaming.Rollup.windowedRollupToTable(
            e, dir, "events.parquet", schema, nanosTs = true,
            "ts", "event_type", "value", "1 hour", "2 hours", "events_rollup_pk",
            partitionByKey = Some(5))
          .filter(col("event_type") === "click")
          .withColumn("total", round(col("total"), 2))
      }),

    // Streaming sketch rollup: per-trigger PARTIAL t-digest sketches
    // appended to an append-mode engine table — mergeability replaces
    // streaming state (no watermark/state store; read-time merge answers
    // any window). Quantile estimates are sketch-approx (rows-only);
    // RollupSpec binds the rank-error contract and the exact n identity
    // against a deliberately multi-batch replay.
    GraftQuery("q184_streaming_sketch_rollup",
      None,
      (s, dir) => {
        // actual on-disk schema (fixture generations vary: nanos-long vs
        // µs-NTZ) — normalizeEventTime downstream handles either
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-sksink").toString)
        val sk = graft.streaming.Rollup.sketchRollupToTable(
          e, dir, "events.parquet", schema, nanosTs = true,
          "ts", "event_type", "value", bucketSeconds = 86400L,
          "events_sketch_rollup")
        graft.operators.QuantileRollup.quantiles(
            sk, Seq("event_type"), Seq(0.5, 0.95, 0.99))
          .orderBy("event_type")
      }),

    // Streaming frequent-items rollup: the Misra-Gries twin of q184 —
    // per-trigger partial MG summaries appended to an engine table, merged
    // at read time. Capacity 100k >= the fixture's user universe, so the
    // summaries are lossless and the exact top-5 SQL is a true oracle:
    // a STREAMING query the driver hash-checks end-to-end.
    GraftQuery("q195_streaming_freq_rollup",
      Some("""WITH c AS (SELECT event_type, user_id::VARCHAR AS item,
             |    count(*) AS est_count FROM events GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
             |    ORDER BY est_count DESC, item) AS rk FROM c)
             |SELECT event_type, item, est_count FROM r WHERE rk <= 5""".stripMargin),
      (s, dir) => {
        // actual on-disk schema (fixture generations vary: nanos-long vs
        // µs-NTZ) — normalizeEventTime downstream handles either
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-mgsink").toString)
        val sk = graft.streaming.Rollup.freqRollupToTable(
          e, dir, "events.parquet", schema, nanosTs = true,
          "ts", "event_type", "user_id", bucketSeconds = 86400L, k = 100000,
          "events_freq_rollup")
        graft.operators.FreqRollup.topK(sk, Seq("event_type"), 5)
      }),

    // Incremental rollup maintenance (TsdbEngine.refreshRollup): the raw
    // table is ingested in two batches — the second landing LATE rows
    // into already-rolled-up buckets — and after each append only the
    // touched 6h buckets are recomputed and overwrite-appended to the
    // rollup table (update_mode='overwrite' on (bucket, tag) supersedes
    // earlier generations at read). The oracle is the full one-shot
    // rollup: incremental must equal recompute-everything. Integer-exact
    // counts and milli-scaled sums.
    GraftQuery("q233_rollup_incremental",
      Some("""SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS bucket,
             |  event_type,
             |  count(*)::BIGINT AS n,
             |  sum(CAST(round("value" * 1000, 0) AS BIGINT))::BIGINT AS sum_milli
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-increfresh").toString)
        e.execute(
          """CREATE TABLE ev_raw (
            |  ts timestamp NOT NULL, event_type string TAG, value double,
            |  timestamp KEY(ts))
            |ENGINE=Analytic WITH (update_mode='append', enable_ttl='false')""".stripMargin)
        e.execute(
          """CREATE TABLE ev_rollup_6h (
            |  bucket timestamp NOT NULL, event_type string TAG,
            |  n uint64, sum_milli int64,
            |  timestamp KEY(bucket))
            |ENGINE=Analytic WITH (update_mode='overwrite', enable_ttl='false')""".stripMargin)
        val ev = Tables.t(s, dir, "events")
          .select(col("ts"), col("event_type"), col("value"))
        val cutoff = java.sql.Timestamp.valueOf("2024-01-20 03:00:00")
        val aggs = Seq(
          "n" -> count(lit(1)),
          "sum_milli" -> sum(round(col("value") * 1000, 0).cast("long")))
        // batch 1: everything before the cutoff; refresh from seq 0
        e.append("ev_raw", ev.filter(col("ts") < lit(cutoff)))
        val hw1 = e.refreshRollup("ev_raw", "ev_rollup_6h", 21600L,
          Seq("event_type"), aggs, sinceSeq = 0L)
        // batch 2: the tail — its first 6h bucket (2024-01-20 00:00) is
        // ALREADY materialized from batch 1, so this refresh exercises
        // the late-data recompute-and-supersede path
        e.append("ev_raw", ev.filter(col("ts") >= lit(cutoff)))
        e.refreshRollup("ev_raw", "ev_rollup_6h", 21600L,
          Seq("event_type"), aggs, sinceSeq = hw1)
        e.read("ev_rollup_6h")
          .select(col("bucket"), col("event_type"),
            col("n").cast("long").as("n"), col("sum_milli"))
      }),

    // Stream-stream LEFT OUTER interval join: matches emit immediately;
    // unmatched clicks emit (click_ts, user, NULL) once the watermark
    // passes click_ts + 2h. The oracle replays the final-watermark cutoff
    // W = min(max click ts, max purchase ts) - 1h: unmatched lefts with
    // l_ts + 2h < W are the exact null-extension set.
    GraftQuery("q234_stream_left_join",
      Some("""WITH l AS (SELECT user_id, epoch_us(ts) AS us FROM events
             |  WHERE event_type = 'click'),
             |r AS (SELECT user_id, epoch_us(ts) AS us FROM events
             |  WHERE event_type = 'purchase'),
             |wm AS (SELECT least((SELECT max(us) FROM l),
             |    (SELECT max(us) FROM r)) - 3600000000 AS w)
             |SELECT make_timestamp(l.us) AS left_ts,
             |  cast(l.user_id AS varchar) AS user_id,
             |  make_timestamp(r.us) AS right_ts
             |FROM l JOIN r ON l.user_id = r.user_id
             |  AND r.us >= l.us AND r.us <= l.us + 7200000000
             |UNION ALL
             |SELECT make_timestamp(l.us), cast(l.user_id AS varchar), NULL
             |FROM l, wm
             |WHERE NOT EXISTS (SELECT 1 FROM r
             |    WHERE r.user_id = l.user_id
             |      AND r.us >= l.us AND r.us <= l.us + 7200000000)
             |  AND l.us + 7200000000 < wm.w""".stripMargin),
      (s, dir) => {
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-ssleft").toString)
        graft.streaming.StreamJoin.intervalLeftJoinToTable(
          e, dir, "events.parquet", schema, nanosTs = true,
          "ts", "user_id", "event_type", "click", "purchase",
          "2 hours", "1 hour", "click_purchase_left")
      }),

    // Hierarchical rollup cascade: raw -> 6h -> 1d, BOTH levels maintained
    // incrementally per ingest batch with refreshRollup — the daily level
    // refreshes FROM the 6h rollup (mergeable sum-of-sums / sum-of-counts),
    // never rescanning raw: the multi-resolution retention layout every
    // production TSDB runs (raw short-TTL, coarse grains long-TTL). The
    // oracle computes the daily rollup directly from events — the cascade
    // must be indistinguishable from one-shot recomputation.
    GraftQuery("q235_rollup_cascade",
      Some("""SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS day,
             |  event_type,
             |  count(*)::BIGINT AS n,
             |  sum(CAST(round("value" * 1000, 0) AS BIGINT))::BIGINT AS sum_milli
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-cascade").toString)
        e.execute(
          """CREATE TABLE c_raw (
            |  ts timestamp NOT NULL, event_type string TAG, value double,
            |  timestamp KEY(ts))
            |ENGINE=Analytic WITH (update_mode='append', enable_ttl='false')""".stripMargin)
        for (t <- Seq("c_6h", "c_1d")) e.execute(
          s"""CREATE TABLE $t (
             |  bucket timestamp NOT NULL, event_type string TAG,
             |  n uint64, sum_milli int64,
             |  timestamp KEY(bucket))
             |ENGINE=Analytic WITH (update_mode='overwrite', enable_ttl='false')""".stripMargin)
        val ev = Tables.t(s, dir, "events")
          .select(col("ts"), col("event_type"), col("value"))
        val rawAggs = Seq(
          "n" -> count(lit(1)),
          "sum_milli" -> sum(round(col("value") * 1000, 0).cast("long")))
        // the daily level merges the 6h level's partials
        val mergeAggs = Seq(
          "n" -> sum(col("n").cast("long")),
          "sum_milli" -> sum(col("sum_milli")))
        val cutoff = java.sql.Timestamp.valueOf("2024-01-18 09:00:00")
        var hw6h = 0L; var hw1d = 0L
        for (batch <- Seq(ev.filter(col("ts") < lit(cutoff)),
                          ev.filter(col("ts") >= lit(cutoff)))) {
          e.append("c_raw", batch)
          hw6h = e.refreshRollup("c_raw", "c_6h", 21600L,
            Seq("event_type"), rawAggs, hw6h)
          hw1d = e.refreshRollup("c_6h", "c_1d", 86400L,
            Seq("event_type"), mergeAggs, hw1d)
        }
        e.read("c_1d").select(col("bucket").as("day"), col("event_type"),
          col("n").cast("long").as("n"), col("sum_milli"))
      }),

    // Snapshot diff over the __seq axis (TsdbEngine.snapshotDiff): the
    // lakehouse "what changed between versions" read. v0 = click keys;
    // v1 overwrites even-user clicks (updated) and adds view keys
    // (added); odd-user clicks are untouched. One full-outer PK join of
    // the two snapshot reads.
    GraftQuery("q238_snapshot_diff",
      Some("""WITH c AS (SELECT user_id, ts, max("value") AS v
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |w AS (SELECT DISTINCT user_id, ts FROM events
             |  WHERE event_type = 'view'),
             |a AS (SELECT * FROM w WHERE NOT EXISTS (SELECT 1 FROM c
             |  WHERE c.user_id = w.user_id AND c.ts = w.ts))
             |SELECT 'added' AS change, count(*)::BIGINT AS n FROM a
             |UNION ALL
             |SELECT 'updated', count(*)::BIGINT FROM c WHERE user_id % 2 = 0
             |UNION ALL
             |SELECT 'unchanged', count(*)::BIGINT FROM c WHERE user_id % 2 = 1""".stripMargin),
      (s, dir) => {
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-snapdiff").toString)
        e.execute(
          """CREATE TABLE sd (
            |  ts timestamp NOT NULL, user_id uint64 TAG, value double,
            |  timestamp KEY(ts))
            |ENGINE=Analytic WITH (update_mode='overwrite', enable_ttl='false')""".stripMargin)
        def keyed(ty: String) = Tables.t(s, dir, "events")
          .filter(col("event_type") === ty)
          .groupBy("user_id", "ts").agg(max("value").as("value"))
          .select("ts", "user_id", "value")
        val clicks = keyed("click")
        e.append("sd", clicks)                                        // seq 0
        val views = keyed("view").join(clicks.select("user_id", "ts"),
          Seq("user_id", "ts"), "left_anti")
        e.append("sd", clicks.filter(col("user_id") % 2 === 0)
          .withColumn("value", col("value") * 2)
          .unionByName(views))                                        // seq 1
        e.snapshotDiff("sd", 0L, 1L)
          .groupBy("change").agg(count(lit(1)).as("n"))
      }),

    // Stream-static enrichment join (streaming/Enrich): the event stream
    // broadcast-joined with a user-tier dimension BEFORE landing — a
    // stateless map-side join (no watermark, no state store), appended to
    // an engine table and aggregated at read. The oracle enriches in SQL.
    GraftQuery("q241_stream_static_join",
      Some("""SELECT 'tier' || (user_id % 3) AS tier, event_type,
             |  count(*)::BIGINT AS n,
             |  sum(CAST(round("value" * 1000, 0) AS BIGINT))::BIGINT AS sum_milli
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val schema = Tables.rawSchema(s, dir, "events")
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-enrich").toString)
        val dim = Tables.t(s, dir, "events").select("user_id").distinct()
          .withColumn("tier", concat(lit("tier"), col("user_id") % 3))
        graft.streaming.Enrich.streamStaticJoinToTable(
            e, dir, "events.parquet", schema, nanosTs = true,
            "ts", "user_id", "value", dim, "tier", "events_enriched",
            passthrough = Seq("event_type"))
          .groupBy("tier", "event_type")
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 1000, 0).cast("long")).as("sum_milli"))
      }),

    // Equal-frequency binning (featurization): ntile(10) per event_type
    // over (value, event_id) — the unique id makes the quantile ordering
    // total, so bucket boundaries are deterministic on both engines.
    GraftQuery("q242_equal_freq_binning",
      Some("""WITH b AS (SELECT event_type,
             |    ntile(10) OVER (PARTITION BY event_type
             |      ORDER BY "value", event_id) AS bucket,
             |    CAST(round("value" * 1000, 0) AS BIGINT) AS vm
             |  FROM events)
             |SELECT event_type, bucket, count(*)::BIGINT AS n,
             |  min(vm) AS min_milli, max(vm) AS max_milli
             |FROM b GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        Tables.t(s, dir, "events")
          .select(col("event_type"), ntile(10).over(w).as("bucket"),
            round(col("value") * 1000, 0).cast("long").as("vm"))
          .groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("n"), min("vm").as("min_milli"),
            max("vm").as("max_milli"))
      }),

    // Ingest history (TsdbEngine.tableHistory): one row per surviving
    // ingest sequence — the DESCRIBE HISTORY read over the __seq axis.
    GraftQuery("q244_table_history",
      Some("""SELECT 0::BIGINT AS seq, count(*)::BIGINT AS n_rows,
             |  min(ts) AS min_ts, max(ts) AS max_ts
             |FROM events WHERE event_type = 'click'
             |  AND ts <  TIMESTAMP '2024-01-15 00:00:00'
             |UNION ALL
             |SELECT 1::BIGINT, count(*)::BIGINT, min(ts), max(ts)
             |FROM events WHERE event_type = 'click'
             |  AND ts >= TIMESTAMP '2024-01-15 00:00:00'""".stripMargin),
      (s, dir) => {
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-hist").toString)
        e.execute(
          """CREATE TABLE th (
            |  ts timestamp NOT NULL, user_id uint64 TAG, value double,
            |  timestamp KEY(ts))
            |ENGINE=Analytic WITH (update_mode='append', enable_ttl='false')""".stripMargin)
        val clicks = Tables.t(s, dir, "events")
          .filter(col("event_type") === "click")
          .select("ts", "user_id", "value")
        val cut = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
        e.append("th", clicks.filter(col("ts") < lit(cut)))
        e.append("th", clicks.filter(col("ts") >= lit(cut)))
        e.tableHistory("th")
      }),

    // ---- small-file compaction under the gate (TsdbEngine
    //      .compactSmallFiles): clicks ingested as four interleaved
    //      batches leave four files in every touched day segment; the
    //      pass bin-packs each segment to one file and the daily rollup
    //      read through the compacted layout must equal the raw-parquet
    //      oracle — physical maintenance is result-invisible.
    GraftQuery("q257_small_file_compact",
      Some("""SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS day,
             |  count(*)::BIGINT AS n,
             |  sum(CAST(round("value" * 1000, 0) AS BIGINT))::BIGINT AS sum_milli
             |FROM events WHERE event_type = 'click'
             |GROUP BY 1""".stripMargin),
      (s, dir) => {
        val e = new TsdbEngine(s,
          graft.TempDirs.create("graft-sfc").toString)
        e.execute(
          """CREATE TABLE sfx (
            |  ts timestamp NOT NULL, user_id uint64 TAG, value double,
            |  timestamp KEY(ts))
            |ENGINE=Analytic WITH (update_mode='append', enable_ttl='false',
            |  segment_duration='1d')""".stripMargin)
        val clicks = Tables.t(s, dir, "events")
          .filter(col("event_type") === "click")
          .select("ts", "user_id", "value")
        (0 until 4).foreach(i =>
          e.append("sfx", clicks.filter(pmod(col("user_id"), lit(4)) === i)))
        val (_, rewritten, fb, fa) =
          e.compactSmallFiles("sfx", maxFilesPerSegment = 2)
        require(rewritten > 0 && fa < fb,
          s"compaction did no work: rewrote $rewritten, files $fb -> $fa")
        e.read("sfx")
          .groupBy(timestamp_micros(
            expr("(unix_micros(ts) div 86400000000) * 86400000000"))
            .as("day"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 1000, 0).cast("long")).as("sum_milli"))
      })
  )
}
