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
          java.nio.file.Files.createTempDirectory("graft-e2e").toString)
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

    // Streaming ingest (reference WAL+memtable path → Structured Streaming
    // foreachBatch, SURVEY §2.9/§3.2): replay the events table through a
    // streaming source into an engine table, then query the table.
    GraftQuery("q64_streaming_ingest",
      Some("""SELECT event_type, count(*) AS n, round(sum("value"), 2) AS total
             |FROM events GROUP BY event_type""".stripMargin),
      (s, dir) => {
        val e = new TsdbEngine(s,
          java.nio.file.Files.createTempDirectory("graft-stream").toString)
        e.execute(
          """CREATE TABLE events_ingest (
            |  ts timestamp NOT NULL, event_type string TAG, user_id int64,
            |  value double, event_id int64,
            |  timestamp KEY(ts))
            |ENGINE=Analytic WITH (update_mode='append', enable_ttl='false')""".stripMargin)
        // events.parquet carries TIMESTAMP(NANOS): stream it as raw long
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("ts", LongType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType)))
        // file streaming source wants a directory: stream the sf dir,
        // glob-filtered to the events table
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        val q = stream.writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            e.append("events_ingest", batch
              .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("ts", LongType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType)))
        val e = new TsdbEngine(s,
          java.nio.file.Files.createTempDirectory("graft-rollup").toString)
        graft.streaming.Rollup.windowedRollupToTable(
            e, dir, "events.parquet", schema, nanosTs = true,
            "ts", "event_type", "value", "1 hour", "2 hours", "events_rollup")
          .withColumn("total", round(col("total"), 2))
      }),

    // Streaming custom state (flatMapGroupsWithState): per-series gauge
    // rate with one-sample state, replayed into an engine table. The
    // oracle re-derives the chain with lag() windows — Δt computed on
    // integral ns differences so both sides round identically.
    GraftQuery("q73_streaming_series_rate",
      Some("""SELECT event_type AS series, make_timestamp(epoch_ns(ts) // 1000) AS ts,
             |  round(("value" - pv) / ((epoch_ns(ts) - pt) / 1e9), 4) AS rate
             |FROM (
             |  SELECT event_type, ts, "value",
             |    lag("value") OVER w AS pv, lag(epoch_ns(ts)) OVER w AS pt
             |  FROM events
             |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, "value"))
             |WHERE pv IS NOT NULL AND epoch_ns(ts) > pt""".stripMargin),
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("ts", LongType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType)))
        val e = new TsdbEngine(s,
          java.nio.file.Files.createTempDirectory("graft-srate").toString)
        graft.streaming.SeriesRate.rateToTable(
            e, dir, "events.parquet", schema, nanosTs = true,
            "ts", "event_type", "value", "events_rate")
          .select(col("series"), col("ts"), round(col("rate"), 4).as("rate"))
      })
  )
}
