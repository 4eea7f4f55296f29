package graft.streaming

import graft.engine.TsdbEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming session windows (SURVEY §2.9 — the gap-based counterpart of
  * [[Rollup]]'s tumbling windows; HoraeDB has no streaming operators, so
  * this is the Structured Streaming extension of its ingest path).
  *
  * `session_window(ts, gap)` merges events whose spacing is under `gap`
  * into one window per key; the aggregation runs in APPEND mode, so a
  * session is emitted exactly once — when the event-time watermark passes
  * its end (`last event + gap`) and no future event can extend it.
  *
  * 100 TB posture: session state is bounded by OPEN sessions per key
  * (watermark closes and evicts settled ones — nothing grows with stream
  * lifetime), emissions are distributed engine appends (no driver-side
  * sink), and closed sessions are immutable facts — append-mode tables,
  * no upsert reconciliation needed, unlike update-mode rollups.
  */
object Sessionize {

  /** The shared stream → per-key session aggregate: for each
    * (session, key): start, end (= last event + gap), count, sum.
    * Watermark applied on the event-time column BEFORE grouping — that is
    * what closes sessions and bounds state. Exposed for memory-sink tests. */
  def sessionAgg(
      spark: SparkSession, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, keyCol: String, valueCol: String,
      gap: String, watermarkDelay: String): DataFrame = {
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    val events =
      if (nanosTs) graft.Tables.normalizeEventTime(raw, tsCol)
      else raw
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("total"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col(keyCol), col("n"), col("total"))
  }

  /** Sessionize a parquet-backed stream into an engine table and return the
    * table read (user columns only). Only CLOSED sessions land — the final
    * watermark (`max event time - watermarkDelay`) is the contract's cutoff,
    * exactly what a continuously-running deployment would have emitted. */
  def sessionsToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, keyCol: String, valueCol: String,
      gap: String, watermarkDelay: String, table: String): DataFrame = {
    val spark = engine.spark
    if (!engine.catalog.exists(table))
      engine.execute(
        s"""CREATE TABLE $table (
           |  session_start timestamp NOT NULL, $keyCol string TAG,
           |  session_end timestamp, n bigint, total double,
           |  timestamp KEY(session_start))
           |ENGINE=Analytic WITH (update_mode='append')""".stripMargin)

    StreamConf.withStatePartitions(spark, 8) {
      val q = sessionAgg(spark, dir, glob, schema, nanosTs, tsCol, keyCol,
          valueCol, gap, watermarkDelay)
        .withColumn(keyCol, col(keyCol).cast("string"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        // append mode: one emission per closed session (AvailableNow runs the
        // final no-data batch that advances the watermark and flushes)
        .outputMode("append")
        .option("checkpointLocation",
          engine.catalog.checkpointDir(table))
        .foreachBatch { (batch: DataFrame, _: Long) => engine.append(table, batch) }
        .start()
      q.awaitTermination()
    }
    val s = engine.catalog.get(table)
    engine.read(table).select(s.columns.map(c => col(c.name)): _*)
  }

  /** TWO chained stateful operators in ONE streaming query (the Spark 3.4+
    * multiple-stateful-operator path): gap sessionization per key, then a
    * tumbling rollup of the CLOSED sessions — counts and event totals per
    * `grain` bucket of session end-time. A deployment would otherwise need
    * two queries with an intermediate table; chaining keeps it one
    * exactly-once pipeline with watermark propagation doing the inter-stage
    * handoff (`window_time` re-derives the event-time column from the
    * session window so the second aggregation stays watermark-aligned).
    * Each session lands in the bucket of its inclusive end event-time
    * (`window_time` = session end − 1µs). */
  def sessionRollupToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      tsCol: String, keyCol: String, valueCol: String,
      gap: String, watermarkDelay: String, grain: String,
      table: String): DataFrame = {
    val spark = engine.spark
    if (!engine.catalog.exists(table))
      engine.execute(
        s"""CREATE TABLE $table (
           |  bucket timestamp NOT NULL, n_sessions bigint, n_events bigint,
           |  timestamp KEY(bucket))
           |ENGINE=Analytic WITH (update_mode='append')""".stripMargin)

    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    val events = graft.Tables.normalizeEventTime(raw, tsCol)

    StreamConf.withStatePartitions(spark, 8) {
      val sessions = events
        .withWatermark(tsCol, watermarkDelay)
        .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
        .agg(count(lit(1)).as("n"))
      val rollup = sessions
        .groupBy(window(window_time(col("w")), grain).as("hw"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
        .select(col("hw.start").as("bucket"),
          col("n_sessions"), col("n_events"))
      val q = rollup.writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation", engine.catalog.checkpointDir(table))
        .foreachBatch { (batch: DataFrame, _: Long) => engine.append(table, batch) }
        .start()
      q.awaitTermination()
    }
    val s = engine.catalog.get(table)
    engine.read(table).select(s.columns.map(c => col(c.name)): _*)
  }
}
