package graft.streaming

import graft.engine.TsdbEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Watermarked stream-stream interval join (SURVEY §2.9 — the two-stream
  * extension of the reference's ingest path; funnel/attribution joins are
  * the canonical continuous-pipeline use of it).
  *
  * Two event streams are joined on a key with a bounded event-time span:
  * `right.ts ∈ [left.ts, left.ts + maxSpan]`. The span condition plus
  * watermarks on BOTH sides is what lets Spark expire join state — a left
  * row can only ever match right rows at most `maxSpan` ahead, so once the
  * watermark passes `left.ts + maxSpan` the row is dropped from state.
  *
  * 100 TB posture: join state is bounded by rows inside the watermark ×
  * span horizon per side (never stream length); inner-join matches emit
  * immediately (no watermark latency on output); the shuffle is the same
  * hash-by-key exchange a batch join would run, and emissions are
  * distributed engine appends.
  */
object StreamJoin {

  /** Join two event-type slices of one stream on `keyCol` within
    * `[l.ts, l.ts + maxSpan]`, appending match rows
    * (key, left_ts, right_ts) into an engine table; returns the table
    * read (user columns only). */
  def intervalJoinToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, keyCol: String, typeCol: String,
      leftType: String, rightType: String, maxSpan: String,
      watermarkDelay: String, table: String): DataFrame = {
    val spark = engine.spark
    if (!engine.catalog.exists(table))
      engine.execute(
        s"""CREATE TABLE $table (
           |  left_ts timestamp NOT NULL, $keyCol string TAG,
           |  right_ts timestamp,
           |  timestamp KEY(left_ts))
           |ENGINE=Analytic WITH (update_mode='append')""".stripMargin)

    def side(evType: String, alias: String): DataFrame = {
      val raw = spark.readStream.schema(schema)
        .option("pathGlobFilter", glob).parquet(dir)
      val events =
        if (nanosTs) graft.Tables.normalizeEventTime(raw, tsCol)
        else raw
      events.filter(col(typeCol) === evType)
        .select(col(keyCol).cast("string").as(s"${alias}_key"),
          col(tsCol).as(s"${alias}_ts"))
        .withWatermark(s"${alias}_ts", watermarkDelay)
    }

    val joined = side(leftType, "l").join(side(rightType, "r"),
      expr(s"""l_key = r_key AND
              |r_ts >= l_ts AND r_ts <= l_ts + INTERVAL $maxSpan""".stripMargin))
      .select(col("l_ts").as("left_ts"), col("l_key").as(keyCol),
        col("r_ts").as("right_ts"))

    StreamConf.withStatePartitions(spark, 8) {
      val q = joined.writeStream
        .trigger(Trigger.AvailableNow())
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

  /** LEFT OUTER variant: matched pairs emit immediately as in the inner
    * join; an UNMATCHED left row emits with a null `right_ts` only once
    * the global watermark passes `l.ts + maxSpan` — the point where no
    * in-watermark right row could still join it — exactly Spark's outer
    * stream-stream contract. Lefts still inside the horizon when the
    * AvailableNow run drains stay in (bounded) state and emit nothing:
    * the replayable cutoff the oracle re-derives with
    * `W = min(max left ts, max right ts) - delay`.
    *
    * Same 100 TB posture as the inner join: state bounded by the
    * watermark × span horizon, null emission is a state-store eviction
    * (no extra pass), appends distributed. */
  def intervalLeftJoinToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, keyCol: String, typeCol: String,
      leftType: String, rightType: String, maxSpan: String,
      watermarkDelay: String, table: String): DataFrame = {
    val spark = engine.spark
    if (!engine.catalog.exists(table))
      engine.execute(
        s"""CREATE TABLE $table (
           |  left_ts timestamp NOT NULL, $keyCol string TAG,
           |  right_ts timestamp,
           |  timestamp KEY(left_ts))
           |ENGINE=Analytic WITH (update_mode='append')""".stripMargin)

    def side(evType: String, alias: String): DataFrame = {
      val raw = spark.readStream.schema(schema)
        .option("pathGlobFilter", glob).parquet(dir)
      val events =
        if (nanosTs) graft.Tables.normalizeEventTime(raw, tsCol)
        else raw
      events.filter(col(typeCol) === evType)
        .select(col(keyCol).cast("string").as(s"${alias}_key"),
          col(tsCol).as(s"${alias}_ts"))
        .withWatermark(s"${alias}_ts", watermarkDelay)
    }

    val joined = side(leftType, "l").join(side(rightType, "r"),
      expr(s"""l_key = r_key AND
              |r_ts >= l_ts AND r_ts <= l_ts + INTERVAL $maxSpan""".stripMargin),
      "left_outer")
      .select(col("l_ts").as("left_ts"), col("l_key").as(keyCol),
        col("r_ts").as("right_ts"))

    StreamConf.withStatePartitions(spark, 8) {
      val q = joined.writeStream
        .trigger(Trigger.AvailableNow())
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
}
