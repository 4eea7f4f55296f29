package graft.streaming

import graft.engine.TsdbEngine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact deduplication — the at-least-once → exactly-once
  * repair step of every streaming ingest path (retried producers, replayed
  * WAL segments, overlapping backfills all re-deliver rows). Spark's
  * `dropDuplicatesWithinWatermark` keys the dedup state by the given
  * columns and — critically for an unbounded stream — EVICTS state once
  * the event-time watermark passes, so memory is bounded by the watermark
  * horizon (keys·delay), not by stream lifetime. A plain
  * `dropDuplicates` on a stream would grow state forever; this is the
  * 100 TB-safe form.
  */
object StreamDedup {

  /** Watermarked streaming dedup on `keys`: first arrival wins, duplicates
    * arriving within `watermarkDelay` of the original's event time are
    * dropped. `tsCol` must be the event-time timestamp column. */
  def dedup(
      stream: DataFrame, tsCol: String, watermarkDelay: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Run the deduped stream into an engine table (append mode, distributed
    * engine writes — no driver-side sink) and return the table read. The
    * table must already exist with a schema matching the stream. */
  def dedupToTable(
      engine: TsdbEngine, stream: DataFrame, tsCol: String,
      watermarkDelay: String, keys: Seq[String], table: String): DataFrame = {
    StreamConf.withStatePartitions(engine.spark, 8) {
      val q = dedup(stream, tsCol, watermarkDelay, keys)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation",
          engine.catalog.checkpointDir(table))
        .foreachBatch { (batch: DataFrame, _: Long) => engine.append(table, batch) }
        .start()
      q.awaitTermination()
    }
    val s = engine.catalog.get(table)
    engine.read(table).select(s.columns.map(c =>
      org.apache.spark.sql.functions.col(c.name)): _*)
  }
}
