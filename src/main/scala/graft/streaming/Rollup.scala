package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming tumbling-window rollups: the Spark-side extension of the
  * reference's ingest path (SURVEY §2.9 — HoraeDB has no streaming
  * operators; time_bucket-style rollups over a stream are the natural
  * Structured Streaming upgrade). Watermarked event-time windows +
  * partial/final aggregation; at scale this is the standard continuous
  * pre-aggregation pipeline (state bounded by watermark × series).
  */
object Rollup {

  /** Run a tumbling-window rollup over a parquet-backed stream with
    * AvailableNow (batch-replay) semantics and return the materialized
    * result: per (window start, tag): count + sum.
    *
    * @param nanosTs  event-time column arrives as raw nanos (the events
    *                 fixture's TIMESTAMP(NANOS) streams as long)
    */
  def windowedRollup(
      spark: SparkSession, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, tagCol: String, valueCol: String,
      windowDur: String, watermarkDelay: String): DataFrame = {
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    val events =
      if (nanosTs) raw.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      else raw

    val sinkName = s"rollup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(tagCol))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("total"))
      .select(col("w.start").as("bucket"), col(tagCol), col("n"), col("total"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      // complete mode so the trailing windows (younger than the watermark,
      // which append mode would hold back) are emitted too — the replayed
      // stream must equal the batch rollup exactly
      .outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rollup-ckpt").toString)
      .format("memory")
      .queryName(sinkName)
      .start()
    q.awaitTermination()
    spark.table(sinkName)
  }
}
