package graft.streaming

import graft.engine.TsdbEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Serializes the `spark.sql.shuffle.partitions` pin that stateful-replay
  * helpers use to right-size their state stores. The conf is session-global
  * and is captured by a stream when its FIRST batch plans, so the set /
  * run / restore section must be mutually exclusive — without the lock,
  * two concurrent helpers could each save the other's pinned value and
  * leave the session permanently altered (and any batch query running
  * meanwhile would silently shuffle at the pinned width).
  */
private[streaming] object StreamConf {
  def withStatePartitions[A](
      spark: SparkSession, n: Int)(body: => A): A = synchronized {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}

/** Streaming tumbling-window rollups: the Spark-side extension of the
  * reference's ingest path (SURVEY §2.9 — HoraeDB has no streaming
  * operators; time_bucket-style rollups over a stream are the natural
  * Structured Streaming upgrade). Watermarked event-time windows +
  * partial/final aggregation; at scale this is the standard continuous
  * pre-aggregation pipeline (state bounded by watermark × series).
  */
object Rollup {

  /** Continuous rollup materialized INTO AN ENGINE TABLE: watermarked
    * update-mode window aggregation whose per-trigger emissions append to an
    * overwrite-mode table keyed on (window start, tag). The engine's
    * newest-sequence-wins dedup turns the update stream into an upsert
    * materialization — the read side always sees each window's latest
    * value, and `compact()` folds superseded updates away.
    *
    * 100 TB posture: streaming state is bounded by watermark × live series
    * (update mode evicts windows past the watermark — nothing grows with
    * stream lifetime), emissions are distributed parquet appends (no
    * driver-side result collection, unlike a memory sink), and the sink
    * table is a normal engine table: queryable mid-stream, compactable,
    * TTL-able.
    *
    * Returns the engine table read (== the rollup, newest update per
    * window).
    *
    * @param nanosTs  event-time column arrives as raw nanos (the events
    *                 fixture's TIMESTAMP(NANOS) streams as long)
    */
  /** @param partitionByKey Some(n): PARTITION BY KEY(tag) into n buckets —
    *                        every streamed append lands in its tag's bucket
    *                        dir, so tag-filtered reads of the rollup prune
    *                        to one bucket (plans.Rules.BucketPruning). */
  def windowedRollupToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, tagCol: String, valueCol: String,
      windowDur: String, watermarkDelay: String, table: String,
      partitionByKey: Option[Int] = None,
      slide: Option[String] = None,
      // opt-in per-batch maintenance tick: (minBatches for logical
      // compaction, maxFilesPerSegment for the physical pass). Safe to run
      // every micro-batch — the tick is a free no-op on a healthy table —
      // so a long-running stream never accumulates small files or an
      // unbounded dedup window.
      maintain: Option[(Long, Int)] = None): DataFrame = {
    val spark = engine.spark
    val partClause =
      partitionByKey.fold("")(n => s"PARTITION BY KEY($tagCol) PARTITIONS $n")
    if (!engine.catalog.exists(table))
      engine.execute(
        s"""CREATE TABLE $table (
           |  bucket timestamp NOT NULL, $tagCol string TAG,
           |  n bigint, total double,
           |  timestamp KEY(bucket)) $partClause
           |ENGINE=Analytic WITH (update_mode='overwrite')""".stripMargin)

    // right-size the stateful shuffle: each state partition carries a state
    // store instance whose per-trigger checkpoint cost is fixed overhead;
    // rollup state is (windows × series), which wants far fewer partitions
    // than a data shuffle. Pinned at the stream's first run from this conf.
    StreamConf.withStatePartitions(spark, 8) {
      val q = windowAgg(spark, dir, glob, schema, nanosTs, tsCol, tagCol, valueCol,
          windowDur, Some(watermarkDelay), slide)
        .writeStream
        .trigger(Trigger.AvailableNow())
        // update mode: emit each changed window per trigger; watermark evicts
        // settled windows from state. The engine table's overwrite semantics
        // resolve multiple emissions of one window to the newest.
        .outputMode("update")
        .option("checkpointLocation",
          engine.catalog.checkpointDir(table))
        .foreachBatch { (batch: DataFrame, _: Long) =>
          engine.append(table, batch)
          maintain.foreach { case (minB, maxF) =>
            engine.runMaintenance(table, minB, maxF)
          }
        }
        .start()
      q.awaitTermination()
    }
    // project off the engine's canonical tsid column: the rollup's contract
    // is the user rollup schema, not the storage presentation
    val s = engine.catalog.get(table)
    engine.read(table).select(s.columns.map(c => org.apache.spark.sql.functions.col(c.name)): _*)
  }

  /** Streaming SKETCH rollup: each trigger appends its batch's PARTIAL
    * per-(tag, bucket) t-digest sketches to an append-mode engine table;
    * read-time [[graft.operators.QuantileRollup.quantiles]] merges them.
    * Sketch mergeability replaces streaming state entirely — no watermark,
    * no state store, no update-mode upserts: late data is just another
    * partial row, restarts replay only unprocessed files (checkpointed
    * source offsets), and any coarser window is answered at read time by
    * merging. This is the streaming analogue of the batch rollup family
    * ([[graft.operators.SketchRollup]]/QuantileRollup) and the third point
    * in the state-management design space next to [[windowedRollupToTable]]
    * (watermarked state) — the trade is approximate values for O(0) state.
    */
  def sketchRollupToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, tagCol: String, valueCol: String,
      bucketSeconds: Long, table: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val spark = engine.spark
    if (!engine.catalog.exists(table))
      engine.execute(
        s"""CREATE TABLE $table (
           |  bucket timestamp NOT NULL, $tagCol string TAG,
           |  sketch varbinary, n_rows bigint,
           |  timestamp KEY(bucket))
           |ENGINE=Analytic WITH (update_mode='append')""".stripMargin)
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob)
    val raw = maxFilesPerTrigger
      .fold(src)(n => src.option("maxFilesPerTrigger", n.toString))
      .parquet(dir)
    val events =
      if (nanosTs) graft.Tables.normalizeEventTime(raw, tsCol)
      else raw
    val q = events.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .option("checkpointLocation", engine.catalog.checkpointDir(table))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partial = graft.operators.QuantileRollup.build(
          batch, Seq(tagCol), tsCol, bucketSeconds, valueCol)
        engine.append(table, partial.select(
          col("bucket"), col(tagCol), col("sketch"), col("n_rows")))
      }
      .start()
    q.awaitTermination()
    val s = engine.catalog.get(table)
    engine.read(table).select(s.columns.map(c => col(c.name)): _*)
  }

  /** Streaming FREQUENT-ITEMS rollup: the Misra-Gries twin of
    * [[sketchRollupToTable]] — each trigger appends its batch's partial
    * per-(tag, bucket) MG summaries to an append-mode engine table;
    * read-time [[graft.operators.FreqRollup.topK]] merges them. Same
    * zero-state streaming contract (mergeability instead of a state
    * store); when `k` is at least the item universe the summaries are
    * lossless and the merged top-n is EXACT, which is what lets the
    * driver hash-check a streaming query against a plain SQL oracle. */
  def freqRollupToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, tagCol: String, itemCol: String,
      bucketSeconds: Long, k: Int, table: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val spark = engine.spark
    if (!engine.catalog.exists(table))
      engine.execute(
        s"""CREATE TABLE $table (
           |  bucket timestamp NOT NULL, $tagCol string TAG,
           |  sketch varbinary, n_rows bigint,
           |  timestamp KEY(bucket))
           |ENGINE=Analytic WITH (update_mode='append')""".stripMargin)
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob)
    val raw = maxFilesPerTrigger
      .fold(src)(n => src.option("maxFilesPerTrigger", n.toString))
      .parquet(dir)
    val events =
      if (nanosTs) graft.Tables.normalizeEventTime(raw, tsCol)
      else raw
    val q = events.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .option("checkpointLocation", engine.catalog.checkpointDir(table))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partial = graft.operators.FreqRollup.build(
          batch, Seq(tagCol), tsCol, bucketSeconds, itemCol, k)
        engine.append(table, partial.select(
          col("bucket"), col(tagCol), col("sketch"), col("n_rows")))
      }
      .start()
    q.awaitTermination()
    val s = engine.catalog.get(table)
    engine.read(table).select(s.columns.map(c => col(c.name)): _*)
  }

  /** The shared stream → windowed aggregate: per (window start, tag):
    * count + sum. The watermark (when given) is applied on the EVENT-TIME
    * column before the aggregation — that is what lets Spark evict settled
    * windows from state. Exposed so tests can drive it with a memory sink. */
  def windowAgg(
      spark: SparkSession, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, tagCol: String, valueCol: String,
      windowDur: String, watermarkDelay: Option[String] = None,
      slide: Option[String] = None): DataFrame = {
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    val events =
      if (nanosTs) graft.Tables.normalizeEventTime(raw, tsCol)
      else raw
    val marked = watermarkDelay.fold(events)(d => events.withWatermark(tsCol, d))
    // slide < duration = OVERLAPPING windows: each point contributes to
    // duration/slide windows (Spark expands map-side); state and the sink
    // key stay (window start, tag) — starts are slide-aligned, so the
    // overwrite-table upsert semantics are unchanged
    val win = slide.fold(window(col(tsCol), windowDur))(
      sl => window(col(tsCol), windowDur, sl))
    marked
      .groupBy(win.as("w"), col(tagCol))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("total"))
      .select(col("w.start").as("bucket"), col(tagCol), col("n"), col("total"))
  }
}
