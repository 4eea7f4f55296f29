package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.apache.spark.sql.types.StructType

/** Watermark audit — validate a watermark choice against the actual
  * arrival order BEFORE trusting the rollups it gates: replay an
  * arrival-ordered stream through a watermarked windowed aggregation and
  * report, per micro-batch, how many input rows the watermark silently
  * dropped (`numRowsDroppedByWatermark`) and how much state it kept.
  * The numbers to sanity-check against [[graft.operators.SeriesStats
  * .latenessReport]]: a watermark shorter than the observed max lateness
  * shows up here as nonzero drops.
  *
  * Batching is made deterministic by the caller: one parquet file per
  * intended micro-batch, strictly increasing modification times
  * ([[stageArrivalFiles]]), `maxFilesPerTrigger=1` — the file source then
  * replays files oldest-first, one per trigger, so drop counts are a
  * property of the data, not of scheduling.
  *
  * Metrics come from the engine's own `StreamingQueryProgress` (the same
  * numbers a production monitor scrapes), collected by a per-run
  * listener; the aggregation itself runs at full parallelism into a noop
  * sink — the audit adds no work beyond the rollup being validated. */
object WatermarkAudit {

  /** Stage `df` into `nBatches` arrival-ordered parquet files under
    * `dir` (one file per batch, contiguous ranges of `arrivalCol`,
    * strictly increasing mtimes). Returns the directory. */
  def stageArrivalFiles(
      df: DataFrame, arrivalCol: String, nBatches: Int, dir: String): String = {
    val spark = df.sparkSession
    // pin once: the quantile pass + one filtered write per batch would
    // otherwise each recompute the full upstream lineage (nBatches+1 scans)
    val pinned = df.localCheckpoint()
    val bounds = pinned.stat.approxQuantile(
      arrivalCol, (1 to (nBatches - 1)).map(_.toDouble / nBatches).toArray, 0.0)
    val edges = (Double.NegativeInfinity +: bounds.toSeq :+ Double.PositiveInfinity)
      .sliding(2).map(w => (w.head, w.last)).toSeq
    // Hadoop FS API throughout (like Sharding.deleteRewrite), so the
    // staging works wherever Spark can write — local, HDFS, or any store
    // whose connector supports setTimes (object stores that ignore mtime
    // can't host a mtime-ordered file source replay in the first place)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ONE partitioned write stages every batch (guide §2.4: the previous
    // shape ran one filter+coalesce(1) write job PER batch — nBatches
    // full passes over the pinned frame): each row gets its batch number
    // from the quantile edges, repartition(nBatches, __b) puts a batch's
    // rows in exactly one task, so every __b directory holds exactly one
    // parquet file, which is then renamed/mtime-stamped into replay order
    // exactly as before. An EMPTY batch (duplicate quantile bounds)
    // produces no __b directory; it is back-filled with an explicit empty
    // write so the staged file COUNT — and therefore the replayed
    // batch_id numbering — is unchanged.
    val bCol = edges.zipWithIndex.foldLeft(lit(0)) { case (acc, ((lo, hi), i)) =>
      when(col(arrivalCol) > lo && col(arrivalCol) <= hi, lit(i)).otherwise(acc)
    }
    // NULL/NaN arrivalCol rows match NO interval (every comparison yields
    // null/false) and the fold's lit(0) default would land them in batch 0;
    // the previous per-batch filtered writes silently dropped them — keep
    // that semantics by excluding them before staging
    pinned.filter(col(arrivalCol).isNotNull && !isnan(col(arrivalCol)))
      .withColumn("__b", bCol)
      .repartition(edges.size, col("__b"))
      .write.mode("overwrite").partitionBy("__b").parquet(s"$dir/staging")
    edges.indices.foreach { i =>
      val bdir = new org.apache.hadoop.fs.Path(s"$dir/staging/__b=$i")
      if (!fs.exists(bdir))
        pinned.limit(0).drop("__b").coalesce(1)
          .write.mode("overwrite").parquet(bdir.toString)
      fs.listStatus(bdir)
        .filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
          val dst = new org.apache.hadoop.fs.Path(dir, f"part$i%03d.parquet")
          fs.delete(dst, false)
          fs.rename(st.getPath, dst)
          fs.setTimes(dst, 1600000000000L + i * 60000L, -1)
        }
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/staging"), true)
    dir
  }

  /** Run the audit: watermarked tumbling-window count over the staged
    * files, one file per micro-batch. Returns, per data-carrying batch:
    *
    *   - `late_rows`: rows arriving BELOW the operative watermark
    *     (running max event time of prior batches − delay), derived from
    *     the staged data itself — the authoritative audit number, since
    *     Spark only GUARANTEES dropping is possible past the watermark;
    *   - `engine_dropped`: the engine's own
    *     `numRowsDroppedByWatermark`, a best-effort window-granular
    *     counter (late rows landing in a still-resident window are
    *     merged, not counted — observed and spec'd);
    *   - `input_rows` / `state_rows` from the progress events.
    *
    * `statePartitions` (0 = leave the session setting) pins the stream's
    * shuffle-partition count, which for a stateful query is also the
    * state-store instance count — PER BATCH each instance pays a store
    * load/commit round-trip, so the right size tracks STATE cardinality
    * (windows × tags, bounded), not input rows: partial aggregation
    * collapses the input map-side, the shuffle carries only per-group
    * partials. At 32 session partitions × 4 batches the machinery was
    * 2× the whole query's work (SCALING §8.21); 4 instances fit the
    * ~1k-group state with room to thousands. The override lives in a
    * cloned session (shared SparkContext, isolated SQL conf), so the
    * caller's session conf is never mutated — safe under concurrent
    * audits or concurrent queries on the same session. */
  def audit(
      spark: SparkSession, stagedDir: String, schema: StructType,
      tsCol: String, tagCol: String, delaySeconds: Long,
      windowSeconds: Int, statePartitions: Int = 0): DataFrame = {
    import spark.implicits._
    // every event is captured tagged with its runId and filtered AFTER the
    // query's runId is known — accepting events while runId is unassigned
    // would record any concurrently-running stream's progress too
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      (java.util.UUID, Long, Long, Long, Long)]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
        val stateRows = p.stateOperators.map(_.numRowsTotal).sum
        progress.add((p.runId, p.batchId, p.numInputRows, dropped, stateRows))
      }
    }
    // The statePartitions override is scoped to a CLONED session (shared
    // SparkContext, isolated SQL conf): mutating the caller session's
    // spark.sql.shuffle.partitions and restoring it was safe for the
    // sequential battery but not under concurrent audits / concurrent
    // queries on the same session — a second caller could snapshot and
    // restore the overridden value. The clone inherits the parent's
    // runtime conf (copied key-by-key; non-settable keys skipped) so
    // tuned session options still apply to the stream.
    val streamSession =
      if (statePartitions == 0) spark
      else {
        val c = spark.newSession()
        spark.conf.getAll.foreach { case (k, v) =>
          try c.conf.set(k, v) catch { case _: Exception => () }
        }
        c.conf.set("spark.sql.shuffle.partitions", statePartitions)
        c
      }
    streamSession.streams.addListener(listener)
    try {
      val q = streamSession.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$stagedDir/*.parquet")
        .withWatermark(tsCol, s"$delaySeconds seconds")
        .groupBy(window(col(tsCol), s"$windowSeconds seconds"), col(tagCol))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("append").format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      val thisRun = q.runId
      q.awaitTermination()
      // listener delivery is async: drain until the bus settles
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline && progress.size != last) {
        last = progress.size
        Thread.sleep(200)
      }
      // data-derived lateness per staged batch: replay the watermark
      // recurrence over the files in their replay order (name == mtime
      // order) in TWO jobs instead of one per file — job 1 collects the
      // per-file max event time (O(nBatches) rows on the driver, audit
      // tooling), the recurrence itself is driver arithmetic, job 2
      // counts each file's rows below ITS operative watermark through a
      // literal file→threshold map in one pass. An EMPTY staged file
      // (duplicate quantile bounds) has no rows, so it is absent from
      // both groupings — same skip the engine's progress filter applies
      // — and leaves runMax untouched (no data, no watermark movement).
      val fname = regexp_extract(input_file_name(), "([^/]+)$", 1)
      val us = unix_micros(col(tsCol))
      // null event times drop out up front: they moved no watermark and
      // counted as 0 late in the old per-file loop (max() skipped them,
      // null < wm is null), and an ALL-null file must vanish from both
      // groupings the way the old `isNullAt(0)` skip made it vanish —
      // without this filter its null max would NPE the recurrence
      val staged = spark.read.schema(schema).parquet(s"$stagedDir/*.parquet")
        .filter(us.isNotNull)
      val maxByFile = staged
        .groupBy(fname.as("__f")).agg(max(us).as("__mx"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      var runMax = Long.MinValue
      val wmByFile = maxByFile.keys.toSeq.sorted.map { f =>
        val wm = if (runMax == Long.MinValue) Long.MinValue
                 else runMax - delaySeconds * 1000000L
        runMax = math.max(runMax, maxByFile(f))
        f -> wm
      }
      val wmMap = map(wmByFile.flatMap { case (f, wm) =>
        Seq(lit(f), lit(wm)) }: _*)
      val lateRows = staged
        .groupBy(fname.as("__f"))
        .agg(sum(when(us < element_at(wmMap, fname), 1L)
          .otherwise(0L)).as("__late"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        .toSeq.sortBy(_._1).map(_._2)
      import scala.jdk.CollectionConverters._
      progress.asScala.toSeq
        .filter(p => p._1 == thisRun && p._3 > 0)
        .map(p => (p._2, p._3, p._4, p._5)).sortBy(_._1).zipWithIndex
        .map { case ((b, in, drop, st), i) =>
          (b, in, if (i < lateRows.length) lateRows(i) else 0L, drop, st) }
        .toDF("batch_id", "input_rows", "late_rows", "engine_dropped",
          "state_rows")
    } finally {
      streamSession.streams.removeListener(listener)
    }
  }
}
