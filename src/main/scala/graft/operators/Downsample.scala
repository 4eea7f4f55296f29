package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Visualization-grade time-series downsampling. M4 (Jugel et al., VLDB
  * 2014) keeps, per (series, time bucket), the four value extremes a
  * pixel-perfect line rendering needs: first, last, min, and max. It is the
  * standard server-side reduction for "plot a month of a metric" queries —
  * the reference serves the same dashboards through its `time_bucket` +
  * first/last aggregates (df_operator/src/udfs/time_bucket.rs); M4 is that
  * pattern with the error bound made explicit.
  *
  * 100 TB posture: a single hash aggregation on (series, bucket) with full
  * map-side partial aggregation — min/max/min_by/max_by all combine
  * associatively, so each task emits at most one row per (series, bucket)
  * into the shuffle regardless of input volume. Output cardinality is
  * |series| x |buckets|, independent of row count.
  */
object Downsample {

  /** M4 per `seriesCol` per `bucketSeconds`-wide epoch-aligned bucket:
    * (series, bucket_ts, n, v_min, v_max, v_first, v_last). Requires ts
    * uniqueness per series (the engine's dedup-on-read tables guarantee it;
    * `min_by`/`max_by` would otherwise tie-break nondeterministically). */
  def m4(
      df: DataFrame, seriesCol: String, tsCol: String, valueCol: String,
      bucketSeconds: Long): DataFrame = {
    val bucketUs = bucketSeconds * 1000000L
    df.groupBy(col(seriesCol),
        timestamp_micros(floor(unix_micros(col(tsCol)) / bucketUs)
          .cast("long") * bucketUs).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        min_by(col(valueCol), col(tsCol)).as("v_first"),
        max_by(col(valueCol), col(tsCol)).as("v_last"))
  }

  /** Per-point-index equal-count bucket id for the triangle downsamplers:
    * first and last point get their own buckets (always kept), interior
    * points map onto `nOut - 2` equal-count buckets. Exact integer
    * arithmetic (replayable in SQL as `((i-2) * (nOut-2)) // (N-2)`). */
  private def bucketId(i: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column, nOut: Int): org.apache.spark.sql.Column =
    when(i === 1, lit(0L))
      .when(i === n, lit(nOut - 1L))
      .otherwise(lit(1L) + floor(((i - 2).cast("double") * (nOut - 2)) /
        (n - 2).cast("double")).cast("long"))

  /** Largest-Triangle-One-Bucket downsampling (Steinarsson 2013 §4.1):
    * keep first + last, and per equal-count bucket the point whose triangle
    * with its immediate neighbors has the largest area ("local
    * significance"). Unlike LTTB there is no sequential dependency, so the
    * whole operator is declarative: one series shuffle, lag/lead + a
    * per-bucket top-1 that Spark rewrites to WindowGroupLimit. Series with
    * <= nOut points pass through untouched. */
  def ltob(
      df: DataFrame, seriesCol: String, tsCol: String, valueCol: String,
      nOut: Int): DataFrame = {
    require(nOut >= 3, "ltob needs nOut >= 3")
    val byS = Window.partitionBy(seriesCol)
    val ord = byS.orderBy(col(tsCol))
    val x = col("__x"); val y = col("__y")
    val xp = lag(x, 1).over(ord); val yp = lag(y, 1).over(ord)
    val xn = lead(x, 1).over(ord); val yn = lead(y, 1).over(ord)
    df.select(col(seriesCol), col(tsCol), col(valueCol))
      .withColumn("__x", unix_micros(col(tsCol)).cast("double"))
      .withColumn("__y", col(valueCol).cast("double"))
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__n", count(lit(1)).over(byS))
      .withColumn("__area",
        abs((xp - xn) * (y - yp) - (xp - x) * (yn - yp)))
      .withColumn("__b", bucketId(col("__i"), col("__n"), nOut))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(seriesCol), col("__b"))
          .orderBy(col("__area").desc_nulls_last, col(tsCol))))
      .filter(col("__n") <= nOut ||
        col("__i") === 1 || col("__i") === col("__n") || col("__rk") === 1)
      .select(col(seriesCol), col(tsCol), col(valueCol))
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 §4.2):
    * greedy left-to-right bucket selection maximizing the triangle area
    * between the PREVIOUSLY SELECTED point, the candidate, and the NEXT
    * bucket's centroid. The recurrence is inherently sequential per series,
    * so it runs as a per-partition streaming kernel (the TaStream pattern,
    * functions/TaStream.scala): repartition(series) + sortWithinPartitions,
    * then a two-bucket-lookahead state machine with O(bucket) memory — a
    * series of any length streams through the spillable sort and never
    * materializes as an array. */
  def lttb(
      df: DataFrame, seriesCol: String, tsCol: String, valueCol: String,
      nOut: Int): DataFrame = {
    require(nOut >= 3, "lttb needs nOut >= 3")
    val byS = Window.partitionBy(seriesCol)
    val ord = byS.orderBy(col(tsCol))
    val prepped = df
      .select(col(seriesCol), col(tsCol), col(valueCol))
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__n", count(lit(1)).over(byS))
    // WindowExec leaves rows sorted by (series, ts) within each partition,
    // with each series contiguous — exactly what the kernel needs.
    val outSchema = StructType(prepped.schema.fields.take(3))
    prepped.mapPartitions(rows => lttbKernel(rows, nOut))(Encoders.row(outSchema))
  }

  /** Streaming LTTB over (series, ts, value, i, n) rows sorted by
    * (series, ts). Holds: the previously selected point, the bucket
    * currently awaiting selection, and the bucket still filling (whose
    * centroid anchors the pending selection) — never more. */
  private def lttbKernel(rows: Iterator[Row], nOut: Int): Iterator[Row] = {
    val out = new scala.collection.mutable.Queue[Row]
    // state for the series currently being consumed
    var curKey: Any = null
    var started = false
    var n = 0L
    var passThrough = false
    var prevSel: (Double, Double) = (0.0, 0.0)
    var pending = Vector.empty[(Row, Double, Double)]  // bucket awaiting selection
    var filling = Vector.empty[(Row, Double, Double)]  // bucket accumulating
    var fillingBucket = -1L
    var lastRow: Row = null

    def xy(r: Row): (Double, Double) = {
      val t = r.getTimestamp(1)
      val us = (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
      (us.toDouble, r.getDouble(2))
    }

    def emit(r: Row): Unit = out += Row(r.get(0), r.get(1), r.get(2))

    def selectPending(anchor: (Double, Double)): Unit = {
      var best = 0; var bestArea = Double.NegativeInfinity
      var j = 0
      while (j < pending.length) {
        val (_, bx, by) = pending(j)
        val area = math.abs((prevSel._1 - anchor._1) * (by - prevSel._2) -
          (prevSel._1 - bx) * (anchor._2 - prevSel._2))
        if (area > bestArea) { bestArea = area; best = j } // ties: earlier ts
        j += 1
      }
      val (row, bx, by) = pending(best)
      emit(row)
      prevSel = (bx, by)
      pending = Vector.empty
    }

    def centroid(pts: Vector[(Row, Double, Double)]): (Double, Double) = {
      var sx = 0.0; var sy = 0.0; var i = 0
      while (i < pts.length) { sx += pts(i)._2; sy += pts(i)._3; i += 1 }
      (sx / pts.length, sy / pts.length)
    }

    def bucketOf(i: Long): Long =
      1L + math.floor(((i - 2).toDouble * (nOut - 2)) / (n - 2).toDouble).toLong

    def finishSeries(): Unit = {
      if (started && !passThrough && lastRow != null) {
        // a pending bucket anchors on the still-filling bucket's centroid;
        // the final middle bucket anchors on the last point itself
        if (pending.nonEmpty && filling.nonEmpty) selectPending(centroid(filling))
        if (filling.nonEmpty) { pending = filling; filling = Vector.empty }
        if (pending.nonEmpty) selectPending(xy(lastRow))
        emit(lastRow)
      }
      started = false; lastRow = null
      pending = Vector.empty; filling = Vector.empty; fillingBucket = -1L
    }

    def consume(r: Row): Unit = {
      val key = r.get(0)
      if (!started || key != curKey) {
        finishSeries()
        curKey = key; started = true
        n = r.getLong(4)
        passThrough = n <= nOut
      }
      val i = r.getLong(3)
      if (passThrough) emit(r)
      else if (i == 1L) { emit(r); prevSel = xy(r) }
      else if (i == n) lastRow = r
      else {
        val b = bucketOf(i)
        val (px, py) = xy(r)
        if (fillingBucket == -1L) fillingBucket = b
        if (b == fillingBucket) filling :+= ((r, px, py))
        else {
          // fillingBucket is complete: its centroid anchors the pending
          // bucket's selection, then it becomes the pending bucket itself
          if (pending.nonEmpty) selectPending(centroid(filling))
          pending = filling
          filling = Vector((r, px, py)); fillingBucket = b
        }
      }
    }

    new Iterator[Row] {
      private var drained = false
      private def pump(): Unit = {
        while (out.isEmpty && rows.hasNext) consume(rows.next())
        if (out.isEmpty && !rows.hasNext && !drained) {
          finishSeries(); drained = true
        }
      }
      def hasNext: Boolean = { pump(); out.nonEmpty }
      def next(): Row = { pump(); out.dequeue() }
    }
  }
}
