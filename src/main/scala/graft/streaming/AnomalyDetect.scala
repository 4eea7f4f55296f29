package graft.streaming

import graft.engine.TsdbEngine
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming per-series anomaly detection over exponentially-weighted
  * moving statistics — the online cousin of [[graft.operators.SeriesStats]]'
  * batch detectors (MAD outliers, mean-shift changepoints) and the alerting
  * shape Kapacitor/Prometheus deployments bolt onto the reference's ingest
  * path (SURVEY §2.9: HoraeDB itself has no streaming operators; stateful
  * detection over the ingest stream is the Structured Streaming upgrade).
  *
  * The detector: each series carries (n, ewma, ewmvar); an arriving sample
  * x is flagged when `|x − ewma| > k·sqrt(ewmvar)` against the statistics
  * BEFORE x is folded in (so an anomaly cannot mask itself), after a
  * warm-up of `warm` samples. Updates follow the standard EW recurrences
  * (West 1979 form):
  *
  *   d     = x − mean
  *   mean' = mean + α·d
  *   var'  = (1−α)·(var + α·d²)
  *
  * Determinism contract: the recurrence is an order-fixed chain of IEEE
  * double ops (operand order mirrored verbatim by the q213 oracle's
  * recursive CTE, the q210 Holt convention), α and k are exact binary
  * fractions, and the emitted deviation is presented as a floor-scaled
  * integer — bit-identical across engines and replays.
  *
  * 100 TB posture: state is three numbers per LIVE series (bounded by
  * series cardinality, never stream length), idle series are evicted by
  * processing-time timeout, emission is append-mode and sparse (anomalies
  * only — the common case writes nothing), and the only shuffle is the
  * hash-by-series `groupByKey` every stateful per-series operator pays.
  */
object AnomalyDetect {

  final case class SampleIn(series: String, tsUs: Long, value: Double)
  final case class EwmState(n: Long, mean: Double, variance: Double)
  final case class Anomaly(series: String, tsUs: Long, value: Double, dev1e4: Long)

  /** Per-group transition: sort the micro-batch's samples by (time, value)
    * — the [[SeriesRate]] ordering — chain them onto the carried state,
    * flag against pre-update statistics, fold each sample in. */
  def transition(alpha: Double, k: Double, warm: Int, idleTimeout: Option[String])(
      series: String, it: Iterator[SampleIn],
      state: GroupState[EwmState]): Iterator[Anomaly] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = it.toArray.sortBy(s => (s.tsUs, s.value))
      val out = Seq.newBuilder[Anomaly]
      var st = state.getOption.orNull
      sorted.foreach { s =>
        if (st == null) st = EwmState(1L, s.value, 0.0)
        else {
          if (st.n >= warm &&
              math.abs(s.value - st.mean) > k * math.sqrt(st.variance))
            out += Anomaly(series, s.tsUs, s.value,
              math.floor((s.value - st.mean) * 10000).toLong)
          val d = s.value - st.mean
          st = EwmState(st.n + 1, st.mean + alpha * d,
            (1.0 - alpha) * (st.variance + alpha * d * d))
        }
      }
      if (st != null) state.update(st)
      idleTimeout.foreach(state.setTimeoutDuration)
      out.result().iterator
    }
  }

  /** Wire a sample stream through the stateful detector.
    *
    * @param idleTimeout Some(d): evict series idle for d (long-running
    *                    deployments). None: required for finite
    *                    AvailableNow replays (see [[SeriesRate.rateStream]]). */
  def anomalyStream(
      samples: Dataset[SampleIn], alpha: Double, k: Double, warm: Int,
      idleTimeout: Option[String]): Dataset[Anomaly] = {
    import samples.sparkSession.implicits._
    val mode = idleTimeout.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    samples
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, mode)(
        transition(alpha, k, warm, idleTimeout))
  }

  /** Replay a parquet-backed stream through the detector into an engine
    * table (the [[SeriesRate.rateToTable]] materialization shape); returns
    * the table read. */
  def anomaliesToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      tsCol: String, seriesCol: String, valueCol: String,
      alpha: Double, k: Double, warm: Int, table: String): DataFrame = {
    val spark = engine.spark
    import spark.implicits._
    if (!engine.catalog.exists(table))
      engine.execute(
        s"""CREATE TABLE $table (
           |  ts timestamp NOT NULL, series string TAG,
           |  value_milli bigint, dev_1e4 bigint,
           |  timestamp KEY(ts))
           |ENGINE=Analytic WITH (update_mode='append')""".stripMargin)

    val raw0 = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    val raw = graft.Tables.normalizeEventTime(raw0, tsCol)
    val samples = raw.select(
        col(seriesCol).cast("string").as("series"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(valueCol).cast("double").as("value"))
      .as[SampleIn]

    StreamConf.withStatePartitions(spark, 8) {
      val q = anomalyStream(samples, alpha, k, warm, idleTimeout = None)
        .select(expr("timestamp_micros(tsUs)").as("ts"), col("series"),
          round(col("value") * 1000, 0).cast("long").as("value_milli"),
          col("dev1e4").as("dev_1e4"))
        .writeStream
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
