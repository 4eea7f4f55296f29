package graft.streaming

import graft.engine.TsdbEngine
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Custom per-series streaming state via `flatMapGroupsWithState` — the
  * stateful surface beyond windowed aggregation (SURVEY §2.9 maps the
  * reference's per-series operators onto KeyValueGroupedDataset state).
  *
  * The operator: continuous instantaneous gauge rate. Each series keeps
  * exactly its LAST sample as state; every arriving sample emits
  * `(Δvalue / Δseconds)` against it — PromQL `idelta`-over-`Δt` semantics
  * for gauges, the streaming analogue of [[graft.promql.PromAlign.lastTwo]]
  * (no counter-reset correction: gauge operator by contract).
  *
  * 100 TB posture: state is ONE sample per live series (bounded by series
  * cardinality, never stream length), idle series are evicted by
  * processing-time timeout, emission is append-mode (each input produces at
  * most one output, nothing replays), and the shuffle is the same
  * hash-by-series the reference's PromAlign repartition does.
  */
object SeriesRate {

  final case class SampleIn(series: String, tsUs: Long, value: Double)
  final case class LastSample(tsUs: Long, value: Double)
  final case class RatePoint(series: String, tsUs: Long, rate: Double)

  /** Per-group transition: sort the micro-batch's samples by time, chain
    * them onto the carried last sample, emit one rate per consecutive pair,
    * keep the newest sample as the next state. */
  def transition(idleTimeout: Option[String])(
      series: String, it: Iterator[SampleIn],
      state: GroupState[LastSample]): Iterator[RatePoint] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = it.toArray.sortBy(s => (s.tsUs, s.value))
      val out = Seq.newBuilder[RatePoint]
      var prev = state.getOption
      sorted.foreach { s =>
        prev.foreach { p =>
          val dtUs = s.tsUs - p.tsUs
          if (dtUs > 0)
            out += RatePoint(series, s.tsUs, (s.value - p.value) / (dtUs / 1e6))
        }
        prev = Some(LastSample(s.tsUs, s.value))
      }
      prev.foreach(state.update)
      idleTimeout.foreach(state.setTimeoutDuration)
      out.result().iterator
    }
  }

  /** Wire a sample stream through the stateful rate into per-series output
    * columns (series, ts, rate).
    *
    * @param idleTimeout Some(d): evict series idle for d (long-running
    *                    deployments — state stays bounded by LIVE series).
    *                    None: no timeout — required for finite AvailableNow
    *                    replays, where processing-time timeouts keep the
    *                    engine scheduling no-data batches past the data. */
  def rateStream(
      samples: Dataset[SampleIn], idleTimeout: Option[String]): Dataset[RatePoint] = {
    import samples.sparkSession.implicits._
    val mode = idleTimeout.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    samples
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, mode)(transition(idleTimeout))
  }

  /** Replay a parquet-backed stream through the stateful rate into an
    * engine table (same materialization shape as [[Rollup]]): returns the
    * table read. */
  def rateToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, seriesCol: String, valueCol: String,
      table: String): DataFrame = {
    val spark = engine.spark
    import spark.implicits._
    if (!engine.catalog.exists(table))
      engine.execute(
        s"""CREATE TABLE $table (
           |  ts timestamp NOT NULL, series string TAG, rate double,
           |  timestamp KEY(ts))
           |ENGINE=Analytic WITH (update_mode='append')""".stripMargin)

    val raw0 = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    // normalize first (raw-nanos long / NTZ µs / zoned all → TimestampType):
    // unix_micros on the normalized column is the same integral µs the old
    // `div 1000` nanos bridge produced — no float drift on either path
    val raw = if (nanosTs) graft.Tables.normalizeEventTime(raw0, tsCol) else raw0
    val tsUs = unix_micros(col(tsCol))
    val samples = raw.select(
        col(seriesCol).cast("string").as("series"),
        tsUs.as("tsUs"),
        col(valueCol).cast("double").as("value"))
      .as[SampleIn]

    StreamConf.withStatePartitions(spark, 8) {
      // finite replay: no idle timeout (see rateStream scaladoc)
      val q = rateStream(samples, idleTimeout = None)
        .select(expr("timestamp_micros(tsUs)").as("ts"),
          col("series"), col("rate"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation",
          engine.catalog.checkpointDir(table))
        .foreachBatch { (batch: DataFrame, _: Long) => engine.append(table, batch) }
        .start()
      q.awaitTermination()
    }
    // project off the engine's canonical tsid column (user schema contract)
    val s = engine.catalog.get(table)
    engine.read(table).select(s.columns.map(c => col(c.name)): _*)
  }
}
