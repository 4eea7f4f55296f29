package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine's query surface.
  *
  * @param name   stable key; shows up in CORRECTNESS_r{N}.json / BENCH_r{N}.json
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same parquet
  *               tables (None => the driver records a weaker rows-only check —
  *               reserved for ops whose exact output depends on our private
  *               hash functions and is therefore not SQL-expressible)
  * @param build  builds the DataFrame from (session, sf-dir)
  */
final case class GraftQuery(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

/** Helpers shared by all query builders. */
object Tables {
  /** Event-time columns whose on-disk representation has varied across
    * driver fixture generations: TIMESTAMP(NANOS) (unreadable natively —
    * loaded as raw nanos via legacy.parquet.nanosAsLong and floor-divided
    * to µs; ns epochs exceed double's 53-bit mantissa, so `div`, never `/`)
    * or TIMESTAMP(MICROS) without UTC adjustment (read as TIMESTAMP_NTZ —
    * cast to the session-zoned type, a pure re-tag under the UTC session
    * the drivers run). Both normalize to TimestampType µs, which is also
    * what DuckDB's make_timestamp/epoch_* see, keeping oracles comparable. */
  private val nanosColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  /** Normalize one event-time column to session-zoned TimestampType(µs),
    * whatever the source representation (raw nanos long / NTZ µs / already
    * zoned). Shared by the batch loader and the streaming sources. */
  def normalizeEventTime(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
      case TimestampNTZType =>
        df.withColumn(c, org.apache.spark.sql.functions.col(c).cast(TimestampType))
      case _ => df
    }
  }

  /** RAW on-disk schema of a fixture file (nanos bridge enabled), for
    * callers that must declare a schema up front (readStream). */
  def rawSchema(spark: SparkSession, dir: String, name: String)
      : org.apache.spark.sql.types.StructType = {
    if (nanosColumns.getOrElse(name, Nil).nonEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet").schema
  }

  /** Load one driver-generated table (TESTDATA.md). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // time-range extraction over the nanos bridge must reach parquet stats
    if (!spark.experimental.extraOptimizations.contains(plans.NanosTimeRangePushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.NanosTimeRangePushdown
    val nsCols = nanosColumns.getOrElse(name, Nil)
    if (nsCols.nonEmpty) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nsCols.foldLeft(df)(normalizeEventTime)
  }

  /** A session tuned the way the engine wants it (AQE on, sane shuffle
    * parallelism). Callers that already hold a session just use it; these
    * settings are applied as runtime confs where legal.
    *
    * minPartitionSize: AQE coalesces shuffles by BYTES (1 MB floor by
    * default), but this engine's pipeline operators are CPU-dense per byte
    * (hashed-array merges, shingle prep) — a byte-small shuffle can still
    * be minutes of CPU. A lower floor keeps such stages parallel; at real
    * scale the byte sizes dominate and the floor is irrelevant. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    spark
  }
}
