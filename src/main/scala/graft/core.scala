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
  /** Columns stored as Parquet TIMESTAMP(NANOS), which Spark cannot read
    * natively: loaded as raw nanos (legacy.parquet.nanosAsLong) and converted
    * to microsecond timestamps with integral division (ns epochs exceed
    * double's 53-bit mantissa, so `div`, never `/`). DuckDB applies the same
    * floor truncation, keeping the oracle comparable. */
  private val nanosColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

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
    nsCols.foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == org.apache.spark.sql.types.LongType)
        d.withColumn(c, org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
      else d
    }
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
