package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in graft.queries.*; this object is just the registry.
  */
object SparkEntry {

  /** Every verifiable query the engine exposes, one per implemented operator
    * from SURVEY.md §2 (plus the LLM-pipeline extensions). */
  lazy val registry: Seq[GraftQuery] =
    _root_.graft.queries.Relational.all ++
    _root_.graft.queries.TimeSeries.all ++
    _root_.graft.queries.EngineE2E.all ++
    _root_.graft.queries.PipelineQueries.all ++
    _root_.graft.queries.Prom.all ++
    _root_.graft.queries.Protocols.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.build(Tables.tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for ops whose output depends on
    * engine-private hashing (driver records a rows-only check). */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
