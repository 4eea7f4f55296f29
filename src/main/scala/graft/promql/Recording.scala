package graft.promql

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, TimestampType}

import graft.engine.TsdbEngine

/** Prometheus recording rules over the PromQL frontend — the PromQL
  * counterpart of InfluxQL continuous queries: a stored expression is
  * evaluated on a grid and materialized as a NEW time series in an engine
  * table named after the rule's metric. Rules persist under
  * `<warehouse>/_rules` (one `.promql` file each, like the CQ registry),
  * so they survive engine restarts; re-running with overlapping windows
  * is idempotent through the target's overwrite update-mode (newest
  * sequence wins per (ts, labels) — exactly Prometheus re-evaluating a
  * rule over the same timestamps).
  *
  * The evaluation output contract is PromQL.eval's: label string columns,
  * one `ts` timestamp, one `value` double. The target schema is derived
  * from it (labels become TAG columns).
  */
object Recording {

  private def dir(engine: TsdbEngine) = {
    val d = Paths.get(engine.warehouse, "_rules")
    Files.createDirectories(d)
    d
  }

  /** Store (or replace) a rule: `name` is the materialized metric name. */
  def create(engine: TsdbEngine, name: String, expr: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"bad recording-rule metric name '$name'")
    PromQL.parse(expr) // validate now, not at evaluation time
    Files.write(dir(engine).resolve(s"$name.promql"),
      expr.getBytes(StandardCharsets.UTF_8))
  }

  /** Stored rules, name-sorted. */
  def list(engine: TsdbEngine): Seq[(String, String)] = {
    val d = dir(engine).toFile
    d.listFiles((_, n) => n.endsWith(".promql")).toSeq
      .map(f => f.getName.stripSuffix(".promql") ->
        new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
      .sortBy(_._1)
  }

  def drop(engine: TsdbEngine, name: String): Boolean =
    Files.deleteIfExists(dir(engine).resolve(s"$name.promql"))

  /** Evaluate every stored rule over `p`'s grid against `resolve`d source
    * tables and upsert the results into per-rule engine tables. Returns
    * (rule, rows materialized). */
  def runRules(
      engine: TsdbEngine, resolve: String => PromQL.SeriesTable,
      p: EvalParams): Seq[(String, Long)] =
    list(engine).map { case (name, expr) =>
      name -> materialize(engine, name, expr, resolve, p)
    }

  private def materialize(
      engine: TsdbEngine, name: String, expr: String,
      resolve: String => PromQL.SeriesTable, p: EvalParams): Long = {
    val out = PromQL.eval(engine.spark, resolve, expr, p)
    val fields = out.schema.fields
    require(fields.exists(f => f.name == "ts" && f.dataType == TimestampType) &&
      fields.exists(f => f.name == "value" && f.dataType == DoubleType),
      s"rule '$name' output is not a (labels, ts, value) series: ${out.schema}")
    val labels = fields.collect {
      case f if f.dataType == StringType => f.name }
    if (!engine.catalog.exists(name)) {
      val tagDdl = labels.map(l => s"`$l` string TAG, ").mkString
      engine.execute(
        s"""CREATE TABLE `$name` (
           |  ts timestamp NOT NULL, ${tagDdl}value double,
           |  timestamp KEY(ts))
           |ENGINE=Analytic WITH (update_mode='overwrite')""".stripMargin)
    }
    val rows = out.filter(col("value").isNotNull)
      .select((labels.map(col) :+ col("ts") :+ col("value")): _*)
    engine.append(name, rows)
    rows.count()
  }
}
