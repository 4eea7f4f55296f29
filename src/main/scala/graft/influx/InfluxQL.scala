package graft.influx

import graft.engine.TsdbEngine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** InfluxQL query frontend — the subset the reference exercises
  * (query_frontend/src/influxql/planner.rs + integration test
  * cases/env/local/influxql/basic.sql): `SELECT` with field projections or
  * aggregates, tag/time predicates, `GROUP BY time(interval)[, tags]`, and
  * `SHOW MEASUREMENTS` (lowered to ShowTables, planner.rs SHOW handling).
  * The measurement column name `iox::measurement` follows the reference's
  * IOx bridge (influxql/planner.rs:49).
  *
  * Statements lower directly to DataFrame ops against engine tables — the
  * reference delegates to the vendored IOx planner; we delegate to Catalyst.
  */
object InfluxQL {

  def run(engine: TsdbEngine, q: String): DataFrame = {
    val trimmed = q.trim.stripSuffix(";").trim
    if (trimmed.toUpperCase.startsWith("SHOW MEASUREMENTS")) {
      val names = engine.catalog.list().sorted
      val spark = engine.spark
      import spark.implicits._
      names.toDF("iox::measurement")
    } else {
      val sel = parseSelect(trimmed)
      lower(engine, sel)
    }
  }

  // ------------------------------------------------------------------ AST

  final case class Projection(agg: Option[String], field: String, alias: Option[String])
  final case class Cond(lhs: String, op: String, value: String, isTime: Boolean,
      valueIsNumber: Boolean)
  final case class SelectStmt(
      projections: Seq[Projection], measurement: String,
      conds: Seq[Cond], groupTime: Option[String], groupTags: Seq[String])

  private val aggFns = Set("count", "sum", "mean", "min", "max", "first", "last")

  /** Hand-rolled parser for the supported grammar:
    * {{{
    * SELECT proj [, proj]* FROM measurement
    *   [WHERE cond [AND cond]*] [GROUP BY time(dur) [, tag]* | tag [, tag]*]
    * proj := agg(field) [AS alias] | field [AS alias] | *
    * cond := time >=|>|<=|< ts | tag =|!= 'value'
    * }}} */
  def parseSelect(q: String): SelectStmt = {
    val re = ("""(?is)^SELECT\s+(.*?)\s+FROM\s+([\w"]+)""" +
      """(?:\s+WHERE\s+(.*?))?(?:\s+GROUP\s+BY\s+(.*?))?\s*$""").r
    q match {
      case re(projs, meas, whereOpt, groupOpt) =>
        val projections = splitTop(projs).map(parseProjection)
        val conds = Option(whereOpt).map(w =>
          w.split("(?i)\\s+AND\\s+").toSeq.map(parseCond)).getOrElse(Nil)
        var groupTime: Option[String] = None
        val groupTags = Seq.newBuilder[String]
        Option(groupOpt).foreach { g =>
          splitTop(g).foreach { item =>
            val t = item.trim
            val timeRe = """(?i)time\((\w+)\)""".r
            t match {
              case timeRe(d) => groupTime = Some(d)
              case _ => groupTags += t.stripPrefix("\"").stripSuffix("\"")
            }
          }
        }
        SelectStmt(projections, meas.stripPrefix("\"").stripSuffix("\""),
          conds, groupTime, groupTags.result())
      case _ => throw new IllegalArgumentException(s"unsupported InfluxQL: $q")
    }
  }

  private def parseProjection(p: String): Projection = {
    val t = p.trim
    val aliasRe = """(?is)^(.*?)\s+AS\s+(\w+)$""".r
    val (body, alias) = t match {
      case aliasRe(b, a) => (b.trim, Some(a))
      case _             => (t, None)
    }
    val aggRe = """(?is)^(\w+)\s*\(\s*([\w"*]+)\s*\)$""".r
    body match {
      case aggRe(fn, field) if aggFns(fn.toLowerCase) =>
        Projection(Some(fn.toLowerCase),
          field.stripPrefix("\"").stripSuffix("\""), alias)
      case _ =>
        Projection(None, body.stripPrefix("\"").stripSuffix("\""), alias)
    }
  }

  private def parseCond(c: String): Cond = {
    val re = """(?s)^\s*([\w"]+)\s*(>=|<=|!=|<>|=|>|<)\s*(.*?)\s*$""".r
    c match {
      case re(lhs, op, rhs) =>
        val name = lhs.stripPrefix("\"").stripSuffix("\"")
        val isTime = name.equalsIgnoreCase("time")
        val isNum = !rhs.startsWith("'")
        Cond(name, if (op == "<>") "!=" else op,
          rhs.stripPrefix("'").stripSuffix("'"), isTime, isNum)
      case _ => throw new IllegalArgumentException(s"unsupported condition: $c")
    }
  }

  /** Split on top-level commas (not inside parens). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case ch => cur += ch
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  // ------------------------------------------------------------- lowering

  private def lower(engine: TsdbEngine, s: SelectStmt): DataFrame = {
    val schema = engine.catalog.get(s.measurement)
    val tsCol = schema.timestampKey
    var df = engine.read(s.measurement)

    s.conds.foreach { c =>
      val lhs: Column = if (c.isTime) col(tsCol) else col(c.lhs)
      val rhs: Column =
        // ns epoch literals compare at the engine's micros precision (the
        // stored resolution) — truncating to ms would misplace sub-ms bounds
        if (c.isTime && c.valueIsNumber) timestamp_micros(lit(c.value.toLong / 1000L))
        else if (c.isTime) to_timestamp(lit(c.value))
        else lit(c.value)
      df = df.filter(c.op match {
        case ">=" => lhs >= rhs
        case "<=" => lhs <= rhs
        case ">"  => lhs > rhs
        case "<"  => lhs < rhs
        case "="  => lhs === rhs
        case "!=" => lhs =!= rhs
      })
    }

    val isAgg = s.projections.exists(_.agg.isDefined)
    if (!isAgg) {
      val cols =
        if (s.projections.exists(_.field == "*")) df.columns.filterNot(_.startsWith("__"))
          .filterNot(_ == graft.model.TableSchema.TsidColumn).toSeq.map(col)
        else col(tsCol).as("time") +: s.projections.map(p =>
          col(p.field).as(p.alias.getOrElse(p.field)))
      df.select(cols: _*).orderBy(col(tsCol))
    } else {
      val keys: Seq[Column] =
        // InfluxQL buckets at UTC (the engine's time_bucket defaults to the
        // reference's +08:00 — override here)
        s.groupTime.map(d => graft.functions.TimeBucket.timeBucket(
            col(tsCol), influxDurToPeriod(d), "+00:00").as("time")).toSeq ++
        s.groupTags.map(col)
      val aggs = s.projections.collect {
        case Projection(Some(fn), field, alias) =>
          val c = fn match {
            case "count" => count(col(field))
            case "sum"   => sum(col(field))
            case "mean"  => avg(col(field))
            case "min"   => min(col(field))
            case "max"   => max(col(field))
            // value at the earliest/latest timestamp, deterministically
            // (Spark's first/last pick an arbitrary partition-order row)
            case "first" => min_by(col(field), col(tsCol))
            case "last"  => max_by(col(field), col(tsCol))
          }
          c.as(alias.getOrElse(fn))
      }
      if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** InfluxQL `time(1h)` durations → time_bucket ISO-ish periods. Weeks map
    * to 7-day epoch-aligned buckets (InfluxDB's duration semantics) — NOT
    * `P1W`, whose engine implementation reproduces the reference's quirky
    * calendar truncate_week for golden compatibility. */
  private def influxDurToPeriod(d: String): String = {
    val re = """(\d+)([smhdw])""".r
    d match {
      case re(n, "s") => s"PT${n}S"
      case re(n, "m") => s"PT${n}M"
      case re(n, "h") => s"PT${n}H"
      case re(n, "d") => s"P${n}D"
      case re(n, "w") => s"P${n.toInt * 7}D"
      case other => throw new IllegalArgumentException(s"bad duration '$other'")
    }
  }
}
