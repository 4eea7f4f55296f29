package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface registration of the engine's custom functions, replacing the
  * reference's FunctionRegistry (df_operator/src/registry.rs):
  *
  *  - `time_bucket(ts, 'PT5M' [, '+08:00'])` — custom Catalyst expression
  *    (reference df_operator/src/udfs/time_bucket.rs)
  *  - `thetasketch_distinct(col)` — HLL distinct count at the reference's
  *    0.01 error rate (df_operator/src/udfs/thetasketch_distinct.rs:59-80),
  *    backed by Spark's native HyperLogLogPlusPlus aggregate
  */
object GraftFunctions {

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def timeBucketBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(ts, period) =>
      TimeBucket(ts, strArg(period, "time_bucket period"))
    case Seq(ts, period, tz) =>
      TimeBucket(ts, strArg(period, "time_bucket period"),
        TimePeriod.parseOffsetMinutes(strArg(tz, "time_bucket timezone")))
    case other => throw new IllegalArgumentException(
      s"time_bucket takes (ts, period [, tz]), got ${other.length} args")
  }

  private def thetaBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(child) => HyperLogLogPlusPlus(child, 0.01)
    case other => throw new IllegalArgumentException(
      s"thetasketch_distinct takes 1 arg, got ${other.length}")
  }

  private def wrapBuilder(op: String)(args: Seq[Expression]): Expression =
    args match {
      case Seq(a, b) => WrapArith(a, b, op)
      case other => throw new IllegalArgumentException(
        s"u64_$op takes 2 args, got ${other.length}")
    }

  /** Register on an existing session (the engine does this on startup). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("time_bucket", timeBucketBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("thetasketch_distinct", thetaBuilder, "scala_udf")
    // uint64 wraparound arithmetic (reference aggregate.sql u64 underflow)
    Seq("add", "sub", "mul").foreach(op =>
      reg.createOrReplaceTempFunction(s"u64_$op", wrapBuilder(op), "scala_udf"))
    // reference surface name (DataFusion approx_percentile_cont,
    // partition_table.sql golden). We compute the exact interpolated
    // percentile — COVERAGE.md documents the value deviation vs the
    // t-digest approximation (golden 109.4 vs exact 109.0 on 11 rows).
    reg.createOrReplaceTempFunction("approx_percentile_cont", {
      case Seq(c, q) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.Percentile(c, q)
      case other => throw new IllegalArgumentException(
        s"approx_percentile_cont takes (col, q), got ${other.length} args")
    }, "scala_udf")
    // mergeable quantile sketches (rollup form of approx_percentile_cont)
    reg.createOrReplaceTempFunction("tdigest_agg", {
      case Seq(c) => TDigestAgg(c, 100.0)
      case Seq(c, Literal(comp, _)) =>
        TDigestAgg(c, comp.toString.toDouble)
      case other => throw new IllegalArgumentException(
        s"tdigest_agg takes (col [, compression]), got ${other.length} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("tdigest_merge", {
      case Seq(c) => TDigestMergeAgg(c)
      case other => throw new IllegalArgumentException(
        s"tdigest_merge takes 1 arg, got ${other.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("tdigest_quantile", {
      case Seq(c, q) => TDigestQuantile(c, q)
      case other => throw new IllegalArgumentException(
        s"tdigest_quantile takes (sketch, q), got ${other.length} args")
    }, "scala_udf")
    // mergeable frequent-items summaries (Misra-Gries)
    reg.createOrReplaceTempFunction("mg_agg", {
      case Seq(c, Literal(k, _)) => MisraGriesAgg(c, k.toString.toInt)
      case other => throw new IllegalArgumentException(
        s"mg_agg takes (col, k), got ${other.length} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("mg_merge", {
      case Seq(c) => MisraGriesMergeAgg(c)
      case other => throw new IllegalArgumentException(
        s"mg_merge takes 1 arg, got ${other.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("mg_topk", {
      case Seq(c, Literal(n, _)) => MisraGriesTopK(c, n.toString.toInt)
      case other => throw new IllegalArgumentException(
        s"mg_topk takes (summary, n), got ${other.length} args")
    }, "scala_udf")
    // theta sketches: the set-operation distinct family (A∩B / A∖B)
    reg.createOrReplaceTempFunction("theta_agg", {
      case Seq(c) => ThetaAgg(c, 12)
      case Seq(c, Literal(k, _)) => ThetaAgg(c, k.toString.toInt)
      case other => throw new IllegalArgumentException(
        s"theta_agg takes (col [, lgK]), got ${other.length} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_merge", {
      case Seq(c) => ThetaMergeAgg(c, 12)
      case Seq(c, Literal(k, _)) => ThetaMergeAgg(c, k.toString.toInt)
      case other => throw new IllegalArgumentException(
        s"theta_merge takes (sketch [, lgK]), got ${other.length} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_estimate", {
      case Seq(c) => ThetaEstimate(c)
      case other => throw new IllegalArgumentException(
        s"theta_estimate takes 1 arg, got ${other.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_intersect_est", {
      case Seq(a, b) => ThetaIntersectEst(a, b)
      case other => throw new IllegalArgumentException(
        s"theta_intersect_est takes 2 args, got ${other.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_union_est", {
      case Seq(a, b) => ThetaUnionEst(a, b)
      case other => throw new IllegalArgumentException(
        s"theta_union_est takes 2 args, got ${other.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_anotb_est", {
      case Seq(a, b) => ThetaANotBEst(a, b)
      case other => throw new IllegalArgumentException(
        s"theta_anotb_est takes 2 args, got ${other.length}")
    }, "scala_udf")
    // DataFusion built-in the reference goldens exercise (date_bin.sql)
    reg.createOrReplaceTempFunction("date_bin", {
      case Seq(iv, ts, origin) => DateBin(iv, ts, origin)
      case other => throw new IllegalArgumentException(
        s"date_bin takes (interval, ts, origin), got ${other.length} args")
    }, "scala_udf")
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` wiring for
  * sessions that want the functions injected at build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("time_bucket"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TimeBucket].getName, "time_bucket"),
      (args: Seq[Expression]) => args match {
        case Seq(ts, Literal(p: UTF8String, _)) => TimeBucket(ts, p.toString)
        case Seq(ts, Literal(p: UTF8String, _), Literal(tz: UTF8String, _)) =>
          TimeBucket(ts, p.toString, TimePeriod.parseOffsetMinutes(tz.toString))
        case other => throw new IllegalArgumentException(s"bad time_bucket args: $other")
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("thetasketch_distinct"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HyperLogLogPlusPlus].getName, "thetasketch_distinct"),
      (args: Seq[Expression]) => HyperLogLogPlusPlus(args.head, 0.01)))
  }
}
