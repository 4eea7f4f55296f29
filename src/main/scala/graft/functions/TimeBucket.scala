package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, TimestampType}

/** Period grammar of the reference's `time_bucket` UDF
  * (reference: df_operator/src/udfs/time_bucket.rs:226-250): only
  * `PT{n}S`, `PT{n}M`, `PT{n}H`, `P{n}D`, `P1W`, `P1M`, `P1Y`.
  */
object TimePeriod {
  // unit codes kept as plain ints so codegen can pass them as literals
  final val SECOND = 0
  final val MINUTE = 1
  final val HOUR = 2
  final val DAY = 3
  final val WEEK = 4
  final val MONTH = 5
  final val YEAR = 6

  private val Pt = """(?i)PT(\d+)([SMH])""".r
  private val Pd = """(?i)P(\d+)D""".r
  private val Pw = """(?i)P1W""".r
  private val Pm = """(?i)P1M""".r
  private val Py = """(?i)P1Y""".r

  /** Parse a period string to (unitCode, n). Throws on unsupported input,
    * mirroring the reference's strict grammar. */
  def parse(s: String): (Int, Long) = s.trim match {
    case Pt(n, u) =>
      val unit = u.toUpperCase match {
        case "S" => SECOND; case "M" => MINUTE; case "H" => HOUR
      }
      (unit, n.toLong)
    case Pd(n) => (DAY, n.toLong)
    case Pw()  => (WEEK, 1L)
    case Pm()  => (MONTH, 1L)
    case Py()  => (YEAR, 1L)
    case other => throw new IllegalArgumentException(
      s"unsupported time_bucket period '$other' (want PT{n}S/M/H, P{n}D, P1W, P1M, P1Y)")
  }

  /** Parse a `+08:00` / `-05:30` style offset into minutes. */
  def parseOffsetMinutes(tz: String): Int = {
    val m = """([+-])(\d{2}):(\d{2})""".r
    tz.trim match {
      case m(sign, h, mm) =>
        val v = h.toInt * 60 + mm.toInt
        if (sign == "-") -v else v
      case other => throw new IllegalArgumentException(s"bad timezone offset '$other'")
    }
  }
}

/** Static bucket arithmetic, callable from generated code. All math is on
  * epoch microseconds (Spark's internal TimestampType representation).
  *
  * Semantics mirror the reference's truncation behavior
  * (df_operator/src/udfs/time_bucket.rs:257-300): sub-day buckets are
  * epoch-aligned; day/week/month/year truncate in a fixed-offset local
  * timeline whose default is UTC+8 (time_bucket.rs:83).
  */
object TimeBucketUtil {
  import TimePeriod._

  private final val MICROS_PER_SECOND = 1000000L
  private final val MICROS_PER_DAY = 86400L * MICROS_PER_SECOND

  /** floor division that is correct for negative epochs too */
  @inline private def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)

  def bucketMicros(micros: Long, unit: Int, n: Long, offsetMinutes: Int): Long = {
    val off = offsetMinutes * 60L * MICROS_PER_SECOND
    unit match {
      case SECOND =>
        val w = n * MICROS_PER_SECOND
        floorDiv(micros, w) * w
      case MINUTE =>
        val w = n * 60L * MICROS_PER_SECOND
        floorDiv(micros, w) * w
      case HOUR =>
        val w = n * 3600L * MICROS_PER_SECOND
        floorDiv(micros, w) * w
      case DAY =>
        val w = n * MICROS_PER_DAY
        floorDiv(micros + off, w) * w - off
      case WEEK =>
        // reference-exact (time_bucket.rs:300-312 truncate_week): the local
        // weekday offset (days since Monday) is multiplied by a WEEK, not a
        // day, then the RAW timestamp minus that is floored to week
        // granularity — a quirk preserved in the committed goldens
        // (time_bucket.result P1W), reproduced bit-for-bit here.
        val d = floorDiv(micros + off, MICROS_PER_DAY)
        val weekday = Math.floorMod(d + 3, 7L) // epoch day 0 = Thursday
        val w = 7L * MICROS_PER_DAY
        floorDiv(micros - weekday * w, w) * w
      case MONTH =>
        val local = toLocal(micros + off)
        fromLocalParts(local.getYear, local.getMonthValue, 1) - off
      case YEAR =>
        val local = toLocal(micros + off)
        fromLocalParts(local.getYear, 1, 1) - off
      case _ => throw new IllegalStateException(s"bad unit $unit")
    }
  }

  private def toLocal(micros: Long): java.time.LocalDateTime = {
    val secs = floorDiv(micros, MICROS_PER_SECOND)
    java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
  }

  private def fromLocalParts(y: Int, m: Int, d: Int): Long =
    java.time.LocalDate.of(y, m, d).toEpochDay * MICROS_PER_DAY
}

/** `time_bucket(ts, 'PT5M' | 'P1D' | ... [, '+08:00'])` as a native Catalyst
  * expression: codegen-friendly (single static call), null-intolerant.
  * Reference: df_operator/src/udfs/time_bucket.rs (342 LoC); default
  * timezone +08:00 per time_bucket.rs:83.
  */
case class TimeBucket(child: Expression, period: String, offsetMinutes: Int = 480)
    extends UnaryExpression {

  private val (unit, n) = TimePeriod.parse(period)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == TimestampType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"time_bucket needs a timestamp input, got ${child.dataType.catalogString}")
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "time_bucket"

  override protected def nullSafeEval(input: Any): Any =
    TimeBucketUtil.bucketMicros(input.asInstanceOf[Long], unit, n, offsetMinutes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TimeBucketUtil.bucketMicros($c, $unit, ${n}L, $offsetMinutes)")

  override protected def withNewChildInternal(newChild: Expression): TimeBucket =
    copy(child = newChild)
}

object TimeBucket {
  /** Column-level API. Default timezone offset is +08:00 to match the
    * reference; pass `tz = "+00:00"` for UTC bucketing. */
  def timeBucket(ts: Column, period: String, tz: String = "+08:00"): Column =
    GraftBridge.col(
      TimeBucket(GraftBridge.expr(ts), period, TimePeriod.parseOffsetMinutes(tz)))
}
