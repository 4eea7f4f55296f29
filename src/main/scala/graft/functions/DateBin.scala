package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** `DATE_BIN(interval, ts, origin)` — DataFusion's built-in, exercised by the
  * reference's golden corpus (integration_tests/cases/common/function/
  * date_bin.sql): buckets `ts` into `interval`-wide bins anchored at
  * `origin`. Spark has no date_bin; this provides it as a native expression
  * (origin-anchored epoch arithmetic; month-bearing intervals rejected, as
  * in the tested subset).
  */
case class DateBin(interval: Expression, ts: Expression, anchor: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = interval
  override def second: Expression = ts
  override def third: Expression = anchor

  override def dataType: DataType = TimestampType

  override def checkInputDataTypes(): TypeCheckResult = {
    val intervalOk = interval.dataType match {
      case _: DayTimeIntervalType | CalendarIntervalType => true
      case _ => false
    }
    if (!intervalOk)
      TypeCheckResult.TypeCheckFailure(
        s"date_bin interval must be day-time, got ${interval.dataType.catalogString}")
    else if (ts.dataType != TimestampType || anchor.dataType != TimestampType)
      TypeCheckResult.TypeCheckFailure("date_bin needs (interval, timestamp, timestamp)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(iv: Any, t: Any, o: Any): Any = {
    val width: Long = iv match {
      case micros: Long => micros // DayTimeIntervalType carries micros
      case ci: CalendarInterval =>
        require(ci.months == 0, "date_bin: month intervals unsupported")
        ci.days * 86400000000L + ci.microseconds
    }
    require(width > 0, "date_bin: interval must be positive")
    val tsm = t.asInstanceOf[Long]
    val org = o.asInstanceOf[Long]
    Math.floorDiv(tsm - org, width) * width + org
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(interval = f, ts = s, anchor = t)
}
