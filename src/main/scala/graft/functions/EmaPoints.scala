package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exponential moving average over a series' time-sorted points — the
  * sequential recurrence InfluxQL's `exponential_moving_average(field, N)`
  * applies per series (TA convention: the first emitted value, at the N-th
  * point, seeds with the simple average of the first N; afterwards
  * ema = α·x + (1−α)·ema_prev with α = 2/(N+1); series shorter than N emit
  * nothing).
  *
  * Input: array<struct<t: timestamp, v: double>> SORTED by t (callers use
  * sort_array over a per-series collect_list — one keyed shuffle, linear
  * kernel per series; state per series = its bucket grid, the same
  * grid-bounded footprint as the fill() materialization). Output:
  * array<struct<t, ema>> starting at the N-th input point.
  */
case class EmaPoints(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "exponential_moving_average window must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", TimestampType, nullable = false),
    StructField("ema", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "ema_points"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val alpha = 2.0 / (n + 1)
    val out = new Array[Any](total - n + 1)
    var seedSum = 0.0
    var ema = 0.0
    var i = 0
    while (i < total) {
      val row = arr.getStruct(i, 2)
      val t = row.getLong(0)
      val v = row.getDouble(1)
      if (i < n) seedSum += v
      if (i == n - 1) ema = seedSum / n
      else if (i >= n) ema = alpha * v + (1.0 - alpha) * ema
      if (i >= n - 1) out(i - n + 1) = InternalRow(t, ema)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmaPoints {
  def apply(pts: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.col(EmaPoints(
      org.apache.spark.sql.GraftBridge.expr(pts), n))

  /** SMA-seeded EMA recurrence over a value sequence; out(j) is the EMA
    * at input index j + n − 1 (empty when the input is shorter than n). */
  private[functions] def emaSeq(xs: Array[Double], n: Int): Array[Double] = {
    if (xs.length < n) return Array.empty[Double]
    val alpha = 2.0 / (n + 1)
    val out = new Array[Double](xs.length - n + 1)
    var seedSum = 0.0
    var i = 0
    while (i < xs.length) {
      if (i < n) seedSum += xs(i)
      if (i == n - 1) out(0) = seedSum / n
      else if (i >= n) out(i - n + 1) = alpha * xs(i) + (1.0 - alpha) * out(i - n)
      i += 1
    }
    out
  }
}

/** Double / triple exponential moving averages over a series' time-sorted
  * points (Mulloy 1994; InfluxQL's `double_exponential_moving_average` /
  * `triple_exponential_moving_average`): with E1 = EMA_N(x),
  * E2 = EMA_N(E1), E3 = EMA_N(E2) —
  * DEMA = 2·E1 − E2 (emitted once E2 exists, i.e. from point 2N−1) and
  * TEMA = 3·E1 − 3·E2 + E3 (from point 3N−2). Each EMA stage uses the
  * same SMA-seeded recurrence as [[EmaPoints]].
  *
  * Same contract as [[EmaPoints]]: sorted array in, linear kernel,
  * aligned array<struct<t, v>> out. */
case class DemaPoints(child: Expression, n: Int, triple: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "moving-average window must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", TimestampType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = if (triple) "tema_points" else "dema_points"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val xs = new Array[Double](total)
    val ts = new Array[Long](total)
    var i = 0
    while (i < total) {
      val row = arr.getStruct(i, 2)
      ts(i) = row.getLong(0); xs(i) = row.getDouble(1)
      i += 1
    }
    val e1 = EmaPoints.emaSeq(xs, n)
    val e2 = EmaPoints.emaSeq(e1, n)
    if (!triple) {
      // DEMA_j pairs e2(j) with e1(j + n − 1); times start at point 2n−2
      val out = new Array[Any](e2.length)
      var j = 0
      while (j < e2.length) {
        out(j) = InternalRow(ts(j + 2 * (n - 1)), 2.0 * e1(j + n - 1) - e2(j))
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val e3 = EmaPoints.emaSeq(e2, n)
      val out = new Array[Any](e3.length)
      var j = 0
      while (j < e3.length) {
        out(j) = InternalRow(ts(j + 3 * (n - 1)),
          3.0 * e1(j + 2 * (n - 1)) - 3.0 * e2(j + n - 1) + e3(j))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DemaPoints {
  def apply(pts: Column, n: Int, triple: Boolean): Column =
    org.apache.spark.sql.GraftBridge.col(DemaPoints(
      org.apache.spark.sql.GraftBridge.expr(pts), n, triple))
}

/** Relative strength index over a series' time-sorted points (Wilder
  * 1978, the InfluxQL `relative_strength_index(field, N)` transform):
  * diffs split into gain/loss streams; the first average gain/loss is the
  * simple mean of the first N diffs (emitted at point N+1), then Wilder's
  * smoothing avg = (avg_prev·(N−1) + x)/N; RSI = 100 − 100/(1 + gain/loss)
  * with the all-loss window pinned to 0 and all-gain to 100.
  *
  * Same contract as [[EmaPoints]]: sorted array<struct<t, v>> in, one
  * keyed shuffle + linear kernel per series, array<struct<t, rsi>> out.
  */
case class RsiPoints(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "relative_strength_index window must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", TimestampType, nullable = false),
    StructField("rsi", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "rsi_points"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    if (total < n + 1) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](total - n)
    var avgUp = 0.0
    var avgDown = 0.0
    var prev = arr.getStruct(0, 2).getDouble(1)
    var i = 1
    while (i < total) {
      val row = arr.getStruct(i, 2)
      val t = row.getLong(0)
      val v = row.getDouble(1)
      val d = v - prev
      prev = v
      val up = if (d > 0) d else 0.0
      val down = if (d < 0) -d else 0.0
      if (i <= n) { avgUp += up; avgDown += down }
      if (i == n) { avgUp /= n; avgDown /= n }
      else if (i > n) {
        avgUp = (avgUp * (n - 1) + up) / n
        avgDown = (avgDown * (n - 1) + down) / n
      }
      if (i >= n) {
        val rsi =
          if (avgDown == 0.0 && avgUp == 0.0) 50.0
          else if (avgDown == 0.0) 100.0
          else 100.0 - 100.0 / (1.0 + avgUp / avgDown)
        out(i - n) = InternalRow(t, rsi)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RsiPoints {
  def apply(pts: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.col(RsiPoints(
      org.apache.spark.sql.GraftBridge.expr(pts), n))
}
