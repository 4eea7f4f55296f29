package graft.promql

/** Per-series grid alignment — the math behind the reference's custom
  * `PromAlignExec` physical operator (physical_plan_extension/prom_align.rs;
  * extrapolation at :711-906, last-two-sample variants at :909-997). The
  * algorithms are Prometheus's published evaluation semantics
  * (promql/functions.go, Apache-2.0): instant selection takes the newest
  * sample within the lookback window; the rate family extrapolates the
  * observed first→last slope to the full window unless the gap to a window
  * edge exceeds 1.1× the average sample spacing, with counters corrected
  * for resets and capped at extrapolation-to-zero.
  *
  * Pure functions over one series's samples (unit-tested directly); the
  * distributed wrapper in [[PromQL]] feeds them via
  * `groupByKey(series).flatMapGroups` — Spark's shuffle replaces the
  * reference's hash `RepartitionExec` on tsid.
  */
object PromAlign {

  final case class Sample(tsMs: Long, v: Double)

  /** Samples must be sorted by (tsMs, v); ties resolved by value so both
    * engines (and the DuckDB oracle) agree deterministically. */
  def sortSamples(arr: Array[Sample]): Array[Sample] = {
    java.util.Arrays.sort(arr, (a: Sample, b: Sample) => {
      val c = java.lang.Long.compare(a.tsMs, b.tsMs)
      if (c != 0) c else java.lang.Double.compare(a.v, b.v)
    })
    arr
  }

  /** Instant selection at each grid step: newest sample in (t-lookback, t]. */
  def alignInstant(sorted: Array[Sample], p: EvalParams): Iterator[(Long, Double)] =
    gridSteps(p).flatMap { t =>
      val hi = upperBound(sorted, t)
      if (hi > 0 && sorted(hi - 1).tsMs > t - p.lookbackMs)
        Iterator.single((t, sorted(hi - 1).v))
      else Iterator.empty
    }

  /** Range-function alignment at each grid step over window (t-range, t]. */
  def alignRange(
      sorted: Array[Sample], p: EvalParams, rangeMs: Long,
      func: String, param: Double = Double.NaN,
      param2: Double = Double.NaN): Iterator[(Long, Double)] =
    gridSteps(p).flatMap { t =>
      val lo = lowerBoundExclusive(sorted, t - rangeMs)
      val hi = upperBound(sorted, t)
      val out = func match {
        case "rate"     => extrapolated(sorted, lo, hi, t - rangeMs, t, counter = true, perSecond = true)
        case "increase" => extrapolated(sorted, lo, hi, t - rangeMs, t, counter = true, perSecond = false)
        case "delta"    => extrapolated(sorted, lo, hi, t - rangeMs, t, counter = false, perSecond = false)
        case "irate"    => lastTwo(sorted, lo, hi, counter = true, perSecond = true)
        case "idelta"   => lastTwo(sorted, lo, hi, counter = false, perSecond = false)
        case "deriv"    => linearSlope(sorted, lo, hi)
        case "predict_linear" => linearPredict(sorted, lo, hi, t, param)
        case "holt_winters"   => holtWinters(sorted, lo, hi, param, param2)
        case _          => overTime(sorted, lo, hi, func, param)
      }
      out.map(v => (t, v)).iterator
    }

  /** `*_over_time` range aggregations (Prometheus promql/functions.go,
    * Apache-2.0 published semantics): plain aggregates of the raw samples
    * in the window — no extrapolation. stddev/stdvar are population
    * moments; quantile interpolates linearly between order statistics
    * (identical to a continuous quantile). */
  def overTime(
      s: Array[Sample], lo: Int, hi: Int, func: String,
      param: Double): Option[Double] = {
    val n = hi - lo
    if (n == 0) return None
    def sum = { var x = 0.0; var i = lo; while (i < hi) { x += s(i).v; i += 1 }; x }
    func match {
      case "sum_over_time"     => Some(sum)
      case "avg_over_time"     => Some(sum / n)
      case "count_over_time"   => Some(n.toDouble)
      case "last_over_time"    => Some(s(hi - 1).v)
      case "present_over_time" => Some(1.0)
      case "min_over_time" =>
        var m = s(lo).v; var i = lo + 1
        while (i < hi) { if (s(i).v < m) m = s(i).v; i += 1 }; Some(m)
      case "max_over_time" =>
        var m = s(lo).v; var i = lo + 1
        while (i < hi) { if (s(i).v > m) m = s(i).v; i += 1 }; Some(m)
      case "stddev_over_time" | "stdvar_over_time" =>
        val mean = sum / n
        var acc = 0.0; var i = lo
        while (i < hi) { val d = s(i).v - mean; acc += d * d; i += 1 }
        val stdvar = acc / n
        Some(if (func == "stddev_over_time") math.sqrt(stdvar) else stdvar)
      case "changes" =>
        // count of consecutive sample pairs whose value differs
        // (promql funcChanges; NaN→NaN is NOT a change, value→NaN is)
        var c = 0; var i = lo + 1
        while (i < hi) {
          val a = s(i - 1).v; val b = s(i).v
          if (a != b && !(a.isNaN && b.isNaN)) c += 1
          i += 1
        }
        Some(c.toDouble)
      case "resets" =>
        // count of counter resets: strict decreases between neighbors
        // (promql funcResets, float samples)
        var c = 0; var i = lo + 1
        while (i < hi) { if (s(i).v < s(i - 1).v) c += 1; i += 1 }
        Some(c.toDouble)
      case "quantile_over_time" =>
        if (param.isNaN) Some(Double.NaN)
        else if (param < 0) Some(Double.NegativeInfinity)
        else if (param > 1) Some(Double.PositiveInfinity)
        else {
          val vs = new Array[Double](n)
          var i = 0; while (i < n) { vs(i) = s(lo + i).v; i += 1 }
          java.util.Arrays.sort(vs)
          val rank = param * (n - 1)
          val lower = rank.toInt
          val upper = math.min(n - 1, lower + 1)
          val w = rank - lower
          Some(vs(lower) * (1 - w) + vs(upper) * w)
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported PromQL function: $other")
    }
  }

  /** Prometheus extrapolated rate/increase/delta over sorted(lo until hi). */
  def extrapolated(
      s: Array[Sample], lo: Int, hi: Int, rangeStartMs: Long, rangeEndMs: Long,
      counter: Boolean, perSecond: Boolean): Option[Double] = {
    val n = hi - lo
    if (n < 2) return None
    val first = s(lo); val last = s(hi - 1)
    val sampledMs = last.tsMs - first.tsMs
    if (sampledMs <= 0) return None

    var result = last.v - first.v
    if (counter) {
      var prev = first.v
      var i = lo + 1
      while (i < hi) { val v = s(i).v; if (v < prev) result += prev; prev = v; i += 1 }
    }
    val sampled = sampledMs / 1000.0
    var dStart = (first.tsMs - rangeStartMs) / 1000.0
    val dEnd = (rangeEndMs - last.tsMs) / 1000.0
    val avgDur = sampled / (n - 1)
    // counters cannot extrapolate below zero: cap the start-side gap
    if (counter && result > 0 && first.v >= 0) {
      val dZero = sampled * (first.v / result)
      if (dZero < dStart) dStart = dZero
    }
    val threshold = avgDur * 1.1
    var extrap = sampled
    extrap += (if (dStart < threshold) dStart else avgDur / 2)
    extrap += (if (dEnd < threshold) dEnd else avgDur / 2)
    var out = result * (extrap / sampled)
    if (perSecond) out /= (rangeEndMs - rangeStartMs) / 1000.0
    Some(out)
  }

  /** deriv: least-squares slope of (t seconds, v) over the window samples
    * (Prometheus promql/functions.go linearRegression — intercept dropped,
    * timestamps offset to the first sample for stability). */
  def linearSlope(s: Array[Sample], lo: Int, hi: Int): Option[Double] = {
    val n = hi - lo
    if (n < 2) return None
    val t0 = s(lo).tsMs
    var sumT = 0.0; var sumV = 0.0
    var i = lo
    while (i < hi) { sumT += (s(i).tsMs - t0) / 1000.0; sumV += s(i).v; i += 1 }
    val mT = sumT / n; val mV = sumV / n
    var cov = 0.0; var varT = 0.0
    i = lo
    while (i < hi) {
      val dt = (s(i).tsMs - t0) / 1000.0 - mT
      cov += dt * (s(i).v - mV); varT += dt * dt
      i += 1
    }
    if (varT == 0) None else Some(cov / varT)
  }

  /** predict_linear: value of the least-squares regression line `horizon`
    * seconds past the evaluation instant (promql/functions.go
    * funcPredictLinear — the line passes through the sample centroid, so
    * v̂(x) = mean(v) + slope·(x − mean(t))). */
  def linearPredict(
      s: Array[Sample], lo: Int, hi: Int, evalMs: Long,
      horizonSec: Double): Option[Double] = {
    val n = hi - lo
    if (n < 2) return None
    val t0 = s(lo).tsMs
    var sumT = 0.0; var sumV = 0.0
    var i = lo
    while (i < hi) { sumT += (s(i).tsMs - t0) / 1000.0; sumV += s(i).v; i += 1 }
    val mT = sumT / n; val mV = sumV / n
    var cov = 0.0; var varT = 0.0
    i = lo
    while (i < hi) {
      val dt = (s(i).tsMs - t0) / 1000.0 - mT
      cov += dt * (s(i).v - mV); varT += dt * dt
      i += 1
    }
    if (varT == 0) None
    else {
      val slope = cov / varT
      val x = (evalMs - t0) / 1000.0 + horizonSec
      Some(mV + slope * (x - mT))
    }
  }

  /** holt_winters (a.k.a. double_exponential_smoothing): level/trend
    * smoothing over the window samples, returning the final smoothed level
    * (promql/functions.go funcDoubleExponentialSmoothing; sf = level
    * smoothing factor, tf = trend factor, both in (0, 1)). */
  def holtWinters(
      s: Array[Sample], lo: Int, hi: Int, sf: Double,
      tf: Double): Option[Double] = {
    require(sf > 0 && sf < 1, s"holt_winters smoothing factor must be in (0,1): $sf")
    require(tf > 0 && tf < 1, s"holt_winters trend factor must be in (0,1): $tf")
    val n = hi - lo
    if (n < 2) return None
    var s0 = 0.0
    var s1 = s(lo).v
    var b = s(lo + 1).v - s(lo).v
    var i = lo + 1
    while (i < hi) {
      val x = sf * s(i).v
      // trend update uses the PREVIOUS level pair (calcTrendValue(i-1,...))
      if (i > lo + 1) b = tf * (s1 - s0) + (1 - tf) * b
      val y = (1 - sf) * (s1 + b)
      s0 = s1; s1 = x + y
      i += 1
    }
    Some(s1)
  }

  /** irate/idelta: last two samples in the window. */
  def lastTwo(
      s: Array[Sample], lo: Int, hi: Int,
      counter: Boolean, perSecond: Boolean): Option[Double] = {
    if (hi - lo < 2) return None
    val prev = s(hi - 2); val last = s(hi - 1)
    val dtMs = last.tsMs - prev.tsMs
    if (dtMs <= 0) return None
    var diff = last.v - prev.v
    if (counter && last.v < prev.v) diff = last.v // counter reset
    if (perSecond) Some(diff / (dtMs / 1000.0)) else Some(diff)
  }

  private def gridSteps(p: EvalParams): Iterator[Long] =
    Iterator.iterate(p.startMs)(_ + p.stepMs).takeWhile(_ <= p.endMs)

  /** First index with tsMs > bound (samples strictly after `bound`). */
  private def lowerBoundExclusive(s: Array[Sample], bound: Long): Int = {
    var lo = 0; var hi = s.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (s(mid).tsMs <= bound) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** First index with tsMs > t — i.e. end of the (…, t] window. */
  private def upperBound(s: Array[Sample], t: Long): Int =
    lowerBoundExclusive(s, t)
}
