package graft.functions

import org.apache.spark.sql.Row

/** Streaming evaluators for the sequential TA recurrences (EMA / RSI /
  * DEMA / TEMA) of InfluxQL's technical-analysis transforms (the IOx
  * planner surface the reference inherits via its DataFusion planner).
  *
  * The previous formulation collected each series into one in-memory
  * array (`sort_array(collect_list(...))` + array kernel) — fine on a
  * bucketed `GROUP BY time()` grid (grid-bounded), a skew bomb on a RAW
  * hot series at scale (one task holds the series' entire history).
  * These state machines carry O(window) state instead: callers
  * `repartition(series).sortWithinPartitions(series, t, v)` and run
  * [[TaStream.run]] over each partition's row iterator, so a series of
  * any length streams through Spark's spillable sort and never
  * materializes. The recurrence itself is inherently sequential, so a
  * series still pays serial CPU — but memory is O(1) and the sort spills.
  */
object TaStream {

  /** One series' recurrence state: push a point, get the emitted value
    * (None during warm-up). Timestamps pass through untouched.
    * Serializable so [[TaChunked]] can thread a state across chunk
    * boundaries (the hand-off copies the fields verbatim — no arithmetic,
    * so chunked evaluation stays bit-identical to the serial walk). */
  sealed trait State extends Serializable {
    def push(v: Double): Option[Double]
  }

  /** SMA-seeded EMA (InfluxQL convention): first emission at point n is
    * the simple average of the first n values, then
    * ema = α·x + (1−α)·ema with α = 2/(n+1). */
  final class Ema(n: Int) extends State {
    private val alpha = 2.0 / (n + 1)
    private var i = 0
    private var seedSum = 0.0
    private var ema = 0.0
    def push(v: Double): Option[Double] = {
      if (i < n) seedSum += v
      if (i == n - 1) ema = seedSum / n
      else if (i >= n) ema = alpha * v + (1.0 - alpha) * ema
      val out = if (i >= n - 1) Some(ema) else None
      i += 1
      out
    }
  }

  /** Wilder RSI (Wilder 1978): first avg gain/loss is the mean
    * of the first n diffs, then Wilder smoothing. */
  final class Rsi(n: Int) extends State {
    private var i = 0
    private var prev = 0.0
    private var avgUp = 0.0
    private var avgDown = 0.0
    def push(v: Double): Option[Double] = {
      if (i == 0) { prev = v; i = 1; return None }
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
      val out =
        if (i >= n) Some(
          if (avgDown == 0.0 && avgUp == 0.0) 50.0
          else if (avgDown == 0.0) 100.0
          else 100.0 - 100.0 / (1.0 + avgUp / avgDown))
        else None
      i += 1
      out
    }
  }

  /** DEMA = 2·E1 − E2 / TEMA = 3·E1 − 3·E2 + E3 (Mulloy 1994):
    * chained EMA stages — when a later stage emits its j-th value, the
    * earlier stages' currently-pushed values are exactly the offsets the
    * Mulloy formulas pair it with, so the chain needs no buffering. */
  final class Dema(n: Int, triple: Boolean) extends State {
    private val s1 = new Ema(n)
    private val s2 = new Ema(n)
    private val s3 = new Ema(n)
    def push(v: Double): Option[Double] =
      s1.push(v).flatMap { e1 =>
        s2.push(e1).flatMap { e2 =>
          if (!triple) Some(2.0 * e1 - e2)
          else s3.push(e2).map(e3 => 3.0 * e1 - 3.0 * e2 + e3)
        }
      }
  }

  /** Kaufman's Adaptive Moving Average (Kaufman 1995): smoothing constant
    * adapts to the trailing-window efficiency ratio ER = |x_t − x_{t−m}| /
    * Σ|Δx| (m = min(t, n) diffs), SC = (ER·(2/3 − 2/31) + 2/31)², then
    * kama = kama + SC·(x − kama), seeded kama₀ = x₀ and emitted once a
    * full n-diff window exists. The recurrence is a CONTRACTION (SC < 1),
    * so window-sum last-ulp differences between engines decay rather than
    * amplify — the property the q271 oracle's round(4) relies on. */
  final class Kama(n: Int) extends State {
    private val fast = 2.0 / 3.0  // 2/(fastest period 2 + 1)
    private val slow = 2.0 / 31.0 // 2/(slowest period 30 + 1)
    private val ring = new Array[Double](n + 1)
    private var i = 0
    private var kama = 0.0
    def push(v: Double): Option[Double] = {
      ring(i % (n + 1)) = v
      if (i == 0) kama = v
      else {
        val m = math.min(i, n)
        val oldest = ring(((i - m) % (n + 1) + n + 1) % (n + 1))
        var den = 0.0
        var j = i - m + 1
        while (j <= i) {
          den += math.abs(ring(j % (n + 1)) - ring((j - 1 + n + 1) % (n + 1)))
          j += 1
        }
        val er = if (den == 0.0) 0.0 else math.abs(v - oldest) / den
        val s = er * (fast - slow) + slow
        kama = kama + (s * s) * (v - kama)
      }
      val out = if (i >= n) Some(kama) else None
      i += 1
      out
    }
  }

  /** TRIX (triple-exponential derivative, Hutson 1983): percentage
    * one-step change of the triple-smoothed EMA — 100·(e3 − e3')/e3'.
    * Reuses the SMA-seeded [[Ema]] chain; first emission one step after
    * the third stage seeds. */
  final class Trix(n: Int) extends State {
    private val s1 = new Ema(n)
    private val s2 = new Ema(n)
    private val s3 = new Ema(n)
    private var prev: Option[Double] = None
    def push(v: Double): Option[Double] =
      s1.push(v).flatMap(s2.push).flatMap(s3.push) match {
        case Some(e3) =>
          val out = prev.map(p =>
            if (p == 0.0) 0.0 else 100.0 * (e3 - p) / p)
          prev = Some(e3)
          out
        case None => None
      }
  }

  /** Additive Holt-Winters recurrence (level l, trend b, S seasonal
    * offsets; S = 0 ⇒ Holt's linear trend). Seed: l = x₀, b = 0, s ≡ 0 at
    * the first point; for point t ≥ 1 with idx = t mod S —
    *
    *   fit  = l + b + s(idx)                      (one-step-ahead)
    *   l'   = α·(x − s(idx)) + (1−α)·(l + b)
    *   b'   = β·(l' − l) + (1−β)·b
    *   s(idx)' = γ·(x − l') + (1−γ)·s(idx)
    *
    * Forecast h buckets past the last point T: l + h·b + s((T+h) mod S).
    * α = β = γ = 0.5 fixed (see InfluxQL.applyHoltWinters scaladoc). */
  final class HoltWinters(season: Int) extends Serializable {
    private val a = 0.5
    private var i = 0
    private var l = 0.0
    private var b = 0.0
    private val s = if (season > 0) new Array[Double](season) else null
    /** One-step-ahead fit for this point (None at the seed point). */
    def push(x: Double): Option[Double] = {
      if (i == 0) { l = x; i = 1; return None }
      val idx = if (season > 0) i % season else 0
      val sv = if (season > 0) s(idx) else 0.0
      val fit = l + b + sv
      val l2 = a * (x - sv) + (1.0 - a) * (l + b)
      b = a * (l2 - l) + (1.0 - a) * b
      if (season > 0) s(idx) = a * (x - l2) + (1.0 - a) * sv
      l = l2
      i += 1
      Some(fit)
    }
    /** h-th forecast (1-based) from the terminal state. */
    def forecast(h: Int): Double = {
      val sv = if (season > 0) s((i - 1 + h) % season) else 0.0
      l + h.toDouble * b + sv
    }
    def points: Int = i
  }

  /** Stream sorted (key..., t, v) rows through per-series [[HoltWinters]]
    * machines: emits the in-sample fits when `withFit`, and at each series
    * boundary (key change / iterator end) `nFc` forecast rows whose
    * timestamps extend the grid by `stepUs` microseconds per bucket. */
  def runHoltWinters(
      rows: Iterator[Row], keyLen: Int, season: Int, nFc: Int,
      withFit: Boolean, stepUs: Long): Iterator[Row] =
    new Iterator[Row] {
      private val out = scala.collection.mutable.Queue.empty[Row]
      private var state: HoltWinters = null
      private var key: Seq[Any] = null
      private var lastT: Any = null
      private def addUs(t: Any, us: Long): Any = t match {
        case ts: java.sql.Timestamp =>
          java.sql.Timestamp.from(ts.toInstant.plusNanos(us * 1000L))
        case inst: java.time.Instant => inst.plusNanos(us * 1000L)
        case other => throw new IllegalArgumentException(
          s"unsupported time type: ${other.getClass}")
      }
      private def flush(): Unit = {
        if (state != null && state.points >= 1) {
          var h = 1
          while (h <= nFc) {
            out += Row.fromSeq(key :+ addUs(lastT, h * stepUs) :+ state.forecast(h))
            h += 1
          }
        }
        state = null
      }
      private def advance(): Unit = {
        while (out.isEmpty && rows.hasNext) {
          val r = rows.next()
          val k = (0 until keyLen).map(r.get)
          if (state != null && k != key) flush() // forecasts of the previous series
          if (state == null) { state = new HoltWinters(season); key = k }
          val t = r.get(keyLen)
          val v = if (r.isNullAt(keyLen + 1)) 0.0 else r.getDouble(keyLen + 1)
          val fit = state.push(v)
          lastT = t
          if (withFit) fit.foreach(f => out += Row.fromSeq(k :+ t :+ f))
        }
        if (out.isEmpty && !rows.hasNext) flush()
      }
      def hasNext: Boolean = { advance(); out.nonEmpty }
      def next(): Row = {
        advance()
        if (out.isEmpty) throw new NoSuchElementException
        out.dequeue()
      }
    }

  /** Stream a partition's rows through per-series state machines. Rows
    * must arrive sorted by (series key, time, value) with the first
    * `keyLen` columns the series key, then the (opaque) timestamp, then
    * the double value; a key change resets the recurrence. Emits
    * Row(key..., t, out) for every point the recurrence yields. */
  /** One-step-ahead Holt (level+trend) forecast ERROR: after seeding
    * l=y2, b=y2−y1 from the first two points, each further point emits
    * y_t − (l+b) — the error of the forecast made BEFORE seeing y_t —
    * then updates l' = α·y + (1−α)(l+b), b' = β(l'−l) + (1−β)b. With
    * α=β=0.5 every multiply is an exact binary halving, so an oracle
    * replaying the same operand order reproduces the doubles bit-for-bit
    * (the backtest contract: rolling-origin evaluation without
    * re-fitting per origin). */
  final class HoltError(alpha: Double, beta: Double) extends State {
    private var i = 0
    private var l = 0.0
    private var b = 0.0
    def push(v: Double): Option[Double] = {
      if (i == 0) { l = v; i = 1; return None }
      if (i == 1) { b = v - l; l = v; i = 2; return None }
      val err = v - (l + b)
      val lNew = alpha * v + (1.0 - alpha) * (l + b)
      b = beta * (lNew - l) + (1.0 - beta) * b
      l = lNew
      Some(err)
    }
  }

  def run(rows: Iterator[Row], keyLen: Int, mk: () => State): Iterator[Row] =
    new Iterator[Row] {
      private var state: State = null
      private var key: Seq[Any] = null
      private var pending: Row = null
      private def advance(): Unit = {
        while (pending == null && rows.hasNext) {
          val r = rows.next()
          val k = (0 until keyLen).map(r.get)
          if (state == null || k != key) { state = mk(); key = k }
          val v = if (r.isNullAt(keyLen + 1)) 0.0 else r.getDouble(keyLen + 1)
          state.push(v).foreach { out =>
            pending = Row.fromSeq(k :+ r.get(keyLen) :+ out)
          }
        }
      }
      def hasNext: Boolean = { advance(); pending != null }
      def next(): Row = {
        advance()
        if (pending == null) throw new NoSuchElementException
        val r = pending; pending = null; r
      }
    }
}
