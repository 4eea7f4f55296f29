package graft

import graft.engine.Sampler
import org.scalatest.funsuite.AnyFunSuite

/** Pure sampling math against the reference's own unit fixtures
  * (analytic_engine/src/sampler.rs tests). */
class SamplerSpec extends AnyFunSuite {

  private val SecMs = 1000L
  private val MinMs = 60 * SecMs
  private val HourMs = 60 * MinMs
  private val DayMs = 24 * HourMs

  test("pick_duration ladder matches the reference's test table") {
    // sampler.rs test_pick_duration: (interval, expected duration)
    val cases = Seq(
      1L -> 2 * HourMs, 5 * SecMs -> 2 * HourMs, 15 * SecMs -> 2 * HourMs,
      MinMs -> 2 * HourMs, 5 * MinMs -> DayMs, 10 * MinMs -> DayMs,
      30 * MinMs -> 7 * DayMs, HourMs -> 7 * DayMs, 4 * HourMs -> 30 * DayMs,
      8 * HourMs -> 180 * DayMs, DayMs -> 180 * DayMs, 3 * DayMs -> 360 * DayMs,
      7 * DayMs -> 5 * 360 * DayMs, 30 * DayMs -> 10 * 360 * DayMs,
      360 * DayMs -> 10 * 360 * DayMs, 10 * 360 * DayMs -> 10 * 360 * DayMs,
      20 * 360 * DayMs -> 10 * 360 * DayMs)
    for ((interval, expect) <- cases)
      assert(Sampler.pickDurationMs(interval) == expect, s"interval $interval")
  }

  test("evaluate_interval is the stepped-back 90th percentile of gaps") {
    // under MIN_SAMPLES
    assert(Sampler.evaluateIntervalMs(Nil).isEmpty)
    assert(Sampler.evaluateIntervalMs(Seq(42L)).isEmpty)
    // two samples: one interval, index 0
    assert(Sampler.evaluateIntervalMs(Seq(0L, 7L)).contains(7L))
    // the sampling-primary-key golden's timestamps: gaps 1,2,2 → idx 2→1 → 2
    val base = 1695348000000L
    assert(Sampler.evaluateIntervalMs(Seq(0L, 1L, 3L, 5L).map(base + _)).contains(2L))
    // 15s-spaced series → 15s interval → 2h segment (sampler.rs test ladder)
    val spaced = (0 until 100).map(i => i * 15 * SecMs)
    assert(Sampler.evaluateIntervalMs(spaced).contains(15 * SecMs))
    assert(Sampler.suggestDurationMs(spaced) == 2 * HourMs)
    // no samples → reference default 2h
    assert(Sampler.suggestDurationMs(Nil) == 2 * HourMs)
  }

  test("suggested PK: ascending cardinality, stable ties, tsid + ts appended") {
    // golden fixture: myVALUE(2 distinct) < name(3 distinct)
    assert(Sampler.suggestPrimaryKey(
      Seq("name" -> 3L, "myVALUE" -> 2L), usesTsid = true, timestampKey = "t") ==
      Seq("myVALUE", "name", "tsid", "t"))
    // ties keep declared order; only two lead columns survive
    assert(Sampler.suggestPrimaryKey(
      Seq("a" -> 5L, "b" -> 5L, "c" -> 1L), usesTsid = false, timestampKey = "ts") ==
      Seq("c", "a", "ts"))
  }

  test("duration strings render like the reference's ReadableDuration") {
    assert(Sampler.durationString(2 * HourMs) == "2h")
    assert(Sampler.durationString(DayMs) == "1d")
    assert(Sampler.durationString(7 * DayMs) == "7d")
    assert(Sampler.durationString(10 * 360 * DayMs) == "3600d")
  }
}
