package graft

import graft.promql._
import graft.promql.PromAlign.Sample

class PromQLSpec extends SparkSpec {

  private def s(pairs: (Long, Double)*): Array[Sample] =
    PromAlign.sortSamples(pairs.map(p => Sample(p._1, p._2)).toArray)

  // ---------------------------------------------------------------- parser

  test("parser: selector, matchers, range, aggregation") {
    assert(PromQL.parse("events") == VectorSelector(Selector("events", Nil, None)))
    assert(PromQL.parse("""rate(http_requests{job="api",code!="500"}[5m])""") ==
      RangeFunc("rate", Selector("http_requests",
        Seq(EqMatcher("job", "api"), NeqMatcher("code", "500")), Some(300000L))))
    assert(PromQL.parse("""sum by (job) (irate(m{x=~"a.*"}[90s]))""") ==
      AggExpr("sum", Seq("job"),
        RangeFunc("irate", Selector("m", Seq(ReMatcher("x", "a.*")), Some(90000L)))))
    assert(PromQL.parse("avg(m)") ==
      AggExpr("avg", Nil, VectorSelector(Selector("m", Nil, None))))
    assert(PromQL.parse("m{a=\"b\"} offset 5m") ==
      VectorSelector(Selector("m", Seq(EqMatcher("a", "b")), None, 300000L)))
    assert(PromQL.parse("rate(m[1h] offset 1d)") ==
      RangeFunc("rate", Selector("m", Nil, Some(3600000L), 86400000L)))
    // suffix grouping form and trailing-input rejection
    assert(PromQL.parse("sum(rate(m[5m])) by (job)") ==
      AggExpr("sum", Seq("job"),
        RangeFunc("rate", Selector("m", Nil, Some(300000L)))))
    intercept[IllegalArgumentException](PromQL.parse("rate(m[5m]) garbage"))
    intercept[IllegalArgumentException](PromQL.parse("rate(m)")) // needs [dur]
  }

  test("parser: topk/bottomk/quantile and binary operator precedence") {
    assert(PromQL.parse("topk(3, m)") ==
      TopkExpr("topk", 3, VectorSelector(Selector("m", Nil, None))))
    assert(PromQL.parse("bottomk(1, sum by (j) (m))") ==
      TopkExpr("bottomk", 1, AggExpr("sum", Seq("j"),
        VectorSelector(Selector("m", Nil, None)))))
    assert(PromQL.parse("quantile(0.9, m)") ==
      QuantileExpr(0.9, Nil, VectorSelector(Selector("m", Nil, None))))
    assert(PromQL.parse("quantile by (j) (0.5, m)") ==
      QuantileExpr(0.5, Seq("j"), VectorSelector(Selector("m", Nil, None))))
    // precedence: * binds tighter than +
    assert(PromQL.parse("m + n * 2") ==
      BinExpr("+", VectorSelector(Selector("m", Nil, None)),
        BinExpr("*", VectorSelector(Selector("n", Nil, None)), NumberLit(2.0))))
    assert(PromQL.parse("(m + n) / 2") ==
      BinExpr("/", BinExpr("+",
        VectorSelector(Selector("m", Nil, None)),
        VectorSelector(Selector("n", Nil, None))), NumberLit(2.0)))
    intercept[IllegalArgumentException](PromQL.parse("topk(0, m)"))
  }

  test("parser + eval: @ modifier and math functions") {
    assert(PromQL.parse("m @ 100") ==
      VectorSelector(Selector("m", Nil, None, 0L, Some(100000L))))
    assert(PromQL.parse("m offset 5m @ 100.5") ==
      VectorSelector(Selector("m", Nil, None, 300000L, Some(100500L))))
    assert(PromQL.parse("abs(m)") ==
      MathFunc("abs", VectorSelector(Selector("m", Nil, None))))
    assert(PromQL.parse("clamp_max(rate(m[1m]), 2.5)") ==
      MathFunc("clamp_max", RangeFunc("rate", Selector("m", Nil, Some(60000L))),
        Seq(2.5)))
    intercept[IllegalArgumentException](PromQL.parse("clamp_min(m)"))
    // negative and scientific-notation scalars
    assert(PromQL.parse("clamp_min(m, -5)") ==
      MathFunc("clamp_min", VectorSelector(Selector("m", Nil, None)), Seq(-5.0)))
    assert(PromQL.parse("m * -2") ==
      BinExpr("*", VectorSelector(Selector("m", Nil, None)), NumberLit(-2.0)))
    assert(PromQL.parse("m @ 1.7e9") ==
      VectorSelector(Selector("m", Nil, None, 0L, Some(1700000000000L))))

    import spark.implicits._
    val df = Seq(
      (new java.sql.Timestamp(100000L), "a", -3.7),
      (new java.sql.Timestamp(160000L), "a", 2.2)).toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(startMs = 100000L, endMs = 220000L, stepMs = 60000L)
    def run(q: String) = PromQL.eval(spark, bind, q, p)
      .orderBy("ts").collect().map(_.getAs[Double]("value")).toSeq

    assert(run("abs(m)") == Seq(3.7, 2.2, 2.2))
    assert(run("ceil(m)") == Seq(-3.0, 3.0, 3.0))
    assert(run("clamp_max(m, 0)") == Seq(-3.7, 0.0, 0.0))
    // @ 100s pins every step to the value at t=100s
    assert(run("m @ 100") == Seq(-3.7, -3.7, -3.7))
  }

  test("calendar functions extract UTC fields from value-as-unix-seconds") {
    import spark.implicits._
    // 2024-01-10 13:45:07 UTC = 1704894307 (a Wednesday)
    val sec = 1704894307.0
    val df = Seq((new java.sql.Timestamp(100000L), "a", sec))
      .toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(startMs = 100000L, endMs = 100000L, stepMs = 60000L)
    def run(q: String) = PromQL.eval(spark, bind, q, p)
      .collect().map(_.getAs[Double]("value")).toSeq
    assert(run("minute(m)") == Seq(45.0))
    assert(run("hour(m)") == Seq(13.0))
    assert(run("day_of_week(m)") == Seq(3.0))
    assert(run("day_of_month(m)") == Seq(10.0))
    assert(run("days_in_month(m)") == Seq(31.0))
    assert(run("month(m)") == Seq(1.0))
    assert(run("year(m)") == Seq(2024.0))
    // leap February
    val feb = Seq((new java.sql.Timestamp(100000L), "a", 1709164800.0)) // 2024-02-29
      .toDF("ts", "host", "value")
    val bindF = (_: String) => PromQL.SeriesTable(feb, "ts", "value", Seq("host"))
    assert(PromQL.eval(spark, bindF, "days_in_month(m)", p)
      .collect().map(_.getAs[Double]("value")).toSeq == Seq(29.0))
  }

  test("trig functions and stddev/stdvar/group aggregators") {
    import spark.implicits._
    val t0 = 100000L
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 6.0))
      .map { case (h, v) => (new java.sql.Timestamp(t0), h, v) }
      .toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(startMs = t0, endMs = t0, stepMs = 60000L)
    def one(q: String) = PromQL.eval(spark, bind, q, p)
      .collect().map(_.getAs[Double]("value")).toSeq
    // population variance of {1,2,6}: mean 3, var (4+1+9)/3
    assert(one("stdvar(m)") == Seq((4.0 + 1.0 + 9.0) / 3))
    assert(math.abs(one("stddev(m)").head - math.sqrt(14.0 / 3)) < 1e-12)
    assert(one("group(m)") == Seq(1.0))
    assert(one("group by (host) (m)").sorted == Seq(1.0, 1.0, 1.0))
    assert(one("sin(m)").toSet == Set(math.sin(1.0), math.sin(2.0), math.sin(6.0)))
    assert(one("deg(m)").toSet ==
      Set(math.toDegrees(1.0), math.toDegrees(2.0), math.toDegrees(6.0)))
    assert(math.abs(one("atan(tan(m{host=\"a\"}))").head - 1.0) < 1e-12)
  }

  test("resets and changes count neighbor-pair events in the window") {
    // values 5, 3, 3, 7, 2 → resets: 5→3, 7→2 = 2; changes: 5→3, 3→7, 7→2 = 3
    val samples = s(10000L -> 5.0, 20000L -> 3.0, 30000L -> 3.0,
      40000L -> 7.0, 50000L -> 2.0)
    val p = EvalParams(startMs = 60000L, endMs = 60000L, stepMs = 60000L)
    assert(PromAlign.alignRange(samples, p, 60000L, "resets").toSeq ==
      Seq(60000L -> 2.0))
    assert(PromAlign.alignRange(samples, p, 60000L, "changes").toSeq ==
      Seq(60000L -> 3.0))
    // single sample: both are 0, not absent
    val one = s(10000L -> 5.0)
    assert(PromAlign.alignRange(one, p, 60000L, "resets").toSeq ==
      Seq(60000L -> 0.0))
  }

  test("vector set operations: and / or / unless") {
    // precedence: set ops bind loosest
    assert(PromQL.parse("m + n unless k") ==
      SetOpExpr("unless",
        BinExpr("+", VectorSelector(Selector("m", Nil, None)),
          VectorSelector(Selector("n", Nil, None))),
        VectorSelector(Selector("k", Nil, None))))

    import spark.implicits._
    val t0 = 100000L
    val df = Seq(("a", 1.0), ("b", 5.0), ("c", 3.0))
      .map { case (h, v) => (new java.sql.Timestamp(t0), h, v) }
      .toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(startMs = t0, endMs = t0, stepMs = 60000L)
    def hosts(q: String) = PromQL.eval(spark, bind, q, p)
      .collect().map(_.getAs[String]("host")).sorted.toSeq

    assert(hosts("m and topk(2, m)") == Seq("b", "c"))
    assert(hosts("m unless topk(2, m)") == Seq("a"))
    // or: lhs wins on overlap; rhs's unmatched label sets are added
    assert(hosts("topk(1, m) or bottomk(1, m)") == Seq("a", "b"))
    val orVals = PromQL.eval(spark, bind, "topk(1, m) or m", p)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Double]("value"))).toMap
    assert(orVals == Map("a" -> 1.0, "b" -> 5.0, "c" -> 3.0))
  }

  test("topk/quantile/binops end-to-end over a three-series table") {
    import spark.implicits._
    val t0 = 100000L
    val df = Seq(("a", 1.0), ("b", 5.0), ("c", 3.0))
      .map { case (h, v) => (new java.sql.Timestamp(t0), h, v) }
      .toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(startMs = t0, endMs = t0, stepMs = 60000L)

    def run(q: String) = PromQL.eval(spark, bind, q, p).collect()

    val top = run("topk(2, m)").map(r => r.getAs[String]("host")).sorted
    assert(top.toSeq == Seq("b", "c"))
    val bottom = run("bottomk(1, m)").map(_.getAs[String]("host"))
    assert(bottom.toSeq == Seq("a"))
    val med = run("quantile(0.5, m)")
    assert(med.length == 1 && med(0).getAs[Double]("value") == 3.0)
    // vector ∘ scalar and vector ∘ vector (same label sets)
    val scaled = run("m * 10").map(r => (r.getAs[String]("host"), r.getAs[Double]("value")))
    assert(scaled.toMap == Map("a" -> 10.0, "b" -> 50.0, "c" -> 30.0))
    val zero = run("m - m").map(_.getAs[Double]("value"))
    assert(zero.length == 3 && zero.forall(_ == 0.0))
    val combo = run("sum(m) - avg(m)").map(_.getAs[Double]("value"))
    assert(combo.toSeq == Seq(9.0 - 3.0))
  }

  test("without grouping drops listed labels and keeps the rest") {
    // parser: both clause positions, distinguished from `by`
    assert(PromQL.parse("sum without (le) (m)") ==
      AggExpr("sum", Seq("le"), VectorSelector(Selector("m", Nil, None)),
        without = true))
    assert(PromQL.parse("avg(m) without (a, b)") ==
      AggExpr("avg", Seq("a", "b"), VectorSelector(Selector("m", Nil, None)),
        without = true))
    assert(PromQL.parse("quantile without (le) (0.5, m)") ==
      QuantileExpr(0.5, Seq("le"), VectorSelector(Selector("m", Nil, None)),
        without = true))

    import spark.implicits._
    val t0 = 100000L
    val df = Seq(("api", "10", 1.0), ("api", "50", 4.0),
                 ("db", "10", 2.0), ("db", "50", 8.0))
      .map { case (j, le, v) => (new java.sql.Timestamp(t0), j, le, v) }
      .toDF("ts", "job", "le", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("job", "le"))
    val p = EvalParams(startMs = t0, endMs = t0, stepMs = 60000L)
    val out = PromQL.eval(spark, bind, "sum without (le) (m)", p).collect()
      .map(r => (r.getAs[String]("job"), r.getAs[Double]("value"))).toMap
    assert(out == Map("api" -> 5.0, "db" -> 10.0))
    // unknown labels in `without` are ignored (Prometheus), unlike `by`
    val same = PromQL.eval(spark, bind, "sum without (nope) (m)", p).collect()
    assert(same.length == 4)
    intercept[IllegalArgumentException](
      PromQL.eval(spark, bind, "sum by (nope) (m)", p).collect())
  }

  test("label_replace / label_join rewrite labels without touching samples") {
    import spark.implicits._
    val t0 = 100000L
    val df = Seq(("api_eu", 1.0), ("api_us", 2.0), ("db_eu", 3.0))
      .map { case (h, v) => (new java.sql.Timestamp(t0), h, v) }
      .toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(startMs = t0, endMs = t0, stepMs = 60000L)
    def run(q: String) = PromQL.eval(spark, bind, q, p).collect()

    // capture-group expansion into a NEW label
    val svc = run("""label_replace(m, "svc", "$1", "host", "([a-z]+)_.*")""")
      .map(r => (r.getAs[String]("host"), r.getAs[String]("svc"))).toMap
    assert(svc == Map("api_eu" -> "api", "api_us" -> "api", "db_eu" -> "db"))
    // non-matching regex leaves the element unchanged (dst absent -> "")
    val nm = run("""label_replace(m, "svc", "$1", "host", "zzz(.*)")""")
      .map(_.getAs[String]("svc")).distinct
    assert(nm.toSeq == Seq(""))
    // overwrite an EXISTING label and aggregate over the rewritten one
    val agg = run("""sum by (host) (label_replace(m, "host", "all", "host", ".*"))""")
    assert(agg.length == 1 && agg.head.getAs[Double]("value") == 6.0)
    // label_join concatenates sources (missing labels read as empty)
    val lj = run("""label_join(m, "j", "-", "host", "nope")""")
      .map(_.getAs[String]("j")).sorted
    assert(lj.toSeq == Seq("api_eu-", "api_us-", "db_eu-"))
    // bad destination label errors
    intercept[Exception](run("""label_replace(m, "2bad", "x", "host", ".*")"""))
  }

  test("histogram_quantile interpolates inside the winning bucket") {
    import spark.implicits._
    val t0 = 100000L
    // one histogram, cumulative buckets: le=1:10, le=2:30, le=4:30, +Inf:40
    val df = Seq(("1", 10.0), ("2", 30.0), ("4", 30.0), ("+Inf", 40.0))
      .map { case (le, c) => (new java.sql.Timestamp(t0), "h1", le, c) }
      .toDF("ts", "host", "le", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host", "le"))
    val p = EvalParams(startMs = t0, endMs = t0, stepMs = 60000L)
    def hq(phi: Double): Double =
      PromQL.eval(spark, bind, s"histogram_quantile($phi, m)", p)
        .collect().head.getAs[Double]("value")

    // rank = 0.5*40 = 20 -> bucket (1,2]: 1 + 1*(20-10)/(30-10) = 1.5
    assert(math.abs(hq(0.5) - 1.5) < 1e-9)
    // rank = 0.25*40 = 10 -> first bucket (0,1]: 0 + 1*(10/10) = 1.0
    assert(math.abs(hq(0.25) - 1.0) < 1e-9)
    // rank = 0.95*40 = 38 -> only +Inf reaches: clamp to highest finite le
    assert(hq(0.95) == 4.0)
    // output drops the le label but keeps the series label
    val out = PromQL.eval(spark, bind, "histogram_quantile(0.5, m)", p)
    assert(out.columns.toSet == Set("host", "ts", "value"))
  }

  test("offset shifts evaluation into the past") {
    import spark.implicits._
    val df = Seq(
      (new java.sql.Timestamp(10000L), "a", 1.0),
      (new java.sql.Timestamp(70000L), "a", 2.0)).toDF("ts", "host", "value")
    val p = EvalParams(startMs = 120000L, endMs = 120000L, stepMs = 60000L,
      lookbackMs = 30000L)
    // without offset: lookback (90s,120s] has no samples
    assert(PromQL.eval(spark,
      _ => PromQL.SeriesTable(df, "ts", "value", Seq("host")), "m", p)
      .collect().isEmpty)
    // offset 60s: evaluates at 60s -> sample at 70s... still outside (30,60];
    // offset 50s: evaluates (40,70] -> the 70s sample surfaces at t=120s
    val out = PromQL.eval(spark,
      _ => PromQL.SeriesTable(df, "ts", "value", Seq("host")), "m offset 50s", p)
      .collect()
    assert(out.length == 1 && out(0).getDouble(2) == 2.0)
  }

  // ------------------------------------------------- extrapolation algebra

  test("extrapolated rate: perfectly covering counter matches slope exactly") {
    // samples every 10s across the full [0,60]s window, +1 per sample
    val w = s((10000L, 1.0), (20000L, 2.0), (30000L, 3.0), (40000L, 4.0),
      (50000L, 5.0), (60000L, 6.0))
    // sampled=50s, edges 10s/0s < 11s threshold ⇒ extrapolate to 60s:
    // 5 * (60/50) / 60 = 0.1/s — the true 1-per-10s rate
    val r = PromAlign.extrapolated(w, 0, w.length, 0L, 60000L,
      counter = true, perSecond = true).get
    assert(math.abs(r - 0.1) < 1e-12)
  }

  test("extrapolated rate: counter reset is corrected") {
    // 5 → 7 → reset → 2 → 4: true increase = 2 + 7-5 + 2... reset adds prev(7)
    val w = s((10000L, 5.0), (20000L, 7.0), (30000L, 2.0), (40000L, 4.0))
    // raw = 4-5 = -1; resets add 7 ⇒ 6; without reset handling it'd be negative
    val inc = PromAlign.extrapolated(w, 0, w.length, 0L, 60000L,
      counter = true, perSecond = false).get
    assert(inc > 0, s"reset-corrected increase must be positive, got $inc")
    val gauge = PromAlign.extrapolated(w, 0, w.length, 0L, 60000L,
      counter = false, perSecond = false).get
    assert(gauge < 0, "gauge delta ignores resets and stays negative")
  }

  test("extrapolation caps at half average spacing for distant edges") {
    // two samples bunched mid-window: edges (25s) >> threshold (27.5? no: avg
    // spacing 10s ⇒ threshold 11s) ⇒ each edge contributes avg/2 = 5s
    // base value high enough that the zero cap (100s) exceeds the edge gaps
    val w = s((25000L, 100.0), (35000L, 110.0))
    val inc = PromAlign.extrapolated(w, 0, w.length, 0L, 60000L,
      counter = true, perSecond = false).get
    // extrap = 10 + 5 + 5 = 20s over sampled 10s ⇒ 10 * 2 = 20
    assert(math.abs(inc - 20.0) < 1e-12)
  }

  test("counter extrapolation to zero caps the start-side gap") {
    // first value tiny: extrapolating the full 30s gap would go below zero;
    // durationToZero = sampled * v0/result = 10 * 0.5/10 = 0.5s < 30s gap
    val w = s((30000L, 0.5), (40000L, 10.5))
    val inc = PromAlign.extrapolated(w, 0, w.length, 0L, 60000L,
      counter = true, perSecond = false).get
    // extrap = 10 + 0.5 + 5 (end gap 20s > 11s thr) = 15.5 ⇒ 10*1.55
    assert(math.abs(inc - 15.5) < 1e-12)
  }

  test("fewer than two samples or zero span yields no result") {
    assert(PromAlign.extrapolated(s((10000L, 1.0)), 0, 1, 0L, 60000L,
      counter = true, perSecond = true).isEmpty)
    val dup = s((10000L, 1.0), (10000L, 2.0))
    assert(PromAlign.extrapolated(dup, 0, 2, 0L, 60000L,
      counter = true, perSecond = true).isEmpty)
  }

  test("irate/idelta use only the last two samples") {
    val w = s((10000L, 0.0), (30000L, 100.0), (40000L, 104.0))
    val ir = PromAlign.lastTwo(w, 0, w.length, counter = true, perSecond = true).get
    assert(math.abs(ir - 0.4) < 1e-12) // (104-100)/10s
    // counter reset: last < prev ⇒ diff = last
    val wr = s((30000L, 100.0), (40000L, 4.0))
    val irr = PromAlign.lastTwo(wr, 0, 2, counter = true, perSecond = true).get
    assert(math.abs(irr - 0.4) < 1e-12) // 4/10s
    val idl = PromAlign.lastTwo(wr, 0, 2, counter = false, perSecond = false).get
    assert(math.abs(idl - (-96.0)) < 1e-12)
  }

  test("instant alignment honors the lookback window") {
    val w = s((10000L, 1.0), (100000L, 2.0))
    val p = EvalParams(startMs = 60000L, endMs = 300000L, stepMs = 60000L,
      lookbackMs = 60000L)
    val pts = PromAlign.alignInstant(w, p).toMap
    assert(pts(60000L) == 1.0)       // sample at 10s within (0,60]
    assert(pts(120000L) == 2.0)      // sample at 100s within (60,120]
    assert(!pts.contains(180000L))   // 100s sample aged out of (120,180]
    assert(!pts.contains(240000L))
  }

  // ------------------------------------------------------------ end-to-end

  test("remote read: __name__ selects the table, matchers filter, raw samples") {
    import spark.implicits._
    val df = Seq(
      (new java.sql.Timestamp(1000L), "a", 1.0),
      (new java.sql.Timestamp(2000L), "b", 2.0),
      (new java.sql.Timestamp(9000L), "a", 3.0)).toDF("ts", "host", "value")
    val out = PromQL.remoteRead(
      _ => PromQL.SeriesTable(df, "ts", "value", Seq("host")),
      Seq(EqMatcher("__name__", "m"), EqMatcher("host", "a")), 0L, 5000L)
      .collect()
    assert(out.length == 1 && out(0).getString(0) == "a" && out(0).getDouble(2) == 1.0)
    intercept[IllegalArgumentException] {
      PromQL.remoteRead(_ => null, Seq(EqMatcher("host", "a")), 0L, 1L)
    }
  }

  test("end-to-end: rate over a synthetic two-series table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // series A: +1/s counter sampled every 10s; series B: constant
    val rows = (0 until 37).map { i =>
      (new java.sql.Timestamp(1704844800000L + i * 10000L), "a", i * 10.0)
    } ++ (0 until 37).map { i =>
      (new java.sql.Timestamp(1704844800000L + i * 10000L), "b", 5.0)
    }
    val df = rows.toDF("ts", "host", "value")
    val p = EvalParams(1704845160000L, 1704845160000L, 60000L) // one step @ +6m
    val out = PromQL.eval(spark, _ => PromQL.SeriesTable(df, "ts", "value", Seq("host")),
      "rate(m[5m])", p).collect()
    val byHost = out.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(byHost("a") - 1.0) < 1e-9, s"counter slope ≈ 1/s, got ${byHost("a")}")
    assert(math.abs(byHost("b") - 0.0) < 1e-9)
    // aggregation path
    val sum = PromQL.eval(spark, _ => PromQL.SeriesTable(df, "ts", "value", Seq("host")),
      "sum(rate(m[5m]))", p).collect()
    assert(sum.length == 1 && math.abs(sum(0).getDouble(1) - 1.0) < 1e-9)
  }

  test("absent(): 1 at steps with no elements, empty when data exists") {
    import spark.implicits._
    val t0 = 100000L
    val df = Seq((new java.sql.Timestamp(t0), "a", 5.0)).toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    // three steps: data only within lookback of the first
    val p = EvalParams(startMs = t0, endMs = t0 + 1200000L, stepMs = 600000L)
    val out = PromQL.eval(spark, bind, "absent(m)", p)
      .collect().map(r => r.getAs[java.sql.Timestamp]("ts").getTime).sorted
    assert(out.toSeq == Seq(t0 + 600000L, t0 + 1200000L))
    // a filter that empties the vector → absent everywhere
    assert(PromQL.eval(spark, bind, "absent(m > 10)", p).count() == 3)
    // data at a step → that step missing from absent()
    assert(PromQL.eval(spark, bind, "absent(m <= 10)", p).count() == 2)
  }

  test("deriv: least-squares slope; count_values: per-step value histogram") {
    // perfectly linear: slope exact regardless of window coverage
    val lin = s((0 until 10).map(i => (i * 10000L, 3.0 + 0.5 * i)): _*)
    val d = PromAlign.linearSlope(lin, 0, lin.length)
    assert(d.isDefined && math.abs(d.get - 0.05) < 1e-12) // 0.5 per 10s
    // two points: slope = dv/dt; degenerate cases yield nothing
    assert(PromAlign.linearSlope(s((0L, 1.0), (2000L, 5.0)), 0, 2).contains(2.0))
    assert(PromAlign.linearSlope(s((0L, 1.0)), 0, 1).isEmpty)
    assert(PromAlign.linearSlope(s((0L, 1.0), (0L, 1.0)), 0, 2).isEmpty)

    import spark.implicits._
    val t0 = 100000L
    val df = Seq(("a", 2.0), ("b", 2.0), ("c", 7.0))
      .map { case (h, v) => (new java.sql.Timestamp(t0), h, v) }
      .toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(startMs = t0, endMs = t0, stepMs = 60000L)
    val cv = PromQL.eval(spark, bind, """count_values("v", m)""", p)
      .collect().map(r => r.getAs[String]("v") -> r.getAs[Double]("value")).toMap
    assert(cv == Map("2.0" -> 2.0, "7.0" -> 1.0))
  }

  test("comparison filters: threshold keeps elements, bool maps to 0/1") {
    import spark.implicits._
    val t0 = 100000L
    val df = Seq(("a", 1.0), ("b", 5.0), ("c", 3.0))
      .map { case (h, v) => (new java.sql.Timestamp(t0), h, v) }
      .toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(startMs = t0, endMs = t0, stepMs = 60000L)
    def run(q: String) = PromQL.eval(spark, bind, q, p)
      .collect().map(r => r.getAs[String]("host") -> r.getAs[Double]("value")).toMap

    assert(run("m > 2") == Map("b" -> 5.0, "c" -> 3.0))
    assert(run("m <= 3") == Map("a" -> 1.0, "c" -> 3.0))
    assert(run("m == 5") == Map("b" -> 5.0))
    assert(run("m != 5") == Map("a" -> 1.0, "c" -> 3.0))
    // scalar on the left flips the comparison
    assert(run("2 < m") == Map("b" -> 5.0, "c" -> 3.0))
    // bool keeps every element as 0/1
    assert(run("m > bool 2") == Map("a" -> 0.0, "b" -> 1.0, "c" -> 1.0))
    // precedence: arithmetic binds tighter; set ops looser
    assert(run("m * 2 > 5") == Map("b" -> 10.0, "c" -> 6.0))
    assert(run("m > 2 and m < 4") == Map("c" -> 3.0))
    // composes under aggregation
    val agg = PromQL.eval(spark, bind, "sum(m > 2)", p).collect()
    assert(agg.length == 1 && agg(0).getAs[Double]("value") == 8.0)
  }

  test("vector matching: on/ignoring keys, group_left many-to-one + include") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = 1704844800000L
    val ts = new java.sql.Timestamp(base)
    // per-(host,cpu) usage vs per-host capacity (different label sets)
    val usage = Seq(
      (ts, "h1", "cpu0", 10.0), (ts, "h1", "cpu1", 30.0), (ts, "h2", "cpu0", 50.0))
      .toDF("ts", "host", "cpu", "value")
    val capacity = Seq((ts, "h1", 100.0), (ts, "h2", 200.0), (ts, "h1x", 1.0))
      .toDF("ts", "host", "value")
    val resolve: String => PromQL.SeriesTable = {
      case "usage"    => PromQL.SeriesTable(usage, "ts", "value", Seq("host", "cpu"))
      case "capacity" => PromQL.SeriesTable(capacity, "ts", "value", Seq("host"))
    }
    val p = EvalParams(base, base, 60000L)

    // group_left: every (host,cpu) row divides by its host's capacity
    val gl = PromQL.eval(spark, resolve, "usage / on(host) group_left capacity", p)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[String]("cpu")) ->
        r.getAs[Double]("value")).toMap
    assert(gl == Map(("h1", "cpu0") -> 0.1, ("h1", "cpu1") -> 0.3, ("h2", "cpu0") -> 0.25))

    // one-to-one on(host) after collapsing cpu: result keeps only host
    val oto = PromQL.eval(spark, resolve,
      "sum by (host) (usage) / on(host) capacity", p)
      .collect().map(r => r.getAs[String]("host") -> r.getAs[Double]("value")).toMap
    assert(oto == Map("h1" -> 0.4, "h2" -> 0.25))

    // ignoring(cpu) ≡ on(host) here
    val ign = PromQL.eval(spark, resolve,
      "usage * ignoring(cpu) group_left capacity", p)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[String]("cpu")) ->
        r.getAs[Double]("value")).toMap
    assert(ign(("h1", "cpu1")) == 3000.0)

    // group_right: the many side on the right keeps its labels
    val gr = PromQL.eval(spark, resolve, "capacity + on(host) group_right usage", p)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[String]("cpu")) ->
        r.getAs[Double]("value")).toMap
    assert(gr(("h1", "cpu0")) == 110.0 && gr(("h2", "cpu0")) == 250.0)

    // parser shape, include list
    assert(PromQL.parse("a / on(host) group_left(region) b") ==
      BinExpr("/", VectorSelector(Selector("a", Nil, None, 0, None)),
        VectorSelector(Selector("b", Nil, None, 0, None)),
        Some(VectorMatching(on = true, Seq("host"),
          groupLeft = true, include = Seq("region")))))
  }

  test("subqueries: f(expr[range:step]) evaluates on an absolute inner grid") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // +1/s counter sampled every 10s from an aligned base
    val base = 1704844800000L
    val df = (0 until 37).map { i =>
      (new java.sql.Timestamp(base + i * 10000L), "a", i * 10.0)
    }.toDF("ts", "host", "value")
    val tbl = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(base + 360000L, base + 360000L, 60000L) // one step @ +6m

    // inner rate over perfectly covered 2m windows is exactly 1.0/s at
    // every inner step, so the outer max is 1.0
    val mx = PromQL.eval(spark, tbl, "max_over_time(rate(m[2m])[4m:1m])", p).collect()
    assert(mx.length == 1 && math.abs(mx(0).getDouble(2) - 1.0) < 1e-9)

    // subquery over an instant selector: inner points at +4m (240) and
    // +6m (360) under the default 5m lookback → avg 300
    val av = PromQL.eval(spark, tbl, "avg_over_time(m[4m:2m])", p).collect()
    assert(av.length == 1 && math.abs(av(0).getDouble(2) - 300.0) < 1e-9,
      s"got ${av.toSeq}")

    // quantile variant parses and evaluates over the same inner grid
    val q5 = PromQL.eval(spark, tbl, "quantile_over_time(0.5, m[4m:2m])", p).collect()
    assert(q5.length == 1 && math.abs(q5(0).getDouble(2) - 300.0) < 1e-9)

    // plain range selectors still parse through the same branch
    assert(PromQL.parse("rate(m[5m])") ==
      RangeFunc("rate", Selector("m", Nil, Some(300000L), 0, None)))
    assert(PromQL.parse("max_over_time(rate(m[5m])[1h:5m])") ==
      SubqueryFunc("max_over_time",
        RangeFunc("rate", Selector("m", Nil, Some(300000L), 0, None)),
        3600000L, 300000L))
  }

  test("*_over_time family: plain window aggregates, no extrapolation") {
    import PromAlign.Sample
    // window (t-range, t] holds values 1..5
    val s = (1 to 5).map(i => Sample(1000L * i, i.toDouble)).toArray
    def ot(f: String, phi: Double = Double.NaN) =
      PromAlign.overTime(s, 0, s.length, f, phi)
    assert(ot("sum_over_time").contains(15.0))
    assert(ot("avg_over_time").contains(3.0))
    assert(ot("count_over_time").contains(5.0))
    assert(ot("min_over_time").contains(1.0))
    assert(ot("max_over_time").contains(5.0))
    assert(ot("last_over_time").contains(5.0))
    assert(ot("present_over_time").contains(1.0))
    // population moments: var([1..5]) = 2, stddev = sqrt(2)
    assert(ot("stdvar_over_time").contains(2.0))
    assert(math.abs(ot("stddev_over_time").get - math.sqrt(2.0)) < 1e-12)
    // linear interpolation between order statistics
    assert(ot("quantile_over_time", 0.5).contains(3.0))
    assert(ot("quantile_over_time", 0.75).contains(4.0))
    assert(math.abs(ot("quantile_over_time", 0.9).get - 4.6) < 1e-12)
    assert(ot("quantile_over_time", -0.1).contains(Double.NegativeInfinity))
    assert(ot("quantile_over_time", 1.5).contains(Double.PositiveInfinity))
    // empty window yields nothing
    assert(PromAlign.overTime(s, 2, 2, "avg_over_time", Double.NaN).isEmpty)

    // parser + grid path end-to-end: avg over the trailing 5m window
    import spark.implicits._
    val df = (0 until 37).map { i =>
      (new java.sql.Timestamp(1704844800000L + i * 10000L), "a", i.toDouble)
    }.toDF("ts", "host", "value")
    val p = EvalParams(1704845160000L, 1704845160000L, 60000L) // one step @ +6m
    val out = PromQL.eval(spark, _ => PromQL.SeriesTable(df, "ts", "value", Seq("host")),
      "avg_over_time(m[5m])", p).collect()
    // window (t-5m, t] = samples i=7..36 → avg = 21.5
    assert(out.length == 1 && math.abs(out(0).getDouble(2) - 21.5) < 1e-9)
    val q9 = PromQL.eval(spark, _ => PromQL.SeriesTable(df, "ts", "value", Seq("host")),
      "quantile_over_time(0.9, m[5m])", p).collect()
    // values 7..36, rank 0.9*29 = 26.1 → 7+26.1 = 33.1
    assert(q9.length == 1 && math.abs(q9(0).getDouble(2) - 33.1) < 1e-9)
  }

  test("predict_linear extrapolates the regression line; holt_winters smooths") {
    // exactly linear 0.5/s: prediction is exact anywhere on the line
    val lin = s((0L, 0.0), (10000L, 5.0), (20000L, 10.0))
    val pl = PromAlign.linearPredict(lin, 0, 3, evalMs = 20000L, horizonSec = 60.0)
    assert(pl.isDefined && math.abs(pl.get - 40.0) < 1e-9)
    // degenerate: <2 samples or zero time variance
    assert(PromAlign.linearPredict(s((0L, 1.0)), 0, 1, 0L, 60.0).isEmpty)
    assert(PromAlign.linearPredict(s((0L, 1.0), (0L, 2.0)), 0, 2, 0L, 60.0).isEmpty)

    // holt_winters hand-computed: v=[1,4,9], sf=0.5, tf=0.3
    //   s1=1, b=3; i=1: s1 = .5*4 + .5*(1+3) = 4
    //   i=2: b = .3*(4-1)+.7*3 = 3; s1 = .5*9 + .5*(4+3) = 8
    val hw = PromAlign.holtWinters(
      s((0L, 1.0), (1000L, 4.0), (2000L, 9.0)), 0, 3, 0.5, 0.3)
    assert(hw.isDefined && math.abs(hw.get - 8.0) < 1e-12)
    assert(PromAlign.holtWinters(s((0L, 1.0)), 0, 1, 0.5, 0.3).isEmpty)
    intercept[IllegalArgumentException](
      PromAlign.holtWinters(s((0L, 1.0), (1L, 2.0)), 0, 2, 1.5, 0.3))

    // parser: trailing scalar arguments after the range
    assert(PromQL.parse("predict_linear(m[5m], 600)") ==
      RangeFunc("predict_linear", Selector("m", Nil, Some(300000L)), Some(600.0)))
    assert(PromQL.parse("holt_winters(m[5m], 0.5, 0.3)") ==
      RangeFunc("holt_winters", Selector("m", Nil, Some(300000L)),
        Some(0.5), Some(0.3)))
    assert(PromQL.parse("double_exponential_smoothing(m[5m], 0.5, 0.3)") ==
      RangeFunc("holt_winters", Selector("m", Nil, Some(300000L)),
        Some(0.5), Some(0.3)))
    intercept[IllegalArgumentException](PromQL.parse("predict_linear(m[5m])"))
    intercept[IllegalArgumentException](PromQL.parse("holt_winters(m[5m], 0.5)"))

    // grid path: counter at +1/s predicted 60s past the window end
    import spark.implicits._
    val df = (0 until 37).map { i =>
      (new java.sql.Timestamp(1704844800000L + i * 10000L), "a", i * 10.0)
    }.toDF("ts", "host", "value")
    val p = EvalParams(1704845160000L, 1704845160000L, 60000L) // t = +360s
    val out = PromQL.eval(spark, _ => PromQL.SeriesTable(df, "ts", "value", Seq("host")),
      "predict_linear(m[5m], 60)", p).collect()
    // line v = t (seconds); prediction at t=420s → 420
    assert(out.length == 1 && math.abs(out(0).getDouble(2) - 420.0) < 1e-6)
  }

  test("sort/sort_desc order the output frame by value") {
    import spark.implicits._
    val t0 = 1704844800000L
    val df = Seq(
      (new java.sql.Timestamp(t0), "a", 5.0),
      (new java.sql.Timestamp(t0), "b", 1.0),
      (new java.sql.Timestamp(t0), "c", 3.0)).toDF("ts", "host", "value")
    val p = EvalParams(t0, t0, 60000L)
    def vals(q: String): Seq[Double] =
      PromQL.eval(spark, _ => PromQL.SeriesTable(df, "ts", "value", Seq("host")),
        q, p).collect().map(_.getAs[Double]("value")).toSeq
    assert(vals("sort(m)") == Seq(1.0, 3.0, 5.0))
    assert(vals("sort_desc(m)") == Seq(5.0, 3.0, 1.0))
  }

  test("scalar()/vector()/time() frames and scalar∘vector binops") {
    import spark.implicits._
    val t0 = 1704844800000L
    val df = Seq(("a", 10.0), ("b", 30.0))
      .map { case (h, v) => (new java.sql.Timestamp(t0), h, v) }
      .toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    val p = EvalParams(t0, t0 + 60000L, 60000L) // two steps; data at step 1 only

    // vector(5): label-less frame across the whole grid
    val v5 = PromQL.eval(spark, bind, "vector(5)", p).collect()
    assert(v5.length == 2 && v5.forall(_.getAs[Double]("value") == 5.0))

    // time(): seconds of each step
    val tf = PromQL.eval(spark, bind, "time()", p)
      .collect().map(_.getAs[Double]("value")).sorted
    assert(tf.toSeq == Seq(t0 / 1000.0, t0 / 1000.0 + 60))

    // scalar(sum(m)): 40 at both steps (the 5m lookback covers step 2);
    // NaN once the grid outruns the lookback window
    val sc = PromQL.eval(spark, bind, "scalar(sum(m))", p)
      .collect().map(r => r.getAs[java.sql.Timestamp]("ts").getTime ->
        r.getAs[Double]("value")).toMap
    assert(sc(t0) == 40.0 && sc(t0 + 60000L) == 40.0)
    val far = PromQL.eval(spark, bind, "scalar(sum(m))",
      EvalParams(t0 + 600000L, t0 + 600000L, 60000L)).collect()
    assert(far.length == 1 && far(0).getAs[Double]("value").isNaN)
    // scalar() of a 2-element vector is NaN
    val sc2 = PromQL.eval(spark, bind, "scalar(m)", p)
      .collect().map(_.getAs[Double]("value"))
    assert(sc2.forall(_.isNaN))

    // vector ∘ per-step scalar frame: share-of-total per series
    val share = PromQL.eval(spark, bind, "m * 100 / scalar(sum(m))", p)
      .collect().map(r => r.getAs[String]("host") -> r.getAs[Double]("value")).toMap
    assert(share("a") == 25.0 && share("b") == 75.0)
    // scalar frame on the left
    val inv = PromQL.eval(spark, bind, "scalar(sum(m)) - m", p)
      .collect().map(r => r.getAs[String]("host") -> r.getAs[Double]("value")).toMap
    assert(inv("a") == 30.0 && inv("b") == 10.0)
  }

  test("vector∘vector comparisons filter by matched element pairs") {
    import spark.implicits._
    val t0 = 1704844800000L
    val ts = new java.sql.Timestamp(t0)
    val cur = Seq((ts, "a", 10.0), (ts, "b", 30.0), (ts, "c", 7.0))
      .toDF("ts", "host", "value")
    val ref = Seq((ts, "a", 20.0), (ts, "b", 25.0), (ts, "c", 7.0))
      .toDF("ts", "host", "value")
    val resolve: String => PromQL.SeriesTable = {
      case "cur" => PromQL.SeriesTable(cur, "ts", "value", Seq("host"))
      case "ref" => PromQL.SeriesTable(ref, "ts", "value", Seq("host"))
    }
    val p = EvalParams(t0, t0, 60000L)
    def run(q: String) = PromQL.eval(spark, resolve, q, p)
      .collect().map(r => r.getAs[String]("host") -> r.getAs[Double]("value")).toMap

    // keeps lhs elements (with lhs value) where the pair satisfies the op
    assert(run("cur > ref") == Map("b" -> 30.0))
    assert(run("cur <= ref") == Map("a" -> 10.0, "c" -> 7.0))
    assert(run("cur == ref") == Map("c" -> 7.0))
    // bool: 0/1 for every matched pair, lhs labels
    assert(run("cur > bool ref") == Map("a" -> 0.0, "b" -> 1.0, "c" -> 0.0))
    // vector vs per-step scalar frame
    assert(run("cur > scalar(sum(ref) / vector(3))") == Map("b" -> 30.0))
  }

  test("absent_over_time, clamp/sgn/timestamp element-wise functions") {
    import spark.implicits._
    val t0 = 600000L
    val df = Seq((new java.sql.Timestamp(t0), "a", -5.0)).toDF("ts", "host", "value")
    val bind = (_: String) => PromQL.SeriesTable(df, "ts", "value", Seq("host"))
    // three steps, data within range of the first only
    val p = EvalParams(startMs = t0, endMs = t0 + 1200000L, stepMs = 600000L)
    val aot = PromQL.eval(spark, bind, "absent_over_time(m[5m])", p)
      .collect().map(_.getAs[java.sql.Timestamp]("ts").getTime).sorted
    assert(aot.toSeq == Seq(t0 + 600000L, t0 + 1200000L))
    // selector that never matches → absent at every step
    assert(PromQL.eval(spark, bind,
      """absent_over_time(m{host="zzz"}[5m])""", p).count() == 3)

    val p1 = EvalParams(t0, t0, 60000L)
    def one(q: String): Double = {
      val rows = PromQL.eval(spark, bind, q, p1).collect()
      assert(rows.length == 1); rows(0).getAs[Double]("value")
    }
    assert(one("clamp(m, -2, 2)") == -2.0)
    assert(one("clamp(m, 0, 10)") == 0.0)
    assert(PromQL.eval(spark, bind, "clamp(m, 5, 1)", p1).count() == 0) // min>max
    assert(one("sgn(m)") == -1.0)
    assert(one("sqrt(abs(m))") == math.sqrt(5.0))
    assert(one("exp(vector(0))") == 1.0)
    assert(one("ln(exp(vector(2)))") == 2.0)
    assert(one("log10(vector(1000))") == 3.0)
    assert(one("log2(vector(8))") == 3.0)
    assert(one("timestamp(m)") == t0 / 1000.0)
    intercept[IllegalArgumentException](PromQL.parse("clamp(m, 1)"))
  }
  test("recording rules: lifecycle, idempotent re-run, restart persistence") {
    import spark.implicits._
    import graft.promql.Recording
    val e = new graft.engine.TsdbEngine(spark, tmpDir("rules-wh"))
    val base = 1704067200000L
    val src = (0 until 12).map(i =>
      (new java.sql.Timestamp(base + i * 300000L), "a", i * 2.0))
      .toDF("ts", "event_type", "value")
    val resolve: String => PromQL.SeriesTable = {
      case "m" => PromQL.SeriesTable(src, "ts", "value", Seq("event_type"))
      case other => fail(s"unknown metric $other")
    }
    val p = EvalParams(startMs = base + 1800000L, endMs = base + 3600000L,
      stepMs = 900000L)
    Recording.create(e, "m_rate", "rate(m[15m])")
    intercept[IllegalArgumentException](Recording.create(e, "bad name", "m"))
    intercept[Exception](Recording.create(e, "bad_expr", "rate(m[15m")) // parse now
    val r1 = Recording.runRules(e, resolve, p)
    assert(r1.map(_._1) == Seq("m_rate") && r1.head._2 > 0)
    val snap1 = e.read("m_rate").collect().map(_.toString).sorted.toSeq
    // idempotent: re-running over the same grid upserts, never duplicates
    Recording.runRules(e, resolve, p)
    assert(e.read("m_rate").collect().map(_.toString).sorted.toSeq == snap1)
    // the registry is file-backed: a fresh engine on the warehouse sees it
    val e2 = new graft.engine.TsdbEngine(spark, e.warehouse)
    assert(Recording.list(e2).map(_._1) == Seq("m_rate"))
    assert(Recording.drop(e2, "m_rate") && Recording.list(e2).isEmpty)
  }
}
