package graft

import graft.engine.TsdbEngine
import graft.influx.{InfluxQL, LineProtocol}
import graft.opentsdb.OpenTsdb
import org.apache.spark.sql.functions._

class ProtocolsSpec extends SparkSpec {

  test("line protocol: escaping, field types, timestamps") {
    val p = LineProtocol.parseLine(
      """weather,location=us\ midwest,season=summer temperature=82.5,hot=true,n=5i,desc="dry, hot" 1465839830100400200""")
    assert(p.measurement == "weather")
    assert(p.tags == Seq("location" -> "us midwest", "season" -> "summer"))
    assert(p.fields == Seq(
      ("temperature", "double", "82.5"), ("hot", "boolean", "t"),
      ("n", "int64", "5"), ("desc", "string", "dry, hot")))
    assert(p.tsNanos == 1465839830100400200L)
  }

  test("line protocol: boolean literals accepted case-insensitively") {
    // InfluxDB accepts t/T/true/True/TRUE and f/F/false/False/FALSE
    for (raw <- Seq("TRUE", "True", "true", "t", "T")) {
      val p = LineProtocol.parseLine(s"m,k=v b=$raw 1704067200000000000")
      assert(p.fields == Seq(("b", "boolean", "t")), s"raw=$raw: ${p.fields}")
    }
    for (raw <- Seq("FALSE", "False", "false", "f", "F")) {
      val p = LineProtocol.parseLine(s"m,k=v b=$raw 1704067200000000000")
      assert(p.fields == Seq(("b", "boolean", "f")), s"raw=$raw: ${p.fields}")
    }
  }

  test("line protocol ingest auto-creates tables and round-trips rows") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("lp-test").toString)
    val lines = Seq(
      "cpu,host=a usage=0.5 1704067200000000000",
      "cpu,host=a usage=0.7 1704067260000000000",
      "cpu,host=b usage=0.9 1704067200000000000",
      "mem,host=a free=100i 1704067200000000000").toDS()
    val counts = LineProtocol.ingest(e, lines)
    assert(counts == Map("cpu" -> 3L, "mem" -> 1L))
    // auto-created schema: time key + host TAG + typed field
    val cpu = e.catalog.get("cpu")
    assert(cpu.timestampKey == "time")
    assert(cpu.columns.find(_.name == "host").exists(_.isTag))
    val rows = e.read("cpu").orderBy("time", "host").collect()
    assert(rows.length == 3)
    assert(e.read("mem").head().getAs[Long]("free") == 100L)
    // overwrite semantics through the same path: same series+time wins latest
    LineProtocol.ingest(e, Seq("cpu,host=a usage=0.6 1704067200000000000").toDS())
    val dedup = e.read("cpu").filter(col("host") === "a" &&
      col("time") === expr("timestamp_micros(1704067200000000)"))
    assert(dedup.count() == 1)
    assert(dedup.head().getAs[Double]("usage") == 0.6)
  }

  test("line protocol: varying field sets auto-add columns; type conflicts widen deterministically") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("lp-vary").toString)
    LineProtocol.ingest(e, Seq("cpu,host=a usage=0.5 1704067200000000000").toDS())
    // second batch: missing `usage`, new field `temp` -> auto-ADD, nulls fill
    LineProtocol.ingest(e, Seq("cpu,host=b temp=1.5 1704067260000000000").toDS())
    val cpu = e.read("cpu").orderBy("time").collect()
    assert(cpu.length == 2)
    assert(cpu(0).getAs[Double]("usage") == 0.5 && cpu(0).isNullAt(cpu(0).fieldIndex("temp")))
    assert(cpu(1).getAs[Double]("temp") == 1.5 && cpu(1).isNullAt(cpu(1).fieldIndex("usage")))
    // conflicting types in ONE batch: double wins over int64 (fixed precedence)
    LineProtocol.ingest(e, Seq(
      "mem,host=a free=3i 1704067200000000000",
      "mem,host=b free=3.5 1704067260000000000").toDS())
    assert(e.catalog.get("mem").column("free").kind == graft.model.DatumKind.Double)
    assert(e.read("mem").agg(org.apache.spark.sql.functions.sum("free"))
      .head().getDouble(0) == 6.5)
  }

  test("InfluxQL first()/last() are deterministic min_by/max_by over time") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-fl").toString)
    LineProtocol.ingest(e, Seq(
      "cpu,host=a usage=9.0 1704067200000000000",  // earliest
      "cpu,host=a usage=1.0 1704067260000000000",
      "cpu,host=a usage=4.0 1704067320000000000").toDS()) // latest
    val r = InfluxQL.run(e,
      "SELECT first(usage) AS f, last(usage) AS l FROM cpu").head()
    assert(r.getAs[Double]("f") == 9.0 && r.getAs[Double]("l") == 4.0)
  }

  test("InfluxQL: SELECT aggregate with GROUP BY time + tag, SHOW MEASUREMENTS") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-test").toString)
    LineProtocol.ingest(e, Seq(
      "cpu,host=a usage=1.0 1704067200000000000",  // 00:00
      "cpu,host=a usage=3.0 1704068100000000000",  // 00:15
      "cpu,host=a usage=5.0 1704070800000000000",  // 01:00
      "cpu,host=b usage=7.0 1704067200000000000").toDS())
    val out = InfluxQL.run(e,
      "SELECT mean(usage) AS m, count(usage) AS n FROM cpu WHERE host = 'a' GROUP BY time(1h)")
      .orderBy("time").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("m") == 2.0 && out(0).getAs[Long]("n") == 2L)
    assert(out(1).getAs[Double]("m") == 5.0)
    // raw projection with time predicate (ns epoch literal)
    val raw = InfluxQL.run(e,
      "SELECT usage FROM cpu WHERE time >= 1704068100000000000 AND host = 'a'").collect()
    assert(raw.map(_.getAs[Double]("usage")).toSet == Set(3.0, 5.0))
    assert(InfluxQL.run(e, "SHOW MEASUREMENTS").as[String].collect().toSeq == Seq("cpu"))
  }

  test("InfluxQL fill(): none/null/number/previous/linear over empty buckets") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-fill").toString)
    // hours 00 and 03 have data; 01 and 02 are holes
    LineProtocol.ingest(e, Seq(
      "cpu,host=a usage=2.0 1704067200000000000",   // 00:00
      "cpu,host=a usage=4.0 1704068100000000000",   // 00:15
      "cpu,host=a usage=8.0 1704078000000000000").toDS()) // 03:00
    def q(fill: String) = InfluxQL.run(e,
      s"SELECT sum(usage) AS s FROM cpu GROUP BY time(1h) $fill")
      .orderBy("time").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("time").getTime,
        Option(r.get(r.fieldIndex("s"))).map(_.asInstanceOf[Double])))

    val h = 3600000L; val base = 1704067200000L
    // DEFAULT is fill(null) (InfluxDB / reference golden semantics):
    // the grid materializes with null holes; fill(none) opts out
    assert(q("").toSeq == Seq(
      (base, Some(6.0)), (base + h, None), (base + 2 * h, None), (base + 3 * h, Some(8.0))))
    assert(q("fill(none)").length == 2)
    assert(q("fill(none)").map(_._1).toSeq == Seq(base, base + 3 * h))
    // null: grid materializes, holes stay null
    assert(q("fill(null)").toSeq == Seq(
      (base, Some(6.0)), (base + h, None), (base + 2 * h, None), (base + 3 * h, Some(8.0))))
    // number: holes become the constant
    assert(q("fill(0)").toSeq.map(_._2.get) == Seq(6.0, 0.0, 0.0, 8.0))
    // previous: carry the last seen bucket forward
    assert(q("fill(previous)").toSeq.map(_._2.get) == Seq(6.0, 6.0, 6.0, 8.0))
    // linear: interior interpolation between 6.0 and 8.0 over 3 steps
    val lin = q("fill(linear)").toSeq.map(_._2.get)
    assert(lin.head == 6.0 && lin.last == 8.0)
    assert(math.abs(lin(1) - (6.0 + 2.0 / 3)) < 1e-9 &&
           math.abs(lin(2) - (6.0 + 4.0 / 3)) < 1e-9, s"linear got $lin")
    // explicit WHERE bounds extend the grid beyond the data
    val bounded = InfluxQL.run(e,
      """SELECT sum(usage) AS s FROM cpu
        |WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 06:00:00'
        |GROUP BY time(1h) fill(0)""".stripMargin).orderBy("time").collect()
    assert(bounded.length == 6, s"got ${bounded.length} buckets")
    assert(bounded.map(_.getAs[Double]("s")).toSeq == Seq(6.0, 0.0, 0.0, 8.0, 0.0, 0.0))
    // empty/inverted WHERE window: zero rows, not a sequence error
    assert(InfluxQL.run(e,
      """SELECT sum(usage) AS s FROM cpu
        |WHERE time >= '2024-01-02 00:00:00' AND time < '2024-01-02 00:00:00'
        |GROUP BY time(1h) fill(0)""".stripMargin).count() == 0)
  }

  test("InfluxQL transformations: derivative/difference/moving_average/cumulative_sum") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-transform").toString)
    // hourly means: h0=2, h1=5, h2=missing, h3=11 (per-host series a only)
    LineProtocol.ingest(e, Seq(
      "cpu,host=a usage=1.0 1704067200000000000",  // 00:00
      "cpu,host=a usage=3.0 1704068100000000000",  // 00:15
      "cpu,host=a usage=5.0 1704070800000000000",  // 01:00
      "cpu,host=a usage=11.0 1704078000000000000", // 03:00
      "cpu,host=b usage=7.0 1704067200000000000").toDS())
    def q(proj: String) = InfluxQL.run(e,
      s"SELECT $proj FROM cpu WHERE host = 'a' GROUP BY time(1h), host")
      .orderBy("time").collect()

    // derivative per second: (5-2)/3600, then (11-5)/7200 across the hole
    // (null buckets are skipped, not zero-filled)
    val d = q("derivative(mean(usage), 1s) AS d").map(_.getAs[Double]("d"))
    assert(d.length == 2)
    assert(math.abs(d(0) - 3.0 / 3600) < 1e-12 && math.abs(d(1) - 6.0 / 7200) < 1e-12)
    // default unit is 1s
    val d2 = q("derivative(mean(usage)) AS d").map(_.getAs[Double]("d"))
    assert(d2.toSeq == d.toSeq)
    // per-hour unit
    val dh = q("derivative(mean(usage), 1h) AS d").map(_.getAs[Double]("d"))
    assert(math.abs(dh(0) - 3.0) < 1e-12 && math.abs(dh(1) - 3.0) < 1e-12)
    // non_negative_derivative drops the negative segment
    LineProtocol.ingest(e, Seq("cpu,host=a usage=0.0 1704081600000000000").toDS()) // 04:00
    val nn = q("non_negative_derivative(mean(usage), 1h) AS d").map(_.getAs[Double]("d"))
    assert(nn.length == 2, s"negative segment must drop, got ${nn.toSeq}")
    // difference between consecutive non-null buckets
    val diff = q("difference(mean(usage)) AS d").map(_.getAs[Double]("d"))
    assert(diff.toSeq == Seq(3.0, 6.0, -11.0))
    // moving_average over 2 buckets emits from the 2nd point on
    val ma = q("moving_average(mean(usage), 2) AS m").map(_.getAs[Double]("m"))
    assert(ma.toSeq == Seq(3.5, 8.0, 5.5))
    // cumulative_sum runs over every non-null bucket
    val cs = q("cumulative_sum(mean(usage)) AS c").map(_.getAs[Double]("c"))
    assert(cs.toSeq == Seq(2.0, 7.0, 18.0, 18.0))
    // transformation without GROUP BY time over an aggregate is rejected
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "SELECT derivative(mean(usage)) FROM cpu"))
  }

  test("InfluxQL multiple transformations, raw-point transforms, mixed aggs") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-multi").toString)
    LineProtocol.ingest(e, Seq(
      "cpu,host=a usage=1.0 1704067200000000000",  // 00:00
      "cpu,host=a usage=3.0 1704068100000000000",  // 00:15
      "cpu,host=a usage=5.0 1704070800000000000",  // 01:00
      "cpu,host=a usage=11.0 1704078000000000000"  // 03:00
    ).toDS())

    // two transformations in one SELECT: each windows its own aggregate
    val multi = InfluxQL.run(e,
      """SELECT difference(mean(usage)) AS d, cumulative_sum(max(usage)) AS c
        |FROM cpu WHERE host = 'a' GROUP BY time(1h), host""".stripMargin)
      .orderBy("time").collect()
    // hourly means 2,5,_,11; maxima 3,5,_,11. difference emits from bucket
    // 2; cumulative_sum from bucket 1 → union keeps all 3 non-null buckets
    assert(multi.length == 3)
    assert(multi.map(r => Option(r.getAs[java.lang.Double]("d")).map(_.toDouble)).toSeq ==
      Seq(None, Some(3.0), Some(6.0)))
    assert(multi.map(_.getAs[Double]("c")).toSeq == Seq(3.0, 8.0, 19.0))

    // mixed: plain aggregate rows all survive, transform null on the first
    val mixed = InfluxQL.run(e,
      """SELECT mean(usage) AS m, difference(mean(usage)) AS d
        |FROM cpu WHERE host = 'a' GROUP BY time(1h), host fill(none)""".stripMargin)
      .orderBy("time").collect()
    assert(mixed.length == 3)
    assert(mixed.map(_.getAs[Double]("m")).toSeq == Seq(2.0, 5.0, 11.0))
    assert(Option(mixed(0).getAs[java.lang.Double]("d")).isEmpty)

    // raw-point transformation: derivative over the actual samples
    val raw = InfluxQL.run(e,
      "SELECT derivative(usage, 1s) AS d FROM cpu WHERE host = 'a'")
      .orderBy("time").collect().map(_.getAs[Double]("d"))
    assert(raw.length == 3)
    assert(math.abs(raw(0) - 2.0 / 900) < 1e-12)
    assert(math.abs(raw(1) - 2.0 / 2700) < 1e-12)
    assert(math.abs(raw(2) - 6.0 / 7200) < 1e-12)
    // raw difference
    val rdiff = InfluxQL.run(e,
      "SELECT difference(usage) AS d FROM cpu WHERE host = 'a'")
      .orderBy("time").collect().map(_.getAs[Double]("d"))
    assert(rdiff.toSeq == Seq(2.0, 2.0, 6.0))
    // mixing raw fields with transformations stays rejected
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "SELECT usage, derivative(usage) FROM cpu"))
  }

  test("InfluxQL percentile (nearest-rank) and mode selectors") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-pct").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a v=1.0 1704067200000000000",
      "m,host=a v=3.0 1704067260000000000",
      "m,host=a v=3.0 1704067320000000000",
      "m,host=a v=5.0 1704067380000000000",
      "m,host=b v=4.0 1704067200000000000",
      "m,host=b v=4.0 1704067260000000000",
      "m,host=b v=2.0 1704067320000000000",
      "m,host=b v=2.0 1704067380000000000").toDS())
    def by(q: String, out: String): Map[String, Double] =
      InfluxQL.run(e, q).collect()
        .map(r => r.getAs[String]("host") -> r.getAs[Double](out)).toMap

    // nearest rank ⌊n·p/100+0.5⌋: a=[1,3,3,5] p50 → idx 2 → 3;
    // p90 → idx 4 → 5; p10 → idx 0 → out of range → no value
    assert(by("SELECT percentile(v, 50) AS p FROM m GROUP BY host", "p") ==
      Map("a" -> 3.0, "b" -> 2.0))
    assert(by("SELECT percentile(v, 90) AS p FROM m GROUP BY host", "p") ==
      Map("a" -> 5.0, "b" -> 4.0))
    val p10 = InfluxQL.run(e, "SELECT percentile(v, 10) AS p FROM m GROUP BY host")
      .collect().map(r => Option(r.getAs[java.lang.Double]("p")))
    assert(p10.forall(_.isEmpty))
    // mode: most frequent, lowest wins ties (b: 4,4,2,2 → 2)
    assert(by("SELECT mode(v) AS mo FROM m GROUP BY host", "mo") ==
      Map("a" -> 3.0, "b" -> 2.0))
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "SELECT percentile(v) AS p FROM m GROUP BY host"))
  }

  test("InfluxQL distinct/count(distinct)/integral selectors") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-int").toString)
    // host a: v = 0 @t0, 2 @t0+60s, 2 @t0+120s → trapezoids 60·1 + 60·2
    LineProtocol.ingest(e, Seq(
      "m,host=a v=0.0,u=1i 1704067200000000000",
      "m,host=a v=2.0,u=2i 1704067260000000000",
      "m,host=a v=2.0,u=1i 1704067320000000000",
      "m,host=b v=4.0,u=7i 1704067200000000000").toDS())
    val itg = InfluxQL.run(e, "SELECT integral(v) AS itg FROM m GROUP BY host")
      .collect().map(r => r.getAs[String]("host") -> r.getAs[java.lang.Double]("itg")).toMap
    assert(itg("a") == 180.0)
    assert(itg("b") == null) // single point: no trapezoid
    // minute units scale the area down by 60
    val itgM = InfluxQL.run(e, "SELECT integral(v, 1m) AS itg FROM m GROUP BY host")
      .collect().map(r => r.getAs[String]("host") -> r.getAs[java.lang.Double]("itg")).toMap
    assert(itgM("a") == 3.0)
    // count(distinct())
    val cd = InfluxQL.run(e, "SELECT count(distinct(u)) FROM m GROUP BY host")
      .collect().map(r => r.getAs[String]("host") -> r.getAs[Long]("count")).toMap
    assert(cd == Map("a" -> 2L, "b" -> 1L))
    // distinct(): multi-row selector, epoch-0 time when ungrouped
    val d = InfluxQL.run(e, "SELECT distinct(u) FROM m GROUP BY host")
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Long]("distinct"),
        r.getAs[java.sql.Timestamp]("time").getTime))
    assert(d.toSet == Set(("a", 1L, 0L), ("a", 2L, 0L), ("b", 7L, 0L)))
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "SELECT distinct(u), mean(v) FROM m GROUP BY host"))
  }

  test("InfluxQL top/bottom selectors keep point times and break ties early") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-top").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a v=1.0 1704067200000000000",
      "m,host=a v=5.0 1704067260000000000",
      "m,host=a v=5.0 1704067320000000000", // tie: earlier 5.0 ranks first
      "m,host=a v=3.0 1704067380000000000",
      "m,host=b v=9.0 1704067200000000000").toDS())
    val top2 = InfluxQL.run(e, "SELECT top(v, 2) FROM m GROUP BY host")
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Double]("top"),
        r.getAs[java.sql.Timestamp]("time").getTime)).toSet
    assert(top2 == Set(
      ("a", 5.0, 1704067260000L), ("a", 5.0, 1704067320000L),
      ("b", 9.0, 1704067200000L)))
    val bot1 = InfluxQL.run(e, "SELECT bottom(v, 1) AS lo FROM m GROUP BY host")
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Double]("lo"))).toSet
    assert(bot1 == Set(("a", 1.0), ("b", 9.0)))
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "SELECT top(v) FROM m GROUP BY host"))
  }

  test("InfluxQL elapsed(): integer point spacing, ns default, unit truncation") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-ela").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a v=1.0 1704067200000000000",
      "m,host=a v=2.0 1704067290000000000", // +90 s
      "m,host=a v=3.0 1704067291500000000", // +1.5 s
      "m,host=b v=9.0 1704067200000000000").toDS())
    val ns = InfluxQL.run(e, "SELECT elapsed(v) FROM m GROUP BY host")
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Long]("elapsed"))).toSet
    assert(ns == Set(("a", 90000000000L), ("a", 1500000000L)))
    val m1 = InfluxQL.run(e, "SELECT elapsed(v, 1m) AS g FROM m GROUP BY host")
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Long]("g"))).toSet
    assert(m1 == Set(("a", 1L), ("a", 0L))) // 90 s → 1 min, 1.5 s → 0
  }

  test("InfluxQL scalar math: raw fields, aggregate wraps, log/pow args") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-math").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a v=-2.5 1704067200000000000",
      "m,host=a v=4.0 1704067260000000000",
      "m,host=b v=9.0 1704067200000000000").toDS())
    // raw points: column named after the function, element-wise
    val a = InfluxQL.run(e, "SELECT abs(v) FROM m")
      .collect().map(_.getAs[Double]("abs")).sorted.toSeq
    assert(a == Seq(2.5, 4.0, 9.0))
    val s = InfluxQL.run(e, "SELECT sqrt(v) AS r FROM m WHERE host = 'b'")
      .collect().map(_.getAs[Double]("r")).toSeq
    assert(s == Seq(3.0))
    // around an aggregate, with GROUP BY: mean(a) = 0.75 → round → 1
    val r = InfluxQL.run(e, "SELECT round(mean(v)) FROM m GROUP BY host")
      .collect().map(x => (x.getAs[String]("host"), x.getAs[Double]("round"))).toSet
    assert(r == Set(("a", 1.0), ("b", 9.0)))
    // Go math.Round: half away from zero
    val neg = InfluxQL.run(e, "SELECT round(v) FROM m WHERE host = 'a'")
      .collect().map(_.getAs[Double]("round")).sorted.toSeq
    assert(neg == Seq(-3.0, 4.0))
    // log base + pow exponent
    val lg = InfluxQL.run(e, "SELECT log(v, 2) AS l FROM m WHERE host = 'b'")
      .collect().map(_.getAs[Double]("l")).toSeq
    assert(math.abs(lg.head - math.log(9.0) / math.log(2.0)) < 1e-12)
    val pw = InfluxQL.run(e, "SELECT pow(sum(v), 2) AS p FROM m GROUP BY host")
      .collect().map(x => (x.getAs[String]("host"), x.getAs[Double]("p"))).toSet
    assert(pw == Set(("a", 2.25), ("b", 81.0)))
    // selectors refuse the wrap; so does composition
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "SELECT abs(percentile(v, 50)) FROM m"))
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "SELECT abs(sqrt(v)) FROM m"))
  }

  test("InfluxQL sample(): N per group, original times, deterministic") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-smp").toString)
    LineProtocol.ingest(e, ((0 until 10).map(i =>
      s"m,host=a v=$i.0 ${1704067200L + i * 60}000000000") :+
      "m,host=b v=99.0 1704067200000000000").toDS())
    val s2 = InfluxQL.run(e, "SELECT sample(v, 3) FROM m GROUP BY host")
      .collect().map(r => (r.getAs[String]("host"),
        r.getAs[java.sql.Timestamp]("time").getTime, r.getAs[Double]("sample")))
    // 3 of host a's 10 points, host b's single point; values ride with
    // their original timestamps
    assert(s2.count(_._1 == "a") == 3 && s2.count(_._1 == "b") == 1)
    s2.foreach { case (_, t, v) =>
      if (v != 99.0) assert(t == 1704067200000L + v.toLong * 60000L)
    }
    // deterministic draw: identical on re-run
    val again = InfluxQL.run(e, "SELECT sample(v, 3) FROM m GROUP BY host")
      .collect().map(r => (r.getAs[String]("host"),
        r.getAs[java.sql.Timestamp]("time").getTime, r.getAs[Double]("sample")))
    assert(s2.toSet == again.toSet)
  }

  test("InfluxQL GROUP BY * and regex tag matchers") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-star").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=web-1,region=eu v=1.0 1704067200000000000",
      "m,host=web-2,region=us v=2.0 1704067200000000000",
      "m,host=db-1,region=eu v=4.0 1704067200000000000").toDS())
    // GROUP BY * expands to every tag of the measurement
    val star = InfluxQL.run(e,
      "SELECT sum(v) AS s FROM m GROUP BY time(1h), * fill(none)")
    assert(star.columns.toSet == Set("time", "host", "region", "s"))
    assert(star.count() == 3)
    // =~ keeps matching series (unanchored, like Go regexp.MatchString)
    val web = InfluxQL.run(e,
      "SELECT sum(v) AS s FROM m WHERE host =~ /web-/ GROUP BY region")
      .collect().map(r => (r.getAs[String]("region"), r.getAs[Double]("s"))).toSet
    assert(web == Set(("eu", 1.0), ("us", 2.0)))
    // !~ excludes them
    val noWeb = InfluxQL.run(e,
      "SELECT sum(v) AS s FROM m WHERE host !~ /^web/ GROUP BY region")
      .collect().map(r => (r.getAs[String]("region"), r.getAs[Double]("s"))).toSet
    assert(noWeb == Set(("eu", 4.0)))
  }

  test("InfluxQL SHOW SERIES and LIMIT OFFSET / SLIMIT SOFFSET") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-ser").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a,dc=eu v=1.0 1704067200000000000",
      "m,host=a,dc=eu v=2.0 1704067260000000000",
      "m,host=b,dc=us v=3.0 1704067200000000000",
      "n,host=c v=4.0 1704067200000000000").toDS())
    val keys = InfluxQL.run(e, "SHOW SERIES").as[String].collect().toSeq
    assert(keys == Seq("m,dc=eu,host=a", "m,dc=us,host=b", "n,host=c"))
    assert(InfluxQL.run(e, "SHOW SERIES FROM n").count() == 1)
    // OFFSET pages raw points in time order
    val pts = InfluxQL.run(e,
      "SELECT v FROM m WHERE host = 'a' LIMIT 1 OFFSET 1")
      .collect().map(_.getAs[Double]("v")).toSeq
    assert(pts == Seq(2.0))
    // SOFFSET skips whole series in tag order
    val s2 = InfluxQL.run(e,
      "SELECT sum(v) AS s FROM m GROUP BY host SLIMIT 1 SOFFSET 1")
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Double]("s"))).toSeq
    assert(s2 == Seq(("b", 3.0)))
  }

  test("InfluxQL SHOW DATABASES/RETENTION POLICIES and now()-relative bounds") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-now").toString)
    assert(InfluxQL.run(e, "SHOW DATABASES").as[String].collect().toSeq == Seq("public"))
    assert(InfluxQL.run(e, "SHOW RETENTION POLICIES")
      .select("name").as[String].collect().toSeq == Seq("autogen"))
    val nowNs = System.currentTimeMillis() * 1000000L
    val oldNs = nowNs - 10L * 86400 * 1000000000L // 10 days ago
    LineProtocol.ingest(e, Seq(
      s"m,host=a v=1.0 $oldNs",
      s"m,host=a v=2.0 ${nowNs - 60000000000L}").toDS()) // 1 min ago
    val recent = InfluxQL.run(e,
      "SELECT v FROM m WHERE time >= now() - 7d")
      .collect().map(_.getAs[Double]("v")).toSeq
    assert(recent == Seq(2.0))
    assert(InfluxQL.run(e,
      "SELECT v FROM m WHERE time <= now() + 1h").count() == 2)
  }

  test("InfluxQL EXPLAIN returns the executed Catalyst plan") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-exp").toString)
    LineProtocol.ingest(e, Seq("m,host=a v=1.0 1704067200000000000").toDS())
    val plan = InfluxQL.run(e,
      "EXPLAIN SELECT sum(v) AS s FROM m WHERE host = 'a' GROUP BY time(1h)")
      .as[String].collect().mkString("\n")
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"),
      s"plan missing aggregate:\n$plan")
    assert(plan.contains("Scan") || plan.contains("FileScan"))

    // EXPLAIN must not execute side effects: InfluxDB's grammar is
    // EXPLAIN [ANALYZE] SELECT only — DELETE/DROP/INTO are rejected, and
    // the data they would have destroyed survives
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "EXPLAIN DELETE FROM m"))
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "EXPLAIN DROP MEASUREMENT m"))
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "EXPLAIN SELECT v INTO m2 FROM m"))
    assert(InfluxQL.run(e, "SELECT v FROM m").count() == 1)
  }

  test("InfluxQL WHERE splits AND/OR on any whitespace, not just spaces") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-ws").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a v=1.0 1704067200000000000",
      "m,host=b v=2.0 1704067260000000000").toDS())
    // newline and tab before/after the keyword must parse like spaces —
    // a swallowed AND would silently return zero rows
    val got = InfluxQL.run(e,
      "SELECT v FROM m WHERE time >= '2024-01-01 00:00:00'\nAND\thost = 'a'")
      .collect().map(_.getAs[Double]("v")).toSeq
    assert(got == Seq(1.0))
    val orGot = InfluxQL.run(e,
      "SELECT v FROM m WHERE (host = 'a'\r\nOR host = 'b')").count()
    assert(orGot == 2)
  }

  test("InfluxQL DELETE FROM and DROP MEASUREMENT") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-del").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a v=1.0 1704067200000000000",
      "m,host=a v=2.0 1704153600000000000",  // day 2
      "m,host=b v=3.0 1704067200000000000").toDS())
    // time-ranged delete rewrites physically; the rest survives
    InfluxQL.run(e,
      "DELETE FROM m WHERE time < 1704153600000000000").collect()
    val left = InfluxQL.run(e, "SELECT v FROM m")
      .collect().map(_.getAs[Double]("v")).toSeq
    assert(left == Seq(2.0))
    // tag-scoped delete
    LineProtocol.ingest(e, Seq("m,host=b v=9.0 1704240000000000000").toDS())
    InfluxQL.run(e, "DELETE FROM m WHERE host = 'b'").collect()
    assert(InfluxQL.run(e, "SELECT v FROM m")
      .collect().map(_.getAs[Double]("v")).toSeq == Seq(2.0))
    // drop removes the measurement entirely
    assert(InfluxQL.run(e, "DROP MEASUREMENT m").head().getAs[Boolean]("dropped"))
    assert(InfluxQL.run(e, "SHOW MEASUREMENTS").count() == 0)
    assert(!InfluxQL.run(e, "DROP MEASUREMENT m").head().getAs[Boolean]("dropped"))
  }

  test("InfluxQL continuous queries: create, show, run, drop") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-cq").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a v=1.0 1704067200000000000",
      "m,host=a v=3.0 1704067260000000000",
      "m,host=b v=9.0 1704067200000000000").toDS())
    InfluxQL.run(e,
      """CREATE CONTINUOUS QUERY cq_hourly ON public BEGIN
        |SELECT max(v) AS mx INTO m_h FROM m GROUP BY time(1h), host fill(none)
        |END""".stripMargin).collect()
    assert(InfluxQL.run(e, "SHOW CONTINUOUS QUERIES")
      .select("name").as[String].collect().toSeq == Seq("cq_hourly"))
    // body without INTO is rejected
    intercept[IllegalArgumentException](InfluxQL.run(e,
      "CREATE CONTINUOUS QUERY bad ON public BEGIN SELECT max(v) FROM m END"))
    // run: materializes; second run idempotent (overwrite dedup)
    val r1 = InfluxQL.runContinuousQueries(e)
    assert(r1 == Seq("cq_hourly" -> 2L))
    InfluxQL.runContinuousQueries(e)
    assert(InfluxQL.run(e, "SELECT mx FROM m_h").count() == 2)
    // registry survives a fresh engine on the same warehouse
    val e2 = new TsdbEngine(spark, e.warehouse)
    assert(InfluxQL.run(e2, "SHOW CONTINUOUS QUERIES").count() == 1)
    // drop
    assert(InfluxQL.run(e, "DROP CONTINUOUS QUERY cq_hourly ON public")
      .head().getAs[Boolean]("dropped"))
    assert(InfluxQL.run(e, "SHOW CONTINUOUS QUERIES").count() == 0)
  }

  test("incremental CQ: suffix-only recompute; stragglers widen; generation flip -> full") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-inc").toString)
    val h0 = 1704067200000000000L; val h1 = h0 + 3600L * 1000000000L
    LineProtocol.ingest(e, Seq(
      s"m,host=a v=1.0 ${h0 + 60000000000L}",
      s"m,host=a v=3.0 ${h1 + 60000000000L}").toDS())
    InfluxQL.run(e,
      """CREATE CONTINUOUS QUERY cq ON public BEGIN
        |SELECT count(v) AS cv, sum(v) AS sv INTO m_h FROM m
        |GROUP BY time(1h), host fill(none)
        |END""".stripMargin).collect()
    def targetSeqs(): Map[Long, Long] = // bucket epoch-ms -> max __seq
      spark.read.parquet(e.catalog.dataDir("m_h"))
        .groupBy(col("time")).agg(max("__seq").as("s")).collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    def snap(): Set[(Long, Long, Double)] =
      InfluxQL.run(e, "SELECT cv, sv FROM m_h GROUP BY host")
        .collect().map(r => (r.getTimestamp(0).getTime,
          r.getAs[Long]("cv"), r.getAs[Double]("sv"))).toSet

    assert(InfluxQL.runContinuousQueries(e) == Seq("cq" -> 2L)) // full
    val seqs1 = targetSeqs()
    // no new rows: the run writes nothing and stored values stand
    assert(InfluxQL.runContinuousQueries(e) == Seq("cq" -> 0L))
    assert(targetSeqs() == seqs1, "no-op run must not rewrite the target")
    // new point in h1 only: h0's materialized row must NOT be rewritten
    LineProtocol.ingest(e, Seq(s"m,host=a v=5.0 ${h1 + 120000000000L}").toDS())
    assert(InfluxQL.runContinuousQueries(e) == Seq("cq" -> 1L))
    val seqs2 = targetSeqs()
    assert(seqs2(h0 / 1000000) == seqs1(h0 / 1000000), "h0 stands")
    assert(seqs2(h1 / 1000000) > seqs1(h1 / 1000000), "h1 recomputed")
    assert(snap() == Set((h0 / 1000000, 1L, 1.0), (h1 / 1000000, 2L, 8.0)))
    // straggler into h0: the suffix widens back to h0 (both recomputed)
    LineProtocol.ingest(e, Seq(s"m,host=a v=7.0 ${h0 + 120000000000L}").toDS())
    assert(InfluxQL.runContinuousQueries(e) == Seq("cq" -> 2L))
    assert(snap() == Set((h0 / 1000000, 2L, 8.0), (h1 / 1000000, 2L, 8.0)))
    // compaction flips the raw generation: next run is a full recompute
    val seqs3 = targetSeqs()
    e.compact("m")
    assert(InfluxQL.runContinuousQueries(e) == Seq("cq" -> 2L))
    assert(targetSeqs().values.forall(s => seqs3.values.forall(_ < s)),
      "generation flip must force a full rewrite")
    assert(snap() == Set((h0 / 1000000, 2L, 8.0), (h1 / 1000000, 2L, 8.0)))
  }

  test("InfluxQL SELECT INTO: materializes, idempotent on re-run") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-into").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a v=1.0 1704067200000000000",
      "m,host=a v=3.0 1704067260000000000",
      "m,host=b v=9.0 1704067200000000000").toDS())
    val summary = InfluxQL.run(e,
      "SELECT max(v) AS mx INTO m_hourly FROM m GROUP BY time(1h), host fill(none)")
      .collect()
    assert(summary.length == 1 && summary(0).getAs[Long]("written") == 2L)
    // target auto-created: host is a TAG, mx a field
    assert(e.catalog.get("m_hourly").tagColumns.map(_.name) == Seq("host"))
    val read = InfluxQL.run(e, "SELECT max(mx) AS mx FROM m_hourly GROUP BY host")
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Double]("mx"))).toSet
    assert(read == Set(("a", 3.0), ("b", 9.0)))
    // idempotent re-materialization: overwrite mode dedups (time, tags)
    InfluxQL.run(e,
      "SELECT max(v) AS mx INTO m_hourly FROM m GROUP BY time(1h), host fill(none)")
      .collect()
    assert(InfluxQL.run(e, "SELECT mx FROM m_hourly").count() == 2)
  }

  test("InfluxQL WHERE OR-groups combine with AND terms") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-or").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=web-1 v=1.0 1704067200000000000",
      "m,host=web-2 v=2.0 1704067260000000000",
      "m,host=db-1 v=4.0 1704067200000000000",
      "m,host=cache v=8.0 1704067200000000000").toDS())
    val out = InfluxQL.run(e,
      """SELECT sum(v) AS s FROM m
        |WHERE time >= 1704067200000ms AND (host = 'cache' OR host =~ /web/)
        |GROUP BY host""".stripMargin)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Double]("s"))).toSet
    assert(out == Set(("web-1", 1.0), ("web-2", 2.0), ("cache", 8.0)))
    // a single-cond parenthesized item degrades to a plain AND term
    assert(InfluxQL.run(e,
      "SELECT sum(v) AS s FROM m WHERE (host = 'db-1') GROUP BY host")
      .count() == 1)
    // time bounds may not hide inside OR groups (fill() reads them)
    intercept[IllegalArgumentException](InfluxQL.run(e,
      "SELECT sum(v) AS s FROM m WHERE (time > 0 OR host = 'x') GROUP BY host"))
  }

  test("InfluxQL exponential_moving_average: SMA seed then recurrence") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-ema").toString)
    LineProtocol.ingest(e, ((0 until 5).map(i =>
      s"m,host=a v=${i + 1}.0 ${1704067200L + i * 60}000000000") :+
      "m,host=b v=7.0 1704067200000000000").toDS())
    // n=3 → α=0.5: seed (1+2+3)/3 = 2 at the 3rd point, then 0.5·4+0.5·2=3,
    // 0.5·5+0.5·3=4; host b has fewer than 3 points → nothing
    val out = InfluxQL.run(e,
      "SELECT exponential_moving_average(v, 3) AS ema FROM m GROUP BY host")
      .collect().map(r => (r.getAs[String]("host"),
        r.getAs[java.sql.Timestamp]("time").getTime, r.getAs[Double]("ema"))).toSet
    assert(out == Set(
      ("a", 1704067320000L, 2.0),
      ("a", 1704067380000L, 3.0),
      ("a", 1704067440000L, 4.0)))
    // over an aggregated grid: mean per minute is the identity here, so the
    // same values ride through the bucketed path
    val g = InfluxQL.run(e,
      """SELECT exponential_moving_average(mean(v), 3) AS ema FROM m
        |WHERE host = 'a' GROUP BY time(1m) fill(none)""".stripMargin)
      .collect().map(r => r.getAs[Double]("ema")).sorted.toSeq
    assert(g == Seq(2.0, 3.0, 4.0))
  }

  test("untagged TA runs chunked: multi-task sort, bit-identical to serial") {
    import spark.implicits._
    // one hot global series (no tags): the former repartition(1) path.
    // Values chosen irregular so every chunk boundary matters.
    val n = 5000
    val df = (0 until n).map(i =>
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L + i * 7)),
         math.sin(i * 0.37) * 100 + i % 13))
      .toDF("time", "__tav")
    // the staged sort must be MULTI-task (the 100 TB point of the rework)
    val staged = graft.functions.TaChunked.stageSorted(df, "time", "__tav", 8)
    assert(staged.rdd.getNumPartitions == 8)
    val perPart = staged.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) > 1, perPart.toSeq.toString)
    // chunked output == the serial kernel walked over the sorted series,
    // bit-for-bit (same doubles, not approximately)
    for (mk <- Seq[() => graft.functions.TaStream.State](
        () => new graft.functions.TaStream.Ema(4),
        () => new graft.functions.TaStream.Rsi(14),
        () => new graft.functions.TaStream.Kama(10),
        () => new graft.functions.TaStream.Trix(5))) {
      val got = graft.functions.TaChunked
        .runGlobal(df, "time", "__tav", mk, "out", chunks = 8)
        .collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1)))
        .sortBy(_._1).toSeq
      val serial = {
        val st = mk()
        df.collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1)))
          .sortBy(_._1)
          .flatMap { case (t, v) => st.push(v).map(o => (t, o)) }.toSeq
      }
      assert(got == serial, s"chunked != serial for $mk")
    }
    // holt_winters untagged: fits replay chunk-parallel, forecasts come
    // from the phase-A terminal state — both bit-equal to the serial walk
    val hwGot = graft.functions.TaChunked
      .runGlobalHoltWinters(df, "time", "__tav", season = 4, nFc = 3,
        withFit = true, stepUs = 7000000L, "out", chunks = 8)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1)))
      .sortBy(_._1).toSeq
    val hwSerial = {
      val st = new graft.functions.TaStream.HoltWinters(4)
      val pts = df.collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1)))
        .sortBy(_._1)
      val fits = pts.flatMap { case (t, v) => st.push(v).map(f => (t, f)) }
      val lastT = pts.last._1
      (fits ++ (1 to 3).map(h => (lastT + h * 7000L, st.forecast(h)))).sortBy(_._1).toSeq
    }
    assert(hwGot == hwSerial)
  }

  test("InfluxQL holt_winters: additive triple smoothing + forecast") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-hw").toString)
    // one point per hour, linear ramp: 1, 2, 3, 4 on host a
    LineProtocol.ingest(e, ((0 until 4).map(i =>
      s"m,host=a v=${i + 1}.0 ${1704067200L + i * 3600}000000000") :+
      "m,host=b v=9.0 1704067200000000000").toDS())
    // S=0 (Holt linear), α=β=0.5. Seed l=1, b=0; then per point:
    //   x=2: fit=1,   l=.5·2+.5·1   =1.5,   b=.5·.5+0      =0.25
    //   x=3: fit=1.75 l=.5·3+.5·1.75=2.375, b=.5·.875+.125 =0.5625
    //   x=4: fit=2.9375, l=.5·4+.5·2.9375=3.46875, b=.5·1.09375+.28125=.828125
    // forecasts: l+h·b = 4.296875, 5.125
    val out = InfluxQL.run(e,
      """SELECT holt_winters_with_fit(mean(v), 2, 0) AS hw FROM m
        |WHERE host = 'a' GROUP BY time(1h) fill(none)""".stripMargin)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("time").getTime,
        r.getAs[Double]("hw"))).toSeq.sortBy(_._1)
    assert(out == Seq(
      (1704070800000L, 1.0), (1704074400000L, 1.75), (1704078000000L, 2.9375),
      (1704081600000L, 4.296875), (1704085200000L, 5.125)))
    // plain holt_winters: forecasts only, timestamps extend the grid
    val fc = InfluxQL.run(e,
      """SELECT holt_winters(mean(v), 2, 0) AS hw FROM m
        |WHERE host = 'a' GROUP BY time(1h) fill(none)""".stripMargin)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("time").getTime,
        r.getAs[Double]("hw"))).toSeq.sortBy(_._1)
    assert(fc == Seq((1704081600000L, 4.296875), (1704085200000L, 5.125)))
    // per-series isolation under GROUP BY host: a single-point series
    // forecasts its flat level
    val multi = InfluxQL.run(e,
      """SELECT holt_winters(mean(v), 1, 0) AS hw FROM m
        |GROUP BY time(1h), host""".stripMargin)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Double]("hw"))).toSet
    assert(multi.contains(("b", 9.0)))
    // seasonal path: S=2 on an alternating series learns the oscillation
    LineProtocol.ingest(e, (0 until 8).map(i =>
      s"m2,host=c v=${if (i % 2 == 0) 10.0 else 20.0} ${1704067200L + i * 3600}000000000").toDS())
    val season = InfluxQL.run(e,
      """SELECT holt_winters(mean(v), 2, 2) AS hw FROM m2
        |GROUP BY time(1h), host""".stripMargin)
      .collect().map(_.getAs[Double]("hw")).sorted.toSeq
    // the two forecasts must land on opposite sides of the 15 midline
    assert(season.size == 2 && season.head < 15.0 && season.last > 15.0,
      s"seasonal forecasts should alternate around 15: $season")
    // raw points (no GROUP BY time) are rejected, like InfluxDB
    intercept[IllegalArgumentException](
      InfluxQL.run(e, "SELECT holt_winters(v, 2, 0) AS hw FROM m"))
  }

  test("TA raw-series path streams — no full-series collect, skew-safe") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-skew").toString)
    // deliberately skewed: one hot series with 50k raw (unbucketed) points
    // next to a 5-point one — the class of input where a per-series
    // collect_list was a skew bomb (VERDICT r2 "what's wrong" #3)
    val hot = (0 until 50000).map(i =>
      s"m,host=hot v=${(i % 97).toDouble} ${1704067200L + i * 60}000000000")
    val cold = (0 until 5).map(i =>
      s"m,host=cold v=${i + 1}.0 ${1704067200L + i * 60}000000000")
    LineProtocol.ingest(e, (hot ++ cold).toDS())
    val df = InfluxQL.run(e,
      "SELECT exponential_moving_average(v, 4) AS ema FROM m GROUP BY host")
    val rows = df.collect()
    // warm-up: each series' first 3 points emit nothing
    assert(rows.length == (50000 - 3) + (5 - 3))
    val hotRows = rows.filter(_.getAs[String]("host") == "hot")
      .sortBy(_.getAs[java.sql.Timestamp]("time").getTime)
    assert(hotRows.head.getAs[Double]("ema") == (0.0 + 1 + 2 + 3) / 4) // SMA seed
    // the raw path must stream through the partition sort: a full-series
    // aggregate (collect_list / ObjectHashAggregate) may not appear
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("ObjectHashAggregate"),
      s"raw TA path regrew a full-series aggregate:\n$plan")
  }

  test("InfluxQL chande_momentum_oscillator and kaufmans_efficiency_ratio") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-cmo").toString)
    // values 1, 3, 2, 6 → diffs +2, −1, +4
    LineProtocol.ingest(e, Seq(1.0, 3.0, 2.0, 6.0).zipWithIndex.map {
      case (x, i) => s"m,host=a v=$x ${1704067200L + i * 60}000000000"
    }.toDS())
    // n=2 windows over diffs: [+2,−1] → Σd=1, Σ|d|=3 → CMO 100/3, KER 1/3;
    // [−1,+4] → Σd=3, Σ|d|=5 → CMO 60, KER 3/5
    val cmo = InfluxQL.run(e,
      "SELECT chande_momentum_oscillator(v, 2) AS c FROM m GROUP BY host")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("time").getTime,
        BigDecimal(r.getAs[Double]("c")).setScale(4, BigDecimal.RoundingMode.HALF_UP))).toSet
    assert(cmo == Set(
      (1704067320000L, BigDecimal("33.3333")), (1704067380000L, BigDecimal("60.0000"))))
    val ker = InfluxQL.run(e,
      "SELECT kaufmans_efficiency_ratio(v, 2) AS k FROM m GROUP BY host")
      .collect().map(r => BigDecimal(r.getAs[Double]("k"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).toSet
    assert(ker == Set(BigDecimal("0.3333"), BigDecimal("0.6000")))
    // flat series: no defined momentum, no rows
    LineProtocol.ingest(e, (0 until 4).map(i =>
      s"f,host=a v=5.0 ${1704067200L + i * 60}000000000").toDS())
    assert(InfluxQL.run(e,
      "SELECT chande_momentum_oscillator(v, 2) AS c FROM f GROUP BY host")
      .count() == 0)
  }

  test("InfluxQL relative_strength_index: Wilder smoothing") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-rsi").toString)
    // values 1, 3, 2, 6, 6 → diffs +2, −1, +4, 0
    LineProtocol.ingest(e, Seq(1.0, 3.0, 2.0, 6.0, 6.0).zipWithIndex.map {
      case (x, i) => s"m,host=a v=$x ${1704067200L + i * 60}000000000"
    }.toDS())
    // n=2: seed avgUp=(2+0)/2=1, avgDown=(0+1)/2=0.5 at point 3
    //   → RSI = 100 − 100/(1+2) = 66.667
    // point 4 (d=+4): avgUp=(1·1+4)/2=2.5, avgDown=(0.5·1+0)/2=0.25
    //   → RS=10 → RSI = 100·10/11 = 90.909
    // point 5 (d=0): avgUp=1.25, avgDown=0.125 → RS=10 → 90.909
    val out = InfluxQL.run(e,
      "SELECT relative_strength_index(v, 2) AS r FROM m GROUP BY host")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("time").getTime,
        BigDecimal(r.getAs[Double]("r")).setScale(3, BigDecimal.RoundingMode.HALF_UP))).toSet
    assert(out == Set(
      (1704067320000L, BigDecimal("66.667")),
      (1704067380000L, BigDecimal("90.909")),
      (1704067440000L, BigDecimal("90.909"))))
  }

  test("InfluxQL double/triple exponential moving averages") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-dema").toString)
    // linear series 1..7 at minutes: DEMA and TEMA are lag-free on a
    // linear trend, so they reproduce the input from their first point
    LineProtocol.ingest(e, (1 to 7).map(i =>
      s"m,host=a v=$i.0 ${1704067200L + i * 60}000000000").toDS())
    val dema = InfluxQL.run(e,
      "SELECT double_exponential_moving_average(v, 2) AS d FROM m GROUP BY host")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("time").getTime,
        math.round(r.getAs[Double]("d") * 1e9) / 1e9)).toSet
    // first DEMA at point 2n−1 = 3
    assert(dema == (3 to 7).map(i =>
      (1704067200000L + i * 60000L, i.toDouble)).toSet)
    val tema = InfluxQL.run(e,
      "SELECT triple_exponential_moving_average(v, 2) AS t3 FROM m GROUP BY host")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("time").getTime,
        math.round(r.getAs[Double]("t3") * 1e9) / 1e9)).toSet
    // first TEMA at point 3n−2 = 4
    assert(tema == (4 to 7).map(i =>
      (1704067200000L + i * 60000L, i.toDouble)).toSet)
  }

  test("InfluxQL GROUP BY time(interval, offset): shifted boundaries") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-off").toString)
    // 2024-01-01 00:10 and 00:40 UTC
    LineProtocol.ingest(e, Seq(
      "m,host=a v=1.0 1704067800000000000",
      "m,host=a v=3.0 1704069600000000000").toDS())
    def runQ(q: String) = InfluxQL.run(e, q).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("time").getTime,
        r.getAs[Double]("m"))).toSet
    // :30-aligned hour buckets: 00:10 → 23:30 (prev day), 00:40 → 00:30
    val shifted = runQ(
      "SELECT max(v) AS m FROM m GROUP BY time(1h, 30m) fill(none)")
    assert(shifted == Set((1704065400000L, 1.0), (1704069000000L, 3.0)))
    // a negative offset lands on the same :30 boundaries
    assert(runQ(
      "SELECT max(v) AS m FROM m GROUP BY time(1h, -30m) fill(none)") == shifted)
    // no offset: both points in the 00:00 bucket
    assert(runQ(
      "SELECT max(v) AS m FROM m GROUP BY time(1h) fill(none)") ==
      Set((1704067200000L, 3.0)))
    // fill grid steps along the shifted boundaries
    val filled = InfluxQL.run(e,
      "SELECT max(v) AS m FROM m GROUP BY time(30m, 10m) fill(0)")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("time").getTime,
        r.getAs[Double]("m")))
    // :10/:40-aligned 30m grid from 00:10 (covers both points) — 00:10
    // holds v=1, 00:40 holds v=3, nothing between
    assert(filled.toSet == Set((1704067800000L, 1.0), (1704069600000L, 3.0)))
  }

  test("InfluxQL ORDER BY time DESC and TZ clause") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-ord").toString)
    LineProtocol.ingest(e, Seq(
      "cpu,host=a usage=1.0 1704067200000000000",  // 2024-01-01 00:00 UTC
      "cpu,host=a usage=3.0 1704070800000000000",  // 01:00
      "cpu,host=a usage=5.0 1704074400000000000",  // 02:00
      "cpu,host=a usage=7.0 1704078000000000000"   // 03:00
    ).toDS())
    // DESC + LIMIT = the LAST n buckets, newest first
    val desc = InfluxQL.run(e,
      """SELECT mean(usage) AS m FROM cpu GROUP BY time(1h)
        |ORDER BY time DESC LIMIT 2""".stripMargin).collect()
    assert(desc.map(_.getAs[Double]("m")).toSeq == Seq(7.0, 5.0))
    // raw points too
    val rawDesc = InfluxQL.run(e,
      "SELECT usage FROM cpu ORDER BY time DESC LIMIT 1").collect()
    assert(rawDesc.map(_.getAs[Double]("usage")).toSeq == Seq(7.0))

    // TZ: day buckets truncate at America/Los_Angeles midnight (UTC-8 in
    // January) — all four samples fall on LA's 2023-12-31, whose boundary
    // is 2023-12-31 08:00 UTC
    val tz = InfluxQL.run(e,
      """SELECT count(usage) AS n FROM cpu GROUP BY time(1d)
        |TZ('America/Los_Angeles')""".stripMargin).collect()
    assert(tz.length == 1)
    assert(tz(0).getAs[java.sql.Timestamp]("time").getTime == 1704009600000L)
    assert(tz(0).getAs[Long]("n") == 4L)
  }

  test("InfluxQL fill(): grid is bounded per series, not globally") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-fill-series").toString)
    // host=a lives in hours 0-1; host=b only in hour 5
    LineProtocol.ingest(e, Seq(
      "cpu,host=a usage=1.0 1704067200000000000",   // 00:00
      "cpu,host=a usage=2.0 1704070800000000000",   // 01:00
      "cpu,host=b usage=9.0 1704085200000000000"    // 05:00
    ).toDS())
    val rows = InfluxQL.run(e,
      "SELECT sum(usage) AS s FROM cpu GROUP BY time(1h), host fill(0)")
      .collect().map(r => (r.getAs[String]("host"),
        r.getAs[java.sql.Timestamp]("time").getTime)).toSeq
    val h = 3600000L; val base = 1704067200000L
    // a gets exactly its own 2 buckets, b exactly 1 — no fabricated rows in
    // buckets outside each series' lifetime
    assert(rows.sorted == Seq(("a", base), ("a", base + h), ("b", base + 5 * h)),
      s"got ${rows.sorted}")
  }

  test("InfluxQL SHOW TAG KEYS / SHOW TAG VALUES / LIMIT / SLIMIT") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-meta").toString)
    LineProtocol.ingest(e, Seq(
      "cpu,host=a,dc=east usage=1.0 1704067200000000000",
      "cpu,host=b,dc=west usage=2.0 1704067260000000000",
      "cpu,host=c,dc=east usage=3.0 1704067320000000000").toDS())

    val keys = InfluxQL.run(e, "SHOW TAG KEYS FROM cpu").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys.toSet == Set(("cpu", "host"), ("cpu", "dc")))

    val vals = InfluxQL.run(e, """SHOW TAG VALUES FROM cpu WITH KEY = "host"""")
      .collect().map(_.getString(2)).toSeq
    assert(vals == Seq("a", "b", "c"))

    // LIMIT: first n points by time
    val lim = InfluxQL.run(e, "SELECT usage FROM cpu LIMIT 2").collect()
    assert(lim.map(_.getAs[Double]("usage")).toSeq == Seq(1.0, 2.0))

    // SLIMIT on raw points: first n series in tag order (dc, host)
    val slim = InfluxQL.run(e, "SELECT usage FROM cpu SLIMIT 2").collect()
    assert(slim.map(_.getAs[Double]("usage")).sorted.toSeq == Seq(1.0, 3.0),
      "first two (dc,host) series are (east,a) and (east,c)")

    // grouped: SLIMIT limits tag groups
    val g = InfluxQL.run(e,
      "SELECT sum(usage) AS s FROM cpu GROUP BY host SLIMIT 2").collect()
    assert(g.map(_.getAs[String]("host")).sorted.toSeq == Seq("a", "b"))
  }

  test("InfluxQL median/spread/stddev aggregates") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-stats").toString)
    LineProtocol.ingest(e, Seq(
      "m,host=a v=1.0 1704067200000000000",
      "m,host=a v=2.0 1704067260000000000",
      "m,host=a v=3.0 1704067320000000000",
      "m,host=a v=10.0 1704067380000000000").toDS())
    val r = InfluxQL.run(e,
      "SELECT median(v) AS med, spread(v) AS spr, stddev(v) AS sd FROM m GROUP BY time(1h)")
      .head()
    // even count: median interpolates the middle pair (2, 3) → 2.5
    assert(r.getAs[Double]("med") == 2.5)
    assert(r.getAs[Double]("spr") == 9.0)
    // sample stddev of 1,2,3,10
    val vs = Seq(1.0, 2.0, 3.0, 10.0); val m = vs.sum / 4
    val sd = math.sqrt(vs.map(x => (x - m) * (x - m)).sum / 3)
    assert(math.abs(r.getAs[Double]("sd") - sd) < 1e-12)
  }

  test("InfluxQL SHOW FIELD KEYS lists non-tag columns with influx types") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-fieldkeys").toString)
    LineProtocol.ingest(e, Seq(
      """m1,host=a usage=1.5,cnt=3i,ok=true,note="hi" 1704067200000000000""").toDS())
    val rows = InfluxQL.run(e, "SHOW FIELD KEYS FROM m1")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(rows == Set(("usage", "float"), ("cnt", "integer"),
      ("ok", "boolean"), ("note", "string")))
    // unscoped form lists every measurement
    assert(InfluxQL.run(e, "SHOW FIELD KEYS").count() == 4)
  }

  test("InfluxQL subquery: aggregate-of-aggregate downsampling") {
    import spark.implicits._
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("iql-sub").toString)
    val base = 1704067200000000000L // 2024-01-01 00:00 ns
    LineProtocol.ingest(e, Seq(
      s"cpu,host=a usage=1.0 ${base}",
      s"cpu,host=a usage=9.0 ${base + 30_000_000_000L}",   // same minute, max=9
      s"cpu,host=a usage=5.0 ${base + 60_000_000_000L}",   // next minute, max=5
      s"cpu,host=b usage=3.0 ${base}",                     // minute 0, max=3
      s"cpu,host=b usage=7.0 ${base + 120_000_000_000L}"   // minute 2, max=7
    ).toDS())
    // inner: per-minute per-host max; outer: mean of those maxima per host
    val out = InfluxQL.run(e,
      """SELECT mean(m) AS mm FROM
        |  (SELECT max(usage) AS m FROM cpu GROUP BY time(1m), host)
        |GROUP BY host""".stripMargin)
      .orderBy("host").collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Double]("mm"))).toSeq
    assert(out == Seq(("a", 7.0), ("b", 5.0)), s"got $out") // (9+5)/2, (3+7)/2
    // outer time filter + re-bucketing over the inner grid
    val rb = InfluxQL.run(e,
      """SELECT sum(m) AS s FROM
        |  (SELECT max(usage) AS m FROM cpu GROUP BY time(1m))
        |WHERE time >= '2024-01-01 00:00:00' GROUP BY time(2m)""".stripMargin)
      .orderBy("time").collect().map(_.getAs[Double]("s")).toSeq
    assert(rb == Seq(14.0, 7.0), s"got $rb") // minutes {0,1} then {2}
  }

  test("OpenTSDB: aggregators, literal_or filters, inclusive time bounds") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-01-01 00:00:00"), "web", "a", 1.0),
      (ts("2024-01-01 00:00:00"), "web", "b", 3.0),
      (ts("2024-01-01 00:00:00"), "db", "a", 10.0),
      (ts("2024-01-01 01:00:00"), "web", "a", 5.0),
      (ts("2024-01-02 00:00:00"), "web", "a", 100.0)).toDF("ts", "svc", "host", "v")
    val bind = (_: String) => graft.promql.PromQL.SeriesTable(df, "ts", "v", Seq("svc", "host"))
    val q = OpenTsdb.parseQuery(
      """{"start": 1704067200000, "end": 1704070800000,
        | "queries": [{"metric": "m", "aggregator": "sum",
        |   "filters": [{"type": "literal_or", "tagk": "svc", "filter": "web",
        |     "groupBy": true}]}]}""".stripMargin)
    val rows = OpenTsdb.runSub(q, q.queries.head, bind)
      .orderBy("ts").collect()
    // end bound inclusive: the 01:00 sample is in; Jan 2 is out; db filtered
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("value") == 4.0) // 1+3 summed across hosts
    assert(rows(1).getAs[Double]("value") == 5.0)
    // none → raw ordered datapoints with tags
    val none = OpenTsdb.parseQuery(
      """{"start": 1704067200000, "queries": [{"metric": "m",
        |  "aggregator": "none", "tags": {"host": "b"}}]}""".stripMargin)
    val raw = OpenTsdb.runSub(none, none.queries.head, bind).collect()
    assert(raw.length == 1 && raw(0).getAs[Double]("value") == 3.0)
  }

  test("OpenTSDB downsample applies per-series when opted in, ignored by default") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-01-01 00:10:00"), "web", 1.0),
      (ts("2024-01-01 00:20:00"), "web", 3.0),
      (ts("2024-01-01 01:10:00"), "web", 5.0),
      (ts("2024-01-01 00:15:00"), "db", 10.0)).toDF("ts", "svc", "v")
    val bind = (_: String) => graft.promql.PromQL.SeriesTable(df, "ts", "v", Seq("svc"))
    val q = OpenTsdb.parseQuery(
      """{"start": 1704067200000, "queries": [{"metric": "m",
        |  "aggregator": "sum", "downsample": "1h-avg",
        |  "filters": [{"type": "literal_or", "tagk": "svc", "filter": "web|db",
        |    "groupBy": false}]}]}""".stripMargin)
    // default: reference-faithful — downsample parsed but NOT applied
    assert(OpenTsdb.runSub(q, q.queries.head, bind).count() == 4)
    // opted in: per-series hourly avg, then sum across series per bucket
    val rows = OpenTsdb.runSub(q, q.queries.head, bind, applyDownsample = true)
      .orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("value") == 12.0) // web avg 2.0 + db avg 10.0
    assert(rows(1).getAs[Double]("value") == 5.0)
  }

  test("OpenTSDB filter family: wildcard/iwildcard/regexp/iliteral_or") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-01-01 00:00:00"), "web-1", 1.0),
      (ts("2024-01-01 00:00:00"), "web-2", 2.0),
      (ts("2024-01-01 00:00:00"), "DB-1", 4.0),
      (ts("2024-01-01 00:00:00"), "cache", 8.0)).toDF("ts", "svc", "v")
    val bind = (_: String) => graft.promql.PromQL.SeriesTable(df, "ts", "v", Seq("svc"))
    def total(ftype: String, filter: String): Double = {
      val q = OpenTsdb.parseQuery(
        s"""{"start": 0, "queries": [{"metric": "m", "aggregator": "sum",
           |  "filters": [{"type": "$ftype", "tagk": "svc",
           |    "filter": "$filter", "groupBy": false}]}]}""".stripMargin)
      val rows = OpenTsdb.runSub(q, q.queries.head, bind).collect()
      if (rows.isEmpty) 0.0 else rows.map(_.getAs[Double]("value")).sum
    }
    assert(total("wildcard", "web-*") == 3.0)
    assert(total("wildcard", "db-*") == 0.0)      // case-sensitive
    assert(total("iwildcard", "db-*") == 4.0)     // case-folded
    assert(total("regexp", "web-[0-9]") == 3.0)
    assert(total("regexp", "web") == 0.0)         // full match, not substring
    assert(total("iliteral_or", "DB-1|CACHE") == 12.0)
    assert(total("not_iliteral_or", "db-1") == 11.0)
  }

  test("OpenTSDB rate: per-series dv/dt when opted in, ignored by default") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-01-01 00:00:00"), "web", 10.0),
      (ts("2024-01-01 00:01:00"), "web", 40.0),  // +30 over 60s → 0.5/s
      (ts("2024-01-01 00:03:00"), "web", 100.0), // +60 over 120s → 0.5/s
      (ts("2024-01-01 00:00:00"), "db", 7.0))    // single point → no rate
      .toDF("ts", "svc", "v")
    val bind = (_: String) => graft.promql.PromQL.SeriesTable(df, "ts", "v", Seq("svc"))
    val q = OpenTsdb.parseQuery(
      """{"start": 1704067200000, "queries": [{"metric": "m",
        |  "aggregator": "sum", "rate": true,
        |  "filters": [{"type": "literal_or", "tagk": "svc", "filter": "web|db",
        |    "groupBy": true}]}]}""".stripMargin)
    // default: reference-faithful — rate parsed but NOT applied
    assert(OpenTsdb.runSub(q, q.queries.head, bind).count() == 4)
    val rows = OpenTsdb.runSub(q, q.queries.head, bind, applyRate = true)
      .orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("svc") == "web"))
    assert(rows.forall(_.getAs[Double]("value") == 0.5))
  }

  test("OpenTSDB rate runs AFTER aggregation (2.x order): rate-of-sums") {
    import spark.implicits._
    // two series land in ONE group (svc ungrouped) — OpenTSDB 2.x's order
    // of operations aggregates first, then converts the aggregate to a
    // rate. Sum-of-rates would give (0.5+1.0)=1.5/s; rate-of-sums gives
    // Δ(sum)/Δt = ((40+80)-(10+20))/60 = 1.5/s here but the ragged second
    // step separates them: series b stops, so the sum DROPS and the rate
    // goes negative — per-series rates could never produce that.
    val df = Seq(
      (ts("2024-01-01 00:00:00"), "a", 10.0),
      (ts("2024-01-01 00:01:00"), "a", 40.0),   // a: +0.5/s
      (ts("2024-01-01 00:00:00"), "b", 20.0),
      (ts("2024-01-01 00:01:00"), "b", 80.0),   // b: +1.0/s
      (ts("2024-01-01 00:02:00"), "a", 70.0))   // b absent → sum drops
      .toDF("ts", "svc", "v")
    val bind = (_: String) => graft.promql.PromQL.SeriesTable(df, "ts", "v", Seq("svc"))
    val q = OpenTsdb.parseQuery(
      """{"start": 1704067200000, "queries": [{"metric": "m",
        |  "aggregator": "sum", "rate": true}]}""".stripMargin)
    val rows = OpenTsdb.runSub(q, q.queries.head, bind, applyRate = true)
      .orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("value") == (120.0 - 30.0) / 60.0) // 1.5/s
    assert(rows(1).getAs[Double]("value") == (70.0 - 120.0) / 60.0) // negative
  }

  test("OpenTSDB sub-second downsample (500ms-avg) buckets on millis floor") {
    import spark.implicits._
    val base = 1704067200000L
    val df = Seq(
      (new java.sql.Timestamp(base), "web", 1.0),        // bucket 0
      (new java.sql.Timestamp(base + 200), "web", 3.0),  // bucket 0
      (new java.sql.Timestamp(base + 600), "web", 5.0),  // bucket 500
      (new java.sql.Timestamp(base + 999), "web", 7.0))  // bucket 500
      .toDF("ts", "svc", "v")
    val bind = (_: String) => graft.promql.PromQL.SeriesTable(df, "ts", "v", Seq("svc"))
    val q = OpenTsdb.parseQuery(
      s"""{"start": $base, "queries": [{"metric": "m",
         |  "aggregator": "sum", "downsample": "500ms-avg"}]}""".stripMargin)
    val rows = OpenTsdb.runSub(q, q.queries.head, bind, applyDownsample = true)
      .orderBy("ts").collect()
    assert(rows.length == 2, s"got ${rows.length} buckets")
    assert(rows(0).getAs[Double]("value") == 2.0) // avg(1,3)
    assert(rows(1).getAs[Double]("value") == 6.0) // avg(5,7)
  }

  test("OpenTSDB put: validation, second/ms timestamps, auto-create + auto-add") {
    import spark.implicits._
    // validation mirrors the reference (types.rs:190-217)
    intercept[IllegalArgumentException](OpenTsdb.parsePut("""{"metric":"","timestamp":1704067200,"value":1.0,"tags":{"h":"a"}}"""))
    intercept[IllegalArgumentException](OpenTsdb.parsePut("""{"metric":"m","timestamp":1704067200,"value":1.0,"tags":{}}"""))
    intercept[IllegalArgumentException](OpenTsdb.parsePut("""{"metric":"m","timestamp":123,"value":1.0,"tags":{"h":"a"}}"""))
    // try_to_millis: seconds-range scales, millis-range passes through
    assert(OpenTsdb.toMillis(1704067200L) == 1704067200000L)
    assert(OpenTsdb.toMillis(1704067200123L) == 1704067200123L)

    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("otsdb-put").toString)
    // mixed body shapes: one array of two points, one single object
    val bodies = Seq(
      """[{"metric":"sys.cpu","timestamp":1704067200,"value":1.5,"tags":{"host":"a"}},
        | {"metric":"sys.cpu","timestamp":1704067260000,"value":2.5,"tags":{"host":"b"}}]""".stripMargin,
      """{"metric":"sys.mem","timestamp":1704067200,"value":7.0,"tags":{"host":"a","dc":"x"}}""").toDS()
    val counts = OpenTsdb.put(e, bodies)
    assert(counts == Map("sys.cpu" -> 2L, "sys.mem" -> 1L))
    val cpu = e.catalog.get("sys.cpu")
    assert(cpu.timestampKey == "timestamp")
    assert(cpu.columns.find(_.name == "host").exists(_.isTag))
    val rows = e.read("sys.cpu").orderBy("timestamp").collect()
    assert(rows.map(_.getAs[Double]("value")).toSeq == Seq(1.5, 2.5))
    assert(rows(0).getAs[java.sql.Timestamp]("timestamp").getTime == 1704067200000L)

    // same series+timestamp overwrites (newest wins through the engine)
    OpenTsdb.put(e, Seq(
      """{"metric":"sys.cpu","timestamp":1704067200,"value":9.9,"tags":{"host":"a"}}""").toDS())
    val a = e.read("sys.cpu").filter(col("host") === "a").collect()
    assert(a.length == 1 && a(0).getAs[Double]("value") == 9.9)

    // unseen tag key on an existing metric auto-ADDs a TAG column
    OpenTsdb.put(e, Seq(
      """{"metric":"sys.cpu","timestamp":1704067320000,"value":3.5,"tags":{"host":"c","rack":"r1"}}""").toDS())
    assert(e.catalog.get("sys.cpu").columns.find(_.name == "rack").exists(_.isTag))
    val c = e.read("sys.cpu").filter(col("host") === "c").head()
    assert(c.getAs[String]("rack") == "r1")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("http api: /sql round-trip — DDL, INSERT, query rows, error shape") {
    import graft.server.HttpApi
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("http-sql").toString)
    def sql(q: String) = HttpApi.handleSql(e, s"""{"query": ${
      new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(q)}}""")
    assert(sql("""CREATE TABLE demo (t timestamp NOT NULL, tag1 string TAG,
                 |  v double, timestamp KEY(t)) ENGINE=Analytic""".stripMargin)
      == """{"affected_rows":0}""")
    assert(sql("INSERT INTO demo (t, tag1, v) VALUES " +
      "(1651737067000, 'a', 100), (1651737067001, 'b', 200)")
      == """{"affected_rows":2}""")
    assert(sql("SELECT t, tag1, v FROM demo ORDER BY t") ==
      """{"rows":[{"t":1651737067000,"tag1":"a","v":100.0},""" +
      """{"t":1651737067001,"tag1":"b","v":200.0}]}""")
    // reference error shape: {"code": c, "message": m}
    val err = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(sql("SELECT nope FROM missing_table"))
    assert(err.get("code").asInt() == 500)
    assert(err.get("message").asText().nonEmpty)
    // malformed request body
    val bad = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(HttpApi.handleSql(e, """{"q": "SELECT 1"}"""))
    assert(bad.get("code").asInt() == 500)
  }

  test("http api: influx write + query — series split, time formats") {
    import graft.server.HttpApi
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("http-influx").toString)
    assert(HttpApi.handleInfluxWrite(e,
      """cpu,host=a usage=0.5 1704067200000000000
        |cpu,host=a usage=0.7 1704067260000000000
        |cpu,host=b usage=0.9 1704067200000000000""".stripMargin) == "")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // grouped query: one series per host with a tags map, epoch millis
    val grouped = mapper.readTree(HttpApi.handleInfluxQuery(e,
      """SELECT mean(usage) FROM cpu GROUP BY time(1m), host""",
      epoch = Some("ms")))
    val series = grouped.get("results").get(0).get("series")
    assert(grouped.get("results").get(0).get("statement_id").asInt() == 0)
    assert(series.size() == 2)
    val hosts = (0 until series.size())
      .map(i => series.get(i).get("tags").get("host").asText()).sorted
    assert(hosts == Seq("a", "b"))
    val s0 = series.get(0)
    assert(s0.get("name").asText() == "cpu")
    assert(s0.get("columns").get(0).asText() == "time")
    assert(s0.get("values").get(0).get(0).asLong() == 1704067200000L)
    // no epoch param: RFC3339 Z strings
    val rfc = mapper.readTree(HttpApi.handleInfluxQuery(e,
      "SELECT usage FROM cpu WHERE host = 'b'"))
    val v0 = rfc.get("results").get(0).get("series").get(0)
      .get("values").get(0).get(0).asText()
    assert(v0 == "2024-01-01T00:00:00Z", v0)
  }

  test("http api: opentsdb put lands in the engine") {
    import graft.server.HttpApi
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("http-tsdb").toString)
    assert(HttpApi.handleOpentsdbPut(e,
      """[{"metric":"sys.cpu","timestamp":1704067200,"value":42.5,
        |  "tags":{"host":"web01"}}]""".stripMargin) == "")
    val row = e.read("sys.cpu").head()
    assert(row.getAs[Double]("value") == 42.5)
    assert(row.getAs[String]("host") == "web01")
  }

  test("http api: /sql arrow payload round-trips through an Arrow reader") {
    import graft.server.HttpApi
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("http-arrow").toString)
    HttpApi.handleSql(e,
      """{"query": "CREATE TABLE ar (t timestamp NOT NULL, tag1 string TAG, v double, timestamp KEY(t)) ENGINE=Analytic"}""")
    HttpApi.handleSql(e,
      """{"query": "INSERT INTO ar (t, tag1, v) VALUES (1651737067000, 'a', 1.5), (1651737067001, 'b', 2.5)"}""")
    val bytes = HttpApi.handleSqlArrow(e,
      """{"query": "SELECT t, tag1, v FROM ar ORDER BY t"}""")

    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields
      assert((0 until fields.size()).map(fields.get(_).getName) ==
        Seq("t", "tag1", "v"))
      assert(reader.loadNextBatch())
      assert(root.getRowCount == 2)
      val tagVec = root.getVector("tag1")
        .asInstanceOf[org.apache.arrow.vector.VarCharVector]
      assert(new String(tagVec.get(0), "UTF-8") == "a")
      assert(new String(tagVec.get(1), "UTF-8") == "b")
      val vVec = root.getVector("v")
        .asInstanceOf[org.apache.arrow.vector.Float8Vector]
      assert(vVec.get(0) == 1.5 && vVec.get(1) == 2.5)
      val tVec = root.getVector("t")
        .asInstanceOf[org.apache.arrow.vector.TimeStampMicroTZVector]
      assert(tVec.get(0) == 1651737067000000L)
      assert(!reader.loadNextBatch()) // exactly one batch then EOS
    } finally { reader.close(); alloc.close() }
  }

  test("http api: prometheus query payload shapes (matrix, vector, naming)") {
    import graft.server.HttpApi
    import spark.implicits._
    val h1 = 1704848400000L // 2024-01-10 01:00:00 UTC
    val df = Seq(
      ("a", new java.sql.Timestamp(h1 - 1800000L), 1.0),  // 00:30, outside lookback
      ("a", new java.sql.Timestamp(h1), 2.0),             // at the step
      ("b", new java.sql.Timestamp(h1 - 900000L), 7.5)    // 00:45, outside lookback
    ).toDF("event_type", "ts", "value")
    val resolve = (_: String) =>
      graft.promql.PromQL.SeriesTable(df, "ts", "value", Seq("event_type"))

    val matrix = HttpApi.handlePromRange(spark, resolve, "events",
      graft.promql.EvalParams(h1, h1, 3600000L))
    assert(matrix ==
      """{"status":"success","data":{"resultType":"matrix","result":[""" +
      """{"metric":{"__name__":"events","event_type":"a"},"values":[[1704848400,"2"]]}]}}""",
      matrix)

    val vector = HttpApi.handlePromInstant(spark, resolve,
      """events{event_type="a"}""", h1)
    assert(vector ==
      """{"status":"success","data":{"resultType":"vector","result":[""" +
      """{"metric":{"__name__":"events","event_type":"a"},"value":[1704848400,"2"]}]}}""",
      vector)

    // aggregation drops __name__, like Prometheus
    val agg = HttpApi.handlePromRange(spark, resolve, "sum(events)",
      graft.promql.EvalParams(h1, h1, 3600000L))
    assert(!agg.contains("__name__"), agg)
    assert(agg.contains(""""resultType":"matrix""""), agg)

    // error shape
    val err = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(HttpApi.handlePromRange(spark, resolve, "not a promql ((",
        graft.promql.EvalParams(h1, h1, 3600000L)))
    assert(err.get("status").asText() == "error")
    assert(err.get("error").asText().nonEmpty)
  }

  test("influx SHOW ... CARDINALITY: exact counts in every variant") {
    import graft.server.HttpApi
    val e = new TsdbEngine(spark,
      java.nio.file.Files.createTempDirectory("card-influx").toString)
    assert(HttpApi.handleInfluxWrite(e,
      """cpu,host=a,dc=x usage=0.5 1704067200000000000
        |cpu,host=b,dc=x usage=0.7 1704067260000000000
        |cpu,host=b,dc=y usage=0.9 1704067320000000000
        |mem,host=a free=1.0 1704067200000000000""".stripMargin) == "")

    def one(q: String): Seq[(String, Long)] =
      graft.influx.InfluxQL.run(e, q).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)

    // 3 distinct (host, dc) combos for cpu, 1 for mem
    assert(one("SHOW SERIES CARDINALITY") == Seq(("cpu", 3L), ("mem", 1L)))
    assert(one("SHOW SERIES CARDINALITY FROM cpu") == Seq(("cpu", 3L)))
    assert(one("SHOW TAG KEY CARDINALITY FROM cpu") == Seq(("cpu", 2L)))
    assert(one("SHOW FIELD KEY CARDINALITY FROM cpu") == Seq(("cpu", 1L)))
    assert(one("""SHOW TAG VALUES CARDINALITY FROM cpu WITH KEY = host""")
      == Seq(("cpu", 2L)))
    // dc has values x,y on cpu only; mem lacks the tag -> excluded
    assert(one("""SHOW TAG VALUES CARDINALITY WITH KEY = dc""")
      == Seq(("cpu", 2L)))
    val m = graft.influx.InfluxQL.run(e, "SHOW MEASUREMENT CARDINALITY")
    assert(m.columns.toSeq == Seq("count") && m.head().getLong(0) == 2L)
  }

  test("KAMA and TRIX kernels: hand-computed recurrences, warmup, flat-window ER") {
    // KAMA n=2 over 1,2,3,3,3: seeds kama=1 at i=0; emits from i>=2
    val kama = new graft.functions.TaStream.Kama(2)
    val fast = 2.0 / 3.0; val slow = 2.0 / 31.0
    def sc(er: Double) = { val s = er * (fast - slow) + slow; s * s }
    // i=1: m=1, er=|2-1|/1=1, kama=1+sc(1)*(2-1)
    var k = 1.0 + sc(1.0) * (2.0 - 1.0)
    assert(kama.push(1.0).isEmpty && kama.push(2.0).isEmpty)
    // i=2: er=|3-1|/(1+1)=1
    k = k + sc(1.0) * (3.0 - k)
    assert(kama.push(3.0).contains(k))
    // i=3: er=|3-2|/(1+0)=1
    k = k + sc(1.0) * (3.0 - k)
    assert(kama.push(3.0).contains(k))
    // i=4: flat window: den=0 -> er=0 -> sc=slow^2
    k = k + sc(0.0) * (3.0 - k)
    assert(kama.push(3.0).contains(k))

    // TRIX n=1: every EMA stage is the identity (alpha=1), so e3=x and
    // trix = 100*(x_t - x_{t-1})/x_{t-1}, first emission at the 2nd point
    val trix = new graft.functions.TaStream.Trix(1)
    assert(trix.push(4.0).isEmpty)
    assert(trix.push(5.0).contains(100.0 * (5.0 - 4.0) / 4.0))
    assert(trix.push(2.0).contains(100.0 * (2.0 - 5.0) / 5.0))
  }

  test("opentsdb downsample fill policies: zero fills gaps, null keeps them, none skips") {
    import spark.implicits._
    // one series, hourly buckets 0,1,3 (bucket 2 empty)
    val rows = Seq(
      ("a", 0L, 1.0), ("a", 3600L, 2.0), ("a", 3L * 3600, 4.0)
    ).toDF("event_type", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val table = (_: String) => graft.promql.PromQL.SeriesTable(
      rows, "ts", "value", Seq("event_type"))
    def run(ds: String) = {
      val q = graft.opentsdb.OpenTsdb.parseQuery(
        s"""{"start": 0, "queries": [{"metric": "m", "aggregator": "none",
           |  "downsample": "$ds",
           |  "filters": [{"type": "literal_or", "tagk": "event_type",
           |    "filter": "a", "groupBy": true}]}]}""".stripMargin)
      graft.opentsdb.OpenTsdb.runSub(q, q.queries.head, table, applyDownsample = true)
        .collect().map(r => r.getAs[java.sql.Timestamp]("ts").getTime / 1000 ->
          (if (r.isNullAt(r.fieldIndex("value"))) None
           else Some(r.getAs[Double]("value")))).toMap
    }
    assert(run("1h-avg") == Map(0L -> Some(1.0), 3600L -> Some(2.0), 10800L -> Some(4.0)))
    assert(run("1h-avg-zero") == Map(0L -> Some(1.0), 3600L -> Some(2.0),
      7200L -> Some(0.0), 10800L -> Some(4.0)))
    assert(run("1h-avg-null") == Map(0L -> Some(1.0), 3600L -> Some(2.0),
      7200L -> None, 10800L -> Some(4.0)))
    val nan = run("1h-avg-nan")
    assert(nan(7200L).exists(_.isNaN))
  }

  test("opentsdb fill grid chunks long sparse spans (bounded arrays, exact grid)") {
    import spark.implicits._
    // two samples 5000 buckets apart at 1s step: the grid generator must
    // not build one 5001-element sequence() array per series — it chunks
    // (1000 buckets per in-flight array) yet still emits the exact grid
    val rows = Seq(("a", 0L, 1.0), ("a", 5000L, 2.0))
      .toDF("event_type", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val table = (_: String) => graft.promql.PromQL.SeriesTable(
      rows, "ts", "value", Seq("event_type"))
    val q = graft.opentsdb.OpenTsdb.parseQuery(
      """{"start": 0, "queries": [{"metric": "m", "aggregator": "none",
        |  "downsample": "1s-avg-zero",
        |  "filters": [{"type": "literal_or", "tagk": "event_type",
        |    "filter": "a", "groupBy": true}]}]}""".stripMargin)
    val out = graft.opentsdb.OpenTsdb
      .runSub(q, q.queries.head, table, applyDownsample = true)
      .collect().map(r => r.getAs[java.sql.Timestamp]("ts").getTime / 1000 ->
        r.getAs[Double]("value")).toMap
    assert(out.size == 5001, out.size.toString)
    assert(out(0L) == 1.0 && out(5000L) == 2.0)
    assert(out(999L) == 0.0 && out(1000L) == 0.0 && out(4999L) == 0.0)
  }
}
