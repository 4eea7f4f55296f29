package graft

import graft.engine.TsdbEngine
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming rollup → engine-table materialization (SURVEY §2.9). The
  * shipped operator is update-mode + watermark + engine append (no
  * unbounded state, no driver-side sink); the complete-mode memory sink
  * exists only HERE as the comparison harness.
  */
class RollupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("tag", StringType),
    StructField("v", DoubleType)))

  private def writeSource(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (ms, tag, v) => (new java.sql.Timestamp(ms), tag, v) }
      .toDF("ts", "tag", "v")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  /** Minimal GroupState double for transition-function unit tests. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    var value: Option[S] = None
    var removed = false
    var timedOut = false
    override def exists: Boolean = value.isDefined
    override def get: S = value.get
    override def getOption: Option[S] = value
    override def update(s: S): Unit = { value = Some(s); removed = false }
    override def remove(): Unit = { value = None; removed = true }
    override def hasTimedOut: Boolean = timedOut
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  test("windowedRollupToTable equals the batch rollup; re-runs upsert") {
    import spark.implicits._
    val srcDir = tmpDir("rollup-src")
    val h = 3600000L
    val base = 1704067200000L
    writeSource(srcDir, Seq(
      (base + 60000, "a", 1.0), (base + 120000, "a", 2.0),
      (base + h + 60000, "a", 3.0), (base + 60000, "b", 10.0)))

    val e = new TsdbEngine(spark, tmpDir("rollup-wh"))
    def run() = graft.streaming.Rollup.windowedRollupToTable(
      e, srcDir, "*.parquet", schema, nanosTs = false,
      "ts", "tag", "v", "1 hour", "2 hours", "roll")
    def snap() = run().orderBy("tag", "bucket").collect()
      .map(r => (r.getAs[String]("tag"), r.getAs[java.sql.Timestamp]("bucket").getTime,
        r.getAs[Long]("n"), r.getAs[Double]("total"))).toSeq

    assert(snap() == Seq(
      ("a", base, 2L, 3.0), ("a", base + h, 1L, 3.0), ("b", base, 1L, 10.0)))

    // a second run over a grown source RESUMES from the warehouse
    // checkpoint (restart recovery): the file source skips already-
    // processed files, carried window state absorbs the new point, and
    // update mode re-emits ONLY the changed window — the overwrite-mode
    // table resolves to the newest emission (update-stream-as-upsert)
    writeSource(srcDir, Seq((base + 180000, "a", 5.0)))
    assert(snap() == Seq(
      ("a", base, 3L, 8.0), ("a", base + h, 1L, 3.0), ("b", base, 1L, 10.0)))
    // physical storage proves incrementality: 3 first-run emissions + 1
    // re-emitted window — a fresh checkpoint would have re-emitted all 3
    assert(spark.read.parquet(e.catalog.dataDir("roll")).count() == 4,
      "resumed run must emit only the changed window")

    // the sink is a real engine table: compaction folds superseded
    // emissions away and the plain read stays identical
    e.compact("roll")
    assert(snap() == Seq(
      ("a", base, 3L, 8.0), ("a", base + h, 1L, 3.0), ("b", base, 1L, 10.0)))
  }

  test("sketchRollupToTable: multi-batch partials merge to exact counts and bounded ranks") {
    val srcDir = tmpDir("skroll-src")
    val h = 3600000L
    val base = 1704067200000L
    // three files -> three triggers at maxFilesPerTrigger=1: partials are
    // genuinely split across batches
    val rnd = new scala.util.Random(7)
    val chunks = (0 until 3).map(c => (0 until 200).map(i =>
      (base + c * h + i * 1000L, if (i % 2 == 0) "a" else "b",
        rnd.nextDouble() * 100)))
    chunks.foreach(rows => writeSource(srcDir, rows))

    val e = new TsdbEngine(spark, tmpDir("skroll-wh"))
    val sk = graft.streaming.Rollup.sketchRollupToTable(
      e, srcDir, "*.parquet", schema, nanosTs = false,
      "ts", "tag", "v", bucketSeconds = 86400L, "skroll",
      maxFilesPerTrigger = Some(1))
    // multiple partial rows per (tag, bucket): the table holds per-batch
    // sketches, not a single merged one
    val partials = sk.count()
    assert(partials > 2, s"expected per-batch partial rows, got $partials")
    val q = graft.operators.QuantileRollup.quantiles(sk, Seq("tag"), Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val all = chunks.flatten
    Seq("a", "b").foreach { tag =>
      val vals = all.filter(_._2 == tag).map(_._3).sorted
      val (n, p50, p95) = q(tag)
      assert(n == vals.length, s"$tag: exact count must survive the merge")
      def rank(v: Double) = vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rank(p50) - 0.5) <= 0.02, s"$tag p50=$p50 rank ${rank(p50)}")
      assert(math.abs(rank(p95) - 0.95) <= 0.02, s"$tag p95=$p95 rank ${rank(p95)}")
    }
  }

  test("freqRollupToTable: multi-batch MG partials merge losslessly at full capacity") {
    val srcDir = tmpDir("mgroll-src")
    val h = 3600000L
    val base = 1704067200000L
    val rnd = new scala.util.Random(11)
    // zipf-ish item draws split over three files/triggers
    val chunks = (0 until 3).map(c => (0 until 200).map { i =>
      val item = (math.pow(rnd.nextDouble(), 2) * 20).toInt
      (base + c * h + i * 1000L, if (i % 2 == 0) "a" else "b", item.toDouble)
    })
    chunks.foreach(rows => writeSource(srcDir, rows))

    val e = new TsdbEngine(spark, tmpDir("mgroll-wh"))
    val sk = graft.streaming.Rollup.freqRollupToTable(
      e, srcDir, "*.parquet", schema, nanosTs = false,
      "ts", "tag", "v", bucketSeconds = 86400L, k = 1000, "mgroll",
      maxFilesPerTrigger = Some(1))
    val partials = sk.count()
    assert(partials > 2, s"expected per-batch partial rows, got $partials")
    // capacity >= universe: the merged top-k must be EXACT per tag
    val got = graft.operators.FreqRollup.topK(sk, Seq("tag"), 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val all = chunks.flatten
    val want = Seq("a", "b").flatMap { tag =>
      all.filter(_._2 == tag).groupBy(_._3.toString).view
        .mapValues(_.size.toLong).toSeq
        .sortBy { case (item, n) => (-n, item) }.take(3)
        .map { case (item, n) => (tag, item, n) }
    }.toSet
    assert(got == want)
  }

  test("SeriesRate: per-series state chains across micro-batches, evicts on timeout") {
    import graft.streaming.SeriesRate
    import graft.streaming.SeriesRate.{LastSample, RatePoint, SampleIn}

    // pure transition-function checks (no streaming machinery)
    val idle = Some("1 hour")
    val state = new TestGroupState[LastSample]
    val out1 = SeriesRate.transition(idle)("a", Iterator(
      SampleIn("a", 2000000L, 5.0), SampleIn("a", 1000000L, 1.0)), state).toSeq
    // sorted by time inside the batch: (1s,1.0) -> (2s,5.0) = 4.0/s
    assert(out1 == Seq(RatePoint("a", 2000000L, 4.0)))
    assert(state.value.contains(LastSample(2000000L, 5.0)))
    // next batch chains onto carried state: (2s,5.0) -> (4s,6.0) = 0.5/s
    val out2 = SeriesRate.transition(idle)("a", Iterator(
      SampleIn("a", 4000000L, 6.0)), state).toSeq
    assert(out2 == Seq(RatePoint("a", 4000000L, 0.5)))
    // timeout call clears the series' state, emits nothing
    state.timedOut = true
    assert(SeriesRate.transition(idle)("a", Iterator.empty, state).isEmpty)
    assert(state.value.isEmpty && state.removed)

    // end-to-end through a replayed stream into an engine table
    val srcDir = tmpDir("srate-src")
    val base = 1704067200000L
    writeSource(srcDir, Seq(
      (base, "x", 1.0), (base + 2000, "x", 5.0), (base + 4000, "x", 4.0),
      (base + 1000, "y", 10.0), (base + 3000, "y", 10.5)))
    val e = new TsdbEngine(spark, tmpDir("srate-wh"))
    val got = graft.streaming.SeriesRate.rateToTable(
        e, srcDir, "*.parquet", schema, nanosTs = false,
        "ts", "tag", "v", "sr")
      .orderBy("series", "ts").collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Double]("rate"))).toSeq
    assert(got == Seq(("x", 2.0), ("x", -0.5), ("y", 0.25)), s"got $got")
  }

  test("memory-sink harness (test-only) agrees with the engine-table operator") {
    val srcDir = tmpDir("rollup-src2")
    val base = 1704067200000L
    writeSource(srcDir, Seq(
      (base + 1000, "x", 1.0), (base + 2000, "x", 2.0), (base + 3000, "y", 4.0)))

    val sinkName = "rollup_mem_check"
    val q = graft.streaming.Rollup.windowAgg(
        spark, srcDir, "*.parquet", schema, nanosTs = false, "ts", "tag", "v", "1 hour")
      .writeStream.trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("rollup-ckpt2"))
      .format("memory").queryName(sinkName).start()
    q.awaitTermination()
    val mem = spark.table(sinkName).orderBy("tag").collect()
      .map(r => (r.getAs[String]("tag"), r.getAs[Long]("n"), r.getAs[Double]("total"))).toSeq

    val e = new TsdbEngine(spark, tmpDir("rollup-wh2"))
    val tbl = graft.streaming.Rollup.windowedRollupToTable(
        e, srcDir, "*.parquet", schema, nanosTs = false,
        "ts", "tag", "v", "1 hour", "2 hours", "roll2")
      .orderBy("tag").collect()
      .map(r => (r.getAs[String]("tag"), r.getAs[Long]("n"), r.getAs[Double]("total"))).toSeq
    assert(mem == tbl && tbl == Seq(("x", 2L, 3.0), ("y", 1L, 4.0)))
  }
}
