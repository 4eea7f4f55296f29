package graft

import graft.engine.TsdbEngine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Session windows, stream-stream interval joins, and partitioned engine
  * sinks (SURVEY §2.9 streaming extensions beyond the q64/q66/q73 family).
  */
class StreamingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("key", StringType),
    StructField("typ", StringType), StructField("v", DoubleType)))

  private def writeSource(dir: String, rows: Seq[(Long, String, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (ms, k, t, v) => (new java.sql.Timestamp(ms), k, t, v) }
      .toDF("ts", "key", "typ", "v")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  private def scanPartitionFilters(df: DataFrame): String = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).mkString(";")
  }

  private val base = 1704067200000L // 2024-01-01T00:00Z
  private val min = 60000L

  test("session windows: gap merge, closed-only emission under watermark") {
    val src = tmpDir("sess-src")
    // key a: events at 0,5,8 min (one session, gap 10m) then 30,33 min
    //   (second session); key b: single event at 2 min.
    // max event time = 40 min (key c sentinel far ahead so earlier sessions
    //   close under the 5m watermark delay: watermark = 40m - 5m = 35m).
    writeSource(src, Seq(
      (base, "a", "x", 1.0), (base + 5 * min, "a", "x", 2.0),
      (base + 8 * min, "a", "x", 3.0),
      (base + 30 * min, "a", "x", 4.0), (base + 33 * min, "a", "x", 5.0),
      (base + 2 * min, "b", "x", 10.0),
      (base + 40 * min, "c", "x", 0.0)))

    val e = new TsdbEngine(spark, tmpDir("sess-wh"))
    val out = graft.streaming.Sessionize.sessionsToTable(
        e, src, "*.parquet", schema, nanosTs = false,
        "ts", "key", "v", "10 minutes", "5 minutes", "sessions")
      .orderBy("key", "session_start")
      .collect()
      .map(r => (r.getString(1), r.getTimestamp(0).getTime, r.getTimestamp(2).getTime,
        r.getLong(3), r.getDouble(4)))

    // closed sessions: a[0,8m]+gap → end 18m ≤ 35m ✓; a[30,33]+gap → end 43m
    // > 35m (open, NOT emitted); b[2m] → end 12m ✓; c[40m] → end 50m (open).
    assert(out.toSeq == Seq(
      ("a", base, base + 18 * min, 3L, 6.0),
      ("b", base + 2 * min, base + 12 * min, 1L, 10.0)))
  }

  test("streaming dedup: duplicates across files dropped, state watermark-bounded") {
    val src = tmpDir("sdedup-src")
    // same (key) delivered in two separate files (two microbatch arrivals)
    writeSource(src, Seq(
      (base, "k1", "x", 1.0), (base + min, "k2", "x", 2.0)))
    writeSource(src, Seq(
      (base, "k1", "x", 1.0),          // duplicate of file-1 row
      (base + 2 * min, "k3", "x", 3.0)))

    val e = new TsdbEngine(spark, tmpDir("sdedup-wh"))
    e.execute(
      """CREATE TABLE dd (ts timestamp NOT NULL, key string TAG, v double,
        |  timestamp KEY(ts))
        |ENGINE=Analytic WITH (update_mode='append', enable_ttl='false')""".stripMargin)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force one file per microbatch
      .parquet(src).select("ts", "key", "v")
    val out = graft.streaming.StreamDedup.dedupToTable(
        e, stream, "ts", "10 minutes", Seq("key"), "dd")
      .orderBy("key").collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("k1", 1.0), ("k2", 2.0), ("k3", 3.0)))
  }

  test("stream-stream interval join: pairs within span, keyed, both watermarked") {
    val src = tmpDir("ssj-src")
    // clicks at 0 and 60m for key a; purchases at 10m (matches click@0),
    // 70m (matches click@60m), and 200m (matches nothing within 30m span).
    // key b: click with no purchase.
    writeSource(src, Seq(
      (base, "a", "click", 0.0), (base + 60 * min, "a", "click", 0.0),
      (base + 10 * min, "a", "purchase", 1.0), (base + 70 * min, "a", "purchase", 2.0),
      (base + 200 * min, "a", "purchase", 3.0),
      (base + 5 * min, "b", "click", 0.0)))

    val e = new TsdbEngine(spark, tmpDir("ssj-wh"))
    val out = graft.streaming.StreamJoin.intervalJoinToTable(
        e, src, "*.parquet", schema, nanosTs = false,
        "ts", "key", "typ", "click", "purchase", "30 minutes", "5 minutes", "pairs")
      .orderBy("left_ts")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getTimestamp(2).getTime))

    assert(out.toSeq == Seq(
      (base, "a", base + 10 * min),
      (base + 60 * min, "a", base + 70 * min)))
  }

  test("stream-stream LEFT OUTER join: matches + watermark-expired nulls only") {
    val src = tmpDir("sslj-src")
    // span 30m, delay 5m. Final watermark W = min(max click, max purchase)
    // - 5m = min(300m, 200m) - 5m = 195m.
    //   click a@0   -> purchase a@10m  => pair
    //   click b@5m  -> no purchase; 5m + 30m = 35m < 195m  => null row
    //   click c@180m-> no purchase; 180m + 30m = 210m >= 195m => stays in
    //     state, emits NOTHING
    //   click a@300m (the left-side max, advances the left watermark)
    //     -> no purchase; 300m + 30m >= 195m => nothing
    writeSource(src, Seq(
      (base, "a", "click", 0.0), (base + 10 * min, "a", "purchase", 1.0),
      (base + 5 * min, "b", "click", 0.0),
      (base + 180 * min, "c", "click", 0.0),
      (base + 300 * min, "a", "click", 0.0),
      (base + 200 * min, "z", "purchase", 9.0))) // right-side max

    val e = new TsdbEngine(spark, tmpDir("sslj-wh"))
    val out = graft.streaming.StreamJoin.intervalLeftJoinToTable(
        e, src, "*.parquet", schema, nanosTs = false,
        "ts", "key", "typ", "click", "purchase", "30 minutes", "5 minutes",
        "pairs_left")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1),
        Option(r.getTimestamp(2)).map(_.getTime)))
      .toSet
    assert(out == Set(
      (base, "a", Some(base + 10 * min)),
      (base + 5 * min, "b", None)), out.toString)
  }

  test("streaming maintenance tick: sink table compacts during ingest, results unchanged") {
    val src = tmpDir("maint-src")
    writeSource(src, Seq(
      (base + min, "a", "x", 1.0), (base + 2 * min, "a", "x", 2.0),
      (base + 61 * min, "b", "x", 20.0)))
    val e = new TsdbEngine(spark, tmpDir("maint-wh"))
    val read = graft.streaming.Rollup.windowedRollupToTable(
      e, src, "*.parquet", schema, nanosTs = false,
      "ts", "key", "v", "1 hour", "2 hours", "roll_mt",
      maintain = Some((1L, 1)))
    assert(read.orderBy("key").collect().map(r =>
      (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      == Seq(("a", 2L, 3.0), ("b", 1L, 20.0)))
    // the per-batch tick ran the logical compaction: seq floor advanced,
    // so the read needs no dedup window over the compacted base
    assert(e.catalog.compactionState("roll_mt")._2 > 0L,
      e.catalog.compactionState("roll_mt").toString)
  }

  test("partitioned streaming sink: rollup lands in bucket dirs, reads prune") {
    val src = tmpDir("psink-src")
    writeSource(src, Seq(
      (base + min, "a", "x", 1.0), (base + 2 * min, "a", "x", 2.0),
      (base + min, "b", "x", 10.0), (base + 61 * min, "b", "x", 20.0)))

    val wh = tmpDir("psink-wh")
    val e = new TsdbEngine(spark, wh)
    val read = graft.streaming.Rollup.windowedRollupToTable(
      e, src, "*.parquet", schema, nanosTs = false,
      "ts", "key", "v", "1 hour", "2 hours", "roll_pk", partitionByKey = Some(4))

    // bucket dirs exist on disk under the table's segment layout
    val tableDir = new java.io.File(wh, "roll_pk")
    def hasBucketDir(f: java.io.File): Boolean =
      f.isDirectory && (f.getName.startsWith("__bucket=") || f.listFiles().exists(hasBucketDir))
    assert(hasBucketDir(tableDir), s"no __bucket= dirs under $tableDir")

    // tag-filtered read prunes to the tag's bucket
    val q = read.filter(col("key") === "b")
    assert(scanPartitionFilters(q).contains("__bucket"),
      "expected __bucket partition filter in the filtered rollup read")
    assert(q.orderBy("bucket").collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq
      == Seq((1L, 10.0), (1L, 20.0)))

    // unfiltered read: full rollup equals the batch aggregate
    assert(read.count() == 3)
  }

  test("ewma anomaly transition: warm-up guard, pre-update flag, state chaining") {
    import graft.streaming.AnomalyDetect
    import graft.streaming.AnomalyDetect.{Anomaly, EwmState, SampleIn}
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val step = AnomalyDetect.transition(
      alpha = 0.25, k = 4.0, warm = 16, idleTimeout = None) _

    // batch 1: an early outlier (sample 5) inside warm-up must NOT flag
    val st = TestGroupState.create[EwmState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long](), false)
    val b1 = (1 to 10).map(i =>
      SampleIn("s", i * 1000L, if (i == 5) 99.0 else 10.0))
    assert(step("s", b1.iterator, st).isEmpty, "warm-up must suppress flags")
    assert(st.get.n == 10L)

    // batch 2 chains on batch 1's state: constant series drives ewmvar
    // toward 0, then a spike must flag against PRE-update stats
    val b2 = (11 to 40).map(i =>
      SampleIn("s", i * 1000L, if (i == 40) 50.0 else 10.0))
    val out = step("s", b2.iterator, st).toSeq
    assert(out.length == 1, out.toString)
    val a = out.head
    assert(a.tsUs == 40000L && a.value == 50.0)
    // mean just before the spike is ~10 (within rounding): dev ~ +40
    assert(a.dev1e4 > 390000L && a.dev1e4 <= 400000L, a.dev1e4.toString)
    // the spike IS folded into state after flagging
    assert(st.get.n == 40L && st.get.mean > 10.0)

    // out-of-order arrivals within a batch are time-sorted before chaining:
    // same points shuffled give the same single flag
    val st2 = TestGroupState.create[EwmState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long](), false)
    val shuffled = new scala.util.Random(7).shuffle((b1 ++ b2).toList)
    val out2 = step("s", shuffled.iterator, st2).toSeq
    assert(out2.map(x => (x.tsUs, x.value, x.dev1e4)) ==
      out.map(x => (x.tsUs, x.value, x.dev1e4)))
  }

  test("stageArrivalFiles: duplicate quantile bounds still stage exactly nBatches files") {
    import spark.implicits._
    // every arrival value identical -> all quantile bounds collapse ->
    // batches 1..n-1 are empty; the one-write staging (r11) must
    // back-fill them so the replayed file count (and batch_id numbering)
    // matches the per-batch-write behavior it replaced
    val rows = Seq.fill(6)((100L, 1000L)).toDF("arr", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("arr", "ts")
    val dir = tmpDir("graft-wm-stage-dup")
    graft.streaming.WatermarkAudit.stageArrivalFiles(rows, "arr", 4, dir)
    val staged = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    assert(staged.length == 4, staged.mkString(","))
    assert(staged.head == "part000.parquet" && staged.last == "part003.parquet",
      staged.mkString(","))
    // all six rows live in exactly one non-empty file; the rest are empty
    val counts = staged.map(f => spark.read.parquet(s"$dir/$f").count())
    assert(counts.sum == 6 && counts.count(_ > 0) == 1, counts.mkString(","))
  }

  test("watermark audit: late row beyond delay is dropped and counted, in-delay late row is not") {
    import spark.implicits._
    // arrival order (arr), event time (sec): batch 1 advances the clock to
    // 1000s; batch 2 carries one row 5s late (inside the 60s watermark ->
    // kept) and batch 3 one row 500s late (window long closed -> dropped).
    val rows = Seq(
      (1L, 100L), (2L, 900L), (3L, 1000L),          // batch 1
      (4L, 1010L), (5L, 995L),                      // batch 2: 5s late, kept
      (6L, 1100L), (7L, 400L)                       // batch 3: 500s late, dropped
    ).toDF("arr", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("tag", lit("t"))
      .select("arr", "ts", "tag")
    val dir = tmpDir("graft-wm-audit")
    graft.streaming.WatermarkAudit.stageArrivalFiles(rows, "arr", 3, dir)
    val schema = spark.read.parquet(s"$dir/part000.parquet").schema
    val audit = graft.streaming.WatermarkAudit.audit(
        spark, dir, schema, "ts", "tag", delaySeconds = 60L,
        windowSeconds = 60)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(audit.length == 3, audit.mkString(","))
    assert(audit.map(_._1).sum == 7, audit.mkString(","))  // all rows arrived
    // authoritative data-derived lateness: only the 500s-late row in batch 3
    // (the 5s-late row in batch 2 is inside the 60s delay)
    assert(audit.map(_._2) sameElements Array(0L, 0L, 1L), audit.mkString(","))
    // the engine's window-granular counter agrees here (the late row's
    // window was long evicted, so it reaches the state op and is counted)
    assert(audit.map(_._3) sameElements Array(0L, 0L, 1L), audit.mkString(","))
  }

  test("streaming decontamination gate == batch clean; contaminated rows never land") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val srcDir = tmpDir("gate-src")
    val docs = Seq(
      (1L, "a b c d"),        // shares 2-gram "b c" with the bench
      (2L, "x y z w"),        // clean
      (3L, "q r"),            // clean (no bench gram)
      (4L, "p b c")           // shares "b c" too
    ).toDF("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val bench = Seq(Tuple1("m b c n")).toDF("text")
    val out = graft.streaming.StreamGate.decontaminateToParquet(
      spark, srcDir, "*.parquet", docs.schema, "doc_id", "text",
      bench, "text", n = 2, tmpDir("gate-out"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // the defining identity: gate output == the batch operator's clean view
    val batch = graft.pipeline.Decontaminate.clean(
      docs, "doc_id", "text", bench, "text", n = 2)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      batch.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
