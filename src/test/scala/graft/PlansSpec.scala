package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape assertions for the 100 TB posture: filters and projections
  * must reach the parquet scan, small dimensions must broadcast, aggregates
  * must have a partial (map-side) phase, and the hot relational path must
  * stay inside WholeStageCodegen. Regressions here are scale bugs even when
  * results stay correct.
  */
class PlansSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
      case other => other.children.flatMap(walk)
    }
    walk(finalPlan(df))
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("filter + projection push into the parquet scan") {
    val s = scans(q("q02_filter_project"))
    assert(s.nonEmpty)
    assert(s.exists(_.dataFilters.nonEmpty), "no data filters at the scan")
    assert(s.forall(_.requiredSchema.fields.length <= 5),
      s"scan reads too many columns: ${s.map(_.requiredSchema.fieldNames.mkString(","))}")
  }

  test("time-range scan pushes ts bounds into parquet (nanos bridge)") {
    val s = scans(q("q30_time_range_scan"))
    val pushed = s.flatMap(_.metadata.get("PushedFilters")).mkString
    assert("GreaterThan[^(]*\\(ts".r.findFirstIn(pushed).isDefined &&
           "LessThan[^(]*\\(ts".r.findFirstIn(pushed).isDefined,
      s"time range not pushed: $pushed")
  }

  test("small dimension joins broadcast") {
    assert(finalPlan(q("q03_join_broadcast")).toString.contains("BroadcastHashJoin"))
  }

  test("aggregation has a partial (map-side) phase") {
    assert(finalPlan(q("q01_pricing_summary")).toString.contains("partial_"))
  }

  test("plan lint: flags the 100TB anti-patterns, passes disciplined plans") {
    import graft.plans.PlanLint
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{expr, row_number, sum}
    val a = spark.range(100).toDF("x")
    val b = spark.range(100).toDF("y")

    // cartesian product
    assert(PlanLint.lint(a.crossJoin(b)).has("cartesian-product"))
    // single-partition window
    assert(PlanLint.lint(
      a.withColumn("rn", row_number().over(W.orderBy("x"))))
      .has("single-partition-window"))
    // global sort without a limit; the limit-absorbed form passes
    assert(PlanLint.lint(a.orderBy("x")).has("global-sort-no-limit"))
    assert(!PlanLint.lint(a.orderBy("x").limit(5)).has("global-sort-no-limit"))
    // interpreted HOF lambda in a projection
    assert(PlanLint.lint(
      a.select(expr("aggregate(sequence(1, 3), 0L, (acc, v) -> acc + v + x)")))
      .has("interpreted-expression"))

    // a disciplined keyed aggregate lints clean (one shuffle, advisory)
    val good = PlanLint.lint(
      Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
        .groupBy("l_returnflag").agg(sum("l_quantity")))
    assert(good.clean, good.findings.toString)
    assert(good.shuffles <= 1 && good.scans >= 1, (good.shuffles, good.scans).toString)

    // wide scans flag; narrow projected scans don't
    val li = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    assert(PlanLint.lint(li, wideScanCols = 10).has("wide-scan"))
    assert(!PlanLint.lint(li.select("l_orderkey", "l_quantity"), wideScanCols = 10)
      .has("wide-scan"))
  }

  test("hot relational path runs in WholeStageCodegen") {
    // treeString marks codegen stages with "*(n)"
    assert(finalPlan(q("q01_pricing_summary")).toString.contains("*("))
  }

  test("semi/anti joins stay joins (no subquery re-execution)") {
    assert(finalPlan(q("q05_semi_join")).toString.contains("LeftSemi"))
    assert(finalPlan(q("q06_anti_join")).toString.contains("LeftAnti"))
  }

  test("PromQL lowering pushes matcher + window filters to the scan") {
    val df = SparkEntry.queries("q41_promql_rate")(spark, dir)
    val pushed = scans(df).flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan"), s"time window not pushed: $pushed")
  }

  test("default embedding near-dup operator never builds a cartesian product") {
    val emb = Tables.t(spark, dir, "embeddings")
    val df = graft.pipeline.Similarity.nearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.9)
    val plan = finalPlan(df).toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"default near-dup must stay a bucket equi-join, got:\n$plan")
  }

  test("map-only text kernels run shuffle-free end to end") {
    // the quality/objective kernels (entropy, normalization, T5/MLM
    // masking, FIM) claim map-only execution — no Exchange may appear
    // anywhere in their plans
    for (name <- Seq("q137_char_entropy", "q152_t5_span_corrupt",
        "q154_mlm_mask", "q153_fim_transform")) {
      val plan = finalPlan(q(name)).toString
      assert(!plan.contains("Exchange"),
        s"$name must be map-only, found a shuffle in:\n$plan")
    }
  }

  test("per-key cap rewrites to WindowGroupLimit (map-side top-n per key)") {
    // the rank filter must become a group limit BEFORE the shuffle, so a
    // dominating key ships O(tasks·n) rows, not its whole partition
    val plan = finalPlan(q("q92_source_cap")).toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    assert("(?s)Partial.*WindowGroupLimit|WindowGroupLimit.*Partial".r
        .findFirstIn(plan).isDefined || plan.contains("Partial"),
      s"expected a partial (pre-shuffle) group limit phase in:\n$plan")
  }

  test("keep-best cluster dedup takes its top-1 partially (WindowGroupLimit)") {
    // one survivor per near-dup cluster: the argmax must be a group limit
    // taken BEFORE the shuffle, so a mega-cluster ships O(tasks) doc
    // payloads to the reducer, not every member
    val plan = finalPlan(q("q282_keep_best_dedup")).toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"),
      s"expected a partial (pre-shuffle) group limit phase in:\n$plan")
  }

  test("ts range filter pushes to parquet on the REAL driver fixture") {
    // the driver regenerates fixtures per round and the event-time physical
    // type has already changed once (nanos -> µs-NTZ); whatever bridge
    // Tables.t inserts (div-1000 derivation, NTZ->LTZ cast), a range filter
    // written against the normalized column must still unwrap to a pushed
    // parquet filter — a 100 TB scan without row-group pruning is the
    // single worst silent regression a fixture change could cause
    import org.apache.spark.sql.functions.{col, lit}
    val df = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .filter(col("ts") >=
          lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-11 00:00:00")))
      .select("event_id", "ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"time-range filter did not reach the parquet scan:\n$plan")
  }

  test("runtime bloom filter injects into a selective fact-dim shuffle join") {
    import org.apache.spark.sql.functions.col
    // at 100 TB a selective dim filter should row-prune the fact scan
    // BEFORE the shuffle (Spark's runtime bloom filter); keep the feature
    // provably live under this engine's session settings. Thresholds are
    // lowered only because the fixture is tiny; on real data the defaults
    // (10 MB creation side) fire on their own.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = Tables.t(spark, dir, "lineitem")
      val dim = Tables.t(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter in:\n$optimized")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed co-located join: zero exchanges, zero sorts") {
    import org.apache.spark.sql.functions.col
    // forbid broadcast so the join must be sort-merge — the case bucketing
    // exists for; bucketed scans provide both partitioning AND order, so
    // the SMJ needs no exchange and no sort on either side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.t(spark, dir, "lineitem").select(col("l_orderkey"))
      val ord = Tables.t(spark, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      val joined = graft.operators.Colocate.bucketedEquiJoin(spark,
        li, "graft_bkt_spec_li", ord, "graft_bkt_spec_ord",
        "l_orderkey", buckets = 4)
      val plan = finalPlan(joined).toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      // the scale win: NO exchange on either side. (A local per-bucket
      // Sort remains: since SPARK-28632 Spark only trusts sortBy file
      // order for single-file buckets, and sorting already-sorted runs
      // is near-free; the shuffle is what would dominate at 100 TB.)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // layout is result-invisible
      assert(joined.count() ==
        li.join(ord, "l_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_spec_li")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_spec_ord")
    }
  }

  test("capDeduped: default plan is the single domain window; salted adds the bucket phase") {
    import spark.implicits._
    import graft.pipeline.UrlCanon
    val deduped = (1L to 100L)
      .map(i => (s"http://a.com/p$i", "a.com", i, 1L))
      .toDF("url_canonical", "url_domain", "keeper_id", "n_variants")
    def windows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    // default path unchanged: exactly ONE window, keyed by url_domain only
    val plain = windows(UrlCanon.capDeduped(deduped, 5))
    assert(plain.size == 1, plain.toString)
    assert(plain.head.partitionSpec.size == 1, plain.head.partitionSpec.toString)
    // salted path: phase-1 window keyed by (url_domain, bucket), then the
    // bounded per-domain re-rank
    val salted = windows(UrlCanon.capDeduped(deduped, 5, salt = 8))
    assert(salted.size == 2, salted.toString)
    assert(salted.map(_.partitionSpec.size).sorted == Seq(1, 2),
      salted.map(_.partitionSpec.size).toString)
  }

  test("two-phase prefix scans plan partitioned windows only (PPS sampler)") {
    import spark.implicits._
    // the global cumsum must ride per-partition windows (partitioned by
    // __pid), never one unpartitioned window — the single-reducer cumsum
    // is exactly the 100 TB regression this guard pins
    val df = (1L to 1000L).map(i => i -> (i % 7 + 1)).toDF("id", "w")
    val out = graft.pipeline.Sampling.systematicPps(df, "id", "w", 10)
    val rep = graft.plans.PlanLint.lint(out)
    assert(!rep.has("single-partition-window"), rep.findings.mkString(", "))
    assert(out.agg(org.apache.spark.sql.functions.sum("n_hits"))
      .head().getLong(0) == 10)
  }
}
