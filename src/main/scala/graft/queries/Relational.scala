package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator battery (SURVEY.md §2.2-§2.6): everything the
  * reference inherits from DataFusion, re-expressed as Catalyst built-ins.
  * Each query carries its DuckDB oracle.
  *
  * Float policy: double aggregates are round()ed on BOTH sides so that
  * last-bit accumulation-order differences between engines can't flip the
  * driver's hash compare. Raw column passthrough stays unrounded (values are
  * bit-identical out of the same parquet).
  */
object Relational {
  import Tables.t

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  val all: Seq[GraftQuery] = Seq(

    // ---- aggregation: partial/final hash agg, the reference's optimizer.result plan
    GraftQuery("q01_pricing_summary",
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(ts("2001-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          count(lit(1)).as("count_order"))),

    // ---- projection + filter pushdown to parquet scan
    GraftQuery("q02_filter_project",
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1998-03-01 00:00:00'
             |  AND l_quantity > 45""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(ts("1998-01-01 00:00:00")) &&
                col("l_shipdate") <  lit(ts("1998-03-01 00:00:00")) &&
                col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")),

    // ---- broadcast hash join (small dim broadcast — 100 TB posture)
    GraftQuery("q03_join_broadcast",
      Some("""SELECT c.c_mktsegment, count(*) AS n_orders,
             |  round(sum(o.o_totalprice), 2) AS revenue
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |GROUP BY c.c_mktsegment""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))),

    // ---- multi-way join through two dimension hops
    GraftQuery("q04_join_multiway",
      Some("""SELECT r.r_name, n.n_name, count(*) AS n_cust,
             |  round(sum(c.c_acctbal), 2) AS total_bal
             |FROM customer c
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |GROUP BY r.r_name, n.n_name""".stripMargin),
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))),

    // ---- left semi join (EXISTS)
    GraftQuery("q05_semi_join",
      Some("""SELECT o_orderpriority, count(*) AS n
             |FROM orders
             |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
             |GROUP BY o_orderpriority""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 49),
              col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))),

    // ---- left anti join (NOT EXISTS)
    GraftQuery("q06_anti_join",
      Some("""SELECT c_mktsegment, count(*) AS n
             |FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |GROUP BY c_mktsegment""".stripMargin),
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))),

    // ---- window: rank within group (deterministic tiebreak on unique key)
    GraftQuery("q07_window_top_per_key",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn = 1""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")),

    // ---- window: running aggregate over ordered frames
    GraftQuery("q08_window_running_sum",
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
             |FROM lineitem WHERE l_suppkey <= 5""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(sum("l_quantity").over(
            Window.partitionBy("l_suppkey")
              .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_qty"))),

    // ---- top-k (TakeOrderedAndProject), total order via unique tiebreak
    GraftQuery("q09_topk",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)),

    // ---- DISTINCT
    GraftQuery("q10_distinct",
      Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"),
      (s, dir) => t(s, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()),

    // ---- COUNT(DISTINCT), multiple per group
    GraftQuery("q11_count_distinct",
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
             countDistinct("l_suppkey").as("n_supps"))),

    // ---- set op: INTERSECT
    GraftQuery("q12_intersect",
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin),
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),

    // ---- set op: EXCEPT
    GraftQuery("q13_except",
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin),
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),

    // ---- HAVING (post-aggregation filter)
    GraftQuery("q14_having",
      Some("""SELECT l_partkey, round(sum(l_quantity), 2) AS total_qty
             |FROM lineitem GROUP BY l_partkey
             |HAVING sum(l_quantity) > 250""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(round(sum("l_quantity"), 2).as("total_qty"), sum("l_quantity").as("__raw"))
        .filter(col("__raw") > 250)
        .drop("__raw")),

    // ---- scalar expressions: CASE / string / math
    GraftQuery("q15_case_string_math",
      Some("""SELECT
             |  CASE WHEN o_totalprice > 300000 THEN 'big'
             |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
             |  upper(substr(o_orderpriority, 1, 8)) AS prio,
             |  count(*) AS n,
             |  round(sum(abs(o_totalprice) * 0.1), 2) AS tithe,
             |  min(length(o_orderstatus)) AS min_len
             |FROM orders GROUP BY 1, 2""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .groupBy(
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid").otherwise("small").as("bucket"),
          upper(substring(col("o_orderpriority"), 1, 8)).as("prio"))
        .agg(count(lit(1)).as("n"),
             round(sum(abs(col("o_totalprice")) * 0.1), 2).as("tithe"),
             min(length(col("o_orderstatus"))).as("min_len"))),

    // ---- ROLLUP
    GraftQuery("q16_rollup",
      Some("""SELECT coalesce(l_returnflag, '<all>') AS rf,
             |  coalesce(l_linestatus, '<all>') AS ls,
             |  count(*) AS n, round(sum(l_quantity), 2) AS qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
                coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
                col("n"), col("qty"))),

    // ---- CUBE
    GraftQuery("q17_cube",
      Some("""SELECT coalesce(o_orderstatus, '<all>') AS st,
             |  coalesce(o_orderpriority, '<all>') AS prio, count(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("<all>")).as("st"),
                coalesce(col("o_orderpriority"), lit("<all>")).as("prio"),
                col("n"))),

    // ---- scalar subquery
    GraftQuery("q18_scalar_subquery",
      Some("""SELECT o_orderstatus, count(*) AS n_above
             |FROM orders
             |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
             |GROUP BY o_orderstatus""".stripMargin),
      (s, dir) => {
        // scalar subquery as a broadcast cross join — stays fully distributed
        val o = t(s, dir, "orders")
        val threshold = o.agg(avg("o_totalprice").as("__avg"))
        o.crossJoin(broadcast(threshold))
          .filter(col("o_totalprice") > col("__avg"))
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n_above"))
      }),

    // ---- IN subquery (rewrites to semi join)
    GraftQuery("q19_in_subquery",
      Some("""SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS total
             |FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_size") > 40).select("p_partkey")),
              col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))),

    // ---- statistical aggregates
    GraftQuery("q20_stats_agg",
      Some("""SELECT event_type, count(*) AS n,
             |  round(avg("value"), 4) AS mean_v,
             |  round(stddev_samp("value"), 3) AS sd_v,
             |  round(min("value"), 2) AS min_v, round(max("value"), 2) AS max_v
             |FROM events GROUP BY event_type""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             round(avg("value"), 4).as("mean_v"),
             round(stddev_samp("value"), 3).as("sd_v"),
             round(min("value"), 2).as("min_v"),
             round(max("value"), 2).as("max_v"))),

    // ---- exact percentiles (interpolating)
    GraftQuery("q21_percentile",
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
             |  round(quantile_cont(l_quantity, 0.9), 4) AS p90
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
             round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"))),

    // ---- date_trunc rollup on the events stream table
    GraftQuery("q22_date_trunc",
      Some("""SELECT date_trunc('day', ts) AS day, count(*) AS n,
             |  round(sum("value"), 2) AS total
             |FROM events GROUP BY 1""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))),

    // ---- date_bin-style arbitrary-width bucketing (reference tests date_bin)
    GraftQuery("q23_date_bin_15m",
      Some("""SELECT make_timestamp((epoch_ms(ts) // 900000) * 900000 * 1000) AS bucket,
             |  count(*) AS n
             |FROM events GROUP BY 1""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy(timestamp_millis(
          floor(unix_millis(col("ts")) / 900000L).cast("long") * 900000L).as("bucket"))
        .agg(count(lit(1)).as("n"))),

    // ---- UNION ALL of heterogeneous filters
    GraftQuery("q24_union_all",
      Some("""SELECT 'hot' AS tag, event_type, count(*) AS n
             |FROM events WHERE "value" > 150 GROUP BY event_type
             |UNION ALL
             |SELECT 'cold' AS tag, event_type, count(*) AS n
             |FROM events WHERE "value" <= 150 GROUP BY event_type""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "events")
        val hot = e.filter(col("value") > 150).groupBy("event_type")
          .agg(count(lit(1)).as("n")).select(lit("hot").as("tag"), col("event_type"), col("n"))
        val cold = e.filter(col("value") <= 150).groupBy("event_type")
          .agg(count(lit(1)).as("n")).select(lit("cold").as("tag"), col("event_type"), col("n"))
        hot.unionAll(cold)
      }),

    // ---- skew-busting salted join (graft.operators.SaltedJoin): the
    //      deterministic-salt fact-dim join; result is row-identical to
    //      the plain join, which is exactly what the oracle checks
    GraftQuery("q176_salted_join",
      Some("""SELECT p.p_brand, l.l_returnflag, count(*) AS n,
             |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val dim = t(s, dir, "part")
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))
        graft.operators.SaltedJoin.join(li, dim, Seq("l_partkey"),
            saltByCol = "l_orderkey", factor = 8)
          .groupBy("p_brand", "l_returnflag")
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"))
      }),

    // ---- bucketed co-located join (operators/Colocate): both sides
    //      persisted bucketBy+sortBy on the join key, then sort-merge
    //      joined with ZERO exchanges and ZERO sorts (plan-asserted in
    //      PlansSpec). The oracle is the plain join — layout must be
    //      result-invisible. Prices sum as exact integer cents.
    GraftQuery("q231_bucketed_join",
      Some("""SELECT o.o_orderpriority, count(*)::BIGINT AS n,
             |  sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))::BIGINT AS cents
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |GROUP BY 1""".stripMargin),
      (s, dir) => {
        val suffix = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes).map("%02x".format(_)).mkString.take(8)
        val li = t(s, dir, "lineitem").select(col("l_orderkey"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("__cents"))
        val ord = t(s, dir, "orders").select(
          col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.operators.Colocate.bucketedEquiJoin(s,
            li, s"graft_bkt_li_$suffix", ord, s"graft_bkt_ord_$suffix",
            "l_orderkey", buckets = 8)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("__cents")).as("cents"))
      }),

    // ---- key-skew profiler (operators/SkewReport.keySkew): the
    //      pre-shuffle diagnostic — exact rows-per-key percentiles,
    //      heaviest-key share, and the straggler factor a hash
    //      partitioning on this key would suffer. All integer arithmetic
    //      (div / nearest-rank), so the report is oracle-exact.
    GraftQuery("q251_skew_report",
      Some("""WITH c AS (SELECT o_custkey, count(*) AS c
             |  FROM orders GROUP BY 1),
             |r AS (SELECT c, row_number() OVER (ORDER BY c, o_custkey) AS rk,
             |  count(*) OVER () AS k FROM c)
             |SELECT sum(c)::BIGINT AS n_rows, max(k)::BIGINT AS n_keys,
             |  max(c)::BIGINT AS max_key_rows,
             |  ((max(c) * 10000) // sum(c))::BIGINT AS top1_share_bp,
             |  max(CASE WHEN rk = greatest(CAST(ceil(k * 50 / 100.0) AS BIGINT), 1)
             |    THEN c END)::BIGINT AS p50_key_rows,
             |  max(CASE WHEN rk = greatest(CAST(ceil(k * 90 / 100.0) AS BIGINT), 1)
             |    THEN c END)::BIGINT AS p90_key_rows,
             |  max(CASE WHEN rk = greatest(CAST(ceil(k * 99 / 100.0) AS BIGINT), 1)
             |    THEN c END)::BIGINT AS p99_key_rows,
             |  ((max(c) * 100 * max(k)) // sum(c))::BIGINT AS skew_x100
             |FROM r""".stripMargin),
      (s, dir) => graft.operators.SkewReport.keySkew(
        t(s, dir, "orders"), Seq(col("o_custkey")))),

    // ---- heavy keys (operators/SkewReport.heavyKeys): the top-10
    //      hottest keys with counts and basis-point shares — the list to
    //      salt, quota, or broadcast-filter. TakeOrderedAndProject over
    //      the |keys|-row histogram.
    GraftQuery("q253_heavy_keys",
      Some("""WITH n AS (SELECT count(*) AS total FROM events)
             |SELECT event_type, count(*)::BIGINT AS key_rows,
             |  ((count(*) * 10000) // (SELECT total FROM n))::BIGINT AS share_bp
             |FROM events GROUP BY 1
             |ORDER BY key_rows DESC, event_type LIMIT 10""".stripMargin),
      (s, dir) => graft.operators.SkewReport.heavyKeys(
        t(s, dir, "events"), Seq(col("event_type")), topN = 10)),

    // ---- join-cardinality pre-flight (operators/JoinStats): the EXACT
    //      output size of orders ⋈ lineitem from the two key histograms —
    //      two |keys|-row aggregates and a histogram join, never the
    //      data-×-data join. The numbers printed are the planner inputs:
    //      output rows, matching keys, hottest key's share.
    GraftQuery("q252_join_cardinality",
      Some("""WITH ha AS (SELECT o_orderkey AS k, count(*) AS na
             |  FROM orders GROUP BY 1),
             |hb AS (SELECT l_orderkey AS k, count(*) AS nb
             |  FROM lineitem GROUP BY 1),
             |p AS (SELECT na * nb AS p, na, nb FROM ha JOIN hb USING (k))
             |SELECT sum(p)::BIGINT AS join_rows,
             |  count(*)::BIGINT AS n_matching_keys,
             |  max(p)::BIGINT AS max_key_pairs,
             |  ((max(p) * 10000) // sum(p))::BIGINT AS top1_share_bp,
             |  sum(na)::BIGINT AS rows_a_matching,
             |  sum(nb)::BIGINT AS rows_b_matching
             |FROM p""".stripMargin),
      (s, dir) => graft.operators.JoinStats.exactJoinCardinality(
        t(s, dir, "orders").withColumnRenamed("o_orderkey", "k"),
        t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "k"),
        "k")),

    // ---- join-strategy advisor (operators/JoinAdvisor): the skew +
    //      cardinality reports composed into the broadcast/salt/shuffle
    //      decision with its justifying numbers. Hash-checked since
    //      round 6: the byte sizes are an EXACT typed per-row sum, so the
    //      oracle replays the WHOLE decision — byte math, skew_x100,
    //      exact join cardinality, decision table (decision-table
    //      branches additionally spec'd in OperatorsSpec).
    GraftQuery("q259_join_advice",
      Some("""WITH l AS (SELECT l_orderkey AS k,
             |   (CASE WHEN l_orderkey IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN l_partkey IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN l_suppkey IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN l_linenumber IS NULL THEN 1 ELSE 4 END
             |  + CASE WHEN l_quantity IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN l_discount IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN l_tax IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN l_returnflag IS NULL THEN 1 ELSE length(l_returnflag) + 4 END
             |  + CASE WHEN l_linestatus IS NULL THEN 1 ELSE length(l_linestatus) + 4 END
             |  + CASE WHEN l_shipdate IS NULL THEN 1 ELSE 8 END)::BIGINT AS b
             |  FROM lineitem),
             |r AS (SELECT o_orderkey AS k,
             |   (CASE WHEN o_orderkey IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN o_custkey IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN o_orderstatus IS NULL THEN 1 ELSE length(o_orderstatus) + 4 END
             |  + CASE WHEN o_totalprice IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN o_orderdate IS NULL THEN 1 ELSE 8 END
             |  + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE length(o_orderpriority) + 4 END)::BIGINT AS b
             |  FROM orders),
             |le AS (SELECT count(*) AS n, coalesce(sum(b), 0) AS tb FROM l),
             |re AS (SELECT count(*) AS n, coalesce(sum(b), 0) AS tb FROM r),
             |sk AS (SELECT
             |    (SELECT (max(c) * 100 * count(*)) // sum(c)
             |     FROM (SELECT count(*) AS c FROM l GROUP BY k)) AS sl,
             |    (SELECT (max(c) * 100 * count(*)) // sum(c)
             |     FROM (SELECT count(*) AS c FROM r GROUP BY k)) AS sr),
             |jr AS (SELECT coalesce(sum(na * nb), 0) AS join_rows
             |  FROM (SELECT k, count(*) AS na FROM l GROUP BY 1) a
             |  JOIN (SELECT k, count(*) AS nb FROM r GROUP BY 1) b USING (k)),
             |fin AS (SELECT le.n AS rows_left, re.n AS rows_right,
             |    le.tb AS bl, re.tb AS br,
             |    sk.sl AS sl, sk.sr AS sr, jr.join_rows AS join_rows
             |  FROM le, re, sk, jr)
             |SELECT
             |  CASE WHEN bl <= 67108864 AND bl <= br THEN 'broadcast_left'
             |       WHEN br <= 67108864 THEN 'broadcast_right'
             |       WHEN greatest(sl, sr) > 400 THEN 'salt'
             |       ELSE 'shuffle' END AS strategy,
             |  (CASE WHEN (bl <= 67108864 AND bl <= br) OR br <= 67108864 THEN 1
             |        WHEN greatest(sl, sr) > 400
             |        THEN least(64, greatest(sl, sr) // 100 + 1)
             |        ELSE 1 END)::BIGINT AS salt_factor,
             |  rows_left::BIGINT AS rows_left, rows_right::BIGINT AS rows_right,
             |  bl::BIGINT AS bytes_left_est, br::BIGINT AS bytes_right_est,
             |  join_rows::BIGINT AS join_rows,
             |  sl::BIGINT AS skew_left_x100, sr::BIGINT AS skew_right_x100
             |FROM fin""".stripMargin),
      (s, dir) => graft.operators.JoinAdvisor.adviseDf(
        t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "k"),
        t(s, dir, "orders").withColumnRenamed("o_orderkey", "k"),
        "k")),

    // ---- PIVOT: wide crosstab via RelationalGroupedDataset.pivot with
    //      EXPLICIT pivot values — at scale the values list must be declared
    //      (or Spark runs a distinct scan just to discover column names);
    //      single shuffle, same cost as the groupBy it sugar-coats
    GraftQuery("q260_pivot",
      Some("""SELECT o_orderpriority,
             |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
             |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
             |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
             |FROM orders GROUP BY o_orderpriority""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))),

    // ---- GROUPING SETS with grouping() flags: the super-aggregate row
    //      disambiguation (NULL-from-data vs NULL-from-rollup) every
    //      reporting consumer of grouping sets needs
    GraftQuery("q275_grouping_sets_id",
      Some("""SELECT c_mktsegment, c_nationkey,
             |  grouping(c_mktsegment)::BIGINT AS g_seg,
             |  grouping(c_nationkey)::BIGINT AS g_nat,
             |  count(*) AS n, round(sum(c_acctbal), 2) AS bal
             |FROM customer
             |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())""".stripMargin),
      (s, dir) => t(s, dir, "customer")
        .groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey")), Seq()),
          col("c_mktsegment"), col("c_nationkey"))
        .agg(
          grouping(col("c_mktsegment")).cast("long").as("g_seg"),
          grouping(col("c_nationkey")).cast("long").as("g_nat"),
          count(lit(1)).as("n"),
          round(sum("c_acctbal"), 2).as("bal"))),

    // ---- UNPIVOT (melt): wide→long without a join or shuffle — each input
    //      row expands map-side into one row per value column
    GraftQuery("q261_unpivot",
      Some("""SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val
             |FROM part
             |UNION ALL
             |SELECT p_partkey, 'p_size' AS attr, p_size::DOUBLE AS val
             |FROM part""".stripMargin),
      (s, dir) => t(s, dir, "part")
        .withColumn("p_size", col("p_size").cast("double"))
        .unpivot(Array(col("p_partkey")),
                 Array(col("p_retailprice"), col("p_size")),
                 "attr", "val"))
  )
}
