package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Dataset drift detection between two corpus snapshots — the governance
  * step a continuously-refreshed training corpus needs before a release:
  * did a source's schema, null behavior, cardinality, or value
  * distribution move since the last snapshot?
  *
  * Two layers:
  *  - [[profile]]: one aggregation pass producing a per-column statistical
  *    fingerprint (counts, nulls, distincts, numeric range) — a few rows
  *    per column regardless of corpus size;
  *  - [[psi]]: Population Stability Index for a numeric column — the
  *    standard drift score (banking scorecard lineage), computed over
  *    equi-width bins of the BASELINE's range so both snapshots bin
  *    identically.
  *
  * 100 TB posture: profiles are single-pass partial aggregations (one
  * shuffle of ~|columns| rows); PSI is two filtered scans + a broadcast
  * of the 1-row range frame; nothing driver-side beyond the per-column
  * result rows. Distinct counts are exact here for oracle parity — at
  * real scale flip `approxDistinct = true` (HLL++, same plan shape).
  */
object Drift {

  /** Per-column fingerprint of one snapshot: (column, n_rows, n_null,
    * n_distinct, min/max for numerics as 1e-4-scaled integers, total
    * string length for strings). Integer-only output. */
  def profile(
      df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      val dt = df.schema(c).dataType
      val distinct: Column =
        if (approxDistinct) approx_count_distinct(col(c))
        else count_distinct(col(c))
      val (mn, mx, strLen): (Column, Column, Column) = dt match {
        case _: NumericType => (
          floor(min(col(c)).cast("double") * 10000).cast("long"),
          floor(max(col(c)).cast("double") * 10000).cast("long"),
          lit(null).cast("long"))
        case StringType => (
          lit(null).cast("long"), lit(null).cast("long"),
          sum(length(col(c))).cast("long"))
        case _ => (lit(null).cast("long"), lit(null).cast("long"),
          lit(null).cast("long"))
      }
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        distinct.as("n_distinct"),
        mn.as("min_1e4"), mx.as("max_1e4"), strLen.as("str_len"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_1e4"), col("max_1e4"), col("str_len"))
    }.reduce(_ unionAll _)
  }

  /** Snapshot-vs-snapshot fingerprint comparison: per column, both
    * profiles side by side plus integer deltas — the release-gate diff a
    * reviewer reads. Broadcast join on the tiny per-column frames. */
  def drift(
      baseline: DataFrame, current: DataFrame, cols: Seq[String]): DataFrame = {
    val b = profile(baseline, cols)
    val c = profile(current, cols)
    b.as("b").join(c.as("c"), "column")
      .select(col("column"),
        col("b.n_rows").as("base_rows"), col("c.n_rows").as("cur_rows"),
        col("b.n_null").as("base_null"), col("c.n_null").as("cur_null"),
        col("b.n_distinct").as("base_distinct"),
        col("c.n_distinct").as("cur_distinct"),
        (col("c.n_rows") - col("b.n_rows")).as("d_rows"),
        (col("c.n_distinct") - col("b.n_distinct")).as("d_distinct"))
  }

  /** Population Stability Index of `valueCol` between baseline and
    * current: equi-width bins over the BASELINE min/max (out-of-range
    * current values clamp into the edge bins — new mass outside the old
    * range must count as drift, not vanish),
    * PSI = Σ (p_c − p_b)·ln(p_c / p_b) with the conventional 1e-6 floor
    * on empty-bin proportions. Presented as a 1e-6-scaled integer via
    * floor — deterministic given the integer bin counts.
    * Rule of thumb: <0.1 stable, 0.1–0.25 moderate, >0.25 drifted. */
  def psi(
      baseline: DataFrame, current: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    val spark = baseline.sparkSession
    import spark.implicits._
    val r = baseline.agg(
        min(col(valueCol).cast("double")).as("lo"),
        max(col(valueCol).cast("double")).as("hi"))
      .head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val width = if (hi > lo) (hi - lo) / nBins else 1.0
    def bins(df: DataFrame): Array[Long] = {
      val m = df
        .select(least(greatest(
          floor((col(valueCol).cast("double") - lo) / width).cast("long"),
          lit(0L)), lit(nBins - 1L)).as("__b"))
        .groupBy("__b").count()
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      (0 until nBins).map(i => m.getOrElse(i.toLong, 0L)).toArray
    }
    val bb = bins(baseline); val cb = bins(current)
    val bn = bb.sum.toDouble.max(1.0); val cn = cb.sum.toDouble.max(1.0)
    val terms = (0 until nBins).map { i =>
      val pb = math.max(bb(i) / bn, 1e-6)
      val pc = math.max(cb(i) / cn, 1e-6)
      (i, bb(i), cb(i),
        math.floor((pc - pb) * math.log(pc / pb) * 1000000).toLong)
    }
    // the total is the sum of the FLOORED per-bin terms: an integer sum is
    // run-order independent where a float Σ then floor would not be
    val total = terms.map(_._4).sum
    terms.map { case (i, nb, nc, t) => (i, nb, nc, t, total) }
      .toDF("bin", "base_n", "cur_n", "term_1e6", "psi_1e6")
  }

  /** LEXICAL drift per source: total-variation distance between each
    * source's unigram distribution and the whole corpus's —
    * TV(s) = ½ Σ_w |p_s(w) − p(w)| — the "is this source linguistically
    * like the rest of the mix?" audit (TV, unlike KL, needs no smoothing
    * for zero counts and no libm log, so it stays EXACT integer
    * arithmetic until one final basis-point floor).
    *
    * The zero-count trick that keeps it sparse: tokens ABSENT from source
    * s contribute Σ_{w∉s} c_w·n_s = N·n_s − Σ_{w∈s} c_w·n_s, so only
    * (source, token) pairs that EXIST are ever materialized — no
    * densified |sources|×|vocab| frame. Numerators are scaled by n_s·N
    * (exact longs → decimal accumulation, the binaryAuc overflow
    * precedent); `tv_bp` = floor(TV·10⁴).
    *
    * Plan: one explode → (source, w) hash-agg; c_w and n_s derive from it
    * (no second corpus scan); the w-keyed join shuffles counter rows
    * only; per-source totals are an O(sources) aggregate.
    *
    * Presentation bound: `tv_num` (the exact scaled numerator, ≤ 2·n_s·N)
    * is emitted as BIGINT for oracle parity — it outgrows 2^63 somewhere
    * past ~10^9 tokens per source × 10^9 corpus tokens. The accumulation
    * itself is decimal(38,0) (safe to ~10^38); at that scale drop the
    * numerator column and keep `tv_bp`, whose double rounding both
    * engines share. */
  def sourceTvDistance(
      docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(sourceCol).as("source"),
      explode(TextAnalysis.tokens(col(textCol))).as("w"))
    val csw = tok.groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
    val cw = csw.groupBy("w").agg(sum("c_sw").as("c_w"))
    val ns = csw.groupBy("source").agg(sum("c_sw").as("n_s"))
    val nt = cw.agg(sum("c_w").as("n_total"))
    val dec = "decimal(38,0)"
    val present = csw.join(cw, "w")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(nt))
      .groupBy("source")
      .agg(
        sum(abs(col("c_sw").cast(dec) * col("n_total")
          - col("c_w").cast(dec) * col("n_s"))).as("d_present"),
        sum(col("c_w").cast(dec) * col("n_s")).as("mass_present"),
        max("n_s").as("n_s"), max("n_total").as("n_total"))
    present
      .withColumn("tv_num",
        col("d_present")
          + (col("n_total").cast(dec) * col("n_s") - col("mass_present")))
      .select(col("source"), col("n_s").cast("long").as("n_tokens"),
        col("tv_num").cast("long").as("tv_num"),
        floor(col("tv_num").cast("double") * 10000.0
          / (lit(2.0) * col("n_s") * col("n_total"))).cast("long").as("tv_bp"))
  }
}
