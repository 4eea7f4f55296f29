package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probability-proportional-to-size (PPS) systematic sampling — the exact,
  * reproducible "draw k documents weighted by size/score" primitive of
  * corpus mixing (the deterministic sibling of the Gumbel draw in
  * [[Dsir]]): lay the corpus on a weight line in ascending-id order and
  * take the k midpoint strata boundaries; a document is selected once per
  * boundary its weight interval covers (a document heavier than one
  * stride legitimately draws multiple hits — with-multiplicity PPS).
  *
  * Everything is integer arithmetic: a document with inclusive cumulative
  * weight `cum` (interval `(cum-w, cum]`) is hit by boundary j iff
  * `2k·(cum-w) < (2j-1)·W <= 2k·cum`, so
  * `hits = g(cum) - g(cum-w)` with `g(x) = min(k, (2k·x + W) div 2W)` —
  * no float ever enters, any engine replays the draw bit-exactly
  * (`2k·W` must fit a long: ample headroom for char weights up to ~1e14).
  *
  * The global cumulative weight is the same distributed two-phase prefix
  * scan as [[Packing.pack]]: range-repartition on id, O(partitions) driver
  * offsets, parallel per-partition windows — no single-reducer cumsum.
  */
object Sampling {

  /** Selected rows only: (idCol, w, n_hits), n_hits >= 1, Σ n_hits = k. */
  def systematicPps(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counted = df
      .select(col(idCol), col(weightCol).cast("long").as("w"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = counted.groupBy("__pid").agg(sum("w").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.map(_._1)
      .zip(totals.scanLeft(0L) { case (acc, (_, t)) => acc + t })
      .toSeq.toDF("__pid", "__base")
    val bigW = totals.map(_._2).sum
    require(bigW > 0, s"systematicPps: total $weightCol must be positive")
    // the boundary arithmetic below computes 2k·cum + W in Long; past the
    // headroom the non-ANSI multiply would wrap SILENTLY and draw wrong
    // rows — fail loudly at the documented limit instead
    require(bigW <= (Long.MaxValue - bigW) / (2L * k),
      s"systematicPps: 2*$k*$bigW overflows Long — reduce k or rescale weights")
    val win = Window.partitionBy("__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kk = 2L * k // boundary j sits at (2j-1)·W / 2k on the weight line
    val ww = 2L * bigW
    counted
      .join(broadcast(bases), "__pid")
      .withColumn("cum", col("__base") + sum("w").over(win))
      .withColumn("__s1", lit(kk) * col("cum") + lit(bigW))
      .withColumn("__s0", lit(kk) * (col("cum") - col("w")) + lit(bigW))
      .withColumn("__g1", least(lit(k.toLong), expr(s"__s1 div $ww")))
      .withColumn("__g0", least(lit(k.toLong), expr(s"__s0 div $ww")))
      .withColumn("n_hits", col("__g1") - col("__g0"))
      .filter(col("n_hits") > 0)
      .select(col(idCol), col("w"), col("n_hits"))
  }
}
