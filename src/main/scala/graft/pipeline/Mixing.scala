package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-scaled corpus rebalancing — the multilingual α-sampling of
  * Conneau & Lample 2019 / XLM-R (and the UniMax family): a key's target
  * share is q_k ∝ p_k^α, flattening the raw distribution toward uniform
  * as α → 0 so head languages/sources stop drowning out the tail. Each
  * row is kept with rate min(1, budget·q_k / n_k) by a deterministic
  * content-hash draw, so the sample is reproducible across runs, engines
  * and repartitions (same property as [[TextAnalysis.sampleBucket]]).
  *
  * 100 TB posture: one groupBy over the (small) key domain fits the
  * rates; rates re-join the corpus broadcast; the draw is a map-side
  * filter. No driver-side state, no full-data shuffle.
  */
object Mixing {

  /** Rows of `df` surviving a temperature-α resample targeting `budget`
    * rows overall, keyed by `keyCol`, drawn deterministically by the md5
    * of `idCol`. */
  def temperatureSample(
      df: DataFrame, idCol: String, keyCol: String,
      alpha: Double, budget: Long,
      resolution: Int = 1000000): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).cast("double").as("__n"))
    val tot = counts.agg(sum("__n").as("__tot"))
    val weighted = counts.crossJoin(broadcast(tot))
      .withColumn("__w", pow(col("__n") / col("__tot"), alpha))
    val z = weighted.agg(sum("__w").as("__z"))
    val rates = weighted.crossJoin(broadcast(z))
      .select(col(keyCol),
        least(lit(1.0), (col("__w") / col("__z")) * budget / col("__n"))
          .as("__rate"))
    val u = (TextAnalysis.sampleBucket(col(idCol).cast("string"), resolution) +
      lit(0.5)) / lit(resolution.toDouble)
    df.join(broadcast(rates), keyCol).filter(u < col("__rate"))
      .drop("__rate")
  }

  /** Data-constrained epoch allocation (the "how many times may each
    * source repeat" planner, Muennighoff et al. 2023): split a total
    * token budget across sources by weight, cap every source at
    * `maxEpochsBp`/10000 epochs of its available tokens (past ~4 epochs
    * repeated data stops helping), and redistribute the capped surplus to
    * sources with headroom in ONE deterministic round (weight-
    * proportional, integer division — a fixed point would iterate, but
    * one round already reclaims the bulk and keeps the plan
    * engine-replayable bit-for-bit).
    *
    * Input: one row per key with its available token count (`tokensCol`)
    * and sampling weight (`weightCol` — any deterministic integer
    * expression). Output per key: n_tokens, weight, target_alloc (pre-cap
    * weight share), final_alloc (post-cap + one redistribution),
    * epochs_bp (final/available in basis points). All integers.
    *
    * Scale shape: operates on the per-source histogram (key-domain-sized,
    * thousands at most), with two broadcast totals — the corpus itself is
    * aggregated once upstream by the caller. Driver state is O(1).
    */
  def epochAllocation(
      perKey: DataFrame, keyCol: String, tokensCol: String,
      weightCol: org.apache.spark.sql.Column,
      budget: Long, maxEpochsBp: Int = 20000): DataFrame = {
    val base = perKey.select(
      col(keyCol), col(tokensCol).cast("long").as("n_tokens"),
      weightCol.cast("long").as("weight"))
    val tot = base.agg(sum("weight").as("__w")) // one tiny driver-free total
    val alloc = base.crossJoin(broadcast(tot))
      .withColumn("target_alloc",
        (col("weight").cast("decimal(38,0)") * budget / col("__w"))
          .cast("long"))
      .withColumn("__cap",
        (col("n_tokens").cast("decimal(38,0)") * maxEpochsBp / 10000)
          .cast("long"))
      .withColumn("__first", least(col("target_alloc"), col("__cap")))
    // one redistribution round: surplus flows to keys with headroom,
    // weight-proportionally, re-capped
    val tot2 = alloc.agg(
      sum(col("target_alloc") - col("__first")).as("__surplus"),
      sum(when(col("__first") < col("__cap"), col("weight"))
        .otherwise(0L)).as("__w2"))
    alloc.crossJoin(broadcast(tot2))
      .withColumn("final_alloc", least(col("__cap"),
        col("__first") + when(col("__first") < col("__cap") && col("__w2") > 0,
          (col("weight").cast("decimal(38,0)") * col("__surplus") / col("__w2"))
            .cast("long")).otherwise(0L)))
      .select(col(keyCol), col("n_tokens"), col("weight"),
        col("target_alloc"), col("final_alloc"),
        (col("final_alloc").cast("decimal(38,0)") * 10000 / col("n_tokens"))
          .cast("long").as("epochs_bp"))
  }
}
