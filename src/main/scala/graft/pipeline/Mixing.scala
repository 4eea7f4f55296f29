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
}
