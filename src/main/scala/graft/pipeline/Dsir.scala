package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling — the DSIR method of Xie et
  * al. 2023 ("Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): pick raw-corpus documents that look like a
  * target corpus by (1) fitting bag-of-ngram unigram models on target and
  * raw, (2) scoring every raw document with its log importance weight
  * log p_target(x) − log p_raw(x), and (3) drawing k documents without
  * replacement via Gumbel top-k on those weights.
  *
  * Features are the paper's unigram + bigram stream. Two keying modes:
  *   - exact n-gram strings (SQL-expressible → the oracle path);
  *   - hashed buckets (`buckets = Some(B)`, the paper's 10k-bucket trick)
  *     — the scale path: the fitted model is at most B rows regardless of
  *     vocabulary, so the score join always broadcasts.
  *
  * 100 TB posture: one explode+groupBy over grams fits both models in a
  * single corpus pass (map-side combined, keyed by gram/bucket); scoring
  * joins the exploded grams against that model (broadcast when hashed)
  * and re-aggregates by document — a doc's grams stay co-located with
  * their source row, so map-side partial aggregation collapses the
  * per-doc sum before the shuffle, making the final exchange O(docs),
  * not O(tokens). Resampling is a deterministic content-hash Gumbel key
  * plus TakeOrderedAndProject — no driver-side sampling state.
  */
object Dsir {

  /** Unigram + bigram stream of a (lower-cased, whitespace-tokenized)
    * document — the DSIR featurizer. */
  private def grams(text: Column): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val tail = greatest(size(toks) - 1, lit(0))
    concat(
      toks,
      zip_with(slice(toks, lit(1), tail), slice(toks, lit(2), tail),
        (a, b) => concat_ws(" ", a, b)))
  }

  /** (idCol, dsir_logw): per-document log importance weight
    * log p̂_target(doc) − log p̂_raw(doc) under add-`alpha` smoothed
    * bag-of-ngram models fitted on `isTarget` rows vs all rows of `df`.
    * Both models share the raw-corpus vocabulary, so every document gram
    * is in-vocabulary by construction. */
  def importanceWeights(
      df: DataFrame, idCol: String, textCol: String, isTarget: Column,
      alpha: Double = 1.0, buckets: Option[Int] = None): DataFrame = {
    val keyed = df.select(
      col(idCol), isTarget.as("__tgt"),
      explode(grams(col(textCol))).as("__g"))
    val docGrams = buckets match {
      case Some(b) => keyed.withColumn("__g", pmod(xxhash64(col("__g")), lit(b.toLong)))
      case None    => keyed
    }
    // one corpus pass fits both models: raw count + target count per gram
    val model = docGrams.groupBy("__g").agg(
      count(lit(1)).cast("double").as("__cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).cast("double").as("__ct"))
    // corpus totals + vocabulary size: a 1-row aggregate, broadcast
    val totals = model.agg(
      sum("__cr").as("__nr"), sum("__ct").as("__nt"),
      count(lit(1)).cast("double").as("__v"))
    docGrams
      .join(model, "__g")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(sum(
        log((col("__ct") + alpha) / (col("__nt") + col("__v") * alpha)) -
        log((col("__cr") + alpha) / (col("__nr") + col("__v") * alpha)))
        .as("dsir_logw"))
  }

  /** Gumbel top-k resampling over importance weights: keeps the k rows
    * maximizing dsir_logw + Gumbel(0,1) noise — a draw WITHOUT replacement
    * from the softmax of the weights (Vieira 2014's Gumbel-max trick, as
    * used by DSIR). The noise is seeded by content hash
    * ([[TextAnalysis.sampleBucket]] md5 buckets), so the sample is
    * reproducible across runs, engines and repartitions. */
  def resample(
      weights: DataFrame, idCol: String, k: Int,
      resolution: Int = 1000000): DataFrame = {
    val u = (TextAnalysis.sampleBucket(col(idCol).cast("string"), resolution) +
      lit(0.5)) / lit(resolution.toDouble)
    weights
      .withColumn("gumbel_key", col("dsir_logw") - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}
