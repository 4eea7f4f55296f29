package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the perplexity-style
  * quality filter of CCNet-family pipelines (score each document by how
  * well a model trained on the corpus predicts it; junk and boilerplate
  * land in the tails).
  *
  * Model: bigram with add-α smoothing. P(b|a) = (C(a,b) + α) /
  * (C(a·) + α·V), where C(a·) is a's count as a bigram prefix and V the
  * corpus unigram vocabulary. A document's score is its mean bigram log
  * probability; docs under 2 tokens have no bigrams and produce no row.
  *
  * 100 TB posture: everything is keyed shuffles — one groupBy over
  * bigrams to train, one derived prefix aggregation (no second corpus
  * pass), one join of doc-bigrams against the model, one groupBy per doc
  * for the mean. No driver-side model: counts stay distributed and join
  * by key, so vocabulary size is unbounded.
  */
object LanguageModel {

  /** (id, [keys…,] lm_logprob): mean smoothed bigram log-probability per
    * document, from a model trained on the same frame. With `keyCols`
    * set, one independent model per key combination (CCNet trains per
    * language) — the keys simply ride along in every aggregation and
    * join, so the shuffle count is unchanged. */
  def bigramLogProb(
      df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0, keyCols: Seq[String] = Nil): DataFrame = {
    val keys = keyCols.map(col)
    val docs = df.select(
      (col(idCol) +: keys) :+
        TextAnalysis.tokens(lower(col(textCol))).as("__toks"): _*)

    // per-model vocabulary: distinct unigrams (a 1-row frame when unkeyed)
    val vDf = docs.select(keys :+ explode(col("__toks")).as("__t"): _*)
      .groupBy(keys: _*).agg(count_distinct(col("__t")).cast("double").as("__v"))

    // per-doc bigram stream: zip the token list with its own tail
    val bigrams = docs.select(
      (col(idCol) +: keys) :+
        explode(zip_with(
          slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0))),
          slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("bg"): _*)

    // train: bigram counts; prefix counts derive from them (C(a·))
    val bgCounts = bigrams.groupBy(keys :+ col("bg"): _*)
      .agg(count(lit(1)).as("__cab"))
    val preCounts = bgCounts.groupBy(keyCols.map(k => col(k).as(s"__k_$k")) :+
        col("bg.a").as("__pa"): _*)
      .agg(sum("__cab").as("__ca"))

    // score: join each doc bigram with its model counts, average the logs
    val joined = bigrams
      .join(bgCounts, keyCols :+ "bg")
      .join(preCounts,
        keyCols.map(k => col(k) === col(s"__k_$k"))
          .foldLeft(bigrams("bg.a") === preCounts("__pa"))(_ && _))
    val withV =
      if (keyCols.isEmpty) joined.crossJoin(broadcast(vDf))
      else joined.join(broadcast(vDf), keyCols)
    withV
      .groupBy(col(idCol) +: keys: _*)
      .agg(avg(log((col("__cab") + alpha) / (col("__ca") + col("__v") * alpha)))
        .as("lm_logprob"))
  }

  /** CCNet-style quality split (Wenzek et al. 2020 §4.4): score every doc
    * under its language's own bigram model, then cut each language's
    * score distribution into head / middle / tail thirds.
    *
    * The split uses per-language ⅓/⅔ quantile CUTOFFS (one tiny aggregate,
    * broadcast back) followed by a map-only bucket assignment — NOT an
    * ntile window, which would total-sort each language inside one task.
    * Scores are rounded to 4 decimals before the cutoffs so the same
    * split is reproducible across engines (and in SQL): an interpolated
    * cutoff either equals a data point exactly (interpolation fraction 0)
    * or sits strictly between two rounded values, so boundary membership
    * never depends on float summation order. */
  def perplexityBuckets(
      df: DataFrame, idCol: String, textCol: String, langCol: String,
      alpha: Double = 1.0): DataFrame = {
    val scored = bigramLogProb(df, idCol, textCol, alpha, Seq(langCol))
      .withColumn("__s", round(col("lm_logprob"), 4))
    val cuts = scored.groupBy(langCol).agg(
      percentile(col("__s"), lit(1.0 / 3)).as("__c13"),
      percentile(col("__s"), lit(2.0 / 3)).as("__c23"))
    scored.join(broadcast(cuts), langCol)
      .select(col(idCol), col(langCol), col("__s").as("lm_logprob"),
        when(col("__s") >= col("__c23"), "head")
          .when(col("__s") >= col("__c13"), "middle")
          .otherwise("tail").as("ccnet_bucket"))
  }
}
