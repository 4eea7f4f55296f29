package graft.pipeline

import org.apache.spark.sql.DataFrame
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

  /** (id, lm_logprob): mean smoothed bigram log-probability per document,
    * from a model trained on the same frame. */
  def bigramLogProb(
      df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame = {
    val docs = df.select(
      col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))

    // corpus vocabulary (scalar): distinct unigrams across all positions
    val v = docs.select(explode(col("__toks")).as("t"))
      .agg(count_distinct(col("t"))).head().getLong(0).toDouble

    // per-doc bigram stream: zip the token list with its own tail
    val bigrams = docs.select(
      col(idCol),
      explode(zip_with(
        slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0))),
        slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))).as("bg"))

    // train: bigram counts; prefix counts derive from them (C(a·))
    val bgCounts = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("__cab"))
    val preCounts = bgCounts.groupBy(col("bg.a").as("__pa"))
      .agg(sum("__cab").as("__ca"))

    // score: join each doc bigram with its model counts, average the logs
    bigrams
      .join(bgCounts, "bg")
      .join(preCounts, bigrams("bg.a") === preCounts("__pa"))
      .groupBy(col(idCol))
      .agg(avg(log((col("__cab") + alpha) / (col("__ca") + alpha * v)))
        .as("lm_logprob"))
  }
}
