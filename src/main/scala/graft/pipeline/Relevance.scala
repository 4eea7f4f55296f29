package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-relevance scoring for corpus curation: score every document
  * against a term query and keep the most relevant slice (the "select
  * training data matching a target distribution" step). BM25 with the
  * Robertson/Spärck-Jones idf — the published Okapi formula.
  *
  * 100 TB posture: one distributed aggregation computes the corpus stats
  * (N, avgdl) and every query term's document frequency together; only
  * |query|+2 scalars reach the driver, which folds them into a pure
  * columnar scoring expression — the scoring pass is map-only, no shuffle,
  * and a top-k consumer gets TakeOrderedAndProject.
  */
object Relevance {

  /** (id, score) for every document. `query` terms are matched against
    * whitespace tokens of the lowercased text. */
  def bm25(
      df: DataFrame, idCol: String, textCol: String, query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val docs = df.select(
        col(idCol),
        TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))

    // single pass: corpus size, average doc length, per-term doc frequency
    val statCols =
      count(lit(1)).cast("double").as("__n") +:
      avg("__dl").as("__avgdl") +:
      query.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("__toks"), t), 1).otherwise(0))
          .cast("double").as(s"__df$i")
      }
    val stats = docs.agg(statCols.head, statCols.tail: _*).head()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)

    val score = query.zipWithIndex.map { case (t, i) =>
      val dft = stats.getDouble(2 + i)
      val idf = math.log((n - dft + 0.5) / (dft + 0.5) + 1.0)
      val tf = size(filter(col("__toks"), x => x === lit(t))).cast("double")
      lit(idf) * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / lit(avgdl)))
    }.reduce(_ + _)

    docs.select(col(idCol), score.as("score"))
  }
}
