package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus release diff — the governance answer to "what changed between
  * snapshot A and snapshot B of the training set?" at CONTENT grain:
  * documents are identified by md5(text), not id, so a re-crawled page
  * with identical text is "kept" even if its row id moved, and an edited
  * page counts as one removal plus one addition (the definition a data
  * card needs — id-based diffs undercount churn whenever ingestion
  * re-keys).
  *
  * Per group (source): distinct content hashes added / removed / kept,
  * with churn in basis points of the OLD release
  * (floor((added+removed)·10⁴ / old)).
  *
  * Scale shape: each side reduces to its DISTINCT (group, hash) set —
  * one hash-agg per side over 2-column rows (text never survives the
  * first projection) — then ONE full-outer hash join on (group, hash)
  * and an O(groups) rollup. No windows, no collects.
  */
object ReleaseDiff {

  def contentDiff(
      oldDocs: DataFrame, newDocs: DataFrame,
      groupCol: String, textCol: String): DataFrame = {
    def side(df: DataFrame, flag: String) =
      df.select(col(groupCol).as("grp"), md5(col(textCol)).as("__h"))
        .distinct()
        .withColumn(flag, lit(1))
    side(oldDocs, "__in_old")
      .join(side(newDocs, "__in_new"), Seq("grp", "__h"), "full_outer")
      .groupBy(col("grp").as(groupCol))
      .agg(
        sum(when(col("__in_new").isNotNull && col("__in_old").isNull, 1L)
          .otherwise(0L)).as("n_added"),
        sum(when(col("__in_old").isNotNull && col("__in_new").isNull, 1L)
          .otherwise(0L)).as("n_removed"),
        sum(when(col("__in_old").isNotNull && col("__in_new").isNotNull, 1L)
          .otherwise(0L)).as("n_kept"))
      .withColumn("n_old", col("n_removed") + col("n_kept"))
      // a group born in the NEW release has no old mass to churn against
      // (NULL, not a division by zero — ANSI floor(∞)::long throws)
      .withColumn("churn_bp",
        when(col("n_old") === 0, lit(null))
          .otherwise(floor((col("n_added") + col("n_removed")) * 10000.0
            / col("n_old")).cast("long")))
  }
}
