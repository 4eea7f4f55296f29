package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher quality-rule battery (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", App. A1.1)
  * — the standard heuristic document filter of pretraining pipelines:
  *
  *   - 50 ≤ word count ≤ 100,000
  *   - 3 ≤ mean word length ≤ 10
  *   - symbol-to-word ratio (`#` / `...`) ≤ 0.1
  *   - ≤ 90% of lines start with a bullet, ≤ 30% end with an ellipsis
  *   - ≥ 80% of words contain an alphabetic character
  *   - ≥ 2 distinct hits from the 8-word stop list
  *
  * Every signal is a codegen'd column expression over one row — a pure
  * map, no shuffle, so the filter runs at scan speed on any corpus size
  * and composes with predicate pushdown when used as a WHERE clause.
  */
object QualityRules {

  private val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document Gopher signals + the composite pass flag. */
  def gopherStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = TextAnalysis.tokens(text)
    val n = size(toks).cast("double")
    val meanLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
      .cast("double") / n
    // Gopher counts '#' and '...' occurrences as symbols
    val symbols = (length(text) - length(replace(text, lit("#"), lit("")))) +
      (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val bulletFrac = size(filter(lines, l =>
      trim(l).startsWith("•") || trim(l).startsWith("-") ||
        trim(l).startsWith("*"))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines, l =>
      trim(l).endsWith("...") || trim(l).endsWith("…"))).cast("double") / nLines
    val alphaFrac = size(filter(toks, t => t.rlike("\\p{L}"))).cast("double") / n
    val stopArr = array(gopherStops.map(lit): _*)
    val lowToks = TextAnalysis.tokens(lower(text))
    val stopHits = size(filter(stopArr, w => array_contains(lowToks, w)))

    df.select(
      col(idCol),
      n.cast("long").as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symbols.cast("double") / n, 4).as("symbol_ratio"),
      round(bulletFrac, 4).as("bullet_line_frac"),
      round(ellipsisFrac, 4).as("ellipsis_line_frac"),
      round(alphaFrac, 4).as("alpha_word_frac"),
      stopHits.cast("long").as("n_stop_hits"),
      (n.between(50, 100000) && meanLen.between(3, 10) &&
        (symbols.cast("double") / n <= 0.1) &&
        (bulletFrac <= 0.9) && (ellipsisFrac <= 0.3) &&
        (alphaFrac >= 0.8) && (stopHits >= 2)).as("pass"))
  }
}
