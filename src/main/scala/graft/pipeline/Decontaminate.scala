package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag documents that
  * share any word-level n-gram with an evaluation/benchmark set (the
  * GPT-3 appendix-C / Pile methodology — 13-grams for GPT-3, 8-grams as
  * the common modern floor).
  *
  * Scale shape: the benchmark side is small (eval suites are at most
  * ~10^6 documents / ~10^8 n-grams) — its DISTINCT n-gram hashes are
  * broadcast, so the 100 TB corpus side is never shuffled at all: n-gram
  * generation, hashing, and the semi-join probe are all map-side over the
  * corpus scan, and the only aggregation keys on doc id within the
  * already-partitioned corpus. Nothing in the plan scales with corpus
  * size except the map work itself.
  */
object Decontaminate {

  /** Lowercased whitespace tokens — decontamination is case-insensitive
    * (benchmark text and training text rarely agree on casing). */
  private def lowerTokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Hashes of the k-token shingles of `text` (distinct; docs shorter than
    * k tokens contribute their whole text as one shingle so short
    * benchmark prompts still match verbatim copies). */
  private def gramHashes(text: Column, n: Int): Column = {
    val toks = lowerTokens(text)
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
    array_distinct(transform(grams, g => xxhash64(g)))
  }

  /** Contaminated documents: every doc from `docs` sharing at least one
    * n-gram with `bench`, with the count of distinct matching n-grams.
    * Output: (idCol, n_hits) — one row per contaminated document.
    */
  def contaminated(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(gramHashes(col(benchTextCol), n)).as("__g"))
      .distinct()
    docs
      .select(col(idCol), explode(gramHashes(col(textCol), n)).as("__g"))
      // broadcast semi-join: the corpus side stays where the scan put it
      .join(broadcast(benchGrams), Seq("__g"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The complement view a pipeline actually materializes: `docs` with
    * contaminated rows removed (same broadcast anti-join shape). */
  def clean(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(gramHashes(col(benchTextCol), n)).as("__g"))
      .distinct()
    val hit = docs
      .select(col(idCol), explode(gramHashes(col(textCol), n)).as("__g"))
      .join(broadcast(benchGrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
    // no broadcast hint on `hit`: it derives from the corpus side and is
    // only small in practice, not by construction — let AQE decide
    docs.join(hit, Seq(idCol), "left_anti")
  }
}
