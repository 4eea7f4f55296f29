package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-fertility audit — the per-language "how many subword tokens
  * does this corpus cost" report a training pipeline runs before fixing a
  * data mix (fertility = subword tokens per word; a language the tokenizer
  * serves badly pays more sequence length for the same text).
  *
  * The vocabulary model is coverage + byte-fallback (GPT-2-style): the
  * corpus' top-K words by frequency (rank by count desc, then token asc —
  * a total order, so the K-boundary is deterministic) cost ONE token each;
  * out-of-vocabulary words fall back to one token per character. That
  * makes the audit exactly replayable in SQL while measuring the real
  * quantity of interest: vocabulary coverage per language.
  *
  * Scale posture: ONE tokenize+explode (localCheckpoint-pinned — it
  * feeds both the frequency table and the word-level join); the
  * vocabulary is top-K BOUNDED (TakeOrdered, never a full sort) and
  * broadcast to the word-level join; per-language aggregation is the
  * only other shuffle, plus one column-pruned doc-count scan. Shuffles
  * carry single words, never document text.
  */
object TokenizerAudit {

  def fertilityByLang(
      docs: DataFrame, textCol: String, langCol: String,
      vocabSize: Int): DataFrame = {
    // the explode feeds BOTH the vocabulary aggregation and the word-level
    // join — pin it so the corpus-scan tokenization runs once, not twice
    // (lazy localCheckpoint: materialized on first use, reused after)
    val words = docs
      .select(col(langCol).as("lang"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .localCheckpoint(false)
    val vocab = words.groupBy("w").agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("w").asc).limit(vocabSize)
      .select(col("w"), lit(1).as("__iv"))
    val byLang = words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("words"),
        sum(when(col("__iv").isNotNull, lit(1L))
          .otherwise(length(col("w")).cast("long"))).as("subword_tokens"),
        sum(length(col("w")).cast("long")).as("word_chars"))
    val docsPerLang = docs.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"))
    byLang.join(docsPerLang, "lang")
      .select(col("lang"), col("n_docs"), col("words"), col("subword_tokens"),
        expr("subword_tokens * 1000 div words").as("fertility_x1000"),
        expr("word_chars * 1000 div subword_tokens")
          .as("chars_per_token_x1000"))
  }
}
