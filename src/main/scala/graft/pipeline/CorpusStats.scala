package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level lexical statistics for training-data curation: vocabulary
  * coverage (OOV rate against a frequency-derived vocab), per-document
  * TF-IDF salient terms, and PMI collocations (the word2phrase signal).
  *
  * Scale notes (100 TB posture):
  *  - every aggregate is a hash-agg with map-side combine keyed on a token
  *    or (doc, token) — no collects, no windows over the whole corpus;
  *  - the derived vocab is LIMIT-bounded and joined back with an explicit
  *    `broadcast()` — the corpus-sized side never re-shuffles;
  *  - rankings are over IEEE-exact integer-count quotients with total
  *    tie-breaks, so results are deterministic across engines and runs
  *    (two distinct rationals p/q with p,q < 2^26 are farther apart than
  *    a double ULP, so the quotient doubles order exactly like the
  *    rationals — see the q229/q230 oracles).
  */
object CorpusStats {

  private def toks(text: Column): Column = TextAnalysis.tokens(text)

  /** The top-`vocabSize` tokens by corpus frequency (ties broken by token
    * asc — deterministic). One narrow aggregate over the exploded corpus. */
  def topVocab(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame =
    docs.select(explode(toks(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .limit(vocabSize)

  /** Per-document out-of-vocabulary profile against the corpus top-K vocab:
    * token count, OOV token count, and the OOV rate in basis points
    * (floor-scaled integer — the cross-engine-stable presentation).
    *
    * The vocab side is tiny by construction (LIMIT K) and broadcast; the
    * exploded corpus joins against it map-side, then re-aggregates per doc.
    */
  def vocabCoverage(
      docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val tok = docs.select(col(idCol), explode(toks(col(textCol))).as("w"))
    val vocab = broadcast(topVocab(docs, textCol, vocabSize)
      .select(col("w"), lit(1).as("__in_vocab")))
    tok.join(vocab, Seq("w"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bp",
        floor(col("n_oov") * 10000.0 / col("n_tokens")).cast("long"))
  }

  /** Top-`k` salient terms per document by TF-IDF, with idf taken as the
    * monotone 1/df surrogate so the ranking key is the exact rational
    * tf/df (ln() would introduce libm-dependent ulps; the ORDER is
    * identical because ln is monotone and df>0). Ties break by term asc.
    * Score presented as floor(tf*1e6/df) — both engines compute the same
    * IEEE quotient, so the floor is bit-stable.
    *
    * Plan shape: explode → (doc,term) hash-agg → term hash-agg for df →
    * broadcast df back (term universe is vocab-bounded) → per-doc window
    * top-k (WindowGroupLimit pushes the limit map-side).
    */
  def tfidfTopTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = docs.select(col(idCol), explode(toks(col(textCol))).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("tf"))
    // one row per (doc, term) already, so df = row count per term
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "w")
      .withColumn("score", col("tf").cast("double") / col("df"))
    val win = Window.partitionBy(idCol)
      .orderBy(desc("score"), asc("w"))
    scored.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
      .select(col(idCol), col("rn").cast("long").as("rank"), col("w").as("term"),
        col("tf"), col("df"),
        floor(col("tf") * 1000000.0 / col("df")).cast("long").as("score_ppm"))
  }

  /** Feature-hashing vectorizer (the hashing trick): tokens map to a
    * fixed `dim`-bucket space via the engine-portable md5 hash (the
    * [[SubstringDedup]] scheme — DuckDB replays it exactly), emitting the
    * sparse (id, bucket, cnt) representation. No vocabulary pass, no
    * driver state — the property that makes the hashing trick the
    * featurizer of choice at corpus scale. Map-only explode + one
    * (id, bucket) hash-agg. */
  def featureHash(
      docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    docs.select(col(idCol), explode(toks(col(textCol))).as("w"))
      .select(col(idCol),
        (conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long") % dim)
          .as("bucket"))
      .groupBy(idCol, "bucket").agg(count(lit(1)).as("cnt"))

  /** Heaps-law vocabulary growth curve: walk the corpus in `idCol` order,
    * cut it into `nBuckets` equal-count prefixes, and report cumulative
    * docs / tokens / DISTINCT-vocabulary size at each cut, plus the
    * type-token ratio in basis points. The saturation shape answers the
    * curation question "does more of this source still buy new language,
    * or only repetition?" — flat vocab growth at the tail is the
    * crawl-another-snapshot stop signal.
    *
    * Scale shape: ONE two-phase global rank ([[Sharding.ranked]] — never a
    * single-partition window) assigns prefix buckets; the distinct-vocab
    * count per prefix comes from each token's FIRST-occurrence bucket
    * (token-keyed hash-agg min), so no prefix ever re-counts the corpus;
    * the cumulation runs on the O(nBuckets) rollup via a broadcast
    * triangular self-join (lint-free — no unpartitioned window).
    * The total row count rides in as a broadcast 1-row frame, not an
    * eager driver count. */
  def vocabGrowth(
      docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame = {
    val ranked = Sharding
      .ranked(docs.select(col(idCol), col(textCol)), Seq(col(idCol)))
    // total row count from the CHECKPOINTED ranked frame (max(seq)+1) —
    // an agg over the raw input would re-scan the whole upstream plan
    val n = ranked.agg((max("seq") + 1L).as("__n"))
    val bucketed = ranked
      .crossJoin(broadcast(n))
      .withColumn("bucket", expr(s"(seq * $nBuckets) div __n") + 1L)
    val docAgg = bucketed
      .withColumn("__ntok", size(toks(col(textCol))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("__ntok").as("n_tokens"))
    val newTypes = bucketed
      .select(col("bucket"), explode(toks(col(textCol))).as("w"))
      .groupBy("w").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    val b = docAgg.join(newTypes, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_types"))
    val prev = b.select(col("bucket").as("__b2"), col("n_docs").as("__d2"),
      col("n_tokens").as("__t2"), col("new_types").as("__v2"))
    b.join(broadcast(prev), col("__b2") <= col("bucket"))
      .groupBy("bucket")
      .agg(sum("__d2").as("cum_docs"), sum("__t2").as("cum_tokens"),
        sum("__v2").as("cum_vocab"))
      .withColumn("ttr_bp",
        floor(col("cum_vocab") * 10000.0 / col("cum_tokens")).cast("long"))
  }

  /** Zipf frequency spectrum: tokens bucketed by floor(log2(corpus
    * frequency)), with type/occurrence masses and count bounds per bucket
    * (the count-of-counts profile — a heavy singleton tail is OCR noise /
    * mint-everything tokenization; a fat head is boilerplate). The log2
    * bucket is computed as `length(bin(c)) - 1` — STRING arithmetic, not
    * libm log2, so both engines bucket power-of-two boundaries identically
    * (Math.log quotients at exact powers are ulp-hazardous).
    * `first_token` = bytewise-min token of the bucket (deterministic
    * representative). Two token-keyed hash-aggs, map-only in between. */
  def zipfSpectrum(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(toks(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("freq_bucket", (length(bin(col("c"))) - 1).cast("long"))
      .groupBy("freq_bucket")
      .agg(count(lit(1)).as("n_types"), sum("c").as("n_occurrences"),
        min("c").as("min_count"), max("c").as("max_count"),
        min("w").as("first_token"))

  /** PMI collocations over adjacent token pairs (the word2phrase signal):
    * top-`topN` bigrams with count >= `minCount`, ranked by the PMI
    * argument c_xy·T/(c_x·c_y) (ln is monotone — ordering identical,
    * no libm in the ranking key). Presented as floor(arg·1e6).
    *
    * The operand order (cxy·T / cx / cy, then ·1e6) is mirrored exactly
    * in the q230 oracle so the IEEE rounding sequence is identical.
    * Bigram extraction is an array transform inside codegen (no
    * self-join); counts are hash-aggs; unigram counts broadcast back.
    */
  def pmiCollocations(
      docs: DataFrame, textCol: String,
      minCount: Long, topN: Int): DataFrame = {
    val a = toks(col(textCol))
    val withToks = docs.withColumn(s"${textCol}_toks", a)
      .filter(size(col(s"${textCol}_toks")) >= 2)
    val big = withToks
      .select(explode(expr(
        s"""transform(sequence(0, size(${textCol}_toks) - 2),
           |  i -> struct(${textCol}_toks[i] AS x, ${textCol}_toks[i+1] AS y))"""
          .stripMargin)).as("b"))
      .select(col("b.x"), col("b.y"))
      .groupBy("x", "y").agg(count(lit(1)).as("cxy"))
    val uni = docs.select(explode(a).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum("c").as("t"))
    val scored = big.filter(col("cxy") >= minCount)
      .join(broadcast(uni.select(col("w").as("x"), col("c").as("cx"))), "x")
      .join(broadcast(uni.select(col("w").as("y"), col("c").as("cy"))), "y")
      .crossJoin(broadcast(total))
      .withColumn("arg",
        col("cxy").cast("double") * col("t") / col("cx") / col("cy"))
    scored
      .orderBy(desc("arg"), asc("x"), asc("y"))
      .limit(topN)
      .select(col("x"), col("y"), col("cxy"), col("cx"), col("cy"),
        floor(col("arg") * 1000000.0).cast("long").as("pmi_ppm"))
  }
}
