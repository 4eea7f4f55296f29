package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + distributed encode — the
  * tokenization stage of a training-data pipeline (vocabulary learned from
  * the corpus, then every document encoded with it).
  *
  * Training follows the published BPE-for-NLP formulation (Sennrich et al.
  * 2016): corpora collapse onto their WORD HISTOGRAM first, and the merge
  * loop runs over word types × counts. The distributed part is exactly the
  * histogram (one groupBy over exploded tokens, map-side combined) and the
  * encode pass (a native expression, map-only); the driver holds only the
  * top `maxWordTypes` word types — the same shape real BPE trainers use,
  * since natural-language histograms are heavy-tailed. Ties on pair counts
  * break lexicographically so training is deterministic across runs and
  * partitionings.
  */
object Bpe {

  /** Learn `numMerges` merges from the corpus' word histogram. */
  def train(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWordTypes: Int = 100000): Seq[(String, String)] = {
    val hist = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainOnHistogram(hist, numMerges)
  }

  /** The classic merge loop over (word, count) types: count adjacent symbol
    * pairs weighted by word count, merge the most frequent (ties: smaller
    * pair lexicographically), repeat. */
  def trainOnHistogram(
      words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var seqs: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- seqs; i <- 0 until syms.length - 1) {
        val key = (syms(i), syms(i + 1))
        counts(key) = counts.getOrElse(key, 0L) + c
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        seqs = seqs.map { case (syms, c) => (mergePair(syms, best), c) }
        seqs = seqs.filter(_._1.length > 1) // fully-merged words carry no pairs
        k += 1
      }
    }
    merges.result()
  }

  /** One left-to-right merge pass of `pair` over a symbol sequence. */
  private[pipeline] def mergePair(
      syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word: apply the merges in rank order (the standard BPE
    * encode — replay training order greedily). */
  /** Encode one word (spec surface; the distributed path pre-builds ranks). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Array[String] =
    encodeWithRanks(word, merges.zipWithIndex.toMap)

  /** Greedy rank-order encode used by both the spec path and the
    * distributed expression (which pre-builds the rank map once). */
  private[graft] def encodeWithRanks(
      word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var changed = true
    while (changed && syms.length > 1) {
      changed = false
      // lowest-rank applicable merge wins each round
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair != null) { syms = mergePair(syms, bestPair); changed = true }
    }
    syms
  }

  /** Distributed encode: whitespace-token the lowercased text, BPE-encode
    * each word, flatten — one native-expression kernel call per row
    * ([[graft.functions.BpeEncodeText]]). */
  def encodeTokens(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.col(graft.functions.BpeEncodeText(
      GraftBridge.expr(lower(text)), merges))
}
