package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Retrieval-stage operators for training-data curation: hybrid
  * lexical+dense fusion, contrastive hard-negative mining, and MMR
  * diversification. These are the selection steps that sit between a raw
  * corpus and a training mix — given scored candidates, pick WHICH
  * documents/vectors actually enter the batch.
  *
  * 100 TB posture: every operator here is "bounded-candidate" shaped. The
  * corpus-wide passes are map-only scoring + TakeOrderedAndProject top-n
  * (per-partition top-n, k-row driver merge — no global sort shuffle);
  * everything after operates on candidate lists of fixed size n (ranks,
  * fusion, greedy rerank), which is O(n·k) regardless of corpus size. That
  * is the deployment shape of real retrieval stacks: ANN/BM25 produce a
  * small candidate set, rerankers run on the candidates only.
  */
object Retrieval {

  /** (id, __rank) of the top-n rows of `scored` by (score desc, id asc).
    * The top-n itself plans as TakeOrderedAndProject; the rank window then
    * runs on a single partition of exactly n rows — bounded by the
    * candidate-list size, not the corpus. */
  private def topRanks(
      scored: DataFrame, idCol: String, scoreCol: String, n: Int): DataFrame =
    scored.orderBy(col(scoreCol).desc, col(idCol)).limit(n)
      .select(col(idCol), row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))).as("__rank"))

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009):
    * fuse a BM25 top-n list and a dense-cosine top-n list into one ranking,
    * score(d) = Σ_lists 1/(kRrf + rank_list(d)). Rank-based fusion needs no
    * score calibration between the two retrievers, which is why it is the
    * default in production hybrid search.
    *
    * Both candidate lists are bounded (n rows); the fusion join and final
    * top-k run on ≤2n rows. The corpus-wide work is one map-only BM25
    * scoring pass (see [[Relevance.bm25]] — stats are a single
    * aggregation, scoring is shuffle-free) and one map-only cosine pass. */
  def hybridRrf(
      docs: DataFrame, embDf: DataFrame,
      docIdCol: String, textCol: String, vecIdCol: String, embCol: String,
      queryTerms: Seq[String], queryVec: Array[Double],
      n: Int = 100, k: Int = 20, kRrf: Int = 60): DataFrame = {
    val lexical = topRanks(
        Relevance.bm25(docs, docIdCol, textCol, queryTerms),
        docIdCol, "score", n)
      .withColumnRenamed("__rank", "__rl")
    val dense = topRanks(
        embDf.select(col(vecIdCol).as(docIdCol),
          Similarity.cosineToQuery(col(embCol), queryVec).as("score")),
        docIdCol, "score", n)
      .withColumnRenamed("__rank", "__rd")
    // full outer: a doc found by only one retriever still scores 1 term
    lexical.join(dense, Seq(docIdCol), "full_outer")
      .select(col(docIdCol),
        (coalesce(lit(1.0) / (lit(kRrf) + col("__rl")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(kRrf) + col("__rd")), lit(0.0))).as("__rrf"))
      .orderBy(col("__rrf").desc, col(docIdCol)).limit(k)
      .select(col(docIdCol), round(col("__rrf"), 6).as("rrf_score"))
  }

  /** Contrastive hard-negative mining: for each anchor vector, the top-k
    * most cosine-similar vectors with a DIFFERENT label — the "confusable
    * but wrong" examples contrastive/embedding training wants as negatives
    * (harder than random negatives, cheaper than model-in-the-loop mining).
    *
    * Anchors are a small set (broadcast); candidates stream through one
    * map-side scored pass (native [[DotProduct]] kernel, no shuffle for
    * scoring), and the per-anchor top-k goes through row_number ≤ k, which
    * Spark rewrites to WindowGroupLimit — each map task keeps only its
    * local top-k per anchor before the single bounded shuffle. */
  def hardNegatives(
      embDf: DataFrame, idCol: String, embCol: String, labelCol: String,
      anchorPred: Column, k: Int = 5): DataFrame = {
    val anchors = embDf.filter(anchorPred).select(
      col(idCol).as("anchor_id"), col(embCol).as("__av"), col(labelCol).as("__al"))
    // cosine = dot/(|c|·|a|), all in double via the native kernel — the
    // exact q60-proven formula (bit-parity with the DuckDB oracle)
    val raw = DotProduct(col(embCol), col("__av")) /
      (sqrt(DotProduct(col(embCol), col(embCol))) *
       sqrt(DotProduct(col("__av"), col("__av"))))
    embDf.join(broadcast(anchors), col(labelCol) =!= col("__al"))
      .select(col("anchor_id"), col(idCol), raw.as("__raw"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("anchor_id").orderBy(col("__raw").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col(idCol),
        round(col("__raw"), 4).as("cosine"))
  }

  /** Ranking-quality evaluation — recall@k, MRR@k, nDCG@k per anchor — for
    * a label-relevance protocol: candidates sharing the anchor's label are
    * the relevant set (the standard intrinsic eval for embedding spaces).
    * This closes the curation loop: mine negatives, train, then *measure*
    * whether the space ranks same-label items on top.
    *
    * Determinism is engineered in: the DCG discount weights are the
    * integers round(1e6 / log2(rank+1)) — so DCG is an exact integer sum
    * (run-order independent, no float-accumulation drift across engines),
    * and MRR uses max() (order independent by construction). One broadcast
    * nested-loop score pass over bounded anchors, one window shuffle on
    * anchor_id; the final per-anchor aggregate reuses that partitioning. */
  def rankingMetrics(
      embDf: DataFrame, idCol: String, embCol: String, labelCol: String,
      anchorPred: Column, k: Int = 10): DataFrame = {
    val weights: Seq[Long] =
      (1 to k).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))
    val prefix: Seq[Long] = weights.scanLeft(0L)(_ + _).tail

    val anchors = embDf.filter(anchorPred).select(
      col(idCol).as("anchor_id"), col(embCol).as("__av"),
      col(labelCol).as("__al"))
    val raw = DotProduct(col(embCol), col("__av")) /
      (sqrt(DotProduct(col(embCol), col(embCol))) *
       sqrt(DotProduct(col("__av"), col("__av"))))
    val ranked = embDf.join(broadcast(anchors), col(idCol) =!= col("anchor_id"))
      .select(col("anchor_id"),
        (col(labelCol) === col("__al")).cast("int").as("__rel"),
        raw.as("__raw"), col(idCol).as("__cid"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("anchor_id").orderBy(col("__raw").desc, col("__cid"))))

    val inTop = col("__rel") === 1 && col("__rn") <= k
    val dcgW = element_at(typedLit(weights), col("__rn").cast("int"))
    val agg = ranked.groupBy("anchor_id").agg(
      sum(col("__rel")).as("n_rel"),
      sum(when(inTop, 1L).otherwise(0L)).as("__hits"),
      coalesce(max(when(inTop, lit(1.0) / col("__rn"))), lit(0.0)).as("__mrr"),
      sum(when(inTop, dcgW).otherwise(0L)).as("__dcg"))
    val idcg = element_at(typedLit(prefix),
      least(lit(k), col("n_rel")).cast("int"))
    agg.select(col("anchor_id"), col("n_rel"),
        round(col("__hits").cast("double") / least(lit(k), col("n_rel")), 4)
          .as("recall"),
        round(col("__mrr"), 4).as("mrr"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(round(col("__dcg").cast("double") / idcg, 4)).as("ndcg"))
  }

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998): from
    * the top-n candidates by query relevance, greedily select k items
    * maximizing λ·rel(c) − μ·max_{s∈selected} sim(c, s) — relevant AND
    * mutually diverse, the dedup-aware flavor of top-k that exemplar
    * selection / few-shot mining needs.
    *
    * λ and μ are SEPARATE parameters (not μ = 1−λ): the defaults 0.7/0.3
    * are exact decimal literals on both the Scala and the SQL-oracle side,
    * whereas computing 1.0−0.7 in doubles yields 0.30000000000000004 and
    * breaks cross-engine argmax parity.
    *
    * Scale shape: the corpus-wide pass is map-only scoring + top-n
    * (TakeOrderedAndProject); the greedy rerank is O(n·k) on the driver
    * over the BOUNDED candidate list — the standard reranker deployment
    * shape (rerankers never see the corpus, only candidates). */
  def mmrRerank(
      embDf: DataFrame, idCol: String, embCol: String,
      query: Array[Double], n: Int = 20, k: Int = 10,
      lambda: Double = 0.7, mu: Double = 0.3,
      excludeId: Option[Long] = None): DataFrame = {
    val base = excludeId.fold(embDf)(q => embDf.filter(col(idCol) =!= q))
    // bounded collect: exactly n candidate rows (id, emb, rel)
    val cands = base.select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"),
        Similarity.cosineToQuery(col(embCol), query).as("rel"))
      .orderBy(col("rel").desc, col("id")).limit(n)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = cands.map { case (_, e, _) => math.sqrt(dot(e, e)) }
    def sim(i: Int, j: Int): Double =
      dot(cands(i)._2, cands(j)._2) / (norms(i) * norms(j))

    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val remaining = scala.collection.mutable.LinkedHashSet(cands.indices: _*)
    while (selected.length < math.min(k, cands.length)) {
      var bestIdx = -1; var bestScore = Double.NegativeInfinity
      for (c <- remaining) {
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => sim(c, s)).max
        val score =
          if (selected.isEmpty) cands(c)._3 // first pick: pure relevance
          else lambda * cands(c)._3 - mu * maxSim
        // ties break to the smaller id; candidates iterate in id-sorted
        // order within equal rel, so strict > keeps the first (smallest id)
        if (score > bestScore ||
            (score == bestScore && cands(c)._1 < cands(bestIdx)._1)) {
          bestScore = score; bestIdx = c
        }
      }
      selected += bestIdx
      remaining -= bestIdx
    }

    val spark = embDf.sparkSession
    import spark.implicits._
    selected.iterator.zipWithIndex.map { case (ci, r) =>
      (r + 1, cands(ci)._1,
        BigDecimal(cands(ci)._3).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toSeq.toDF("rank", "vec_id", "rel")
  }
}
