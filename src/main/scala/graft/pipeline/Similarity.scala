package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths, mirroring how ANN systems scale:
  *  - brute-force cosine top-k: one map-only pass + TakeOrdered — the
  *    correctness baseline, and the right choice when the query set is
  *    small (it reads each vector exactly once, no index build);
  *  - random-hyperplane LSH (sign-random-projection, Charikar): L tables ×
  *    b bits per vector, bucket join for candidates, exact re-rank inside
  *    the candidate set. The index is just columns — it shuffles by bucket
  *    key and never materializes an all-pairs product.
  */
object Similarity {

  /** Cosine similarity between an array<float|double> column and a constant
    * query vector, computed in double. Pure built-ins (codegen'd). */
  def cosineToQuery(emb: Column, q: Array[Double]): Column = {
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val qCol = array(q.map(lit): _*)
    val dot = aggregate(zip_with(emb, qCol, (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
    val n = sqrt(aggregate(emb, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (n * lit(qNorm))
  }

  /** Cosine similarity between two embedding columns (for pair re-ranking). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k: Catalyst plans orderBy+limit as
    * TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    * driver, no full sort shuffle. */
  def bruteForceTopK(
      embDf: DataFrame, idCol: String, embCol: String,
      query: Array[Double], k: Int): DataFrame =
    embDf.select(col(idCol),
        round(cosineToQuery(col(embCol), query), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** ANN top-k via multi-table hyperplane LSH: candidates = union of the
    * query's buckets across tables, then exact cosine re-rank of candidates
    * only. Recall grows with `tables`; cost per probe is candidates-only.
    * Hyperplanes are the engine-portable md5-seeded Rademacher family
    * ([[graft.functions.RademacherSig]]), so the whole probe is
    * SQL-replayable by an oracle. */
  def lshTopK(
      embDf: DataFrame, idCol: String, embCol: String,
      query: Array[Double], k: Int,
      tables: Int = 8, bits: Int = 12): DataFrame = {
    val sigs = graft.functions.RademacherSig.signature(col(embCol), tables, bits)
    val indexed = embDf.select(col(idCol), col(embCol), sigs.as("buckets"))
    val qSig = graft.functions.RademacherSig.signatureOfVec(query, tables, bits)
    // candidate = agrees with the query bucket in at least one table
    val cond = (0 until tables)
      .map(t => element_at(col("buckets"), t + 1) === lit(qSig(t)))
      .reduce(_ || _)
    indexed.filter(cond)
      .select(col(idCol), round(cosineToQuery(col(embCol), query), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** THE default embedding near-dup operator: LSH-bucketed candidates +
    * exact cosine verify ([[cosineNearDupPairs]]). Never builds a cartesian
    * product — candidate generation goes through a bucket equi-join, so the
    * plan scales with collisions, not n². [[exactCosinePairs]] is the
    * explicitly-named small-N oracle baseline, not the operator users
    * reach for. */
  def nearDupPairs(
      embDf: DataFrame, idCol: String, embCol: String,
      threshold: Double = 0.95,
      tables: Int = 8, bits: Int = 8): DataFrame =
    cosineNearDupPairs(embDf, idCol, embCol, threshold, tables, bits)

  /** Exact all-pairs embedding near-dup — SMALL-N ORACLE BASELINE ONLY:
    * intrinsically Θ(n²) (a low cosine threshold makes the OUTPUT itself
    * quadratic, so no exact algorithm escapes the product). Norms
    * precomputed once per vector (linear), pair dot products via the native
    * [[graft.functions.DotProduct]] kernel. At index scale use
    * [[nearDupPairs]]. */
  def exactCosinePairs(
      embDf: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    val docs = embDf.select(col(idCol).as("id"), col(embCol).as("emb"),
      sqrt(aggregate(col(embCol), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("nrm"))
    val a = docs.select(col("id").as("id_a"), col("emb").as("ea"), col("nrm").as("na"))
    val b = docs.select(col("id").as("id_b"), col("emb").as("eb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(
        graft.functions.DotProduct(col("ea"), col("eb")) / (col("na") * col("nb")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** All-pairs near-dup by embedding cosine: LSH-bucket join + exact verify,
    * same shape as Dedup.minhashNearDupPairs. Buckets come from the
    * engine-portable Rademacher family ([[graft.functions.RademacherSig]]):
    * candidate generation AND verify are both SQL-replayable, which is what
    * promotes the LSH near-dup query from rows-only to oracle-hash-checked. */
  def cosineNearDupPairs(
      embDf: DataFrame, idCol: String, embCol: String,
      threshold: Double = 0.95,
      tables: Int = 8, bits: Int = 8): DataFrame = {
    val docs = embDf.repartition(col(idCol)) // parallelize per-vector prep
      .select(col(idCol).as("id"), col(embCol).as("emb"),
      sqrt(aggregate(col(embCol), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("nrm"),
      graft.functions.RademacherSig.signature(col(embCol), tables, bits)
        .as("buckets"))
      // localCheckpoint, not cache(): blocks are freed by the ContextCleaner
      // when the result is dropped; cache() pins until explicit unpersist
      .localCheckpoint()
    // candidate ids only through the bucket join + distinct — the wide
    // embedding arrays re-join AFTER dedup (shuffling vectors through
    // distinct() is the difference between MBs and GBs at scale)
    val banded = docs.select(col("id"),
      posexplode(col("buckets")).as(Seq("tbl", "key")))
    val a = banded.as("a"); val b = banded.as("b")
    val cand = a.join(b,
        col("a.tbl") === col("b.tbl") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(docs.select(col("id").as("id_a"), col("emb").as("ea"),
        col("nrm").as("na")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("emb").as("eb"),
        col("nrm").as("nb")), "id_b")
      .withColumn("cosine", round(
        graft.functions.DotProduct(col("ea"), col("eb")) / (col("na") * col("nb")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
