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

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining in Low-Resource Settings" / the LASER–CCMatrix
    * mining criterion): align two embedding sets — two languages of a
    * multilingual crawl embedded in one space — by scoring each candidate
    * pair's cosine AGAINST the local similarity floor of both endpoints
    * (the ratio-margin: cos(x,y) / mean of the two sides' k-NN cosines),
    * then keeping MUTUAL best matches (the "max" strategy's intersection).
    * Raw cosine thresholds misfire where the embedding space is dense;
    * the margin normalizes hubness away — the published insight.
    *
    * Candidates come from the engine-portable md5-seeded Rademacher LSH
    * family ([[graft.functions.RademacherSig]], [[lshTopK]]'s index): a
    * src×tgt BUCKET equi-join, never an all-pairs product, and the whole
    * probe — candidates, k-NN floors, margins, mutual argmax — is
    * SQL-replayable by an oracle. k-NN floors are computed WITHIN the
    * candidate set (what a production LSH/IVF miner actually does).
    *
    * Determinism: pair cosines are quantized to integer basis points
    * once (`c = round(cos·10⁴)`, the 4-dp rounding the whole ANN family
    * rides on), and everything downstream is exact integer arithmetic —
    * the margin ships as `margin_x1e6 = ⌊2·10⁶·c·|Nx|·|Ny| /
    * (Sx·|Ny| + Sy·|Nx|)⌋` over top-k SUMS (never float averages), and
    * both argmax ranks tie-break on (margin, c, id). Only positive-cosine
    * candidates participate (a k-NN "floor" of anti-correlated neighbors
    * is meaningless, and positivity keeps the integer division exact).
    *
    * Scale shape: per-side prep (norms, signatures) is map-only over a
    * pinned frame; the bucket join shuffles (id, key) pairs; embeddings
    * re-join AFTER the candidate distinct; the k-NN and argmax windows
    * are keyed by vector id (bounded by per-vector candidate count).
    * `bits` is the scale lever — buckets per table is 2^bits, so size it
    * to keep expected bucket occupancy bounded as the corpus grows (the
    * q329 gate point is 16×6 for recall at fixture scale; [[lshTopK]]'s
    * 12-bit default is the right order for millions of vectors — the
    * candidate join is quadratic only IN-BUCKET, like every LSH family
    * member here). A runtime guard enforces the contract: the call
    * loud-fails when the larger side's expected occupancy (n / 2^bits)
    * exceeds `maxOccupancy`, so the fixture-recall gate point cannot
    * silently ship at corpus scale.
    * Returns (src_id, tgt_id, cosine_x10000, margin_x1e6) — one row per
    * mutual best match, injective on both sides by construction. */
  def bitextMine(
      src: DataFrame, tgt: DataFrame, idCol: String, embCol: String,
      k: Int = 4, tables: Int = 16, bits: Int = 6,
      maxOccupancy: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, n: String) = df.repartition(col(idCol))
      .select(col(idCol).as(n), col(embCol).as(s"emb_$n"),
        sqrt(aggregate(col(embCol), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")))
          .as(s"nrm_$n"),
        graft.functions.RademacherSig.signature(col(embCol), tables, bits)
          .as(s"bk_$n"))
      .localCheckpoint() // feeds the band explode AND the embedding re-join
    val s = side(src, "x")
    val t = side(tgt, "y")
    // Occupancy guard (loud-fail, the family posture): the candidate join
    // is quadratic IN-BUCKET, so a `bits` point sized for fixture-scale
    // recall must not silently ship against a 100x corpus. Expected
    // occupancy is n / 2^bits per table side; the counts are O(1) jobs
    // over the just-checkpointed frames. Each +1 bit halves occupancy —
    // raise `bits` with the corpus, or `maxOccupancy` consciously.
    val occ = math.max(s.count(), t.count()).toDouble / (1L << bits)
    require(occ <= maxOccupancy,
      f"bitextMine: expected LSH bucket occupancy $occ%.0f rows/bucket " +
        f"(larger side over 2^$bits buckets) exceeds maxOccupancy=" +
        f"$maxOccupancy — the in-bucket join is quadratic; size `bits` " +
        "to the corpus (each +1 halves occupancy)")
    val bs = s.select(col("x"), posexplode(col("bk_x")).as(Seq("tbl", "key")))
    val bt = t.select(col("y"), posexplode(col("bk_y")).as(Seq("tbl", "key")))
    val cand = bs.join(bt, Seq("tbl", "key")).select("x", "y").distinct()
    // pinned: the candidate-pair cosines feed both k-NN floors AND the
    // margin join — without the cut the LSH join would run three times
    val pc = cand
      .join(s.select(col("x"), col("emb_x"), col("nrm_x")), "x")
      .join(t.select(col("y"), col("emb_y"), col("nrm_y")), "y")
      .withColumn("__cos", graft.functions.DotProduct(col("emb_x"), col("emb_y"))
        / (col("nrm_x") * col("nrm_y")))
      .filter(col("__cos") > 0)
      .select(col("x"), col("y"),
        round(col("__cos") * 10000).cast("long").as("c"))
      .localCheckpoint()
    val wx = Window.partitionBy("x").orderBy(col("c").desc, col("y"))
    val fx = pc.withColumn("__rk", row_number().over(wx))
      .filter(col("__rk") <= k)
      .groupBy("x").agg(sum("c").as("sx"), count(lit(1)).as("cx"))
    val wy = Window.partitionBy("y").orderBy(col("c").desc, col("x"))
    val fy = pc.withColumn("__rk", row_number().over(wy))
      .filter(col("__rk") <= k)
      .groupBy("y").agg(sum("c").as("sy"), count(lit(1)).as("cy"))
    val m = pc.join(fx, "x").join(fy, "y")
      .withColumn("margin",
        expr("(2000000 * c * cx * cy) div (sx * cy + sy * cx)"))
      .select("x", "y", "c", "margin")
      .localCheckpoint() // feeds both argmax windows AND the final join
    val wbx = Window.partitionBy("x")
      .orderBy(col("margin").desc, col("c").desc, col("y"))
    val bx = m.withColumn("__rk", row_number().over(wbx))
      .filter(col("__rk") === 1).select("x", "y")
    val wby = Window.partitionBy("y")
      .orderBy(col("margin").desc, col("c").desc, col("x"))
    val by = m.withColumn("__rk", row_number().over(wby))
      .filter(col("__rk") === 1).select("x", "y")
    m.join(bx, Seq("x", "y"), "left_semi")
      .join(by, Seq("x", "y"), "left_semi")
      .select(col("x").as("src_id"), col("y").as("tgt_id"),
        col("c").as("cosine_x10000"), col("margin").as("margin_x1e6"))
  }
}
