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
    * only. Recall grows with `tables`; cost per probe is candidates-only. */
  def lshTopK(
      embDf: DataFrame, idCol: String, embCol: String,
      query: Array[Double], k: Int,
      tables: Int = 8, bits: Int = 12, seed: Long = 42L): DataFrame = {
    val sigs = HyperplaneSignature.signature(col(embCol), tables, bits, seed)
    val indexed = embDf.select(col(idCol), col(embCol), sigs.as("buckets"))
    val qSig = HyperplaneSignature.signatureOf(query, tables, bits, seed)
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
      tables: Int = 8, bits: Int = 8, seed: Long = 42L): DataFrame =
    cosineNearDupPairs(embDf, idCol, embCol, threshold, tables, bits, seed)

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
    * same shape as Dedup.minhashNearDupPairs. */
  def cosineNearDupPairs(
      embDf: DataFrame, idCol: String, embCol: String,
      threshold: Double = 0.95,
      tables: Int = 8, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val docs = embDf.repartition(col(idCol)) // parallelize per-vector prep
      .select(col(idCol).as("id"), col(embCol).as("emb"),
      sqrt(aggregate(col(embCol), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("nrm"),
      HyperplaneSignature.signature(col(embCol), tables, bits, seed).as("buckets"))
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

/** Sign-random-projection signatures: for table t, bit j, the hyperplane
  * weight for dimension d is a deterministic pseudo-gaussian derived from
  * splitmix64(seed, t, j, d) — no stored projection matrix, so executors
  * recompute weights locally and nothing is broadcast.
  */
object HyperplaneSignature {
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** uniform in [-1, 1) from the mixed key — adequate for sign projections */
  def weight(seed: Long, table: Int, bit: Int, dim: Int): Double = {
    val h = splitmix64(seed ^ (table.toLong << 40) ^ (bit.toLong << 20) ^ dim.toLong)
    (h >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  def signatureOfVec(v: Array[Double], tables: Int, bits: Int, seed: Long): Array[Long] = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var d = 0
        while (d < v.length) { dot += v(d) * weight(seed, t, b, d); d += 1 }
        if (dot > 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  /** driver-side signature of a constant query vector */
  def signatureOf(q: Array[Double], tables: Int, bits: Int, seed: Long): Array[Long] =
    signatureOfVec(q, tables, bits, seed)

  def signature(emb: Column, tables: Int, bits: Int, seed: Long): Column =
    GraftBridge.col(HyperplaneSignatureExpr(GraftBridge.expr(emb), tables, bits, seed))
}

/** array<numeric> → array<long> of per-table LSH bucket keys. Interpreted
  * eval (index build path, not the query hot path); the arithmetic is a
  * tight primitive loop either way. */
case class HyperplaneSignatureExpr(child: Expression, tables: Int, bits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val elemType = child.dataType.asInstanceOf[ArrayType].elementType
    val v = new Array[Double](arr.numElements())
    var i = 0
    while (i < v.length) {
      v(i) = elemType match {
        case FloatType  => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case IntegerType => arr.getInt(i).toDouble
        case LongType   => arr.getLong(i).toDouble
        case other => throw new IllegalStateException(s"bad embedding element $other")
      }
      i += 1
    }
    new GenericArrayData(HyperplaneSignature.signatureOfVec(v, tables, bits, seed))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
