package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization ANN (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") — the compression-side scale
  * path next to LSH ([[Similarity.lshTopK]]) and IVF ([[Ivf]]): each
  * normalized vector is split into `m` subvectors, each subvector replaced
  * by the id of its nearest codeword from a per-subspace k-means codebook
  * (`ksub` codewords). A D-dim float vector becomes `m` small ints — 64
  * floats (256 B) at m=8 compress to 8 codes, so a 100 TB embedding corpus
  * scans as a few TB of codes. Queries score candidates with asymmetric
  * distance computation (ADC): one m×ksub lookup table of exact
  * query-to-codeword dot products, then each row costs m table lookups —
  * no float math per row.
  *
  * 100 TB posture: training mirrors [[Ivf.train]] — each iteration is ONE
  * distributed pass over all m subspaces at once (assignment rides the
  * flat codebook matrix in the expression; re-estimation is a keyed
  * shuffle of m·ksub·dsub partial sums, not vectors); only the codebook
  * (m·ksub·dsub doubles) reaches the driver. Encoding is map-only; the
  * codes table is the persisted index. Scoring is map-only +
  * TakeOrderedAndProject; the rerank variant over-fetches candidate ids by
  * ADC and exact-reranks only that short list against the float vectors.
  */
object Pq {

  /** Train per-subspace k-means codebooks on L2-normalized vectors.
    * Returns the flat codebook matrix: row `mi * ksub + j` is codeword `j`
    * of subspace `mi` (dsub doubles each). Deterministic: seeded
    * hash-ordered init, fixed iteration count, min-L2 assignment with
    * lowest-id tie-break.
    *
    * Trains on a deterministic hash-sample capped at `maxTrain` vectors —
    * the standard PQ deployment (FAISS trains codebooks on a bounded
    * sample however large the corpus): codebook quality saturates long
    * before the corpus is exhausted, and it keeps the per-iteration
    * shuffle O(maxTrain·dim) instead of O(corpus·dim) at 100 TB. */
  def train(
      embDf: DataFrame, idCol: String, embCol: String,
      m: Int, ksub: Int, iters: Int = 2, seed: Long = 42L,
      maxTrain: Int = 20000): Array[Array[Double]] = {
    val dim = embDf.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m

    val n = embDf.count()
    val trainDf =
      if (n <= maxTrain) embDf
      else embDf.filter(
        pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)) <
          lit(1000000L * maxTrain / n))

    // (id, mi, sub): every subvector of every normalized training vector —
    // cached for the init pass + `iters` assignment passes, dropped after
    val subDf = trainDf
      .select(col(idCol).as("__id"), normalized(col(embCol)).as("__v"))
      .select(col("__id"), posexplode(array(
        (0 until m).map(mi => slice(col("__v"), mi * dsub + 1, dsub)): _*
      )).as(Seq("__m", "__sub")))
      .persist()
    try trainOn(subDf, m, ksub, dsub, iters, seed)
    finally subDf.unpersist(false)
  }

  private def trainOn(subDf: DataFrame, m: Int, ksub: Int, dsub: Int,
      iters: Int, seed: Long): Array[Array[Double]] = {
    // init: per subspace, the ksub hash-first subvectors (seeded, stable)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__m").orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
    val init = subDf
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= ksub)
      .select("__m", "__rn", "__sub")
      .collect()
    var books = Array.fill(m * ksub)(new Array[Double](dsub))
    init.foreach { r =>
      books(r.getInt(0) * ksub + (r.getInt(1) - 1)) =
        r.getSeq[Double](2).toArray
    }

    var it = 0
    while (it < iters) {
      // one distributed pass: assign every subvector in every subspace,
      // then re-estimate all m codebooks from one keyed aggregation
      val sums = subDf
        .withColumn("__c", subspaceNearest(col("__sub"), col("__m"), books, ksub))
        .select(col("__m"), col("__c"),
          posexplode(col("__sub")).as(Seq("__p", "__x")))
        .groupBy("__m", "__c", "__p")
        .agg(sum("__x").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = books.map(_.clone())
      val seen = Array.fill(m * ksub)(false)
      sums.foreach { r =>
        val row = r.getInt(0) * ksub + r.getInt(1)
        next(row)(r.getInt(2)) = r.getDouble(3) / r.getLong(4)
        seen(row) = true
      }
      // empty codewords keep their previous value (standard Lloyd's)
      books = books.indices.map(i => if (seen(i)) next(i) else books(i)).toArray
      it += 1
    }
    books
  }

  /** `array<int>` of `m` codes for a vector (normalized internally):
    * code `mi` = min-L2 codeword of subspace `mi`. Map-only; this column
    * written next to the id IS the PQ index. */
  def encodeColumn(emb: Column, books: Array[Array[Double]], m: Int, ksub: Int): Column =
    GraftBridge.col(PqEncode(GraftBridge.expr(normalized(emb)), books, m, ksub))

  /** Approximate cosine via ADC: Σ_mi table[mi·ksub + code_mi], where the
    * table holds exact dot products of the normalized query's subvectors
    * with every codeword. */
  def adcColumn(codes: Column, books: Array[Array[Double]],
      query: Array[Double], m: Int, ksub: Int): Column = {
    val qn = Ivf.normalize(query)
    val dsub = qn.length / m
    val table = new Array[Double](m * ksub)
    var row = 0
    while (row < m * ksub) {
      val mi = row / ksub
      var s = 0.0; var p = 0
      while (p < dsub) { s += qn(mi * dsub + p) * books(row)(p); p += 1 }
      table(row) = s
      row += 1
    }
    GraftBridge.col(AdcScore(GraftBridge.expr(codes), table, ksub))
  }

  /** Single-shot PQ top-k: train, encode, ADC-score, take k. Rows-only
    * demo entry — for repeated queries persist (id, codes) once and reuse
    * [[adcColumn]] per query. */
  def pqTopK(
      embDf: DataFrame, idCol: String, embCol: String,
      query: Array[Double], k: Int,
      m: Int = 8, ksub: Int = 32, iters: Int = 2, seed: Long = 42L,
      maxTrain: Int = 20000): DataFrame = {
    val books = train(embDf, idCol, embCol, m, ksub, iters, seed, maxTrain)
    embDf
      .select(col(idCol), encodeColumn(col(embCol), books, m, ksub).as("__codes"))
      .select(col(idCol),
        round(adcColumn(col("__codes"), books, query, m, ksub), 4).as("adc_cosine"))
      .orderBy(col("adc_cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deployment path: ADC over-fetches `k * refine` candidate ids from the
    * codes (cheap, compressed scan), then ONLY those rows are exact-cosine
    * re-ranked against the float vectors. Output schema matches
    * [[Similarity.bruteForceTopK]] so recall is directly comparable. */
  def pqTopKRerank(
      embDf: DataFrame, idCol: String, embCol: String,
      query: Array[Double], k: Int, refine: Int = 5,
      m: Int = 8, ksub: Int = 32, iters: Int = 2, seed: Long = 42L,
      maxTrain: Int = 20000): DataFrame = {
    val books = train(embDf, idCol, embCol, m, ksub, iters, seed, maxTrain)
    val candidates = embDf
      .select(col(idCol), encodeColumn(col(embCol), books, m, ksub).as("__codes"))
      .select(col(idCol), adcColumn(col("__codes"), books, query, m, ksub).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(k * refine)
      .select(idCol)
    embDf
      .join(broadcast(candidates), idCol)
      .select(col(idCol),
        round(Similarity.cosineToQuery(col(embCol), query), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  private def subspaceNearest(sub: Column, mIdx: Column,
      books: Array[Array[Double]], ksub: Int): Column =
    GraftBridge.col(SubspaceNearest(
      GraftBridge.expr(sub), GraftBridge.expr(mIdx), books, ksub))

  /** x / ||x||₂ as array<double>; zero vectors pass through. */
  private[pipeline] def normalized(emb: Column): Column = {
    val v = transform(emb, x => x.cast("double"))
    val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    transform(v, x => when(n === 0d, x).otherwise(x / n))
  }

  private[pipeline] def l2sq(a: Array[Double], b: ArrayData, off: Int): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i) - b.getDouble(off + i); s += d * d; i += 1
    }
    s
  }
}

/** (array<double> subvector, int subspace) → int code of the min-L2
  * codeword within that subspace's ksub-row segment of the flat codebook.
  * Training-path assignment; interpreted eval is fine there. */
case class SubspaceNearest(left: Expression, right: Expression,
    books: Array[Array[Double]], ksub: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_subspace_nearest"

  override protected def nullSafeEval(sub: Any, mIdx: Any): Any = {
    val arr = sub.asInstanceOf[ArrayData]
    val base = mIdx.asInstanceOf[Int] * ksub
    var best = 0; var bestD = Double.PositiveInfinity
    var j = 0
    while (j < ksub) {
      val c = books(base + j)
      var s = 0.0; var i = 0
      while (i < c.length) {
        val d = c(i) - arr.getDouble(i); s += d * d; i += 1
      }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<double> (normalized) → array<int> of m min-L2 codes, one pass,
  * no explode — the encode side of the persisted PQ index. */
case class PqEncode(child: Expression, books: Array[Array[Double]], m: Int, ksub: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dsub = arr.numElements() / m
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val base = mi * ksub
      var best = 0; var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ksub) {
        val c = books(base + j)
        var s = 0.0; var i = 0
        while (i < dsub) {
          val d = c(i) - arr.getDouble(mi * dsub + i); s += d * d; i += 1
        }
        if (s < bestD) { bestD = s; best = j }
        j += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<int> codes → Σ table[mi·ksub + code_mi]. The per-query ADC lookup
  * table rides in the expression (m·ksub doubles — broadcast-sized). */
case class AdcScore(child: Expression, table: Array[Double], ksub: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    var s = 0.0; var mi = 0
    while (mi < codes.numElements()) {
      s += table(mi * ksub + codes.getInt(mi)); mi += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
