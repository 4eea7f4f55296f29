package graft.pipeline

import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PCA whitening of an embedding column — the standard preprocessing for
  * embedding-space curation (SemDeDup-style clustering, retrieval,
  * near-dup mining): rotate into the principal axes and scale each axis to
  * unit variance, so cosine/L2 structure stops being dominated by a few
  * high-variance directions.
  *
  * 100 TB posture: the covariance is ONE distributed treeAggregate
  * (d×d accumulator per partition — no shuffle of vectors), the
  * eigendecomposition is driver-side on the d×d matrix (d = embedding
  * dim, tiny), and the projection is a map-only native expression with
  * the k×d whitening matrix riding in the plan. Nothing quadratic in the
  * corpus ever materializes.
  *
  * Determinism: breeze eigSym is deterministic for a given covariance;
  * each eigenvector's sign is normalized (largest-|entry| positive) so
  * reruns and retrains produce identical projections.
  */
object Whitening {

  /** Fit the whitening transform: returns (mean, W) where W is k×d and
    * whiten(x) = W (x − mean). Eigenvalues below `eps` are floored so a
    * rank-deficient covariance cannot blow up the scale. */
  def fit(embDf: DataFrame, embCol: String, k: Int,
      eps: Double = 1e-9): (Array[Double], Array[Array[Double]]) = {
    val rows = embDf.select(col(embCol).cast("array<double>"))
      .rdd.map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
    val mat = new RowMatrix(rows)
    val mean = mat.computeColumnSummaryStatistics().mean.toArray
    val cov = mat.computeCovariance()
    val d = mean.length
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")

    val bm = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) => cov(i, j))
    val es = breeze.linalg.eigSym(bm)
    // eigSym returns ascending eigenvalues; take the top k, largest first
    val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(k)
    val w = Array.ofDim[Double](k, d)
    var r = 0
    while (r < k) {
      val i = order(r)
      val lambda = math.max(es.eigenvalues(i), eps)
      val scale = 1.0 / math.sqrt(lambda)
      // sign convention: the entry with the largest magnitude is positive
      var maxAbs = 0.0; var maxJ = 0
      var j = 0
      while (j < d) {
        val v = es.eigenvectors(j, i)
        if (math.abs(v) > maxAbs) { maxAbs = math.abs(v); maxJ = j }
        j += 1
      }
      val sign = if (es.eigenvectors(maxJ, i) < 0) -1.0 else 1.0
      j = 0
      while (j < d) {
        w(r)(j) = es.eigenvectors(j, i) * sign * scale
        j += 1
      }
      r += 1
    }
    (mean, w)
  }

  /** Map-only whitened projection column: W (x − mean) as array<double>. */
  def whitenColumn(emb: Column, mean: Array[Double],
      w: Array[Array[Double]]): Column =
    GraftBridge.col(WhitenProject(
      GraftBridge.expr(emb.cast("array<double>")), mean, w))

  /** Fit + project: (id, whitened array<double> of k dims). */
  def pcaWhiten(embDf: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    val (mean, w) = fit(embDf, embCol, k)
    embDf.select(col(idCol),
      whitenColumn(col(embCol), mean, w).as("whitened"))
  }
}

/** array<double> → W (x − mean): the k×d whitening matrix and mean ride in
  * the expression (k·d + d doubles — broadcast-sized). */
case class WhitenProject(child: Expression,
    mean: Array[Double], w: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_whiten"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = mean.length
    val centered = new Array[Double](d)
    var j = 0
    while (j < d) { centered(j) = arr.getDouble(j) - mean(j); j += 1 }
    val out = new Array[Any](w.length)
    var r = 0
    while (r < w.length) {
      val row = w(r)
      var s = 0.0; var i = 0
      while (i < d) { s += row(i) * centered(i); i += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
