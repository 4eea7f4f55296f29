package graft.pipeline

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier step of the GPT-3 /
  * LLaMA / palm-family data pipelines (Brown et al. 2020 App. A): train a
  * linear classifier to distinguish a small curated "positive" set from
  * random corpus documents over hashed token features, then score the
  * whole corpus and keep high-probability documents (optionally with
  * Pareto-noise thresholding; we expose the raw probability and let the
  * caller choose the keep rule).
  *
  * fastText-equivalent shape: hashed bag-of-words features (HashingTF,
  * murmur3 into `numFeatures` buckets — vocabulary-unbounded) into
  * logistic regression. Training is MLlib's distributed L-BFGS (one
  * treeAggregate pass per iteration, model size = numFeatures doubles on
  * the driver); scoring broadcasts the coefficient vector and is a pure
  * map — the same model-small/data-huge split as [[Dsir]].
  */
object QualityClassifier {

  /** Train on `labelCol` (0/1) rows of `df`, score EVERY row: returns
    * (idCol, label, quality_prob). Deterministic: hashed features, fixed
    * iteration budget, no sampling anywhere. */
  def trainScore(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      trainFilter: org.apache.spark.sql.Column = lit(true),
      numFeatures: Int = 1 << 12, maxIter: Int = 20,
      regParam: Double = 0.01): DataFrame = {
    val toks = df.select(
      col(idCol), col(labelCol).cast("double").as("label"),
      trainFilter.as("__train"),
      TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
    val tf = new HashingTF()
      .setInputCol("__toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
    val featured = tf.transform(toks)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
    val model = lr.fit(featured.filter(col("__train")))
    model.transform(featured)
      .select(col(idCol), col("label").cast("long").as("label"),
        round(GetVectorElement(
          org.apache.spark.sql.GraftBridge.expr(col("probability")), 1)
          .toColumn, 4).as("quality_prob"))
  }
}

/** probability vector → P(class = idx). MLlib emits ml.linalg.Vector, which
  * plain Column arithmetic can't index; this unwraps it without a UDF
  * round-trip through Row. */
case class GetVectorElement(
    child: org.apache.spark.sql.catalyst.expressions.Expression, idx: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_element"
  def toColumn: org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.col(this)

  override protected def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    // VectorUDT layout: (type: byte, size: int, indices: array, values: array)
    row.getByte(0) match {
      case 1 => row.getArray(3).getDouble(idx) // dense
      case 0 => // sparse: binary-search indices
        val indices = row.getArray(2).toIntArray()
        val j = java.util.Arrays.binarySearch(indices, idx)
        if (j >= 0) row.getArray(3).getDouble(j) else 0.0
      case other => throw new IllegalStateException(s"bad vector tag $other")
    }
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}
