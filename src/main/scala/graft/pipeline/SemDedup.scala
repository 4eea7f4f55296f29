package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): embedding-space duplicate
  * removal that catches paraphrases exact/minhash dedup can't see.
  *
  *   1. k-means the corpus embeddings (the [[Ivf]] trainer — one
  *      distributed pass per iteration, centroid matrix on the driver);
  *   2. pairwise cosine ONLY within each cluster — the paper's trick
  *      that turns Θ(n²) into Θ(Σ nᵢ²), a per-cluster-bounded equi-join
  *      keyed by cluster id;
  *   3. group semantic duplicates (connected components over the
  *      above-threshold pairs) and keep one representative per group —
  *      the member closest to its cluster centroid (the paper keeps
  *      low-centroid-similarity examples for diversity when PRUNING;
  *      when DEDUPING the retained one should be the most central).
  *
  * 100 TB posture: no cross join anywhere — candidate generation is an
  * equi-join on cluster id, id-only pairs go through the CC loop, and
  * vectors re-join after grouping. Cluster count tunes the quadratic
  * bound (nlist ~ corpus/1e4 keeps buckets bounded).
  */
object SemDedup {

  /** (id, cluster, sem_group, centroid_cos, keep): every embedding with
    * its semantic-duplicate group and whether it survives the dedup. */
  def semanticDedup(
      embDf: DataFrame, idCol: String, embCol: String,
      eps: Double = 0.95, nlist: Int = 16, iters: Int = 2,
      seed: Long = 42L): DataFrame = {
    val centroids = Ivf.train(embDf, idCol, embCol, nlist, iters, seed)
    val assigned = embDf.select(
        col(idCol).as("id"), col(embCol).as("emb"),
        Ivf.assignColumn(col(embCol), centroids).as("cluster"),
        sqrt(aggregate(col(embCol), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))).as("nrm"))
      .withColumn("centroid_cos",
        round(CentroidCosine(org.apache.spark.sql.GraftBridge.expr(col("emb")),
          org.apache.spark.sql.GraftBridge.expr(col("cluster")),
          org.apache.spark.sql.GraftBridge.expr(col("nrm")), centroids).toColumn, 4))
      .localCheckpoint() // pin: CC + re-join must see one assignment
    // within-cluster pairs above eps: equi-join on cluster, ids only
    val slim = assigned.select(col("id"), col("cluster"), col("emb"), col("nrm"))
    val a = slim.as("a"); val b = slim.as("b")
    val pairs = a.join(b,
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .withColumn("__cos",
        graft.functions.DotProduct(col("a.emb"), col("b.emb")) /
          (col("a.nrm") * col("b.nrm")))
      .filter(col("__cos") >= eps)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val groups = Dedup.connectedComponents(pairs)
      .withColumnRenamed("cluster_id", "sem_group")
    // singletons are their own group; keeper = most central, then min id
    val labeled = assigned.join(groups, Seq("id"), "left")
      .withColumn("sem_group", coalesce(col("sem_group"), col("id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sem_group")
      .orderBy(col("centroid_cos").desc, col("id"))
    labeled
      .withColumn("keep", row_number().over(w) === 1)
      .select("id", "cluster", "sem_group", "centroid_cos", "keep")
  }
}

/** cosine(vector, centroids[cluster]) — centroids are normalized, so the
  * dot over the row's norm is the cosine. Matrix rides in the expression
  * (broadcast-sized). */
case class CentroidCosine(
    emb: org.apache.spark.sql.catalyst.expressions.Expression,
    cluster: org.apache.spark.sql.catalyst.expressions.Expression,
    nrm: org.apache.spark.sql.catalyst.expressions.Expression,
    centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types._
  override def dataType: DataType = DoubleType
  override def prettyName: String = "centroid_cosine"
  override def first = emb
  override def second = cluster
  override def third = nrm
  def toColumn: org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.col(this)

  override protected def nullSafeEval(e: Any, c: Any, n: Any): Any = {
    val arr = e.asInstanceOf[ArrayData]
    val elemType = emb.dataType.asInstanceOf[ArrayType].elementType
    val cen = centroids(c.asInstanceOf[Int])
    var s = 0.0
    var i = 0
    while (i < cen.length) {
      val x = elemType match {
        case FloatType  => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case other => throw new IllegalStateException(s"bad element type $other")
      }
      s += x * cen(i)
      i += 1
    }
    s / n.asInstanceOf[Double]
  }

  override protected def withNewChildrenInternal(
      f: org.apache.spark.sql.catalyst.expressions.Expression,
      s: org.apache.spark.sql.catalyst.expressions.Expression,
      t: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(emb = f, cluster = s, nrm = t)
}
