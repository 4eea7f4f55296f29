package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Embedding compression for serving-scale vector stores: symmetric int8
  * scalar quantization (the faiss `SQ8` / production-vector-DB default).
  * Each vector is scaled by its own max-|x|/127 so codes span the full int8
  * range; 4x smaller than f32 with ~1e-4 cosine error at d=64.
  *
  * Everything is per-row map-only arithmetic over the embedding array —
  * no shuffle, no trained state (unlike PQ, which needs codebooks; see
  * [[Pq]]). At 100 TB this is a pure scan-transform-write pass.
  */
object Quantize {

  /** Quantize + audit: per vector, the scale, the int8 codes, how many
    * components clipped (0 unless the input has inf/nan pathologies), and
    * the cosine similarity between the original and its reconstruction —
    * the quality metric a curation pipeline gates on before swapping the
    * serving index to compressed vectors. */
  def int8Symmetric(embDf: DataFrame, idCol: String, embCol: String): DataFrame = {
    val e = col(embCol).cast("array<double>")
    val withScale = embDf.select(col(idCol), e.as("__e"))
      .withColumn("scale", array_max(transform(col("__e"), x => abs(x))) / 127.0)
    // raw (unclamped) code per component; clamp to the int8 envelope
    def rawCode(x: org.apache.spark.sql.Column) =
      floor(x / col("scale") + lit(0.5))
    val coded = withScale
      .withColumn("codes", transform(col("__e"),
        x => greatest(lit(-127L), least(lit(127L), rawCode(x)))))
      .withColumn("n_clip", size(filter(col("__e"),
        x => abs(rawCode(x)) > 127)))
      .withColumn("__r", transform(col("codes"), c => c * col("scale")))
    coded.withColumn("cos_sim",
        when(col("scale") === 0.0, lit(1.0)) // zero vector: codes == input
          .otherwise(DotProduct(col("__e"), col("__r")) /
            (sqrt(DotProduct(col("__e"), col("__e"))) *
             sqrt(DotProduct(col("__r"), col("__r"))))))
      .select(col(idCol), col("scale"), col("codes"), col("n_clip"),
        col("cos_sim"))
  }
}
