package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS local fingerprinting algorithm): hash every k-gram of a
  * document, slide a window of `w` consecutive hashes, and keep the minimum
  * hash of each window (rightmost on ties). The guarantee: any shared
  * substring of length ≥ w+k-1 between two documents yields at least one
  * shared fingerprint, while only ~2/(w+1) of the grams are kept.
  *
  * Gram hashes are md5-prefix integers (the repo's engine-portable hash:
  * DuckDB computes the identical value), so selection — and therefore the
  * whole result — is integer-deterministic and oracle-checkable; a rolling
  * Karp-Rabin hash would be ~k× cheaper per gram but private to the JVM.
  *
  * 100 TB posture: gram explosion and hashing are map-only; the window
  * selection is one key shuffle on doc id (grams of one doc stay in one
  * partition — bounded by document length, not corpus size); `distinct`
  * reuses the same key partitioning.
  */
object Winnow {

  /** One row per selected fingerprint: (id, pos, fp) where `pos` is the
    * 1-based gram position and `fp` the 60-bit md5-prefix hash. Documents
    * with fewer than `w` grams (length < w+k-1) emit nothing, like the
    * paper's guarantee threshold. */
  def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 8): DataFrame = {
    val n = (length(col(textCol)) - (k - 1)).cast("long")
    val grams = docs
      .filter(n >= w)
      .select(col(idCol), n.as("__n"),
        explode(sequence(lit(1L), n)).as("pos"), col(textCol))
      .select(col(idCol), col("__n"), col("pos"),
        conv(substring(md5(col(textCol).substr(col("pos"), lit(k))), 1, 15),
          16, 10).cast("long").as("__h"))
    val byDoc = Window.partitionBy(idCol).orderBy(col("pos"))
    // rightmost minimum of the window starting at each valid pos:
    // lexicographic min of (hash, -pos) == ORDER BY h ASC, pos DESC limit 1
    val sel = grams
      .withColumn("__m",
        min(struct(col("__h"), (-col("pos")).as("np")))
          .over(byDoc.rowsBetween(0, w - 1)))
      .filter(col("pos") <= col("__n") - (w - 1))
      .select(col(idCol), (-col("__m.np")).as("pos"), col("__m.__h").as("fp"))
    sel.distinct()
  }

  /** MOSS-style clone detection on top of [[fingerprints]]: unordered doc
    * pairs sharing at least `minShared` distinct fingerprint hashes, with
    * the shared count. The join is an equi-join on the fingerprint value —
    * quadratic only inside one fingerprint's bucket (documents sharing
    * that exact k-gram selection), never across the corpus; candidate rows
    * carry ids only. The winnowing guarantee makes this sound: any shared
    * run of length ≥ w+k-1 produces at least one shared fingerprint. */
  def similarPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 8, minShared: Long = 3): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp")).distinct()
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
