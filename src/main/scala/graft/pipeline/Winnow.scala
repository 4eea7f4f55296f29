package graft.pipeline

import org.apache.spark.sql.DataFrame
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
    * paper's guarantee threshold. Map-only: the
    * [[graft.functions.WinnowFp]] kernel does the hash + window-min scan
    * per document (O(|text|), O(w) state), so the only plan nodes are a
    * scan, a projection, and the generate — no shuffle at all. */
  def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 8): DataFrame =
    docs
      .select(col(idCol),
        explode(graft.functions.WinnowFp(col(textCol), k, w)).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))

  /** MOSS-style clone detection on top of [[fingerprints]]: unordered doc
    * pairs sharing at least `minShared` distinct fingerprint hashes, with
    * the shared count. The join is an equi-join on the fingerprint value —
    * quadratic only inside one fingerprint's bucket (documents sharing
    * that exact k-gram selection), never across the corpus; candidate rows
    * carry ids only. The winnowing guarantee makes this sound: any shared
    * run of length ≥ w+k-1 produces at least one shared fingerprint.
    *
    * `maxDocFreq` is MOSS's "ignore matches appearing in more than N
    * documents" knob: ubiquitous fingerprints (boilerplate, common
    * phrases) carry no clone signal but dominate the join quadratically —
    * dropping them bounds every bucket at maxDocFreq docs, i.e.
    * O(maxDocFreq²) pairs per fingerprint. The document-frequency count
    * is a window over the same fp partitioning the join shuffles on, so
    * the cap costs no extra exchange. */
  def similarPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 8, minShared: Long = 3,
      maxDocFreq: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp")).distinct()
    val kept = maxDocFreq.fold(fps) { m =>
      fps.withColumn("__df", count(lit(1)).over(Window.partitionBy("fp")))
        .filter(col("__df") <= m).drop("__df")
    }
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
