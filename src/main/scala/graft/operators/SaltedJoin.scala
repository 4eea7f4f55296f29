package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-busting salted join — the manual fix for a hot join key that AQE's
  * skew splitting cannot reach (AQE only splits the SHUFFLE side of a
  * sort-merge join post-hoc; a key hot enough to OOM a task before AQE
  * kicks in, or a shuffle-hash join, still needs salting). One hot key
  * otherwise funnels its entire fact-side volume through a single task.
  *
  * Shape: the fact side adds a deterministic salt in [0, factor) derived
  * from a row-unique column (NOT rand() — reruns and retried tasks must
  * salt identically or the join duplicates/drops rows on speculative
  * re-execution); the dimension side is exploded `factor`-fold so every
  * (key, salt) pair finds its dimension row. Join runs on (key, salt):
  * the hot key's rows spread over `factor` tasks.
  *
  * Cost model: dimension side inflates by `factor` — use for genuinely
  * skewed fact-dim joins where |dim| * factor ≪ |fact|. Result is
  * row-for-row identical to the unsalted join (spec-asserted).
  */
object SaltedJoin {

  /** Inner-join `fact` with `dim` on `keys`, salted `factor` ways using
    * `fact`'s `saltByCol` (any row-stable column; uniqueness not required —
    * it only drives the spread). */
  def join(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltByCol: String, factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(saltByCol)), lit(factor.toLong)))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }
}
