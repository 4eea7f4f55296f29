package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (record linkage): all unordered id
  * pairs whose key strings are within Levenshtein distance `d`, without
  * ever forming the cross product. This is the classic short-string
  * linkage primitive (titles, names, URLs, normalized addresses) that the
  * token-set operators ([[Dedup.ngramJaccardPairs]], MinHash) can't
  * express — Jaccard is blind to character typos inside tokens.
  *
  * Candidate generation is the FastSS deletion neighborhood (Bocek et al.
  * 2007): index every string under itself and each of its ≤d-codepoint
  * deletions. If ed(a,b) ≤ d then a and b share at least one variant
  * (delete the edited positions from each side), so bucketing on the
  * variant is COMPLETE; a final `levenshtein` verify on each candidate
  * pair makes it exact. Variant count is C(len, ≤d) per string —
  * len+1 for d=1 — which is why this runs on short keys, not documents.
  *
  * 100 TB shape: variant explosion is map-only after a round-robin
  * spread; the only shuffle is the equi-join on the variant hash; bucket
  * sizes are bounded by how many strings share a deletion variant (near
  * duplicates by construction) so no bucket approaches corpus scale, and
  * AQE's skew split covers pathological boilerplate keys. The verify step
  * runs codegen'd `levenshtein` on candidates only.
  */
object EditDistance {

  /** Deletion variants of `s` up to depth `d` (including `s` itself),
    * distinct, as an array column. Built with recursive HOF transforms —
    * depth ≤ 2 keeps the variant count at O(len²) worst case. */
  private def variants(s: org.apache.spark.sql.Column, d: Int) = {
    require(d == 1 || d == 2, "deletion neighborhoods support d in {1, 2}")
    def deletions(c: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, lit(1000000))))
    val d1 = deletions(s)
    val all = if (d == 1) concat(array(s), d1)
      else concat(array(s), d1, flatten(transform(d1, v => deletions(v))))
    array_distinct(all)
  }

  /** Unordered pairs (id_a < id_b) with ed(key_a, key_b) ≤ d, plus the
    * exact distance. Keys longer than `maxLen` codepoints are truncated
    * first (linkage keys are short by nature; this bounds the variant
    * fan-out on malformed rows). */
  def pairsWithin(
      df: DataFrame, idCol: String, strCol: String,
      d: Int = 1, maxLen: Int = 64): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val sigs = df
      .select(col(idCol).as("__id"),
        substring(col(strCol), 1, maxLen).as("__s"))
      .repartition(sc.defaultParallelism)
      .select(col("__id"), col("__s"),
        explode(variants(col("__s"), d)).as("__sig"))
      // hash the variant before the shuffle: joins move 8-byte keys, not
      // repeated string copies of nearly the whole input
      .select(col("__id"), col("__s"), xxhash64(col("__sig")).as("__sig"))
    val a = sigs.select(col("__id").as("id_a"), col("__s").as("__sa"), col("__sig"))
    val b = sigs.select(col("__id").as("id_b"), col("__s").as("__sb"), col("__sig"))
    a.join(b, "__sig")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__sa", "__sb").distinct()
      .filter(levenshtein(col("__sa"), col("__sb")) <= d)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb")).cast("long").as("dist"))
  }
}
