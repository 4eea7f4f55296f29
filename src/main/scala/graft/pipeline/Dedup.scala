package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape: no driver-side collection, candidate generation always
  * goes through a bucket/band shuffle (never an all-pairs cross join), and
  * exact verification only runs inside candidate groups.
  */
object Dedup {
  import TextAnalysis._

  /** Exact dedup: keep the lowest id per distinct text. One hash-aggregate
    * shuffle on the text (Spark map-side combines first). */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** MinHash-LSH near-duplicate candidate pairs (Broder minhash + banding).
    *
    * Pipeline: signature (per-doc, map-only) → explode band keys → shuffle
    * by (band, key) → pairs within buckets → exact shingle-Jaccard verify →
    * threshold. At scale the only quadratic work is within a bucket, and a
    * bucket only collects docs that already agree on a full band.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, deduped across bands.
    */
  def minhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val rows = numHashes / bands
    val docs = df.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleK)).as("sh"),
      minhashBands(minhashSignature(col(textCol), shingleK, numHashes), bands, rows)
        .as("bandkeys"))
      .cache()

    val banded = docs.select(col("id"),
      posexplode(col("bandkeys")).as(Seq("band", "key")))
    val a = banded.as("a")
    val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val withSets = candidates
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    withSets
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup candidate pairs: 64-bit fingerprints, banded into
    * `bands` key slices (two docs within `maxHamming` bits must share at
    * least one band when bands > maxHamming — the classic pigeonhole
    * argument), verified by exact Hamming distance via bit_count(xor).
    */
  def simhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val bits = 64 / bands
    val docs = df.select(col(idCol).as("id"),
      SimHash.simhash64(tokens(col(textCol))).as("sim"))
    // bands is a compile-time constant → unroll (shift amounts must be static)
    val bandCols = (0 until bands).map(b =>
      shiftrightunsigned(col("sim"), b * bits).bitwiseAND(lit((1L << bits) - 1)))
    val banded = docs.select(col("id"), col("sim"),
      posexplode(array(bandCols: _*)).as(Seq("band", "key")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard over blocked pairs: blocks on (lang, length
    * bucket) keep the pair space tractable; the full cross product only
    * happens inside a block. Returns pairs over the threshold. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, langCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val docs = df.select(col(idCol).as("id"), col(langCol).as("lang"),
      array_distinct(shingles(col(textCol), n)).as("sh"),
      (floor(length(col(textCol)) / 100)).as("lenb"))
    val a = docs.as("a"); val b = docs.as("b")
    a.join(b,
        col("a.lang") === col("b.lang") &&
        abs(col("a.lenb") - col("b.lenb")) <= 1 && col("a.id") < col("b.id"))
      .withColumn("jaccard",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        size(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("jaccard"), 4).as("jaccard"))
  }
}
