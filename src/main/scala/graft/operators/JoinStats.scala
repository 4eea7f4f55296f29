package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-cardinality pre-flight — answers "how big is this join, and is it
  * skewed?" BEFORE the join runs. At 100 TB an equi-join's output is
  * Σ_k n_a(k)·n_b(k): a few hot keys can make it explode quadratically
  * (the classic self-join-on-a-celebrity blowup), and the planner's
  * row-count estimates can be off by orders of magnitude. This operator
  * computes the true sum from the two sides' KEY HISTOGRAMS — two
  * hash aggregates (map-side combining, |keys| output rows each) and one
  * small histogram-×-histogram join, never the data-×-data join itself.
  *
  * Exact cost: O(|A|+|B|) scan + two |keys|-row shuffles — a tiny fixed
  * fraction of the join being sized. For repeated planning over the same
  * table, persist the histogram (it is a rollup; see
  * [[graft.plans.Rollups]]) and the check becomes free.
  *
  * [[sampledJoinCardinality]] is the sketch path for when even a full
  * histogram pass is too much: both sides keep a deterministic p%
  * hash-sample OF KEYS (the same keys survive on both sides — sampling
  * rows would bias the product), the same sum is computed over the
  * surviving keys, and the estimate scales by 1/p. Unbiased because key
  * survival is independent of the key's frequency.
  */
object JoinStats {

  /** One-row exact join-size report for `a ⋈ b` on `key`.
    *
    * Output (BIGINT, deterministic):
    *   join_rows (exact Σ n_a·n_b), n_matching_keys, max_key_pairs
    *   (heaviest key's contribution), top1_share_bp (its share of the
    *   output in basis points), rows_a, rows_b — plus the derived
    *   broadcast/salt decision inputs a planner needs.
    */
  def exactJoinCardinality(
      a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val ha = a.groupBy(col(key)).agg(count(lit(1)).as("__na"))
    val hb = b.groupBy(col(key)).agg(count(lit(1)).as("__nb"))
    val prod = ha.join(hb, key) // |keys| × |keys| histogram join
      .select((col("__na") * col("__nb")).as("__p"), col("__na"), col("__nb"))
    prod.agg(
        sum("__p").as("__jr"),
        count(lit(1)).as("__mk"),
        max("__p").as("__mx"),
        sum("__na").as("__ra"),
        sum("__nb").as("__rb"))
      .select(
        col("__jr").as("join_rows"),
        col("__mk").as("n_matching_keys"),
        col("__mx").as("max_key_pairs"),
        expr("(__mx * 10000) div __jr").as("top1_share_bp"),
        col("__ra").as("rows_a_matching"),
        col("__rb").as("rows_b_matching"))
  }

  /** Key-sampled estimate: keep keys whose engine-portable hash falls in
    * a `pctKeys`% bucket, compute the same histogram product over the
    * survivors, scale by 100/pctKeys. Deterministic (md5-keyed, like
    * every sampling draw in this engine) and unbiased over the key
    * population; relative error shrinks with the number of surviving
    * keys (PipelineSpec-style contract, not bit parity). */
  def sampledJoinCardinality(
      a: DataFrame, b: DataFrame, key: String, pctKeys: Int,
      salt: String = ":joinsize"): DataFrame = {
    def keep(df: DataFrame): DataFrame = df.filter(
      graft.pipeline.TextAnalysis.sampleBucket(
        concat(col(key).cast("string"), lit(salt)), 100) < pctKeys)
    val ha = keep(a).groupBy(col(key)).agg(count(lit(1)).as("__na"))
    val hb = keep(b).groupBy(col(key)).agg(count(lit(1)).as("__nb"))
    ha.join(hb, key)
      .select((col("__na") * col("__nb")).as("__p"))
      .agg(coalesce(sum("__p"), lit(0L)).as("__s"),
           count(lit(1)).as("__k"))
      .select(
        expr(s"(__s * 100) div $pctKeys").as("est_join_rows"),
        col("__k").as("sampled_keys"))
  }
}
