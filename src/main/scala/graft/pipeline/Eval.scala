package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline evaluation telemetry for pipeline-side model signals — the
  * check a data pipeline runs on ITS OWN scoring stages (quality
  * classifiers, langid, relevance scores) before trusting them to gate a
  * corpus: does the score actually separate the labeled classes?
  *
  * Everything here is exact integer/rational arithmetic over
  * distributions, never a sampled approximation — so reports are
  * engine-replayable bit-for-bit and a re-run of the audit cannot
  * disagree with the pipeline it audits.
  */
object Eval {

  /** Exact tie-aware ROC AUC (Mann-Whitney U) of a score against a binary
    * label, from the SCORE HISTOGRAM rather than per-row ranks:
    *
    *   AUC = P(s_pos > s_neg) + P(s_pos = s_neg)/2
    *   U×2 = Σ_s  n_pos(s) · (2·cumNegBelow(s) + n_neg(s))
    *
    * which needs one map-side-combined groupBy(score) and a prefix sum
    * over the score order — O(distinct scores) state, never a per-row
    * sort. Ties get the exact Wilcoxon 1/2 credit via the ×2 integers, so
    * the whole computation stays integral; the final division is the only
    * rounding and lands in basis points.
    *
    * 100 TB posture: the histogram is score-domain-bounded (a bp-scaled
    * score has ≤10001 rows) while the input aggregation is map-side
    * combined, so the only shuffle keyed on data carries (score) partial
    * counts. The prefix sum uses the [[Sharding]] two-phase scan shape
    * (range partition + O(partitions) collected bases), not a
    * single-reducer window — the histogram of a fine-grained float score
    * at 100 TB can itself be large. The two driver aggregates (bases and
    * totals) are O(partitions) and O(1).
    *
    * Output: one row — (n_pos, n_neg, u_x2, auc_bp). `auc_bp` divides
    * through DECIMAL(38,0) so n_pos·n_neg cannot overflow a long at
    * trillion-row scale.
    */
  def binaryAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df
      .select(score.as("__s"), when(label, 1L).otherwise(0L).as("__y"))
      .groupBy("__s")
      .agg(sum("__y").as("__np"), sum(lit(1L) - col("__y")).as("__nn"))
    // two-phase exclusive prefix sum of __nn in score order (ties share
    // one histogram row, so within-partition order is total already)
    val keyed = hist
      .repartitionByRange(col("__s"))
      .sortWithinPartitions(col("__s"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin phase-1 range boundaries for phase 2
    val sums = keyed.groupBy("__pid").agg(sum("__nn").as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = sums.map(_._1)
      .zip(sums.scanLeft(0L) { case (acc, (_, c)) => acc + c })
      .toSeq.toDF("__pid", "__base")
    val w = Window.partitionBy("__pid").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .join(broadcast(bases), "__pid")
      .withColumn("__below",
        col("__base") + coalesce(sum("__nn").over(w), lit(0L)))
      .agg(
        sum("__np").as("n_pos"),
        sum("__nn").as("n_neg"),
        // accumulate in decimal: the per-score term and its sum approach
        // 2·n_pos·n_neg, which leaves long range around 4.3e9 balanced
        // rows — long math here would wrap silently and poison auc_bp
        sum(col("__np").cast("decimal(38,0)") *
            (lit(2L) * col("__below") + col("__nn")).cast("decimal(38,0)"))
          .as("__u2d"))
      .select(col("n_pos"), col("n_neg"),
        // the reported u_x2 column is a long (saturating display past
        // 9.2e18); auc_bp divides the exact decimal, never the long
        col("__u2d").cast("long").as("u_x2"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
          .otherwise((col("__u2d") * 10000 /
            (col("n_pos").cast("decimal(38,0)") * col("n_neg") * 2))
            .cast("long"))
          .as("auc_bp"))
  }
}
