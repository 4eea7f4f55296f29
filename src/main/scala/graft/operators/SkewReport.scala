package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-distribution profiler — the pre-flight check before any 100 TB
  * shuffle. Every `groupBy`/`join` hash-partitions by its key; one hot key
  * turns a 1000-executor stage into a single straggling task. This
  * operator measures exactly the quantities that predict it: how many
  * rows the heaviest key carries, how that compares to the mean task
  * share, and the shape of the key-count distribution.
  *
  * Cost: one hash aggregate over the keys (map-side combining — the
  * per-partition partial map is bounded by distinct keys per partition),
  * then all statistics run over the COUNTS table (|keys| rows, not
  * |data|). Percentiles of the count distribution are exact, computed by
  * rank over the counts (a window over |keys| rows), so the report is
  * deterministic and oracle-checkable — this is a diagnostic, not an
  * estimate; its cost is a prefix of the shuffle it predicts.
  *
  * The reference hashes (tsid, timestamp) into fixed SST buckets and
  * cannot observe key skew at plan time; Spark's AQE reacts to skew at
  * runtime. This report is the third option: measure before you lay out
  * (pick salting factors, bucket counts, or a broadcast) — the number it
  * prints (`max_key_rows` vs `p50_key_rows`) IS the salting factor a
  * skewed join needs.
  */
object SkewReport {

  /** One-row skew summary for `df` keyed by `keys`.
    *
    * Output (all BIGINT, deterministic):
    *   n_rows, n_keys, max_key_rows, top1_share_bp (basis points of total
    *   rows on the heaviest key), p50/p90/p99_key_rows (exact percentiles
    *   of the rows-per-key distribution, nearest-rank), skew_x100
    *   (max_key_rows / mean_key_rows, scaled ×100 — the straggler factor
    *   a uniform hash partitioning would suffer).
    */
  def keySkew(df: DataFrame, keys: Seq[Column]): DataFrame = {
    val counts = df.groupBy(keys: _*).agg(count(lit(1)).as("__c"))
    // nearest-rank percentiles over the counts: rank each count once.
    // The single-partition window is intentional: it runs over the
    // AGGREGATED counts (|keys| rows), not the data — same shape as the
    // oracle's list_sort. For key spaces too large for one task, rank via
    // graft.pipeline.Sharding.ranked (two-phase distributed rank) instead.
    val w = Window.orderBy(col("__c"), keys.head) // total order; |keys| rows
    val ranked = counts
      .withColumn("__rk", row_number().over(w))
      .withColumn("__k", count(lit(1)).over(Window.partitionBy()))
    val agg = ranked.agg(
      sum("__c").as("__n"),
      max("__k").as("__k"),
      max("__c").as("__max"),
      max(when(col("__rk") === percRank(col("__k"), 50), col("__c"))).as("__p50raw"),
      max(when(col("__rk") === percRank(col("__k"), 90), col("__c"))).as("__p90raw"),
      max(when(col("__rk") === percRank(col("__k"), 99), col("__c"))).as("__p99raw"))
    agg.select(
      col("__n").as("n_rows"),
      col("__k").as("n_keys"),
      col("__max").as("max_key_rows"),
      expr("(__max * 10000) div __n").as("top1_share_bp"),
      col("__p50raw").as("p50_key_rows"),
      col("__p90raw").as("p90_key_rows"),
      col("__p99raw").as("p99_key_rows"),
      expr("(__max * 100 * __k) div __n").as("skew_x100"))
  }

  /** Nearest-rank index for percentile q over n items: ceil(n·q/100),
    * floored at 1 — integer arithmetic, engine-portable. */
  private def percRank(n: Column, q: Int): Column =
    greatest(ceil(n * q / 100.0).cast("long"), lit(1L))

  /** The `topN` heaviest keys with row counts and cumulative share —
    * the keys to salt, broadcast-filter, or quota. Deterministic order:
    * count desc, then key. One aggregate + a top-N sort over |keys| rows
    * (TakeOrderedAndProject — nothing but N rows leaves the executors). */
  def heavyKeys(df: DataFrame, keys: Seq[Column], topN: Int): DataFrame = {
    val total = df.count()
    df.groupBy(keys: _*).agg(count(lit(1)).as("key_rows"))
      .withColumn("share_bp", expr(s"(key_rows * 10000) div ${total}L"))
      .orderBy(col("key_rows").desc, keys.head)
      .limit(topN)
  }
}
