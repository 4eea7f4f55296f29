package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the "concat and chunk" example assembly step of LLM
  * training pipelines: documents are laid end-to-end in a deterministic
  * order and the token stream is cut into fixed-length training sequences.
  * Each document gets its global token offset, the id of the sequence its
  * first token lands in, and its position inside that sequence.
  *
  * The global offset is a prefix sum over a total order — the naive
  * formulation (one unpartitioned window) serializes the whole corpus
  * through a single reducer. This implementation is the classic
  * distributed two-phase scan:
  *
  *   1. range-repartition by id (so partition p holds a contiguous id
  *      span) and take each partition's token total — an O(partitions)
  *      driver collect, independent of row count;
  *   2. broadcast-join the per-partition base offsets back and add a
  *      window prefix sum PARTITIONED by partition id — every window
  *      group is one partition's rows, so the scan runs fully parallel.
  *
  * The checkpoint pins phase 1's range boundaries (only the 3-column
  * (id, count, pid) projection is materialized, never the text), so both
  * phases see identical partition ids.
  */
object Packing {

  /** (idCol, n_tokens, global_offset, seq_id, seq_pos) for packing into
    * `seqLen`-token sequences in ascending-id order. */
  def pack(df: DataFrame, idCol: String, textCol: String, seqLen: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counted = df
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // phase 1: per-partition totals -> exclusive base offset per partition
    val totals = counted.groupBy("__pid").agg(sum("n_tokens").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.map(_._1)
      .zip(totals.scanLeft(0L) { case (acc, (_, t)) => acc + t })
      .toSeq.toDF("__pid", "__base")
    // phase 2: parallel per-partition prefix sum + broadcast base join
    val w = Window.partitionBy("__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .join(broadcast(bases), "__pid")
      .withColumn("global_offset",
        col("__base") + sum("n_tokens").over(w) - col("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        col("global_offset"),
        floor(col("global_offset") / seqLen).cast("long").as("seq_id"),
        pmod(col("global_offset"), lit(seqLen.toLong)).as("seq_pos"))
  }

  /** Token-budget corpus selection — "take the best documents until the
    * training budget is spent" (the data-constrained selection step):
    * orders by `scoreCol` DESC (id tie-break), keeps every document whose
    * INCLUSIVE cumulative token count fits the budget, and returns it with
    * its running total.
    *
    * The cumulative count is the same distributed two-phase prefix scan as
    * [[pack]] — range-repartition on the (score, id) total order, O(P)
    * driver offsets, per-partition parallel window — so the global
    * "cumsum then cut" never serializes through one reducer. */
  def takeUntilBudget(
      df: DataFrame, idCol: String, textCol: String, scoreCol: String,
      budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counted = df
      .select(col(idCol), col(scoreCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .repartitionByRange(col(scoreCol).desc, col(idCol))
      .sortWithinPartitions(col(scoreCol).desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = counted.groupBy("__pid").agg(sum("n_tokens").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.map(_._1)
      .zip(totals.scanLeft(0L) { case (acc, (_, t)) => acc + t })
      .toSeq.toDF("__pid", "__base")
    val w = Window.partitionBy("__pid")
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .join(broadcast(bases), "__pid")
      .withColumn("cum_tokens", col("__base") + sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(scoreCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Length-grouped batching (the dynamic-batching / "bucketing by length"
    * step of training and inference serving): documents are grouped into
    * power-of-two length buckets, deterministically shuffled within each
    * bucket (salted md5 — reruns produce identical batches), and cut into
    * `batchSize`-row batches. Output is the per-batch audit: sizes, length
    * spread, and padding waste (rows x max_len − sum_len, the tokens a
    * padded batch wastes) — the number this operator exists to minimize.
    *
    * The within-bucket index is the same distributed two-phase prefix scan
    * as [[pack]] (range partition on the total order, O(P) driver offsets,
    * parallel per-partition windows) — NOT a per-bucket global window,
    * which would serialize each length bucket through one reducer. Bucket
    * ids are exact integers (length of the binary representation), so the
    * whole pipeline is integer arithmetic — engine-reproducible. */
  def lengthGroupedBatches(
      df: DataFrame, idCol: String, textCol: String,
      batchSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counted = df
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("len_bucket", length(bin(col("n_tokens"))).cast("long"))
      .withColumn("__h", md5(concat(col(idCol).cast("string"), lit(":batch"))))
      .repartitionByRange(col("len_bucket"), col("__h"), col(idCol))
      .sortWithinPartitions(col("len_bucket"), col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = counted.groupBy("__pid").agg(count(lit(1)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.map(_._1)
      .zip(totals.scanLeft(0L) { case (acc, (_, t)) => acc + t })
      .toSeq.toDF("__pid", "__base")
    val w = Window.partitionBy("__pid")
      .orderBy(col("len_bucket"), col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = counted
      .join(broadcast(bases), "__pid")
      .withColumn("__rank", col("__base") + count(lit(1)).over(w) - 1)
    // each bucket's first global rank -> within-bucket index (bucket count
    // is O(log max_len): the subtraction join broadcasts)
    val starts = ranked.groupBy("len_bucket").agg(min("__rank").as("__start"))
    ranked.join(broadcast(starts), "len_bucket")
      .withColumn("batch_id",
        floor((col("__rank") - col("__start")) / batchSize).cast("long"))
      .groupBy("len_bucket", "batch_id")
      .agg(count(lit(1)).as("n_seqs"),
        min("n_tokens").as("min_len"), max("n_tokens").as("max_len"),
        sum("n_tokens").as("sum_tokens"))
      .withColumn("padding_waste",
        col("n_seqs") * col("max_len") - col("sum_tokens"))
  }
}
