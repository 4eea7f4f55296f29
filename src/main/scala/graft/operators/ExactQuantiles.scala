package graft.operators

import graft.pipeline.Sharding
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT per-key quantiles over raw values — the compliance-grade
  * counterpart of [[QuantileRollup]]: a t-digest p99 carries rank error,
  * which an SLA audit or a regulatory latency report cannot accept. The
  * nearest-rank (inclusive) definition selects an ACTUAL data value per
  * (key, q) — nothing is averaged or summed, so the result is
  * bit-deterministic and engine-replayable.
  *
  * Scale shape: one ranged two-phase global rank over (key, value, id)
  * (the [[Sharding.ranked]] scan — range shuffle, per-partition window,
  * O(partitions) driver bases; NEVER a per-key window partition, which
  * would serialize a 100 TB key into one task). Per-key offsets and
  * counts are a keys-sized aggregate; the (key, q, target-rank) frame
  * broadcasts; the final equality join selects |keys|·|qs| rows. The raw
  * data is scanned once and shuffled once.
  *
  * Bound to watch: the broadcast target frame is |keys|·|qs| rows — fine
  * for metric/series cardinalities (millions of keys at a few quantiles
  * is tens of MB), but a pathological key space (say, per-user keys in
  * the billions) would blow the broadcast; switch the final equality
  * join to a shuffle join (drop the `broadcast()` hint) in that regime —
  * same plan otherwise.
  */
object ExactQuantiles {

  /** Nearest-rank quantiles `qsPercent` (e.g. 50/90/99) of `valueCol`
    * per `keyCol`; ties and row identity are broken by `idCol` so the
    * total order — and therefore the selected row — is unique. NULL
    * values are excluded before ranking (the SQL percentile convention —
    * ranking them would let a NULL become "the p50").
    * Output: (keyCol, q, valueCol), one row per (key, q). */
  def perKey(
      df: DataFrame, keyCol: String, valueCol: String, idCol: String,
      qsPercent: Seq[Int]): DataFrame = {
    require(qsPercent.forall(q => q >= 1 && q <= 100), s"qs $qsPercent")
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = Sharding.ranked(
      df.filter(col(valueCol).isNotNull)
        .select(col(keyCol), col(valueCol), col(idCol)),
      Seq(col(keyCol), col(valueCol), col(idCol)))
    val stats = ranked.groupBy(keyCol)
      .agg(min("seq").as("__base"), count(lit(1)).as("__n"))
    val targets = stats
      .crossJoin(qsPercent.map(_.toLong).toDF("q"))
      // nearest-rank, 1-based: ceil(q·n/100) = (q·n + 99) div 100
      .withColumn("__target", expr("(q * __n + 99) div 100"))
      // seq is globally unique, so the join needs no key clause (which
      // would also be an ambiguous self-join reference on keyCol)
      .select(col("q"), (col("__base") + col("__target") - 1).as("__seq"))
    ranked.join(broadcast(targets), col("seq") === col("__seq"))
      .select(col(keyCol), col("q"), col(valueCol))
  }
}
