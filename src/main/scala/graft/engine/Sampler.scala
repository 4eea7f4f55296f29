package graft.engine

import graft.model.DatumKind

/** Adaptive sampling performed on a table's first flush, while
  * `segment_duration` is still unset (reference:
  * analytic_engine/src/sampler.rs — DefaultSampler picks a segment duration
  * from observed timestamp spacing; PrimaryKeySampler reorders the primary
  * key by ascending column cardinality so low-cardinality columns lead and
  * SST pruning bites; applied at flush in
  * instance/flush_compaction.rs:355-400).
  *
  * The math here is the pure part; the engine feeds it with one distributed
  * pass over the pre-flush storage ([[TsdbEngine.flush]]).
  */
object Sampler {

  private val HourMs = 3600L * 1000
  private val DayMs = 24 * HourMs

  /** Candidate segment durations, smallest wins (sampler.rs:42-51). */
  val AvailableDurationsMs: Seq[Long] = Seq(
    2 * HourMs, DayMs, 7 * DayMs, 30 * DayMs, 180 * DayMs,
    360 * DayMs, 5 * 360 * DayMs, 10 * 360 * DayMs)

  /** Fallback when fewer than two distinct timestamps were sampled
    * (table_options.rs:54 DEFAULT_SEGMENT_DURATION). */
  val DefaultDurationMs: Long = 2 * HourMs

  /** Timestamps at/above this can overflow duration bucketing and are not
    * sampled (sampler.rs:57-58). */
  val MaxTimestampMs: Long = Long.MaxValue - 2 * AvailableDurationsMs.last

  /** Expected points per series per segment (sampler.rs:55). */
  val PointsPerSeries = 100L

  /** How many lowest-cardinality columns lead the suggested PK
    * (sampler.rs:62 MAX_SUGGEST_PRIMARY_KEY_NUM). */
  val MaxSuggestPkColumns = 2

  /** Distinct-timestamp cap for the flush-time sample. The reference bounds
    * sampling by the write-buffer size of its sampling memtable; here the
    * first flush can be arbitrarily large, so the scan keeps the first N
    * distinct timestamps in time order — an estimate is all the ladder
    * snap needs. */
  val MaxTimestampSamples = 100000

  /** 90th-percentile consecutive interval of the sorted distinct timestamps
    * (sampler.rs:210-234 evaluate_interval: sort intervals ascending, index
    * len*0.9 stepped back once when > 1). None when under MIN_SAMPLES=2. */
  def evaluateIntervalMs(sortedDistinctTs: Seq[Long]): Option[Long] = {
    if (sortedDistinctTs.size < 2) return None
    val intervals = sortedDistinctTs.sliding(2).map(p => p(1) - p(0)).toArray
    java.util.Arrays.sort(intervals)
    var idx = (intervals.length.toDouble * 0.9).toInt
    if (idx > 1) idx -= 1
    Some(intervals(idx))
  }

  /** Smallest ladder duration that holds ~100 points per series at the
    * sampled interval; the largest rung when none does (sampler.rs:236-248). */
  def pickDurationMs(intervalMs: Long): Long = {
    val scaled =
      try Math.multiplyExact(intervalMs, PointsPerSeries)
      catch { case _: ArithmeticException => Long.MaxValue }
    AvailableDurationsMs.find(_ > scaled).getOrElse(AvailableDurationsMs.last)
  }

  def suggestDurationMs(sortedDistinctTs: Seq[Long]): Long =
    evaluateIntervalMs(sortedDistinctTs).map(pickDurationMs).getOrElse(DefaultDurationMs)

  /** Render a ladder duration the way the reference's ReadableDuration
    * prints it in SHOW CREATE TABLE ('2h', '1d', ...). */
  def durationString(ms: Long): String =
    if (ms % DayMs == 0) s"${ms / DayMs}d" else s"${ms / HourMs}h"

  /** Column kinds eligible as sampled primary keys (datum.rs:193-212
    * is_key_kind: everything except Null/Double/Float). */
  def isKeyKind(k: DatumKind.Value): Boolean =
    k != DatumKind.Null && k != DatumKind.Double && k != DatumKind.Float

  /** Order the sampled (column, approx distinct count) pairs into a PK
    * suggestion: ascending cardinality, stable on ties (declared order),
    * first two, then tsid (when the table generates it), then the timestamp
    * key (sampler.rs:336-361 suggest). */
  def suggestPrimaryKey(
      counts: Seq[(String, Long)], usesTsid: Boolean, timestampKey: String): Seq[String] = {
    val lead = counts.sortBy(_._2).take(MaxSuggestPkColumns).map(_._1)
    lead ++ (if (usesTsid) Seq(graft.model.TableSchema.TsidColumn) else Nil) :+ timestampKey
  }
}
