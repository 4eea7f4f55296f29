package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-strategy advisor: composes the two pre-flight reports
  * ([[JoinStats]] for output size, [[SkewReport]] for key distribution)
  * into the decision a pipeline author otherwise makes by folklore —
  * broadcast / plain shuffle / salted shuffle / bucketed layout — with
  * the numbers that justify it. The decision table is deliberately
  * simple and fully deterministic:
  *
  *   1. a side whose estimated bytes fit the broadcast budget →
  *      `broadcast` that side (no shuffle of the big side at all);
  *   2. otherwise, if the build-side key histogram's straggler factor
  *      (max/mean rows per key) exceeds `saltAbove` → `salt`, with the
  *      measured factor as the recommended salt count (capped at 64);
  *   3. otherwise → `shuffle` (plain hash equi-join), with a note to
  *      bucket both sides when the join repeats (see
  *      [[Colocate.bucketedEquiJoin]]).
  *
  * Row-size estimation samples `sampleRows` rows per side and scales —
  * bounded driver state, one small job per side. All advisory: the
  * report IS the output (one row), nothing is rewritten.
  */
object JoinAdvisor {

  final case class Advice(
      strategy: String, // broadcast_left | broadcast_right | salt | shuffle
      saltFactor: Int, // >1 only for salt
      rowsLeft: Long, rowsRight: Long,
      bytesLeftEst: Long, bytesRightEst: Long,
      joinRows: Long, skewLeftX100: Long, skewRightX100: Long)

  def advise(
      left: DataFrame, right: DataFrame, key: String,
      broadcastBytes: Long = 64L << 20, saltAbove: Long = 400L,
      sampleRows: Int = 200): Advice = {
    def sizeEst(df: DataFrame): (Long, Long) = {
      val n = df.count()
      if (n == 0) (0L, 0L)
      else {
        val sampled = df.limit(sampleRows).collect()
        val avg = sampled.map(r => rowBytes(r)).sum / math.max(sampled.length, 1)
        (n, n * avg)
      }
    }
    val (nl, bl) = sizeEst(left)
    val (nr, br) = sizeEst(right)
    val skew = (df: DataFrame) => SkewReport.keySkew(df, Seq(col(key)))
      .select("skew_x100").head().getLong(0)
    val (sl, sr) = (skew(left), skew(right))
    val joinRows = JoinStats.exactJoinCardinality(left, right, key)
      .select("join_rows").head().getLong(0)
    val advice =
      if (bl <= broadcastBytes && bl <= br) ("broadcast_left", 1)
      else if (br <= broadcastBytes) ("broadcast_right", 1)
      else if (math.max(sl, sr) > saltAbove)
        ("salt", math.min(64L, math.max(sl, sr) / 100L + 1L).toInt)
      else ("shuffle", 1)
    Advice(advice._1, advice._2, nl, nr, bl, br, joinRows, sl, sr)
  }

  /** Rough serialized size of one row (driver-side, sample only). */
  private def rowBytes(r: org.apache.spark.sql.Row): Long =
    r.toSeq.map {
      case null => 1L
      case s: String => s.length.toLong + 4
      case a: Array[Byte] => a.length.toLong + 4
      case _: Long | _: Double => 8L
      case _: Int | _: Float => 4L
      case _: Short => 2L
      case _: Boolean | _: Byte => 1L
      case seq: scala.collection.Seq[_] => seq.length.toLong * 8 + 4
      case other => other.toString.length.toLong
    }.sum

  /** The advice as a one-row DataFrame (for the query surface). */
  def adviseDf(
      left: DataFrame, right: DataFrame, key: String,
      broadcastBytes: Long = 64L << 20, saltAbove: Long = 400L): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val a = advise(left, right, key, broadcastBytes, saltAbove)
    Seq((a.strategy, a.saltFactor, a.rowsLeft, a.rowsRight, a.joinRows,
      a.skewLeftX100, a.skewRightX100))
      .toDF("strategy", "salt_factor", "rows_left", "rows_right",
        "join_rows", "skew_left_x100", "skew_right_x100")
  }
}
