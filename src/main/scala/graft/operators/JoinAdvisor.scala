package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * Row-size estimation is an EXACT distributed sum of typed per-row byte
  * sizes (fixed width per numeric/temporal type, length+4 for
  * string/binary, element-count-scaled for arrays, 1 for NULL — all
  * engine-replayable SQL) computed in the same aggregate as the row
  * count: one job per side, no driver-side row collection, identical on
  * every run / partitioning / engine — which is what lets the battery
  * hash-check the report (q259). (An earlier md5-sampled variant ran the
  * byte expression over every row anyway — same scan, noisier answer —
  * so the sample was pure overhead; at 100 TB the right lever is
  * sampling PARTITIONS at the scan, not rows after it.)
  */
object JoinAdvisor {

  final case class Advice(
      strategy: String, // broadcast_left | broadcast_right | salt | shuffle
      saltFactor: Int, // >1 only for salt
      rowsLeft: Long, rowsRight: Long,
      bytesLeftEst: Long, bytesRightEst: Long,
      joinRows: Long, skewLeftX100: Long, skewRightX100: Long)

  /** Typed per-row byte size as a Column (NULL → 1 byte, like a null
    * bitmap entry + tag; the exact constants matter less than being the
    * same everywhere). */
  private def rowBytesCol(df: DataFrame): Column =
    df.schema.fields.map { f =>
      val c = col(f.name)
      val sz: Column = f.dataType match {
        case StringType | BinaryType => length(c).cast("long") + lit(4L)
        case LongType | DoubleType | TimestampType | TimestampNTZType =>
          lit(8L)
        case IntegerType | FloatType | DateType => lit(4L)
        case ShortType => lit(2L)
        case BooleanType | ByteType => lit(1L)
        // arrays dominate embedding-bearing tables: element-count scaled
        // (a flat 8 would under-count a 128-float vector ~100x and could
        // emit broadcast advice for a side that cannot be broadcast)
        case _: ArrayType => size(c).cast("long") * 8L + lit(4L)
        case _ => lit(8L) // nested/decimal: flat estimate
      }
      when(c.isNull, lit(1L)).otherwise(sz)
    }.reduce(_ + _)

  def advise(
      left: DataFrame, right: DataFrame, key: String,
      broadcastBytes: Long = 64L << 20, saltAbove: Long = 400L): Advice = {
    def sizeEst(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)).as("n"),
        coalesce(sum(rowBytesCol(df)), lit(0L)).as("tb")).head()
      (r.getLong(0), r.getLong(1))
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

  /** The advice as a one-row DataFrame (for the query surface) —
    * including the byte estimates that justify the broadcast branch, so
    * the oracle can replay the whole decision. */
  def adviseDf(
      left: DataFrame, right: DataFrame, key: String,
      broadcastBytes: Long = 64L << 20, saltAbove: Long = 400L): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val a = advise(left, right, key, broadcastBytes, saltAbove)
    Seq((a.strategy, a.saltFactor.toLong, a.rowsLeft, a.rowsRight,
      a.bytesLeftEst, a.bytesRightEst, a.joinRows,
      a.skewLeftX100, a.skewRightX100))
      .toDF("strategy", "salt_factor", "rows_left", "rows_right",
        "bytes_left_est", "bytes_right_est", "join_rows",
        "skew_left_x100", "skew_right_x100")
  }
}
