package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior) join — the canonical time-series enrichment: for
  * each left row, the most recent right row with the same key and
  * `right.ts <= left.ts`, optionally within a tolerance. The reference
  * exposes this shape through its PromQL/InfluxQL "last observation"
  * lowering; as a standalone relational operator it is the piece Spark SQL
  * itself lacks (DuckDB: `ASOF JOIN`, Pandas: `merge_asof`).
  *
  * Implementation is a single-shuffle merge, not a join: tag both inputs,
  * union them, and run one `last(_, ignoreNulls)` window per key ordered by
  * (ts, side) with right rows sorting before left rows at equal timestamps
  * (so an exactly-simultaneous right row matches, the ASOF `>=` contract).
  * Spark evaluates the growing frame incrementally, so the pass is O(n) per
  * key after the sort.
  *
  * 100 TB posture: one hash shuffle on the key — the same cost as any
  * per-series window in this engine; no range join, no broadcast of a
  * time-expanded right side, no per-row binary search structure to build.
  * Each key's merged series sorts within its task, so skew is bounded by
  * the hottest single series (the invariant every series operator here
  * already lives with).
  */
object AsofJoin {

  /** Left-outer as-of join. Output = every `left` row with its columns
    * unchanged, plus each non-key `right` column as `<rightPrefix><name>`
    * (null when no prior right row exists, or none within `tolerance`).
    *
    * @param tolerance  max allowed `left.ts - right.ts` as a SQL interval
    *                   string (e.g. "2 hours"); None = unbounded lookback.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightPrefix: String = "right_",
      tolerance: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val rStruct = right.select(rightPayload.map(col): _*).schema
    val lStruct = left.select(leftCols.map(col): _*).schema

    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rStruct).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lStruct).as("__l"),
        struct(rightPayload.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // tolerance: a match older than the window is no match at all
    val inWindow: Column = tolerance match {
      case None      => col("__m").isNotNull
      case Some(tol) => col("__m").isNotNull &&
        col("__ts") <= col("__m").getField(tsCol) + expr(s"INTERVAL $tol") &&
        col("__ts") >= col("__m").getField(tsCol)
    }
    val rightOut = rightPayload.map(f =>
      when(inWindow, col("__m").getField(f)).as(rightPrefix + f))
    merged.select(leftCols.map(f => col("__l").getField(f).as(f)) ++ rightOut: _*)
  }
}
