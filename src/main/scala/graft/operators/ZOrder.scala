package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on SEVERAL columns
  * at once so that file-level min/max statistics stay tight on every
  * clustered dimension, and a predicate on ANY of them prunes most files.
  *
  * A linear sort gives perfect pruning on its leading column and none on
  * the others; the space-filling curve trades a little locality on each
  * dimension for locality on all of them — the layout strategy behind
  * Delta Lake's OPTIMIZE ZORDER and ClickHouse/Databricks multi-dim
  * clustering, applied here to plain parquet directories.
  *
  * Mechanics: each clustering column is mapped to a `2^bits`-way RANK
  * bucket (boundaries from approxQuantile, so skewed value distributions
  * still fill all buckets — a linear min/max scale would collapse under
  * skew), the bucket bits are interleaved into one Morton key, and the
  * data is range-partitioned + sorted by that key. Every step is
  * codegen'd column arithmetic (a when-chain per bucket lookup, shifts
  * and ORs for the interleave); the only data movement is the one range
  * shuffle any re-clustering write must pay.
  *
  * 100 TB posture: approxQuantile is a driver-bounded sketch pass;
  * the range shuffle is the rewrite itself (you run this once per
  * ingest batch / compaction, amortized over every subsequent query);
  * downstream reads prune with ordinary parquet row-group stats — no
  * index structure to maintain. Reference analogue: HoraeDB clusters
  * SSTs by (tsid, time) only — a fixed two-level z-curve special case;
  * this generalizes the idea to arbitrary column sets.
  */
object ZOrder {

  /** Rank-bucket `c` into [0, 2^bits) by the given ascending boundaries
    * (length 2^bits − 1): the bucket index is the number of boundaries
    * strictly below the value. Nulls land in bucket 0 (they sort first in
    * parquet stats anyway). Codegen'd nested-CASE, no UDF. */
  private def bucketOf(c: Column, bounds: Array[Double]): Column =
    bounds.zipWithIndex.foldLeft(lit(0)) { case (acc, (b, i)) =>
      when(c.cast("double") > lit(b), lit(i + 1)).otherwise(acc)
    }

  /** Interleave the low `bits` bits of each bucket column into a Morton
    * key (column j contributes bit i to output bit `i*d + j`), unrolled
    * into static shift/mask arithmetic. d*bits must fit a long. */
  private def morton(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits * buckets.size <= 63,
      s"${buckets.size} cols x $bits bits exceeds a long")
    val d = buckets.size
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(
      shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `df` with a `__z` Morton-key column over `cols` (numeric or
    * timestamp), bucketed by rank with `2^bits` buckets per dimension.
    * Boundary estimation runs one approxQuantile sketch pass per call. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 4): DataFrame = {
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (n + 1)).toArray
    val asDouble = cols.map(c =>
      col(c).cast("double").as(s"__zd_$c"))
    val doubled = df.select(df.columns.map(df(_)) ++ asDouble: _*)
    val bounds = cols.map { c =>
      c -> doubled.stat.approxQuantile(s"__zd_$c", probs, 0.001)
    }
    val buckets = bounds.map { case (c, bs) => bucketOf(col(c), bs) }
    df.withColumn("__z", morton(buckets, bits))
  }

  /** Rewrite `df` into `nFiles` z-ordered parquet files under `outDir`:
    * range-partition on the Morton key (equal-size output files, the
    * curve's contiguous segments) and sort within each partition so
    * row-group stats are tight inside files too. */
  def write(df: DataFrame, cols: Seq[String], outDir: String,
      bits: Int = 4, nFiles: Int = 8): Unit =
    withZValue(df, cols, bits)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Layout quality probe: per-file (min, max) of `dim` in the files under
    * `dir`, plus the file's row count — the spans a reader's file-skip
    * decision sees. Used by specs and by operators judging whether a
    * table needs re-clustering. */
  def fileSpans(spark: org.apache.spark.sql.SparkSession, dir: String,
      dim: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(dim)).as("min_v"), max(col(dim)).as("max_v"),
        count(lit(1)).as("rows"))
}
