package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the shuffle-elimination layout for repeated
  * large-×-large joins (the 100 TB fact-fact case where neither side
  * broadcasts and a per-query shuffle of both sides dominates the plan).
  *
  * Both sides are persisted as Spark bucketed tables (`bucketBy` +
  * `sortBy` on the join key). A subsequent equi-join on the bucket key
  * reads both sides already hash-partitioned, so the sort-merge join runs
  * with NO exchange on either side — `PlansSpec` asserts exactly that.
  * (A local per-bucket sort remains: since SPARK-28632 Spark only trusts
  * sortBy file order for single-file buckets; sorting the already-sorted
  * bucket runs is near-free next to the shuffle it replaces.) On a
  * cluster this is the difference between shuffling the fact table once
  * per query and never: layout cost is paid once at write time, every
  * downstream join rides it free.
  */
object Colocate {

  /** Persist `df` as a parquet bucketed catalog table (overwriting any
    * previous layout — fixture regeneration must never serve stale rows). */
  def writeBucketed(
      df: DataFrame, name: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    // The warehouse DIRECTORY outlives the (in-memory) session catalog: a
    // fresh session that re-creates the table would hit
    // LOCATION_ALREADY_EXISTS on the orphaned path, so clear it explicitly.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    // distribute by the bucket key BEFORE the bucketed write (guide §6 —
    // the write.distribution-mode=hash shape): repartition(buckets, key)
    // is the same murmur3 HashPartitioning the bucket spec uses, so each
    // task holds exactly one bucket and the sort+write runs buckets-wide
    // parallel instead of every input task writing (and sorting) a file
    // for every bucket. Same rows per bucket file either way — the
    // bucket id is assigned by the bucket spec at write time.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name) // managed table under spark.sql.warehouse.dir
  }

  /** Write both sides bucketed on the join key and return their equi-join.
    * With matching bucket counts Spark plans a sort-merge join with zero
    * exchanges and zero sorts (bucketed scan provides both guarantees). */
  def bucketedEquiJoin(
      spark: SparkSession,
      left: DataFrame, leftName: String,
      right: DataFrame, rightName: String,
      key: String, buckets: Int = 8): DataFrame = {
    writeBucketed(left, leftName, key, buckets)
    writeBucketed(right, rightName, key, buckets)
    spark.table(leftName).join(spark.table(rightName), key)
  }
}
