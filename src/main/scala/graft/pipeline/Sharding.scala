package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + size-balanced shard export — the final
  * stage of a training-data pipeline: the cleaned corpus is given one
  * reproducible global order (a keyed shuffle, so "epoch 0 order" is a
  * pure function of the salt, not of cluster scheduling) and cut into
  * equal-size shards the trainer streams.
  *
  * The global rank is a prefix count over a total order, computed with the
  * same distributed two-phase scan as [[Packing]]: an unpartitioned
  * `row_number()` would serialize 100 TB through one reducer, so instead
  * range-repartition on the shuffle key (partition p holds a contiguous
  * key span), collect per-partition row counts (O(partitions), independent
  * of corpus size), and add each partition's exclusive base to a fully
  * parallel per-partition window rank.
  *
  * Shards are CONTIGUOUS RANK BLOCKS (`shard = seq * n / N`), not hash
  * buckets: block assignment makes every shard's size exact (±1 doc) where
  * modulo hashing only balances in expectation, and it keeps each shard a
  * contiguous range of the shuffled order — a shard is a reproducible
  * sample of the corpus, and writing it touches one partition's span.
  */
object Sharding {

  /** Global 0-based rank (`seq`) over an arbitrary TOTAL order — the
    * distributed two-phase scan shared by shuffle and curriculum
    * ordering: range-repartition on the sort key (partition p holds a
    * contiguous key span), collect O(partitions) row counts, add each
    * partition's exclusive base to a fully parallel per-partition window
    * rank. `sortCols` must totally order the rows (append an id
    * tiebreaker); the caller drops its own key columns afterwards. */
  private def globalRank(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      // pin phase 1's range boundaries so phase 2 sees identical partitions
      .localCheckpoint()
    val counts = keyed.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = counts.map(_._1)
      .zip(counts.scanLeft(0L) { case (acc, (_, c)) => acc + c })
      .toSeq.toDF("__pid", "__base")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    keyed
      .join(broadcast(bases), "__pid")
      .withColumn("seq", col("__base") + row_number().over(w).cast("long") - 1)
      .drop("__pid", "__base")
  }

  /** Public total-order rank: adds `seq` (0-based global rank over
    * `sortCols`, which must totally order the rows) via the two-phase
    * scan — the building block quantile/segment assignment reuses
    * (ntile-by-formula over `seq` instead of a single-partition window). */
  def ranked(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    globalRank(df, sortCols)

  /** The corpus in its deterministic shuffle order: adds `seq` (0-based
    * global rank by md5(salt, id) — uniform, collision-free over distinct
    * ids, and engine-portable) while keeping every input column. */
  def shuffled(df: DataFrame, idCol: String, salt: String): DataFrame =
    globalRank(
      df.withColumn("__key", md5(concat(lit(salt), col(idCol).cast("string")))),
      Seq(col("__key")))
      .drop("__key")

  /** Source-interleaved training order: each source is md5-shuffled
    * independently, then the streams are round-robin woven —
    * `interleave_seq = within_source_rank * n_sources + source_index` —
    * so any contiguous slice of the order carries every source at its
    * natural cadence (a plain [[shuffled]] gives uniform mixing only in
    * expectation; interleaving bounds the gap between consecutive docs of
    * one source, the property curriculum-sensitive trainers ask for).
    * The key is a total order, not dense: once a source exhausts, its
    * residues simply stop occurring.
    *
    * Scale shape: ONE two-phase global rank over (source, key) — source
    * blocks are contiguous in that order, so the within-source rank is
    * `seq - min(seq) per source`, recovered with an O(sources) driver
    * pass that also assigns the source index. No per-source window
    * partitions (a 100 TB source would serialize into one task), no
    * second shuffle.
    *
    * `sourceCol` must be a non-null STRING column; source indices follow
    * UTF-8 BYTE order (SQL binary collation), not Java's UTF-16 order —
    * the two disagree on supplementary-plane names, and an engine
    * replaying the weave sorts bytes. */
  def interleaved(df: DataFrame, idCol: String, sourceCol: String,
      salt: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = globalRank(
      df.withColumn("__key", md5(concat(lit(salt), col(idCol).cast("string")))),
      Seq(col(sourceCol), col("__key"), col(idCol)))
    val utf8 = Ordering.Implicits.seqOrdering[Seq, Int]
    val bases = ranked.groupBy(sourceCol).agg(min("seq").as("__base"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1.getBytes("UTF-8").map(_ & 0xff).toSeq)(utf8)
    val nSources = bases.length.toLong
    val idx = bases.zipWithIndex
      .map { case ((src, base), i) => (src, base, i.toLong) }
      .toSeq.toDF(sourceCol, "__base", "__idx")
    ranked.join(broadcast(idx), sourceCol)
      .withColumn("interleave_seq",
        (col("seq") - col("__base")) * nSources + col("__idx"))
      .drop("__key", "seq", "__base", "__idx")
  }

  /** The corpus in CURRICULUM order: `seq` ranks by (difficulty asc, id)
    * and `shard` cuts contiguous rank blocks — shard 0 holds the easiest
    * documents, the last shard the hardest, each exactly balanced (±1).
    * A trainer schedules shards in order (curriculum learning: present
    * easy examples first) and still gets the manifest/packing machinery,
    * which only reads `seq`/`shard`. Same two-phase scan as [[shuffled]]
    * — no global single-reducer sort at any size. */
  def curriculum(
      df: DataFrame, idCol: String, difficulty: org.apache.spark.sql.Column,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val s = globalRank(df.withColumn("__d", difficulty),
      Seq(col("__d"), col(idCol))).drop("__d")
    val n = Option(s.agg(max("seq")).head.get(0))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(1L)
    s.withColumn("shard", expr(s"(seq * $nShards) div ${n}L").cast("int"))
  }

  /** [[shuffled]] plus the block-balanced `shard` column
    * (`shard = seq * nShards / N`, integer division). N comes from a
    * 1-row max(seq) agg over the checkpointed rank frame — no second
    * scan of the data columns, no per-row window. */
  def assign(df: DataFrame, idCol: String, salt: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val s = shuffled(df, idCol, salt)
    val n = Option(s.agg(max("seq")).head.get(0))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(1L)
    // integral division (Column./ is double division — a float quotient
    // here could mis-assign the block boundary docs at 100 TB rank scale)
    s.withColumn("shard", expr(s"(seq * $nShards) div ${n}L").cast("int"))
  }

  /** Per-shard release manifest: doc count, token total, rank span —
    * the exact-size audit a trainer checks before an epoch. */
  def manifest(
      df: DataFrame, idCol: String, textCol: String, salt: String,
      nShards: Int): DataFrame =
    assign(df, idCol, salt, nShards)
      .withColumn("__t", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("total_tokens"),
        min("seq").as("min_seq"), max("seq").as("max_seq"))

  /** Pack each shard independently into fixed-length token sequences —
    * the trainer-input layout: documents in shuffle order within their
    * shard, laid end-to-end, cut every `seqLen` tokens. Returns per doc:
    * shard, its rank, token count, the token offset WITHIN its shard, and
    * the (shard-local) sequence id/position its first token lands in.
    *
    * Parallelism note: the running token offset is a window per shard —
    * sequential within a shard, parallel across shards. That is the right
    * grain, not a bottleneck: shards are the trainer's own parallel unit
    * and block assignment keeps every shard the same bounded size, so at
    * 100 TB the work is nShards equal windows (pick nShards accordingly),
    * never one global scan. */
  def packShards(
      df: DataFrame, idCol: String, textCol: String, salt: String,
      nShards: Int, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy("shard").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assign(df, idCol, salt, nShards)
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("shard_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("shard"), col(idCol), col("seq"), col("n_tokens"),
        col("shard_offset"),
        floor(col("shard_offset") / seqLen).cast("long").as("seq_id"),
        pmod(col("shard_offset"), lit(seqLen.toLong)).as("seq_pos"))
  }

  /** Write the sharded corpus: one parquet file per shard (each shard is
    * repartitioned to a single writer task — shard size is the file size),
    * directory-partitioned so a trainer reads `shard=K/` directly. */
  def write(
      df: DataFrame, idCol: String, salt: String, nShards: Int,
      outDir: String): Unit =
    assign(df, idCol, salt, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("seq")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)

  /** Surgical tombstone rewrite — the right-to-be-forgotten / takedown
    * primitive: remove a (small) id list from an already-released sharded
    * corpus WITHOUT touching the unaffected shards. At 100 TB deleting a
    * few hundred documents must cost O(affected shards), not a corpus
    * rewrite — the Iceberg/Delta partition-overwrite pattern on plain
    * parquet dirs:
    *
    *   1. broadcast the tombstone ids into a semi-join over the shard
    *      store to learn WHICH shard partitions contain them (the scan
    *      reads only the id column);
    *   2. re-read just those partitions (partition-pruned by `shard=K`),
    *      anti-join the tombstones, and stage the survivors
    *      (localCheckpoint pins only affected-shard rows);
    *   3. overwrite only those partition dirs (dynamic partition
    *      overwrite), leaving every clean shard's files byte-identical.
    *
    * Returns the rewrite audit derived from the ACTUAL staged data (not a
    * re-derived assignment): per affected shard, docs removed + remaining. */
  def deleteRewrite(
      spark: org.apache.spark.sql.SparkSession, shardDir: String,
      idCol: String, tombstones: DataFrame): DataFrame = {
    import spark.implicits._
    val corpus = spark.read.parquet(shardDir)
    val tomb = tombstones.select(col(idCol)).distinct()
    val affected = corpus.join(broadcast(tomb), Seq(idCol), "left_semi")
      .select("shard").distinct()
      .collect().map(_.getInt(0)).sorted // bounded by |tombstones|
    if (affected.isEmpty)
      return Seq.empty[(Int, Long, Long)]
        .toDF("shard", "docs_removed", "docs_remaining")
    val hit = corpus.filter(col("shard").isin(affected.map(Int.box): _*))
      .join(broadcast(tomb.withColumn("__dead", lit(true))), Seq(idCol), "left")
      .withColumn("__dead", coalesce(col("__dead"), lit(false)))
      .localCheckpoint() // staged: source files are about to be replaced
    val audit = hit.groupBy("shard").agg(
        sum(when(col("__dead"), 1L).otherwise(0L)).as("docs_removed"),
        sum(when(col("__dead"), 0L).otherwise(1L)).as("docs_remaining"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val writer = hit.filter(!col("__dead")).drop("__dead")
      .repartition(affected.length, col("shard"))
      .sortWithinPartitions("seq")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try writer.write.mode(SaveMode.Overwrite).partitionBy("shard")
      .parquet(shardDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // a shard whose every doc was tombstoned writes no partition at all
    // under dynamic overwrite — its stale dir must be dropped explicitly
    val emptied = audit.filter(_._3 == 0L).map(_._1)
    if (emptied.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(shardDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { k =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$shardDir/shard=$k"), true)
      }
    }
    audit.toSeq.toDF("shard", "docs_removed", "docs_remaining")
  }
}
