package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbor — the second classic
  * scale path next to LSH ([[Similarity.lshTopK]]): spherical k-means
  * partitions the corpus into `nlist` buckets; a query probes only the
  * `nprobe` buckets whose centroids are nearest, then exact-cosine re-ranks
  * inside them. Cost per query drops from N to ~N·nprobe/nlist.
  *
  * 100 TB posture: training iterations are each ONE distributed pass
  * (assign = map with broadcast-size centroids riding in the expression;
  * re-estimate = posexplode + groupBy(cluster, dim) average — a keyed
  * shuffle of nlist×dim partial sums, not vectors); only the centroid
  * matrix (nlist×dim doubles) ever reaches the driver. Probing filters on a
  * small IN list, so the scan prunes to candidate buckets; with the
  * assignment written as a partition column the probe becomes directory
  * pruning.
  */
object Ivf {

  /** Train spherical k-means centroids (normalized; cosine ≡ dot). Returns
    * the normalized centroid matrix. Deterministic: seeded hash-ordered
    * init, fixed iteration count. */
  def train(
      embDf: DataFrame, idCol: String, embCol: String,
      nlist: Int, iters: Int = 2, seed: Long = 42L): Array[Array[Double]] = {
    val init = embDf
      .select(col(embCol), xxhash64(col(idCol), lit(seed)).as("__h"))
      .orderBy("__h").limit(nlist)
      .collect().map(r => normalize(toDoubles(r.getSeq[Any](0))))
    var centroids = init
    var it = 0
    while (it < iters) {
      val sums = embDf
        .withColumn("__c", assignColumn(col(embCol), centroids))
        .select(col("__c"), posexplode(col(embCol)).as(Seq("__p", "__x")))
        .groupBy("__c", "__p").agg(sum(col("__x").cast("double")).as("s"))
        .collect()
      val dim = centroids(0).length
      val acc = Array.fill(centroids.length)(new Array[Double](dim))
      val seen = Array.fill(centroids.length)(false)
      sums.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        acc(c)(p) = r.getDouble(2); seen(c) = true
      }
      // empty clusters keep their previous centroid (standard Lloyd's)
      centroids = centroids.indices.map { c =>
        if (seen(c)) normalize(acc(c)) else centroids(c)
      }.toArray
      it += 1
    }
    centroids
  }

  /** Cluster-id column for the trained centroids. */
  def assignColumn(emb: Column, centroids: Array[Array[Double]]): Column =
    GraftBridge.col(NearestCentroid(GraftBridge.expr(emb), centroids))

  /** ANN top-k against a PRE-TRAINED index: probe the `nprobe` nearest
    * buckets, exact re-rank inside. This is the per-query path — train
    * once with [[train]] (and persist the assignment column, ideally as a
    * partition column so probing becomes directory pruning), then answer
    * many queries against the same centroid matrix. */
  def ivfTopKWith(
      embDf: DataFrame, idCol: String, embCol: String,
      centroids: Array[Array[Double]],
      query: Array[Double], k: Int, nprobe: Int = 4): DataFrame = {
    val qn = normalize(query)
    val probes = centroids.zipWithIndex
      .map { case (c, i) => (i, dot(qn, c)) }
      .sortBy(-_._2).take(nprobe).map(_._1)
    embDf
      .withColumn("__c", assignColumn(col(embCol), centroids))
      .filter(col("__c").isin(probes.map(Integer.valueOf): _*))
      .select(col(idCol),
        round(Similarity.cosineToQuery(col(embCol), query), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Convenience single-shot: train + probe. For repeated queries use
    * [[train]] + [[ivfTopKWith]] — retraining per lookup costs full corpus
    * passes. */
  def ivfTopK(
      embDf: DataFrame, idCol: String, embCol: String,
      query: Array[Double], k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
      seed: Long = 42L): DataFrame =
    ivfTopKWith(embDf, idCol, embCol,
      train(embDf, idCol, embCol, nlist, iters, seed), query, k, nprobe)

  /** Probe-width tuning report: recall@k against the exact (brute-force)
    * answer and the fraction of the corpus an IVF probe actually scans,
    * for each candidate `nprobe` — the recall/cost curve every ANN
    * deployment sweeps before fixing its operating point (FAISS's
    * standard nprobe tuning loop, run as Spark jobs).
    *
    * Cost: one training pass, ONE brute-force top-k (the ground truth),
    * one cluster-histogram aggregate (reused across all probe widths),
    * then one bucket-pruned top-k per candidate width. Driver state is
    * bounded: k truth ids + nlist histogram rows + k ids per width.
    *
    * Output per width (all integers, deterministic given the seeded
    * trainer): nprobe, recall_bp (recall@k in basis points — 10000 at
    * nprobe = nlist by construction), scanned_rows, scanned_bp (fraction
    * of corpus rows the probe touches). */
  def probeSweep(
      embDf: DataFrame, idCol: String, embCol: String,
      query: Array[Double], k: Int, nlist: Int, nprobes: Seq[Int],
      iters: Int = 2, seed: Long = 42L): DataFrame = {
    val spark = embDf.sparkSession
    import spark.implicits._
    val centroids = train(embDf, idCol, embCol, nlist, iters, seed)
    val truth = Similarity.bruteForceTopK(embDf, idCol, embCol, query, k)
      .select(col(idCol)).collect().map(_.get(0)).toSet
    val assigned = embDf
      .withColumn("__c", assignColumn(col(embCol), centroids))
    val hist = assigned.groupBy("__c").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Number](0).intValue -> r.getLong(1)).toMap
    val total = hist.values.sum
    val qn = normalize(query)
    val order = centroids.zipWithIndex
      .map { case (c, i) => (i, dot(qn, c)) }.sortBy(-_._2).map(_._1)
    val rows = nprobes.sorted.map { np =>
      val got = ivfTopKWith(embDf, idCol, embCol, centroids, query, k, np)
        .select(col(idCol)).collect().map(_.get(0)).toSet
      val scanned = order.take(np).map(c => hist.getOrElse(c, 0L)).sum
      (np, got.intersect(truth).size.toLong * 10000 / k,
        scanned, scanned * 10000 / math.max(total, 1L))
    }
    rows.toDF("nprobe", "recall_bp", "scanned_rows", "scanned_bp")
  }

  // ---- generation-manifest index layout ------------------------------
  //   <path>/MANIFEST          one line: name of the live generation dir
  //   <path>/gen_<n>/data      corpus partitioned by __ivf
  //   <path>/gen_<n>/centroids centroid matrix trained WITH that data
  // Data and centroids are only ever swapped TOGETHER: a rebuild writes a
  // complete new generation, atomically repoints MANIFEST, and deletes the
  // old generation last — a reader that resolved the manifest keeps a
  // complete self-consistent pair, and a crash at any point leaves the
  // manifest on a complete generation (orphan gen dirs are pruned by the
  // next successful publish). Mixed centroids/data cannot be observed.

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Directory of the live generation (resolve ONCE per operation and use
    * the result for every component read, so a concurrent rebuild can't
    * split a reader across generations). */
  def currentGenDir(
      spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val fs = hadoopFs(spark, path)
    val mp = new org.apache.hadoop.fs.Path(s"$path/MANIFEST")
    if (!fs.exists(mp)) path // pre-manifest flat layout
    else {
      val in = fs.open(mp)
      val gen = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      s"$path/$gen"
    }
  }

  /** The live generation's data directory (tests/tools peek here). */
  def dataDir(spark: org.apache.spark.sql.SparkSession, path: String): String =
    s"${currentGenDir(spark, path)}/data"

  private def genNumber(genDir: String): Int = {
    val name = genDir.substring(genDir.lastIndexOf('/') + 1)
    if (name.startsWith("gen_")) name.drop(4).toInt else 0
  }

  /** Atomically repoint MANIFEST (tmp file + rename-with-overwrite). */
  private def publishGen(
      spark: org.apache.spark.sql.SparkSession, path: String,
      gen: String): Unit = {
    val fs = hadoopFs(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/MANIFEST.tmp")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(s"$path/MANIFEST"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Delete every gen_* dir except the live one (old generations after a
    * successful swap, partial rebuilds a crash left behind). */
  private def pruneOldGens(
      spark: org.apache.spark.sql.SparkSession, path: String,
      keep: String): Unit = {
    val fs = hadoopFs(spark, path)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen_") &&
        s"$path/${s.getPath.getName}" != keep)
      .foreach(s => fs.delete(s.getPath, true))
  }

  private def writeGeneration(
      embDf: DataFrame, embCol: String, genDir: String,
      centroids: Array[Array[Double]]): Unit = {
    val spark = embDf.sparkSession
    import spark.implicits._
    embDf
      .withColumn("__ivf", assignColumn(col(embCol), centroids))
      // cluster-repartition BEFORE the partitioned write (guide §6): a
      // dynamic-partition write from an N-partition frame opens up to
      // N × nlist parquet writers (measured 6.5 s vs 1.0 s at 32
      // partitions × 16 clusters — a 512-tiny-file generation); hashing
      // by __ivf first gives one file per inverted list per write
      .repartition(col("__ivf"))
      .write.mode("overwrite").partitionBy("__ivf")
      .parquet(s"$genDir/data")
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "weights")
      .coalesce(1).write.mode("overwrite").parquet(s"$genDir/centroids")
  }

  /** Persist an IVF index: the corpus written PARTITIONED BY cluster id
    * (one directory per inverted list) plus the centroid matrix. This is
    * the "assignment as a partition column" deployment the probe path is
    * designed for: filtering on cluster ids becomes directory pruning, so
    * a probe reads nprobe/nlist of the data from disk — the IVF promise
    * delivered by the storage layout instead of an in-memory index.
    * Written as a new generation and published atomically (see layout
    * note above), so rebuilding over a live index is safe. */
  def buildIndex(
      embDf: DataFrame, idCol: String, embCol: String, path: String,
      nlist: Int, iters: Int = 2, seed: Long = 42L): Unit = {
    val spark = embDf.sparkSession
    val centroids = train(embDf, idCol, embCol, nlist, iters, seed)
    val fs = hadoopFs(spark, path)
    val cur = currentGenDir(spark, path)
    val gen = s"gen_${genNumber(cur) + 1}"
    writeGeneration(embDf, embCol, s"$path/$gen", centroids)
    publishGen(spark, path, gen)
    pruneOldGens(spark, path, s"$path/$gen")
    // pre-manifest flat components, if rebuilding over a legacy index
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/data"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/centroids"), true)
  }

  /** The persisted index's centroid matrix (cluster-ordered). */
  def readCentroids(
      spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Double]] =
    readCentroidsIn(spark, currentGenDir(spark, path))

  private def readCentroidsIn(
      spark: org.apache.spark.sql.SparkSession, genDir: String): Array[Array[Double]] =
    spark.read.parquet(s"$genDir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)

  /** Incremental index maintenance, FAISS `add` semantics: assign a NEW
    * vector batch to the EXISTING centroids (one map pass, centroid matrix
    * riding in the expression) and append into the per-cluster directories.
    * Per-batch cost is O(|batch|·nlist·dim) — independent of index size,
    * no retrain, no rewrite of resident data — and probes see the union
    * immediately (new files join their cluster's directory). Centroids are
    * frozen, exactly like FAISS `IndexIVF.add`: growth never re-trains.
    * When [[indexBalance]] shows drift (skewing clusters / falling member
    * cosine), rebuild with [[buildIndex]] — the rebalance is a rewrite by
    * design, not a side effect of ingestion. */
  def appendToIndex(
      embDf: DataFrame, idCol: String, embCol: String, path: String): Unit = {
    val gen = currentGenDir(embDf.sparkSession, path)
    val centroids = readCentroidsIn(embDf.sparkSession, gen)
    embDf
      .withColumn("__ivf", assignColumn(col(embCol), centroids))
      .repartition(col("__ivf")) // one file per touched list (see writeGeneration)
      .write.mode("append").partitionBy("__ivf")
      .parquet(s"$gen/data")
  }

  /** Index health report: per-cluster member count and mean cosine of
    * members to their centroid (quantization quality). One scan joined to
    * the broadcast centroid table; the native [[graft.functions.DotProduct]]
    * kernel scores members (centroids are unit-norm, so cosine =
    * dot / ||member||). Falling `mean_cosine` or ballooning `n` on a few
    * clusters is the rebuild signal for [[appendToIndex]] workloads. */
  def indexBalance(
      spark: org.apache.spark.sql.SparkSession, path: String,
      embCol: String): DataFrame = {
    import graft.functions.DotProduct
    val gen = currentGenDir(spark, path)
    val cents = spark.read.parquet(s"$gen/centroids")
      .withColumnRenamed("cluster", "__ivf")
    spark.read.parquet(s"$gen/data")
      .join(broadcast(cents), "__ivf")
      .select(col("__ivf").as("cluster"),
        (DotProduct(col(embCol), col("weights")) /
          sqrt(DotProduct(col(embCol), col(embCol)))).as("__cos"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), round(avg("__cos"), 4).as("mean_cosine"))
  }

  /** Rebuild a drifted index in place: retrain centroids on the CURRENT
    * contents (append workloads assign new vectors to stale centroids —
    * [[indexBalance]] is the signal), re-partition the data by the new
    * assignment, and publish it as a new generation via the MANIFEST
    * swap (see layout note above): write the complete gen dir, repoint
    * the manifest atomically, delete the old generation last.
    *
    * Returns the one-row report a maintenance log wants: cluster count,
    * row count (must be preserved), the straggler factor (max/mean member
    * count, ×100), and the QUANTIZATION quality (member-weighted mean
    * cosine to own centroid, ×10⁴) before and after — quality is what a
    * retrain on the full contents actually optimizes (the k-means
    * objective); the straggler factor is operational context, not a
    * guarantee (k-means does not balance counts). */
  def rebalanceIndex(
      spark: org.apache.spark.sql.SparkSession, path: String, idCol: String,
      embCol: String, nlist: Int, iters: Int = 2, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    // ONE [[indexBalance]] scan per side yields BOTH report families:
    // straggler factor (from the per-cluster counts) and member-weighted
    // quantization quality (from mean_cosine) — the previous shape ran a
    // separate groupBy scan for each, doubling the report's full passes
    // over the index (guide §1.2: remove passes before tuning them).
    def report(): (Long, Long, Long) = {
      val rows = indexBalance(spark, path, embCol)
        .select(col("n"), col("mean_cosine")).collect()
      val counts = rows.map(_.getLong(0))
      val n = counts.sum
      val skew = if (counts.isEmpty) 0L
        else counts.max * 100L * counts.length / n
      val qual = if (n == 0) 0L
        else math.round(rows.map(r => r.getLong(0) * r.getDouble(1)).sum / n * 10000)
      (n, skew, qual)
    }
    val curGen = currentGenDir(spark, path)
    val before = spark.read.parquet(s"$curGen/data")
    val (_, skewBefore, qualBefore) = report()
    // rows-preserved invariant measured on the RAW index rows (parquet
    // metadata count, no data scan): indexBalance inner-joins data to
    // centroids, so a missing/corrupt centroid row would silently drop
    // that cluster's members from BOTH sides of the conservation check
    val rowsBefore = before.count()
    val data = before.drop("__ivf").localCheckpoint() // source dirs go away below
    val centroids = train(data, idCol, embCol, nlist, iters, seed)
    // write the COMPLETE next generation (data + matching centroids),
    // atomically repoint the manifest, delete the old generation last:
    // a crash anywhere leaves the manifest on a complete generation and
    // readers can never pair new data with old centroids
    val nextGen = s"gen_${genNumber(curGen) + 1}"
    writeGeneration(data, embCol, s"$path/$nextGen", centroids)
    publishGen(spark, path, nextGen)
    pruneOldGens(spark, path, s"$path/$nextGen")
    val fs = hadoopFs(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/data"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/centroids"), true)
    val (_, skewAfter, qualAfter) = report()
    val rowsAfter =
      spark.read.parquet(s"${currentGenDir(spark, path)}/data").count()
    require(rowsAfter == rowsBefore,
      s"rebalance lost rows: $rowsBefore -> $rowsAfter")
    Seq((nlist, rowsAfter, skewBefore, skewAfter, qualBefore, qualAfter))
      .toDF("nlist", "n_rows", "skew_before_x100", "skew_after_x100",
        "mean_cos_before_bp", "mean_cos_after_bp")
  }

  /** Top-k cosine against a persisted index: reads ONLY the nprobe nearest
    * cluster directories (partition pruning — assert `PartitionFilters`
    * carries `__ivf`), exact re-rank inside. */
  def probeIndex(
      spark: org.apache.spark.sql.SparkSession, path: String, idCol: String,
      embCol: String, query: Array[Double], k: Int,
      nprobe: Int = 4): DataFrame = {
    val gen = currentGenDir(spark, path)
    val centroids = readCentroidsIn(spark, gen)
    val qn = normalize(query)
    val probes = centroids.zipWithIndex
      .map { case (c, i) => (i, dot(qn, c)) }
      .sortBy(-_._2).take(nprobe).map(_._1)
    spark.read.parquet(s"$gen/data")
      .filter(col("__ivf").isin(probes.map(Integer.valueOf): _*))
      .select(col(idCol),
        round(Similarity.cosineToQuery(col(embCol), query), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Filtered (metadata-constrained) probe with adaptive widening — the
    * classic filtered-ANN failure is a selective predicate emptying the
    * probed buckets (recall collapses silently); here each round scans
    * the next-nearest cluster directories, applies the filter BEFORE
    * scoring, and the probe set doubles until k survivors exist or every
    * bucket was read (where it degenerates to exact filtered search —
    * the correctness floor). Each round is one small pruned-scan job;
    * rounds are bounded by log2(nlist), so the worst case reads the
    * filtered table once, never more. */
  def probeIndexFiltered(
      spark: org.apache.spark.sql.SparkSession, path: String, idCol: String,
      embCol: String, query: Array[Double], k: Int,
      filter: org.apache.spark.sql.Column, nprobe: Int = 4): DataFrame = {
    val gen = currentGenDir(spark, path)
    val centroids = readCentroidsIn(spark, gen)
    val qn = normalize(query)
    val ranked = centroids.zipWithIndex
      .map { case (c, i) => (i, dot(qn, c)) }
      .sortBy(-_._2).map(_._1)
    var probe = math.min(math.max(nprobe, 1), ranked.length)
    def scan(n: Int): DataFrame =
      spark.read.parquet(s"$gen/data")
        .filter(col("__ivf").isin(ranked.take(n).map(Integer.valueOf): _*))
        .filter(filter)
        .select(col(idCol),
          round(Similarity.cosineToQuery(col(embCol), query), 4).as("cosine"))
    var candidates = scan(probe)
    while (candidates.count() < k && probe < ranked.length) {
      probe = math.min(probe * 2, ranked.length)
      candidates = scan(probe)
    }
    candidates.orderBy(col("cosine").desc, col(idCol)).limit(k)
  }

  private[pipeline] def toDoubles(xs: Seq[Any]): Array[Double] =
    xs.map {
      case f: Float  => f.toDouble
      case d: Double => d
      case i: Int    => i.toDouble
      case l: Long   => l.toDouble
      case other => throw new IllegalArgumentException(s"bad element $other")
    }.toArray

  private[pipeline] def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private[pipeline] def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v))
    if (n == 0) v else v.map(_ / n)
  }
}

/** array<numeric> → int id of the max-cosine centroid. The centroid matrix
  * rides in the expression (serialized with the plan — nlist×dim doubles,
  * broadcast-sized). Interpreted eval: index build / probe path, not a
  * per-row hot query loop. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val elemType = child.dataType.asInstanceOf[ArrayType].elementType
    val v = new Array[Double](arr.numElements())
    var i = 0
    while (i < v.length) {
      v(i) = elemType match {
        case FloatType   => arr.getFloat(i).toDouble
        case DoubleType  => arr.getDouble(i)
        case IntegerType => arr.getInt(i).toDouble
        case LongType    => arr.getLong(i).toDouble
        case other => throw new IllegalStateException(s"bad embedding element $other")
      }
      i += 1
    }
    // centroids are normalized and v's norm is constant across candidates,
    // so argmax of the raw dot product == argmax cosine
    var best = 0; var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val d = Ivf.dot(v, centroids(c))
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
