package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Exact chunked evaluation of a sequential TA recurrence over ONE global
  * (untagged) series — the de-serialization of InfluxQL's former
  * `repartition(1)` path for tagless statements.
  *
  * The recurrence itself is inherently serial, but nothing else needs to
  * be. Same shape as the two-phase prefix scan used by the packing /
  * sharding operators:
  *
  *   - the SORT is a parallel range-partitioned sort into P time-ordered
  *     chunks (each chunk sorts and spills independently — no single task
  *     ever sorts or holds the full series);
  *   - phase A walks the chunks in order as P one-task jobs, threading the
  *     kernel STATE object (a few doubles) through the driver: O(P) driver
  *     state, O(chunk) per job — this pins the exact entry state of every
  *     chunk;
  *   - phase B is ONE parallel job: every chunk restores its entry state
  *     and emits its output rows concurrently.
  *
  * Bit-exactness: phases A+B execute the identical sequence of double
  * operations as the serial walk (state hand-off is Java serialization of
  * the kernel's own fields, no arithmetic), so oracle-replayed recurrences
  * stay bit-green. Total CPU is 2× the serial walk (A feeds, B emits), in
  * exchange for a parallel sort, O(1) task memory, and a parallel output
  * pass — the trade that matters once the series outgrows one task.
  */
object TaChunked {

  private def ser(s: TaStream.State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(s); oos.close()
    bos.toByteArray
  }

  private def deser(b: Array[Byte]): TaStream.State = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[TaStream.State] finally ois.close()
  }

  /** The staged input: a parallel range-sort of (timeCol, vCol) into
    * `chunks` time-ordered partitions, pinned so phases A and B see the
    * same rows. Package-visible so specs can assert the multi-task shape. */
  private[graft] def stageSorted(
      projected: DataFrame, timeCol: String, vCol: String,
      chunks: Int): DataFrame = {
    val spark = projected.sparkSession
    val n = if (chunks > 0) chunks
            else spark.sessionState.conf.numShufflePartitions
    projected
      .repartitionByRange(n, col(timeCol), col(vCol))
      .sortWithinPartitions(col(timeCol), col(vCol))
      .localCheckpoint()
  }

  /** Run the kernel over the global series. `projected` must be exactly
    * (timeCol, vCol); output is (timeCol, outName) in time order. */
  def runGlobal(
      projected: DataFrame, timeCol: String, vCol: String,
      mk: () => TaStream.State, outName: String,
      chunks: Int = 0): DataFrame = {
    val spark = projected.sparkSession
    val sorted = stageSorted(projected, timeCol, vCol, chunks)
    val rdd = sorted.rdd
    val sc = spark.sparkContext
    val nParts = rdd.getNumPartitions
    // phase A: thread the state through the chunks in time order; each
    // iteration is one single-task job feeding one chunk into the kernel
    val entries = new Array[Array[Byte]](nParts)
    var state = ser(mk())
    for (p <- 0 until nParts) {
      entries(p) = state
      val cur = state // pin the closure capture for this job
      state = sc.runJob(rdd, (it: Iterator[Row]) => {
        val st = deser(cur)
        it.foreach(r => st.push(if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
        ser(st)
      }, Seq(p)).head
    }
    // phase B: every chunk replays from its exact entry state in parallel
    val bc = sc.broadcast(entries)
    val outSchema = StructType(Seq(
      sorted.schema.fields.head, StructField(outName, DoubleType)))
    val outRdd = rdd.mapPartitionsWithIndex { (p, it) =>
      val st = deser(bc.value(p))
      it.flatMap { r =>
        st.push(if (r.isNullAt(1)) 0.0 else r.getDouble(1))
          .map(o => Row(r.get(0), o))
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }

  private def serHw(s: TaStream.HoltWinters): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(s); oos.close()
    bos.toByteArray
  }

  private def deserHw(b: Array[Byte]): TaStream.HoltWinters = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[TaStream.HoltWinters] finally ois.close()
  }

  private def addUs(t: Any, us: Long): Any = t match {
    case ts: java.sql.Timestamp =>
      java.sql.Timestamp.from(ts.toInstant.plusNanos(us * 1000L))
    case inst: java.time.Instant => inst.plusNanos(us * 1000L)
    case other => throw new IllegalArgumentException(
      s"unsupported time type: ${other.getClass}")
  }

  /** Untagged holt_winters, same two-phase shape as [[runGlobal]]: the
    * in-sample fits replay per chunk in parallel (phase B, `withFit`
    * only); the forecasts need just the TERMINAL state, which phase A
    * already left on the driver — they're built driver-side (O(nFc)
    * rows) and unioned in. */
  def runGlobalHoltWinters(
      projected: DataFrame, timeCol: String, vCol: String,
      season: Int, nFc: Int, withFit: Boolean, stepUs: Long,
      outName: String, chunks: Int = 0): DataFrame = {
    val spark = projected.sparkSession
    val sorted = stageSorted(projected, timeCol, vCol, chunks)
    val rdd = sorted.rdd
    val sc = spark.sparkContext
    val nParts = rdd.getNumPartitions
    val entries = new Array[Array[Byte]](nParts)
    var state = serHw(new TaStream.HoltWinters(season))
    var lastT: Any = null
    for (p <- 0 until nParts) {
      entries(p) = state
      val cur = state
      val (fed, t) = sc.runJob(rdd, (it: Iterator[Row]) => {
        val st = deserHw(cur)
        var last: Any = null
        it.foreach { r =>
          st.push(if (r.isNullAt(1)) 0.0 else r.getDouble(1))
          last = r.get(0)
        }
        (serHw(st), last)
      }, Seq(p)).head
      state = fed
      if (t != null) lastT = t
    }
    val outSchema = StructType(Seq(
      sorted.schema.fields.head, StructField(outName, DoubleType)))
    val fits =
      if (!withFit) spark.createDataFrame(
        sc.emptyRDD[Row], outSchema)
      else {
        val bc = sc.broadcast(entries)
        spark.createDataFrame(rdd.mapPartitionsWithIndex { (p, it) =>
          val st = deserHw(bc.value(p))
          it.flatMap { r =>
            st.push(if (r.isNullAt(1)) 0.0 else r.getDouble(1))
              .map(f => Row(r.get(0), f))
          }
        }, outSchema)
      }
    val terminal = deserHw(state)
    val fc =
      if (terminal.points < 1 || lastT == null) Seq.empty[Row]
      else (1 to nFc).map(h =>
        Row(addUs(lastT, h * stepUs), terminal.forecast(h)))
    fits.union(spark.createDataFrame(
      sc.parallelize(fc, math.max(1, fc.size.min(4))), outSchema))
  }
}
