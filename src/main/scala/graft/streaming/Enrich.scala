package graft.streaming

import graft.engine.TsdbEngine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Stream-static enrichment: the most common production streaming join —
  * an event stream joined against a slowly-changing dimension (user tier,
  * device registry, tenant metadata) BEFORE landing in storage, so every
  * downstream read is already enriched.
  *
  * Unlike stream-stream joins this is STATELESS: the static side is
  * re-planned per micro-batch and broadcast, the join is map-side, no
  * watermark or state store is involved — it scales as a pure map over
  * the stream whatever the dimension's update cadence. Emissions append
  * distributed to an engine table (queryable mid-stream, compactable).
  */
object Enrich {

  /** Join the event stream with `dim` on `keyCol` (broadcast, map-side),
    * land (ts, dimVal tag, key, value) rows in an engine table, and
    * return its read. Events missing from the dimension keep a null
    * enrichment (left join — ingest must never drop facts). */
  def streamStaticJoinToTable(
      engine: TsdbEngine, dir: String, glob: String, schema: StructType,
      nanosTs: Boolean, tsCol: String, keyCol: String, valueCol: String,
      dim: DataFrame, dimValCol: String, table: String,
      passthrough: Seq[String] = Nil): DataFrame = {
    val spark = engine.spark
    if (!engine.catalog.exists(table)) {
      val extra = passthrough.map(c => s"$c string TAG,").mkString(" ")
      engine.execute(
        s"""CREATE TABLE $table (
           |  $tsCol timestamp NOT NULL, $dimValCol string TAG,
           |  $keyCol string TAG, $extra $valueCol double,
           |  timestamp KEY($tsCol))
           |ENGINE=Analytic WITH (update_mode='append')""".stripMargin)
    }

    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    val events =
      if (nanosTs) graft.Tables.normalizeEventTime(raw, tsCol) else raw
    val enriched = events
      .select(col(tsCol) +: col(keyCol).cast("string").as(keyCol) +:
        col(valueCol) +: passthrough.map(c => col(c).cast("string").as(c)): _*)
      .join(broadcast(dim.select(col(keyCol).cast("string").as(keyCol),
        col(dimValCol).cast("string").as(dimValCol))), Seq(keyCol), "left")
      .select(col(tsCol) +: col(dimValCol) +: col(keyCol) +:
        passthrough.map(col) :+ col(valueCol): _*)

    val q = enriched.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .option("checkpointLocation", engine.catalog.checkpointDir(table))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        engine.append(table, batch)
      }
      .start()
    q.awaitTermination()
    val s = engine.catalog.get(table)
    engine.read(table).select(s.columns.map(c => col(c.name)): _*)
  }
}
