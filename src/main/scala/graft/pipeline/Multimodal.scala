package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batch-shaped per-partition operators.
  *
  * The Spark-side contract is real (schema, partitioning, per-partition
  * batching); the codec itself is a STUB — this container has no image/audio
  * libraries, so `decodeStub` derives deterministic fake features from the
  * bytes. Swap [[MediaCodec.decode]] for a real decoder (JNI/FFI or a
  * vendored pure-JVM codec) without touching the pipeline shape.
  */
object Multimodal {

  /** One media row: binary payload + typed metadata, the layout a 100 TB
    * multimodal corpus would use (payload stays opaque to Catalyst; all
    * pruning happens on the metadata columns). */
  case class MediaRow(
      media_id: Long, kind: String, media: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, features: Array[Float])

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * Real implementation would JNI into an image/audio codec here. */
  object MediaCodec {
    def decode(payload: Array[Byte], nFeatures: Int = 8): Array[Float] = {
      // ??? <- real codec goes here; deterministic fake for plumbing tests:
      val out = new Array[Float](nFeatures)
      var i = 0
      while (i < payload.length) {
        out(i % nFeatures) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    def checksum(payload: Array[Byte]): Long =
      com.google.common.hash.Hashing.crc32c().hashBytes(payload).asInt().toLong & 0xffffffffL
  }

  /** Feature extraction as a per-partition batch operator: one codec
    * context per partition (the expensive part with a real codec), rows
    * streamed through it — the mapInPandas batch shape, in Scala. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: a real codec would open its context here
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.media.length.toLong,
          MediaCodec.checksum(r.media), MediaCodec.decode(r.media))
      }
    }
  }

  /** STUB resize: strided byte resampling to the target dimensions' byte
    * budget (newLen = len * tw*th / (w*h), out[j] = in[j*len/newLen]) with
    * the metadata columns updated — a real implementation swaps the stride
    * loop for a codec's scaler; the map-only pipeline shape (payload in,
    * payload + metadata out, no shuffle) is the contract under test. */
  def resize(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val len = r.media.length
      val area = math.max(1L, r.width.toLong * r.height)
      val newLen = math.max(1L, len.toLong * (tw.toLong * th) / area).toInt
      val out = new Array[Byte](math.min(newLen, math.max(len, 1)))
      var j = 0
      while (j < out.length && len > 0) {
        out(j) = r.media((j.toLong * len / out.length).toInt)
        j += 1
      }
      r.copy(media = out, width = tw, height = th)
    }
  }

  /** Deterministic frame/chunk sampling of a binary payload: n evenly-spaced
    * fixed-size slices (a video frame-sampler's access pattern). */
  def sampleChunks(media: Dataset[MediaRow], n: Int, chunkBytes: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.media.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val off = math.min((len.toLong * i / n).toInt, math.max(0, len - 1))
        val end = math.min(off + chunkBytes, len)
        (r.media_id, i, off.toLong, java.util.Arrays.copyOfRange(r.media, off, end))
      }
    }.toDF("media_id", "chunk_idx", "offset", "chunk")
  }

  /** Synthesize a media table from the documents fixture (text bytes as the
    * payload) — stands in for a real binary corpus in tests/benchmarks. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("media"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        when(col("doc_id") % 2 === 0, 0).otherwise(16000).cast("int").as("sample_rate"))
      .as[MediaRow]
  }
}
