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

  /** Audio frame analysis — the VAD/energy pre-pass a speech-data
    * pipeline runs before transcription: interpret the payload as
    * little-endian int16 PCM (the STUB decode step — a real codec would
    * decompress to PCM first; only this interpretation is fake, the
    * framing and signal math are real), cut it into `frameSamples`-sample
    * frames every `hopSamples`, and emit per frame:
    *
    *   - `rms_milli`: floor(1000·RMS) from the exact integer Σs² (IEEE
    *     sqrt of an exact integer — deterministic everywhere),
    *   - `zcr_bp`: zero crossings per frame in basis points (integer),
    *   - `voiced`: rms_milli >= vadRmsMilli (the energy-gate VAD).
    *
    * Same per-partition batch shape as [[extractFeatures]]: one codec
    * context per partition, frames streamed out — map-only, no shuffle;
    * at 100 TB the frame stream parallelizes by media row. */
  def audioFrames(
      media: Dataset[MediaRow], frameSamples: Int, hopSamples: Int,
      vadRmsMilli: Long): DataFrame = {
    import media.sparkSession.implicits._
    // >= 2: ZCR divides by (frameSamples - 1) crossing slots
    require(frameSamples >= 2 && hopSamples > 0)
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.media.length / 2
        val frames = if (n < frameSamples) 0 else (n - frameSamples) / hopSamples + 1
        def sample(i: Int): Int = // int16 LE
          ((r.media(2 * i + 1).toInt << 8) | (r.media(2 * i) & 0xff)).toShort.toInt
        (0 until frames).iterator.map { f =>
          val off = f * hopSamples
          var sumSq = 0L; var crossings = 0L; var prevSign = 0
          var i = 0
          while (i < frameSamples) {
            val s = sample(off + i)
            sumSq += s.toLong * s
            val sign = java.lang.Integer.signum(s)
            if (sign != 0) {
              if (prevSign != 0 && sign != prevSign) crossings += 1
              prevSign = sign
            }
            i += 1
          }
          val rmsMilli =
            math.floor(math.sqrt(sumSq.toDouble / frameSamples) * 1000).toLong
          val zcrBp = 10000L * crossings / (frameSamples - 1)
          (r.media_id, f, rmsMilli, zcrBp, rmsMilli >= vadRmsMilli)
        }
      }
    }.toDF("media_id", "frame_idx", "rms_milli", "zcr_bp", "voiced")
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

  // ------------------------------------------------- perceptual hashing

  /** Perceptual hash, the pHash pipeline shape: payload → luma grid →
    * 2-D DCT-II → 8×8 low-frequency block → sign-vs-median 64-bit hash.
    * Only the grid extraction is the STUB decode step (strided byte
    * resample standing in for decode+grayscale+resize); the DCT and the
    * median threshold — what makes the hash robust to small perturbations
    * — are the real math. A real decoder swaps [[lumaGrid]] only. */
  object Phash {
    private val N = 32 // grid side; 8×8 low block of its DCT feeds the hash

    private[pipeline] def lumaGrid(payload: Array[Byte]): Array[Double] = {
      val g = new Array[Double](N * N)
      val len = payload.length
      if (len == 0) return g
      var i = 0
      while (i < N * N) {
        g(i) = (payload(((i.toLong * len) / (N * N)).toInt) & 0xff).toDouble
        i += 1
      }
      g
    }

    // cos(π(2x+1)u / 2N) lookup, shared by rows and columns
    private val cosTab: Array[Double] = {
      val t = new Array[Double](N * N)
      var u = 0
      while (u < N) {
        var x = 0
        while (x < N) {
          t(u * N + x) = math.cos(math.Pi * (2 * x + 1) * u / (2.0 * N))
          x += 1
        }
        u += 1
      }
      t
    }

    /** Separable 2-D DCT-II restricted to the 8×8 low-frequency output
      * block (the only coefficients the hash reads — 8·32·32 + 8·8·32
      * multiplies per image instead of the full 32³). */
    private[pipeline] def dctLowBlock(g: Array[Double]): Array[Double] = {
      val rows = new Array[Double](8 * N) // DCT along x for u < 8
      var u = 0
      while (u < 8) {
        var y = 0
        while (y < N) {
          var s = 0.0
          var x = 0
          while (x < N) { s += g(y * N + x) * cosTab(u * N + x); x += 1 }
          rows(u * N + y) = s
          y += 1
        }
        u += 1
      }
      val out = new Array[Double](64)
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0
          var y = 0
          while (y < N) { s += rows(u * N + y) * cosTab(v * N + y); y += 1 }
          out(u * 8 + v) = s
          v += 1
        }
        u += 1
      }
      out
    }

    /** 64-bit hash: bit i set iff DCT coefficient i exceeds the median of
      * the 64 low-block coefficients (DC included in the median like the
      * common pHash variant — the median threshold is what cancels global
      * brightness/scale). */
    def hash64(payload: Array[Byte]): Long = {
      val c = dctLowBlock(lumaGrid(payload))
      val sorted = c.clone(); java.util.Arrays.sort(sorted)
      val med = (sorted(31) + sorted(32)) / 2.0
      var h = 0L
      var i = 0
      while (i < 64) { if (c(i) > med) h |= (1L << i); i += 1 }
      h
    }
  }

  /** (media_id, phash) for every row — map-only, one codec context's worth
    * of work per row, no shuffle. */
  def phash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map(r => (r.media_id, Phash.hash64(r.media)))
      .toDF("media_id", "phash")
  }

  /** Near-duplicate media pairs by banded pHash Hamming distance — the
    * [[Dedup.simhashNearDupPairs]] machinery over the perceptual hash:
    * split 64 bits into `bands`, shuffle by (band, key), verify full
    * Hamming ≤ `maxHamming` with `bit_count(xor)` inside each bucket.
    * Pigeonhole: any pair with Hamming < `bands` agrees on ≥1 band, so
    * recall is exact in that radius; candidate volume stays bucket-bounded
    * (never an all-pairs product). Returns (id_a, id_b, hamming). */
  def phashNearDupPairs(
      media: Dataset[MediaRow], bands: Int = 4, maxHamming: Int = 6): DataFrame =
    Dedup.bandedHammingPairs(
      phash(media), "media_id", "phash", bands, maxHamming)
}
