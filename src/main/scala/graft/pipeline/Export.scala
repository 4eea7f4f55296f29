package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Trainer-facing corpus export formats on top of [[Sharding]]'s
  * deterministic shuffle + block-balanced shard assignment:
  *
  *  - JSONL shards (`shard=K/part-*.txt`, one JSON object per line) — the
  *    lingua franca of text-corpus releases;
  *  - WebDataset-style POSIX tar shards (`shard-00000.tar` holding
  *    `<seq>.txt` + `<seq>.json` member pairs in shuffle order) — the
  *    sequential-read format multimodal trainers stream.
  *
  * Scale shape: both writers reuse the one range shuffle
  * [[Sharding.assign]] already pays; each shard is written by exactly one
  * task as one sequential stream (shard size IS the file size, the
  * trainer's streaming unit). Tar bytes go through the Hadoop FileSystem
  * API, so the same code targets local disk, HDFS, or an object store.
  */
object Export {

  /** One JSONL file per `shard=K/` directory: each line is the JSON object
    * of `cols` (default: every input column) plus `seq`, written in
    * shuffle order. */
  def writeJsonlShards(
      df: DataFrame, idCol: String, salt: String, nShards: Int,
      outDir: String, cols: Seq[String] = Nil): Unit = {
    val assigned = Sharding.assign(df, idCol, salt, nShards)
    val keep = if (cols.nonEmpty) cols else df.columns.toSeq
    assigned
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("seq")
      .select(col("shard"),
        to_json(struct((keep :+ "seq").distinct.map(col): _*)).as("value"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .text(outDir)
  }

  /** WebDataset-style shards: `outDir/shard-%05d.tar`, each a POSIX ustar
    * archive of consecutive samples; sample `seq` contributes member
    * `<seq>.txt` (the text bytes) and `<seq>.json` (`{"id":...,"seq":...}`
    * metadata), the member-pair convention WebDataset loaders group by
    * key. Fully deterministic: fixed mtime/mode/owner, members in shuffle
    * order — two runs produce byte-identical archives. */
  def writeTarShards(
      df: DataFrame, idCol: String, textCol: String, salt: String,
      nShards: Int, outDir: String): Unit = {
    val rows = Sharding.assign(df, idCol, salt, nShards)
      .select(col("shard"), col("seq"),
        col(idCol).cast("string").as("__id"), col(textCol).as("__text"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("seq")
    val out = outDir // capture the string, not `this`
    rows.foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
      // a partition holds zero or more WHOLE shards (hash(shard) routing):
      // stream rows grouped by consecutive shard value, one tar per shard
      val conf = new org.apache.hadoop.conf.Configuration()
      var current = -1
      var tar: TarWriter = null
      def close(): Unit = if (tar != null) { tar.finish(); tar = null }
      it.foreach { r =>
        val shard = r.getInt(0)
        if (shard != current) {
          close(); current = shard
          val path = new org.apache.hadoop.fs.Path(
            out, f"shard-$shard%05d.tar")
          val fs = path.getFileSystem(conf)
          tar = new TarWriter(fs.create(path, true))
        }
        val seq = r.getLong(1)
        val id = r.getString(2)
        val text = Option(r.getString(3)).getOrElse("")
        tar.addEntry(f"$seq%09d.txt", text.getBytes("UTF-8"))
        tar.addEntry(f"$seq%09d.json",
          s"""{"id":"${id.replace("\"", "\\\"")}","seq":$seq}"""
            .getBytes("UTF-8"))
      }
      close()
    }
  }

  /** Minimal POSIX ustar writer (JDK ships no tar codec; the format is 512-
    * byte headers + 512-padded data + two zero blocks). Deterministic
    * fields only: mode 0644, uid/gid 0, mtime 0. */
  private final class TarWriter(out: java.io.OutputStream) {
    private val block = new Array[Byte](512)

    private def octal(v: Long, len: Int): Array[Byte] = {
      // len-1 octal digits, zero-padded, NUL-terminated (ustar numeric)
      val s = java.lang.Long.toOctalString(v)
      val b = new Array[Byte](len)
      val digits = ("0" * (len - 1 - s.length)) + s
      digits.getBytes("US-ASCII").copyToArray(b)
      b(len - 1) = 0
      b
    }

    def addEntry(name: String, data: Array[Byte]): Unit = {
      val h = new Array[Byte](512)
      val nameB = name.getBytes("US-ASCII")
      require(nameB.length <= 100, s"tar member name too long: $name")
      nameB.copyToArray(h, 0)
      octal(420 /* 0644 */, 8).copyToArray(h, 100)  // mode
      octal(0, 8).copyToArray(h, 108)               // uid
      octal(0, 8).copyToArray(h, 116)               // gid
      octal(data.length.toLong, 12).copyToArray(h, 124) // size
      octal(0, 12).copyToArray(h, 136)              // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum placeholder
      h(156) = '0'                                  // typeflag: regular file
      "ustar".getBytes("US-ASCII").copyToArray(h, 257)
      h(262) = 0
      "00".getBytes("US-ASCII").copyToArray(h, 263) // version
      var sum = 0L
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      val cs = octal(sum, 7)                        // 6 digits + NUL
      cs.copyToArray(h, 148)
      h(155) = ' '
      out.write(h)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      if (pad > 0) out.write(block, 0, pad)
    }

    def finish(): Unit = {
      out.write(block); out.write(block) // end-of-archive marker
      out.close()
    }
  }
}
