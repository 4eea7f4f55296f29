package graft.server

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled protobuf wire codec + the storage-service message shapes —
  * the gRPC twin of the byte-level MySQL/PG codecs in this package.
  *
  * Message/field layout is vendored from the PUBLIC
  * apache/incubator-horaedb-proto `storage.proto` (the revision the
  * reference pins in Cargo.toml:104), which is what
  * `server/src/grpc/storage_service/mod.rs` serves through tonic:
  * `SqlQueryRequest{context=1, tables=2, sql=3}`,
  * `SqlQueryResponse{header=1, affected_rows=4, arrow=5}` (output oneof;
  * affected rows as u32 — proxy/src/grpc/sql_query.rs:322),
  * `ArrowPayload{record_batches=1, compression=2}`,
  * `WriteRequest{context=1, table_requests=2}`,
  * `WriteTableRequest{table=1, tag_names=2, field_names=3, entries=4}`,
  * `WriteSeriesEntry{tags=1, field_groups=2}`, `Tag/Field{name_index=1,
  * value=2}`, `FieldGroup{timestamp=1, fields=2}`, `Value` oneof
  * (float64=1, string=2, int64=3, ..., bool), `ResponseHeader{code=1,
  * error=2}`, `RequestContext{database=1}`.
  *
  * Only varint (wire type 0), 64-bit (1), and length-delimited (2) wire
  * types appear in these messages.
  */
object Pb {

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def toBytes: Array[Byte] = out.toByteArray

    def varint(v0: Long): this.type = {
      var v = v0
      while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt); this
    }
    private def key(field: Int, wire: Int): this.type = varint((field << 3) | wire)
    def uint32(field: Int, v: Long): this.type =
      if (v == 0) this else { key(field, 0); varint(v) }
    def int64(field: Int, v: Long): this.type =
      if (v == 0) this else { key(field, 0); varint(v) }
    /** for oneof members: emit even when zero (presence = case selection) */
    def int64Always(field: Int, v: Long): this.type = { key(field, 0); varint(v) }
    def double(field: Int, v: Double): this.type = {
      key(field, 1)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
      this
    }
    def boolAlways(field: Int, v: Boolean): this.type = {
      key(field, 0); varint(if (v) 1L else 0L)
    }
    def bytes(field: Int, b: Array[Byte]): this.type = {
      key(field, 2); varint(b.length.toLong); out.write(b); this
    }
    def string(field: Int, s: String): this.type =
      if (s.isEmpty) this else bytes(field, s.getBytes("UTF-8"))
    def stringAlways(field: Int, s: String): this.type =
      bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int, m: Writer): this.type = bytes(field, m.toBytes)
  }

  final class Reader(val buf: Array[Byte], from: Int, to: Int) {
    def this(b: Array[Byte]) = this(b, 0, b.length)
    private var pos = from
    def hasNext: Boolean = pos < to

    def varint(): Long = {
      var v = 0L; var shift = 0
      var b = 0
      do {
        b = buf(pos) & 0xFF; pos += 1
        v |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    /** returns (fieldNumber, wireType) */
    def readKey(): (Int, Int) = {
      val k = varint()
      ((k >>> 3).toInt, (k & 0x7).toInt)
    }
    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def lenDelim(): Reader = {
      val n = varint().toInt
      val r = new Reader(buf, pos, pos + n)
      pos += n; r
    }
    def bytesField(): Array[Byte] = {
      val n = varint().toInt
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n; b
    }
    def stringField(): String = new String(bytesField(), "UTF-8")
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => pos += varint().toInt
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ------------------------------------------------- storage.proto shapes

  /** Value oneof: exactly one of the options is set. */
  final case class Value(
      f64: Option[Double] = None, str: Option[String] = None,
      i64: Option[Long] = None, bool: Option[Boolean] = None) {
    def any: Any = f64.orElse(str).orElse(i64).orElse(bool).orNull
  }
  object Value {
    val F64 = 1; val Str = 2; val I64 = 3; val Bool = 8
    def parse(r: Reader): Value = {
      var v = Value()
      while (r.hasNext) r.readKey() match {
        case (F64, 1)  => v = Value(f64 = Some(java.lang.Double.longBitsToDouble(r.fixed64())))
        case (Str, 2)  => v = Value(str = Some(r.stringField()))
        case (I64, 0)  => v = Value(i64 = Some(r.varint()))
        case (Bool, 0) => v = Value(bool = Some(r.varint() != 0))
        case (_, w)    => r.skip(w)
      }
      v
    }
    def write(v: Value): Writer = {
      val w = new Writer
      v.f64.foreach(w.double(F64, _))
      v.str.foreach(w.stringAlways(Str, _))
      v.i64.foreach(w.int64Always(I64, _))
      v.bool.foreach(w.boolAlways(Bool, _))
      w
    }
  }

  final case class TagPb(nameIndex: Int, value: Value)
  final case class FieldPb(nameIndex: Int, value: Value)
  final case class FieldGroup(timestampMs: Long, fields: Seq[FieldPb])
  final case class WriteSeriesEntry(tags: Seq[TagPb], fieldGroups: Seq[FieldGroup])
  final case class WriteTableRequest(
      table: String, tagNames: Seq[String], fieldNames: Seq[String],
      entries: Seq[WriteSeriesEntry])
  final case class WriteRequest(database: String, tables: Seq[WriteTableRequest])
  final case class SqlQueryRequest(database: String, tables: Seq[String], sql: String)

  private def parseIndexed(r: Reader): (Int, Value) = {
    var idx = 0; var v = Value()
    while (r.hasNext) r.readKey() match {
      case (1, 0) => idx = r.varint().toInt
      case (2, 2) => v = Value.parse(r.lenDelim())
      case (_, w) => r.skip(w)
    }
    (idx, v)
  }

  def parseWriteRequest(b: Array[Byte]): WriteRequest = {
    var db = ""
    val tables = ArrayBuffer.empty[WriteTableRequest]
    val root = new Reader(b)
    while (root.hasNext) root.readKey() match {
      case (1, 2) => // RequestContext
        val c = root.lenDelim()
        while (c.hasNext) c.readKey() match {
          case (1, 2) => db = c.stringField()
          case (_, w) => c.skip(w)
        }
      case (2, 2) =>
        val t = root.lenDelim()
        var name = ""
        val tagNames = ArrayBuffer.empty[String]
        val fieldNames = ArrayBuffer.empty[String]
        val entries = ArrayBuffer.empty[WriteSeriesEntry]
        while (t.hasNext) t.readKey() match {
          case (1, 2) => name = t.stringField()
          case (2, 2) => tagNames += t.stringField()
          case (3, 2) => fieldNames += t.stringField()
          case (4, 2) =>
            val e = t.lenDelim()
            val tags = ArrayBuffer.empty[TagPb]
            val groups = ArrayBuffer.empty[FieldGroup]
            while (e.hasNext) e.readKey() match {
              case (1, 2) =>
                val (i, v) = parseIndexed(e.lenDelim()); tags += TagPb(i, v)
              case (2, 2) =>
                val g = e.lenDelim()
                var ts = 0L
                val fs = ArrayBuffer.empty[FieldPb]
                while (g.hasNext) g.readKey() match {
                  case (1, 0) => ts = g.varint()
                  case (2, 2) =>
                    val (i, v) = parseIndexed(g.lenDelim()); fs += FieldPb(i, v)
                  case (_, w) => g.skip(w)
                }
                groups += FieldGroup(ts, fs.toSeq)
              case (_, w) => e.skip(w)
            }
            entries += WriteSeriesEntry(tags.toSeq, groups.toSeq)
          case (_, w) => t.skip(w)
        }
        tables += WriteTableRequest(name, tagNames.toSeq, fieldNames.toSeq, entries.toSeq)
      case (_, w) => root.skip(w)
    }
    WriteRequest(db, tables.toSeq)
  }

  def writeWriteRequest(req: WriteRequest): Array[Byte] = {
    val w = new Writer
    if (req.database.nonEmpty)
      w.msg(1, new Writer().stringAlways(1, req.database))
    req.tables.foreach { t =>
      val tw = new Writer
      tw.stringAlways(1, t.table)
      t.tagNames.foreach(tw.stringAlways(2, _))
      t.fieldNames.foreach(tw.stringAlways(3, _))
      t.entries.foreach { e =>
        val ew = new Writer
        e.tags.foreach(tag => ew.msg(1,
          new Writer().uint32(1, tag.nameIndex.toLong).msg(2, Value.write(tag.value))))
        e.fieldGroups.foreach { g =>
          val gw = new Writer().int64Always(1, g.timestampMs)
          g.fields.foreach(f => gw.msg(2,
            new Writer().uint32(1, f.nameIndex.toLong).msg(2, Value.write(f.value))))
          ew.msg(2, gw)
        }
        tw.msg(4, ew)
      }
      w.msg(2, tw)
    }
    w.toBytes
  }

  def parseSqlQueryRequest(b: Array[Byte]): SqlQueryRequest = {
    var db = ""; var sql = ""
    val tables = ArrayBuffer.empty[String]
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val c = r.lenDelim()
        while (c.hasNext) c.readKey() match {
          case (1, 2) => db = c.stringField()
          case (_, w) => c.skip(w)
        }
      case (2, 2) => tables += r.stringField()
      case (3, 2) => sql = r.stringField()
      case (_, w) => r.skip(w)
    }
    SqlQueryRequest(db, tables.toSeq, sql)
  }

  def writeSqlQueryRequest(req: SqlQueryRequest): Array[Byte] = {
    val w = new Writer
    if (req.database.nonEmpty)
      w.msg(1, new Writer().stringAlways(1, req.database))
    req.tables.foreach(w.stringAlways(2, _))
    w.stringAlways(3, req.sql)
    w.toBytes
  }

  private def header(code: Int, error: String): Writer = {
    val h = new Writer().uint32(1, code.toLong)
    if (error.nonEmpty) h.stringAlways(2, error)
    h
  }

  def writeWriteResponse(code: Int, error: String, success: Long, failed: Long): Array[Byte] =
    new Writer().msg(1, header(code, error))
      .uint32(2, success).uint32(3, failed).toBytes

  /** parsed WriteResponse: (code, error, success, failed) */
  def parseWriteResponse(b: Array[Byte]): (Int, String, Long, Long) = {
    var code = 0; var err = ""; var succ = 0L; var fail = 0L
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val h = r.lenDelim()
        while (h.hasNext) h.readKey() match {
          case (1, 0) => code = h.varint().toInt
          case (2, 2) => err = h.stringField()
          case (_, w) => h.skip(w)
        }
      case (2, 0) => succ = r.varint()
      case (3, 0) => fail = r.varint()
      case (_, w) => r.skip(w)
    }
    (code, err, succ, fail)
  }

  def writeSqlResponseAffected(code: Int, error: String, rows: Long): Array[Byte] =
    new Writer().msg(1, header(code, error)).int64Always(4, rows).toBytes

  def writeSqlResponseArrow(code: Int, ipcStreams: Seq[Array[Byte]]): Array[Byte] = {
    val arrow = new Writer
    ipcStreams.foreach(arrow.bytes(1, _))
    // compression field 2 = NONE (0): omitted, proto3 default
    new Writer().msg(1, header(code, "")).msg(5, arrow).toBytes
  }

  /** parsed SqlQueryResponse: (code, error, affectedRows, arrowBatches) */
  def parseSqlQueryResponse(
      b: Array[Byte]): (Int, String, Option[Long], Seq[Array[Byte]]) = {
    var code = 0; var err = ""
    var affected: Option[Long] = None
    val batches = ArrayBuffer.empty[Array[Byte]]
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val h = r.lenDelim()
        while (h.hasNext) h.readKey() match {
          case (1, 0) => code = h.varint().toInt
          case (2, 2) => err = h.stringField()
          case (_, w) => h.skip(w)
        }
      case (4, 0) => affected = Some(r.varint())
      case (5, 2) =>
        val a = r.lenDelim()
        while (a.hasNext) a.readKey() match {
          case (1, 2) => batches += a.bytesField()
          case (_, w) => a.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    (code, err, affected, batches.toSeq)
  }
}
