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
      case 2 =>
        // NB: must read the length varint BEFORE touching pos — `pos +=
        // varint()` reads the OLD pos before varint() advances it, silently
        // losing the length byte(s) and desyncing the stream
        val n = varint().toInt; pos += n
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

  // ----------------------------------------------------------- Route shapes
  // RouteRequest{context=1, tables=2}; RouteResponse{header=1, routes=2};
  // Route{table=1, endpoint=2}; Endpoint{ip=1, port=2} (the shape
  // router/src/endpoint.rs:67-74 populates).

  final case class RouteRequest(database: String, tables: Seq[String])
  final case class RoutePb(table: String, ip: String, port: Int)

  def writeRouteRequest(req: RouteRequest): Array[Byte] = {
    val w = new Writer
    if (req.database.nonEmpty)
      w.msg(1, new Writer().stringAlways(1, req.database))
    req.tables.foreach(w.stringAlways(2, _))
    w.toBytes
  }

  def parseRouteRequest(b: Array[Byte]): RouteRequest = {
    var db = ""
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
      case (_, w) => r.skip(w)
    }
    RouteRequest(db, tables.toSeq)
  }

  def writeRouteResponse(code: Int, error: String, routes: Seq[RoutePb]): Array[Byte] = {
    val w = new Writer().msg(1, header(code, error))
    routes.foreach { rt =>
      w.msg(2, new Writer().stringAlways(1, rt.table)
        .msg(2, new Writer().stringAlways(1, rt.ip).uint32(2, rt.port.toLong)))
    }
    w.toBytes
  }

  /** parsed RouteResponse: (code, error, routes) */
  def parseRouteResponse(b: Array[Byte]): (Int, String, Seq[RoutePb]) = {
    var code = 0; var err = ""
    val routes = ArrayBuffer.empty[RoutePb]
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val h = r.lenDelim()
        while (h.hasNext) h.readKey() match {
          case (1, 0) => code = h.varint().toInt
          case (2, 2) => err = h.stringField()
          case (_, w) => h.skip(w)
        }
      case (2, 2) =>
        val rt = r.lenDelim()
        var table = ""; var ip = ""; var port = 0
        while (rt.hasNext) rt.readKey() match {
          case (1, 2) => table = rt.stringField()
          case (2, 2) =>
            val e = rt.lenDelim()
            while (e.hasNext) e.readKey() match {
              case (1, 2) => ip = e.stringField()
              case (2, 0) => port = e.varint().toInt
              case (_, w) => e.skip(w)
            }
          case (_, w) => rt.skip(w)
        }
        routes += RoutePb(table, ip, port)
      case (_, w) => r.skip(w)
    }
    (code, err, routes.toSeq)
  }

  // ------------------------------------------------ Prometheus remote read
  // PrometheusRemoteQueryRequest{context=1, query=2} where `query` is one
  // prompb Query (proxy/src/http/prom.rs:185 `Query::decode(req.query)`);
  // PrometheusRemoteQueryResponse{header=1, response=2} where `response` is
  // a prompb QueryResult (prom.rs:205 `v.encode_to_vec()`). The prompb
  // shapes are the PUBLIC Prometheus remote-storage proto:
  // Query{start_timestamp_ms=1, end_timestamp_ms=2, matchers=3};
  // LabelMatcher{type=1 (EQ/NEQ/RE/NRE), name=2, value=3};
  // QueryResult{timeseries=1}; TimeSeries{labels=1, samples=2};
  // Label{name=1, value=2}; Sample{value=1, timestamp=2}.

  final case class LabelMatcherPb(tpe: Int, name: String, value: String)
  final case class PromQueryPb(startMs: Long, endMs: Long, matchers: Seq[LabelMatcherPb])
  final case class PromLabel(name: String, value: String)
  final case class PromSample(value: Double, timestampMs: Long)
  final case class PromSeries(labels: Seq[PromLabel], samples: Seq[PromSample])

  def writePromQuery(q: PromQueryPb): Array[Byte] = {
    val w = new Writer().int64(1, q.startMs).int64(2, q.endMs)
    q.matchers.foreach { m =>
      w.msg(3, new Writer().uint32(1, m.tpe.toLong)
        .stringAlways(2, m.name).stringAlways(3, m.value))
    }
    w.toBytes
  }

  def parsePromQuery(b: Array[Byte]): PromQueryPb = {
    var s = 0L; var e = 0L
    val ms = ArrayBuffer.empty[LabelMatcherPb]
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 0) => s = r.varint()
      case (2, 0) => e = r.varint()
      case (3, 2) =>
        val m = r.lenDelim()
        var t = 0; var n = ""; var v = ""
        while (m.hasNext) m.readKey() match {
          case (1, 0) => t = m.varint().toInt
          case (2, 2) => n = m.stringField()
          case (3, 2) => v = m.stringField()
          case (_, w) => m.skip(w)
        }
        ms += LabelMatcherPb(t, n, v)
      case (_, w) => r.skip(w)
    }
    PromQueryPb(s, e, ms.toSeq)
  }

  def writeQueryResult(series: Seq[PromSeries]): Array[Byte] = {
    val w = new Writer
    series.foreach { ts =>
      val tw = new Writer
      ts.labels.foreach(l => tw.msg(1,
        new Writer().stringAlways(1, l.name).stringAlways(2, l.value)))
      ts.samples.foreach(sm => tw.msg(2,
        new Writer().double(1, sm.value).int64Always(2, sm.timestampMs)))
      w.msg(1, tw)
    }
    w.toBytes
  }

  def parseQueryResult(b: Array[Byte]): Seq[PromSeries] = {
    val series = ArrayBuffer.empty[PromSeries]
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val t = r.lenDelim()
        val labels = ArrayBuffer.empty[PromLabel]
        val samples = ArrayBuffer.empty[PromSample]
        while (t.hasNext) t.readKey() match {
          case (1, 2) =>
            val l = t.lenDelim()
            var n = ""; var v = ""
            while (l.hasNext) l.readKey() match {
              case (1, 2) => n = l.stringField()
              case (2, 2) => v = l.stringField()
              case (_, w) => l.skip(w)
            }
            labels += PromLabel(n, v)
          case (2, 2) =>
            val sm = t.lenDelim()
            var v = 0.0; var ts = 0L
            while (sm.hasNext) sm.readKey() match {
              case (1, 1) => v = java.lang.Double.longBitsToDouble(sm.fixed64())
              case (2, 0) => ts = sm.varint()
              case (_, w) => sm.skip(w)
            }
            samples += PromSample(v, ts)
          case (_, w) => t.skip(w)
        }
        series += PromSeries(labels.toSeq, samples.toSeq)
      case (_, w) => r.skip(w)
    }
    series.toSeq
  }

  def writePromRemoteQueryRequest(database: String, query: PromQueryPb): Array[Byte] = {
    val w = new Writer
    if (database.nonEmpty) w.msg(1, new Writer().stringAlways(1, database))
    w.bytes(2, writePromQuery(query)).toBytes
  }

  /** parsed PrometheusRemoteQueryRequest: (database, query) */
  def parsePromRemoteQueryRequest(b: Array[Byte]): (String, PromQueryPb) = {
    var db = ""; var q = PromQueryPb(0L, 0L, Nil)
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val c = r.lenDelim()
        while (c.hasNext) c.readKey() match {
          case (1, 2) => db = c.stringField()
          case (_, w) => c.skip(w)
        }
      case (2, 2) => q = parsePromQuery(r.bytesField())
      case (_, w) => r.skip(w)
    }
    (db, q)
  }

  def writePromRemoteQueryResponse(
      code: Int, error: String, result: Seq[PromSeries]): Array[Byte] = {
    val w = new Writer().msg(1, header(code, error))
    if (code == 200) w.bytes(2, writeQueryResult(result))
    w.toBytes
  }

  /** parsed PrometheusRemoteQueryResponse: (code, error, series) */
  def parsePromRemoteQueryResponse(b: Array[Byte]): (Int, String, Seq[PromSeries]) = {
    var code = 0; var err = ""
    var series: Seq[PromSeries] = Nil
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val h = r.lenDelim()
        while (h.hasNext) h.readKey() match {
          case (1, 0) => code = h.varint().toInt
          case (2, 2) => err = h.stringField()
          case (_, w) => h.skip(w)
        }
      case (2, 2) => series = parseQueryResult(r.bytesField())
      case (_, w) => r.skip(w)
    }
    (code, err, series)
  }

  // --------------------------------------------- PromQuery structured expr
  // The reference's gRPC `PromQuery` carries a pre-lowered PromQL expression
  // tree (its Prometheus fork pushes selector/func/aggregate down instead of
  // a query string). Message layout is the PUBLIC apache/incubator-
  // horaedb-proto `prometheus.proto` (the revision the reference pins in
  // Cargo.toml:104); field order matches the prost struct declaration order
  // consumed in query_frontend/src/promql/convert.rs:64-130:
  //   Expr{node oneof: operand=1, sub_expr=2};
  //   Operand{value oneof: selector=1, float_val=2, string_val=3};
  //   SubExpr{op_type=1 (AGGR=0/FUNC=1/BINARY=2), operator=2, operands=3,
  //           group=4, without=5};
  //   Selector{measurement=1, start=2, end=3, align_start=4, align_end=5,
  //            filters=6, range=7, field=8, offset=9, step=10};
  //   Filter{tag_key=1, operators=2};
  //   FilterCondition{filter_type=1 (LITERAL_OR=0/NOT_LITERAL_OR=1/
  //                   REGEXP=2/NOT_REGEXP_MATCH=3), params=2};
  //   PrometheusQueryRequest{context=1, expr=2};
  //   PrometheusQueryResponse{header=1, timeseries=2} with
  //   TimeSeries/Label/Sample shaped like the prompb messages above.

  final case class PromFilterCondPb(tpe: Int, params: Seq[String])
  final case class PromFilterPb(tagKey: String, conds: Seq[PromFilterCondPb])
  final case class PromSelectorPb(
      measurement: String, start: Long, end: Long,
      alignStart: Long, alignEnd: Long,
      filters: Seq[PromFilterPb] = Nil, range: Long = 0L,
      field: String = "value", offset: Long = 0L, step: Long = 0L)
  sealed trait PromExprPb
  final case class PromOperandSelector(sel: PromSelectorPb) extends PromExprPb
  final case class PromOperandFloat(v: Double) extends PromExprPb
  final case class PromOperandString(v: String) extends PromExprPb
  /** opType: 0=AGGR 1=FUNC 2=BINARY (sub_expr.OperatorType) */
  final case class PromSubExprPb(opType: Int, operator: String,
      operands: Seq[PromExprPb], group: Seq[String] = Nil,
      without: Boolean = false) extends PromExprPb

  private def writeSelectorPb(s: PromSelectorPb): Writer = {
    val w = new Writer().string(1, s.measurement)
      .int64(2, s.start).int64(3, s.end)
      .int64(4, s.alignStart).int64(5, s.alignEnd)
    s.filters.foreach { f =>
      val fw = new Writer().stringAlways(1, f.tagKey)
      f.conds.foreach { c =>
        val cw = new Writer().uint32(1, c.tpe.toLong)
        c.params.foreach(p => cw.bytes(2, p.getBytes("UTF-8")))
        fw.msg(2, cw)
      }
      w.msg(6, fw)
    }
    w.int64(7, s.range).string(8, s.field).int64(9, s.offset).int64(10, s.step)
  }

  def writePromExpr(e: PromExprPb): Array[Byte] = {
    val w = new Writer
    e match {
      case PromOperandSelector(sel) =>
        w.msg(1, new Writer().msg(1, writeSelectorPb(sel)))
      case PromOperandFloat(v) =>
        w.msg(1, new Writer().double(2, v))
      case PromOperandString(v) =>
        w.msg(1, new Writer().stringAlways(3, v))
      case PromSubExprPb(opType, operator, operands, group, without) =>
        val sw = new Writer().uint32(1, opType.toLong).stringAlways(2, operator)
        operands.foreach(o => sw.bytes(3, writePromExpr(o)))
        group.foreach(g => sw.bytes(4, g.getBytes("UTF-8")))
        if (without) sw.boolAlways(5, without)
        w.msg(2, sw)
    }
    w.toBytes
  }

  def parsePromExpr(b: Array[Byte]): PromExprPb = {
    val r = new Reader(b)
    var result: PromExprPb = null
    while (r.hasNext) r.readKey() match {
      case (1, 2) => // Operand
        val o = r.lenDelim()
        while (o.hasNext) o.readKey() match {
          case (1, 2) => result = PromOperandSelector(parseSelectorPb(o.bytesField()))
          case (2, 1) => result = PromOperandFloat(
            java.lang.Double.longBitsToDouble(o.fixed64()))
          case (3, 2) => result = PromOperandString(o.stringField())
          case (_, w) => o.skip(w)
        }
      case (2, 2) => // SubExpr
        val s = r.lenDelim()
        var tpe = 0; var op = ""; var without = false
        val operands = ArrayBuffer.empty[PromExprPb]
        val group = ArrayBuffer.empty[String]
        while (s.hasNext) s.readKey() match {
          case (1, 0) => tpe = s.varint().toInt
          case (2, 2) => op = s.stringField()
          case (3, 2) => operands += parsePromExpr(s.bytesField())
          case (4, 2) => group += s.stringField()
          case (5, 0) => without = s.varint() != 0L
          case (_, w) => s.skip(w)
        }
        result = PromSubExprPb(tpe, op, operands.toSeq, group.toSeq, without)
      case (_, w) => r.skip(w)
    }
    if (result == null)
      throw new IllegalArgumentException("unknown expr") // convert.rs:121
    result
  }

  private def parseSelectorPb(b: Array[Byte]): PromSelectorPb = {
    var measurement = ""; var start = 0L; var end = 0L
    var alignStart = 0L; var alignEnd = 0L; var range = 0L
    var field = ""; var offset = 0L; var step = 0L
    val filters = ArrayBuffer.empty[PromFilterPb]
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2)  => measurement = r.stringField()
      case (2, 0)  => start = r.varint()
      case (3, 0)  => end = r.varint()
      case (4, 0)  => alignStart = r.varint()
      case (5, 0)  => alignEnd = r.varint()
      case (6, 2)  =>
        val f = r.lenDelim()
        var tagKey = ""
        val conds = ArrayBuffer.empty[PromFilterCondPb]
        while (f.hasNext) f.readKey() match {
          case (1, 2) => tagKey = f.stringField()
          case (2, 2) =>
            val c = f.lenDelim()
            var tpe = 0
            val params = ArrayBuffer.empty[String]
            while (c.hasNext) c.readKey() match {
              case (1, 0) => tpe = c.varint().toInt
              case (2, 2) => params += c.stringField()
              case (_, w) => c.skip(w)
            }
            conds += PromFilterCondPb(tpe, params.toSeq)
          case (_, w) => f.skip(w)
        }
        filters += PromFilterPb(tagKey, conds.toSeq)
      case (7, 0)  => range = r.varint()
      case (8, 2)  => field = r.stringField()
      case (9, 0)  => offset = r.varint()
      case (10, 0) => step = r.varint()
      case (_, w)  => r.skip(w)
    }
    PromSelectorPb(measurement, start, end, alignStart, alignEnd,
      filters.toSeq, range, if (field.isEmpty) "value" else field, offset, step)
  }

  def writePromQueryRequest(database: String, expr: PromExprPb): Array[Byte] = {
    val w = new Writer
    if (database.nonEmpty) w.msg(1, new Writer().stringAlways(1, database))
    w.bytes(2, writePromExpr(expr)).toBytes
  }

  /** parsed PrometheusQueryRequest: (database, expr) */
  def parsePromQueryRequest(b: Array[Byte]): (String, PromExprPb) = {
    var db = ""; var expr: PromExprPb = null
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val c = r.lenDelim()
        while (c.hasNext) c.readKey() match {
          case (1, 2) => db = c.stringField()
          case (_, w) => c.skip(w)
        }
      case (2, 2) => expr = parsePromExpr(r.bytesField())
      case (_, w) => r.skip(w)
    }
    if (expr == null)
      throw new IllegalArgumentException(
        "Expr is not found in prom request") // frontend.rs:60
    (db, expr)
  }

  def writePromQueryResponse(
      code: Int, error: String, series: Seq[PromSeries]): Array[Byte] = {
    val w = new Writer().msg(1, header(code, error))
    series.foreach { ts =>
      val tw = new Writer
      ts.labels.foreach(l => tw.msg(1,
        new Writer().stringAlways(1, l.name).stringAlways(2, l.value)))
      ts.samples.foreach(sm => tw.msg(2,
        new Writer().double(1, sm.value).int64Always(2, sm.timestampMs)))
      w.msg(2, tw)
    }
    w.toBytes
  }

  /** parsed PrometheusQueryResponse: (code, error, series) */
  def parsePromQueryResponse(b: Array[Byte]): (Int, String, Seq[PromSeries]) = {
    var code = 0; var err = ""
    val series = ArrayBuffer.empty[PromSeries]
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val h = r.lenDelim()
        while (h.hasNext) h.readKey() match {
          case (1, 0) => code = h.varint().toInt
          case (2, 2) => err = h.stringField()
          case (_, w) => h.skip(w)
        }
      case (2, 2) =>
        val t = r.lenDelim()
        val labels = ArrayBuffer.empty[PromLabel]
        val samples = ArrayBuffer.empty[PromSample]
        while (t.hasNext) t.readKey() match {
          case (1, 2) =>
            val l = t.lenDelim()
            var n = ""; var v = ""
            while (l.hasNext) l.readKey() match {
              case (1, 2) => n = l.stringField()
              case (2, 2) => v = l.stringField()
              case (_, w) => l.skip(w)
            }
            labels += PromLabel(n, v)
          case (2, 2) =>
            val sm = t.lenDelim()
            var v = 0.0; var ts = 0L
            while (sm.hasNext) sm.readKey() match {
              case (1, 1) => v = java.lang.Double.longBitsToDouble(sm.fixed64())
              case (2, 0) => ts = sm.varint()
              case (_, w) => sm.skip(w)
            }
            samples += PromSample(v, ts)
          case (_, w) => t.skip(w)
        }
        series += PromSeries(labels.toSeq, samples.toSeq)
      case (_, w) => r.skip(w)
    }
    (code, err, series.toSeq)
  }

  // Reference compression contract (components/arrow_ext/src/ipc.rs:48-59,
  // 106-121): the encoded IPC payload is zstd-bulk-compressed at level 3
  // once it reaches 80 KiB; smaller payloads ship uncompressed
  // (CompressOptions::default). ArrowPayload.compression: NONE=0 / ZSTD=1.
  private[graft] val CompressMinLength: Int = 80 * 1024
  private[graft] val ZstdLevel: Int = 3

  def writeSqlResponseArrow(code: Int, ipcStreams: Seq[Array[Byte]]): Array[Byte] = {
    val arrow = new Writer
    val compress = ipcStreams.exists(_.length >= CompressMinLength)
    ipcStreams.foreach { s =>
      arrow.bytes(1,
        if (compress) com.github.luben.zstd.Zstd.compress(s, ZstdLevel) else s)
    }
    if (compress) arrow.uint32(2, 1L) // Compression::ZSTD
    // compression field 2 = NONE (0): omitted, proto3 default
    new Writer().msg(1, header(code, "")).msg(5, arrow).toBytes
  }

  /** compression enum of the response's ArrowPayload (0=NONE, 1=ZSTD) —
    * spec/tooling introspection; [[parseSqlQueryResponse]] already hands
    * back decompressed batches. */
  def arrowCompressionOf(b: Array[Byte]): Int = {
    var method = 0
    val r = new Reader(b)
    while (r.hasNext) r.readKey() match {
      case (5, 2) =>
        val a = r.lenDelim()
        while (a.hasNext) a.readKey() match {
          case (2, 0) => method = a.varint().toInt
          case (_, w) => a.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    method
  }

  /** parsed SqlQueryResponse: (code, error, affectedRows, arrowBatches) */
  def parseSqlQueryResponse(
      b: Array[Byte]): (Int, String, Option[Long], Seq[Array[Byte]]) = {
    var code = 0; var err = ""
    var affected: Option[Long] = None
    var method = 0 // ArrowPayload.compression: NONE=0, ZSTD=1
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
          case (2, 0) => method = a.varint().toInt
          case (_, w) => a.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    val out =
      if (method == 1) batches.map { c =>
        val n = com.github.luben.zstd.Zstd.getFrameContentSize(c)
        require(n >= 0 && n <= Int.MaxValue, s"bad zstd frame size $n")
        com.github.luben.zstd.Zstd.decompress(c, n.toInt)
      } else batches
    (code, err, affected, out.toSeq)
  }
}
