package graft

import graft.engine.TsdbEngine
import graft.server.{GraftGrpcServer, Http2, Pb}
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.Socket
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end gRPC storage-service round trip with a hand-rolled
  * HTTP/2 + HPACK + protobuf wire client — the same prove-it-on-the-wire
  * pattern as MysqlServerSpec/PgServerSpec (no gRPC library on either
  * side). Mirrors the reference SDK flow: Write points, SqlQuery them
  * back (arrow payload), DDL through SqlQuery (affected_rows). */
class GrpcServerSpec extends SparkSpec {

  /** Minimal gRPC-over-HTTP/2 unary client. */
  private final class Client(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setTcpNoDelay(true)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new BufferedOutputStream(sock.getOutputStream)
    private var nextStream = 1
    private val decoder = new Http2.HpackDecoder

    // connection preface + SETTINGS (huge initial window: the server's
    // documented contract is announced-ample flow control)
    out.write("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes("US-ASCII"))
    frame(0x4, 0, 0, settings(Seq((4, Int.MaxValue)))) // INITIAL_WINDOW_SIZE
    out.flush()

    private def settings(kvs: Seq[(Int, Int)]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(kvs.size * 6)
      kvs.foreach { case (k, v) => b.putShort(k.toShort).putInt(v) }
      b.array()
    }

    private def frame(tpe: Int, flags: Int, sid: Int, payload: Array[Byte]): Unit = {
      val len = payload.length
      out.write((len >>> 16) & 0xFF); out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
      out.write(tpe); out.write(flags)
      out.write((sid >>> 24) & 0x7F); out.write((sid >>> 16) & 0xFF)
      out.write((sid >>> 8) & 0xFF); out.write(sid & 0xFF)
      out.write(payload)
    }

    /** unary call: returns (response message bytes, grpc-status, trailers) */
    def call(path: String, msg: Array[Byte]): (Array[Byte], Int) = {
      val sid = nextStream; nextStream += 2
      val enc = new Http2.HpackEncoder
      frame(0x1, 0x4, sid, enc.encode(Seq(
        (":method", "POST"), (":scheme", "http"), (":path", path),
        (":authority", "localhost"), ("content-type", "application/grpc"),
        ("te", "trailers"))))
      val framed = new Array[Byte](msg.length + 5)
      framed(1) = ((msg.length >>> 24) & 0xFF).toByte
      framed(2) = ((msg.length >>> 16) & 0xFF).toByte
      framed(3) = ((msg.length >>> 8) & 0xFF).toByte
      framed(4) = (msg.length & 0xFF).toByte
      System.arraycopy(msg, 0, framed, 5, msg.length)
      frame(0x0, 0x1, sid, framed) // DATA + END_STREAM
      out.flush()
      // read frames until the END_STREAM trailers for our stream
      val body = new java.io.ByteArrayOutputStream()
      var status = -1
      var done = false
      while (!done) {
        val len = (in.readUnsignedByte() << 16) | (in.readUnsignedByte() << 8) |
          in.readUnsignedByte()
        val tpe = in.readUnsignedByte(); val flags = in.readUnsignedByte()
        val fsid = in.readInt() & 0x7FFFFFFF
        val payload = new Array[Byte](len)
        in.readFully(payload)
        tpe match {
          case 0x4 => if ((flags & 0x1) == 0) { frame(0x4, 0x1, 0, Array.emptyByteArray); out.flush() }
          case 0x1 if fsid == sid =>
            decoder.decode(payload, 0, len).foreach {
              case ("grpc-status", v) => status = v.toInt
              case _                  => ()
            }
            if ((flags & 0x1) != 0) done = true
          case 0x0 if fsid == sid =>
            body.write(payload)
            if ((flags & 0x1) != 0) done = true
          case _ => ()
        }
      }
      val raw = body.toByteArray
      val resp =
        if (raw.length >= 5) {
          val n = ((raw(1) & 0xFF) << 24) | ((raw(2) & 0xFF) << 16) |
            ((raw(3) & 0xFF) << 8) | (raw(4) & 0xFF)
          java.util.Arrays.copyOfRange(raw, 5, 5 + n)
        } else Array.emptyByteArray
      (resp, status)
    }

    def close(): Unit = sock.close()
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("gRPC storage service: Write auto-creates, SqlQuery round-trips arrow") {
    val engine = new TsdbEngine(spark, tmp("grpc-e2e"))
    val server = new GraftGrpcServer(engine).start()
    try {
      val c = new Client(server.boundPort)
      // 1. Write: two series, two points each → auto-create with TAG cols
      val write = Pb.WriteRequest("public", Seq(Pb.WriteTableRequest(
        "grpc_cpu", Seq("host", "dc"), Seq("usage", "cores"),
        Seq(
          Pb.WriteSeriesEntry(
            Seq(Pb.TagPb(0, Pb.Value(str = Some("h1"))),
                Pb.TagPb(1, Pb.Value(str = Some("us")))),
            Seq(Pb.FieldGroup(1704067200000L,
                  Seq(Pb.FieldPb(0, Pb.Value(f64 = Some(0.5))),
                      Pb.FieldPb(1, Pb.Value(i64 = Some(8L))))),
                Pb.FieldGroup(1704067260000L,
                  Seq(Pb.FieldPb(0, Pb.Value(f64 = Some(0.7))))))),
          Pb.WriteSeriesEntry(
            Seq(Pb.TagPb(0, Pb.Value(str = Some("h2"))),
                Pb.TagPb(1, Pb.Value(str = Some("eu")))),
            Seq(Pb.FieldGroup(1704067200000L,
                  Seq(Pb.FieldPb(0, Pb.Value(f64 = Some(0.9))))))))
      )))
      val (wresp, wstatus) = c.call("/storage.StorageService/Write",
        Pb.writeWriteRequest(write))
      assert(wstatus == 0)
      val (wcode, werr, success, failed) = Pb.parseWriteResponse(wresp)
      assert(wcode == 200 && werr.isEmpty, werr)
      assert(success == 3 && failed == 0)

      // 2. SqlQuery SELECT → arrow payload decodable by Spark's own reader
      val (qresp, qstatus) = c.call("/storage.StorageService/SqlQuery",
        Pb.writeSqlQueryRequest(Pb.SqlQueryRequest("public", Seq("grpc_cpu"),
          "SELECT host, dc, usage, cores FROM grpc_cpu ORDER BY timestamp, host")))
      assert(qstatus == 0)
      val (qcode, qerr, affected, batches) = Pb.parseSqlQueryResponse(qresp)
      assert(qcode == 200 && qerr.isEmpty, qerr)
      assert(affected.isEmpty && batches.length == 1)
      val back = org.apache.spark.sql.GraftBridge
        .fromArrowStream(spark, batches.head)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getDouble(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(back.toSeq == Seq(
        ("h1", "us", 0.5, 8L), ("h2", "eu", 0.9, -1L), ("h1", "us", 0.7, -1L)))

      // 3. append mode: a second Write lands next to the first
      val (wresp2, _) = c.call("/storage.StorageService/Write",
        Pb.writeWriteRequest(Pb.WriteRequest("public", Seq(Pb.WriteTableRequest(
          "grpc_cpu", Seq("host", "dc"), Seq("usage"),
          Seq(Pb.WriteSeriesEntry(
            Seq(Pb.TagPb(0, Pb.Value(str = Some("h1"))),
                Pb.TagPb(1, Pb.Value(str = Some("us"))),
            ),
            Seq(Pb.FieldGroup(1704067320000L,
              Seq(Pb.FieldPb(0, Pb.Value(f64 = Some(0.4)))))))))))))
      assert(Pb.parseWriteResponse(wresp2)._3 == 1)

      // 4. DDL/DML through SqlQuery → affected_rows output
      val (dresp, _) = c.call("/storage.StorageService/SqlQuery",
        Pb.writeSqlQueryRequest(Pb.SqlQueryRequest("public", Nil,
          "INSERT INTO grpc_cpu (timestamp, host, dc, usage) " +
            "VALUES (1704067380000, 'h3', 'ap', 0.2)")))
      val (dcode, _, daffected, dbatches) = Pb.parseSqlQueryResponse(dresp)
      assert(dcode == 200 && daffected.contains(1L) && dbatches.isEmpty)

      // 5. the engine surface agrees: 5 rows total now
      val (cresp, _) = c.call("/storage.StorageService/SqlQuery",
        Pb.writeSqlQueryRequest(Pb.SqlQueryRequest("public", Nil,
          "SELECT count(*) AS n FROM grpc_cpu")))
      val (_, _, _, cbatches) = Pb.parseSqlQueryResponse(cresp)
      val n = org.apache.spark.sql.GraftBridge
        .fromArrowStream(spark, cbatches.head).collect().head.getLong(0)
      assert(n == 5L)

      // 6. unknown method → UNIMPLEMENTED(12) in the trailers
      val (_, ustatus) = c.call("/storage.StorageService/PromRemoteQuery",
        Array.emptyByteArray)
      assert(ustatus == 12)

      // 7. engine errors surface as non-OK header codes, not dead streams
      val (eresp, estatus) = c.call("/storage.StorageService/SqlQuery",
        Pb.writeSqlQueryRequest(Pb.SqlQueryRequest("public", Nil,
          "SELECT FROM nothing nonsense")))
      assert(estatus == 0)
      val (ecode, eerr, _, _) = Pb.parseSqlQueryResponse(eresp)
      assert(ecode == 500 && eerr.nonEmpty)
      c.close()
    } finally server.stop()
  }

  test("protobuf codec round-trips the storage message shapes") {
    val req = Pb.WriteRequest("db", Seq(Pb.WriteTableRequest(
      "t", Seq("a"), Seq("f"),
      Seq(Pb.WriteSeriesEntry(
        Seq(Pb.TagPb(0, Pb.Value(str = Some("x")))),
        Seq(Pb.FieldGroup(123456789L,
          Seq(Pb.FieldPb(0, Pb.Value(f64 = Some(-2.25)))))))))))
    val parsed = Pb.parseWriteRequest(Pb.writeWriteRequest(req))
    assert(parsed == req)
    val sq = Pb.SqlQueryRequest("", Seq("t1", "t2"), "SELECT 1")
    assert(Pb.parseSqlQueryRequest(Pb.writeSqlQueryRequest(sq)) == sq)
    // varint edge: max-u64-ish values survive
    val w = new Pb.Writer().int64Always(1, -1L)
    val r = new Pb.Reader(w.toBytes)
    assert(r.readKey() == ((1, 0)) && r.varint() == -1L)
  }
}
