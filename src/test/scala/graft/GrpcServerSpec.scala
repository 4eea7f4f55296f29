package graft

import graft.engine.TsdbEngine
import graft.server.{GraftGrpcServer, GrpcWireClient, Pb}

/** End-to-end gRPC storage-service round trip with the hand-rolled
  * HTTP/2 + HPACK + protobuf wire client ([[GrpcWireClient]]) — the same
  * prove-it-on-the-wire pattern as MysqlServerSpec/PgServerSpec (no gRPC
  * library on either side). Mirrors the reference SDK flow: Write points,
  * SqlQuery them back (arrow payload), DDL through SqlQuery
  * (affected_rows). */
class GrpcServerSpec extends SparkSpec {

  private type Client = GrpcWireClient

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
