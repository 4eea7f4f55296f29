package graft

import java.io.{BufferedInputStream, DataInputStream, DataOutputStream, BufferedOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

import graft.engine.TsdbEngine
import graft.server.{GraftGrpcServer, GraftPgServer, GrpcWireClient, Pb}

/** Concurrent multi-protocol stress: all wire servers share ONE
  * SparkSession and the engine's per-table locks, but nothing before this
  * spec proved correctness under *parallel* clients. Drives five clients
  * at once across two protocols (gRPC storage service + PostgreSQL v3):
  *
  *   - two gRPC writers RACING the auto-create of the same table with
  *     DIFFERENT column sets (the create race: the loser must land its
  *     extra columns via the ifAbsent add, not silently drop values —
  *     catalog.create is synchronized, `GraftCatalog.scala`);
  *   - a PG reader and a gRPC reader polling count(*) concurrently with
  *     the writes (counts must be non-decreasing: per-table write locks +
  *     manifest swaps may never expose a partial batch);
  *   - a PG DDL client creating/inserting/querying an unrelated table
  *     (shared-session isolation).
  *
  * End state: exact row count and sum through BOTH protocols, and the
  * catalog holds every column either writer introduced.
  */
class ConcurrencySpec extends SparkSpec {

  /** Minimal blocking PG v3 client (subset of PgServerSpec's). */
  private final class PgClient(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

    def startup(): Unit = {
      val kv = Seq("user" -> "graft", "database" -> "public")
      val body = kv.flatMap { case (k, v) =>
        k.getBytes(UTF_8).toSeq ++ Seq(0.toByte) ++ v.getBytes(UTF_8) :+ 0.toByte
      } :+ 0.toByte
      out.writeInt(4 + 4 + body.length); out.writeInt(196608)
      out.write(body.toArray); out.flush()
      var ready = false
      while (!ready) {
        val (t, _) = readMsg()
        if (t == 'Z') ready = true
      }
    }

    private def readMsg(): (Char, Array[Byte]) = {
      val t = in.readByte().toChar
      val len = in.readInt()
      val payload = new Array[Byte](len - 4)
      in.readFully(payload)
      (t, payload)
    }

    private def cstr(b: Array[Byte], from: Int): (String, Int) = {
      var i = from
      while (b(i) != 0) i += 1
      (new String(b, from, i - from, UTF_8), i + 1)
    }

    /** simple query → (rows of string cells, error message or null) */
    def query(sql: String): (Seq[Seq[String]], String) = {
      out.writeByte('Q'); val b = sql.getBytes(UTF_8) :+ 0.toByte
      out.writeInt(4 + b.length); out.write(b); out.flush()
      val rows = Seq.newBuilder[Seq[String]]
      var err: String = null
      var done = false
      while (!done) {
        val (t, payload) = readMsg()
        t match {
          case 'D' =>
            val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
            var off = 2
            rows += (0 until n).map { _ =>
              val len = java.nio.ByteBuffer.wrap(payload, off, 4).getInt
              off += 4
              if (len < 0) null
              else { val s = new String(payload, off, len, UTF_8); off += len; s }
            }
          case 'E' =>
            var off = 0
            while (payload(off) != 0) {
              val f = payload(off).toChar
              val (v, o) = cstr(payload, off + 1)
              if (f == 'M' && err == null) err = v
              off = o
            }
          case 'Z' => done = true
          case _ => ()
        }
      }
      (rows.result(), err)
    }

    def close(): Unit = {
      out.writeByte('X'); out.writeInt(4); out.flush(); sock.close()
    }
  }

  private def grpcWrite(
      c: GrpcWireClient, table: String, host: String,
      fields: Seq[(String, Double)], baseTs: Long, n: Int): Long = {
    val fieldNames = fields.map(_._1)
    val req = Pb.WriteRequest("public", Seq(Pb.WriteTableRequest(
      table, Seq("host"), fieldNames,
      Seq(Pb.WriteSeriesEntry(
        Seq(Pb.TagPb(0, Pb.Value(str = Some(host)))),
        (0 until n).map(i => Pb.FieldGroup(baseTs + i * 1000L,
          fields.zipWithIndex.map { case ((_, v), fi) =>
            Pb.FieldPb(fi, Pb.Value(f64 = Some(v + i))) })))))))
    val (resp, status) = c.call("/storage.StorageService/Write",
      Pb.writeWriteRequest(req))
    assert(status == 0)
    val (code, err, success, _) = Pb.parseWriteResponse(resp)
    assert(code == 200, err)
    success
  }

  private def grpcCount(c: GrpcWireClient, sql: String): Either[String, Long] = {
    val (resp, status) = c.call("/storage.StorageService/SqlQuery",
      Pb.writeSqlQueryRequest(Pb.SqlQueryRequest("public", Nil, sql)))
    assert(status == 0)
    val (code, err, _, batches) = Pb.parseSqlQueryResponse(resp)
    if (code != 200) Left(err)
    else Right(org.apache.spark.sql.GraftBridge
      .fromArrowStream(spark, batches.head).collect().head.getLong(0))
  }

  test("parallel gRPC writers + PG/gRPC readers + PG DDL stay consistent") {
    val engine = new TsdbEngine(spark, tmpDir("conc"))
    val grpc = new GraftGrpcServer(engine).start()
    val pg = new GraftPgServer(engine).start()
    val failure = new AtomicReference[Throwable](null)
    val start = new CountDownLatch(1)
    val writersDone = new CountDownLatch(2)
    def thread(name: String)(body: => Unit): Thread = {
      val t = new Thread(() => {
        start.await()
        try body catch { case e: Throwable => failure.compareAndSet(null, e) }
      }, name)
      t.start(); t
    }
    val t0 = 1704067200000L
    val batches = 8
    val rowsPerBatch = 5

    // writer A: usage only for 3 batches, then introduces ext_a (auto-ADD
    // racing B's writes on the live table)
    val wa = thread("writer-a") {
      val c = new GrpcWireClient(grpc.boundPort)
      try {
        for (b <- 0 until batches) {
          val fields = if (b < 3) Seq("usage" -> 1.0)
            else Seq("usage" -> 1.0, "ext_a" -> 10.0)
          assert(grpcWrite(c, "conc_cpu", s"a$b", fields,
            t0 + b * 100000L, rowsPerBatch) == rowsPerBatch)
        }
      } finally { c.close(); writersDone.countDown() }
    }
    // writer B: different column set from the very first write → the
    // create race: whichever writer creates the table, B's ext_b and A's
    // usage/ext_a must ALL end up in the catalog
    val wb = thread("writer-b") {
      val c = new GrpcWireClient(grpc.boundPort)
      try {
        for (b <- 0 until batches) {
          assert(grpcWrite(c, "conc_cpu", s"b$b",
            Seq("usage" -> 2.0, "ext_b" -> 20.0),
            t0 + 50000L + b * 100000L, rowsPerBatch) == rowsPerBatch)
        }
      } finally { c.close(); writersDone.countDown() }
    }
    // readers: counts must never go backwards while writers run
    def monotone(read: () => Either[String, Long]): Unit = {
      var last = 0L
      while (writersDone.getCount > 0) {
        read() match {
          case Right(n) =>
            assert(n >= last, s"count went backwards: $last -> $n")
            last = n
          case Left(err) => // table not created yet — only that error is ok
            assert(err != null && (err.toLowerCase.contains("not") || last == 0L),
              String.valueOf(err))
        }
      }
    }
    val rg = thread("reader-grpc") {
      val c = new GrpcWireClient(grpc.boundPort)
      try monotone(() => grpcCount(c, "SELECT count(*) AS n FROM conc_cpu"))
      finally c.close()
    }
    val rp = thread("reader-pg") {
      val c = new PgClient(pg.boundPort)
      c.startup()
      try monotone { () =>
        val (rows, err) = c.query("SELECT count(*) AS n FROM conc_cpu")
        if (err != null) Left(err) else Right(rows.head.head.toLong)
      } finally c.close()
    }
    // PG DDL client on an unrelated table through the shared session
    val dd = thread("pg-ddl") {
      val c = new PgClient(pg.boundPort)
      c.startup()
      try {
        val (_, cerr) = c.query(
          "CREATE TABLE conc_ddl (timestamp TIMESTAMP NOT NULL TIMESTAMP KEY, " +
            "host STRING TAG, v DOUBLE)")
        assert(cerr == null, String.valueOf(cerr))
        for (i <- 0 until 10) {
          val (_, ierr) = c.query(
            s"INSERT INTO conc_ddl (timestamp, host, v) VALUES (${t0 + i}, 'h$i', $i.5)")
          assert(ierr == null, String.valueOf(ierr))
        }
        val (rows, qerr) = c.query("SELECT count(*) AS n FROM conc_ddl")
        assert(qerr == null && rows.head.head.toLong == 10L)
      } finally c.close()
    }

    start.countDown()
    Seq(wa, wb, rg, rp, dd).foreach(_.join(TimeUnit.MINUTES.toMillis(5)))
    if (failure.get() != null) throw failure.get()

    // end-state consistency through BOTH protocols
    val expected = 2L * batches * rowsPerBatch
    val gc = new GrpcWireClient(grpc.boundPort)
    val pc = new PgClient(pg.boundPort); pc.startup()
    try {
      assert(grpcCount(gc, "SELECT count(*) AS n FROM conc_cpu") == Right(expected))
      val (rows, err) = pc.query("SELECT count(*) AS n FROM conc_cpu")
      assert(err == null && rows.head.head.toLong == expected)
      // every column either writer introduced is in the catalog
      val cols = engine.catalog.get("conc_cpu").columns.map(_.name).toSet
      assert(Set("timestamp", "host", "usage", "ext_a", "ext_b").subsetOf(cols), cols)
      // no silently-dropped field values: ext_b was present in ALL of B's
      // rows (the create-race loser scenario), ext_a in A's batches >= 3
      assert(grpcCount(gc,
        "SELECT count(ext_b) AS n FROM conc_cpu") ==
        Right(batches * rowsPerBatch.toLong))
      assert(grpcCount(gc,
        "SELECT count(ext_a) AS n FROM conc_cpu") ==
        Right((batches - 3) * rowsPerBatch.toLong))
      // value integrity: sum(usage) = A rows (1.0 + i) + B rows (2.0 + i)
      val perBatch = (0 until rowsPerBatch).map(_.toDouble).sum
      val expectedUsage =
        batches * (rowsPerBatch * 1.0 + perBatch) +
        batches * (rowsPerBatch * 2.0 + perBatch)
      val (srows, serr) = pc.query(
        "SELECT CAST(sum(usage) AS BIGINT) AS s FROM conc_cpu")
      assert(serr == null && srows.head.head.toLong == expectedUsage.toLong)
    } finally {
      gc.close(); pc.close(); grpc.stop(); pg.stop()
    }
  }
}
