package graft

import graft.engine.TsdbEngine
import graft.server.GraftPgServer
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** PostgreSQL wire protocol served on a real socket
  * (reference `server/src/postgresql/`): startup handshake (incl. the SSL
  * denial), simple queries, the reference's text encodings (timestamps as
  * epoch millis), DDL/DML command tags, error responses, and the
  * extended-protocol refusal — all exercised with a hand-rolled libpq-style
  * client over an ephemeral port.
  */
class PgServerSpec extends SparkSpec {

  /** Minimal blocking PG v3 client: startup + simple queries. */
  private final class PgClient(port: Int, ssl: Boolean = false) {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

    var params: Map[String, String] = Map.empty

    def startup(): Unit = {
      if (ssl) { // SSLRequest — server must answer a single 'N'
        out.writeInt(8); out.writeInt(80877103); out.flush()
        assert(in.readByte() == 'N'.toByte)
      }
      val kv = Seq("user" -> "graft", "database" -> "public")
      val body = kv.flatMap { case (k, v) =>
        k.getBytes(UTF_8).toSeq ++ Seq(0.toByte) ++ v.getBytes(UTF_8) :+ 0.toByte
      } :+ 0.toByte
      out.writeInt(4 + 4 + body.length); out.writeInt(196608)
      out.write(body.toArray); out.flush()
      // read until ReadyForQuery
      var ready = false
      while (!ready) {
        val (t, payload) = readMsg()
        t match {
          case 'R' => assert(payload.length == 4 && payload(3) == 0) // AuthOk
          case 'S' =>
            val (k, off) = cstr(payload, 0); val (v, _) = cstr(payload, off)
            params += (k -> v)
          case 'K' => assert(payload.length == 8) // BackendKeyData
          case 'Z' => ready = true
          case other => fail(s"unexpected startup message '$other'")
        }
      }
    }

    private def cstr(b: Array[Byte], from: Int): (String, Int) = {
      var i = from
      while (b(i) != 0) i += 1
      (new String(b, from, i - from, UTF_8), i + 1)
    }

    private def readMsg(): (Char, Array[Byte]) = {
      val t = in.readByte().toChar
      val len = in.readInt()
      val payload = new Array[Byte](len - 4)
      in.readFully(payload)
      (t, payload)
    }

    def send(tpe: Char, payload: Array[Byte]): Unit = {
      out.writeByte(tpe); out.writeInt(4 + payload.length)
      out.write(payload); out.flush()
    }

    /** Send a simple query; collect messages until ReadyForQuery. */
    def query(sql: String): QueryResult = {
      send('Q', sql.getBytes(UTF_8) :+ 0.toByte)
      var cols = Seq.empty[(String, Int)]
      val rows = Seq.newBuilder[Seq[String]]
      var tag: String = null
      var err: String = null
      var empty = false
      var done = false
      while (!done) {
        val (t, payload) = readMsg()
        t match {
          case 'T' =>
            val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
            var off = 2
            cols = (0 until n).map { _ =>
              val (name, o1) = cstr(payload, off)
              val oid = ((payload(o1 + 6) & 0xff) << 24) | ((payload(o1 + 7) & 0xff) << 16) |
                ((payload(o1 + 8) & 0xff) << 8) | (payload(o1 + 9) & 0xff)
              off = o1 + 18
              (name, oid)
            }
          case 'D' =>
            val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
            var off = 2
            rows += (0 until n).map { _ =>
              val len = java.nio.ByteBuffer.wrap(payload, off, 4).getInt
              off += 4
              if (len < 0) null
              else { val s = new String(payload, off, len, UTF_8); off += len; s }
            }
          case 'C' => tag = cstr(payload, 0)._1
          case 'I' => empty = true
          case 'E' =>
            // fields: type byte + cstring, 'M' = message
            var off = 0
            while (payload(off) != 0) {
              val f = payload(off).toChar
              val (v, o) = cstr(payload, off + 1)
              if (f == 'M') err = v
              off = o
            }
          case 'Z' => done = true
          case other => fail(s"unexpected message '$other'")
        }
      }
      QueryResult(cols, rows.result(), tag, err, empty)
    }

    /** Read messages until ReadyForQuery; return the first error text. */
    def drainReady(): String = {
      var err: String = null
      var done = false
      while (!done) {
        val (t, payload) = readMsg()
        t match {
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
      err
    }

    def terminate(): Unit = {
      send('X', Array.emptyByteArray)
      sock.close()
    }
  }

  private case class QueryResult(
      cols: Seq[(String, Int)], rows: Seq[Seq[String]],
      tag: String, err: String, empty: Boolean)

  test("pg server: handshake, DDL/DML tags, typed selects, errors") {
    val e = new TsdbEngine(spark, tmpDir("pgsrv-wh"))
    val srv = new GraftPgServer(e).start()
    try {
      val c = new PgClient(srv.boundPort, ssl = true)
      c.startup()
      assert(c.params.get("server_encoding").contains("UTF8"))

      // DDL → OK tag (Tag::new("OK").with_rows)
      val ddl = c.query(
        """CREATE TABLE pgt (t timestamp NOT NULL, host string TAG,
          |  v double, n bigint, ok boolean, TIMESTAMP KEY(t))""".stripMargin)
      assert(ddl.err == null, s"ddl: ${ddl.err}")
      assert(ddl.tag == "OK 0" || ddl.empty) // affected_rows=0 → EmptyQuery (handler.rs:99)

      val ins = c.query(
        """INSERT INTO pgt (t, host, v, n, ok) VALUES
          |  (1704067200000, 'a', 1.5, 7, true),
          |  (1704067260000, 'b', 2.5, 8, false)""".stripMargin)
      assert(ins.err == null, s"ins: ${ins.err}")
      assert(ins.tag == "OK 2", s"tag: ${ins.tag}")

      // typed select: text cells, reference encodings
      val q = c.query("SELECT t, host, v, n, ok FROM pgt ORDER BY host")
      assert(q.err == null, s"q: ${q.err}")
      assert(q.tag == "SELECT 2")
      assert(q.cols.map(_._1) == Seq("t", "host", "v", "n", "ok"))
      // OIDs: timestamp=1114, text=25, float8=701, int8=20, bool=16
      assert(q.cols.map(_._2) == Seq(1114, 25, 701, 20, 16))
      assert(q.rows(0) == Seq("1704067200000", "a", "1.5", "7", "t"))
      assert(q.rows(1) == Seq("1704067260000", "b", "2.5", "8", "f"))

      // NULL cell renders as SQL NULL (wire -1 length)
      val qn = c.query("SELECT CAST(NULL AS STRING) AS s, 1 AS one FROM pgt LIMIT 1")
      assert(qn.rows(0)(0) == null && qn.rows(0)(1) == "1")

      // empty query string → EmptyQueryResponse
      assert(c.query("   ").empty)

      // engine error → ErrorResponse, connection stays usable
      val bad = c.query("SELECT nope FROM does_not_exist")
      assert(bad.err != null)
      assert(c.query("SELECT count(*) AS n FROM pgt").rows.head.head == "2")

      // extended protocol refused like PlaceholderExtendedQueryHandler:
      // Parse answers an error, Sync re-arms ReadyForQuery
      c.send('P', Array[Byte](0, 0, 0)) // dummy Parse payload
      c.send('S', Array.emptyByteArray)
      val refusal = c.drainReady()
      assert(refusal != null && refusal.contains("extended"), s"refusal: $refusal")
      // connection stays usable after the refusal
      assert(c.query("SELECT 1 AS x").rows.head.head == "1")

      c.terminate()

      // second client: server accepts more than one connection
      val c2 = new PgClient(srv.boundPort)
      c2.startup()
      assert(c2.query("SELECT 41 + 1 AS a").rows.head.head == "42")

      // ---- integration_tests/postgresql/basic.sh, statement for statement
      assert(c2.query("show tables").err == null)
      val sn = c2.query("select 1, now();")
      assert(sn.err == null && sn.rows.head.head == "1", sn.toString)
      assert(c2.query("drop table if exists demo;").err == null)
      assert(c2.query(
        "CREATE TABLE `demo`(`name`string TAG,`id` int TAG," +
          "`value` double NOT NULL,`t` timestamp NOT NULL," +
          "TIMESTAMP KEY(t)) ENGINE = Analytic with(enable_ttl=false);").err == null)
      val di = c2.query(
        "insert into demo (name,value,t)values(\"horaedb\",1,1691116127622);")
      assert(di.err == null, s"${di.err}")
      val dq = c2.query("select * from demo;")
      assert(dq.err == null && dq.rows.length == 1, s"${dq.err}")
      assert(dq.rows.head(dq.cols.indexWhere(_._1 == "name")) == "horaedb")
      c2.terminate()
    } finally srv.stop()
  }
}
