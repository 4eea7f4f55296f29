package graft

import graft.engine.TsdbEngine
import graft.server.GraftMysqlServer
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** MySQL wire protocol served on a real socket (reference
  * `server/src/mysql/`): v10 handshake, COM_QUERY text resultsets with the
  * reference's type/encoding table, OK/ERR packets, prepared-statement
  * refusal, and the federated client-compat queries — exercised with a
  * hand-rolled client over an ephemeral port.
  */
class MysqlServerSpec extends SparkSpec {

  private final class MyClient(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    private var seq = 0

    def readPacket(): Array[Byte] = {
      val b0 = in.read(); val b1 = in.read(); val b2 = in.read()
      val len = b0 | (b1 << 8) | (b2 << 16)
      seq = (in.readByte() & 0xff) + 1
      val p = new Array[Byte](len)
      in.readFully(p)
      p
    }

    def writePacket(payload: Array[Byte]): Unit = {
      out.write(payload.length & 0xff)
      out.write((payload.length >> 8) & 0xff)
      out.write((payload.length >> 16) & 0xff)
      out.write(seq & 0xff); seq += 1
      out.write(payload); out.flush()
    }

    var serverVersion: String = _

    def handshake(): Unit = {
      val hs = readPacket()
      assert(hs(0) == 10, "protocol version v10")
      val end = hs.indexOf(0, 1)
      serverVersion = new String(hs, 1, end - 1, UTF_8)
      // HandshakeResponse41: caps, max packet, charset, 23 zero bytes,
      // user cstring, auth-len 0
      val b = new java.io.ByteArrayOutputStream()
      def u32(v: Long): Unit = (0 until 4).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
      u32(0x0200L | 0x8000L) // PROTOCOL_41 | SECURE_CONNECTION
      u32(16777216L)
      b.write(33)
      b.write(new Array[Byte](23), 0, 23)
      b.write("root".getBytes(UTF_8)); b.write(0)
      b.write(0) // empty auth response
      writePacket(b.toByteArray)
      val ok = readPacket()
      assert((ok(0) & 0xff) == 0x00, "AuthenticationOk")
      seq = 0
    }

    private def lenenc(p: Array[Byte], off: Int): (Long, Int) = (p(off) & 0xff) match {
      case 0xfc => (((p(off + 1) & 0xff) | ((p(off + 2) & 0xff) << 8)).toLong, off + 3)
      case 0xfd => (((p(off + 1) & 0xff) | ((p(off + 2) & 0xff) << 8) |
        ((p(off + 3) & 0xff) << 16)).toLong, off + 4)
      case 0xfe => ((0 until 8).map(i => (p(off + 1 + i) & 0xffL) << (8 * i)).sum, off + 9)
      case v => (v.toLong, off + 1)
    }

    private def lenencString(p: Array[Byte], off: Int): (String, Int) = {
      val (n, o) = lenenc(p, off)
      (new String(p, o, n.toInt, UTF_8), o + n.toInt)
    }

    case class Result(cols: Seq[(String, Int)], rows: Seq[Seq[String]],
        affected: Long = -1, err: String = null)

    def query(sql: String): Result = {
      seq = 0
      writePacket(Array[Byte](0x03) ++ sql.getBytes(UTF_8))
      val first = readPacket()
      (first(0) & 0xff) match {
        case 0x00 => // OK
          val (aff, _) = lenenc(first, 1)
          Result(Nil, Nil, affected = aff)
        case 0xff =>
          Result(Nil, Nil, err = new String(first, 9, first.length - 9, UTF_8))
        case _ =>
          val (ncols, _) = lenenc(first, 0)
          val cols = (0 until ncols.toInt).map { _ =>
            val p = readPacket()
            var off = 0
            // def, schema, table, org_table, name, org_name
            (0 until 4).foreach(_ => off = lenencString(p, off)._2)
            val (name, o5) = lenencString(p, off)
            val (_, o6) = lenencString(p, o5)
            // 0x0c marker, charset u16, length u32 → type at o6+7
            val tpe = p(o6 + 7) & 0xff
            (name, tpe)
          }
          assert((readPacket()(0) & 0xff) == 0xfe, "EOF after columns")
          val rows = Seq.newBuilder[Seq[String]]
          var done = false
          while (!done) {
            val p = readPacket()
            if ((p(0) & 0xff) == 0xfe && p.length < 9) done = true
            else {
              var off = 0
              rows += (0 until ncols.toInt).map { _ =>
                if ((p(off) & 0xff) == 0xfb) { off += 1; null }
                else { val (s, o) = lenencString(p, off); off = o; s }
              }
            }
          }
          Result(cols, rows.result())
      }
    }

    def prepare(sql: String): String = { // returns error message
      seq = 0
      writePacket(Array[Byte](0x16) ++ sql.getBytes(UTF_8))
      val p = readPacket()
      assert((p(0) & 0xff) == 0xff)
      new String(p, 9, p.length - 9, UTF_8)
    }

    def quit(): Unit = { seq = 0; writePacket(Array[Byte](0x01)); sock.close() }
  }

  test("mysql server: handshake, queries, federated compat, errors") {
    val e = new TsdbEngine(spark, tmpDir("mysrv-wh"))
    val srv = new GraftMysqlServer(e).start()
    try {
      val c = new MyClient(srv.boundPort)
      c.handshake()
      assert(c.serverVersion.contains("graft"))

      // federated compat: the JDBC-driver handshake chatter
      val vc = c.query("SELECT @@version_comment LIMIT 1")
      assert(vc.cols.map(_._1) == Seq("@@version_comment"))
      assert(vc.rows.head.head.contains("graft"))
      assert(c.query("SET NAMES utf8mb4").affected == 0)
      assert(c.query("SHOW VARIABLES LIKE 'lower_case_table_names'").rows.isEmpty)
      assert(c.query("SELECT DATABASE()").rows.head.head == "public")

      // DDL + INSERT through the engine: OK packets with affected_rows
      val ddl = c.query(
        """CREATE TABLE myt (t timestamp NOT NULL, host string TAG,
          |  v double, n bigint, ok boolean, TIMESTAMP KEY(t))""".stripMargin)
      assert(ddl.err == null, s"ddl: ${ddl.err}")
      val ins = c.query(
        """INSERT INTO myt (t, host, v, n, ok) VALUES
          |  (1704067200000, 'a', 1.5, 7, true),
          |  (1704067260000, 'b', 2.5, 8, false)""".stripMargin)
      assert(ins.affected == 2, s"affected=${ins.affected} err=${ins.err}")

      // text resultset: reference type bytes (ts/int→LONG=3, double=5,
      // varchar=15, bool→SHORT=2) and encodings (ts as millis, bool as 0/1)
      val q = c.query("SELECT t, host, v, n, ok FROM myt ORDER BY host")
      assert(q.err == null, s"q: ${q.err}")
      assert(q.cols == Seq(("t", 3), ("host", 15), ("v", 5), ("n", 3), ("ok", 2)))
      assert(q.rows(0) == Seq("1704067200000", "a", "1.5", "7", "1"))
      assert(q.rows(1) == Seq("1704067260000", "b", "2.5", "8", "0"))

      // NULL cell → 0xfb marker
      val qn = c.query("SELECT CAST(NULL AS STRING) AS s, 1 AS one FROM myt LIMIT 1")
      assert(qn.rows.head(0) == null && qn.rows.head(1) == "1")

      // engine error → ERR packet; connection survives
      assert(c.query("SELECT x FROM no_such_table").err != null)
      assert(c.query("SELECT count(*) AS n FROM myt").rows.head.head == "2")

      // prepared statements refused (worker.rs:67-75)
      assert(c.prepare("SELECT ?").contains("not supported"))

      // ---- integration_tests/mysql/basic.sh, statement for statement
      assert(c.query("show tables").err == null)
      val sn = c.query("select 1, now()")
      assert(sn.err == null && sn.rows.head.head == "1" &&
        sn.rows.head(1).toLong > 0L, sn.toString)
      assert(c.query(
        "CREATE TABLE `demo`(`name`string TAG,`id` int TAG," +
          "`value` double NOT NULL,`t` timestamp NOT NULL," +
          "TIMESTAMP KEY(t)) ENGINE = Analytic with(enable_ttl=false)").err == null)
      val di = c.query(
        "insert into demo (name,value,t)values(\"horaedb\",1,1683280523000)")
      assert(di.err == null && di.affected == 1, s"${di.err}")
      val dq = c.query("select * from demo")
      assert(dq.err == null && dq.rows.length == 1, s"${dq.err}")
      assert(dq.cols.map(_._1).contains("name") &&
        dq.rows.head(dq.cols.indexWhere(_._1 == "name")) == "horaedb")

      c.quit()
    } finally srv.stop()
  }
}
