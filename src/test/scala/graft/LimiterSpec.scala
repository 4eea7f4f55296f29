package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.engine.{Limiter, TsdbEngine}
import graft.server.{GraftGrpcServer, GraftHttpServer, GrpcWireClient, Pb}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** Runtime limiter (reference proxy/src/limiter.rs + handlers/admin.rs):
  * read/write block lists and block rules enforced at the protocol
  * entries, mutable through POST /admin/block while the server runs.
  * Error texts match the reference so SDK clients that assert on
  * "Table operation is blocked" (integration_tests/sdk/rust/src/main.rs)
  * behave identically. */
class LimiterSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()
  private def post(url: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def mkEngine(): TsdbEngine = {
    val e = new TsdbEngine(spark, tmpDir("limiter"))
    e.execute("CREATE TABLE lim_t (timestamp TIMESTAMP NOT NULL TIMESTAMP KEY, " +
      "host STRING TAG, v DOUBLE)")
    e.execute("INSERT INTO lim_t (timestamp, host, v) VALUES (1704067200000, 'h1', 1.5)")
    e
  }

  test("block lists refuse reads and writes with the reference error text") {
    val e = mkEngine()
    // read block
    e.limiter.addReadBlock(Seq("lim_t"))
    val qe = intercept[Limiter.BlockedException](
      e.execute("SELECT count(*) FROM lim_t").collect())
    assert(qe.getMessage == "Table operation is blocked, table:lim_t, op:query")
    // unrelated tables still work
    e.execute("CREATE TABLE lim_u (timestamp TIMESTAMP NOT NULL TIMESTAMP KEY, v DOUBLE)")
    e.execute("SELECT 1 AS one").collect()
    e.limiter.removeReadBlock(Seq("lim_t"))
    assert(e.execute("SELECT count(*) AS n FROM lim_t").collect().head.getLong(0) == 1L)

    // write block: SQL INSERT and the gRPC Write path both refuse
    e.limiter.addWriteBlock(Seq("lim_t"))
    val we = intercept[Limiter.BlockedException](
      e.execute("INSERT INTO lim_t (timestamp, host, v) VALUES (1704067260000, 'h2', 2.5)"))
    assert(we.getMessage == "Table operation is blocked, table:lim_t, op:insert")
    val server = new GraftGrpcServer(e).start()
    try {
      val c = new GrpcWireClient(server.boundPort)
      val (resp, status) = c.call("/storage.StorageService/Write",
        Pb.writeWriteRequest(Pb.WriteRequest("public", Seq(Pb.WriteTableRequest(
          "lim_t", Seq("host"), Seq("v"),
          Seq(Pb.WriteSeriesEntry(
            Seq(Pb.TagPb(0, Pb.Value(str = Some("h3")))),
            Seq(Pb.FieldGroup(1704067320000L,
              Seq(Pb.FieldPb(0, Pb.Value(f64 = Some(3.5)))))))))))))
      assert(status == 0)
      val (wcode, werr, _, _) = Pb.parseWriteResponse(resp)
      assert(wcode == 500 && werr.contains("Table operation is blocked"), werr)
      c.close()
    } finally server.stop()
    e.limiter.removeWriteBlock(Seq("lim_t"))
    assert(e.execute("SELECT count(*) AS n FROM lim_t").collect().head.getLong(0) == 1L)
  }

  test("block rules: AnyQuery, AnyInsert, QueryWithoutPredicate, QueryRange") {
    val e = mkEngine()
    import Limiter._

    e.limiter.addRules(Seq(AnyQuery))
    val qe = intercept[BlockedException](e.execute("SELECT 1 AS one"))
    assert(qe.getMessage == "Table operation is blocked by rule:AnyQuery, op:query")
    e.limiter.removeRules(Seq(AnyQuery))

    e.limiter.addRules(Seq(AnyInsert))
    val ie = intercept[BlockedException](
      e.execute("INSERT INTO lim_t (timestamp, host, v) VALUES (1704067260000, 'h2', 2.5)"))
    assert(ie.getMessage == "Table operation is blocked by rule:AnyInsert, op:insert")
    e.execute("SELECT count(*) FROM lim_t").collect() // queries unaffected
    e.limiter.removeRules(Seq(AnyInsert))

    e.limiter.addRules(Seq(QueryWithoutPredicate))
    intercept[BlockedException](e.execute("SELECT count(*) FROM lim_t"))
    // a WHERE directly over the scan passes
    e.execute("SELECT count(*) FROM lim_t WHERE host = 'h1'").collect()
    e.limiter.removeRules(Seq(QueryWithoutPredicate))

    e.limiter.addRules(Seq(QueryRange(3600000L))) // 1h cap
    // 2h bounded range → blocked, with the reference's Debug rule format
    val re = intercept[BlockedException](e.execute(
      "SELECT count(*) FROM lim_t WHERE timestamp >= 1704067200000 " +
        "AND timestamp <= 1704074400000"))
    assert(re.getMessage ==
      "Table operation is blocked by rule:QueryRange(3600000), op:query")
    // literal-on-left operand order must not evade the cap
    intercept[BlockedException](e.execute(
      "SELECT count(*) FROM lim_t WHERE 1704067200000 <= timestamp " +
        "AND timestamp <= 1704074400000"))
    // 30m → passes
    e.execute("SELECT count(*) FROM lim_t WHERE timestamp >= 1704067200000 " +
      "AND timestamp <= 1704069000000").collect()
    // UNBOUNDED is blocked (reference: extract_time_range → min_to_max →
    // checked_sub overflow → i64::MAX > threshold) — the full-history scan
    // is exactly what this rule exists to brake
    intercept[BlockedException](
      e.execute("SELECT count(*) FROM lim_t WHERE host = 'h1'"))
    // half-bounded is blocked too (width = MAX − start, still > 1h)
    intercept[BlockedException](e.execute(
      "SELECT count(*) FROM lim_t WHERE timestamp >= 1704067200000"))
    // an OR of one-sided bounds is a tautology (unbounded) — its
    // disjuncts must NOT be conflated into a bounded 30m range that
    // slips the cap
    intercept[BlockedException](e.execute(
      "SELECT count(*) FROM lim_t WHERE timestamp >= 1704067200000 " +
        "OR timestamp <= 1704069000000"))
    // an evals-false range (start > end) is the reference's None → passes
    e.execute("SELECT count(*) FROM lim_t WHERE timestamp >= 1704074400000 " +
      "AND timestamp <= 1704067200000").collect()
    // no engine table referenced → the rule does not apply
    e.execute("SELECT 1 AS one").collect()
    // widths are PER SCAN: a UNION ALL of two half-bounded scans must not
    // conflate branch 1's lower with branch 2's upper into a small range
    intercept[BlockedException](e.execute(
      "SELECT count(*) AS n FROM (" +
        "SELECT v FROM lim_t WHERE timestamp >= 1704067200000 " +
        "UNION ALL SELECT v FROM lim_t WHERE timestamp <= 1704069000000)"))
    // ...while two bounded scans within the cap both pass
    e.execute(
      "SELECT count(*) AS n FROM (" +
        "SELECT v FROM lim_t WHERE timestamp >= 1704067200000 AND timestamp <= 1704069000000 " +
        "UNION ALL SELECT v FROM lim_t WHERE timestamp >= 1704070000000 AND timestamp <= 1704071000000)")
      .collect()
    e.limiter.removeRules(Seq(QueryRange(3600000L)))

    // a CTE shadowing a blocked table name never touches the engine table
    e.limiter.addReadBlock(Seq("lim_t"))
    assert(e.execute("WITH lim_t AS (SELECT 1 AS x) SELECT count(*) AS n FROM lim_t")
      .collect().head.getLong(0) == 1L)
    e.limiter.removeReadBlock(Seq("lim_t"))
  }

  test("POST /admin/block edits the live limiter (Add/Set/Remove)") {
    val e = mkEngine()
    val srv = new GraftHttpServer(e).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      // Add a read block + a rule
      val r1 = post(s"$base/admin/block",
        """{"operation":"Add","write_block_list":["lim_t"],
          |"read_block_list":["lim_t"],
          |"block_rules":[{"type":"QueryRange","content":"1h"}]}""".stripMargin)
      assert(r1.statusCode() == 200, r1.body())
      val j1 = mapper.readTree(r1.body())
      assert(j1.get("read_block_list").get(0).asText() == "lim_t")
      assert(j1.get("write_block_list").get(0).asText() == "lim_t")
      assert(j1.get("block_rules").get(0).get("type").asText() == "QueryRange")
      assert(j1.get("block_rules").get(0).get("content").asText() == "3600000ms")
      // enforced on the engine surface
      intercept[Limiter.BlockedException](
        e.execute("SELECT count(*) FROM lim_t").collect())

      // Remove the blocks, keep nothing
      val r2 = post(s"$base/admin/block",
        """{"operation":"Remove","write_block_list":["lim_t"],
          |"read_block_list":["lim_t"],
          |"block_rules":[{"type":"QueryRange","content":"3600000ms"}]}""".stripMargin)
      assert(r2.statusCode() == 200)
      val j2 = mapper.readTree(r2.body())
      assert(j2.get("read_block_list").size() == 0 &&
        j2.get("block_rules").size() == 0)
      assert(e.execute("SELECT count(*) AS n FROM lim_t")
        .collect().head.getLong(0) == 1L)

      // Set replaces wholesale; unknown rule type → 400 envelope
      val r3 = post(s"$base/admin/block",
        """{"operation":"Set","write_block_list":[],"read_block_list":["x"],
          |"block_rules":[{"type":"AnyInsert"}]}""".stripMargin)
      assert(mapper.readTree(r3.body()).get("block_rules").get(0)
        .get("type").asText() == "AnyInsert")
      val r4 = post(s"$base/admin/block",
        """{"operation":"Add","block_rules":[{"type":"Bogus"}]}""")
      assert(mapper.readTree(r4.body()).get("code").asInt() == 400)
      // clean up
      post(s"$base/admin/block",
        """{"operation":"Set","write_block_list":[],"read_block_list":[],"block_rules":[]}""")
    } finally srv.stop()
  }
}
