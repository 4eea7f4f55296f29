package graft

import graft.ddl._
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class DdlParserSpec extends AnyFunSuite {

  test("F1 demo DDL (README quick-start)") {
    val s = DdlParser.parse(
      """CREATE TABLE `demo` (
        |    `name` string TAG,
        |    `value` double NOT NULL,
        |    `t` timestamp NOT NULL,
        |    timestamp KEY (t))
        |ENGINE=Analytic with (enable_ttl='false')""".stripMargin)
    val CreateTable(sch, ifNot) = s: @unchecked
    assert(!ifNot)
    assert(sch.name == "demo")
    assert(sch.timestampKey == "t")
    assert(sch.columns.map(_.name) == Seq("name", "value", "t"))
    assert(sch.columns.head.isTag)
    assert(sch.columns(1).kind == DatumKind.Double && !sch.columns(1).isNullable)
    assert(sch.usesTsid && sch.primaryKey == Seq("tsid", "t"))
    assert(sch.options.updateMode == UpdateMode.Overwrite)
    assert(!sch.options.enableTtl)
  }

  test("F2: column literally named timestamp + uint64 + append mode") {
    val s = DdlParser.parse(
      """CREATE TABLE `02_function_aggregate_table1` (
        |    `timestamp` timestamp NOT NULL,
        |    `arch` string TAG,
        |    `datacenter` string TAG,
        |    `value` int,
        |    `uvalue` uint64,
        |    timestamp KEY (timestamp)) ENGINE=Analytic
        |WITH(enable_ttl='false', update_mode='append')""".stripMargin)
    val CreateTable(sch, _) = s: @unchecked
    assert(sch.timestampKey == "timestamp")
    assert(sch.column("uvalue").kind == DatumKind.UInt64)
    assert(sch.column("value").kind == DatumKind.Int32)
    assert(sch.options.updateMode == UpdateMode.Append)
  }

  test("F8: PARTITION BY KEY ... PARTITIONS") {
    val s = DdlParser.parse(
      """CREATE TABLE `partition_table_t`(
        |    `name` string TAG, `id` int TAG,
        |    `value` double NOT NULL, `t` timestamp NOT NULL,
        |    TIMESTAMP KEY(t))
        |PARTITION BY KEY(name) PARTITIONS 4 ENGINE=Analytic with (enable_ttl='false')""".stripMargin)
    val CreateTable(sch, _) = s: @unchecked
    assert(sch.partitionBy.contains(PartitionByKey(Seq("name"), 4)))
  }

  test("explicit primary key and options") {
    val CreateTable(sch, _) = DdlParser.parse(
      """CREATE TABLE t2 (a string TAG, v double, ts timestamp NOT NULL,
        | timestamp KEY(ts), PRIMARY KEY(a, ts))
        | ENGINE=Analytic WITH (segment_duration='2h', ttl='7d', enable_ttl='true')""".stripMargin): @unchecked
    assert(sch.explicitPrimaryKey.contains(Seq("a", "ts")))
    assert(sch.options.segmentMillis.contains(7200000L))
    assert(sch.options.ttlMillis.contains(7L * 86400000L))
    assert(sch.options.enableTtl)
  }

  test("DROP / DESCRIBE / SHOW / EXISTS / ALTER") {
    assert(DdlParser.parse("DROP TABLE IF EXISTS x") == DropTable("x", ifExists = true))
    assert(DdlParser.parse("DESCRIBE demo") == DescribeTable("demo"))
    assert(DdlParser.parse("DESC TABLE demo") == DescribeTable("demo"))
    assert(DdlParser.parse("SHOW TABLES") == ShowTables(None))
    assert(DdlParser.parse("SHOW TABLES LIKE 'de%'") == ShowTables(Some("de%")))
    assert(DdlParser.parse("SHOW DATABASES") == ShowDatabases)
    assert(DdlParser.parse("SHOW CREATE TABLE demo") == ShowCreateTable("demo"))
    assert(DdlParser.parse("EXISTS TABLE demo") == ExistsTable("demo"))
    val AlterAddColumns(n, cols) =
      DdlParser.parse("ALTER TABLE demo ADD COLUMN (c1 string TAG, c2 double)"): @unchecked
    assert(n == "demo" && cols.map(_.name) == Seq("c1", "c2") && cols.head.isTag)
    val AlterModifySetting(_, st) =
      DdlParser.parse("ALTER TABLE demo MODIFY SETTING ttl='30d'"): @unchecked
    assert(st == Map("ttl" -> "30d"))
  }

  test("INSERT VALUES incl. quotes, negatives, nulls, booleans") {
    val InsertValues(tbl, cols, rows) = DdlParser.parse(
      """INSERT INTO demo (t, name, value)
        |VALUES (1702224000000, 'horaedb', 100), (1702224000001, 'it''s', -2.5),
        |       (1702224000002, NULL, true)""".stripMargin): @unchecked
    assert(tbl == "demo" && cols == Seq("t", "name", "value"))
    assert(rows.length == 3)
    assert(rows(0) == Seq(NumberLit(BigDecimal(1702224000000L)), StringLit("horaedb"), NumberLit(100)))
    assert(rows(1)(1) == StringLit("it's") && rows(1)(2) == NumberLit(BigDecimal("-2.5")))
    assert(rows(2)(1) == NullLit && rows(2)(2) == BoolLit(true))
  }

  test("statement splitting is quote-aware") {
    val parts = DdlParser.splitStatements(
      "INSERT INTO t VALUES ('a;b', 1); SELECT * FROM t; -- done\nDROP TABLE t")
    assert(parts.length == 3)
    assert(parts.head.contains("a;b"))
  }

  test("SELECT passes through") {
    assert(DdlParser.parse("SELECT sum(v) FROM demo GROUP BY name") ==
      PassthroughSql("SELECT sum(v) FROM demo GROUP BY name"))
  }

  test("OPTIMIZE variants: zorder rewrite vs small-file compaction") {
    assert(DdlParser.parse("OPTIMIZE TABLE t ZORDER BY (a, b)") ==
      OptimizeTable("t", Seq("a", "b")))
    assert(DdlParser.parse("OPTIMIZE t") == OptimizeTable("t", Nil))
    assert(DdlParser.parse("OPTIMIZE TABLE t COMPACT SMALL FILES") ==
      OptimizeTable("t", Nil, smallFiles = true))
    assert(DdlParser.parse("OPTIMIZE t COMPACT") ==
      OptimizeTable("t", Nil, smallFiles = true))
  }

  test("rejects bad DDL") {
    intercept[IllegalArgumentException] {
      DdlParser.parse("CREATE TABLE t (a string)") // no TIMESTAMP KEY
    }
    intercept[IllegalArgumentException] {
      DdlParser.parse("CREATE TABLE t (a double TAG, ts timestamp, timestamp KEY(ts))")
    } // double tag invalid (column_schema.rs:203-210)
  }
}
