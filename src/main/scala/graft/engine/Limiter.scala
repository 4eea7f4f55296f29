package graft.engine

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}

/** Runtime query/write limiter — the standalone twin of the reference's
  * proxy-layer `Limiter` (proxy/src/limiter.rs): per-table read/write
  * block lists plus global block rules, all mutable at runtime through
  * the `/admin/block` HTTP admin (handlers/admin.rs, server/http.rs:659).
  * Errors carry the reference's exact message shapes
  * ("Table operation is blocked, table:.., op:..",
  * "Table operation is blocked by rule:.., op:..") so SDK clients that
  * match on the text (integration_tests/sdk/rust/src/main.rs:139-155)
  * behave identically.
  *
  * Enforcement points (this engine's proxy layer IS the engine surface):
  *   - `TsdbEngine.runSql` → read block list + query rules, on the PARSED
  *     plan before any expensive work;
  *   - `TsdbEngine.append` → write block list (covers every protocol's
  *     write path: SQL INSERT, gRPC Write, line protocol, OpenTSDB put);
  *   - protocol ingest entries → the AnyInsert rule (kept off the
  *     engine-internal appends like rollup recompute, matching the
  *     reference where rules run only at the proxy).
  *
  * Rule semantics follow limiter.rs:
  *   - AnyQuery / AnyInsert: block the whole plan class;
  *   - QueryWithoutPredicate: a query with no WHERE directly over a table
  *     scan is blocked (full-scan brake);
  *   - QueryRange(maxMs): block when the extracted timestamp-key range
  *     width exceeds the threshold. Like the reference, an UNBOUNDED or
  *     half-bounded query has width i64::MAX and is BLOCKED
  *     (plan.rs `extract_time_range` falls back to `TimeRange::min_to_max`
  *     and `query_range`'s checked_sub overflow maps to i64::MAX — this
  *     rule exists to brake exactly those scans); range None — an
  *     evals-false filter like `ts > 100 AND ts < 10` — is the only case
  *     that is not limited.
  */
object Limiter {
  sealed trait BlockRule { def ruleName: String }
  case object QueryWithoutPredicate extends BlockRule {
    val ruleName = "QueryWithoutPredicate"
  }
  final case class QueryRange(maxMs: Long) extends BlockRule {
    val ruleName = "QueryRange"
  }
  case object AnyQuery extends BlockRule { val ruleName = "AnyQuery" }
  case object AnyInsert extends BlockRule { val ruleName = "AnyInsert" }

  final class BlockedException(msg: String) extends RuntimeException(msg)
}

final class Limiter {
  import Limiter._

  private val writeBlock = scala.collection.mutable.Set.empty[String]
  private val readBlock = scala.collection.mutable.Set.empty[String]
  private val rules = scala.collection.mutable.Set.empty[BlockRule]

  // -------------------------------------------------- admin surface
  def addWriteBlock(ts: Seq[String]): Unit = synchronized { writeBlock ++= ts }
  def addReadBlock(ts: Seq[String]): Unit = synchronized { readBlock ++= ts }
  def addRules(rs: Seq[BlockRule]): Unit = synchronized { rules ++= rs }
  def setWriteBlock(ts: Seq[String]): Unit = synchronized {
    writeBlock.clear(); writeBlock ++= ts
  }
  def setReadBlock(ts: Seq[String]): Unit = synchronized {
    readBlock.clear(); readBlock ++= ts
  }
  def setRules(rs: Seq[BlockRule]): Unit = synchronized {
    rules.clear(); rules ++= rs
  }
  def removeWriteBlock(ts: Seq[String]): Unit = synchronized { writeBlock --= ts }
  def removeReadBlock(ts: Seq[String]): Unit = synchronized { readBlock --= ts }
  def removeRules(rs: Seq[BlockRule]): Unit = synchronized { rules --= rs }
  def writeBlockList: Seq[String] = synchronized { writeBlock.toSeq.sorted }
  def readBlockList: Seq[String] = synchronized { readBlock.toSeq.sorted }
  def blockRules: Seq[BlockRule] = synchronized {
    rules.toSeq.sortBy(_.ruleName)
  }

  private def blockedTable(table: String, op: String): Nothing =
    throw new BlockedException(
      s"Table operation is blocked, table:$table, op:$op")
  private def blockedByRule(rule: BlockRule, op: String): Nothing =
    // limiter.rs formats the rule with Debug (`rule:{:?}`): plain variants
    // print their name, QueryRange prints `QueryRange(86400000)` — Scala
    // case-class/object toString matches that shape exactly.
    throw new BlockedException(
      s"Table operation is blocked by rule:$rule, op:$op")

  // -------------------------------------------------- enforcement
  /** Write path (engine.append): table-scoped block list. */
  def checkWrite(table: String): Unit = synchronized {
    if (writeBlock.contains(table)) blockedTable(table, "insert")
  }

  /** Protocol ingest entry points: the AnyInsert brake. */
  def checkInsertRule(): Unit = synchronized {
    if (rules.contains(AnyInsert)) blockedByRule(AnyInsert, "insert")
  }

  /** Query path (runSql): read block list + query rules against the
    * PARSED plans (main + CTE subplans) of one statement.
    *
    * @param referencedEngine engine tables the statement references
    *                         (CTE-shadowed names already excluded)
    * @param tsColsByTable    engine table → its timestamp-key column
    */
  def checkQuery(
      referencedEngine: Set[String], tsColsByTable: Map[String, String],
      plans: Seq[LogicalPlan]): Unit = {
    val (rb, rs) = synchronized { (readBlock.toSet, rules.toSet) }
    referencedEngine.intersect(rb).toSeq.sorted.headOption
      .foreach(t => blockedTable(t, "query"))
    if (rs.isEmpty) return
    if (rs.contains(AnyQuery)) blockedByRule(AnyQuery, "query")
    if (rs.contains(QueryWithoutPredicate) && referencedEngine.nonEmpty &&
        !plans.exists(hasScanFilter))
      blockedByRule(QueryWithoutPredicate, "query")
    rs.collectFirst { case r: QueryRange => r }.foreach { r =>
      // Per-SCAN widths, then block if ANY scan exceeds the cap. One
      // query-global bound map would let two individually-unbounded
      // branches present as one bounded range (UNION ALL of a >= scan
      // and a <= scan) and slip exactly the full-history reads this
      // rule brakes. Invalid (evals-false) scans read nothing — the
      // reference's None — and are not limited.
      val widths = scanRangesMs(plans, tsColsByTable).flatten
      if (widths.nonEmpty && widths.max > r.maxMs) blockedByRule(r, "query")
    }
  }

  /** A Filter sitting (through aliases) directly over a relation scan —
    * limiter.rs `contains_filter`. */
  private def hasScanFilter(plan: LogicalPlan): Boolean = {
    def overScan(p: LogicalPlan): Boolean = p match {
      case SubqueryAlias(_, child) => overScan(child)
      case _: UnresolvedRelation => true
      case _ => false
    }
    plan.collectFirst { case Filter(_, child) if overScan(child) => () }.nonEmpty
  }

  /** Width in ms of every ENGINE-TABLE SCAN in the plans — the twin of
    * plan.rs `query_range()`, applied per scan: for each
    * `UnresolvedRelation` of a limited table, the tightest [inclusive
    * start, exclusive end) over that table's timestamp key from the
    * conjuncts of the Filter nodes ABOVE that scan (its own branch
    * only), starting UNBOUNDED (i64::MIN, i64::MAX) so a scan with no
    * usable bound yields Long.MaxValue via subtraction overflow
    * (`checked_sub(..).unwrap_or(i64::MAX)`) and gets blocked. None ONLY
    * for an invalid range (start > end — an evals-false filter), which
    * the reference does not limit. Literal forms are the engine's:
    * TIMESTAMP literals (µs) and epoch-integer milliseconds (the
    * EpochMillisRewrite convention). Name-based like every validator on
    * the parsed plan: a CTE-shadowed table name is excluded from
    * `tsColsByTable` by the caller, so shadowed references are never
    * treated as engine scans. */
  private def scanRangesMs(
      plans: Seq[LogicalPlan],
      tsColsByTable: Map[String, String]): Seq[Option[Long]] = {
    def litMs(e: Expression): Option[Long] = e match {
      case Literal(v: Long, t) if t.typeName.startsWith("timestamp") =>
        Some(v / 1000L) // µs → ms
      case Literal(v: Number, _) => Some(v.longValue())
      case Cast(child, _, _, _) => litMs(child)
      case _ => None
    }
    def isTs(e: Expression, tsCol: String): Boolean = e match {
      case a: UnresolvedAttribute => a.nameParts.last == tsCol
      case Cast(child, _, _, _) => isTs(child, tsCol)
      case _ => false
    }
    def inc(v: Long): Long = if (v == Long.MaxValue) v else v + 1

    /** [inclusive start, exclusive end) width for ONE scan from the
      * conjuncts of the Filters above it. Walk only CONJUNCTS: an OR/NOT
      * disjunct does not constrain the scan range (a `ts >= a OR ts <= b`
      * tautology is unbounded — conflating its sides would spuriously
      * BOUND it and let it slip the cap). Both operand orders count: the
      * cap must not be evadable via `lit <= ts`. */
    def widthOf(conds: Seq[Expression], tsCol: String): Option[Long] = {
      var lo = Long.MinValue
      var hi = Long.MaxValue
      def lower(v: Long): Unit = lo = math.max(lo, v)
      def upper(v: Long): Unit = hi = math.min(hi, v)
      def visit(cond: Expression): Unit = cond match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          visit(l); visit(r)
        case GreaterThanOrEqual(l, r) => // ts >= v | v >= ts (ts <= v)
          if (isTs(l, tsCol)) litMs(r).foreach(lower)
          if (isTs(r, tsCol)) litMs(l).foreach(v => upper(inc(v)))
        case GreaterThan(l, r) => // ts > v | v > ts (ts < v)
          if (isTs(l, tsCol)) litMs(r).foreach(v => lower(inc(v)))
          if (isTs(r, tsCol)) litMs(l).foreach(upper)
        case LessThanOrEqual(l, r) => // ts <= v | v <= ts (ts >= v)
          if (isTs(l, tsCol)) litMs(r).foreach(v => upper(inc(v)))
          if (isTs(r, tsCol)) litMs(l).foreach(lower)
        case LessThan(l, r) => // ts < v | v < ts (ts > v)
          if (isTs(l, tsCol)) litMs(r).foreach(upper)
          if (isTs(r, tsCol)) litMs(l).foreach(v => lower(inc(v)))
        case _ => () // OR/NOT/other: no range contribution
      }
      conds.foreach(visit)
      if (hi < lo) None // evals-false: reads nothing, not limited
      else Some(
        try Math.subtractExact(hi, lo)
        catch { case _: ArithmeticException => Long.MaxValue })
    }

    // Walk each plan carrying the Filter conjuncts active on the branch;
    // every engine-table relation leaf yields its own scan width.
    val out = Seq.newBuilder[Option[Long]]
    def go(p: LogicalPlan, conds: Seq[Expression]): Unit = p match {
      case Filter(c, child) => go(child, conds :+ c)
      case r: UnresolvedRelation =>
        tsColsByTable.get(r.multipartIdentifier.last)
          .foreach(ts => out += widthOf(conds, ts))
      case other => other.children.foreach(go(_, conds))
    }
    plans.foreach(go(_, Nil))
    out.result()
  }
}
