package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan linter: the 100 TB plan discipline this repo asserts
  * query-by-query in `PlansSpec`, packaged as a runtime check any
  * pipeline can run over its own DataFrames before launching them at a
  * cluster. Each rule flags a shape that is harmless at test scale and a
  * catastrophe at 100× — the exact class of regression that passes a
  * correctness gate and then melts production:
  *
  *   - `cartesian-product`: CartesianProduct / un-conditioned
  *     broadcast-nested-loop — O(|A|·|B|) pairs
  *   - `single-partition-window`: a window function with no PARTITION BY
  *     moves the whole input through one task
  *   - `global-sort-no-limit`: a total sort not absorbed into
  *     TakeOrderedAndProject shuffles and sorts the full dataset for an
  *     ordering nobody bounded
  *   - `interpreted-expression`: a CodegenFallback expression (HOF
  *     lambdas, some UDF wrappers) in a hot operator evaluates
  *     row-at-a-time interpreted instead of compiled
  *   - `wide-scan`: a columnar file scan reading ≥ `wideScanCols` columns
  *     — usually a missing projection pushdown
  *
  * Advisory counters (`shuffles`, `scans`) come back with the findings so
  * a pipeline can also budget-check ("this stage may shuffle at most
  * twice"). Inspection is pre-execution (`sparkPlan`); AQE's runtime
  * re-plan only ever removes exchanges, so the lint is conservative.
  */
object PlanLint {

  final case class Finding(rule: String, detail: String)

  final case class Report(findings: Seq[Finding], shuffles: Int, scans: Int) {
    def clean: Boolean = findings.isEmpty
    def has(rule: String): Boolean = findings.exists(_.rule == rule)
  }

  def lint(df: DataFrame, wideScanCols: Int = 24): Report = {
    val nodes = df.queryExecution.sparkPlan.collect { case n => n }
    val findings = Seq.newBuilder[Finding]

    def fallbacks(es: Seq[Expression]): Seq[Expression] =
      es.flatMap(_.collect { case e: CodegenFallback => e: Expression })

    nodes.foreach {
      case c: CartesianProductExec =>
        findings += Finding("cartesian-product",
          s"CartesianProduct over ${c.left.nodeName} × ${c.right.nodeName}")
      case j: BroadcastNestedLoopJoinExec if j.condition.isEmpty =>
        findings += Finding("cartesian-product",
          s"BroadcastNestedLoopJoin without condition (${j.joinType})")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        findings += Finding("single-partition-window",
          s"window [${w.windowExpression.map(_.sql).mkString(", ").take(80)}] has no PARTITION BY")
      case s: SortExec if s.global =>
        findings += Finding("global-sort-no-limit",
          s"global sort on [${s.sortOrder.map(_.sql).mkString(", ").take(80)}]")
        // TakeOrderedAndProjectExec is the bounded (limit-absorbed) form —
        // it is a different node and never fires this rule
      case s: FileSourceScanExec if s.output.size >= wideScanCols =>
        findings += Finding("wide-scan",
          s"scan of ${s.output.size} columns from ${s.relation.location.rootPaths.headOption.getOrElse("?")}")
      case p: ProjectExec if fallbacks(p.projectList).nonEmpty =>
        findings += Finding("interpreted-expression",
          s"project: ${fallbacks(p.projectList).map(_.prettyName).distinct.mkString(", ").take(80)}")
      case f: FilterExec if fallbacks(Seq(f.condition)).nonEmpty =>
        findings += Finding("interpreted-expression",
          s"filter: ${fallbacks(Seq(f.condition)).map(_.prettyName).distinct.mkString(", ").take(80)}")
      case a: HashAggregateExec if fallbacks(a.aggregateExpressions.map(_.aggregateFunction)).nonEmpty =>
        findings += Finding("interpreted-expression",
          s"aggregate: ${fallbacks(a.aggregateExpressions.map(_.aggregateFunction)).map(_.prettyName).distinct.mkString(", ").take(80)}")
      case _ => ()
    }

    Report(
      findings.result(),
      nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      nodes.count(n => n.isInstanceOf[FileSourceScanExec] ||
        n.nodeName.contains("Scan")))
  }
}
