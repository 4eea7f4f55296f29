package graft.promql

/** PromQL AST for the subset the reference supports: selectors with
  * eq/neq/regex matchers, the pushdown-able range functions
  * `rate/irate/delta/idelta/increase` (reference promql/pushdown.rs:33-56),
  * instant selection, and the grouped aggregations `sum/avg/count/min/max`
  * (reference promql/convert.rs:274-347).
  */
sealed trait Matcher { def label: String }
final case class EqMatcher(label: String, value: String) extends Matcher
final case class NeqMatcher(label: String, value: String) extends Matcher
final case class ReMatcher(label: String, regex: String) extends Matcher
final case class NreMatcher(label: String, regex: String) extends Matcher

final case class Selector(
    metric: String,
    matchers: Seq[Matcher],
    rangeMs: Option[Long],
    offsetMs: Long = 0L,
    /** `@ <unix-seconds>`: pin evaluation to a fixed instant — every grid
      * step reports the value as of that time. */
    atMs: Option[Long] = None)

sealed trait PromExpr
final case class VectorSelector(sel: Selector) extends PromExpr
/** func ∈ rate|irate|delta|idelta|increase or the *_over_time aggregations
  * over a range selector; `param` carries quantile_over_time's φ /
  * predict_linear's horizon / holt_winters' smoothing factor, `param2`
  * holt_winters' trend factor. */
final case class RangeFunc(func: String, sel: Selector,
    param: Option[Double] = None, param2: Option[Double] = None)
    extends PromExpr
/** Range function applied to a subquery `f(child[range:step])`: the child
  * evaluates as instant queries on an absolute `step`-aligned grid, whose
  * values become `f`'s range samples (Prometheus subquery semantics). */
final case class SubqueryFunc(func: String, child: PromExpr, rangeMs: Long,
    stepMs: Long, param: Option[Double] = None, param2: Option[Double] = None)
    extends PromExpr
/** time(): the evaluation timestamp in seconds — a per-step scalar frame
  * (no labels), usable wherever a scalar operand is. */
case object TimeExpr extends PromExpr
/** vector(s): a scalar literal lifted to a label-less vector on the grid. */
final case class VectorLitExpr(v: Double) extends PromExpr
/** scalar(v): per step, the single element's value when the child has
  * exactly one element, else NaN (Prometheus scalar() semantics). */
final case class ScalarOfExpr(child: PromExpr) extends PromExpr
/** op ∈ sum|avg|count|min|max, grouped by `by` labels (empty = collapse).
  * With `without=true` the listed labels are DROPPED and grouping keeps all
  * remaining labels (Prometheus `sum without (l,...) (v)`); labels that
  * don't exist are silently ignored, per Prometheus. */
final case class AggExpr(op: String, by: Seq[String], child: PromExpr,
    without: Boolean = false) extends PromExpr
/** Beyond the reference's pushdown set (Prometheus-native semantics):
  * topk/bottomk keep the k extreme series per grid step. */
final case class TopkExpr(op: String, k: Int, child: PromExpr) extends PromExpr
/** φ-quantile across series per (by-labels, step), linear interpolation.
  * `without` inverts the label list like [[AggExpr]]. */
final case class QuantileExpr(phi: Double, by: Seq[String], child: PromExpr,
    without: Boolean = false) extends PromExpr
/** Scalar literal — only legal as a binary-operation operand. */
final case class NumberLit(v: Double) extends PromExpr
/** Vector-matching spec for binary operations: `on(labels)` restricts the
  * join keys to `labels`, `ignoring(labels)` removes them from the shared
  * set; group_left/group_right allow many-to-one with the many side
  * keeping its labels (+ `include` labels copied from the one side). */
final case class VectorMatching(
    on: Boolean, labels: Seq[String],
    groupLeft: Boolean = false, groupRight: Boolean = false,
    include: Seq[String] = Nil)
/** op ∈ + - * /; vector∘scalar maps, vector∘vector joins one-to-one on the
  * shared label set per step (or per `matching` when given). */
final case class BinExpr(op: String, lhs: PromExpr, rhs: PromExpr,
    matching: Option[VectorMatching] = None) extends PromExpr
/** Comparison filter `v > 100` (keeps matching elements with their value)
  * or, with the `bool` modifier, a 0/1 map that keeps every element. */
final case class CompareExpr(op: String, lhs: PromExpr, rhs: PromExpr,
    bool: Boolean = false) extends PromExpr
/** absent(v): value 1 at every grid step where v has NO elements — the
  * "did the metric disappear" alerting primitive. */
final case class AbsentExpr(child: PromExpr) extends PromExpr
/** count_values(label, v): per step, one element per distinct sample value
  * with that value rendered into `label` and the element count as value. */
final case class CountValuesExpr(label: String, child: PromExpr) extends PromExpr
/** Element-wise math: abs|ceil|floor|round|clamp_min|clamp_max (args carry
  * the scalar parameters of the clamp family). */
final case class MathFunc(name: String, child: PromExpr, args: Seq[Double] = Nil)
    extends PromExpr
/** Vector set operations (lowest precedence): `and` keeps lhs elements
  * whose label set exists in rhs at the same step, `unless` keeps those
  * that don't, `or` adds rhs elements whose label set is absent from lhs. */
final case class SetOpExpr(op: String, lhs: PromExpr, rhs: PromExpr) extends PromExpr
/** label_replace(v, dst, replacement, src, regex): when the ANCHORED regex
  * matches the full src label value, dst := replacement with $1-style
  * capture-group expansion; otherwise the element is unchanged
  * (promql/functions.go funcLabelReplace semantics). */
final case class LabelReplaceExpr(
    child: PromExpr, dst: String, replacement: String, src: String,
    regex: String) extends PromExpr
/** label_join(v, dst, sep, src...): dst := src label values joined by sep. */
final case class LabelJoinExpr(
    child: PromExpr, dst: String, sep: String, srcLabels: Seq[String])
    extends PromExpr
/** histogram_quantile(φ, v) over `le`-labelled cumulative bucket series
  * (promql/quantile.go bucketQuantile): per (other labels, step), find the
  * first bucket whose cumulative count reaches φ·total and interpolate
  * linearly inside it; the +Inf bucket clamps to the highest finite le. */
final case class HistogramQuantileExpr(phi: Double, child: PromExpr)
    extends PromExpr

/** Evaluation grid [startMs, endMs] stepMs, with the Prometheus default
  * 5-minute lookback for instant selection (reference promql/convert.rs:55).
  */
final case class EvalParams(
    startMs: Long, endMs: Long, stepMs: Long, lookbackMs: Long = 300000L)
