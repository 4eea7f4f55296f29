package graft.promql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PromQL frontend: text → AST → DataFrame (reference two-layer shape:
  * query_frontend/src/promql/convert.rs lowering + the PromAlign physical
  * operator; we lower to a DataFrame plan whose alignment step is
  * `groupByKey(series).flatMapGroups` over [[PromAlign]]).
  *
  * Scale posture: matcher + time-range filters are plain Catalyst filters
  * (parquet pushdown applies before the shuffle); the only shuffle is the
  * hash partition by series key — the reference does exactly the same
  * (RepartitionExec on tsid, prom_align.rs:158-165); per-group state is one
  * series's samples inside the query window, which is bounded by the grid
  * span, never the table.
  */
object PromQL {

  /** A metric's physical binding: sample table + column roles. Prometheus
    * labels are strings, so tag columns are cast to string on the way in. */
  final case class SeriesTable(
      df: DataFrame, tsCol: String, valueCol: String, tags: Seq[String])

  // ---------------------------------------------------------------- parser

  /** Grammar (the reference-supported subset):
    * {{{
    *   expr     := agg | func | selector
    *   agg      := op [by (l,...)] (expr)     op: sum avg count min max
    *   func     := f (metric{m,...}[dur])     f: rate irate delta idelta increase
    *             | <agg>_over_time (metric{m,...}[dur])
    *             | quantile_over_time (φ, metric{m,...}[dur])
    *   selector := metric [{m,...}]
    *   m        := label (= | != | =~ | !~) "str"
    *   dur      := <int>(ms|s|m|h|d|w)
    * }}} */
  def parse(input: String): PromExpr = {
    val p = new Parser(input)
    val e = p.parseExpr()
    p.expectEnd()
    e
  }

  private val aggOps = Set("sum", "avg", "count", "min", "max",
    "stddev", "stdvar", "group")
  private val rangeFuncs = Set("rate", "irate", "delta", "idelta", "increase", "deriv",
    "sum_over_time", "avg_over_time", "count_over_time", "min_over_time",
    "max_over_time", "last_over_time", "stddev_over_time", "stdvar_over_time",
    "present_over_time", "absent_over_time", "predict_linear", "holt_winters",
    "double_exponential_smoothing", "changes", "resets")
  /** Scalar arguments AFTER the range selector, by function. */
  private val rangeFuncArity = Map(
    "predict_linear" -> 1, "holt_winters" -> 2,
    "double_exponential_smoothing" -> 2).withDefaultValue(0)
  private val mathFuncs = Set("abs", "ceil", "floor", "round",
    "clamp_min", "clamp_max", "clamp", "exp", "ln", "log2", "log10", "sqrt",
    "sgn", "timestamp", "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh", "deg", "rad",
    // calendar family: the VALUE is interpreted as unix seconds (promql
    // functions.go dateWrapper — `time.Unix(int64(v), 0).UTC()`)
    "minute", "hour", "day_of_week", "day_of_month", "days_in_month",
    "month", "year", "sort", "sort_desc")

  private final class Parser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s(i) else '\u0000'
    private def expect(c: Char): Unit = {
      ws()
      if (peek != c) fail(s"expected '$c'")
      i += 1
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PromQL parse error at $i: $msg in: $s")

    /** Trailing input is an error, never silently dropped. */
    def expectEnd(): Unit = {
      ws()
      if (i < s.length) fail(s"unexpected trailing input '${s.substring(i)}'")
    }

    private def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == ':')) i += 1
      if (i == start) fail("expected identifier")
      s.substring(start, i)
    }

    private def quoted(): String = {
      ws()
      if (peek != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) { sb.append(s(i + 1)); i += 2 }
        else { sb.append(s(i)); i += 1 }
      }
      expectRaw('"')
      sb.toString
    }
    private def expectRaw(c: Char): Unit = {
      if (peek != c) fail(s"expected '$c'"); i += 1
    }

    private def duration(): Long = {
      ws()
      val start = i
      while (i < s.length && s(i).isDigit) i += 1
      if (i == start) fail("expected duration")
      val n = s.substring(start, i).toLong
      val unit =
        if (s.startsWith("ms", i)) { i += 2; 1L }
        else if (peek == 's') { i += 1; 1000L }
        else if (peek == 'm') { i += 1; 60000L }
        else if (peek == 'h') { i += 1; 3600000L }
        else if (peek == 'd') { i += 1; 86400000L }
        else if (peek == 'w') { i += 1; 604800000L }
        else fail("expected duration unit")
      n * unit
    }

    /** Binary operations with standard precedence: `* /` bind tighter than
      * `+ -`, which bind tighter than the set operators `and unless or`
      * (Prometheus operator precedence, promql spec). */
    def parseExpr(): PromExpr = {
      var lhs = parseCompare()
      var more = true
      while (more) {
        ws()
        wordAt(Seq("and", "or", "unless")) match {
          case Some(op) =>
            i += op.length
            lhs = SetOpExpr(op, lhs, parseCompare())
          case None => more = false
        }
      }
      lhs
    }

    /** Comparisons bind looser than arithmetic, tighter than set ops
      * (Prometheus precedence). `bool` turns the filter into 0/1. */
    private def parseCompare(): PromExpr = {
      var lhs = parseAdd()
      var more = true
      while (more) {
        ws()
        val op =
          if (s.startsWith(">=", i)) ">="
          else if (s.startsWith("<=", i)) "<="
          else if (s.startsWith("==", i)) "=="
          else if (s.startsWith("!=", i)) "!="
          else if (peek == '>') ">"
          else if (peek == '<') "<"
          else null
        if (op == null) more = false
        else {
          i += op.length
          ws()
          val isBool = wordAt(Seq("bool")).isDefined
          if (isBool) i += 4
          lhs = CompareExpr(op, lhs, parseAdd(), isBool)
        }
      }
      lhs
    }

    /** The keyword at the cursor, when followed by a word boundary. */
    private def wordAt(words: Seq[String]): Option[String] =
      words.find(w => s.startsWith(w, i) &&
        (i + w.length >= s.length || !s(i + w.length).isLetterOrDigit))

    private def parseAdd(): PromExpr = {
      var lhs = parseMul()
      ws()
      while (peek == '+' || (peek == '-' && !s.startsWith("->", i))) {
        val op = peek.toString; i += 1
        val m = parseMatching()
        val rhs = parseMul()
        lhs = BinExpr(op, lhs, rhs, m)
        ws()
      }
      lhs
    }

    private def parseMul(): PromExpr = {
      var lhs = parsePrimary()
      ws()
      while (peek == '*' || peek == '/') {
        val op = peek.toString; i += 1
        val m = parseMatching()
        val rhs = parsePrimary()
        lhs = BinExpr(op, lhs, rhs, m)
        ws()
      }
      lhs
    }

    /** `on(l,...)` | `ignoring(l,...)`, optionally followed by
      * `group_left[(incl,...)]` / `group_right[(incl,...)]`. */
    private def parseMatching(): Option[VectorMatching] = {
      ws()
      wordAt(Seq("on", "ignoring")).map { kw =>
        i += kw.length
        val labels = labelList()
        ws()
        wordAt(Seq("group_left", "group_right")) match {
          case Some(g) =>
            i += g.length
            ws()
            val incl = if (peek == '(') labelList() else Nil
            VectorMatching(kw == "on", labels,
              groupLeft = g == "group_left", groupRight = g == "group_right",
              include = incl)
          case None => VectorMatching(kw == "on", labels)
        }
      }
    }

    /** Parenthesized, possibly empty, comma-separated label names. */
    private def labelList(): Seq[String] = {
      expect('(')
      val out = Seq.newBuilder[String]
      ws()
      if (peek != ')') {
        var more = true
        while (more) {
          out += ident(); ws()
          if (peek == ',') { i += 1; ws() } else more = false
        }
      }
      expect(')')
      out.result()
    }

    private def number(): Double = {
      ws()
      val start = i
      if (i < s.length && (s(i) == '-' || s(i) == '+')) i += 1
      val digits = i
      while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
      if (i == digits) { i = start; fail("expected number") }
      // scientific notation: 1.7e9, 2E-3
      if (i < s.length && (s(i) == 'e' || s(i) == 'E')) {
        i += 1
        if (i < s.length && (s(i) == '-' || s(i) == '+')) i += 1
        while (i < s.length && s(i).isDigit) i += 1
      }
      s.substring(start, i).toDouble
    }

    private def parsePrimary(): PromExpr = {
      ws()
      if (peek == '(') { // parenthesized sub-expression
        i += 1
        val e = parseExpr()
        expect(')')
        return e
      }
      // operand position: a leading '-' here is a numeric sign, not the
      // binary operator (parseExpr/parseMul consume operators themselves)
      if (peek.isDigit || peek == '.' ||
          (peek == '-' && i + 1 < s.length && (s(i + 1).isDigit || s(i + 1) == '.')))
        return NumberLit(number())
      val save = i
      val name = ident()
      ws()
      if (aggOps(name)) {
        // Prometheus allows the grouping clause before OR after the args:
        // `sum by (l) (expr)` and `sum(expr) by (l)` — `without` likewise
        var grouping: Option[(Seq[String], Boolean)] = parseByClause()
        expect('(')
        val child = parseExpr()
        expect(')')
        if (grouping.isEmpty) grouping = parseByClause()
        val (by, without) = grouping.getOrElse((Nil, false))
        val out = AggExpr(name, by, child, without)
        ws(); out
      } else if (name == "topk" || name == "bottomk") {
        expect('(')
        val k = number()
        if (k != math.floor(k) || k < 1) fail(s"$name needs a positive integer k")
        expect(',')
        val child = parseExpr()
        expect(')')
        TopkExpr(name, k.toInt, child)
      } else if (name == "quantile") {
        var grouping: Option[(Seq[String], Boolean)] = parseByClause()
        expect('(')
        val phi = number()
        expect(',')
        val child = parseExpr()
        expect(')')
        if (grouping.isEmpty) grouping = parseByClause()
        val (by, without) = grouping.getOrElse((Nil, false))
        QuantileExpr(phi, by, child, without)
      } else if (name == "histogram_quantile") {
        expect('(')
        val phi = number()
        expect(',')
        val child = parseExpr()
        expect(')')
        HistogramQuantileExpr(phi, child)
      } else if (name == "label_replace") {
        expect('(')
        val child = parseExpr()
        expect(','); ws(); val dst = quoted()
        expect(','); ws(); val repl = quoted()
        expect(','); ws(); val src = quoted()
        expect(','); ws(); val re = quoted()
        expect(')')
        LabelReplaceExpr(child, dst, repl, src, re)
      } else if (name == "label_join") {
        expect('(')
        val child = parseExpr()
        expect(','); ws(); val dst = quoted()
        expect(','); ws(); val sep = quoted()
        val srcs = Seq.newBuilder[String]
        ws()
        while (peek == ',') { i += 1; ws(); srcs += quoted(); ws() }
        expect(')')
        val ss = srcs.result()
        if (ss.isEmpty) fail("label_join needs at least one source label")
        LabelJoinExpr(child, dst, sep, ss)
      } else if (rangeFuncs(name) || name == "quantile_over_time") {
        // canonical name: double_exponential_smoothing is the renamed
        // holt_winters (Prometheus 3.x); lower both to one implementation
        val fn = if (name == "double_exponential_smoothing") "holt_winters" else name
        expect('(')
        val phi =
          if (name == "quantile_over_time") {
            ws(); val x = number(); ws(); expect(','); Some(x)
          } else None
        // the argument is either a range selector `m{...}[d]` or a
        // subquery `expr[range:step]` (step required here)
        val child = parseExpr()
        ws()
        // trailing scalar args (predict_linear horizon, holt_winters sf/tf)
        def trailing(): (Option[Double], Option[Double]) = {
          val args = Seq.newBuilder[Double]
          ws()
          while (peek == ',') { i += 1; args += number(); ws() }
          val as = args.result()
          if (as.length != rangeFuncArity(name))
            fail(s"$name takes ${rangeFuncArity(name)} scalar argument(s) after the range")
          (phi.orElse(as.headOption), as.lift(1))
        }
        if (peek == '[') {
          i += 1
          val range = duration()
          ws(); expect(':')
          val step = duration()
          expect(']')
          val (p1, p2) = trailing()
          expect(')')
          SubqueryFunc(fn, child, range, step, p1, p2)
        } else {
          val (p1, p2) = trailing()
          expect(')')
          child match {
            case VectorSelector(sel) if sel.rangeMs.isDefined =>
              RangeFunc(fn, sel, p1, p2)
            case _ => fail(s"$name requires a range selector [dur] or a subquery [range:step]")
          }
        }
      } else if (name == "time") {
        expect('('); expect(')')
        TimeExpr
      } else if (name == "vector") {
        expect('(')
        val v = number()
        expect(')')
        VectorLitExpr(v)
      } else if (name == "scalar") {
        expect('(')
        val child = parseExpr()
        expect(')')
        ScalarOfExpr(child)
      } else if (name == "absent") {
        expect('(')
        val child = parseExpr()
        expect(')')
        AbsentExpr(child)
      } else if (name == "count_values") {
        expect('(')
        ws(); val lbl = quoted()
        ws(); expect(',')
        val child = parseExpr()
        expect(')')
        CountValuesExpr(lbl, child)
      } else if (mathFuncs(name)) {
        expect('(')
        val child = parseExpr()
        val args = Seq.newBuilder[Double]
        ws()
        while (peek == ',') { i += 1; args += number(); ws() }
        expect(')')
        val as = args.result()
        val need = name match {
          case "clamp" => 2
          case "clamp_min" | "clamp_max" => 1
          case _ => 0
        }
        if (as.length != need)
          fail(s"$name needs exactly $need scalar argument(s)")
        MathFunc(name, child, as)
      } else {
        i = save
        VectorSelector(parseSelector())
      }
    }

    /** `by (l,...)` or `without (l,...)` — second element is true for
      * `without` (Prometheus grouping-clause grammar). */
    private def parseByClause(): Option[(Seq[String], Boolean)] = {
      ws()
      val kw =
        if (s.startsWith("by", i) &&
            { val j = i + 2; j >= s.length || !s(j).isLetterOrDigit }) Some(2)
        else if (s.startsWith("without", i) &&
            { val j = i + 7; j >= s.length || !s(j).isLetterOrDigit }) Some(7)
        else None
      kw.map { len =>
        i += len
        expect('(')
        val bs = Seq.newBuilder[String]
        var more = true
        while (more) {
          bs += ident(); ws()
          if (peek == ',') i += 1 else more = false
        }
        expect(')')
        (bs.result(), len == 7)
      }
    }

    private def parseSelector(): Selector = {
      val metric = ident()
      ws()
      val ms = Seq.newBuilder[Matcher]
      if (peek == '{') {
        i += 1
        ws()
        while (peek != '}') {
          val label = ident()
          ws()
          val op =
            if (s.startsWith("=~", i)) { i += 2; "=~" }
            else if (s.startsWith("!~", i)) { i += 2; "!~" }
            else if (s.startsWith("!=", i)) { i += 2; "!=" }
            else if (peek == '=') { i += 1; "=" }
            else fail("expected matcher operator")
          val v = quoted()
          ms += (op match {
            case "="  => EqMatcher(label, v)
            case "!=" => NeqMatcher(label, v)
            case "=~" => ReMatcher(label, v)
            case "!~" => NreMatcher(label, v)
          })
          ws()
          if (peek == ',') { i += 1; ws() }
        }
        i += 1
        ws()
      }
      var range: Option[Long] = None
      if (peek == '[') {
        val bracket = i
        i += 1
        range = Some(duration())
        if (peek == ':') { // `[range:step]` — a subquery suffix, not ours:
          i = bracket      // rewind so the enclosing function consumes it
          range = None
        } else expect(']')
      }
      ws()
      // `offset d` and `@ <unix-seconds>` modifiers, either order
      var offset = 0L
      var atMs: Option[Long] = None
      var more = true
      while (more) {
        ws()
        if (s.startsWith("offset", i) &&
            (i + 6 >= s.length || !s(i + 6).isLetterOrDigit)) {
          i += 6
          offset = duration()
        } else if (peek == '@') {
          i += 1
          atMs = Some(math.round(number() * 1000.0))
        } else more = false
      }
      Selector(metric, ms.result(), range, offset, atMs)
    }
  }

  // -------------------------------------------------------------- lowering

  def eval(
      spark: SparkSession, resolve: String => SeriesTable,
      query: String, p: EvalParams): DataFrame =
    evalExpr(spark, resolve, parse(query), p)

  /** AST-level entry for callers that already hold a lowered [[PromExpr]] —
    * the gRPC `PromQuery` structured-expr handler builds the AST straight
    * from protobuf (reference query_frontend/src/promql/convert.rs), no
    * query string involved. */
  def evalAst(
      spark: SparkSession, resolve: String => SeriesTable,
      expr: PromExpr, p: EvalParams): DataFrame =
    evalExpr(spark, resolve, expr, p)

  private def evalExpr(
      spark: SparkSession, resolve: String => SeriesTable,
      expr: PromExpr, p: EvalParams): DataFrame = expr match {
    case VectorSelector(sel) if sel.rangeMs.isDefined && sel.atMs.isEmpty =>
      // TOP-LEVEL range selector `m{...}[5m]`: the RAW samples in
      // (t-range, t] per series — Prometheus's matrix-of-raw-samples
      // shape, which the reference serves through remote read
      // (integration_tests/prom/remote-query.py asserts exactly this)
      val (t, s2) = applyFieldLabel(resolve(sel.metric), sel)
      val off = s2.offsetMs
      s2.matchers.foldLeft(t.df)((d, m) => d.filter(matcherCol(m)))
        .filter(col(t.tsCol) >
            timestamp_millis(lit(p.endMs - s2.rangeMs.get - off)) &&
          col(t.tsCol) <= timestamp_millis(lit(p.endMs - off)))
        .select(t.tags.map(c => col(c).cast("string").as(c)) :+
          col(t.tsCol).as("ts") :+
          col(t.valueCol).cast("double").as("value"): _*)

    case VectorSelector(sel) =>
      aligned(spark, resolve(sel.metric), sel, p, "instant")

    case RangeFunc("absent_over_time", sel, _, _) =>
      // 1 at grid steps whose (t-range, t] window holds NO samples of the
      // selector (any series) — the range-window variant of absent(). The
      // per-series present_over_time frame is tiny (grid-bounded); the
      // anti-join against the step grid mirrors AbsentExpr.
      val present = aligned(spark, resolve(sel.metric), sel, p, "present_over_time")
      gridFrame(spark, p)
        .join(present.select("ts").distinct(), Seq("ts"), "left_anti")
        .withColumn("value", lit(1.0))

    case RangeFunc(f, sel, param, param2) =>
      aligned(spark, resolve(sel.metric), sel, p, f,
        param.getOrElse(Double.NaN), param2.getOrElse(Double.NaN))

    case TimeExpr =>
      // per-step scalar frame: the evaluation timestamp in seconds
      gridFrame(spark, p)
        .withColumn("value", (unix_millis(col("ts")) / 1000.0).cast("double"))

    case VectorLitExpr(v) =>
      gridFrame(spark, p).withColumn("value", lit(v))

    case ScalarOfExpr(child) =>
      // exactly-one-element steps keep that value; everything else is NaN
      // (Prometheus scalar()). One hash-agg on ts; the grid join restores
      // steps where the child is empty.
      val in = evalExpr(spark, resolve, child, p)
      val perStep = in.groupBy("ts").agg(
        count(lit(1)).as("__n"), max(col("value")).as("__v"))
      gridFrame(spark, p)
        .join(perStep, Seq("ts"), "left")
        .withColumn("value",
          when(col("__n") === 1, col("__v")).otherwise(lit(Double.NaN)))
        .drop("__n", "__v")

    case SubqueryFunc(f, child, rangeMs, stepMs, param, param2) =>
      // Prometheus subquery: the child evaluates as instant queries on an
      // absolute step-aligned grid covering every outer window, and those
      // (ts, value) points are the range samples the outer function sees.
      // ONE inner evaluation serves the whole outer grid — the inner frame
      // is then re-windowed per series, so cost scales with the inner grid,
      // not outer×inner.
      val innerStart = Math.floorDiv(p.startMs - rangeMs, stepMs) * stepMs + stepMs
      val innerEnd = Math.floorDiv(p.endMs, stepMs) * stepMs
      val inner = evalExpr(spark, resolve, child,
        p.copy(startMs = innerStart, endMs = innerEnd, stepMs = stepMs))
      val tagCols = inner.columns.filterNot(c => c == "ts" || c == "value").toSeq
      alignSamplesFrame(spark, inner, tagCols, p, rangeMs, f,
        param.getOrElse(Double.NaN), param2.getOrElse(Double.NaN))
    case AggExpr(op, by, child, without) =>
      val in = evalExpr(spark, resolve, child, p)
      val tagCols = in.columns.filterNot(c => c == "ts" || c == "value").toSeq
      // `without` drops the listed labels, keeping all others; unknown
      // labels are silently ignored (Prometheus). `by` requires its labels.
      val groupLabels =
        if (without) tagCols.filterNot(by.contains)
        else {
          val unknown = by.filterNot(tagCols.contains)
          require(unknown.isEmpty, s"unknown grouping labels: ${unknown.mkString(",")}")
          by
        }
      val keys = (groupLabels :+ "ts").map(col)
      val agg = op match {
        case "sum"   => sum("value")
        case "avg"   => avg("value")
        case "count" => count(lit(1)).cast("double")
        case "min"   => min("value")
        case "max"   => max("value")
        // population moments (Prometheus aggregations.go), not sample
        case "stddev" => stddev_pop("value")
        case "stdvar" => var_pop("value")
        case "group"  => lit(1.0)
      }
      in.groupBy(keys: _*).agg(agg.as("value"))

    case TopkExpr(op, k, child) =>
      // k extreme series per grid step, labels preserved (Prometheus topk/
      // bottomk). row_number with a tag tie-break keeps output deterministic
      // (Prometheus itself is arbitrary on ties). The window partitions by
      // step — cardinality = grid size, state = series per step.
      val in = evalExpr(spark, resolve, child, p)
      val tagCols = in.columns.filterNot(c => c == "ts" || c == "value").toSeq
      val ord = (if (op == "topk") col("value").desc else col("value").asc) +:
        tagCols.map(col(_).asc)
      import org.apache.spark.sql.expressions.Window
      in.withColumn("__rk", row_number().over(
          Window.partitionBy(col("ts")).orderBy(ord: _*)))
        .filter(col("__rk") <= k).drop("__rk")

    case QuantileExpr(phi, by, child, without) =>
      // φ-quantile across series per (by, step) with linear interpolation —
      // Spark's exact `percentile` matches Prometheus's quantile math
      val in = evalExpr(spark, resolve, child, p)
      val tagCols = in.columns.filterNot(c => c == "ts" || c == "value").toSeq
      val groupLabels =
        if (without) tagCols.filterNot(by.contains)
        else {
          val unknown = by.filterNot(tagCols.contains)
          require(unknown.isEmpty, s"unknown grouping labels: ${unknown.mkString(",")}")
          by
        }
      in.groupBy((groupLabels :+ "ts").map(col): _*)
        .agg(percentile(col("value"), lit(phi)).as("value"))

    case CountValuesExpr(label, child) =>
      // per step: one element per distinct sample value, the value rendered
      // into the new label (cast to string) and the count as the value —
      // a keyed groupBy on (step, value)
      val in = evalExpr(spark, resolve, child, p)
      in.groupBy(col("ts"), col("value").cast("string").as(label))
        .agg(count(lit(1)).cast("double").as("value"))

    case AbsentExpr(child) =>
      // steps where the child evaluates to an empty vector → value 1, no
      // labels (the label-inference-from-equality-matchers refinement of
      // Prometheus is presentation-only and skipped). The grid is tiny
      // (one row per step) — an anti-join of the grid against the child's
      // distinct steps.
      val in = evalExpr(spark, resolve, child, p)
      gridFrame(spark, p).join(in.select("ts").distinct(), Seq("ts"), "left_anti")
        .withColumn("value", lit(1.0))

    case MathFunc(name, child, args) =>
      val in = evalExpr(spark, resolve, child, p)
      val v = col("value")
      def calTs(x: Column) = timestamp_seconds(floor(x).cast("long"))
      if (name == "clamp" && args(0) > args(1))
        // Prometheus: clamp with min > max drops every element
        return in.filter(lit(false))
      if (name == "sort" || name == "sort_desc")
        // presentation ordering per evaluation step (values unchanged);
        // the ordering survives to collect()/display but downstream
        // operators must not rely on it — same caveat as Prometheus,
        // where instant-vector order is only meaningful in the output
        return in.orderBy(col("ts"),
          if (name == "sort") col("value").asc_nulls_last
          else col("value").desc_nulls_last)
      val out = name match {
        case "abs"       => abs(v)
        case "ceil"      => ceil(v).cast("double")
        case "floor"     => floor(v).cast("double")
        case "round"     => round(v, 0)
        case "clamp_min" => greatest(v, lit(args.head))
        case "clamp_max" => least(v, lit(args.head))
        case "clamp"     => least(greatest(v, lit(args(0))), lit(args(1)))
        case "exp"       => exp(v)
        case "ln"        => log(v)
        case "log2"      => log2(v)
        case "log10"     => log10(v)
        case "sqrt"      => sqrt(v)
        case "sgn"       => signum(v)
        case "sin"   => sin(v)
        case "cos"   => cos(v)
        case "tan"   => tan(v)
        case "asin"  => asin(v)
        case "acos"  => acos(v)
        case "atan"  => atan(v)
        case "sinh"  => sinh(v)
        case "cosh"  => cosh(v)
        case "tanh"  => tanh(v)
        case "asinh" => asinh(v)
        case "acosh" => acosh(v)
        case "atanh" => atanh(v)
        case "deg"   => degrees(v)
        case "rad"   => radians(v)
        // timestamp(v): each element's value becomes its own grid instant
        // in seconds (promql funcTimestamp)
        case "timestamp" => (unix_millis(col("ts")) / 1000.0).cast("double")
        // calendar family: value = unix seconds, fields extracted in UTC
        // (Prometheus is UTC-only; the engine session runs UTC). int64
        // truncation of the float seconds matches dateWrapper.
        case "minute"        => minute(calTs(v)).cast("double")
        case "hour"          => hour(calTs(v)).cast("double")
        case "day_of_week"   => (dayofweek(calTs(v)) - 1).cast("double")
        case "day_of_month"  => dayofmonth(calTs(v)).cast("double")
        case "days_in_month" => dayofmonth(last_day(calTs(v))).cast("double")
        case "month"         => month(calTs(v)).cast("double")
        case "year"          => year(calTs(v)).cast("double")
      }
      in.withColumn("value", out)

    case SetOpExpr(op, lhs, rhs) =>
      // element matching on the full shared label set per step; plain
      // semi/anti/union-anti joins — the same keyed shuffle as BinExpr
      val ld = evalExpr(spark, resolve, lhs, p)
      val rd = evalExpr(spark, resolve, rhs, p)
      val lTags = ld.columns.filterNot(c => c == "ts" || c == "value").toSeq
      val rTags = rd.columns.filterNot(c => c == "ts" || c == "value").toSeq
      require(lTags.sorted == rTags.sorted,
        s"set operation label sets differ: ${lTags.mkString(",")} vs ${rTags.mkString(",")}")
      val keys = lTags :+ "ts"
      op match {
        case "and"    => ld.join(rd.select(keys.map(col): _*), keys, "left_semi")
        case "unless" => ld.join(rd.select(keys.map(col): _*), keys, "left_anti")
        case "or" =>
          val missing = rd.join(ld.select(keys.map(col): _*), keys, "left_anti")
          ld.select(ld.columns.map(col): _*)
            .union(missing.select(ld.columns.map(col): _*))
      }

    case LabelReplaceExpr(child, dst, repl, src, regex) =>
      // map-only: no shuffle. Anchor the regex (Prometheus full-match) and
      // expand $1-style groups via Spark's regexp_replace (Java group refs).
      val in = evalExpr(spark, resolve, child, p)
      val tagCols = in.columns.filterNot(c => c == "ts" || c == "value").toSeq
      require(dst.matches("[a-zA-Z_][a-zA-Z0-9_]*"),
        s"label_replace: invalid destination label '$dst'")
      // absent labels read as "" (Prometheus treats missing = empty)
      val srcCol = if (tagCols.contains(src)) col(src).cast("string") else lit("")
      val dstOrig = if (tagCols.contains(dst)) col(dst).cast("string") else lit("")
      val anchored = "^(?:" + regex + ")$"
      // validate the regex eagerly (Prometheus errors on a bad regex)
      java.util.regex.Pattern.compile(anchored)
      in.withColumn(dst,
        when(srcCol.rlike(anchored),
          regexp_replace(srcCol, anchored, repl)).otherwise(dstOrig))

    case LabelJoinExpr(child, dst, sep, srcs) =>
      val in = evalExpr(spark, resolve, child, p)
      val tagCols = in.columns.filterNot(c => c == "ts" || c == "value").toSeq
      require(dst.matches("[a-zA-Z_][a-zA-Z0-9_]*"),
        s"label_join: invalid destination label '$dst'")
      val parts = srcs.map(sc =>
        if (tagCols.contains(sc)) col(sc).cast("string") else lit(""))
      in.withColumn(dst, concat_ws(sep, parts: _*))

    case HistogramQuantileExpr(phi, child) =>
      // bucketQuantile (promql/quantile.go): one shuffle on the series
      // labels (le dropped) + step; window math inside each histogram.
      val in = evalExpr(spark, resolve, child, p)
      val tagCols = in.columns.filterNot(c => c == "ts" || c == "value").toSeq
      require(tagCols.contains("le"),
        "histogram_quantile requires a bucket vector with an 'le' label")
      val grp = tagCols.filterNot(_ == "le")
      val keys = (grp :+ "ts").map(col)
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(keys: _*).orderBy(col("__le"))
      val wAll = Window.partitionBy(keys: _*)
      val leD = when(col("le") === "+Inf", lit(Double.PositiveInfinity))
        .otherwise(col("le").cast("double"))
      val staged = in
        .withColumn("__le", leD)
        .withColumn("__total", max(when(col("__le") === lit(Double.PositiveInfinity),
          col("value"))).over(wAll))
        .withColumn("__rank", lit(phi) * col("__total"))
        .withColumn("__bi", row_number().over(wOrd))
        .withColumn("__prevLe", lag(col("__le"), 1, 0.0).over(wOrd))
        .withColumn("__prevCt", lag(col("value"), 1, 0.0).over(wOrd))
        .filter(col("__le") =!= lit(Double.PositiveInfinity))
      // first finite bucket reaching the rank; absent → clamp to max le
      val hit = staged.filter(col("value") >= col("__rank"))
        .withColumn("__rn", row_number().over(wOrd))
        .filter(col("__rn") === 1)
        .select(keys :+ col("__le") :+ col("__bi") :+ col("__prevLe") :+
          col("__prevCt") :+ col("__rank") :+ col("value").as("__ct"): _*)
      val maxLe = staged.groupBy(keys: _*).agg(
        max(col("__le")).as("__maxLe"), max(col("__total")).as("__tot"))
      val joined = maxLe.join(hit, grp :+ "ts", "left")
      val interp = col("__prevLe") +
        (col("__le") - col("__prevLe")) *
          ((col("__rank") - col("__prevCt")) / (col("__ct") - col("__prevCt")))
      val resultCol =
        when(col("__tot").isNull || col("__tot") <= 0.0, lit(Double.NaN))
          .when(col("__le").isNull, col("__maxLe")) // only +Inf reaches rank
          .when(col("__bi") === 1 && col("__le") <= 0.0, col("__le"))
          .otherwise(interp)
      joined.withColumn("value", resultCol)
        .select((grp.map(col) :+ col("ts") :+ col("value")): _*)

    case NumberLit(_) =>
      throw new IllegalArgumentException("scalar-only expressions are not supported")

    case CompareExpr(op, lhs, rhs, bool) => (lhs, rhs) match {
      // vector∘scalar comparison: filter (keep the element's value) or,
      // with `bool`, map every element to 0/1.
      case (v, NumberLit(c)) =>
        compareToScalar(evalExpr(spark, resolve, v, p), op, c, bool)
      case (NumberLit(c), v) =>
        val flipped = op match { // c OP v ⇔ v OP' c
          case ">" => "<"; case "<" => ">"; case ">=" => "<="; case "<=" => ">="
          case other => other
        }
        compareToScalar(evalExpr(spark, resolve, v, p), flipped, c, bool)
      case (l, r) =>
        // vector∘vector: one-to-one element match on the shared label set
        // per step (a tag-less side — scalar()/time()/aggregated-away — is
        // a per-step scalar frame joined on ts only); lhs keeps its value
        // and labels, `bool` maps matched pairs to 0/1
        val ld = evalExpr(spark, resolve, l, p)
        val rd = evalExpr(spark, resolve, r, p)
        val lTags = ld.columns.filterNot(c => c == "ts" || c == "value").toSeq
        val rTags = rd.columns.filterNot(c => c == "ts" || c == "value").toSeq
        val keys =
          if (rTags.isEmpty || lTags.isEmpty) Seq("ts")
          else {
            require(lTags.sorted == rTags.sorted,
              s"comparison label sets differ: ${lTags.mkString(",")} vs ${rTags.mkString(",")}")
            lTags :+ "ts"
          }
        val (many, one) = if (lTags.isEmpty && rTags.nonEmpty) (rd, ld) else (ld, rd)
        val flip = lTags.isEmpty && rTags.nonEmpty
        val joined = many.withColumnRenamed("value", "__lv")
          .join(one.select((keys.map(col) :+ col("value").as("__rv")): _*), keys)
        val (a, b) = if (flip) (col("__rv"), col("__lv")) else (col("__lv"), col("__rv"))
        val cond = op match {
          case ">"  => a > b
          case "<"  => a < b
          case ">=" => a >= b
          case "<=" => a <= b
          case "==" => a === b
          case "!=" => a =!= b
        }
        // filter mode keeps the VECTOR side's element value (scalar∘vector
        // comparisons filter the vector — Prometheus operator semantics);
        // `many` is always the labeled side, renamed to __lv above
        val out =
          if (bool) joined.withColumn("value", when(cond, 1.0).otherwise(0.0))
          else joined.filter(cond).withColumn("value", col("__lv"))
        out.drop("__lv", "__rv")
    }

    case BinExpr(op, lhs, rhs, matching) => (lhs, rhs) match {
      case (NumberLit(_), NumberLit(_)) =>
        throw new IllegalArgumentException("scalar-only expressions are not supported")
      case (NumberLit(a), v) =>
        val in = evalExpr(spark, resolve, v, p)
        in.withColumn("value", binCol(op, lit(a), col("value")))
      case (v, NumberLit(b)) =>
        val in = evalExpr(spark, resolve, v, p)
        in.withColumn("value", binCol(op, col("value"), lit(b)))
      case (l, r) =>
        // vector ∘ vector: equi-join per step — shuffle on (labels, ts)
        val ld = evalExpr(spark, resolve, l, p)
        val rd = evalExpr(spark, resolve, r, p)
        val lTags = ld.columns.filterNot(c => c == "ts" || c == "value").toSeq
        val rTags = rd.columns.filterNot(c => c == "ts" || c == "value").toSeq
        matching match {
          case None if lTags.isEmpty ^ rTags.isEmpty =>
            // one side is a per-step scalar frame (scalar()/time()/a fully
            // collapsed aggregate): join on ts only, the labeled side keeps
            // its labels — Prometheus scalar∘vector semantics
            val (vec, sc, vecLeft) =
              if (rTags.isEmpty) (ld, rd, true) else (rd, ld, false)
            val joined = vec.withColumnRenamed("value", "__vv")
              .join(sc.select(col("ts"), col("value").as("__sv")), Seq("ts"))
            val v =
              if (vecLeft) binCol(op, col("__vv"), col("__sv"))
              else binCol(op, col("__sv"), col("__vv"))
            joined.withColumn("value", v).drop("__vv", "__sv")
          case None =>
            // Prometheus default: one-to-one on the full shared label set
            // (the metric name is already gone from our frames)
            require(lTags.sorted == rTags.sorted,
              s"binary operation label sets differ: ${lTags.mkString(",")} vs ${rTags.mkString(",")}; use on()/ignoring()")
            val keys = lTags :+ "ts"
            ld.withColumnRenamed("value", "__lv")
              .join(rd.withColumnRenamed("value", "__rv"), keys)
              .withColumn("value", binCol(op, col("__lv"), col("__rv")))
              .drop("__lv", "__rv")
          case Some(m) =>
            val keyLabels =
              if (m.on) m.labels
              else lTags.intersect(rTags).filterNot(m.labels.contains)
            val keys = keyLabels :+ "ts"
            if (!m.groupLeft && !m.groupRight) {
              // one-to-one: the result keeps only the matching labels
              // (Prometheus vector-matching). NOTE: duplicate key groups
              // multiply like any equi-join where Prometheus would raise
              // "many-to-one matching must use group_left" — use the
              // explicit group modifier for many-to-one shapes.
              ld.select(keys.map(col) :+ col("value").as("__lv"): _*)
                .join(rd.select(keys.map(col) :+ col("value").as("__rv"): _*), keys)
                .withColumn("value", binCol(op, col("__lv"), col("__rv")))
                .drop("__lv", "__rv")
            } else {
              // many-to-one: the many side keeps all its labels, plus
              // `include` labels copied from the one side
              val (many, one) = if (m.groupLeft) (ld, rd) else (rd, ld)
              val oneSel = keys.map(col) ++ m.include.map(col) :+
                col("value").as("__ov")
              val joined = many.withColumnRenamed("value", "__mv")
                .join(one.select(oneSel: _*), keys)
              val v =
                if (m.groupLeft) binCol(op, col("__mv"), col("__ov"))
                else binCol(op, col("__ov"), col("__mv"))
              joined.withColumn("value", v).drop("__mv", "__ov")
            }
        }
    }
  }

  /** vector∘scalar-literal comparison: filter keeping the element's value,
    * or with `bool` a 0/1 map over every element. */
  private def compareToScalar(
      in: DataFrame, op: String, c: Double, bool: Boolean): DataFrame = {
    val cond = op match {
      case ">"  => col("value") > c
      case "<"  => col("value") < c
      case ">=" => col("value") >= c
      case "<=" => col("value") <= c
      case "==" => col("value") === c
      case "!=" => col("value") =!= c
    }
    if (bool) in.withColumn("value", when(cond, 1.0).otherwise(0.0))
    else in.filter(cond)
  }

  /** The evaluation grid as a one-column frame (ts) — one row per step. */
  private def gridFrame(spark: SparkSession, p: EvalParams): DataFrame =
    spark.range(0, (p.endMs - p.startMs) / p.stepMs + 1)
      .select(timestamp_millis(lit(p.startMs) + col("id") * p.stepMs).as("ts"))

  private def binCol(op: String, a: Column, b: Column): Column = op match {
    case "+" => a + b
    case "-" => a - b
    case "*" => a * b
    case "/" => a / b
  }

  /** Selector → filtered scan → shuffle by series → grid alignment.
    * Output columns: tag columns (as string), ts (timestamp), value.
    * An `@` modifier evaluates once at the pinned instant and replicates
    * that value across the requested grid (Prometheus fixed-time eval). */
  /** `__horaedb_field__="f"` (query_frontend/src/promql/remote.rs:46,118):
    * a selector matcher that picks WHICH field column serves as the
    * metric value instead of the default — consumed here, never applied
    * as a tag filter. Only a single equality matcher is meaningful. */
  private val FieldLabel = "__horaedb_field__"

  private def applyFieldLabel(
      t: SeriesTable, sel: Selector): (SeriesTable, Selector) = {
    val (f, rest) = sel.matchers.partition(_.label == FieldLabel)
    f match {
      case Seq() => (t, sel)
      case Seq(EqMatcher(_, v)) =>
        (t.copy(valueCol = v), sel.copy(matchers = rest))
      case _ => throw new IllegalArgumentException(
        s"$FieldLabel must be a single equality matcher")
    }
  }

  private def aligned(
      spark: SparkSession, t0: SeriesTable, sel0: Selector,
      p: EvalParams, func: String, param: Double = Double.NaN,
      param2: Double = Double.NaN): DataFrame = {
  val (t, sel) = applyFieldLabel(t0, sel0)
  sel.atMs match {
    case Some(at) =>
      val single = alignedGrid(spark, t, sel.copy(atMs = None),
        p.copy(startMs = at, endMs = at), func, param, param2)
      single
        .withColumn("__step",
          explode(sequence(lit(p.startMs), lit(p.endMs), lit(p.stepMs))))
        .select(t.tags.map(col) :+
          timestamp_millis(col("__step")).as("ts") :+ col("value"): _*)
    case None => alignedGrid(spark, t, sel, p, func, param, param2)
  }
  }

  private def alignedGrid(
      spark: SparkSession, t: SeriesTable, sel: Selector,
      p: EvalParams, func: String, param: Double = Double.NaN,
      param2: Double = Double.NaN): DataFrame = {
    import spark.implicits._
    val windowMs = if (func == "instant") p.lookbackMs else sel.rangeMs.get
    val rangeMs = sel.rangeMs.getOrElse(0L)
    val off = sel.offsetMs

    // `offset d`: evaluate d in the past — filter bounds shift back by d,
    // sample timestamps shift forward so the grid math is unchanged
    val filtered = sel.matchers.foldLeft(t.df) { (d, m) => d.filter(matcherCol(m)) }
      .filter(col(t.tsCol) > timestamp_millis(lit(p.startMs - windowMs - off)) &&
              col(t.tsCol) <= timestamp_millis(lit(p.endMs - off)))

    val tagArray = array(t.tags.map(c => col(c).cast("string")): _*)
    val samples = filtered.select(
        tagArray.as("k"),
        (unix_millis(col(t.tsCol)) + off).as("tsm"),
        col(t.valueCol).cast("double").as("v"))
      .as[(Seq[String], Long, Double)]

    val alignedDs = samples.groupByKey(_._1).flatMapGroups { (k, it) =>
      val arr = PromAlign.sortSamples(
        it.map(r => PromAlign.Sample(r._2, r._3)).toArray)
      val pts =
        if (func == "instant") PromAlign.alignInstant(arr, p)
        else PromAlign.alignRange(arr, p, rangeMs, func, param, param2)
      pts.map { case (ts, v) => (k, ts, v) }
    }

    val tagSel = t.tags.zipWithIndex.map { case (c, idx) => col("_1")(idx).as(c) }
    alignedDs.toDF("_1", "_2", "_3")
      .select(tagSel :+ timestamp_millis(col("_2")).as("ts") :+ col("_3").as("value"): _*)
  }

  /** Range-function alignment over an already-evaluated frame (tags, ts,
    * value) — the subquery path: same shuffle-by-series + per-group window
    * math as [[alignedGrid]], but the samples are computed points, not a
    * table scan. */
  private def alignSamplesFrame(
      spark: SparkSession, in: DataFrame, tagCols: Seq[String],
      p: EvalParams, rangeMs: Long, func: String, param: Double,
      param2: Double = Double.NaN): DataFrame = {
    import spark.implicits._
    val tagArray = array(tagCols.map(c => col(c).cast("string")): _*)
    val samples = in.select(
        tagArray.as("k"), unix_millis(col("ts")).as("tsm"),
        col("value").cast("double").as("v"))
      .as[(Seq[String], Long, Double)]
    val alignedDs = samples.groupByKey(_._1).flatMapGroups { (k, it) =>
      val arr = PromAlign.sortSamples(
        it.map(r => PromAlign.Sample(r._2, r._3)).toArray)
      PromAlign.alignRange(arr, p, rangeMs, func, param, param2)
        .map { case (ts, v) => (k, ts, v) }
    }
    val tagSel = tagCols.zipWithIndex.map { case (c, idx) => col("_1")(idx).as(c) }
    alignedDs.toDF("_1", "_2", "_3")
      .select(tagSel :+ timestamp_millis(col("_2")).as("ts") :+ col("_3").as("value"): _*)
  }

  /** Prometheus remote-read (reference promql/remote.rs:44,60-120): label
    * matchers — `__name__` selects the table — plus a time range, returning
    * raw samples (tags as strings, ts, value) with the default series sort.
    * No alignment: remote read ships samples, the caller evaluates. */
  def remoteRead(
      resolve: String => SeriesTable, matchers: Seq[Matcher],
      startMs: Long, endMs: Long): DataFrame = {
    val metric = matchers.collectFirst {
      case EqMatcher("__name__", v) => v
    }.getOrElse(throw new IllegalArgumentException(
      "remote read requires an equality __name__ matcher"))
    val t0 = resolve(metric)
    // __horaedb_field__ selects the value column (remote.rs:118)
    val (t, fieldRest) = {
      val (f, others) = matchers.partition(_.label == FieldLabel)
      f match {
        case Seq() => (t0, others)
        case Seq(EqMatcher(_, v)) => (t0.copy(valueCol = v), others)
        case _ => throw new IllegalArgumentException(
          s"$FieldLabel must be a single equality matcher")
      }
    }
    val rest = fieldRest.filterNot(_.label == "__name__")
    val filtered = rest.foldLeft(t.df)((d, m) => d.filter(matcherCol(m)))
      .filter(col(t.tsCol) >= timestamp_millis(lit(startMs)) &&
              col(t.tsCol) <= timestamp_millis(lit(endMs)))
    filtered.select(
        (t.tags.map(c => col(c).cast("string").as(c)) :+
          col(t.tsCol).as("ts") :+ col(t.valueCol).cast("double").as("value")): _*)
      .orderBy((t.tags.map(col) :+ col("ts")): _*)
  }

  private def matcherCol(m: Matcher): Column = m match {
    case EqMatcher(l, v)  => col(l).cast("string") === v
    case NeqMatcher(l, v) => col(l).cast("string") =!= v
    // Prometheus regexes are fully anchored
    case ReMatcher(l, r)  => col(l).cast("string").rlike(s"^(?:$r)$$")
    case NreMatcher(l, r) => !col(l).cast("string").rlike(s"^(?:$r)$$")
  }
}
