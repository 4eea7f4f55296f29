package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.functions.{col, floor, lit, timestamp_micros, unix_micros}
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampNTZType, TimestampType}

/** Transparent materialized-rollup query rewriting — the TSDB optimization
  * the reference reaches through manually-queried rollup tables, promoted
  * here to a Catalyst rule: an aggregate over the RAW table whose grouping
  * is (subset of rollup tags) x (time bucket that is a multiple of the
  * rollup grain) and whose aggregates are rollup-mergeable
  * (count→sum(n), sum→sum(sum_x), min→min(min_x), max→max(max_x)) is
  * rewritten to read the pre-aggregated rollup instead — turning a
  * 100 TB raw scan into a |tags|x|buckets|-row one. The rewrite is
  * result-invisible (the correctness gate runs the ORIGINAL query's oracle
  * over raw data).
  *
  * Scope: Aggregate over [Project over] [Filter over] a file relation. A
  * Filter below the aggregate is served iff every conjunct is losslessly
  * expressible against the rollup: `ts >= lit` / `ts < lit` with the
  * literal aligned to the ROLLUP grain (the half-open bound then selects
  * whole rollup buckets — the query's own bucket grain may be coarser and
  * even misaligned with the bound, because raw-side filtering happens
  * before bucketing on both plans), tag equality / IN on rollup tag
  * columns (the rollup preserves tag granularity), and the IsNotNull
  * guards the optimizer infers from those. `ts > lit`, `ts <= lit`, or a
  * misaligned bound would split a rollup bucket — bail. Unsupported
  * aggregate functions and non-canonical bucket expressions also bail.
  * Bail-out is always safe: the original plan runs.
  */
object Rollups {

  /** One registered rollup. `rawPathContains` identifies the raw table's
    * file-source scan; `rollup` yields the pre-aggregated frame (pin it
    * with localCheckpoint — the rule splices its optimized plan). */
  final case class RollupSpec(
      rawPathContains: String,
      tsCol: String,
      grainUs: Long,
      tags: Set[String],
      bucketCol: String,
      countCol: Option[String],
      sums: Map[String, String],
      mins: Map[String, String],
      maxs: Map[String, String],
      rollup: () => DataFrame,
      /** per-field non-null counts (count(x), not count(*)) — mergeable
        * regardless of nulls: sum of per-bucket non-null counts */
      counts: Map[String, String] = Map.empty,
      /** Datasketches HLL sketch columns: raw col -> (sketch col, lgK).
        * `hll_sketch_estimate(hll_sketch_agg(x, lgK))` over raw is served
        * as estimate(union of per-bucket sketches) — BIT-EXACT, the merge
        * identity union(sketch(A), sketch(B)) == sketch(A ∪ B) that
        * OperatorsSpec proves for SketchRollup. Same-lgK only: a
        * mixed-precision union downgrades and would change the estimate. */
      hlls: Map[String, (String, Int)] = Map.empty)

  private val specs = new ConcurrentHashMap[String, RollupSpec]()

  def register(spark: SparkSession, name: String, spec: RollupSpec): Unit = {
    ensureRule(spark)
    specs.put(name, spec)
  }
  def unregister(name: String): Unit = specs.remove(name)
  def clear(): Unit = specs.clear()

  def ensureRule(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RollupRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewrite

  /** The canonical epoch-aligned bucket shape this engine emits everywhere
    * (time_bucket, M4, GROUP BY time()):
    * `timestamp_micros(floor(unix_micros(ts) / G) * G)` after constant
    * folding. Extracts (tsExpr, grainUs). */
  private object CanonicalBucket {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case MicrosToTimestamp(Multiply(f @ Floor(Divide(c: Cast, Literal(gd: Double, DoubleType), _)), Literal(gl: Long, _), _))
          if c.dataType == DoubleType && gd == gl.toDouble =>
        c.child match {
          case UnixMicros(ts) => Some((ts, gl))
          case _ => None
        }
      // the engine's own time_bucket expression, when its buckets are
      // epoch-aligned: sub-day periods always are (TimeBucketUtil floors
      // raw epoch micros); P{n}D only at offset multiples of the width
      case tb: graft.functions.TimeBucket =>
        import graft.functions.TimePeriod
        val (unit, n) = TimePeriod.parse(tb.period)
        val offUs = tb.offsetMinutes * 60000000L
        val gUs = unit match {
          case TimePeriod.SECOND => n * 1000000L
          case TimePeriod.MINUTE => n * 60000000L
          case TimePeriod.HOUR   => n * 3600000000L
          case TimePeriod.DAY if offUs % (n * 86400000000L) == 0 =>
            n * 86400000000L
          case _ => 0L
        }
        if (gUs > 0) Some((tb.child, gUs)) else None
      case _ => None
    }
  }

  object RollupRewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case agg @ Aggregate(groups, outs, child, _) =>
        rewrite(agg, groups, outs, child).getOrElse(agg)
    }

    private def relationPath(p: LogicalPlan): Option[String] = p match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some(fs.location.rootPaths.mkString(","))
      case _ => None
    }

    private def rewrite(
        agg: Aggregate, groups: Seq[Expression], outs: Seq[NamedExpression],
        child: LogicalPlan): Option[LogicalPlan] = {
      // shape: Aggregate over [pruning/bucket-aliasing Project] over
      // [rollup-servable Filter] over a file relation — anything else bails
      val (projList, filterCond, rel) = child match {
        case Project(l, Filter(c, r)) => (Some(l), Some(c), r)
        case Project(l, r)            => (Some(l), None, r)
        case Filter(c, r)             => (None, Some(c), r)
        case r                        => (None, None, r)
      }
      val relPath = relationPath(rel).getOrElse(return None)
      val projMap = projList
        .map(_.map(ne => ne.exprId -> ne).toMap)
        .getOrElse(rel.output.map(a => a.exprId -> (a: NamedExpression)).toMap)
      // all registered rollups of this raw table, coarsest grain first:
      // the first one that can serve scans the fewest rows (a 1d rollup
      // beats a 1h rollup for a 1d-bucket query; finer grains remain the
      // fallback when the coarse grain does not divide the query's)
      val candidates = {
        val b = scala.collection.mutable.ArrayBuffer.empty[RollupSpec]
        specs.values().forEach(s =>
          if (relPath.contains(s.rawPathContains)) b += s)
        b.sortBy(-_.grainUs).toSeq
      }
      if (candidates.isEmpty) return None
      candidates.view.flatMap(spec =>
        attempt(spec, groups, outs, projMap, filterCond)).headOption
    }

    private def attempt(
        spec: RollupSpec, groups: Seq[Expression], outs: Seq[NamedExpression],
        projMap: Map[org.apache.spark.sql.catalyst.expressions.ExprId, NamedExpression],
        filterCond: Option[Expression]): Option[LogicalPlan] = {

      // translate the raw-side filter (if any) into rollup-side conditions;
      // any untranslatable conjunct bails the whole rewrite
      def split(e: Expression): Seq[Expression] = e match {
        case And(l, r) => split(l) ++ split(r)
        case other     => Seq(other)
      }
      def toScala(l: Literal): Any =
        CatalystTypeConverters.convertToScala(l.value, l.dataType)
      // the ts column as queries see it: a plain timestamp attribute, the
      // NTZ-storage cast (Tables.normalizeEventTime over µs-NTZ fixtures),
      // or the engine's nanos-storage derivation timestamp_micros(ts div 1000)
      def isTs(e: Expression): Boolean = e match {
        case a: AttributeReference => a.name == spec.tsCol
        case Cast(a: AttributeReference, TimestampType, _, _) => a.name == spec.tsCol
        case MicrosToTimestamp(IntegralDivide(a: AttributeReference, Literal(1000L, _), _)) =>
          a.name == spec.tsCol
        case _ => false
      }
      // timestamp bound literals: LTZ and NTZ both store epoch-µs longs,
      // identical instants under the UTC sessions this engine runs
      object TsMicrosLit {
        def unapply(e: Expression): Option[Long] = e match {
          case Literal(m: Long, TimestampType)    => Some(m)
          case Literal(m: Long, TimestampNTZType) => Some(m)
          case _ => None
        }
      }
      val rollupFilter: Option[Column] = filterCond match {
        case None => None
        case Some(c) =>
          // pass 1: precise grain-aligned bounds, tag filters, null guards
          var loUs = Long.MinValue; var hiUs = Long.MaxValue
          val cols = scala.collection.mutable.ListBuffer.empty[Column]
          val residual = scala.collection.mutable.ListBuffer.empty[Expression]
          split(c).foreach {
            case GreaterThanOrEqual(e, TsMicrosLit(m))
                if isTs(e) && m >= 0 && m % spec.grainUs == 0 =>
              loUs = math.max(loUs, m)
              cols += (col(spec.bucketCol) >= timestamp_micros(lit(m)))
            case LessThan(e, TsMicrosLit(m))
                if isTs(e) && m >= 0 && m % spec.grainUs == 0 =>
              hiUs = math.min(hiUs, m)
              cols += (col(spec.bucketCol) < timestamp_micros(lit(m)))
            case IsNotNull(a: AttributeReference) if a.name == spec.tsCol =>
              cols += col(spec.bucketCol).isNotNull
            case IsNotNull(a: AttributeReference) if spec.tags.contains(a.name) =>
              cols += col(a.name).isNotNull
            case EqualTo(a: AttributeReference, l: Literal)
                if spec.tags.contains(a.name) =>
              cols += (col(a.name) === lit(toScala(l)))
            case EqualTo(l: Literal, a: AttributeReference)
                if spec.tags.contains(a.name) =>
              cols += (col(a.name) === lit(toScala(l)))
            case In(a: AttributeReference, vs)
                if spec.tags.contains(a.name) && vs.forall(_.isInstanceOf[Literal]) =>
              cols += col(a.name).isin(vs.map(v => toScala(v.asInstanceOf[Literal])): _*)
            case InSet(a: AttributeReference, hs) if spec.tags.contains(a.name) =>
              cols += col(a.name).isin(hs.toSeq.map(v =>
                CatalystTypeConverters.convertToScala(v, a.dataType)): _*)
            case other => residual += other
          }
          // pass 2: the optimizer derives redundant raw-nanos bounds on the
          // storage long (`ts#L > lo_ns - 1ms` etc.) for parquet pushdown —
          // droppable iff numerically implied by the precise [loUs, hiUs)
          val loNs = if (loUs > 0 && loUs < Long.MaxValue / 1000) loUs * 1000 else Long.MinValue
          val hiNs = if (hiUs > 0 && hiUs < Long.MaxValue / 1000) hiUs * 1000 else Long.MaxValue
          def isRawNs(a: AttributeReference) =
            a.name == spec.tsCol && a.dataType == LongType
          val allImplied = residual.forall {
            case GreaterThan(a: AttributeReference, Literal(x: Long, LongType))
                if isRawNs(a) => loNs != Long.MinValue && x < loNs
            case GreaterThanOrEqual(a: AttributeReference, Literal(x: Long, LongType))
                if isRawNs(a) => loNs != Long.MinValue && x <= loNs
            case LessThan(a: AttributeReference, Literal(x: Long, LongType))
                if isRawNs(a) => hiNs != Long.MaxValue && x >= hiNs
            case LessThanOrEqual(a: AttributeReference, Literal(x: Long, LongType))
                if isRawNs(a) => hiNs != Long.MaxValue && x >= hiNs - 1
            case _ => false
          }
          if (!allImplied || cols.isEmpty) return None
          Some(cols.reduce(_ && _))
      }

      // resolve a grouping/output attribute through the pruning Project
      def resolve(e: Expression): Expression = e match {
        case a: AttributeReference => projMap.get(a.exprId) match {
          case Some(Alias(inner, _)) => inner
          case Some(attr) => attr
          case None => a
        }
        case other => other
      }

      // classify grouping expressions: rollup tags and at most one bucket
      var bucketG: Option[Long] = None
      val tagNames = scala.collection.mutable.LinkedHashSet.empty[String]
      groups.foreach { g =>
        resolve(g) match {
          case CanonicalBucket(tsExpr, gUs)
              if bucketG.isEmpty && gUs % spec.grainUs == 0 &&
                tsExpr.references.map(_.name).toSet == Set(spec.tsCol) =>
            bucketG = Some(gUs)
          case a: AttributeReference if spec.tags.contains(a.name) =>
            tagNames += a.name
          case _ => return None
        }
      }

      // classify outputs -> (rollup-side column builders, in output order)
      sealed trait Out
      case class TagOut(name: String) extends Out
      case object BucketOut extends Out
      case class AggOut(c: Column) extends Out

      def mergeAgg(ae: AggregateExpression): Option[Column] = {
        if (ae.isDistinct || ae.filter.nonEmpty) return None
        ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) => spec.countCol.map(c =>
            org.apache.spark.sql.functions.sum(col(c)))
          case Count(Seq(child)) => resolve(child) match {
            case a: AttributeReference if spec.counts.contains(a.name) =>
              Some(org.apache.spark.sql.functions.sum(col(spec.counts(a.name))))
            case _ => None
          }
          case s: Sum => resolve(s.child) match {
            case a: AttributeReference if spec.sums.contains(a.name) =>
              Some(org.apache.spark.sql.functions.sum(col(spec.sums(a.name))))
            case _ => None
          }
          case m: Min => resolve(m.child) match {
            case a: AttributeReference if spec.mins.contains(a.name) =>
              Some(org.apache.spark.sql.functions.min(col(spec.mins(a.name))))
            case _ => None
          }
          case m: Max => resolve(m.child) match {
            case a: AttributeReference if spec.maxs.contains(a.name) =>
              Some(org.apache.spark.sql.functions.max(col(spec.maxs(a.name))))
            case _ => None
          }
          // avg(x) = sum of per-bucket sums / sum of per-bucket non-null
          // counts — needs BOTH mappings (count(*) would miscount nulls)
          case a: Average => resolve(a.child) match {
            case at: AttributeReference
                if spec.sums.contains(at.name) && spec.counts.contains(at.name) =>
              Some(org.apache.spark.sql.functions.sum(col(spec.sums(at.name))) /
                org.apache.spark.sql.functions.sum(col(spec.counts(at.name))))
            case _ => None
          }
          case _ => None
        }
      }
      // hll_sketch_agg(x, lgK) over raw -> union of the rollup's sketches
      // (same lgK only — see RollupSpec.hlls)
      def mergeSketch(ae: AggregateExpression): Option[Column] = {
        if (ae.isDistinct || ae.filter.nonEmpty) return None
        ae.aggregateFunction match {
          case h: org.apache.spark.sql.catalyst.expressions.aggregate.HllSketchAgg =>
            (resolve(h.left), h.right) match {
              case (a: AttributeReference, Literal(lgK: Int, _))
                  if spec.hlls.get(a.name).exists(_._2 == lgK) =>
                Some(org.apache.spark.sql.functions.hll_union_agg(
                  col(spec.hlls(a.name)._1), lit(false)))
              case _ => None
            }
          case _ => None
        }
      }
      val classified: Seq[(Out, NamedExpression)] = outs.map { o =>
        val out: Out = o match {
          case a: AttributeReference if spec.tags.contains(a.name) &&
              tagNames.contains(a.name) => TagOut(a.name)
          case Alias(inner, _) => resolve(inner) match {
            case CanonicalBucket(_, g) if bucketG.contains(g) => BucketOut
            case HllSketchEstimate(ae: AggregateExpression) =>
              AggOut(org.apache.spark.sql.functions.hll_sketch_estimate(
                mergeSketch(ae).getOrElse(return None)))
            case ae: AggregateExpression =>
              AggOut(mergeAgg(ae).getOrElse(return None))
            // CollapseProject folds the engine's round(agg, k) presentation
            // idiom into the Aggregate — rebuild the rounding on top of the
            // merged aggregate
            case r: Round => r.child match {
              case ae: AggregateExpression => r.scale match {
                case Literal(sc: Int, _) => AggOut(
                  org.apache.spark.sql.functions.round(
                    mergeAgg(ae).getOrElse(return None), sc))
                case _ => return None
              }
              case _ => return None
            }
            case _ => return None
          }
          case _ => return None
        }
        (out, o)
      }
      if (!classified.exists(_._1.isInstanceOf[AggOut])) return None

      // build the rewritten aggregate with the DataFrame API (no
      // hand-assembled expression trees), then re-alias to the original
      // output attribute ids so parent plans keep resolving
      val coarse: Option[Column] = bucketG.map { g =>
        timestamp_micros((floor(unix_micros(col(spec.bucketCol)) / lit(g))
          .cast("long") * lit(g)).cast("long")).as("__cb")
      }
      val groupCols = tagNames.toSeq.map(col) ++ coarse.toSeq
      val aggCols = classified.zipWithIndex.collect {
        case ((AggOut(c), _), i) => c.as(s"__o$i")
      }
      val sel = classified.zipWithIndex.map {
        case ((TagOut(n), _), _) => col(n)
        case ((BucketOut, _), _) => col("__cb")
        case ((AggOut(_), _), i) => col(s"__o$i")
      }
      val base = rollupFilter.foldLeft(spec.rollup())(_ filter _)
      val rewritten = base
        .groupBy(groupCols: _*)
        .agg(aggCols.head, aggCols.tail: _*)
        .select(sel: _*)
      val newPlan = rewritten.queryExecution.optimizedPlan
      if (newPlan.output.length != outs.length) return None
      val aliased = outs.zip(newPlan.output).map { case (o, a) =>
        Alias(a, o.name)(exprId = o.exprId)
      }
      Some(Project(aliased, newPlan))
    }
  }
}
