package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (Datasketches) as native Catalyst aggregates/scalars —
  * the SET-OPERATION distinct family the HLL rollup cannot provide: HLL
  * unions only, theta sketches also INTERSECT and DIFFERENCE, answering
  * "distinct users who did A and B" / "did A but never B" from mergeable
  * per-segment summaries without rescanning raw data.
  *
  * Determinism contract: below the sketch's nominal entries k the sketch
  * is in EXACT mode (no sampling), so estimates equal true distinct
  * counts and the cross-engine oracle can hash-check them (q249 uses
  * lgK=14 ⇒ exact through 16384 distinct keys per set — far above the
  * fixture's user universe). Above k the ≤~2% relative-error envelope is
  * spec-bound, the same contract as thetasketch_distinct / the HLL
  * rollup (COVERAGE.md).
  *
  * 100 TB shape: the aggregate buffer is a bounded Union gadget (k
  * entries max), partial aggregation is map-side, set operations run on
  * compact byte arrays — per-group state never scales with row count.
  */
object ThetaSketch {

  private[functions] def wrap(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))

  /** Round-half-up of a theta estimate — below k this is the exact
    * distinct count (the estimate is integral already). */
  private[functions] def est(d: Double): Long = Math.floor(d + 0.5).toLong
}

/** `theta_agg(col, lgK)`: build a theta sketch over the column's values. */
case class ThetaAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.update(s.toString)
      case l: Long => buf.update(l)
      case i: Int => buf.update(i.toLong)
      case d: Double => buf.update(d)
      case b: Array[Byte] => buf.update(b)
      case other => buf.update(other.toString)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ThetaAgg = copy(child = c.head)
  override def prettyName: String = "theta_agg"
}

object ThetaAgg {
  def apply(c: Column, lgK: Int): Column =
    GraftBridge.col(ThetaAgg(GraftBridge.expr(c), lgK)
      .toAggregateExpression())
}

/** `theta_merge(sketch)`: union pre-built sketches (the rollup merge). */
case class ThetaMergeAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(ThetaSketch.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ThetaMergeAgg = copy(child = c.head)
  override def prettyName: String = "theta_merge"
}

object ThetaMergeAgg {
  def apply(c: Column, lgK: Int): Column =
    GraftBridge.col(ThetaMergeAgg(GraftBridge.expr(c), lgK)
      .toAggregateExpression())
}

/** `theta_estimate(sketch)`: distinct estimate (exact below k). */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ThetaSketch.est(ThetaSketch.wrap(v.asInstanceOf[Array[Byte]]).getEstimate)
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
  override def prettyName: String = "theta_estimate"
}

object ThetaEstimate {
  def apply(c: Column): Column =
    GraftBridge.col(ThetaEstimate(GraftBridge.expr(c)))
}

/** Set-operation estimates over two serialized sketches. */
abstract class ThetaBinaryEst extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  protected def combine(a: CompactSketch, b: CompactSketch): Double
  override def nullSafeEval(l: Any, r: Any): Any =
    ThetaSketch.est(combine(
      ThetaSketch.wrap(l.asInstanceOf[Array[Byte]]),
      ThetaSketch.wrap(r.asInstanceOf[Array[Byte]])))
}

/** `theta_intersect_est(a, b)`: |A ∩ B| estimate. */
case class ThetaIntersectEst(left: Expression, right: Expression)
  extends ThetaBinaryEst {
  override protected def combine(a: CompactSketch, b: CompactSketch): Double = {
    val it = SetOperation.builder().buildIntersection()
    it.intersect(a); it.intersect(b)
    it.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectEst = copy(l, r)
  override def prettyName: String = "theta_intersect_est"
}

object ThetaIntersectEst {
  def apply(a: Column, b: Column): Column =
    GraftBridge.col(ThetaIntersectEst(GraftBridge.expr(a), GraftBridge.expr(b)))
}

/** `theta_union_est(a, b)`: |A ∪ B| estimate. */
case class ThetaUnionEst(left: Expression, right: Expression)
  extends ThetaBinaryEst {
  override protected def combine(a: CompactSketch, b: CompactSketch): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(a); u.union(b)
    u.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaUnionEst = copy(l, r)
  override def prettyName: String = "theta_union_est"
}

object ThetaUnionEst {
  def apply(a: Column, b: Column): Column =
    GraftBridge.col(ThetaUnionEst(GraftBridge.expr(a), GraftBridge.expr(b)))
}

/** `theta_anotb_est(a, b)`: |A \ B| estimate. */
case class ThetaANotBEst(left: Expression, right: Expression)
  extends ThetaBinaryEst {
  override protected def combine(a: CompactSketch, b: CompactSketch): Double = {
    val d = SetOperation.builder().buildANotB()
    d.setA(a); d.notB(b)
    d.getResult(true).getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaANotBEst = copy(l, r)
  override def prettyName: String = "theta_anotb_est"
}

object ThetaANotBEst {
  def apply(a: Column, b: Column): Column =
    GraftBridge.col(ThetaANotBEst(GraftBridge.expr(a), GraftBridge.expr(b)))
}
