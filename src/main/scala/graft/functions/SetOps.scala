package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED array&lt;long&gt; set representations, via a single
  * merge pass — the verification kernel for pair-wise set similarity.
  *
  * `array_intersect` on string arrays builds a hash set per evaluation and
  * hashes every element; on the near-dup verify path that runs once per
  * candidate PAIR (quadratic-ish), so the constant factor matters. Sorting
  * once per DOC (linear) buys an allocation-free two-pointer merge per
  * pair, and `doGenCode` inlines it into whole-stage codegen — the
  * interpreted fallback pays a boxed virtual call per pair.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { cnt += 1; i += 1; j += 1 }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0; int $cnt = 0;
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { $cnt++; $i++; $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    GraftBridge.col(SortedIntersectSize(GraftBridge.expr(a), GraftBridge.expr(b)))
}

/** Dot product of two numeric arrays in double — the pair-verification
  * kernel for embedding similarity. A `zip_with`+`aggregate` composition
  * evaluates interpreted with per-element allocation; on the all-pairs
  * verify path (quadratic-ish) this tight loop is the difference between
  * seconds and minutes. Codegen'd: the element accessors specialize on the
  * planned array element type. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def accessor(arr: String, idx: String, e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType   => s"(double) $arr.getFloat($idx)"
      case DoubleType  => s"$arr.getDouble($idx)"
      case IntegerType => s"(double) $arr.getInt($idx)"
      case LongType    => s"(double) $arr.getLong($idx)"
      case other => throw new IllegalStateException(s"bad element type $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${accessor(a, i, left)} * ${accessor(b, i, right)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  @transient private lazy val getters: (ArrayData => Int => Double, ArrayData => Int => Double) = {
    def getter(e: Expression): ArrayData => Int => Double =
      e.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType  => a => i => a.getFloat(i).toDouble
        case DoubleType => a => i => a.getDouble(i)
        case IntegerType => a => i => a.getInt(i).toDouble
        case LongType   => a => i => a.getLong(i).toDouble
        case other => throw new IllegalStateException(s"bad element type $other")
      }
    (getter(left), getter(right))
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val ga = getters._1(a); val gb = getters._2(b)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += ga(i) * gb(i); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftBridge.col(DotProduct(GraftBridge.expr(a), GraftBridge.expr(b)))
}

/** Fraction of agreeing slots between two equal-length minhash signatures
  * (array&lt;long&gt;) — the standard unbiased Jaccard estimator, and the
  * verification kernel of index-based incremental dedup. A
  * `zip_with`+`filter` composition evaluates interpreted AND its lambda
  * variables mint fresh expression ids per call, so every invocation
  * generates (and compiles) new codegen source; this native form is one
  * primitive loop with stable source, compiled once per session. */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var i = 0; var eq = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val eq = ctx.freshName("eq")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $i = 0; int $eq = 0;
         |while ($i < $n) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |  $i++;
         |}
         |${ev.value} = $n == 0 ? 0.0 : ((double) $eq) / $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SigAgreement {
  def apply(a: Column, b: Column): Column =
    GraftBridge.col(SigAgreement(GraftBridge.expr(a), GraftBridge.expr(b)))
}
