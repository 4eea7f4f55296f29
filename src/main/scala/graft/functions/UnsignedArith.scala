package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Wrapping 64-bit arithmetic — the reference's uint64 semantics (SURVEY
  * hard part 4: the aggregate.sql golden test does `min(u) - max(u)` on a
  * uint64 column and the result WRAPS, Rust two's-complement style).
  * Spark 4 runs ANSI mode by default, where Long overflow throws; these
  * expressions keep the reference's wraparound behavior. The bit pattern of
  * a wrapped u64 equals the wrapped i64 (two's complement), so Long carries
  * the value; display as unsigned is a presentation concern.
  */
case class WrapArith(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Number].longValue()
    val b = r.asInstanceOf[Number].longValue()
    op match { // JVM long arithmetic wraps silently — exactly u64 mod 2^64
      case "add" => a + b
      case "sub" => a - b
      case "mul" => a * b
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
