package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE-encode a text: whitespace-split, apply the (broadcast-small) merge
  * table to each word in rank order, flatten to one token array. The merge
  * loop is genuinely imperative per word, so it lives in a native
  * expression rather than a chain of higher-order functions; codegen emits
  * a single call into this object (merge table attached via
  * `addReferenceObj`), keeping the surrounding stage in whole-stage
  * codegen.
  */
case class BpeEncodeText(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def encode(text: UTF8String): GenericArrayData = {
    val out = Array.newBuilder[UTF8String]
    for (w <- text.toString.trim.split("\\s+") if w.nonEmpty;
         t <- graft.pipeline.Bpe.encodeWithRanks(w, ranks))
      out += UTF8String.fromString(t)
    new GenericArrayData(out.result().asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpe", this, classOf[BpeEncodeText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
