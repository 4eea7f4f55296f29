package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-token shingle strings from a token array in ONE native pass — the
  * kernel under every word-n-gram operator (MinHash/SimHash signatures,
  * repetition stats, the whole benchmark-decontamination family). The
  * higher-order formulation (`transform(sequence(...), i -> concat_ws(" ",
  * slice(toks, i+1, k)))`) evaluates the lambda INTERPRETED per gram — an
  * expression-tree walk with a fresh slice allocation for every window of
  * every document, on the corpus-scan hot path. Here the token array is
  * materialized once and each window is a single `UTF8String.concatWs`
  * (byte-level copy, no expression evaluation).
  *
  * `wholeTextFallback` selects the short-document contract:
  * true — a document shorter than k tokens contributes its whole text as
  * one shingle (the [[graft.pipeline.TextAnalysis.shingles]] /
  * decontamination convention: short benchmark prompts still match
  * verbatim copies); false — it contributes nothing (the span-excision
  * convention: no full k-gram can exist, so no span can match).
  *
  * Output strings are identical to the lambda formulation's, so every
  * oracle replay is unaffected. Map-only, no shuffle.
  */
case class ShingleJoin(child: Expression, k: Int, wholeTextFallback: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"shingle size $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (n >= k) {
      val out = new Array[AnyRef](n - k + 1)
      val window = new Array[UTF8String](k)
      var p = 0
      while (p <= n - k) {
        System.arraycopy(toks, p, window, 0, k)
        out(p) = UTF8String.concatWs(sep, window: _*)
        p += 1
      }
      new GenericArrayData(out)
    } else if (wholeTextFallback) {
      new GenericArrayData(Array[AnyRef](UTF8String.concatWs(sep, toks: _*)))
    } else {
      new GenericArrayData(Array.empty[AnyRef])
    }
  }

  override def prettyName: String = "shingle_join"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleJoin {
  /** Shingle strings from an array&lt;string&gt; token column. */
  def apply(tokens: Column, k: Int, wholeTextFallback: Boolean = true): Column =
    GraftBridge.col(ShingleJoin(GraftBridge.expr(tokens), k, wholeTextFallback))
}
