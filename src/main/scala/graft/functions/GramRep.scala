package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram repetition statistics in one pass — the Gopher-style
  * repetition quality signals (Rae et al. 2021, "Scaling Language Models",
  * §A1.1: top n-gram character fraction, duplicate n-gram character
  * fraction) used to filter repetitive machine-generated text from
  * pretraining corpora.
  *
  * Input: the document's n-gram array (one string per gram, as produced by
  * [[graft.pipeline.TextAnalysis.shingles]]). Output: a struct of character
  * counts — the caller divides by the document length to get fractions, so
  * the kernel stays reusable across n and normalizations:
  *
  *   - `top_chars` = max over distinct grams of count(g) * chars(g) — the
  *     character mass of the most repetitive gram (unique as a value even
  *     when two grams tie on count);
  *   - `dup_chars` = sum over grams with count > 1 of count(g) * chars(g) —
  *     the character mass inside repeated grams (overlapping grams can push
  *     the fraction past 1; callers cap at 1.0).
  *
  * Map-only: one hash-map per row, no shuffle — the per-document shape that
  * scales to 100 TB (the alternative, explode + groupBy(doc, gram), shuffles
  * every gram of every document). A higher-order-function formulation
  * (`transform(array_distinct(g), x -> size(filter(g, y -> y = x)))`) would
  * be O(|grams|²) interpreted — same trap MinHashSig replaced.
  */
case class GramRepStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      counts.merge(arr.getUTF8String(i), 1, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mass = e.getValue.toLong * e.getKey.numChars()
      if (mass > top) top = mass
      if (e.getValue > 1) dup += mass
    }
    InternalRow(top, dup)
  }

  override def prettyName: String = "gram_rep_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramRepStats {
  /** Repetition character masses from an array&lt;string&gt; gram column. */
  def apply(grams: Column): Column = GraftBridge.col(GramRepStats(GraftBridge.expr(grams)))
}
