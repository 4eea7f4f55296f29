package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits) of a string's code-point distribution in one
  * pass — the gibberish/encoded-blob detector of Dolma-family quality
  * filters: natural prose sits near 4.1–4.4 bits/char, base64 and hex
  * dumps higher, single-char runs near 0.
  *
  * Map-only: one frequency map per row, no shuffle — the alternative
  * (explode per character + groupBy(doc, char)) shuffles every character
  * of every document. Iterates CODE POINTS, not UTF-16 units, so
  * supplementary-plane text (emoji, rare CJK) counts one symbol per
  * character, matching engines that split per code point (DuckDB's
  * string_split with the empty delimiter). Empty/null → null.
  */
object CharEntropy {
  /** Entropy in bits from a string column. */
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.col(
      CharEntropy(org.apache.spark.sql.GraftBridge.expr(text)))
}

case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return null
    val freq = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      freq.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var h = 0.0
    val it = freq.values().iterator()
    val ln2 = math.log(2.0)
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * math.log(p) / ln2
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
