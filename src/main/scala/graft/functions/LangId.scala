package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass stopword-heuristic language ID kernel.
  *
  * Computes, in a single scan of the document, what the Column-composition
  * formulation in [[graft.pipeline.TextAnalysis.langId]] previously spent
  * one whitespace-split + one interpreted higher-order `filter` PER LANGUAGE
  * plus two regexp passes on: per-language stopword hit-rates, the CJK
  * character ratio, and the argmax.
  *
  * Semantics match the Column formulation exactly:
  *   - tokens are maximal runs between Java `\s` whitespace
  *     (space/tab/LF/VT/FF/CR), matched lowercase against each language's
  *     stopword set; score = hits / tokens (0 when the document is blank);
  *   - CJK ratio = codepoints in U+4E00..U+9FFF over all codepoints;
  *     ratio > 0.3 → "zh";
  *   - otherwise the highest-scoring language wins, ties broken toward the
  *     lexicographically larger code (array_max struct-compare order).
  *
  * Map-only, no shuffle; the per-document kernel shape that scales (same
  * rationale as [[GramRepStats]]).
  */
case class LangIdPredict(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  @transient private lazy val langCodes: Array[String] = langs.map(_._1).toArray
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    langs.map { case (_, ws) =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add)
      s
    }.toArray

  private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // CJK codepoint ratio
    var cjk = 0; var total = 0; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      total += 1
      if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      i += Character.charCount(cp)
    }
    if (total > 0 && cjk.toDouble / total > 0.3) return UTF8String.fromString("zh")

    // tokenize once; per-token set lookup for every language
    val hits = new Array[Int](sets.length)
    var nTok = 0; var p = 0
    while (p < s.length) {
      while (p < s.length && isWs(s.charAt(p))) p += 1
      if (p < s.length) {
        val st = p
        while (p < s.length && !isWs(s.charAt(p))) p += 1
        nTok += 1
        val tok = s.substring(st, p).toLowerCase(java.util.Locale.ROOT)
        var l = 0
        while (l < sets.length) {
          if (sets(l).contains(tok)) hits(l) += 1
          l += 1
        }
      }
    }
    var best = 0; var l = 1
    while (l < hits.length) {
      // scores share the denominator, so hit-count order == score order;
      // ties toward the lexicographically larger code, like array_max
      if (hits(l) > hits(best) ||
          (hits(l) == hits(best) && langCodes(l) > langCodes(best))) best = l
      l += 1
    }
    UTF8String.fromString(langCodes(best))
  }

  override def prettyName: String = "lang_id"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdPredict {
  def apply(text: Column, langs: Seq[(String, Seq[String])]): Column =
    GraftBridge.col(LangIdPredict(GraftBridge.expr(text), langs))
}
